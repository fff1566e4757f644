"""Config system, reflection registry and small host-side helpers.

Mirrors the public ergonomics of the reference config layer
(/root/reference/dram/utils.py:29-69 Settings, :280-283 get_callable_by_name):
settings are plain Python modules whose UPPERCASE names become attributes,
and components are named by dotted strings in the config. Re-designed bits:
a registry of short aliases maps reference-style names ("models.DC3D") onto
this package's classes so reference configs keep working.
"""

from __future__ import annotations

import csv
import importlib
import importlib.util
import os
import sys
import time


def convert_dict_string(d, i=1):
    sp = "    " * i
    sp0 = "    " * (i - 1)
    s = f"\n{sp0}{{"
    for k, v in d.items():
        if isinstance(v, dict):
            s += f"\n{sp}{k}:{convert_dict_string(v, i + 1)}"
        else:
            s += f"\n{sp}{k}:{v}"
    s += f"\n{sp0}}}"
    return s


class Settings:
    """Exec-load a Python settings module; lift UPPERCASE names to attributes.

    Same contract as the reference Settings (utils.py:42-69): any UPPERCASE
    module-level name becomes a mutable attribute, `EXP_NAME` is compulsory,
    `is_overridden` reports which settings were explicit, and `str(settings)`
    pretty-prints the whole config (dumped to settings.txt by the trainer).
    """

    COMPULSORY = ("EXP_NAME",)

    def __init__(self, settings_module_path, settings_name="settings"):
        self.settings_module_path = settings_module_path
        spec = importlib.util.spec_from_file_location(settings_name, settings_module_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        self._explicit_settings = set()
        for setting in dir(mod):
            if setting.isupper():
                value = getattr(mod, setting)
                if setting in self.COMPULSORY and value is None:
                    raise AttributeError(f"The {setting} setting must be not None.")
                setattr(self, setting, value)
                self._explicit_settings.add(setting)
        for setting in self.COMPULSORY:
            if not hasattr(self, setting):
                raise AttributeError(f"Settings module must define {setting}.")

    def is_overridden(self, setting):
        return setting in self._explicit_settings

    def get(self, name, default=None):
        return getattr(self, name, default)

    def __str__(self):
        d = {k: v for k, v in self.__dict__.items() if k.isupper()}
        return convert_dict_string(d)


# ---------------------------------------------------------------------------
# Reflection registry.
#
# Reference configs name components "models.DC3D", "metrics.IntRegRefineLoss",
# "torch.optim.Adam" etc. (st_dram_ref.py:55,92,110). We keep that surface but
# resolve through an alias table first, so that unmodified reference-style
# configs resolve to the TPU-native implementations.
# ---------------------------------------------------------------------------

_ALIASES = {
    # models
    "models.DC3D": "dram_tpu.models.unet3d.DC3D",
    "models.DC3DATGeneric": "dram_tpu.models.dc3d_at.DC3DATGeneric",
    "models.HeNorm": "dram_tpu.models.initializers.HeNorm",
    "models.PCM": "dram_tpu.models.pcm.PCM",
    # losses
    "metrics.IntRegLoss": "dram_tpu.losses.interval_reg.IntRegLoss",
    "metrics.IntRegRefineLoss": "dram_tpu.losses.refine.IntRegRefineLoss",
    "metrics.IntRegAffLoss": "dram_tpu.losses.equivariance.IntRegAffLoss",
    "metrics.IntRegAffRefineLoss": "dram_tpu.losses.equivariance.IntRegAffRefineLoss",
    "metrics.BootBinCrossEntropy": "dram_tpu.losses.bootstrap_bce.BootBinCrossEntropy",
    "metrics.BinaryCrossEntropySmooth": "dram_tpu.losses.bootstrap_bce.BinaryCrossEntropySmooth",
    # optimizers / schedulers (torch names -> optax factories)
    "torch.optim.Adam": "dram_tpu.train.trainer.adam",
    "torch.optim.SGD": "dram_tpu.train.trainer.sgd",
    "torch.optim.lr_scheduler.ExponentialLR": "dram_tpu.train.trainer.exponential_lr",
    # runners
    "job_runner.LesionSegChunkTrain": "dram_tpu.train.trainer.LesionSegChunkTrain",
    "job_runner.LesionSegTest": "dram_tpu.infer.engine.LesionSegTest",
}


def select_platform(platform=None):
    """Honour $DRAM_PLATFORM ("cpu" / "tpu") before backend init.

    Some TPU plugins register themselves via sitecustomize and ignore the
    JAX_PLATFORMS env var, so the config knob is the only reliable
    override — and it only works before the first backend query. Called
    by every entry point; a no-op when the variable is unset.
    """
    import jax

    p = platform or os.environ.get("DRAM_PLATFORM")
    if p:
        jax.config.update("jax_platforms", p)
    return p


def enable_compilation_cache(path=None, min_compile_secs=0.0, seed=True):
    """Turn on JAX's persistent XLA compilation cache, pre-seeded.

    The deployment pipeline restarts per batch of scans; without a disk
    cache every cold process pays full XLA compilation of the model +
    pipeline stages (~15 min cold on a tunneled v5e, dominated by the
    Mosaic kernel zoo). Called by every entry point (train.py,
    process_pipeline.py, bench.py, JobRunner).

    Cache location: $DRAM_TPU_CACHE_DIR, else `<repo>/.xla_cache`. That
    directory is transient (gitignored); the repo carries pre-built
    executables for the flagship geometry as xz-compressed entries in
    `<repo>/warm_cache/` (built by tools/seed_xla_cache.py), and this
    function unpacks any that are missing from the runtime cache — so a
    fresh clone starts warm instead of paying the full cold compile.

    GOTCHA (measured, round 5): under the tunneled TPU backend the cache
    KEY depends on the cache-dir value itself (three dirs produced three
    disjoint 377-entry key sets for identical programs; the same dir is
    key-stable across sessions) — the remote-compile path folds the
    configured dir into the hashed compile options. warm_cache/ must
    therefore be harvested from a run using the DEFAULT `<repo>/
    .xla_cache` dir, and DRAM_TPU_CACHE_DIR overrides will recompile
    from cold. Keep seed-building runs on the default dir.
    Returns the cache directory, or None when the running jax build does
    not support the persistent-cache config knobs.
    """
    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if path is None:
        path = os.environ.get("DRAM_TPU_CACHE_DIR",
                              os.path.join(root, ".xla_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    stabilize_mosaic_cache_keys()
    if seed and os.environ.get("DRAM_TPU_NO_SEED_CACHE", "0") != "1":
        seed_compilation_cache(os.path.join(root, "warm_cache"), path)
    return path


_MOSAIC_KEYS_STABILIZED = [False]


def stabilize_mosaic_cache_keys():
    """Make XLA persistent-cache keys of Pallas TPU programs survive
    kernel source motion.

    jax's cache key already canonicalizes the StableHLO module with an
    MLIR strip-debuginfo pass (jax/_src/cache_key.py), but a Pallas TPU
    kernel arrives as a tpu_custom_call whose backend_config holds the
    *already-serialized* Mosaic module — with `loc(...)` entries baked
    into the bytecode, out of reach of that pass. Editing even a comment
    above a kernel therefore used to re-key every program containing one
    (the round-3 cold-start post-mortem: a stale warm_cache/ seed cost
    436 s). This wraps jax's Mosaic module serialization to run
    strip-debuginfo on a clone first, so the payload — and with it the
    cache key — depends only on the kernel's semantics.

    Idempotent; degrades to a no-op (stock behavior) if jax internals
    move. Opt out with DRAM_TPU_KEEP_MOSAIC_LOCS=1 (restores source
    locations in Mosaic diagnostics at the price of fragile keys).
    """
    if _MOSAIC_KEYS_STABILIZED[0]:
        return True
    if os.environ.get("DRAM_TPU_KEEP_MOSAIC_LOCS", "0") == "1":
        return False
    try:
        import io

        from jax._src import tpu_custom_call as _tcc
        from jaxlib.mlir import ir as _ir
        from jaxlib.mlir.passmanager import PassManager as _PM

        orig = _tcc._lower_mosaic_module_to_asm

        def _strip_then_lower(module, *, ir_version=None):
            try:
                with module.context:
                    op = module.operation.clone()
                    _PM.parse("builtin.module(strip-debuginfo)").run(op)
                    buf = io.BytesIO()
                    op.write_bytecode(buf)
                    module = _ir.Module.parse(buf.getvalue())
            except Exception:
                pass  # fall through with the original (located) module
            return orig(module, ir_version=ir_version)

        _tcc._lower_mosaic_module_to_asm = _strip_then_lower
        _MOSAIC_KEYS_STABILIZED[0] = True
        return True
    except Exception:
        return False


def log_cache_events(sink=None, counts=None):
    """Surface persistent-cache HIT/MISS per jitted module, loudly.

    A stale warm_cache/ seed is invisible without this: setup just takes
    minutes longer. Installs a handler on jax's compiler logger that
    forwards the two cache-outcome records to `sink` (default: stderr)
    as one-liners:  `# xla-cache HIT jit_stage2model`. Pass a dict as
    `counts` to additionally accumulate {"hit": n, "miss": n} for a
    one-line summary. Returns a zero-arg uninstaller."""
    import logging

    if sink is None:
        def sink(s):
            print(s, file=sys.stderr)

    logger = logging.getLogger("jax._src.compiler")

    class _CacheEventHandler(logging.Handler):
        def emit(self, record):
            try:
                msg = record.getMessage()
            except Exception:
                return
            if "Persistent compilation cache hit" in msg:
                if counts is not None:
                    counts["hit"] = counts.get("hit", 0) + 1
                sink(f"# xla-cache HIT  {record.args[0]}")
            elif "PERSISTENT COMPILATION CACHE MISS" in msg:
                if counts is not None:
                    counts["miss"] = counts.get("miss", 0) + 1
                sink(f"# xla-cache MISS {record.args[0]}")

    handler = _CacheEventHandler(level=logging.DEBUG)
    prev_level, prev_prop = logger.level, logger.propagate
    logger.addHandler(handler)
    if logger.getEffectiveLevel() > logging.DEBUG:
        logger.setLevel(logging.DEBUG)
    # don't spray the compiler's other DEBUG records over stderr while
    # the level is lowered
    logger.propagate = False

    def uninstall():
        logger.removeHandler(handler)
        logger.setLevel(prev_level)
        logger.propagate = prev_prop

    return uninstall


def seed_compilation_cache(seed_dir, cache_dir):
    """Unpack tracked `warm_cache/*.xz` entries into the runtime cache.

    Entries whose target file already exists are skipped; unpacking is
    atomic (tmp file + rename) so concurrent processes cannot observe a
    truncated executable. Key mismatches are harmless: an entry the
    running jax/libtpu does not recognize is simply never requested.
    Returns the number of entries unpacked.
    """
    import glob
    import lzma

    n = 0
    for src in glob.glob(os.path.join(seed_dir, "*.xz")):
        dst = os.path.join(cache_dir, os.path.basename(src)[:-3])
        if os.path.exists(dst):
            continue
        try:
            with lzma.open(src, "rb") as fin:
                data = fin.read()
            tmp = dst + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fout:
                fout.write(data)
            os.replace(tmp, dst)
            n += 1
        except Exception:
            continue
    return n


def get_callable_by_name(dotted_name):
    """Dotted string -> callable, resolving reference-style aliases first."""
    dotted_name = _ALIASES.get(dotted_name, dotted_name)
    module_name, _, attr = dotted_name.rpartition(".")
    return getattr(importlib.import_module(module_name), attr)


def register_alias(name, target):
    _ALIASES[name] = target


# ---------------------------------------------------------------------------
# CSV helpers (same contracts as reference utils.py:17-27, 256-278).
# ---------------------------------------------------------------------------

def read_csv_in_dict(csv_file_path, column_key, fieldnames=None):
    row_dict = {}
    if not os.path.exists(csv_file_path):
        return row_dict, None
    with open(csv_file_path, "rt") as fp:
        cr = csv.DictReader(fp, delimiter=",", fieldnames=fieldnames)
        for row in cr:
            row_dict[row[column_key]] = row
        field_names = cr.fieldnames
    return row_dict, field_names


def read_csv_in_dict_double(csv_file_path, column_keys, fieldnames=None):
    row_dict = {}
    if not os.path.exists(csv_file_path):
        return row_dict, None
    with open(csv_file_path, "rt") as fp:
        cr = csv.DictReader(fp, delimiter=",", fieldnames=fieldnames)
        for row in cr:
            row_dict[tuple(row[k] for k in column_keys)] = row
        field_names = cr.fieldnames
    return row_dict, field_names


def get_value_recursively(search_dict, field):
    """Find every value stored under key `field` in a nested dict/list tree."""
    found = []
    for key, value in search_dict.items():
        if key == field:
            found.append(value)
        elif isinstance(value, dict):
            found.extend(get_value_recursively(value, field))
        elif isinstance(value, list):
            for item in value:
                if isinstance(item, dict):
                    found.extend(get_value_recursively(item, field))
    return found


# ---------------------------------------------------------------------------
# Meters (reference utils.py:98-125).
# ---------------------------------------------------------------------------

class AverageMeter:
    """Stores current value, running sum and average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MovingAverage:
    def __init__(self, inertia=0.9):
        self.inertia = inertia
        self.reset()

    def reset(self):
        self.avg = 0.0

    def update(self, val):
        self.avg = self.inertia * self.avg + (1 - self.inertia) * val


class Timer:
    def __init__(self):
        self.t0 = time.time()

    def elapsed(self):
        return time.time() - self.t0


class PD_Stats:
    """Pandas pickle logger (reference utils.py:72-95)."""

    def __init__(self, path, columns):
        import pandas as pd
        self.path = path
        if os.path.isfile(path):
            self.stats = pd.read_pickle(path)
            assert list(self.stats.columns) == list(columns)
        else:
            self.stats = pd.DataFrame(columns=columns)

    def update(self, row, save=True):
        self.stats.loc[len(self.stats.index)] = row
        if save:
            self.stats.to_pickle(self.path)


def expand_dims_np(a, expected_dim):
    """Left-pad singleton dims until `expected_dim` (reference utils.py:127)."""
    while a.ndim < expected_dim:
        a = a[None]
    return a


def squeeze_dims_np(a, expected_dim, squeeze_start_index=0):
    """Squeeze leading singleton dims down to `expected_dim`."""
    while a.ndim > expected_dim:
        a = a.squeeze(squeeze_start_index)
    return a


def count_params(tree):
    """Total parameter count of a pytree (replaces the reference's
    commented-out ptflops MAC counter, job_runner.py:370-377)."""
    import numpy as np
    import jax
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(tree)))


def estimate_conv3d_macs(model_cfg, spatial_size):
    """Rough MAC estimate for the DC3D channel plan at a given chunk size:
    sum over conv layers of out_vox * k^3 * c_in * c_out."""
    import numpy as np
    n = model_cfg["n_layers"]
    base = model_cfg["base_ch_list"]
    end = model_cfg["end_ch_list"]
    in_ch = model_cfg["in_ch_list"]
    macs = 0
    size = np.asarray(spatial_size, np.int64)
    for i in range(n):  # encoder blocks at full->pooled sizes
        vox = int(np.prod(size))
        macs += vox * 27 * (in_ch[i] * base[i] + base[i] * end[i])
        size = size // 2
    vox = int(np.prod(size))
    macs += vox * 27 * (in_ch[n] * base[n] + base[n] * end[n])
    for i in range(n):  # decoder
        size = size * 2
        vox = int(np.prod(size))
        li = n + 1 + i
        macs += vox * 27 * (in_ch[li] * base[li] + base[li] * end[li])
    return macs
