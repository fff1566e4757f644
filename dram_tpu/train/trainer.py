"""Trainer: jitted train step, optax optimization, epoch orchestration.

Rebuild of the reference JobRunner/LesionSegChunkTrain
(reference job_runner.py:291-811) with a TPU-native execution model:

* the whole optimizer step — forward (both heads), interval-regression +
  refinement losses (incl. on-device pseudo-labels), backward, Adam update,
  BatchNorm stat update — is ONE jitted XLA program with donated buffers;
* data loading/augmentation runs on host threads, overlapping device compute
  (the reference ran its SimpleITK pipeline serially on the main process);
* the loss calls the model through a `model_fn` closure, preserving the
  reference contract where the loss drives the forward pass
  (job_runner.py:664-667);
* the ExponentialLR scheduler steps per validation epoch exactly like the
  reference (job_runner.py:706) via optax.inject_hyperparams;
* checkpoints every STATE_EPOCHS with tolerant resume from the newest file.

Data-parallel scaling: when JAX sees multiple devices, the train step is
sharded over a ('data',) mesh — the batch is split across chips and XLA
inserts the gradient/batch-stat collectives (see core/mesh.py).
"""

from __future__ import annotations

import copy
import logging
import logging.config
import os
import sys
import time
from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..core.mesh import best_mesh, pad_batch, replicate, shard_batch_arrays
from ..core.resample import resize3d_np
from ..data.datasets import RadboudCOVID, RadboudCOVIDLobeVesselChunk
from ..data.pipeline import DataLoader, collate_dict
from ..data.sampler import LobeChunkCTSSSampler
from ..data import transforms as T
from ..core.ops import find_crops_np
from ..losses.interval_reg import ratio_to_label
from ..utils import (AverageMeter, Settings, enable_compilation_cache,
                     get_callable_by_name, get_value_recursively)
from ..viz import SummaryWriter, plot_confusion_matrix_from_data
from .checkpoint import (load_checkpoint, newest_checkpoint, save_checkpoint,
                         tolerant_merge)


class MODEL_STATUS(Enum):
    UN_INIT = 0
    RANDOM_INITIALIZED = 1
    RELOAD_PRETRAINED = 2
    TRAINING = 3


class MaskWireLatch:
    """One-way u8 -> f32 latch for the mask wire dtype.

    The mask channels ship as u8 only while every batch is exactly
    representable; the first batch that is not (non-integral or >255
    values) flips the latch to f32 *for the rest of the run*, so the
    wire dtype changes at most once — a per-batch decision would flip
    back and forth and force a jit retrace of the train step each time
    (advisor finding, round 2)."""

    def __init__(self, log=None):
        self.u8_ok = True
        self._log = log

    def pack(self, m):
        if self.u8_ok:
            q = m.astype(np.uint8)
            if (q == m).all():
                return q
            self.u8_ok = False
            if self._log is not None:
                self._log("mask wire: batch not u8-representable; "
                          "latching the mask wire to f32 for this run "
                          "(one train-step retrace)")
        return m


def unpack_image_wire(images, span):
    """The single inverse of the u16 image wire (pack_train_batch).

    `span` is PER-SAMPLE (B, 2): each row's own (lo, hi) — sharded with
    the batch, so the wire works when every process packs only its own
    rows (per-process sampler sharding) and quantizes tighter than a
    batch-global span. Shared by the jitted train step and host-side
    trace unpacking so the wire format has exactly one dequantization
    (advisor finding: two slightly different copies could drift by
    ULPs)."""
    if images.dtype == jnp.uint16:
        bshape = (-1,) + (1,) * (images.ndim - 1)
        lo = span[:, 0].reshape(bshape)
        hi = span[:, 1].reshape(bshape)
        scale = (hi - lo) * (1.0 / 65535.0)
        return lo + images.astype(jnp.float32) * scale
    return images.astype(jnp.float32)


def pack_train_batch(batch, wire="f32", mask_latch=None):
    """Host-side wire packing of one collated train batch.

    Runs inside the loader's producer threads (overlapped with device
    compute). With `wire="u16"` the windowed image ships as uint16 plus a
    per-batch (lo, hi) span and the lobe/lesion mask channels ship as uint8
    when exactly representable — cutting per-step H2D ~2.4x (61 -> 25 MB at
    the reference bs10 x 80^3). Dequantization happens inside the jitted
    step; the u16 round-trip error is <= (hi-lo)/65535, two orders of
    magnitude below the bf16 activation precision the TPU step computes in,
    and the integral mask channels are bit-exact. `wire="f32"` ships float32
    unchanged (the CPU / numerics-parity default).
    """
    images = batch["#image"][..., None].astype(np.float32)
    lobes = batch["#lobe_reference"][..., None].astype(np.float32)
    lesion_key = "#pseudo_lesion_reference" \
        if "#pseudo_lesion_reference" in batch else "#lesion_reference"
    lesions = batch[lesion_key][..., None].astype(np.float32)
    meta = batch["meta"]
    key = "ctss" if "ctss" in meta else "cle"
    ctss = np.asarray([int(float(c)) for c in meta[key]], np.int32)
    B = images.shape[0]
    # per-SAMPLE span: rows quantize independently, so the wire is
    # identical whether a process packs the global batch or only its own
    # rows (per-process sampler sharding), and each chunk gets the full
    # u16 range
    span = np.tile(np.array([0.0, 1.0], np.float32), (B, 1))
    if wire == "u16":
        flat = images.reshape(B, -1)
        lo = flat.min(axis=1)
        hi = flat.max(axis=1)
        if not (np.isfinite(lo).all() and np.isfinite(hi).all()):
            # NaN/Inf would make the float->u16 cast undefined and feed
            # silent garbage to the step; the f32 wire propagates a
            # visible NaN loss instead (advisor finding, round 2)
            logging.getLogger(__name__).warning(
                "u16 image wire: batch contains non-finite values; "
                "shipping this batch as f32")
        else:
            hi = np.where(hi > lo, hi, lo + 1.0)
            span = np.stack([lo, hi], axis=1).astype(np.float32)
            bshape = (B,) + (1,) * (images.ndim - 1)
            images = np.rint((images - lo.reshape(bshape)) *
                             (65535.0 / (hi - lo).reshape(bshape))) \
                .astype(np.uint16)
        if mask_latch is None:
            mask_latch = MaskWireLatch()
        lobes = mask_latch.pack(lobes)
        lesions = mask_latch.pack(lesions)
    elif wire != "f32":
        raise ValueError(f"TRAIN_WIRE must be 'f32' or 'u16', got {wire!r}")
    return {"_packed": True, "images": images, "span": span,
            "lobes": lobes, "lesions": lesions, "ctss": ctss}


# --- registry targets for reference-style OPTIMIZER/SCHEDULER configs ------

def adam(lr=1e-4, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **kw):
    tx = optax.inject_hyperparams(optax.adamw if weight_decay else optax.adam)
    if weight_decay:
        return tx(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
                  weight_decay=weight_decay), lr
    return tx(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps), lr


def sgd(lr=1e-4, momentum=0.0, **kw):
    return optax.inject_hyperparams(optax.sgd)(
        learning_rate=lr, momentum=momentum or None), lr


class ExponentialLR:
    """Per-validation-epoch exponential decay (reference SCHEDULER)."""

    def __init__(self, base_lr, gamma=0.9):
        self.base_lr = base_lr
        self.gamma = gamma
        self.steps = 0

    def step(self):
        self.steps += 1

    @property
    def lr(self):
        return self.base_lr * (self.gamma ** self.steps)

    def state_dict(self):
        return {"steps": self.steps, "base_lr": self.base_lr,
                "gamma": self.gamma}

    def load_state_dict(self, d):
        self.steps = int(d.get("steps", 0))
        self.base_lr = float(d.get("base_lr", self.base_lr))
        self.gamma = float(d.get("gamma", self.gamma))


def exponential_lr(gamma=0.9, **kw):
    return ("exponential", gamma)


def fix_random_seeds(seed):
    np.random.seed(seed)
    import random
    random.seed(seed)
    return jax.random.PRNGKey(seed)


class JobRunner:
    """Shared runner scaffolding: config, logging, dirs, init, checkpoints."""

    def __init__(self, setting_module_file_path=None, settings_module=None,
                 **kwargs):
        if settings_module is not None:
            self.settings = settings_module
        else:
            self.settings = Settings(setting_module_file_path)
        self.model_status = MODEL_STATUS.UN_INIT
        enable_compilation_cache(
            getattr(self.settings, "COMPILATION_CACHE_DIR", None))

        for fn in get_value_recursively(getattr(self.settings, "LOGGING", {}),
                                        "filename"):
            os.makedirs(os.path.dirname(fn), exist_ok=True)
        if getattr(self.settings, "LOGGING", None):
            logging.config.dictConfig(self.settings.LOGGING)
        else:
            logging.basicConfig(
                level=logging.INFO,
                format="%(asctime)s [%(levelname)s] %(name)s: %(message)s")
        self.logger = logging.getLogger(self.settings.EXP_NAME)

        self.exp_path = os.path.join(self.settings.MODEL_ROOT_PATH,
                                     self.settings.EXP_NAME) + "/"
        self.debug_path = os.path.join(self.settings.DEBUG_PATH,
                                       self.settings.EXP_NAME) + "/"
        os.makedirs(self.exp_path, exist_ok=True)
        os.makedirs(self.debug_path, exist_ok=True)
        self.summary_writer = SummaryWriter(
            log_dir=os.path.join(self.exp_path, "summary"))

        def runner_excepthook(exc_type, exc_value, tb):
            self.logger.error("Logging an uncaught exception",
                              exc_info=(exc_type, exc_value, tb))

        sys.excepthook = runner_excepthook
        self.model_metrics_save_dict = {}

        with open(self.exp_path + "/settings.txt", "wt", newline="") as fp:
            fp.write(str(self.settings))

    # ------------------------------------------------------------------
    def init(self):
        s = self.settings
        self.rng = fix_random_seeds(getattr(s, "RANDOM_SEED", 33))

        model_cfg = dict(s.MODEL)
        model_cls = get_callable_by_name(model_cfg.pop("method"))
        self.compute_dtype = jnp.bfloat16 \
            if getattr(s, "COMPUTE_DTYPE", "float32") == "bfloat16" \
            else jnp.float32
        # per-step H2D wire (pack_train_batch): quantized by default only on
        # TPU, where the step already computes in bf16; TRAIN_WIRE overrides
        self._train_wire = str(getattr(
            s, "TRAIN_WIRE",
            "u16" if jax.default_backend() == "tpu" else "f32"))
        if self._train_wire not in ("f32", "u16"):
            raise ValueError(f"TRAIN_WIRE must be 'f32' or 'u16', "
                             f"got {self._train_wire!r}")
        if "use_pallas_attention" in getattr(model_cls,
                                             "__dataclass_fields__", {}):
            # fused stencil-attention kernel (TPU only; the CPU backend
            # runs the XLA path). Training uses it too — the kernel has a
            # recompute-based Pallas VJP.
            model_cfg["use_pallas_attention"] = bool(
                getattr(s, "USE_PALLAS_ATTENTION",
                        jax.default_backend() == "tpu"))
        if "use_pallas_conv" in getattr(model_cls,
                                        "__dataclass_fields__", {}):
            # fused conv3d kernel (differentiable, per-layer gated in
            # blocks.py; TPU only). Verified to fit a 16G v5e at the
            # shipped bs=10 + reference remat mask and measured faster
            # both in the isolated step (1.36x at bs4) and the real
            # data-bound trainer (1.88 vs 2.04 s/step); inference
            # forward drops 149 -> 125 ms. USE_PALLAS_CONV overrides.
            model_cfg["use_pallas_conv"] = bool(
                getattr(s, "USE_PALLAS_CONV",
                        jax.default_backend() == "tpu"))
        if "use_fused_stack" in getattr(model_cls,
                                        "__dataclass_fields__", {}):
            # fully fused conv->bn->relu chain (core/pallas/fused_stack.py):
            # no HBM round trips between a stack's two convs. DP-exact on
            # any device count: under the shard_map train step the fused
            # BatchNorm psums its epilogue stats over the batch axes.
            # USE_FUSED_STACK overrides.
            model_cfg["use_fused_stack"] = bool(
                getattr(s, "USE_FUSED_STACK",
                        jax.default_backend() == "tpu"))
        self.model = model_cls(**model_cfg, train=True,
                               dtype=self.compute_dtype)
        eval_cfg = dict(model_cfg)
        if "use_fused_stack" in eval_cfg:
            # eval-mode BN reads running stats (no batch reduction), so
            # the fused chain is safe on any device count for inference
            eval_cfg["use_fused_stack"] = bool(
                getattr(s, "USE_FUSED_STACK",
                        jax.default_backend() == "tpu"))
        self.model_eval = model_cls(**eval_cfg, train=False,
                                    dtype=self.compute_dtype)

        init_cfg = dict(getattr(s, "INITIALIZER", {"method": "models.HeNorm"}))
        init_cls = get_callable_by_name(init_cfg.pop("method"))
        self.parameter_initializer = init_cls(**init_cfg)  # baked into modules

        chunk = tuple(s.RESAMPLE_SIZE)
        dummy = jnp.zeros((1, *chunk, 1), jnp.float32)
        self.rng, init_rng = jax.random.split(self.rng)
        variables = jax.jit(self.model.init)(init_rng, dummy)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        opt_cfg = dict(s.OPTIMIZER)
        opt_cls = get_callable_by_name(opt_cfg.pop("method"))
        groups = opt_cfg.pop("groups", None)
        if groups:
            # per-parameter-group optimizer (reference job_runner.py:385-393:
            # params whose name matches a group key get that group's
            # overrides, the rest get the base config) via multi_transform
            self._group_base_lrs = {}
            transforms = {}
            for key, overrides in groups.items():
                gcfg = dict(opt_cfg)
                gcfg.update(overrides)
                transforms[key], glr = opt_cls(**gcfg)
                self._group_base_lrs[key] = glr
            transforms["__default__"], base_lr = opt_cls(**opt_cfg)
            self._group_base_lrs["__default__"] = base_lr
            group_keys = list(groups.keys())

            def label_of_path(path, _):
                names = [str(k.key) if hasattr(k, "key") else str(k)
                         for k in path]
                for key in group_keys:
                    if any(key in n for n in names):
                        return key
                return "__default__"

            def label_fn(params):
                return jax.tree_util.tree_map_with_path(label_of_path, params)

            self.tx = optax.multi_transform(transforms, label_fn)
        else:
            self._group_base_lrs = None
            self.tx, base_lr = opt_cls(**opt_cfg)
        self.opt_state = self.tx.init(self.params)

        sched_cfg = dict(getattr(s, "SCHEDULER",
                                 {"method": "torch.optim.lr_scheduler.ExponentialLR",
                                  "gamma": 0.9}))
        get_callable_by_name(sched_cfg.pop("method"))  # validates the name
        self.scheduler = ExponentialLR(base_lr, **sched_cfg)
        self._set_lr(self.scheduler.lr)  # fail-fast hyperparams validation

        loss_cfg = dict(s.LOSS_FUNC)
        loss_cls = get_callable_by_name(loss_cfg.pop("method"))
        self.loss_func = loss_cls(**loss_cfg)

        # multi-host: a 2-D (dcn, ici) mesh when several processes are
        # attached (jax.distributed) or DCN_MESH_SIZE forces one; the batch
        # axis shards over hosts first, then chips (SURVEY §2.7 mesh row)
        dcn_size = getattr(s, "DCN_MESH_SIZE", None)
        if dcn_size is None and jax.process_count() > 1:
            dcn_size = jax.process_count()
        self.mesh = best_mesh(dcn_axis="dcn" if dcn_size else None,
                              dcn_size=dcn_size)
        self.n_shards = int(self.mesh.devices.size) \
            if self.mesh is not None else 1
        # DP batch semantics: "pad" (default) keeps the reference global
        # batch (TRAIN_BATCH_SIZE) and pads it to the mesh with zero-weight
        # rows — gradients match the single-device run exactly; "scale"
        # interprets TRAIN_BATCH_SIZE per device (global = B * n_devices).
        # Either way every chip is in the mesh (no silent shrink).
        mode = getattr(s, "DP_BATCH_MODE", "pad")
        if mode not in ("pad", "scale"):
            raise ValueError(f"DP_BATCH_MODE must be 'pad' or 'scale', "
                             f"got {mode!r}")
        self.dp_batch_mode = mode
        b = int(getattr(s, "TRAIN_BATCH_SIZE", 1))
        self.loader_batch_size = b * self.n_shards if mode == "scale" else b
        if self.mesh is not None:
            self.logger.info(
                f"training mesh: {self.mesh} (batch mode {mode}, "
                f"global batch {self.loader_batch_size})")

        # multi-process: each process's loader reads ONLY its own rows of
        # the global batch (I/O scales as global_batch/process_count); the
        # identically-seeded sampler keeps the global index sequence
        # consistent across processes. _local_rows = ((lo, hi) of the
        # padded batch this process owns, padded size, its REAL row count).
        self._local_rows = None
        self._loader_row_range = None
        if self.mesh is not None and jax.process_count() > 1 and \
                bool(getattr(s, "PER_PROCESS_LOADING", True)):
            from ..core.mesh import local_batch_rows
            (lo, hi), padded = local_batch_rows(self.mesh,
                                                self.loader_batch_size)
            lo_eff = min(lo, self.loader_batch_size)
            hi_eff = min(hi, self.loader_batch_size)
            self._local_rows = ((lo, hi), padded, hi_eff - lo_eff)
            # always load >= 1 row so shapes exist even when this process
            # owns only padding (the extra row rides with weight 0)
            self._loader_row_range = (lo_eff, max(hi_eff, lo_eff + 1))
            self.logger.info(
                f"per-process loading: rows [{lo_eff}, {hi_eff}) of "
                f"{self.loader_batch_size} (padded {padded})")

        if getattr(s, "USE_GRAD_SCALER", False):
            # reference used torch.cuda.amp.GradScaler (job_runner.py:406);
            # bf16 on TPU keeps the f32 exponent range, so no loss scaling
            self.logger.info("USE_GRAD_SCALER requested: bf16 needs no loss "
                             "scaling on TPU (f32 exponent range); ignored.")

        self.model_status = MODEL_STATUS.RANDOM_INITIALIZED
        self.current_iteration = 0
        self.epoch_n = 0
        self._step_cache = {}
        self._build_train_step()
        self.logger.info("init finished (dtype=%s, devices=%d)",
                         self.compute_dtype.__name__, jax.device_count())

    def print_model_parameters(self, iteration):
        """Per-parameter histogram + mean/std scalars to the summary
        writer (reference job_runner.py:347-354 incl. the add_histogram
        at :352; JSONL quantile histograms when tensorboard is absent)."""
        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        for path, p in flat:
            name = "_".join(str(k.key) if hasattr(k, "key") else str(k)
                            for k in path)
            arr = np.asarray(p)
            self.summary_writer.add_histogram(name, arr, iteration)
            self.summary_writer.add_scalar(f"mean_{name}", float(arr.mean()),
                                           iteration)
            self.summary_writer.add_scalar(f"std_{name}", float(arr.std()),
                                           iteration)

    def _lr_states(self):
        """{group label: InjectHyperparamsState} the scheduler drives."""
        def unwrap(st):
            while not hasattr(st, "hyperparams") and hasattr(st, "inner_state"):
                st = st.inner_state
            return st

        if self._group_base_lrs is not None:
            return {k: unwrap(v)
                    for k, v in self.opt_state.inner_states.items()}
        return {"__default__": unwrap(self.opt_state)}

    def _set_lr(self, lr):
        """Write the scheduler lr into the injected optax hyperparams.

        Raises when the hyperparams layout is missing — a silently frozen
        learning rate is a wrong-training-run failure with zero signal.
        With optimizer groups, every group's lr is scaled by the same decay
        factor (torch ExponentialLR semantics: each param_group lr *= gamma).
        """
        base = self.scheduler.base_lr
        scale = lr / base if base else 0.0
        bases = self._group_base_lrs or {"__default__": base}
        for label, st in self._lr_states().items():
            if not hasattr(st, "hyperparams") or \
                    "learning_rate" not in st.hyperparams:
                raise RuntimeError(
                    f"optimizer state for group '{label}' exposes no injected"
                    " 'learning_rate' hyperparam; the LR schedule cannot be"
                    " applied (optax inject_hyperparams layout changed?)")
            st.hyperparams["learning_rate"] = jnp.asarray(
                bases.get(label, base) * scale, jnp.float32)

    def _build_train_step(self):
        # epoch-static loss config (e.g. the equivariance rescale size) keys
        # the jitted-step cache: same statics -> same compiled program
        key = self.loss_func.static_key() \
            if hasattr(self.loss_func, "static_key") else ()
        if key in self._step_cache:
            self.train_step = self._step_cache[key]
            return
        factors = [float(f) for f in self.settings.LOSS_FACTORS]
        loss_func = self.loss_func
        tx = self.tx

        # Multi-device: the step runs under shard_map with the batch axis
        # split over every mesh axis and params replicated — Pallas kernels
        # execute per-shard (GSPMD would gather around the custom calls),
        # BatchNorm stats pmean/psum over the axes (global-batch semantics,
        # exact vs single device), losses pool their batch statistics with
        # psum'd numerators/denominators, and the gradients are pmean'd
        # once before the optimizer update (see the note at the pmean:
        # with the loss psum'd inside, pmean — not psum — is exact).
        axes = tuple(self.mesh.axis_names) if self.mesh is not None else None
        if axes is not None:
            model = self.model.clone(
                axis_name=axes if len(axes) > 1 else axes[0])
        else:
            model = self.model

        def train_step(params, batch_stats, opt_state, images, lobes,
                       lesions, ctss, freq, weights, rng, img_span):
            # unpack the H2D wire (pack_train_batch): u16 image dequantizes
            # against the per-batch span; u8 masks cast back bit-exactly.
            # XLA fuses both into the first consumers — no HBM round trip.
            images = unpack_image_wire(images, img_span)
            lobes = lobes.astype(jnp.float32)
            lesions = lesions.astype(jnp.float32)

            def loss_fn(p):
                carry = {"bs": batch_stats}

                def model_fn(im, lo):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": carry["bs"]},
                        im, lo, mutable=["batch_stats"],
                        rngs={"dropout": rng})
                    carry["bs"] = mut["batch_stats"]
                    return out

                losses = loss_func(model_fn, images, lobes, lesions, ctss,
                                   ctss_frequency=freq, rng=rng,
                                   sample_weight=weights,
                                   axis_name=model.axis_name)
                # Extra factors are legal (the reference ships 4 factors for
                # the 2-term IntRegRefineLoss); fewer factors than losses
                # would silently drop a loss term from the objective.
                if len(losses) > len(factors):
                    raise ValueError(
                        f"{type(loss_func).__name__} returns {len(losses)} "
                        f"loss terms but LOSS_FACTORS has only {len(factors)}"
                        " entries; zip would silently drop a loss from the "
                        "objective — extend LOSS_FACTORS in the settings")
                total = sum(l * f for l, f in zip(losses, factors))
                return total, (jnp.stack(losses), carry["bs"])

            (loss, (losses, new_bs)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)
            if axes is not None:
                # Under shard_map, psum transposes to psum: because the
                # loss is the psum'd GLOBAL objective, each shard's grad
                # comes back as N x (its local contribution). pmean —
                # not psum — therefore yields exactly the global
                # gradient: (1/N) * sum_i N*g_i = sum_i g_i. Verified
                # against the single-device step in
                # tests/test_fused_stack.py::TestFusedDPExact and
                # tests/test_train.py.
                grads = jax.lax.pmean(grads, axes)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt_state, loss, losses

        donate = (0, 1, 2)
        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            bspec = P(axes)
            repl = P()
            step = shard_map(
                train_step, mesh=self.mesh,
                in_specs=(repl, repl, repl, bspec, bspec, bspec, bspec,
                          repl, bspec, repl, bspec),
                out_specs=(repl, repl, repl, repl, repl),
                check_vma=False)
            self.train_step = jax.jit(step, donate_argnums=donate)
        else:
            self.train_step = jax.jit(train_step, donate_argnums=donate)
        self._step_cache[key] = self.train_step

    # ------------------------------------------------------------------
    def model_state_tree(self):
        return {"params": serialization.to_state_dict(self.params),
                "batch_stats": serialization.to_state_dict(self.batch_stats)}

    def update_model_state(self, **kwargs):
        state = {
            "epoch": self.epoch_n,
            "iteration": self.current_iteration,
            "model": self.model_state_tree(),
            "optimizer": serialization.to_state_dict(self.opt_state),
            "scheduler": self.scheduler.state_dict(),
            "metrics": dict(self.model_metrics_save_dict),
        }
        state.update(kwargs)
        return state

    def save_model(self, **kwargs):
        state = self.update_model_state(**kwargs)
        path = os.path.join(self.exp_path, f"{self.epoch_n}.ckpt")
        save_checkpoint(path, state)
        self.logger.info(f"saved model into {path}.")

    def reload_model_from_cache(self):
        s = self.settings
        if not getattr(s, "RELOAD_CHECKPOINT", False):
            self.epoch_n = 0
            self.current_iteration = 0
            return
        cpk_path = getattr(s, "RELOAD_CHECKPOINT_PATH", None)
        if cpk_path is None:
            cpk_path = newest_checkpoint(self.exp_path)
            if cpk_path is None:
                raise RuntimeError(f"{self.exp_path} has no checkpoint files.")
        self.logger.info(f"reloading model from {cpk_path}.")
        saved = load_checkpoint(cpk_path)

        reload_keys = getattr(s, "RELOAD_DICT_LIST", ["model"])
        if "model" in reload_keys and "model" in saved:
            merged = tolerant_merge(self.model_state_tree(), saved["model"],
                                    log=self.logger.info)
            self.params = serialization.from_state_dict(self.params,
                                                        merged["params"])
            self.batch_stats = serialization.from_state_dict(
                self.batch_stats, merged["batch_stats"])
            self.logger.info("=> loaded model")
        if "optimizer" in reload_keys and "optimizer" in saved:
            try:
                self.opt_state = serialization.from_state_dict(
                    self.opt_state, saved["optimizer"])
                self.logger.info("=> loaded optimizer")
            except Exception as e:
                self.logger.warning(f"optimizer reload failed ({e}); fresh state")
        if "metrics" in reload_keys and "metrics" in saved:
            self.model_metrics_save_dict.update(saved["metrics"])
        if "scheduler" in saved:
            self.scheduler.load_state_dict(saved["scheduler"])
        self.epoch_n = int(saved.get("epoch", 0))
        self.current_iteration = int(saved.get("iteration", 0))
        self.model_status = MODEL_STATUS.RELOAD_PRETRAINED

    def run(self):
        raise NotImplementedError

    def run_job(self):
        try:
            self.run()
        except Exception:
            self.logger.exception("training encountered exception.")


class LesionSegChunkTrain(JobRunner):
    """Chunk training runner (reference LesionSegChunkTrain,
    job_runner.py:500-811)."""

    def __init__(self, settings_module=None, setting_module_file_path=None,
                 **kwargs):
        super().__init__(setting_module_file_path, settings_module)
        self.init()
        self.reload_model_from_cache()
        self.trace = False
        self.reset_data()
        self.logger.info(
            f"batchsize:{self.settings.TRAIN_BATCH_SIZE}, "
            f"input_resize:{self.settings.RESAMPLE_SIZE}")
        self._load_records()

    def _load_records(self):
        import pandas as pd
        rec = self.exp_path + "/records.csv"
        self.train_records = pd.read_csv(rec) if os.path.exists(rec) \
            else pd.DataFrame(columns=["epoch"])

    # -- data ----------------------------------------------------------
    def preprocessing(self):
        s = self.settings
        return [T.Windowing(min=s.WINDOWING_MIN, max=s.WINDOWING_MAX),
                T.Resample(mode=s.RESAMPLE_MODE, factor=s.RESAMPLE_SPACING,
                           size=s.RESAMPLE_SIZE)]

    def val_preprocessing(self):
        s = self.settings
        return [T.Resample(mode="fixed_spacing", factor=s.RESAMPLE_SPACING,
                           size=s.RESAMPLE_SIZE)]

    def post_preprocessing(self):
        return [T.RemoveMeta()]

    def get_data_transforms(self, is_train):
        if is_train:
            aug = T.ensemble_augmentation(getattr(self.settings, "AUG_RATIO", 0))
            return T.Compose(self.preprocessing() + [aug] +
                             self.post_preprocessing())
        return T.Compose(self.val_preprocessing())

    def reset_data(self):
        """Per-epoch dataset + balanced-sampler rebuild. Dataset and sampler
        classes are config-selectable (TRAIN_DATASET_CLS / SAMPLER_CLS) so
        the COPDGene emphysema-subtyping workload runs through the same
        trainer (reference used separate hardcoded wiring)."""
        s = self.settings
        ds_cls = get_callable_by_name(getattr(
            s, "TRAIN_DATASET_CLS",
            "dram_tpu.data.datasets.RadboudCOVIDLobeVesselChunk"))
        sampler_cls = get_callable_by_name(getattr(
            s, "SAMPLER_CLS", "dram_tpu.data.sampler.LobeChunkCTSSSampler"))
        memo_csv = getattr(s, "TRAIN_MEMO_CSV",
                           os.path.join(s.DB_PATH, "wss_chunk", "memo.csv"))
        tr_uids = ds_cls.get_series_uids(memo_csv)
        tr_dataset = ds_cls(
            s.DB_PATH, tr_uids, transforms=self.get_data_transforms(True))
        # deterministic per-epoch resampling: reproducible given RANDOM_SEED
        # re-draw the loss's epoch-static transform config (equivariance
        # rescale op: keep-prob + per-axis size pool, reference
        # metrics.py:224-231) and swap in the matching jitted step
        if hasattr(self.loss_func, "epoch_reseed"):
            self.loss_func.epoch_reseed(
                getattr(s, "RANDOM_SEED", 33) + 7919 * self.epoch_n)
            self._build_train_step()

        sampler_seed = getattr(s, "RANDOM_SEED", 33) + 9973 * self.epoch_n
        sampler = sampler_cls(
            self.logger, tr_dataset, self.loader_batch_size,
            balance_label_count=s.BALANCED_LABEL_COUNT, seed=sampler_seed)
        self.ctss_frequency_map = sampler.ctss_frequency_map
        self.ctss_frequency_array = sampler.frequency_array()
        self.class_weights = sampler.class_weights
        # wire packing (quantize + stack) runs inside the loader's producer
        # threads, overlapped with device compute; the mask-wire latch is
        # per-run sticky so the wire dtype flips at most once (one retrace)
        wire = self._train_wire
        if not hasattr(self, "_mask_latch"):
            self._mask_latch = MaskWireLatch(log=self.logger.warning)
        latch = self._mask_latch

        def collate_packed(samples):
            return pack_train_batch(collate_dict(samples), wire, latch)

        self.tr_loader = DataLoader(
            tr_dataset, sampler, batch_size=self.loader_batch_size,
            drop_last=True, num_workers=getattr(s, "NUM_WORKERS", 4) or 0,
            collate_fn=collate_packed,
            row_range=self._loader_row_range)
        self.num_steps = len(self.tr_loader)

        val_cls = get_callable_by_name(getattr(
            s, "VAL_DATASET_CLS", "dram_tpu.data.datasets.RadboudCOVID"))
        self.val_dataset = val_cls(
            s.DB_PATH, val_cls.get_series_uids(s.VALID_CSV),
            transforms=self.get_data_transforms(False), keep_sorted=True)

    # -- train ---------------------------------------------------------
    def _unpack_wire(self, images, span):
        """Host-side inverse of the u16 image wire (for trace dumps) —
        the same arithmetic the train step traces (unpack_image_wire)."""
        return unpack_image_wire(jnp.asarray(images),
                                 jnp.asarray(np.asarray(span, np.float32)))

    def _device_batch(self, batch):
        if not batch.get("_packed"):
            batch = pack_train_batch(batch, self._train_wire)
        arrays = (batch["images"], batch["lobes"], batch["lesions"],
                  batch["ctss"], batch["span"])
        if self.mesh is not None:
            if self._local_rows is not None:
                # per-process sampler sharding: `batch` holds ONLY this
                # process's rows of the global batch; pad up to the local
                # shard size with wrapped weight-0 rows and assemble the
                # global array from the local shards (zero redundant I/O)
                (lo, hi), padded, n_real = self._local_rows
                n_local = hi - lo
                b = int(arrays[0].shape[0])
                idx = np.arange(n_local) % max(b, 1)
                weights = np.zeros(n_local, np.float32)
                weights[:n_real] = 1.0
                arrays = tuple(np.asarray(a)[idx] for a in arrays)
                sharded = shard_batch_arrays(
                    self.mesh, arrays + (weights,),
                    local_rows=((lo, hi), padded))
            else:
                arrays, weights = pad_batch(arrays, self.n_shards)
                sharded = shard_batch_arrays(self.mesh, arrays + (weights,))
            im, lob, les, ct, span, w = sharded
            return im, lob, les, ct, w, span
        weights = np.ones(arrays[0].shape[0], np.float32)
        im, lob, les, ct, span = (jnp.asarray(a) for a in arrays)
        return im, lob, les, ct, jnp.asarray(weights), span

    def _dump_train_trace(self, images, lobes, step_rng, step_idx,
                          max_samples=2):
        """Train-time attention-heatmap + transform-overlay trace
        (reference models.py:520-546 apply_attention trace_path dumps and
        metrics.py:258-295 IntRegAffLoss overlays, driven by TRACE): on a
        trace step, run the eval forward on the current training batch and
        tile the dense vs refined CAMs; for equivariance losses, also dump
        the original-vs-transformed image overlay + the drawn transform."""
        from ..core.ops import windowing_np
        from ..viz import draw_mask_tile_singleview_heatmap
        trace_dir = os.path.join(self.debug_path, "train_trace",
                                 f"{self.epoch_n}_{step_idx}")
        os.makedirs(trace_dir, exist_ok=True)
        dense, refined = self.model_eval.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            images[:max_samples], lobes[:max_samples])
        d_np = np.asarray(dense, np.float32)[..., 0]
        r_np = np.asarray(refined, np.float32)[..., 0]
        im_np = np.asarray(images, np.float32)[:max_samples, ..., 0]
        lo_np = np.asarray(lobes, np.float32)[:max_samples, ..., 0] > 0
        for i in range(d_np.shape[0]):
            draw_mask_tile_singleview_heatmap(
                windowing_np(im_np[i], from_span=(0, 1)).astype(np.uint8),
                [[(windowing_np(d_np[i], from_span=None) *
                   lo_np[i]).astype(np.uint8)],
                 [(windowing_np(r_np[i], from_span=None) *
                   lo_np[i]).astype(np.uint8)]],
                r_np[i] > 0, 5, os.path.join(trace_dir, f"sample_{i}"),
                titles=["dram", "dram_refine"])
        if hasattr(self.loss_func, "_transform"):
            T = self.loss_func._transform(step_rng, images.shape[1:4])
            aff = np.asarray(T(images[:max_samples]), np.float32)[..., 0]
            for i in range(aff.shape[0]):
                draw_mask_tile_singleview_heatmap(
                    windowing_np(aff[i], from_span=(0, 1)).astype(np.uint8),
                    [[np.zeros_like(aff[i], np.uint8)]], aff[i] > -1e8, 5,
                    os.path.join(trace_dir, f"sample_{i}_transformed"),
                    titles=["transformed"])
            with open(os.path.join(trace_dir, "transform.txt"), "wt") as fp:
                fp.write(f"keep={np.asarray(T.keep).tolist()}, "
                         f"flip_variant={int(T.flip_variant)}, "
                         f"rescale_size={T.rescale_size}\n")

    def train(self):
        batch_time, data_time, loss_record = \
            AverageMeter(), AverageMeter(), AverageMeter()
        freq = jnp.asarray(self.ctss_frequency_array)
        trace_on = bool(getattr(self.settings, "TRACE", False))
        trace_steps = getattr(self.settings, "TRACE_STEPS", 0)
        profile_dir = getattr(self.settings, "PROFILE_DIR", None)
        if profile_dir and self.epoch_n == getattr(self.settings,
                                                   "PROFILE_EPOCH", 1):
            jax.profiler.start_trace(profile_dir)
            self._profiling = True
        end = time.time()
        pending = None  # (loss, losses, n): sync deferred by one step so
        # the host overlaps the next batch's packing/H2D with device compute
        for step_idx, batch in enumerate(self.tr_loader):
            data_time.update(time.time() - end)
            images, lobes, lesions, ctss, weights, span = \
                self._device_batch(batch)
            self.rng, step_rng = jax.random.split(self.rng)
            # per-CALL transform sampling (reference metrics.py:224-231
            # draws the equivariance rescale size every call): redraw the
            # shape-changing rescale per step; the jitted-step cache keyed
            # on the drawn size bounds compiles to one per distinct size
            if hasattr(self.loss_func, "epoch_reseed"):
                if self.loss_func.epoch_reseed(
                        getattr(self.settings, "RANDOM_SEED", 33)
                        + 7919 * self.epoch_n + 104729 * step_idx):
                    self._build_train_step()
            self._set_lr(self.scheduler.lr)
            (self.params, self.batch_stats, self.opt_state, loss, losses) = \
                self.train_step(self.params, self.batch_stats, self.opt_state,
                                images, lobes, lesions, ctss, freq, weights,
                                step_rng, span)
            self.current_iteration += 1
            if trace_on and (step_idx == 0 or (
                    trace_steps and step_idx % trace_steps == 0)):
                try:
                    self._dump_train_trace(
                        self._unpack_wire(images, span),
                        lobes.astype(jnp.float32), step_rng, step_idx)
                except Exception as e:
                    self.logger.warning(f"train trace failed: {e}")
            if pending is not None:
                loss_record.update(float(pending[0]), pending[2])
            pending = (loss, losses, images.shape[0])
            batch_time.update(time.time() - end)
            end = time.time()
            if self.current_iteration % self.settings.LOG_STEPS == 0:
                # forces a sync — only every LOG_STEPS steps. The running
                # average INCLUDES the still-pending step (its update is
                # deferred), matching the reference's loss_record cadence
                cur = float(pending[0])
                avg = (loss_record.sum + cur * pending[2]) / \
                    max(loss_record.count + pending[2], 1)
                lv = [f"{float(l):.5f}" for l in pending[1]]
                self.logger.info(
                    f"Epoch: [{self.epoch_n}][{step_idx}], "
                    f"Time {batch_time.val:.3f} ({data_time.avg:.3f}) "
                    f"Loss {cur:.6f} ({avg:.6f}), "
                    f"losses: {lv}")
        if pending is not None:
            loss_record.update(float(pending[0]), pending[2])
        if getattr(self, "_profiling", False):
            jax.profiler.stop_trace()
            self._profiling = False
        self.model_status = MODEL_STATUS.TRAINING
        return {"tr_loss": loss_record.avg, "tr_data_time": data_time.avg,
                "tr_batch_time": batch_time.avg}

    # -- validation ----------------------------------------------------
    def _eval_forward(self):
        if not hasattr(self, "_eval_fwd"):
            model_eval = self.model_eval

            @jax.jit
            def fwd(params, batch_stats, image, lobe):
                dense, refined = model_eval.apply(
                    {"params": params, "batch_stats": batch_stats},
                    image, lobe)
                return jax.nn.sigmoid(refined)

            self._eval_fwd = fwd
        return self._eval_fwd

    def _val_pipeline(self):
        """FastScanPipeline sharing the inference engine's compiled
        stage2pre/stage2model programs for validation, with the trainer's
        live params swapped in per call (SURVEY L2: 'full-scan val via
        the same inference engine as test')."""
        if not hasattr(self, "_val_pipe"):
            from ..infer.fast import FastScanPipeline
            s = self.settings
            self._val_pipe = FastScanPipeline(
                self.model_eval, self.params, self.batch_stats,
                chunk_size=tuple(s.RESAMPLE_SIZE),
                windowing_span=(s.WINDOWING_MIN, s.WINDOWING_MAX),
                pad_value=float(s.PAD_VALUE))
        self._val_pipe.params = self.params
        self._val_pipe.batch_stats = self.batch_stats
        self._val_pipe._dev_params.clear()
        return self._val_pipe

    def evaluate_scan(self, scan_data):
        """Full-scan ordinal validation (reference job_runner.py:720-779):
        by default one batched 5-lobe pass through the shared inference
        pipeline (chunk wire); the reference-shaped host-stitch loop
        remains behind VAL_USE_FAST_PIPELINE=False and for TRACE runs
        (whose per-lobe overlay dumps live on that path)."""
        if self.trace or not getattr(self.settings,
                                     "VAL_USE_FAST_PIPELINE", True):
            return self._evaluate_scan_hoststitch(scan_data)
        from ..infer.fast import prep_scan_chunks
        s = self.settings
        meta = scan_data["meta"]
        now = time.time()
        pipe = self._val_pipeline()
        prep = prep_scan_chunks(
            np.asarray(scan_data["#image"], np.int16),
            np.asarray(scan_data["#lobe_reference"], np.uint8),
            meta["spacing"], pad_value=s.PAD_VALUE,
            windowing_span=(s.WINDOWING_MIN, s.WINDOWING_MAX),
            chunk_size=tuple(s.RESAMPLE_SIZE), crop_border_mm=5.0)
        pred_ratio = pipe.process_chunks_val(prep)
        reg_cls_pred = ratio_to_label([pred_ratio])[0]
        target = int(float(meta["cle"])) if "cle" in meta else \
            int(float(meta["patient_meta"]["cle"]))
        self.logger.info(f"val scan {meta['uid']}: reg_cls_pred "
                         f"{reg_cls_pred}, target {target}")
        return reg_cls_pred, target, time.time() - now

    def _evaluate_scan_hoststitch(self, scan_data):
        s = self.settings
        scan = scan_data["#image"]
        lobe = scan_data["#lobe_reference"]
        meta = scan_data["meta"]
        now = time.time()
        fwd = self._eval_forward()
        pre = T.Compose(self.preprocessing())
        htp = np.zeros(scan.shape, np.float32)
        epoch_debug_path = os.path.join(self.debug_path, str(self.epoch_n))
        for lobe_label in np.unique(lobe)[1:]:
            lobe_binary = lobe == lobe_label
            crop = find_crops_np(lobe_binary, meta["spacing"], 5)
            lobe_chunk = lobe_binary[crop]
            scan_chunk = scan[crop].copy()
            crop_size = lobe_chunk.shape
            scan_chunk[lobe_chunk == 0] = s.PAD_VALUE
            ret = pre({"#image": scan_chunk.astype(np.int16),
                       "#lobe_reference": lobe_chunk.astype(np.uint8),
                       "meta": {"size": scan_chunk.shape,
                                "spacing": meta["spacing"]}})
            if self.trace:
                # lobe-overlay trace tiles (reference job_runner.py:754-763)
                from ..viz import draw_mask_tile_single_view
                from ..core.ops import windowing_np
                v_scan = np.asarray(ret["#image"], np.float32)
                v_lobe = np.asarray(ret["#lobe_reference"])
                draw_mask_tile_single_view(
                    windowing_np(v_scan, from_span=(0, 1)),
                    [[(v_lobe > 0).astype(np.uint8)]], v_lobe > 0, 5,
                    os.path.join(epoch_debug_path,
                                 f"{meta['uid']}_{lobe_label}"),
                    colors=[(0, 0, 255)], thickness=[-1], coord_axis=0,
                    alpha=0.3, titles=["lobe"])
            probs = fwd(self.params, self.batch_stats,
                        jnp.asarray(ret["#image"][None, ..., None],
                                    jnp.float32),
                        jnp.asarray(ret["#lobe_reference"][None, ..., None],
                                    jnp.float32))
            probs = np.asarray(probs)[0, ..., 0]
            probs = resize3d_np(probs, crop_size, "trilinear")
            mask = lobe_chunk > 0
            htp[crop][mask] = probs[mask]
        lung = lobe > 0
        pred_ratio = float((htp * lung).sum() / max(lung.sum(), 1))
        reg_cls_pred = ratio_to_label([pred_ratio])[0]
        target = int(float(meta["cle"])) if "cle" in meta else \
            int(float(meta["patient_meta"]["cle"]))
        self.logger.info(f"val scan {meta['uid']}: reg_cls_pred {reg_cls_pred},"
                         f" target {target}")
        return reg_cls_pred, target, time.time() - now

    def validate(self):
        self.logger.info(f"validating {len(self.val_dataset)} scans at epoch "
                         f"{self.epoch_n}")
        val_time = AverageMeter()
        preds, targets = [], []
        for i in range(len(self.val_dataset)):
            p, t, dt = self.evaluate_scan(self.val_dataset[i])
            preds.append(p)
            targets.append(t)
            val_time.update(dt, 1)
        epoch_debug = os.path.join(self.debug_path, str(self.epoch_n)) + "/"
        os.makedirs(epoch_debug, exist_ok=True)
        acc = float(np.mean(np.asarray(preds) == np.asarray(targets)))
        try:
            plot_confusion_matrix_from_data(
                targets, preds, labels=list(range(6)),
                save_path=epoch_debug + "cm_reg_cls")
        except Exception as e:
            self.logger.warning(f"confusion-matrix plot failed: {e}")
        v = {"val_time": val_time.avg, "val_acc_reg_cls": acc}
        self.logger.info(f"val_metrics: {v}")
        return v

    # -- epochs ----------------------------------------------------------
    def run(self):
        s = self.settings
        self.logger.info(f"running epochs {self.epoch_n}..{s.NUM_EPOCHS}")
        import pandas as pd
        for epoch_n in range(self.epoch_n, s.NUM_EPOCHS):
            self.epoch_n = epoch_n
            self.reset_data()
            tr_metrics = self.train()
            if (epoch_n % s.VAL_EPOCHS == 0 or epoch_n == s.NUM_EPOCHS - 1
                    or epoch_n < 15):
                val_metrics = self.validate()
                if val_metrics:
                    self.model_metrics_save_dict.update(val_metrics)
                    self.model_metrics_save_dict.update(tr_metrics)
                    self.summary_writer.add_scalars("val_metrics", val_metrics,
                                                    global_step=epoch_n)
                    self.summary_writer.add_scalars("tr_metrics", tr_metrics,
                                                    global_step=epoch_n)
                    row = {"epoch": epoch_n,
                           "iteration": self.current_iteration,
                           "learning_rate": self.scheduler.lr}
                    row.update(self.model_metrics_save_dict)
                    self.train_records = pd.concat(
                        [self.train_records, pd.DataFrame([row])],
                        ignore_index=True)
                    self.train_records.to_csv(self.exp_path + "/records.csv",
                                              index=False)
                self.scheduler.step()
            # PARAM_LOG_EPOCHS > 0: per-parameter histogram + mean/std
            # dump every N epochs. Default 0 (off) matches the reference,
            # where print_model_parameters (job_runner.py:347-354) exists
            # but is never called from the run loop.
            ple = int(getattr(s, "PARAM_LOG_EPOCHS", 0) or 0)
            if ple > 0 and epoch_n % ple == 0:
                self.print_model_parameters(self.current_iteration)
            if epoch_n % s.STATE_EPOCHS == 0 or epoch_n == s.NUM_EPOCHS - 1:
                self.save_model()
        self.logger.info(f"Training stops at epoch {self.epoch_n}.")
