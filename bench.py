#!/usr/bin/env python3
"""Headline benchmark: CT volumes/min/chip, prep -> lesion mask, end-to-end.

Runs the flagship DC3DATGeneric pipeline on synthetic 512x512x400-class
thorax scans — the BASELINE.json driver metric — in production shape: a
host prep thread (C++ iso resample + chunk-wire packing,
dram_tpu.infer.fast.prep_scan_chunks) prefetches upcoming scans while the
chip runs the batched per-lobe chunk pipeline for the current one;
outputs come back bit-packed.

TAIL CONTRACT (the driver parses the LAST bare JSON line of the combined
stdout+stderr tail — round 4 lost the headline because the train record
printed a bare JSON line after it):
  * the headline
      {"metric": "ct_volumes_per_min_per_chip", "value": ..., ...}
    is printed TWICE on stdout — once right after the timed loop (crash
    insurance: a later diagnostics failure can never lose it) and once
    as the ABSOLUTE FINAL line of the run;
  * every other JSON-ish diagnostic line is prefixed with `# ` so it can
    never be mistaken for the headline;
  * a compact `# ==== bench summary ====` block right before the final
    headline repeats every key line (setup, stage medians, control
    median, parity lines, train record) so they sit inside the driver's
    tail window even after verbose phases.

vs_baseline = measured volumes/min over the 12 volumes/min implied by the
driver's 5 s/scan target (BASELINE.md); > 1.0 beats the target.

Diagnosability (all on stderr):
  * `# xla-cache HIT/MISS <module>` per jitted program at setup — a stale
    warm_cache/ seed is loud instead of silently costing minutes. After
    the timed loop HIT lines are suppressed (counts only): the train
    microbench's init emits hundreds of tiny-program HITs that scrolled
    the round-4 telemetry out of the tail window;
  * per-scan stage split in the timed loop: prep / h2d / dispatch /
    device-wait / d2h ms, plus the scan's geometry — tunnel stalls,
    prep starvation, and program swaps become attributable;
  * a fixed-geometry CONTROL loop after the clock (geometry 0 only) to
    calibrate tunnel state against the mixed-geometry headline;
  * wire parity lines at the production geometry (Dice + differing-
    voxel counts; BENCH_PARITY=0 skips): wc vs p12 — the LOSSLESS pair,
    gate Dice >= 0.995 — and wc vs w8, attributing the u8 iso wire's
    documented 1/255 windowing quantization;
  * a fast-vs-slow parity line: the same production-geometry scan
    through the reference-shaped host-stitch path (engine.process_scan
    semantics, dram/job_runner.py:906-1068) vs the wc pipeline
    (BENCH_PARITY=0 skips);
  * a training-throughput record (flagship train step, ms/step +
    chunks/s; BENCH_TRAIN=0 skips) as a `# train-record`-prefixed line.

Knobs (all env vars, defaults in parens): BENCH_SCANS (12) / BENCH_CONTROL
(6) timed-loop lengths, BENCH_MIXED=1 shape-heterogeneous worklist,
BENCH_WIRE (wc | w8 | p12), BENCH_FDEPTH (2) / BENCH_PDEPTH (2) in-flight
finish / prep stage depths (raise FDEPTH when a degraded tunnel stretches
the packed-mask D2H RPC to seconds), BENCH_PARITY / BENCH_TRAIN (1) phase
gates, BENCH_RANDOM_WEIGHTS=1 to skip the trained-weights asset.
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def load_bench_weights():
    """Trained flagship weights from assets/bench_weights.ckpt.xz
    (tools/export_bench_weights.py), params cast back to f32; None when
    the asset is absent or BENCH_RANDOM_WEIGHTS=1.

    Trained weights make the CAM bimodal, so the Otsu threshold the
    parity gates depend on sits in a histogram valley (stable under
    1/255 wire quantization) — deployment conditions, instead of the
    random-init chatter that dominated the round-4 parity numbers."""
    if os.environ.get("BENCH_RANDOM_WEIGHTS", "0") == "1":
        return None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "assets", "bench_weights.ckpt.xz")
    try:
        import lzma

        import jax
        import numpy as np
        from flax import serialization
        with open(path, "rb") as fp:
            tree = serialization.msgpack_restore(lzma.decompress(fp.read()))
        tree["params"] = jax.tree.map(
            lambda a: a.astype(np.float32)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
            tree["params"])
        return tree
    except FileNotFoundError:
        return None
    except Exception as e:
        _err(f"# bench weights load failed ({e!r}); using random init")
        return None


def build_pipeline(chunk=(80, 80, 80), at=(64, 64, 64), dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from dram_tpu.infer.fast import FastScanPipeline
    from dram_tpu.models import DC3DATGeneric

    on_tpu = jax.default_backend() == "tpu"
    model = DC3DATGeneric(train=False, at_spatial_size=at,
                          use_pallas_attention=on_tpu,
                          use_pallas_conv=on_tpu,
                          use_fused_stack=on_tpu,
                          dtype=jnp.bfloat16 if dtype == "bfloat16"
                          else jnp.float32)
    variables = load_bench_weights()
    if variables is None:
        _err("# bench weights: RANDOM INIT (parity gates measure Otsu "
             "bin chatter at random init; ship assets/bench_weights)")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, *chunk, 1),
                                                  jnp.float32))
    else:
        _err("# bench weights: assets/bench_weights.ckpt.xz (trained)")
    return FastScanPipeline(model, variables["params"],
                            variables["batch_stats"], chunk_size=chunk,
                            windowing_span=(-1000, -700))


def synth_scan(shape=(400, 512, 512), seed=0):
    """Synthetic thorax scan; disk-cached (~40 s to synthesize, ~1 s to
    load) — setup cost, not part of the timed throughput loop."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    path = os.path.join(cache, "synth_%s_%d.npz"
                        % ("x".join(map(str, shape)), seed))
    try:
        with np.load(path) as z:
            return z["scan"], z["lobe"]
    except Exception:
        pass
    from dram_tpu.data.prepare_data import _synth_scan
    rng = np.random.default_rng(seed)
    scan, lobe, lesion, vessel, sev = _synth_scan(
        rng, shape, lesion_severity=[3, 4, 2, 5, 3])
    try:
        os.makedirs(cache, exist_ok=True)
        np.savez(path, scan=scan, lobe=lobe)
    except Exception:
        pass
    return scan, lobe


# mixed-geometry mode (BENCH_MIXED=1): six distinct scan geometries —
# slice counts 320-448, spacings 0.6-1.0 mm — so the shape-keyed program
# caches CANNOT all hit one compiled variant; the timed loop then includes
# any per-geometry compile/executable-load stalls, and the variant count
# is reported (VERDICT: shape-heterogeneous deployments were unproven).
MIXED_GEOMS = [
    ((320, 512, 512), (1.0, 0.80, 0.80)),
    ((352, 512, 512), (0.9, 0.70, 0.70)),
    ((384, 512, 512), (0.8, 0.75, 0.75)),
    ((400, 512, 512), (0.8, 0.70, 0.70)),
    ((416, 512, 512), (0.7, 0.65, 0.65)),
    ((448, 512, 512), (0.6, 0.60, 0.60)),
]


def _err(line):
    print(line, file=sys.stderr, flush=True)


def wire_parity_check(pipe, scan, lobe, spacing, span, wc_out, wire="p12"):
    """wc vs an iso-scan wire on the production geometry (VERDICT r4 #5:
    re-assert the wire bounds at 512-class scale on hardware each round).

    wire="p12": the LOSSLESS pair — p12 ships exact integer-HU iso, wc
    ships full-precision windowed bf16 chunks; both reproduce the
    reference windowing math, so residual differences are f32 lerp ulps
    (gate: Dice >= 0.995). wire="w8": the u8 iso wire's documented
    1/255 windowing quantization (a bandwidth trade for narrow links) —
    reported for attribution, expected slightly below the lossless pair.
    Reference post rules being compared: dram/job_runner.py:1008-1014."""
    import jax
    from dram_tpu.data.hostprep import prep_scan

    t0 = time.time()
    prep = prep_scan(scan, lobe, spacing,
                     windowing_span=span if wire == "w8" else None)
    prep["packed_scan"] = jax.device_put(prep["packed_scan"])
    prep["packed_lobe"] = jax.device_put(prep["packed_lobe"])
    other = pipe.process_prepped(prep, unpack=True)
    lines = []
    for name in ("pred", "post"):
        a = wc_out[name].astype(bool)
        b = other[name].astype(bool)
        inter = int(np.logical_and(a, b).sum())
        na, nb = int(a.sum()), int(b.sum())
        dice = 2.0 * inter / max(na + nb, 1)
        diff = int(np.logical_xor(a, b).sum())
        lines.append(f"{name}: dice={dice:.4f} voxdiff={diff} "
                     f"(wc={na} {wire}={nb})")
    label = "wc vs p12 (lossless wires)" if wire == "p12" \
        else "wc vs w8 (u8 iso wire, its documented 1/255 quantization)"
    return (f"# wire-parity {label} @ {scan.shape}: " + "; ".join(lines)
            + f" [{time.time() - t0:.1f}s incl. compile/load]")


def slow_path_parity_check(pipe, scan, lobe, spacing, span, wc_out):
    """Fast wc pipeline vs the reference-shaped host-stitch path on the
    production geometry (VERDICT r4 #5: the fast-vs-slow Dice gate ran
    only on small synthetic volumes in tests; drive it at 512-class scale
    on hardware, in the round artifact). The slow path mirrors
    engine.process_scan semantics — host iso resample, per-lobe crop +
    fixed-size chunk resample, B=1 forwards, host stitch + Otsu +
    threshold, nearest resample back — modelling the reference chain
    dram/job_runner.py:906-1068."""
    import jax
    import jax.numpy as jnp
    from dram_tpu.core.ops import binary_cam_np, find_crops_np
    from dram_tpu.core.resample import resize3d_np
    from dram_tpu.data import transforms as T
    from dram_tpu.data.transforms import resample_array
    from dram_tpu.losses.interval_reg import ratio_to_label

    t0 = time.time()
    chunk = pipe.chunk_size
    iso_t = T.Resample(mode="fixed_spacing", factor=1.0)
    s = iso_t({"#image": scan.astype(np.int16),
               "#lobe_reference": lobe.astype(np.uint8),
               "meta": {"size": scan.shape, "spacing": spacing}})
    iso_scan, iso_lobe = s["#image"], s["#lobe_reference"]
    iso_spacing = s["meta"]["spacing"]
    htp = np.zeros(iso_scan.shape, np.float32)
    pre = T.Compose([T.Windowing(min=span[0], max=span[1]),
                     T.Resample(mode="fixed_size", factor=1.0, size=chunk)])

    @jax.jit
    def fwd1(params, batch_stats, image, lb):
        _, refined = pipe.model_eval.apply(
            {"params": params, "batch_stats": batch_stats}, image, lb)
        return refined

    for li in range(1, 6):
        m = iso_lobe == li
        if not m.any():
            continue
        crop = find_crops_np(m, iso_spacing, 5)
        lobe_chunk = m[crop]
        scan_chunk = iso_scan[crop].copy()
        scan_chunk[~lobe_chunk] = pipe.pad_value
        ret = pre({"#image": scan_chunk.astype(np.int16),
                   "#lobe_reference": lobe_chunk.astype(np.uint8),
                   "meta": {"size": scan_chunk.shape,
                            "spacing": iso_spacing}})
        refined = fwd1(pipe.params, pipe.batch_stats,
                       jnp.asarray(ret["#image"][None, ..., None],
                                   jnp.float32),
                       jnp.asarray(ret["#lobe_reference"][None, ..., None],
                                   jnp.float32))
        out = np.asarray(refined, np.float32)[0, ..., 0]
        lb = ret["#lobe_reference"] > 0
        probs = 1.0 / (1.0 + np.exp(-out))
        ratio = float(probs[lb].mean()) if lb.any() else 0.0
        cam = resize3d_np(out, scan_chunk.shape, "trilinear")
        cam = np.maximum(cam, 0.0)
        if cam.max() > 0:
            cam = cam / cam.max()
        if ratio_to_label([ratio])[0] == 0:
            cam[:] = 0.0
        htp[crop][lobe_chunk] = cam[lobe_chunk]
    lung = iso_lobe > 0
    _, th = binary_cam_np(htp[lung])
    pred_iso = (htp > th).astype(np.uint8)
    pred_slow, _ = resample_array(pred_iso, (1.0, 1.0, 1.0),
                                  list(spacing), list(scan.shape), "nearest")
    a = wc_out["pred"].astype(bool)
    b = pred_slow.astype(bool)
    inter = int(np.logical_and(a, b).sum())
    na, nb = int(a.sum()), int(b.sum())
    dice = 2.0 * inter / max(na + nb, 1)
    diff = int(np.logical_xor(a, b).sum())
    return (f"# slow-path parity fast-wc vs engine-shaped @ {scan.shape}: "
            f"pred dice={dice:.4f} voxdiff={diff} (fast={na} slow={nb}) "
            f"[{time.time() - t0:.1f}s]")


def train_microbench(steps=8, batch=10):
    """Flagship training-step throughput on the real chip (the 384 ms
    BASELINE row), as a driver-visible record: DC3DATGeneric bs10 x 80^3
    bf16, fused stacks + Pallas conv/attention, remat off (shipped
    configs), IntRegRefineLoss + Adam in one jitted program. Models the
    reference train hot loop dram/job_runner.py:649-681."""
    import jax
    import jax.numpy as jnp
    import optax
    from dram_tpu.losses import IntRegRefineLoss
    from dram_tpu.models import DC3DATGeneric

    on_tpu = jax.default_backend() == "tpu"
    model = DC3DATGeneric(
        n_layers=3, in_ch_list=(1, 64, 128, 256, 768, 384, 192),
        base_ch_list=(32, 64, 128, 256, 256, 128, 64),
        end_ch_list=(64, 128, 256, 512, 256, 128, 64),
        padding_list=((1, 1),) * 7, checkpoint_layers=(0,) * 7,
        kernel_sizes=[(3, 3)] * 7, stacking=3, dropout=0.0,
        at_layers=(-1, 0, 1), at_spatial_size=(64, 64, 64),
        at_f_dim=8, at_g_dim=8,
        at_merge_type="scaled_dot_product_relu", at_g_iter=1,
        use_pallas_attention=on_tpu, use_pallas_conv=on_tpu,
        use_fused_stack=on_tpu, train=True, dtype=jnp.bfloat16)

    B = batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 80, 80, 80, 1)), jnp.float32)
    lobes = jnp.asarray(rng.uniform(size=(B, 80, 80, 80, 1)) > 0.3,
                        jnp.float32)
    lesions = jnp.asarray(rng.uniform(size=(B, 80, 80, 80, 1)) > 0.9,
                          jnp.float32)
    ctss = jnp.asarray(rng.integers(0, 6, size=(B,)), jnp.int32)
    freq = jnp.full((6,), 1.0 / 6.0, jnp.float32)
    weights = jnp.ones((B,), jnp.float32)

    key = jax.random.PRNGKey(0)
    variables = model.init(key, images[:1], lobes[:1])
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})
    loss_func = IntRegRefineLoss(band_width=1e-2, smoothing=0.1)
    factors = [2.0, 1.0]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, rng):
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
                               sample_weight=weights)
            total = sum(l * f for l, f in zip(losses, factors))
            return total, (jnp.stack(losses), carry["bs"])

        (loss, (_, new_bs)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    t0 = time.time()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, key)
    float(loss)  # real D2H: block_until_ready can return early here
    _err(f"# train: compile+first step {time.time() - t0:.1f}s")
    # trainer-cadence timing (trainer.py train loop defers the loss sync
    # by one step, so the device never idles on the per-step D2H round
    # trip); the final float() closes the dependency chain
    times = []
    pending = None
    t0 = time.perf_counter()
    for i in range(steps):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(i))
        if pending is not None:
            float(pending)
            times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
        pending = loss
    float(pending)
    times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1e3
    _err(f"# train: per-step {[round(t * 1e3) for t in times]} ms "
         f"-> median {ms:.1f} ms/step")
    return {"metric": "train_chunks_per_sec", "value": round(B / ms * 1e3, 2),
            "unit": "chunks/s", "ms_per_step": round(ms, 1), "batch": B}


def main():
    from dram_tpu.infer.fast import prep_scan_chunks
    from dram_tpu.utils import enable_compilation_cache, log_cache_events

    enable_compilation_cache()
    cache_counts = {}
    # HIT lines are useful during setup (a stale seed is loud) but the
    # diagnostics phases after the timed loop flip this to quiet mode:
    # the train microbench's model.init logs hundreds of tiny-program
    # HITs, which scrolled the round-4 telemetry out of the driver tail
    quiet_hits = [False]

    def cache_sink(line):
        if quiet_hits[0] and " HIT " in line and not any(
                k in line for k in ("train_step", "stage2", "stage1",
                                    "stage3", "fwd1")):
            return  # suppress tiny-program HIT floods, keep the ones
            # the round artifact must prove (e.g. jit_train_step)
        _err(line)

    log_cache_events(sink=cache_sink, counts=cache_counts)
    summary = []  # key lines, re-printed as the tail summary block

    def note(line):
        _err(line)
        summary.append(line)
    try:  # label the per-executable deserialize/load cost (tunnel-bound)
        from jax._src import monitoring

        def _dur(event, duration, **kw):
            if event == "/jax/compilation_cache/cache_retrieval_time_sec" \
                    and duration > 1.0:
                _err(f"# xla-cache   ... executable load {duration:.1f}s")
        monitoring.register_event_duration_secs_listener(_dur)
    except Exception:
        pass
    t_setup = time.time()
    t_last = [t_setup]

    def mark(what):
        t = time.time()
        _err(f"# setup: {what} +{t - t_last[0]:.1f}s (t={t - t_setup:.1f}s)")
        t_last[0] = t
    mixed = os.environ.get("BENCH_MIXED", "0") == "1"
    span = (-1000, -700)
    n_scans = int(os.environ.get("BENCH_SCANS",
                                 str(2 * len(MIXED_GEOMS)) if mixed else "12"))
    n_control = int(os.environ.get("BENCH_CONTROL", "6"))
    # "wc" (default): host-extracted chunk wire, ~4x less H2D than "w8"
    wire = os.environ.get("BENCH_WIRE", "wc")

    if mixed:
        geoms = list(MIXED_GEOMS)
    else:
        # three DISTINCT geometries by default (shape-heterogeneous like a
        # real worklist); with the pre/model/post stage split only the two
        # cheap XLA stages recompile per geometry — all are warmed before
        # the clock, so this measures warm steady state over mixed shapes
        geoms = [((400, 512, 512), (0.8, 0.7, 0.7)),
                 ((352, 512, 512), (0.9, 0.7, 0.7)),
                 ((448, 512, 512), (0.6, 0.6, 0.6))]

    # overlap: the on-demand C++ host-prep build (~40 s of g++ on the
    # 1-core deploy host) and ALL synth generation run on a worker
    # thread — the build + scan 0 under the (network-bound) backend
    # init, later geometries under the (remote-compile-bound) pipeline
    # build + warmup. g++ is a subprocess, so it truly overlaps.
    setup_pool = ThreadPoolExecutor(1)

    def _build_native():
        from dram_tpu import native
        native._lib()

    native_built = setup_pool.submit(_build_native)
    first = setup_pool.submit(synth_scan, geoms[0][0], 0)
    later = [setup_pool.submit(synth_scan, g[0], seed)
             for seed, g in enumerate(geoms[1:], start=1)]
    pipe = build_pipeline()
    mark("backend init + model init (synth scan 0 overlapped)")
    try:
        native_built.result()
    except Exception as e:  # no toolchain: NumPy prep fallbacks take over
        _err(f"# native build unavailable ({e!r}); using NumPy host prep")
    scans = [first.result() + (geoms[0][1],)]
    mark("synth scan 0 + native build (residual)")

    import jax

    def prep_and_upload(scan, lobe, spacing):
        """Host prep + async H2D for one scan; stage times ride along."""
        t0 = time.perf_counter()
        if wire == "wc":
            prep = prep_scan_chunks(scan, lobe, spacing,
                                    windowing_span=span)
            t1 = time.perf_counter()
            pipe.upload_chunks_prep(prep)
        else:
            from dram_tpu.data.hostprep import prep_scan
            prep = prep_scan(scan, lobe, spacing, windowing_span=span)
            t1 = time.perf_counter()
            prep["packed_scan"] = jax.device_put(prep["packed_scan"])
            prep["packed_lobe"] = jax.device_put(prep["packed_lobe"])
        prep["_t_prep"] = t1 - t0
        prep["_t_h2d"] = time.perf_counter() - t1
        return prep

    def run_device(prep, unpack):
        if wire == "wc":
            return pipe.process_chunks(prep, unpack=unpack)
        return pipe.process_prepped(prep, unpack=unpack)

    # warmup. Default mode: compile/load all stages for EVERY cached scan
    # geometry so the timed loop sees no residual compile stalls. Mixed
    # mode: warm ONLY the first geometry — the other five hit the timed
    # loop cold, which is the point.
    prep0 = prep_and_upload(*scans[0])
    mark("host prep scan 0")
    out0 = run_device(prep0, True)
    mark("pipeline compile + warmup scan 0")
    for f, g in zip(later, geoms[1:]):
        scans.append(f.result() + (g[1],))
    assert out0["pred"].shape == geoms[0][0]
    if not mixed:
        for k in range(1, len(scans)):
            outk = run_device(prep_and_upload(*scans[k]), False)
            np.asarray(outk.get("masks_packed", outk["pred_packed"]))
            mark(f"warmup scan {k} (geometry {geoms[k][0]})")
    setup_s = time.time() - t_setup
    note(f"# setup+compile {setup_s:.1f}s; "
         f"pred voxels {int(out0['pred'].sum())}; xla-cache "
         f"{cache_counts.get('hit', 0)} hit / "
         f"{cache_counts.get('miss', 0)} miss")

    # throughput, 3-stage software pipeline: prep workers resample+pack
    # and start the async H2D for upcoming scans while the device runs
    # the current one; the packed-mask D2H + host unpack of scan k-1
    # finishes on its own thread
    def finish(out):
        from dram_tpu.core.ops import unpackbits_np
        from dram_tpu.infer.fast import expand_packed_mask
        lo, oshape = out["out_window"]
        sl = tuple(slice(l, l + s) for l, s in zip(lo, oshape))
        t0 = time.perf_counter()
        if out.get("meta_in_masks"):
            # iso wire: ONE D2H RPC per scan — the meta f32s ride as
            # trailing bytes of the packed-mask vector (per-RPC latency
            # on tunneled links was a full extra pipeline stage). The
            # fetch blocks until the device chain is done, so its wall
            # is devwait+transfer combined; reported under d2h.
            t1 = time.perf_counter()  # no separate sync RPC: devwait ~0
            combined = np.asarray(out["masks_packed"])
            packed = combined[:out["mask_bytes"]]
            _meta = combined[out["mask_bytes"]:].view(np.float32)
            # post = packed AND cand (host, bit-identical to the device
            # rule — same grid and order). Only the timing matters here;
            # the shape assert keeps a packing/length mismatch loud (the
            # unit test covers the values).
            _post = np.bitwise_and(packed, out["cand_bits"])
            assert _post.shape == packed.shape
        else:
            # the tiny meta fetch blocks until the device chain is done
            # (its wall is device-bound time); the packed-mask fetch
            # after it is the real D2H
            np.asarray(out["meta"]) if "meta" in out \
                else np.asarray(out["threshold"])
            t1 = time.perf_counter()
            if "masks_packed" in out:
                packed = np.asarray(out["masks_packed"])
                if packed.ndim == 2:  # out-grid wire: [pred, post] rows
                    packed = packed[0]
            else:
                packed = np.asarray(out["pred_packed"])
        t2 = time.perf_counter()
        if out.get("masks_on_iso"):  # iso-grid wire: host back-gather
            pred = expand_packed_mask(packed, out["iso_shape"],
                                      out["out_shape"], lo, oshape,
                                      out["back_tables"])
        else:
            pred = np.zeros(out["out_shape"], np.uint8)
            pred[sl] = unpackbits_np(packed, oshape)
        return int(pred[0, 0, 0] >= 0), t1 - t0, t2 - t1

    def timed_loop(schedule, label):
        """schedule: list of scan indices; returns per-scan intervals and
        prints the per-scan stage split."""
        prep_pool = ThreadPoolExecutor(2)
        # two finish stages in flight: the D2H fetch of scan k overlaps
        # the host unpack of scan k-1 (and the device compute of k+1),
        # instead of the dispatch loop serializing on one finish at a
        # time — the r03/r04 telemetry showed devwait ~30 ms but the
        # depth-1 finish (D2H + unpack) bounding the steady state.
        # BENCH_FDEPTH raises the in-flight finish count for degraded
        # tunnels where the d2h RPC stretches to seconds (r5 close
        # measured d2h 1741 ms median for the usual ~200 ms payloads):
        # more overlapped fetches amortize tunnel latency per scan.
        fdepth = int(os.environ.get("BENCH_FDEPTH", "2"))
        finish_pool = ThreadPoolExecutor(max(2, fdepth))
        depth = int(os.environ.get("BENCH_PDEPTH", "2"))
        n = len(schedule)
        queue = [prep_pool.submit(prep_and_upload, *scans[schedule[k]])
                 for k in range(min(depth, n))]
        queue[0].result()
        t0 = time.time()
        pending = []
        done = 0
        marks = []
        stages = []  # (geom, prep, h2d, dispatch)
        waits = []   # futures -> (ok, devwait, d2h)
        for k in range(n):
            prep = queue.pop(0).result()
            if k + depth < n:
                queue.append(prep_pool.submit(
                    prep_and_upload, *scans[schedule[k + depth]]))
            td = time.perf_counter()
            out = run_device(prep, False)
            td = time.perf_counter() - td
            stages.append((scans[schedule[k]][0].shape,
                           prep["_t_prep"], prep["_t_h2d"], td))
            pending.append(finish_pool.submit(finish, out))
            if len(pending) > fdepth:
                ok, tw, t2h = pending.pop(0).result()
                done += ok
                waits.append((tw, t2h))
            marks.append(time.time())
        for f in pending:
            ok, tw, t2h = f.result()
            done += ok
            waits.append((tw, t2h))
        marks[-1] = time.time()
        dt = time.time() - t0
        per_scan = np.diff([t0] + marks)
        for k in range(n):
            g, tp, th, td = stages[k]
            tw, t2h = waits[k]
            _err(f"#   scan {k:2d} geom={g} interval={per_scan[k]:5.2f}s "
                 f"prep={tp * 1e3:6.0f}ms h2d={th * 1e3:6.0f}ms "
                 f"dispatch={td * 1e3:5.0f}ms devwait={tw * 1e3:6.0f}ms "
                 f"d2h={t2h * 1e3:6.0f}ms")
        med = float(np.median(per_scan))
        note(f"# {label}: {n} scans in {dt:.2f}s; stage medians "
             f"prep={np.median([s[1] for s in stages]) * 1e3:.0f}ms "
             f"h2d={np.median([s[2] for s in stages]) * 1e3:.0f}ms "
             f"dispatch={np.median([s[3] for s in stages]) * 1e3:.0f}ms "
             f"devwait={np.median([w[0] for w in waits]) * 1e3:.0f}ms "
             f"d2h={np.median([w[1] for w in waits]) * 1e3:.0f}ms; "
             f"per-scan median {med:.3f} (mean {dt / n:.3f}) s/scan")
        prep_pool.shutdown(wait=False)
        finish_pool.shutdown(wait=False)
        return per_scan, dt

    schedule = [k % len(scans) for k in range(n_scans)]
    per_scan, dt = timed_loop(schedule, "steady-state (geometries cycled)")
    sec = float(np.median(per_scan))
    n_variants = (len(pipe._stage1) + len(pipe._stage2) + len(pipe._stage3))
    if mixed:
        # mixed mode charges compile/load stalls to the clock: the MEAN is
        # the honest number, the median shows the warm steady state
        sec = dt / n_scans
        _err(f"# MIXED-GEOMETRY mode: {len(geoms)} distinct shapes/"
             f"spacings, compile stalls INCLUDED in the clock")
    _err(f"# {n_scans} scans; per-scan "
         f"{[round(float(s), 2) for s in per_scan]} -> median "
         f"{float(np.median(per_scan)):.3f} (mean {dt / n_scans:.3f}) "
         f"s/scan; {n_variants} compiled pipeline-stage variants")

    vpm = 60.0 / sec
    target_vpm = 60.0 / 5.0
    headline = {
        "metric": "ct_volumes_per_min_per_chip"
                  + ("_mixed_geometry" if mixed else ""),
        "value": round(vpm, 3),
        "unit": "volumes/min",
        "vs_baseline": round(vpm / target_vpm, 3),
        "s_per_scan_median": round(sec, 3),
        "setup_s": round(setup_s, 1),
    }
    # crash insurance: should any diagnostics phase below take the
    # process down, this early print is already the last JSON line —
    # every later diagnostic is `# `-prefixed, and on a clean run the
    # SAME headline is re-printed as the absolute final line
    print(json.dumps(headline), flush=True)

    # fixed-geometry control: same machinery, geometry 0 only — if this
    # matches the mixed-geometry medians, the residual spread is
    # tunnel-bound, not geometry/program-swap-bound
    if n_control > 0 and not mixed:
        try:
            ctrl, _ = timed_loop([0] * n_control,
                                 f"CONTROL (geometry {geoms[0][0]} only)")
            ctrl_med = float(np.median(ctrl))
            headline["control_s_per_scan"] = round(ctrl_med, 3)
            note(f"# control median {ctrl_med:.3f} s/scan vs "
                 f"headline {sec:.3f} s/scan")
        except Exception as e:
            note(f"# control loop failed: {e!r}")

    quiet_hits[0] = True  # diagnostics phases: count HITs, log MISSes
    if os.environ.get("BENCH_PARITY", "1") == "1" and wire == "wc" \
            and not mixed:
        for wire_kind in ("p12", "w8"):
            try:
                note(wire_parity_check(pipe, *scans[0], span, out0,
                                       wire=wire_kind))
            except Exception as e:
                note(f"# wire-parity ({wire_kind}) check failed: {e!r}")
        try:
            note(slow_path_parity_check(pipe, *scans[0], span, out0))
        except Exception as e:
            note(f"# slow-path parity check failed: {e!r}")

    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            # free the inference buffers first: the bs10 train step needs
            # the HBM (executables stay resident; that is fine)
            del out0, prep0
            pipe.params = pipe.batch_stats = None
            pipe._dev_params.clear()
            scans.clear()
            import gc
            gc.collect()
            rec = train_microbench()
            headline["train_ms_per_step"] = rec["ms_per_step"]
            headline["train_chunks_per_sec"] = rec["value"]
            # `# `-prefixed: MUST NOT be parseable as the final JSON line
            # (round 4 lost the volumes/min headline to this record)
            note("# train-record " + json.dumps(rec))
        except Exception as e:
            note(f"# train microbench failed: {e!r}")

    # ---- tail summary block + the authoritative final headline line ----
    _err("# ==== bench summary ====")
    for line in summary:
        _err(line)
    _err("# ==== end summary; the next line is the headline JSON ====")
    sys.stderr.flush()
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
