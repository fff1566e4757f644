#!/usr/bin/env python3
"""Headline benchmark: CT volumes/min/chip, prep -> lesion mask, end-to-end.

Runs the flagship DC3DATGeneric pipeline (FastScanPipeline: on-device iso
resample, batched per-lobe chunk inference, stitching, Otsu, post rule,
back-resample) on a synthetic 512x512x400 thorax scan — the BASELINE.json
driver metric. Prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured volumes/min divided by the 12 volumes/min implied
by the driver's 5 s/scan target (BASELINE.md) — >1.0 beats the target.
"""

import json
import os
import sys
import time

import numpy as np


def build_pipeline(chunk=(80, 80, 80), at=(64, 64, 64), dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from dram_tpu.infer.fast import FastScanPipeline
    from dram_tpu.models import DC3DATGeneric

    model = DC3DATGeneric(train=False, at_spatial_size=at,
                          dtype=jnp.bfloat16 if dtype == "bfloat16"
                          else jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, *chunk, 1), jnp.float32))
    return FastScanPipeline(model, variables["params"],
                            variables["batch_stats"], chunk_size=chunk,
                            windowing_span=(-1000, -700))


def synth_scan(shape=(400, 512, 512), seed=0):
    from dram_tpu.data.prepare_data import _synth_scan
    rng = np.random.default_rng(seed)
    scan, lobe, lesion, vessel, sev = _synth_scan(
        rng, shape, lesion_severity=[3, 4, 2, 5, 3])
    return scan, lobe


def main():
    t_setup = time.time()
    shape = (400, 512, 512)
    spacing = (0.8, 0.7, 0.7)
    reps = int(os.environ.get("BENCH_REPS", "3"))

    scan, lobe = synth_scan(shape)
    pipe = build_pipeline()

    # warmup: compile all three stages
    out = pipe.process(scan, lobe, spacing)
    assert out["pred"].shape == shape
    print(f"# setup+compile {time.time() - t_setup:.1f}s; "
          f"pred voxels {int(out['pred'].sum())}", file=sys.stderr)

    times = []
    for r in range(reps):
        t0 = time.time()
        out = pipe.process(scan, lobe, spacing)
        out["pred"].sum()  # materialized on host already (np.asarray inside)
        times.append(time.time() - t0)
        print(f"# rep {r}: {times[-1]:.3f}s", file=sys.stderr)

    sec = float(np.median(times))
    vpm = 60.0 / sec
    target_vpm = 60.0 / 5.0
    print(json.dumps({
        "metric": "ct_volumes_per_min_per_chip",
        "value": round(vpm, 3),
        "unit": "volumes/min",
        "vs_baseline": round(vpm / target_vpm, 3),
    }))


if __name__ == "__main__":
    main()
