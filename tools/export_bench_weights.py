#!/usr/bin/env python3
"""Export trained flagship weights as the tracked bench asset.

The benchmark's parity gates (wc-vs-w8 wire, fast-vs-slow path) compare
lesion masks, which are thresholded at an Otsu bin of the max-normed CAM.
With random-init weights the CAM is unstructured (near-uniform histogram),
so a 1/255-level wire difference flips the Otsu argmax by one bin and
moves ~3% of the mask — the gates then measure threshold-bin chatter, not
wire fidelity. Deployment runs trained weights whose CAM is bimodal
(lesion vs background) and whose Otsu threshold sits in the valley, where
it is stable. This tool packages such weights (trained with train.py on
the synthetic dataset — see assets/README.md for the exact recipe) into
`assets/bench_weights.ckpt.xz`:

  {"params": <f16-cast param tree>, "batch_stats": <f32 tree>}

Params are stored float16 (the checkpoint is a bench asset, not a resume
point; f16 keeps the repo artifact ~3x smaller and the restored f32
weights ARE the shipped weights — there is no "original" to diverge
from). bench.build_pipeline restores and casts back to f32.

Usage:
    python tools/export_bench_weights.py <run.ckpt> [--out assets/...]
"""

import argparse
import lzma
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="training checkpoint (msgpack .ckpt)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "bench_weights.ckpt.xz"))
    args = ap.parse_args()

    from flax import serialization

    import jax

    with open(args.ckpt, "rb") as fp:
        tree = serialization.msgpack_restore(fp.read())
    model = tree["model"] if "model" in tree else tree
    params = jax.tree.map(
        lambda a: a.astype(np.float16)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        model["params"])
    out_tree = {"params": params,
                "batch_stats": model.get("batch_stats", {})}
    data = serialization.msgpack_serialize(out_tree)
    packed = lzma.compress(data, preset=6)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as fp:
        fp.write(packed)
    n = sum(np.asarray(x).size for x in jax.tree.leaves(params))
    print(f"exported {n / 1e6:.1f}M params: {len(data) >> 20} MiB raw -> "
          f"{len(packed) >> 20} MiB xz at {args.out}")


if __name__ == "__main__":
    main()
