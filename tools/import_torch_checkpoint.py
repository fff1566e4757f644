#!/usr/bin/env python3
"""Convert a reference PyTorch ``.pth`` checkpoint to a repo ``.ckpt``.

Usage:
    python tools/import_torch_checkpoint.py <model.pth> <out.ckpt>

The ``.pth`` may be either the reference training save dict
(``{"epoch", "iteration", "model", ...}``, reference job_runner.py:707-716)
or a bare ``model.state_dict()``.  The output is this repo's msgpack
checkpoint, loadable with ``RELOAD_CHECKPOINT_PATH`` by both the trainer
and the inference engine; restore goes through the tolerant shape-checked
merge, so architecture mismatches drop (and log) only the offending keys,
like the reference loader (job_runner.py:252-288).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth", help="reference .pth checkpoint")
    ap.add_argument("ckpt", help="output .ckpt (msgpack) path")
    args = ap.parse_args()

    from dram_tpu.train.torch_import import import_torch_checkpoint

    state = import_torch_checkpoint(args.pth, args.ckpt, log=print)
    n = sum(1 for _ in _leaves(state["model"]["params"]))
    m = sum(1 for _ in _leaves(state["model"]["batch_stats"]))
    print(f"wrote {args.ckpt}: {n} param leaves, {m} batch-stat leaves, "
          f"epoch {state['epoch']}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
