#!/usr/bin/env python3
"""Pack XLA persistent-cache entries into the tracked `warm_cache/` seed.

The runtime cache (`.xla_cache/`, gitignored) is per-environment; a fresh
clone starts cold and pays ~15 min of Mosaic/XLA compilation before its
first mask. This tool copies selected entries out of a runtime cache into
`warm_cache/` as xz-compressed files, which the repo tracks;
`dram_tpu.utils.enable_compilation_cache` unpacks them back into any
fresh runtime cache at startup.

Build the seed by running the workload once against a FRESH DEFAULT-PATH
cache, then packing everything it created. The cache dir must be the
default `<repo>/.xla_cache`: under the tunneled TPU backend the cache
key depends on the configured dir value (see
utils.enable_compilation_cache), so entries harvested from a scratch
dir never hit in normal runs:

    mv .xla_cache .xla_cache_old   # or rm -rf
    DRAM_TPU_NO_SEED_CACHE=1 python bench.py
    python tools/seed_xla_cache.py .xla_cache --clean

Usage:
    python tools/seed_xla_cache.py <runtime-cache-dir> [--out warm_cache]
        [--prefix jit_] [--clean]
"""

import argparse
import glob
import lzma
import os
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cache_dir", help="runtime cache to harvest")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "warm_cache"))
    ap.add_argument("--prefix", default="", help="only entries whose "
                    "name starts with this prefix")
    ap.add_argument("--clean", action="store_true",
                    help="delete seed entries not present in cache_dir")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    names = set()
    total_raw = total_xz = 0
    for src in sorted(glob.glob(os.path.join(args.cache_dir, "*"))):
        name = os.path.basename(src)
        if not name.startswith(args.prefix) or not os.path.isfile(src):
            continue
        names.add(name)
        dst = os.path.join(args.out, name + ".xz")
        with open(src, "rb") as fin:
            data = fin.read()
        if os.path.exists(dst) and os.path.getsize(dst) > 0:
            print(f"  keep  {name} ({len(data) >> 10} KiB)")
            total_raw += len(data)
            total_xz += os.path.getsize(dst)
            continue
        packed = lzma.compress(data, preset=6)
        with open(dst, "wb") as fout:
            fout.write(packed)
        total_raw += len(data)
        total_xz += len(packed)
        print(f"  pack  {name} ({len(data) >> 10} -> {len(packed) >> 10} KiB)")

    if args.clean:
        for old in glob.glob(os.path.join(args.out, "*.xz")):
            if os.path.basename(old)[:-3] not in names:
                os.remove(old)
                print(f"  drop  {os.path.basename(old)}")

    print(f"seed: {len(names)} entries, {total_raw >> 20} MiB raw -> "
          f"{total_xz >> 20} MiB packed in {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
