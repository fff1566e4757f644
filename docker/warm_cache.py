#!/usr/bin/env python3
"""Bake a warm persistent XLA compile cache into the Docker image.

Runs the flagship DC3DATGeneric fast pipeline once on a synthetic scan of
the flagship 512x512x400 geometry (the BASELINE.json headline shape), so a
cold container start skips the full XLA compile of the three pipeline
stages. Invoked at `docker build` time for the cpu target (see
docker/Dockerfile); the cache lands in $DRAM_TPU_CACHE_DIR.

WARM_SHAPE=D,H,W overrides the geometry (e.g. a smaller shape for quick CI
image builds).
"""

import os
import sys
import time


def main():
    shape = tuple(int(s) for s in
                  os.environ.get("WARM_SHAPE", "400,512,512").split(","))
    t0 = time.time()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from dram_tpu.utils import enable_compilation_cache

    cache = enable_compilation_cache()
    print(f"warm_cache: compiling flagship pipeline at {shape} "
          f"(cache dir {cache})", flush=True)

    from bench import build_pipeline, synth_scan
    from dram_tpu.infer.fast import prep_scan_chunks

    scan, lobe = synth_scan(shape, seed=0)
    pipe = build_pipeline()
    prep = prep_scan_chunks(scan, lobe, (0.8, 0.7, 0.7),
                            windowing_span=(-1000, -700))
    pipe.upload_chunks_prep(prep)
    out = pipe.process_chunks(prep, unpack=True)
    assert out["pred"].shape == shape

    # keep the compile cache, drop the synthetic-scan npz (image weight)
    import shutil
    shutil.rmtree(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache"), ignore_errors=True)
    print(f"warm_cache: done in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
