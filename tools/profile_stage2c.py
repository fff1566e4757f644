"""jax.profiler trace of the chunk-wire device stage (stage2c) on the
real TPU: attributes the ~0.4 s device time between the model forward
(fused convs, attention), CAM resizes, stitch, Otsu, post rule, the
back-gather to the output grid and the bit packing.

Run alone (the TPU grant is exclusive):
    python tools/profile_stage2c.py /tmp/prof_s2c
then
    TRACE_STEPS=3 python tools/parse_trace.py /tmp/prof_s2c
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_s2c"
    import jax
    from dram_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import bench as benchmod
    from dram_tpu.infer.fast import prep_scan_chunks

    spacing = (0.8, 0.7, 0.7)
    span = (-1000, -700)
    pipe = benchmod.build_pipeline()
    scan, lobe = benchmod.synth_scan((400, 512, 512), seed=0)
    prep = prep_scan_chunks(scan, lobe, spacing, windowing_span=span)
    pipe.upload_chunks_prep(prep)

    # warmup (compile/load)
    out = pipe.process_chunks(prep, unpack=False)
    np.asarray(out["masks_packed"])
    t0 = time.perf_counter()
    out = pipe.process_chunks(prep, unpack=False)
    np.asarray(out["masks_packed"])
    print(f"warm run (dispatch+device+D2H): {time.perf_counter()-t0:.3f}s")

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = pipe.process_chunks(prep, unpack=False)
        np.asarray(out["masks_packed"])
        np.asarray(out["meta"])
    jax.profiler.stop_trace()
    print(f"trace written to {out_dir}")


if __name__ == "__main__":
    main()
