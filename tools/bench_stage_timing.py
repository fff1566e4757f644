"""Per-stage timing of the fast chunk-wire pipeline on the bench scans:
isolates host prep (C++), wire pack+table build, H2D device_put, program
dispatch, device execute, and D2H for each scan shape to explain per-scan
throughput differences."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from dram_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import bench as benchmod
    from dram_tpu.infer.fast import prep_scan_chunks

    spacing = (0.8, 0.7, 0.7)
    span = (-1000, -700)
    pipe = benchmod.build_pipeline()
    scans = [benchmod.synth_scan((400, 512, 512), seed=s) for s in (0, 1)]

    for rep in range(3):
        for si, (scan, lobe) in enumerate(scans):
            t0 = time.perf_counter()
            prep = prep_scan_chunks(scan, lobe, spacing,
                                    windowing_span=span)
            t1 = time.perf_counter()
            pipe.upload_chunks_prep(prep)
            jax.block_until_ready(prep["_dev_m"] + prep["_dev_s"])
            t2 = time.perf_counter()
            out = pipe.process_chunks(prep, unpack=False)
            t3 = time.perf_counter()
            jax.block_until_ready(out["masks_packed"])
            t4 = time.perf_counter()
            masks = np.asarray(out["masks_packed"])
            meta = np.asarray(out["meta"])
            t5 = time.perf_counter()
            print(f"rep{rep} scan{si} iso={prep['iso_shape']} "
                  f"bucket={prep['bucket']} "
                  f"prep {t1-t0:.3f} pack+h2d {t2-t1:.3f} "
                  f"dispatch {t3-t2:.3f} device {t4-t3:.3f} "
                  f"d2h {t5-t4:.3f}  (masks {masks.nbytes/1e6:.1f} MB, "
                  f"th {meta[-1]:.3f})")


if __name__ == "__main__":
    main()
