"""Per-stage timing of the fast pipeline on the two bench scans: isolates
host prep / H2D / device execute / D2H for each scan shape to explain
per-scan throughput differences."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from dram_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
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
            wires = {k: jax.device_put(prep[k])
                     for k in ("x80_u8", "lobe_bits", "cand_bits")}
            jax.block_until_ready(list(wires.values()))
            prep.update(wires)
            t2 = time.perf_counter()
            out = pipe.process_chunks(prep, unpack=False)
            jax.block_until_ready([out["pred_packed"], out["post_packed"]])
            t3 = time.perf_counter()
            pred = np.asarray(out["pred_packed"])
            t4 = time.perf_counter()
            print(f"rep{rep} scan{si} iso={prep['iso_shape']} "
                  f"bucket={prep['bucket']} "
                  f"prep {t1-t0:.2f} h2d {t2-t1:.2f} "
                  f"device {t3-t2:.2f} d2h {t4-t3:.2f}")


if __name__ == "__main__":
    main()
