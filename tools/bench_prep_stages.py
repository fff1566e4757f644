"""Host-only timing of the chunk-wire prep (fast.py:_prep_scan_chunks_native)
broken into its C++ stages, on the bench scan geometry. No TPU needed —
this isolates the pipeline's host stage, which bounds steady-state
throughput on the 1-core deploy host (BASELINE.md: prep 0.8-1.1 s vs
device 0.41 s)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *a, reps=3, **kw):
    best = 1e9
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        best = min(best, time.perf_counter() - t0)
    return out, best * 1e3


def main():
    import bench as benchmod
    from dram_tpu.native import hostprep_native as hp
    from dram_tpu.infer.fast import prep_scan_chunks

    scan, lobe = benchmod.synth_scan((400, 512, 512), seed=0)
    spacing = np.asarray((0.8, 0.7, 0.7), np.float64)
    span = (-1000, -700)

    _, full = t(prep_scan_chunks, scan, lobe, spacing, windowing_span=span)
    print(f"prep_scan_chunks total: {full:7.1f} ms")

    iso_lobe, ms = t(hp.resample_iso_labels, lobe, spacing, 1.0)
    print(f"  resample_iso_labels (full {lobe.shape}->{iso_lobe.shape}):"
          f" {ms:7.1f} ms")
    (mins, maxs), ms = t(hp.lobe_bboxes, iso_lobe, 5)
    print(f"  lobe_bboxes: {ms:7.1f} ms")

    shape_arr = np.asarray(iso_lobe.shape, np.int64)
    lo = np.maximum(mins.min(axis=0).astype(np.int64) - 8, 0)
    hi = np.minimum(maxs.max(axis=0).astype(np.int64) + 1 + 8, shape_arr)
    size = np.minimum(-(-(hi - lo) // 32) * 32, shape_arr)
    crop_lo = np.maximum(np.minimum(lo, shape_arr - size), 0)
    iso_shape = tuple(int(s) for s in size)
    print(f"  crop {iso_shape}")

    scan_c, ms = t(hp.resample_window_int16, scan, spacing, 1.0, crop_lo,
                   iso_shape, fill=-2048.0)
    print(f"  resample_window_int16 (crop): {ms:7.1f} ms")
    sl = tuple(slice(int(l), int(l) + s) for l, s in zip(crop_lo, iso_shape))
    lobe_c = np.ascontiguousarray(iso_lobe[sl])

    x, ms = t(hp.extract_chunk_w8, scan_c, lobe_c, 1,
              np.zeros(3, np.int32),
              np.asarray(iso_shape, np.int32) // 2, span, (80, 80, 80))
    print(f"  extract_chunk_w8 (x5 lobes): {5 * ms:7.1f} ms")
    (u8, hist), ms = t(hp.window8_hist, scan_c, lobe_c, span)
    print(f"  window8_hist: {ms:7.1f} ms")
    _, ms = t(hp.cand_bits, u8, None, 150.0)
    print(f"  cand_bits: {ms:7.1f} ms")
    starts = np.zeros((5, 3), np.int32)
    _, ms = t(hp.lobe_bucket_bits, lobe_c, starts,
              np.asarray(iso_shape, np.int32), 5)
    print(f"  lobe_bucket_bits: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
