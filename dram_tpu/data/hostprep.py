"""Host-side scan preparation: iso resample + bit-packed transfer encoding.

Production CT hosts feed TPUs over links of very different bandwidths; on
narrow links the raw int16 scan (210 MB for 512x512x400) dominates
end-to-end latency. This module prepares a compact on-the-wire form:

  * iso-resample on host (the iso grid is ~2.5x smaller than the raw grid),
  * 12-bit packing of HU values (range [-2048, 2047] — 2 voxels -> 3 bytes),
  * 4-bit packing of lobe labels (0..15 — 2 voxels -> 1 byte),

cutting host->device traffic ~3.8x. The device decodes with a few integer
ops (see infer/fast.py decode kernels). A C++/OpenMP implementation of the
resample+pack hot loop lives in dram_tpu/native (built on demand); this
file provides the NumPy fallback and the packing format contract.
"""

from __future__ import annotations

import numpy as np

from ..core.resample import itk_resample3d_np


def resample_iso_np(vol, spacing, iso_spacing=1.0, method="linear",
                    fill_value=0.0, dtype=np.float32):
    """Host iso-resample of a (D,H,W) volume, ITK semantics; returns the
    array at the iso grid."""
    spacing = np.asarray(spacing, np.float64)
    scales = iso_spacing / spacing
    out_size = tuple(int(np.ceil(s / sc)) for s, sc in zip(vol.shape, scales))
    y = itk_resample3d_np(np.asarray(vol, np.float32), out_size,
                          scales=scales.tolist(), method=method,
                          fill_value=fill_value)
    return y.astype(dtype), out_size


def pack12(values_int16):
    """Pack int16 HU values (clipped to [-2048, 2047]) into 12-bit pairs.

    Layout: for voxels (v0, v1) with u = v + 2048 in [0, 4095]:
      b0 = u0 >> 4;  b1 = ((u0 & 0xF) << 4) | (u1 >> 8);  b2 = u1 & 0xFF.
    Returns (packed_u8, n_values).
    """
    v = np.asarray(values_int16).reshape(-1)
    n = v.shape[0]
    u = (np.clip(v, -2048, 2047).astype(np.int32) + 2048).astype(np.uint16)
    if n % 2:
        u = np.concatenate([u, np.zeros(1, np.uint16)])
    u = u.reshape(-1, 2)
    b = np.empty((u.shape[0], 3), np.uint8)
    b[:, 0] = u[:, 0] >> 4
    b[:, 1] = ((u[:, 0] & 0xF) << 4) | (u[:, 1] >> 8)
    b[:, 2] = u[:, 1] & 0xFF
    return b.reshape(-1), n


def unpack12_np(packed, n):
    """Host inverse of pack12 (for tests)."""
    b = np.asarray(packed, np.uint8).reshape(-1, 3).astype(np.int32)
    u0 = (b[:, 0] << 4) | (b[:, 1] >> 4)
    u1 = ((b[:, 1] & 0xF) << 8) | b[:, 2]
    u = np.stack([u0, u1], axis=1).reshape(-1)[:n]
    return (u - 2048).astype(np.int16)


def pack4(labels_u8):
    """Pack small labels (0..15) two per byte: b = (l0 << 4) | l1."""
    l = np.asarray(labels_u8).reshape(-1)
    n = l.shape[0]
    if n % 2:
        l = np.concatenate([l, np.zeros(1, l.dtype)])
    l = l.reshape(-1, 2).astype(np.uint8)
    return ((l[:, 0] << 4) | (l[:, 1] & 0xF)).astype(np.uint8), n


def unpack4_np(packed, n):
    b = np.asarray(packed, np.uint8)
    out = np.stack([b >> 4, b & 0xF], axis=1).reshape(-1)[:n]
    return out.astype(np.uint8)


def lung_crop(iso_lobe, border_vox=8, multiple=32):
    """Bounding box of lobe>0 plus border, rounded up to a size multiple
    (bounds XLA compile variants). Returns (lo, shape)."""
    lo = np.zeros(3, np.int64)
    hi = np.asarray(iso_lobe.shape, np.int64)
    m = iso_lobe > 0
    if m.any():
        for ax in range(3):
            proj = m.any(axis=tuple(i for i in range(3) if i != ax))
            idx = np.where(proj)[0]
            lo[ax] = max(0, int(idx[0]) - border_vox)
            hi[ax] = min(iso_lobe.shape[ax], int(idx[-1]) + 1 + border_vox)
    size = hi - lo
    size = np.minimum(-(-size // multiple) * multiple,
                      np.asarray(iso_lobe.shape))
    lo = np.minimum(lo, np.asarray(iso_lobe.shape) - size)
    lo = np.maximum(lo, 0)
    return lo.astype(np.int64), tuple(int(s) for s in size)


def window8(iso_scan_int16, span):
    """Windowed 8-bit wire encoding: u8 = round(255 * clip((v-lo)/(hi-lo))).

    Every device consumer of the scan applies `windowing(span)` first
    (model input, intensity post rule), and the reference's own Otsu
    quantizes to uint8 anyway (reference utils.py:226-242), so the wire
    can carry the windowed value directly — 8 bits/voxel instead of 12.
    A 4096-entry LUT keeps the host cost at one fancy-index."""
    lo, hi = float(span[0]), float(span[1])
    v = np.arange(-2048, 2048, dtype=np.float32)
    lut = np.clip((v - lo) / max(hi - lo, 1e-6), 0.0, 1.0)
    lut = np.round(lut * 255.0).astype(np.uint8)
    idx = (np.clip(iso_scan_int16, -2048, 2047).astype(np.int32) + 2048)
    return lut[idx.reshape(-1)]


def prep_scan(scan_int16, lobe_u8, spacing, iso_spacing=1.0,
              pad_value=-2048, crop_to_lung=True, vessel_u8=None,
              windowing_span=None):
    """Full host prep: iso resample + lung crop + pack. Returns a dict
    consumed by FastScanPipeline.process_prepped. Only the lung bounding
    box (plus border) crosses the wire: the lesion mask is provably zero
    outside it (the heatmap is stitched under lobe masks only).

    With `windowing_span`, the scan payload is the windowed 8-bit wire
    (window8) instead of packed 12-bit HU — 33% fewer bytes on the scan,
    exact w.r.t. the downstream windowing up to 1/255 quantization.

    Native path: the lung crop window is derived from a subgrid bbox
    pass over the RAW lobe volume and the scan is resampled only INSIDE
    that window (the full iso grid is never materialized — the mask is
    provably zero outside the lobes, so the rest of the grid is never
    consumed). Bit-identical to full-resample-then-crop: the window
    kernels evaluate the same global iso coordinates."""
    hp = None
    if crop_to_lung:
        try:
            from ..native import hostprep_native as hp  # C++ fast path
            n_lobes = 5
            mins, maxs, full_iso_shape = hp.subgrid_bboxes(
                lobe_u8, spacing, iso_spacing, n_lobes)
            have = maxs[:, 0] >= mins[:, 0]
            shape_arr = np.asarray(full_iso_shape, np.int64)
            if have.any():  # lung_crop border/rounding semantics
                lo = np.maximum(
                    mins[have].min(axis=0).astype(np.int64) - 8, 0)
                hi = np.minimum(
                    maxs[have].max(axis=0).astype(np.int64) + 1 + 8,
                    shape_arr)
            else:
                lo, hi = np.zeros(3, np.int64), shape_arr.copy()
            size = np.minimum(-(-(hi - lo) // 32) * 32, shape_arr)
            crop_lo = np.maximum(np.minimum(lo, shape_arr - size), 0)
            crop_shape = tuple(int(s) for s in size)
            iso_lobe = hp.resample_window_labels(lobe_u8, spacing,
                                                 iso_spacing, crop_lo,
                                                 crop_shape)
            iso_scan = hp.resample_window_int16(scan_int16, spacing,
                                                iso_spacing, crop_lo,
                                                crop_shape, fill=pad_value)
            iso_vessel = None
            if vessel_u8 is not None and np.any(vessel_u8):
                iso_vessel = hp.resample_window_labels(
                    vessel_u8, spacing, iso_spacing, crop_lo, crop_shape)
            iso_shape = crop_shape
        except Exception:
            hp = None
    if hp is None:
        try:
            from ..native import hostprep_native as hp  # C++ fast path
            iso_scan, iso_shape = hp.resample_iso_int16(
                scan_int16, spacing, iso_spacing, pad_value)
            iso_lobe = hp.resample_iso_labels(lobe_u8, spacing, iso_spacing)
        except Exception:
            hp = None
            iso_scan_f, iso_shape = resample_iso_np(scan_int16, spacing,
                                                    iso_spacing, "linear",
                                                    fill_value=pad_value)
            iso_scan = np.round(iso_scan_f).astype(np.int16)
            iso_lobe_f, _ = resample_iso_np(lobe_u8, spacing, iso_spacing,
                                            "nearest", dtype=np.float32)
            iso_lobe = iso_lobe_f.astype(np.uint8)

        iso_vessel = None
        if vessel_u8 is not None and np.any(vessel_u8):
            if hp is not None:
                iso_vessel = hp.resample_iso_labels(vessel_u8, spacing,
                                                    iso_spacing)
            else:
                v_f, _ = resample_iso_np(vessel_u8, spacing, iso_spacing,
                                         "nearest", dtype=np.float32)
                iso_vessel = v_f.astype(np.uint8)

        full_iso_shape = tuple(iso_shape)
        crop_lo = np.zeros(3, np.int64)
        if crop_to_lung:
            crop_lo, crop_shape = lung_crop(iso_lobe)
            sl = tuple(slice(int(l), int(l) + s)
                       for l, s in zip(crop_lo, crop_shape))
            iso_scan = np.ascontiguousarray(iso_scan[sl])
            iso_lobe = np.ascontiguousarray(iso_lobe[sl])
            if iso_vessel is not None:
                iso_vessel = np.ascontiguousarray(iso_vessel[sl])
            iso_shape = crop_shape

    if windowing_span is not None:
        packed_scan = window8(iso_scan, windowing_span)
        n = packed_scan.shape[0]
        wire = "w8"
    elif hp is not None:
        packed_scan, n = hp.pack12(iso_scan)
        wire = "p12"
    else:
        packed_scan, n = pack12(iso_scan)
        wire = "p12"
    if hp is not None:
        packed_lobe, _ = hp.pack4(iso_lobe)
    else:
        packed_lobe, _ = pack4(iso_lobe)
    return {"packed_scan": packed_scan, "packed_lobe": packed_lobe,
            "wire": wire,
            "windowing_span": tuple(windowing_span)
            if windowing_span is not None else None,
            "iso_shape": tuple(iso_shape), "n_voxels": n,
            "iso_lobe_host": iso_lobe,
            "iso_vessel_host": iso_vessel,
            "full_iso_shape": full_iso_shape,
            "crop_lo": crop_lo.astype(np.int64),
            "spacing": tuple(np.asarray(spacing, np.float64).tolist()),
            "iso_spacing": float(iso_spacing),
            "out_shape": tuple(scan_int16.shape)}
