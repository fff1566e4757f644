"""Native (C++/OpenMP) host runtime: build-on-demand ctypes bindings.

The shared library is compiled from hostprep.cpp the first time it is
needed and cached next to the source; import falls back cleanly (callers
use the NumPy implementations) when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostprep.cpp")
_SO = os.path.join(_DIR, "_hostprep.so")
_LOCK = threading.Lock()
_LIB = None


def _build():
    # per-process temp name: two processes building concurrently must not
    # interleave writes before the atomic os.replace
    tmp = _SO + ".tmp%d" % os.getpid()
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO)) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.resample_iso_linear_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_void_p]
        lib.resample_window_linear_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_void_p]
        lib.resample_iso_linear_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_void_p]
        lib.resample_iso_nearest_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.pack12_i16.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p]
        lib.pack4_u8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_void_p]
        lib.unpackbits_u8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p]
        lib.lobe_bboxes_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
        lib.extract_chunk_w8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.extract_chunk_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.window8_hist_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.cand_bits_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_void_p]
        lib.lobe_bucket_bits_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p]
        lib.crop_copy_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.resample_window_w8hist_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.subgrid_bboxes_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
        lib.resample_window_nearest_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.unpack_nearest_gather_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
        return lib


class hostprep_native:
    """Namespace matching data.hostprep's fast-path import contract."""

    @staticmethod
    def resample_iso_int16(scan, spacing, iso_spacing=1.0, fill=-2048):
        scan = np.ascontiguousarray(scan, np.int16)
        spacing = np.asarray(spacing, np.float64)
        scales = iso_spacing / spacing
        out_shape = tuple(int(np.ceil(s / sc))
                          for s, sc in zip(scan.shape, scales))
        out = np.empty(out_shape, np.int16)
        _lib().resample_iso_linear_i16(
            scan.ctypes.data, *[int(s) for s in scan.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(s) for s in out_shape], float(fill), out.ctypes.data)
        return out, out_shape

    @staticmethod
    def resample_window_int16(scan, spacing, iso_spacing, crop_lo,
                              crop_shape, fill=-2048):
        """Iso resample emitted only inside the output window starting at
        crop_lo with crop_shape (the lung crop)."""
        scan = np.ascontiguousarray(scan, np.int16)
        spacing = np.asarray(spacing, np.float64)
        scales = iso_spacing / spacing
        out = np.empty(tuple(int(s) for s in crop_shape), np.int16)
        _lib().resample_window_linear_i16(
            scan.ctypes.data, *[int(s) for s in scan.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(v) for v in crop_lo],
            *[int(s) for s in crop_shape], float(fill), out.ctypes.data)
        return out

    @staticmethod
    def resample_window_w8hist(scan, spacing, iso_spacing, crop_lo,
                               crop_shape, lobe_c, span, fill=-2048):
        """resample_window_int16 + window8_hist fused into one pass:
        returns (scan_c i16, windowed u8 flat, lung-masked 256-bin hist),
        bit-identical to the two-pass sequence."""
        scan = np.ascontiguousarray(scan, np.int16)
        lobe_c = np.ascontiguousarray(lobe_c, np.uint8)
        spacing = np.asarray(spacing, np.float64)
        scales = iso_spacing / spacing
        out = np.empty(tuple(int(s) for s in crop_shape), np.int16)
        u8 = np.empty(out.size, np.uint8)
        hist = np.empty(256, np.int64)
        _lib().resample_window_w8hist_i16(
            scan.ctypes.data, *[int(s) for s in scan.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(v) for v in crop_lo],
            *[int(s) for s in crop_shape], float(fill),
            float(span[0]), float(span[1]), lobe_c.ctypes.data,
            out.ctypes.data, u8.ctypes.data, hist.ctypes.data)
        return out, u8, hist

    @staticmethod
    def subgrid_bboxes(lobe, spacing, iso_spacing, n_labels):
        """Per-label bboxes of the iso nearest-resampled lobe volume,
        computed on the sampled subgrid without materializing it —
        identical to lobe_bboxes(resample_iso_labels(lobe, ...))."""
        lobe = np.ascontiguousarray(lobe, np.uint8)
        spacing = np.asarray(spacing, np.float64)
        scales = iso_spacing / spacing
        out_shape = tuple(int(np.ceil(s / sc))
                          for s, sc in zip(lobe.shape, scales))
        mins = np.empty((n_labels, 3), np.int32)
        maxs = np.empty((n_labels, 3), np.int32)
        _lib().subgrid_bboxes_u8(
            lobe.ctypes.data, *[int(s) for s in lobe.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(s) for s in out_shape], int(n_labels),
            mins.ctypes.data, maxs.ctypes.data)
        return mins, maxs, out_shape

    @staticmethod
    def resample_window_labels(lobe, spacing, iso_spacing, crop_lo,
                               crop_shape):
        """Nearest label resample emitted only inside the crop window —
        identical to resample_iso_labels(...)[crop]."""
        lobe = np.ascontiguousarray(lobe, np.uint8)
        spacing = np.asarray(spacing, np.float64)
        scales = iso_spacing / spacing
        out = np.empty(tuple(int(s) for s in crop_shape), np.uint8)
        _lib().resample_window_nearest_u8(
            lobe.ctypes.data, *[int(s) for s in lobe.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(v) for v in crop_lo],
            *[int(s) for s in crop_shape], out.ctypes.data)
        return out

    @staticmethod
    def resample_iso_labels(lobe, spacing, iso_spacing=1.0):
        lobe = np.ascontiguousarray(lobe, np.uint8)
        spacing = np.asarray(spacing, np.float64)
        scales = iso_spacing / spacing
        out_shape = tuple(int(np.ceil(s / sc))
                          for s, sc in zip(lobe.shape, scales))
        out = np.empty(out_shape, np.uint8)
        _lib().resample_iso_nearest_u8(
            lobe.ctypes.data, *[int(s) for s in lobe.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(s) for s in out_shape], out.ctypes.data)
        return out

    @staticmethod
    def resample_scales_f32(vol, scales, out_shape, fill=0.0):
        """Generic per-axis-scale trilinear resample, float32."""
        vol = np.ascontiguousarray(vol, np.float32)
        out = np.empty(tuple(int(s) for s in out_shape), np.float32)
        _lib().resample_iso_linear_f32(
            vol.ctypes.data, *[int(s) for s in vol.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(s) for s in out.shape], float(fill), out.ctypes.data)
        return out

    @staticmethod
    def resample_scales_u8_nearest(vol, scales, out_shape):
        vol = np.ascontiguousarray(vol, np.uint8)
        out = np.empty(tuple(int(s) for s in out_shape), np.uint8)
        _lib().resample_iso_nearest_u8(
            vol.ctypes.data, *[int(s) for s in vol.shape],
            float(scales[0]), float(scales[1]), float(scales[2]),
            *[int(s) for s in out.shape], out.ctypes.data)
        return out

    @staticmethod
    def pack12(values_int16):
        v = np.ascontiguousarray(values_int16, np.int16).reshape(-1)
        n = v.shape[0]
        out = np.empty(((n + 1) // 2) * 3, np.uint8)
        _lib().pack12_i16(v.ctypes.data, n, out.ctypes.data)
        return out, n

    @staticmethod
    def pack4(labels_u8):
        l = np.ascontiguousarray(labels_u8, np.uint8).reshape(-1)
        n = l.shape[0]
        out = np.empty((n + 1) // 2, np.uint8)
        _lib().pack4_u8(l.ctypes.data, n, out.ctypes.data)
        return out, n

    @staticmethod
    def lobe_bboxes(lobe_u8, n_labels):
        """Per-label inclusive (mins, maxs) over a label volume; a label
        with no voxels has min > max."""
        l = np.ascontiguousarray(lobe_u8, np.uint8)
        mins = np.empty((n_labels, 3), np.int32)
        maxs = np.empty((n_labels, 3), np.int32)
        _lib().lobe_bboxes_u8(l.ctypes.data, *[int(s) for s in l.shape],
                              int(n_labels), mins.ctypes.data,
                              maxs.ctypes.data)
        return mins, maxs

    @staticmethod
    def extract_chunk_w8(scan_i16, lobe_u8, label, lo3, size3, span,
                         chunk_size):
        scan = np.ascontiguousarray(scan_i16, np.int16)
        lobe = np.ascontiguousarray(lobe_u8, np.uint8)
        lo3 = np.ascontiguousarray(lo3, np.int32)
        size3 = np.ascontiguousarray(size3, np.int32)
        out = np.empty(tuple(chunk_size), np.uint8)
        _lib().extract_chunk_w8(
            scan.ctypes.data, lobe.ctypes.data,
            *[int(s) for s in scan.shape], int(label),
            lo3.ctypes.data, size3.ctypes.data,
            float(span[0]), float(span[1]),
            *[int(c) for c in chunk_size], out.ctypes.data)
        return out

    @staticmethod
    def extract_chunk_bf16(scan_i16, lobe_u8, label, lo3, size3, span,
                           chunk_size):
        """extract_chunk_w8's lossless twin for the bf16 chunk wire:
        the same plane-cached masked-windowed trilinear field, emitted
        as bf16 bits (uint16) of value/255 instead of rounded u8 — the
        wire then carries exactly what the model's bf16 input cast
        would produce, no extra quantization."""
        scan = np.ascontiguousarray(scan_i16, np.int16)
        lobe = np.ascontiguousarray(lobe_u8, np.uint8)
        lo3 = np.ascontiguousarray(lo3, np.int32)
        size3 = np.ascontiguousarray(size3, np.int32)
        out = np.empty(tuple(chunk_size), np.uint16)
        _lib().extract_chunk_bf16(
            scan.ctypes.data, lobe.ctypes.data,
            *[int(s) for s in scan.shape], int(label),
            lo3.ctypes.data, size3.ctypes.data,
            float(span[0]), float(span[1]),
            *[int(c) for c in chunk_size], out.ctypes.data)
        return out

    @staticmethod
    def window8_hist(scan_i16, lobe_u8, span):
        scan = np.ascontiguousarray(scan_i16, np.int16)
        lobe = np.ascontiguousarray(lobe_u8, np.uint8)
        u8 = np.empty(scan.size, np.uint8)
        hist = np.empty(256, np.int64)
        _lib().window8_hist_i16(scan.ctypes.data, lobe.ctypes.data,
                                scan.size, float(span[0]), float(span[1]),
                                u8.ctypes.data, hist.ctypes.data)
        return u8, hist

    @staticmethod
    def cand_bits(u8, vessel_u8, threshold):
        u = np.ascontiguousarray(u8, np.uint8).reshape(-1)
        v = None if vessel_u8 is None else \
            np.ascontiguousarray(vessel_u8, np.uint8).reshape(-1)
        bits = np.empty((u.size + 7) // 8, np.uint8)
        _lib().cand_bits_u8(u.ctypes.data,
                            None if v is None else v.ctypes.data,
                            u.size, float(threshold), bits.ctypes.data)
        return bits

    @staticmethod
    def lobe_bucket_bits(lobe_u8, starts, bucket, n_labels):
        lobe = np.ascontiguousarray(lobe_u8, np.uint8)
        starts = np.ascontiguousarray(starts, np.int32)
        total = int(n_labels) * int(np.prod(bucket))
        bits = np.empty((total + 7) // 8, np.uint8)
        _lib().lobe_bucket_bits_u8(
            lobe.ctypes.data, *[int(s) for s in lobe.shape],
            starts.ctypes.data, *[int(b) for b in bucket],
            int(n_labels), bits.ctypes.data)
        return bits

    @staticmethod
    def crop_copy(vol_u8, lo3, size3):
        """Contiguous copy of a crop window (NumPy's strided copy of a
        26 MB crop measured ~250 ms on the 1-core host; this is memcpy)."""
        vol = np.ascontiguousarray(vol_u8, np.uint8)
        out = np.empty(tuple(int(s) for s in size3), np.uint8)
        _lib().crop_copy_u8(vol.ctypes.data, *[int(s) for s in vol.shape],
                            *[int(v) for v in lo3],
                            *[int(v) for v in size3], out.ctypes.data)
        return out

    @staticmethod
    def unpackbits(packed, shape):
        p = np.ascontiguousarray(packed, np.uint8).reshape(-1)
        out = np.empty(p.shape[0] * 8, np.uint8)
        _lib().unpackbits_u8(p.ctypes.data, p.shape[0], out.ctypes.data)
        return out[: int(np.prod(shape))].reshape(shape)

    @staticmethod
    def unpack_nearest_gather(packed, iso_shape, out_full, window_lo,
                              window_shape, tables):
        """Unpack an iso-crop bit mask and nearest-gather it into
        out_full[window] via per-axis index tables (the host twin of the
        device back-gather; bit-identical). out_full is written in place
        (only the window region is touched)."""
        p = np.ascontiguousarray(packed, np.uint8).reshape(-1)
        assert out_full.dtype == np.uint8 and out_full.flags.c_contiguous
        iz, iy, ix = [np.ascontiguousarray(t, np.int32) for t in tables]
        _lib().unpack_nearest_gather_u8(
            p.ctypes.data, *[int(s) for s in iso_shape],
            out_full.ctypes.data, int(out_full.shape[1]),
            int(out_full.shape[2]),
            *[int(v) for v in window_lo],
            *[int(s) for s in window_shape],
            iz.ctypes.data, iy.ctypes.data, ix.ctypes.data)
        return out_full
