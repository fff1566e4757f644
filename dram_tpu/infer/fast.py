"""Fast full-scan inference: the whole prep->lesion-mask pipeline on device.

This is the TPU-native redesign of the reference's per-scan loop
(reference job_runner.py:942-1030), which interleaved SimpleITK resampling,
host crops, per-lobe GPU forwards and D2H stitching. Here one scan is
processed as three XLA programs with a single H2D of the raw volumes and a
single D2H of the final mask:

  1. iso-resample scan+lobe to the test grid (separable einsum matmuls);
  2. all 5 lobes as ONE batched chunk pipeline: dynamic-slice crops into a
     shared bucket, lobe masking (-2048), windowing, per-lobe gather-based
     ITK resize to the model chunk size, the model forward (batch=5), CAM
     relu + max-norm + ratio->class gating, gather-based align-corners
     resize back to the bucket, and stitching via dynamic_update_slice;
  3. lung-masked Otsu + intensity post rule + nearest resample back to the
     original grid.

Only the 5 lobe bounding boxes are computed on host (from a small
downsampled projection of the lobe mask). Chunk crops use a shared padded
bucket so every shape is static; gather-based per-sample resizes make the
per-lobe scale factors data, not shapes.
"""

from __future__ import annotations

import functools
import logging
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ops import (binary_cam_threshold, otsu_threshold_u8_np,
                        packbits_u8, unpackbits_np, unpackbits_u8_dev,
                        windowing)
from ..core.resample import itk_resample3d
from ..losses.interval_reg import CTSS_RATIO_UB

# One shared default HU window for the fast path (the flagship attention
# config, reference exp_settings/st_dram_ref_att.py:52-53). Production
# callers (engine.py, bench.py) always pass the span from settings.
DEFAULT_WINDOWING_SPAN = (-1000, -700)

_NATIVE_PREP_WARNED = False


def _stage_builder(fn):
    """Serialize stage-variant construction under the pipeline's RLock.

    Under scan-sharded threads (engine.py --shard / _params_on multi-chip
    mode) two threads can race a `_get_stage*` for the same key: each
    would build — and on first call compile — its own jit object for the
    identical program. The lock makes key lookup + build atomic, so
    exactly one jit object exists per variant key and jax's own dispatch
    cache dedups the compile. Builders only construct the (cheap) jit
    wrapper — compilation still happens lazily at first call, outside
    this lock, so unrelated variants keep compiling concurrently."""
    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._stage_lock:
            return fn(self, *args, **kwargs)
    return wrapper


def plan_bucket(lows, sizes, iso_shape):
    """Shared chunk bucket: max lobe extent rounded up to a multiple of 16
    (bounds compile variants), clamped to the grid; per-lobe start/offset."""
    bucket = tuple(int(min(-(-int(sizes[:, ax].max()) // 16) * 16,
                           iso_shape[ax])) for ax in range(3))
    starts = np.minimum(lows, np.asarray(iso_shape) - np.asarray(bucket))
    starts = np.maximum(starts, 0).astype(np.int32)
    offsets = lows - starts
    return bucket, starts, offsets


def _src_to_gather(src, src_len, offset, total_axis):
    """Continuous source coords -> clamped (lo, hi, frac) into a padded axis
    where the source region starts at `offset`."""
    src = np.clip(src, 0.0, src_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, src_len - 1)
    frac = (src - lo).astype(np.float32)
    lo = np.clip(lo + offset, 0, total_axis - 1).astype(np.int32)
    hi = np.clip(hi + offset, 0, total_axis - 1).astype(np.int32)
    return lo, hi, frac


def forward_resize_weights(sizes, offsets, out_size, bucket):
    """Weights for the crop->chunk ITK resize (src = i*size/out), where each
    lobe's crop of extent sizes[s] starts at offsets[s] inside the bucket.
    Returns per-axis (N, out) lo/hi/frac arrays."""
    n = len(sizes)
    los, his, fracs = [], [], []
    for ax in range(3):
        lo = np.zeros((n, out_size[ax]), np.int32)
        hi = np.zeros((n, out_size[ax]), np.int32)
        fr = np.zeros((n, out_size[ax]), np.float32)
        for s in range(n):
            size = int(sizes[s][ax])
            src = np.arange(out_size[ax]) * size / out_size[ax]
            lo[s], hi[s], fr[s] = _src_to_gather(src, size,
                                                 int(offsets[s][ax]),
                                                 bucket[ax])
        los.append(lo), his.append(hi), fracs.append(fr)
    return los, his, fracs


def backward_resize_weights(sizes, offsets, chunk_size, bucket):
    """Weights for the chunk->crop align-corners resize, emitted over the
    whole bucket: bucket position p maps to chunk coord
    (p - offset)*(chunk-1)/(size-1); positions outside the crop clamp (they
    are masked by the lobe mask downstream)."""
    n = len(sizes)
    los, his, fracs = [], [], []
    for ax in range(3):
        lo = np.zeros((n, bucket[ax]), np.int32)
        hi = np.zeros((n, bucket[ax]), np.int32)
        fr = np.zeros((n, bucket[ax]), np.float32)
        for s in range(n):
            size = max(int(sizes[s][ax]), 1)
            p = np.arange(bucket[ax], dtype=np.float64) - int(offsets[s][ax])
            src = p * (chunk_size[ax] - 1) / max(size - 1, 1)
            lo[s], hi[s], fr[s] = _src_to_gather(src, chunk_size[ax], 0,
                                                 chunk_size[ax])
        los.append(lo), his.append(hi), fracs.append(fr)
    return los, his, fracs


def _gather_axis(x, lo, hi, frac, axis):
    """Per-sample linear interpolation along `axis` of x (N, D, H, W)."""
    def one(xs, lo_s, hi_s, fr_s):
        a = jnp.take(xs, lo_s, axis=axis - 1)
        b = jnp.take(xs, hi_s, axis=axis - 1)
        shape = [1, 1, 1]
        shape[axis - 1] = -1
        f = fr_s.reshape(shape)
        return a * (1.0 - f) + b * f

    return jax.vmap(one)(x, jnp.asarray(lo), jnp.asarray(hi),
                         jnp.asarray(frac))


def gather_resize(x, weights):
    """x (N, Db, Hb, Wb) -> (N, *out_size) using precomputed weights."""
    los, his, fracs = weights
    for ax in range(3):
        x = _gather_axis(x, los[ax], his[ax], fracs[ax], ax + 1)
    return x


def gather_resize_nearest(x, weights):
    """Nearest-neighbour twin of gather_resize from the SAME (lo, hi,
    frac) tables: per axis pick lo when frac < 0.5 else hi, i.e.
    floor(src + 0.5) — the transforms' nearest convention for mask keys.

    The lobe chunk the model consumes must be NEAREST-resampled exactly
    like the reference preprocessing (T.Resample routes `#lobe_reference`
    to nearest; reference dataset transforms do the same): the previous
    linear-then->0.5 approximation differed from nearest by a one-voxel
    shell at lobe boundaries, which shifted every per-lobe ratio by
    ~0.01 vs the reference-shaped path — a systematic model-INPUT
    difference, far larger than any wire quantization."""
    los, his, fracs = weights

    def one(xs, lo_s, hi_s, fr_s, axis):
        idx = jnp.where(jnp.asarray(fr_s) < 0.5, jnp.asarray(lo_s),
                        jnp.asarray(hi_s))
        return jnp.take(xs, idx, axis=axis - 1)

    for ax in range(3):
        x = jax.vmap(lambda xs, lo_s, hi_s, fr_s, a=ax + 1:
                     one(xs, lo_s, hi_s, fr_s, a))(
            x, jnp.asarray(los[ax]), jnp.asarray(his[ax]),
            jnp.asarray(fracs[ax]))
    return x


def _layout_seq(entries):
    off, pos = {}, 0
    for name, shape in entries:
        off[name] = (pos, tuple(int(s) for s in shape))
        pos += int(np.prod(shape))
    return off, pos


def _wire_layout_m(n_lobes, chunk, bucket):
    """Static layout of the MODEL-side chunk-wire blobs (consumed by the
    bucket-keyed pre stage): bf16-bit windowed model chunks, 1-bit lobe bucket
    masks, and the crop->chunk forward-resize gather tables.

    The wire is split in two (model-side here, stitch-side in
    _wire_layout_s) so the expensive Mosaic program sees only fixed
    chunk-shaped operands: its compiled executable is then geometry-
    INDEPENDENT and one persistent-cache entry serves every scan geometry
    (the stitch-side shapes — iso grid, output grid — only key the cheap
    pure-XLA stages). Each side coalesces into one u8/i32/f32 vector so a
    scan costs few device_put RPCs (fixed multi-ms latency each on
    tunneled links). The layout is a pure function of the shape key, so
    the host packer and the traced unpacker can't drift.

    Returns ((offsets, total) for u8, i32, f32); offsets maps
    name -> (position, shape)."""
    n = n_lobes
    # x80: bf16 bits (2 bytes, little-endian) of the windowed chunk value
    # in [0, 1] — the wire carries exactly what the model's bf16 input
    # cast would produce, so the chunk wire adds NO quantization beyond
    # the compute dtype (the old u8 wire cost 1/255-level differences vs
    # the w8 path, which the CAM max-norm then amplified)
    u8 = [("x80", (n,) + tuple(chunk) + (2,)),
          ("lobe_bits", (-(-n * int(np.prod(bucket)) // 8),))]
    i32, f32 = [], []
    for ax in range(3):
        i32.append((f"fw_lo{ax}", (n, chunk[ax])))
        i32.append((f"fw_hi{ax}", (n, chunk[ax])))
        f32.append((f"fw_fr{ax}", (n, chunk[ax])))
    return _layout_seq(u8), _layout_seq(i32), _layout_seq(f32)


def _wire_layout_s(n_lobes, bucket, iso_shape, o_shape):
    """Stitch-side chunk-wire blobs (consumed by the geometry-keyed post
    stage): stitch coordinates, the chunk->bucket backward-resize tables
    and the iso->output nearest gather tables. The 1-bit post-rule
    candidate stays HOST-side in the hot path: post = pred AND cand
    commutes with the MSB-first bit packing, so the host ANDs the packed
    rows after the pred D2H — the candidate (the largest wire item, the
    full iso grid) rides neither H2D nor D2H; only the heatmap/archive
    path device_puts it separately. See _wire_layout_m."""
    n = n_lobes
    i32 = [("starts", (n, 3)), ("box_lo", (n, 3)), ("box_sz", (n, 3)),
           ("gz", (o_shape[0],)), ("gy", (o_shape[1],)),
           ("gx", (o_shape[2],))]
    f32 = [("present", (n,))]
    for ax in range(3):
        i32.append((f"bw_lo{ax}", (n, bucket[ax])))
        i32.append((f"bw_hi{ax}", (n, bucket[ax])))
        f32.append((f"bw_fr{ax}", (n, bucket[ax])))
    return _layout_seq(i32), _layout_seq(f32)


def _pack_blob(layout, arrays, dtype):
    """Host: pack named numpy arrays into one flat vector per `layout`."""
    off, total = layout
    blob = np.zeros((total,), dtype)
    for name, arr in arrays.items():
        pos, shape = off[name]
        blob[pos:pos + int(np.prod(shape))] = \
            np.asarray(arr, dtype).reshape(-1)
    return blob


def _blob_get(blob, layout, name):
    """Trace-time: static slice+reshape of one named entry."""
    off, _ = layout
    pos, shape = off[name]
    n = int(np.prod(shape))
    return blob[pos:pos + n].reshape(shape)


def _crop_box_mask(box_lo, box_sz, bucket):
    """(N,3) crop offsets/sizes -> (N, *bucket) bool: positions inside each
    lobe's crop window. The CAM max normalisation runs over this box (the
    reference normalises over the full resized crop tensor,
    job_runner.py:996-997, not just the lobe voxels)."""
    m = None
    for ax in range(3):
        i = jax.lax.broadcasted_iota(jnp.int32, tuple(bucket), ax)[None]
        lo = box_lo[:, ax][:, None, None, None]
        hi = lo + box_sz[:, ax][:, None, None, None]
        t = (i >= lo) & (i < hi)
        m = t if m is None else (m & t)
    return m


class FastScanPipeline:
    """Single-chip fast path; one instance per (scan-grid, bucket) shapes."""

    def __init__(self, model_eval, params, batch_stats, chunk_size=(80, 80, 80),
                 windowing_span=DEFAULT_WINDOWING_SPAN, pad_value=-2048.0,
                 n_lobes=5):
        self.model_eval = model_eval
        self.params = params
        self.batch_stats = batch_stats
        self.chunk_size = tuple(chunk_size)
        self.windowing_span = tuple(windowing_span)
        self.pad_value = float(pad_value)
        self.n_lobes = n_lobes
        self._stage1 = {}
        self._stage2 = {}
        self._stage3 = {}
        self._dev_params = {}
        self._stage_lock = threading.RLock()

    def _params_on(self, device):
        """(params, batch_stats) committed to `device` (cached per device).

        Scan-level multi-chip parallelism: each in-flight scan's blobs are
        device_put to its assigned chip (upload_chunks_prep(device=...)),
        jit then executes every stage on that chip because the inputs are
        committed there — N scans run concurrently on N chips with no
        cross-chip traffic (SURVEY §2.7 spatial-parallelism row; the
        per-scan weights copy is cached)."""
        if device is None:
            return self.params, self.batch_stats
        if device not in self._dev_params:
            self._dev_params[device] = (
                jax.device_put(self.params, device),
                jax.device_put(self.batch_stats, device))
        return self._dev_params[device]

    # -- stage 1: iso resample ------------------------------------------
    @_stage_builder
    def _get_stage1(self, in_shape, iso_shape, scales):
        key = (in_shape, iso_shape, tuple(np.round(scales, 6)))
        n_lobes = self.n_lobes
        if key not in self._stage1:
            @jax.jit
            def stage1(scan, lobe):
                scan_f = scan.astype(jnp.float32)
                iso_scan = itk_resample3d(scan_f, iso_shape, scales=scales,
                                          method="linear",
                                          fill_value=self.pad_value)
                iso_lobe = itk_resample3d(lobe.astype(jnp.float32), iso_shape,
                                          scales=scales, method="nearest")
                iso_lobe = iso_lobe.astype(jnp.uint8)
                # tiny per-lobe axis projections: the only bbox data the
                # host needs (a few KB instead of the 40+ MB lobe volume)
                projs = []
                for ax in range(3):
                    other = tuple(i for i in range(3) if i != ax)
                    projs.append(jnp.stack(
                        [jnp.any(iso_lobe == li + 1, axis=other)
                         for li in range(n_lobes)]))
                return iso_scan, iso_lobe, projs

            self._stage1[key] = stage1
        return self._stage1[key]

    # -- stage 1p: decode host-prepped packed iso volumes -----------------
    @_stage_builder
    def _get_stage1p(self, iso_shape, n_voxels):
        key = ("prepped", iso_shape, n_voxels)
        if key not in self._stage1:
            @jax.jit
            def stage1p(packed_scan, packed_lobe):
                b = packed_scan.astype(jnp.int32).reshape(-1, 3)
                u0 = (b[:, 0] << 4) | (b[:, 1] >> 4)
                u1 = ((b[:, 1] & 0xF) << 8) | b[:, 2]
                u = jnp.stack([u0, u1], axis=1).reshape(-1)[:n_voxels]
                iso_scan = (u - 2048).astype(jnp.float32).reshape(iso_shape)
                lb = packed_lobe.astype(jnp.int32)
                l = jnp.stack([lb >> 4, lb & 0xF], axis=1).reshape(-1)
                iso_lobe = l[:n_voxels].astype(jnp.uint8).reshape(iso_shape)
                return iso_scan, iso_lobe

            self._stage1[key] = stage1p
        return self._stage1[key]

    # -- stage 1w: decode windowed 8-bit wire (hostprep.window8) ----------
    @_stage_builder
    def _get_stage1w(self, iso_shape, n_voxels, span):
        key = ("w8", iso_shape, n_voxels, span)
        if key not in self._stage1:
            lo, hi = float(span[0]), float(span[1])

            @jax.jit
            def stage1w(packed_scan, packed_lobe):
                u = packed_scan.astype(jnp.float32)[:n_voxels]
                # invert the wire quantization back to HU so the stages'
                # own windowing reproduces u/255 exactly
                iso_scan = (lo + u * ((hi - lo) / 255.0)).reshape(iso_shape)
                lb = packed_lobe.astype(jnp.int32)
                l = jnp.stack([lb >> 4, lb & 0xF], axis=1).reshape(-1)
                iso_lobe = l[:n_voxels].astype(jnp.uint8).reshape(iso_shape)
                return iso_scan, iso_lobe

            self._stage1[key] = stage1w
        return self._stage1[key]

    # -- stage 2: batched lobe chunks -> stitched heatmap ----------------
    @_stage_builder
    def _get_stage2(self, iso_shape, bucket):
        key = (iso_shape, bucket)
        if key in self._stage2:
            return self._stage2[key]
        model_eval = self.model_eval
        chunk = self.chunk_size
        span = self.windowing_span
        pad_value = self.pad_value
        n_lobes = self.n_lobes

        @jax.jit
        def stage2(params, batch_stats, iso_scan, iso_lobe, starts,
                   fw_los, fw_his, fw_fracs, bw_los, bw_his, bw_fracs,
                   lobe_present, box_lo, box_sz):
            # crop every lobe into the shared bucket
            crops, lobe_crops = [], []
            for li in range(n_lobes):
                c = jax.lax.dynamic_slice(iso_scan, tuple(starts[li]), bucket)
                l = jax.lax.dynamic_slice(iso_lobe, tuple(starts[li]), bucket)
                crops.append(c)
                lobe_crops.append(l == (li + 1))
            x = jnp.stack(crops)                       # (5, *bucket)
            lmask = jnp.stack(lobe_crops)              # (5, *bucket) bool
            x = jnp.where(lmask, x, pad_value)
            x = windowing(x, span, (0.0, 1.0))

            fw = ([fw_los[i] for i in range(3)], [fw_his[i] for i in range(3)],
                  [fw_fracs[i] for i in range(3)])
            x80 = gather_resize(x, fw)                 # (5, 80,80,80)
            l80 = gather_resize_nearest(lmask.astype(jnp.float32),
                                        fw) > 0.5

            dense, refined = model_eval.apply(
                {"params": params, "batch_stats": batch_stats},
                x80[..., None], l80[..., None].astype(jnp.float32))
            out = refined[..., 0].astype(jnp.float32)  # (5, 80,80,80)

            probs = jax.nn.sigmoid(out)
            lm = l80.astype(jnp.float32)
            ratio = jnp.sum(probs * lm, (1, 2, 3)) / \
                jnp.maximum(jnp.sum(lm, (1, 2, 3)), 1.0)
            nonzero_cls = (ratio >= CTSS_RATIO_UB[0]).astype(jnp.float32)

            # reference order (job_runner.py:993-997): resize the RAW
            # logits back, relu, then max-normalise over the crop box
            bw = ([bw_los[i] for i in range(3)], [bw_his[i] for i in range(3)],
                  [bw_fracs[i] for i in range(3)])
            cam_b = jnp.maximum(gather_resize(out, bw), 0.0)  # (5, *bucket)
            box = _crop_box_mask(box_lo, box_sz, bucket)
            cam_max = jnp.max(jnp.where(box, cam_b, 0.0), (1, 2, 3),
                              keepdims=True)
            cam_b = cam_b / jnp.maximum(cam_max, 1e-12)
            cam_b = cam_b * nonzero_cls[:, None, None, None]
            cam_b = cam_b * (lobe_present[:, None, None, None])

            htp = jnp.zeros(iso_shape, jnp.float32)
            for li in range(n_lobes):
                region = jax.lax.dynamic_slice(htp, tuple(starts[li]), bucket)
                upd = jnp.where(lmask[li], cam_b[li], region)
                htp = jax.lax.dynamic_update_slice(htp, upd, tuple(starts[li]))
            return htp, ratio, nonzero_cls

        self._stage2[key] = stage2
        return stage2

    # -- stage 3: threshold + post + back-resample ------------------------
    @_stage_builder
    def _get_stage3(self, iso_shape, out_shape, back_scales):
        key = (iso_shape, out_shape, tuple(np.round(back_scales, 6)))
        if key in self._stage3:
            return self._stage3[key]
        span = self.windowing_span

        @jax.jit
        def stage3(htp, iso_scan, iso_lobe, vessel):
            lung = iso_lobe > 0
            th = binary_cam_threshold(htp, mask=lung)
            pred = (htp > th).astype(jnp.float32)
            w_scan = windowing(iso_scan, span, (0.0, 1.0))
            th_i = binary_cam_threshold(w_scan, mask=lung, scaler=0.75)
            post = pred * (w_scan > th_i) * (1.0 - (vessel > 0))
            pred_o = itk_resample3d(pred, out_shape, scales=back_scales,
                                    method="nearest")
            post_o = itk_resample3d(post, out_shape, scales=back_scales,
                                    method="nearest")
            # bit-packed D2H: 8x less traffic on low-bandwidth host links
            return packbits_u8(pred_o > 0.5), packbits_u8(post_o > 0.5), th

        self._stage3[key] = stage3
        return stage3

    # -- stage 3c: crop-aware variant (host-prepped lung-cropped grids) --
    @_stage_builder
    def _get_stage3c(self, iso_crop_shape, out_crop_shape,
                     want_heatmap=False):
        key = ("crop", iso_crop_shape, out_crop_shape, want_heatmap)
        if key in self._stage3:
            return self._stage3[key]
        span = self.windowing_span

        @jax.jit
        def stage3c(htp, iso_scan, iso_lobe, vessel, gz, gy, gx):
            lung = iso_lobe > 0
            th = binary_cam_threshold(htp, mask=lung)
            pred = (htp > th).astype(jnp.float32)
            w_scan = windowing(iso_scan, span, (0.0, 1.0))
            th_i = binary_cam_threshold(w_scan, mask=lung, scaler=0.75)
            post = pred * (w_scan > th_i) * (1.0 - (vessel > 0))

            def back(x):
                x = jnp.take(x, gz, axis=0)
                x = jnp.take(x, gy, axis=1)
                return jnp.take(x, gx, axis=2)

            outs = (packbits_u8(back(pred) > 0.5),
                    packbits_u8(back(post) > 0.5), th)
            if want_heatmap:
                heat_u8 = jnp.clip(back(htp) * 255.0, 0, 255).astype(jnp.uint8)
                outs = outs + (heat_u8,)
            return outs

        self._stage3[key] = stage3c
        return stage3c

    @staticmethod
    def _back_gather_tables(out_shape, scale, crop_lo, crop_shape,
                            multiple=32):
        """Host: per-axis nearest gather indices (into the cropped iso grid)
        for the original-grid output window covering the crop. Returns
        (o_lo, o_shape, [idx_z, idx_y, idx_x])."""
        o_lo, o_shape, tables = [], [], []
        for ax in range(3):
            i = np.arange(out_shape[ax])
            idx = np.floor(i * scale[ax] + 0.5).astype(np.int64) - crop_lo[ax]
            valid = (idx >= 0) & (idx < crop_shape[ax])
            nz = np.where(valid)[0]
            lo = int(nz[0]) if len(nz) else 0
            hi = int(nz[-1]) + 1 if len(nz) else 1
            size = min(-(-(hi - lo) // multiple) * multiple, out_shape[ax])
            lo = max(0, min(lo, out_shape[ax] - size))
            o_lo.append(lo)
            o_shape.append(size)
            tables.append(np.clip(idx[lo:lo + size], 0,
                                  crop_shape[ax] - 1).astype(np.int32))
        return o_lo, tuple(o_shape), tables

    # ---------------------------------------------------------------
    @staticmethod
    def _bboxes(projs_np, n_lobes, border_vox, iso_shape):
        """Host: per-lobe bbox (lo, size) + presence flags from the tiny
        per-axis projections computed on device."""
        lows = np.zeros((n_lobes, 3), np.int32)
        sizes = np.ones((n_lobes, 3), np.int32)
        present = np.zeros((n_lobes,), np.float32)
        for li in range(n_lobes):
            if not projs_np[0][li].any():
                continue
            present[li] = 1.0
            for ax in range(3):
                idx = np.where(projs_np[ax][li])[0]
                lo = max(0, int(idx[0]) - border_vox)
                hi = min(iso_shape[ax], int(idx[-1]) + 1 + border_vox)
                lows[li, ax] = lo
                sizes[li, ax] = hi - lo
        return lows, sizes, present

    def process(self, scan_np, lobe_np, spacing, iso_spacing=1.0,
                vessel_np=None, crop_border_mm=5.0):
        """Full pipeline; returns dict with masks at the original grid."""
        in_shape = tuple(scan_np.shape)
        spacing = np.asarray(spacing, np.float64)
        scales = (iso_spacing / spacing)
        iso_shape = tuple(int(np.ceil(s / sc))
                          for s, sc in zip(in_shape, scales))

        stage1 = self._get_stage1(in_shape, iso_shape, tuple(scales.tolist()))
        iso_scan, iso_lobe, projs = stage1(jnp.asarray(scan_np),
                                           jnp.asarray(lobe_np))

        # host bboxes from the tiny device-computed projections
        projs_np = [np.asarray(p) for p in projs]
        border_vox = int(np.ceil(crop_border_mm / iso_spacing))
        lows, sizes, present = self._bboxes(projs_np, self.n_lobes,
                                            border_vox, iso_shape)
        return self._finish(iso_scan, iso_lobe, lows, sizes, present,
                            iso_shape, spacing, iso_spacing, in_shape,
                            vessel_np, unpack=True)

    def _run_stage2(self, iso_scan, iso_lobe, lows, sizes, present,
                    iso_shape):
        """Bucket planning + the batched lobe-chunk program -> (htp, ratio)."""
        bucket, starts, offsets = plan_bucket(lows, sizes, iso_shape)

        fw = forward_resize_weights(sizes, offsets, self.chunk_size, bucket)
        bw = backward_resize_weights(sizes, offsets, self.chunk_size, bucket)
        stage2 = self._get_stage2(iso_shape, bucket)
        box_args = (jnp.asarray(np.asarray(offsets, np.int32)),
                    jnp.asarray(np.asarray(sizes, np.int32)))
        htp, ratio, nz = stage2(
            self.params, self.batch_stats, iso_scan, iso_lobe,
            jnp.asarray(starts),
            [jnp.asarray(a) for a in fw[0]], [jnp.asarray(a) for a in fw[1]],
            [jnp.asarray(a) for a in fw[2]],
            [jnp.asarray(a) for a in bw[0]], [jnp.asarray(a) for a in bw[1]],
            [jnp.asarray(a) for a in bw[2]],
            jnp.asarray(present), *box_args)
        return htp, ratio

    def _finish(self, iso_scan, iso_lobe, lows, sizes, present, iso_shape,
                spacing, iso_spacing, out_shape, vessel_np, unpack=True):
        """Shared tail for uncropped iso grids: stage2 + full stage3."""
        htp, ratio = self._run_stage2(iso_scan, iso_lobe, lows, sizes,
                                      present, iso_shape)
        back_scales = tuple((np.asarray(spacing) / iso_spacing).tolist())
        vessel = jnp.zeros(iso_shape, jnp.uint8) if vessel_np is None \
            else jnp.asarray(vessel_np)
        stage3 = self._get_stage3(iso_shape, tuple(out_shape), back_scales)
        pred_p, post_p, th = stage3(htp, iso_scan, iso_lobe, vessel)
        out = {"pred_packed": pred_p, "post_packed": post_p,
               "heatmap_iso": htp, "threshold": float(th),
               "ratios": np.asarray(ratio), "out_shape": tuple(out_shape)}
        if unpack:
            out["pred"] = unpackbits_np(np.asarray(pred_p), out_shape)
            out["post"] = unpackbits_np(np.asarray(post_p), out_shape)
        return out

    @staticmethod
    def _bboxes_from_labels(iso_lobe_np, n_lobes, border_vox, iso_shape):
        """Host bboxes straight from a host-resident label volume."""
        lows = np.zeros((n_lobes, 3), np.int32)
        sizes = np.ones((n_lobes, 3), np.int32)
        present = np.zeros((n_lobes,), np.float32)
        projs = [
            np.stack([(iso_lobe_np == li + 1).any(
                axis=tuple(i for i in range(3) if i != ax))
                for li in range(n_lobes)])
            for ax in range(3)]
        return FastScanPipeline._bboxes(projs, n_lobes, border_vox, iso_shape)

    def process_prepped(self, prep, vessel_np=None, crop_border_mm=5.0,
                        unpack=True, want_heatmap=False):
        """Device path for host-prepared, lung-cropped scans
        (data.hostprep.prep_scan): H2D moves only the 12-bit scan + 4-bit
        lobe payloads of the lung window; bboxes come from the
        host-resident iso lobe volume; the output mask is emitted packed
        over the original-grid lung window and pasted into zeros on host
        (the lesion mask is provably zero outside the window)."""
        iso_shape = prep["iso_shape"]  # cropped iso grid
        if prep.get("wire") == "w8":
            stage1 = self._get_stage1w(iso_shape, prep["n_voxels"],
                                       tuple(prep["windowing_span"]))
        else:
            stage1 = self._get_stage1p(iso_shape, prep["n_voxels"])
        iso_scan, iso_lobe = stage1(jnp.asarray(prep["packed_scan"]),
                                    jnp.asarray(prep["packed_lobe"]))
        border_vox = int(np.ceil(crop_border_mm / prep["iso_spacing"]))
        lows, sizes, present = self._bboxes_from_labels(
            prep["iso_lobe_host"], self.n_lobes, border_vox, iso_shape)
        htp, ratio = self._run_stage2(iso_scan, iso_lobe, lows, sizes,
                                      present, iso_shape)

        out_shape = tuple(prep["out_shape"])
        scale = np.asarray(prep["spacing"]) / prep["iso_spacing"]
        o_lo, o_shape, tables = self._back_gather_tables(
            out_shape, scale, np.asarray(prep["crop_lo"]), iso_shape)
        if vessel_np is None:
            vessel_np = prep.get("iso_vessel_host")
        vessel = jnp.zeros(iso_shape, jnp.uint8) if vessel_np is None \
            else jnp.asarray(vessel_np)
        stage3c = self._get_stage3c(iso_shape, o_shape, want_heatmap)
        res = stage3c(htp, iso_scan, iso_lobe, vessel,
                      *[jnp.asarray(t) for t in tables])
        pred_p, post_p, th = res[:3]
        # unpack=False keeps scalars as device values: no host sync on the
        # dispatch path (the caller's finish stage fetches them), so the
        # next scan's prep/H2D overlaps this scan's device tail
        out = {"pred_packed": pred_p, "post_packed": post_p,
               "heatmap_iso": htp,
               "threshold": float(th) if unpack else th,
               "ratios": np.asarray(ratio) if unpack else ratio,
               "present": present,
               "out_shape": out_shape,
               "out_window": (tuple(o_lo), o_shape)}
        sl = tuple(slice(l, l + s) for l, s in zip(o_lo, o_shape))
        if want_heatmap:
            heat = np.zeros(out_shape, np.uint8)
            heat[sl] = np.asarray(res[3])
            out["heatmap_u8"] = heat
        if unpack:
            for name, packed in (("pred", pred_p), ("post", post_p)):
                full = np.zeros(out_shape, np.uint8)
                full[sl] = unpackbits_np(np.asarray(packed), o_shape)
                out[name] = full
        return out

    # -- chunk wire ("wc"): host-extracted chunks, minimal H2D ----------
    #
    # Three programs instead of one monolith: pre (bucket-keyed, cheap
    # XLA), model (NO geometry in the key — the heavy Mosaic executable
    # compiles/loads exactly once and serves every scan geometry), post
    # (geometry-keyed, cheap XLA). Intermediates stay on device.
    @_stage_builder
    def _get_stage2pre(self, bucket):
        key = ("wcp", bucket)
        if key in self._stage2:
            return self._stage2[key]
        chunk = self.chunk_size
        n_lobes = self.n_lobes
        lay_u8, lay_i32, lay_f32 = _wire_layout_m(n_lobes, chunk, bucket)

        @jax.jit
        def stage2pre(u8b, i32b, f32b):
            fw = ([_blob_get(i32b, lay_i32, f"fw_lo{ax}") for ax in range(3)],
                  [_blob_get(i32b, lay_i32, f"fw_hi{ax}") for ax in range(3)],
                  [_blob_get(f32b, lay_f32, f"fw_fr{ax}") for ax in range(3)])
            lmask = unpackbits_u8_dev(_blob_get(u8b, lay_u8, "lobe_bits"),
                                      (n_lobes, *bucket))
            xb = _blob_get(u8b, lay_u8, "x80").astype(jnp.uint16)
            bits = (xb[..., 0] | (xb[..., 1] << 8)).astype(jnp.uint16)
            x80 = jax.lax.bitcast_convert_type(
                bits, jnp.bfloat16).astype(jnp.float32)
            l80 = gather_resize_nearest(lmask.astype(jnp.float32),
                                        fw) > 0.5
            return x80, l80.astype(jnp.float32), lmask

        self._stage2[key] = stage2pre
        return stage2pre

    @_stage_builder
    def _get_stage2model(self):
        """The heavy stage: model forward on the fixed (n_lobes, *chunk)
        batch + per-lobe ratio. Its jit key carries NO scan geometry, so
        one compiled executable (and one warm-cache entry) covers every
        iso grid / bucket / output shape."""
        key = ("wcm",)
        if key in self._stage2:
            return self._stage2[key]
        model_eval = self.model_eval

        @jax.jit
        def stage2model(params, batch_stats, x80, l80f):
            dense, refined = model_eval.apply(
                {"params": params, "batch_stats": batch_stats},
                x80[..., None], l80f[..., None])
            out = refined[..., 0].astype(jnp.float32)
            probs = jax.nn.sigmoid(out)
            ratio = jnp.sum(probs * l80f, (1, 2, 3)) / \
                jnp.maximum(jnp.sum(l80f, (1, 2, 3)), 1.0)
            return out, ratio

        self._stage2[key] = stage2model
        return stage2model

    @_stage_builder
    def _get_stage2post(self, iso_shape, bucket, o_shape, want_heatmap):
        key = ("wcs", iso_shape, bucket, o_shape, want_heatmap)
        if key in self._stage2:
            return self._stage2[key]
        n_lobes = self.n_lobes
        lay_i32, lay_f32 = _wire_layout_s(n_lobes, bucket,
                                          iso_shape, o_shape)

        @jax.jit
        def stage2post(out, ratio, lmask, i32b, f32b, *cand_packed):
            def gi(name):
                return _blob_get(i32b, lay_i32, name)

            starts = gi("starts")
            box_lo, box_sz = gi("box_lo"), gi("box_sz")
            gz, gy, gx = gi("gz"), gi("gy"), gi("gx")
            lobe_present = _blob_get(f32b, lay_f32, "present")
            bw = ([gi(f"bw_lo{ax}") for ax in range(3)],
                  [gi(f"bw_hi{ax}") for ax in range(3)],
                  [_blob_get(f32b, lay_f32, f"bw_fr{ax}")
                   for ax in range(3)])
            nonzero_cls = (ratio >= CTSS_RATIO_UB[0]).astype(jnp.float32)

            # reference order (job_runner.py:993-997): resize the RAW
            # logits back, relu, then max-normalise over the crop box
            cam_b = jnp.maximum(gather_resize(out, bw), 0.0)
            box = _crop_box_mask(box_lo, box_sz, bucket)
            cam_max = jnp.max(jnp.where(box, cam_b, 0.0), (1, 2, 3),
                              keepdims=True)
            cam_b = cam_b / jnp.maximum(cam_max, 1e-12)
            cam_b = cam_b * nonzero_cls[:, None, None, None]
            cam_b = cam_b * (lobe_present[:, None, None, None])

            htp = jnp.zeros(iso_shape, jnp.float32)
            lung = jnp.zeros(iso_shape, bool)
            for li in range(n_lobes):
                region = jax.lax.dynamic_slice(htp, tuple(starts[li]), bucket)
                upd = jnp.where(lmask[li], cam_b[li], region)
                htp = jax.lax.dynamic_update_slice(htp, upd,
                                                   tuple(starts[li]))
                lregion = jax.lax.dynamic_slice(lung, tuple(starts[li]),
                                                bucket)
                lung = jax.lax.dynamic_update_slice(
                    lung, lregion | lmask[li], tuple(starts[li]))

            th = binary_cam_threshold(htp, mask=lung)
            pred = (htp > th)

            def back(x):
                x = jnp.take(x, gz, axis=0)
                x = jnp.take(x, gy, axis=1)
                return jnp.take(x, gx, axis=2)

            # D2H payload: pred bits plus a tiny f32 meta vector
            # [ratios..., threshold] — 2 fetch RPCs per scan. Without a
            # heatmap the mask ships ALONE on the COARSE iso grid (the
            # host does the nearest back-gather with the same tables —
            # bit-identical, see expand_packed_mask — and derives post =
            # pred & cand by ANDing PACKED rows with the candidate it
            # computed at prep): ~2x fewer D2H bytes again on top of the
            # iso-grid saving, and the candidate never rides H2D. The
            # heatmap/archive path keeps the device post rule (the
            # intensity+vessel candidate is exact either way: the w8
            # wire already quantizes the windowed scan to the u8 levels
            # the Otsu bins over; vessel is folded in).
            meta = jnp.concatenate([ratio.astype(jnp.float32),
                                    th.astype(jnp.float32)[None]])
            if want_heatmap:
                cand = unpackbits_u8_dev(cand_packed[0], iso_shape)
                post = pred & cand
                masks = jnp.stack([packbits_u8(back(pred)),
                                   packbits_u8(back(post))])
            else:
                # single-RPC D2H: the tiny meta vector rides as trailing
                # bytes of the packed-mask vector, so the host fetches
                # ONE array per scan instead of two. On tunneled links
                # the per-RPC latency (measured ~1 s when degraded,
                # ~30-100 ms healthy) was a full extra pipeline stage.
                meta_u8 = jax.lax.bitcast_convert_type(
                    meta, jnp.uint8).reshape(-1)
                masks = jnp.concatenate([packbits_u8(pred), meta_u8])
            outs = (masks, meta)
            if want_heatmap:
                heat_u8 = jnp.clip(back(htp) * 255.0, 0, 255).astype(jnp.uint8)
                outs = outs + (heat_u8,)
            return outs

        self._stage2[key] = stage2post
        return stage2post

    @_stage_builder
    def _get_stage2val(self, bucket):
        """Validation epilogue (reference job_runner.py:766-775 semantics,
        on device): sigmoid probs of the refined head resized back to the
        lobe crop, masked per lobe, summed — the caller divides to get the
        scan-level predicted lesion ratio. Keyed on the bucket only, so it
        adds one tiny XLA compile next to the shared heavy stage2model."""
        key = ("wcv", bucket)
        if key in self._stage2:
            return self._stage2[key]

        @jax.jit
        def stage2val(out, lmask, lo0, lo1, lo2, hi0, hi1, hi2,
                      fr0, fr1, fr2, present):
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            bw = ([lo0, lo1, lo2], [hi0, hi1, hi2], [fr0, fr1, fr2])
            pb = gather_resize(probs, bw)
            m = lmask.astype(jnp.float32) * present[:, None, None, None]
            return jnp.sum(pb * m), jnp.sum(m)

        self._stage2[key] = stage2val
        return stage2val

    def process_chunks_val(self, prepc):
        """Training-validation forward on the chunk wire: one batched
        5-lobe pass through the SAME compiled stage2pre/stage2model
        programs inference uses (no B=1 eval program exists any more),
        plus the tiny bucket-keyed val epilogue. Returns the scan-level
        predicted lesion ratio (mean refined-head prob within the lung),
        matching the reference's full-scan stitch-then-mean
        (job_runner.py:720-779) on the iso grid."""
        bucket = prepc["bucket"]
        if "_dev_m" not in prepc:
            self.upload_chunks_prep(prepc)
        params, batch_stats = self._params_on(prepc.get("_device"))
        x80, l80f, lmask = self._get_stage2pre(bucket)(*prepc["_dev_m"])
        out, _ = self._get_stage2model()(params, batch_stats, x80, l80f)
        bw = prepc["bw"]
        args = [jnp.asarray(bw[0][ax]) for ax in range(3)] + \
               [jnp.asarray(bw[1][ax]) for ax in range(3)] + \
               [jnp.asarray(bw[2][ax]) for ax in range(3)]
        s, v = self._get_stage2val(bucket)(
            out, lmask, *args,
            jnp.asarray(prepc["present"], jnp.float32))
        return float(s) / max(float(v), 1.0)

    def upload_chunks_prep(self, prepc, device=None):
        """Pack every wire and table of a chunk prep into the coalesced
        model-side and stitch-side blobs (_wire_layout_m/_s) and
        device-put them (onto `device` when given — scan-level multi-chip
        parallelism; process_chunks follows the blobs' placement). Call
        from a prep thread so the dispatch loop does no H2D or table work
        (the deploy host is single-core; main-thread GIL time is
        throughput, and each device_put RPC costs fixed latency on
        tunneled links)."""
        o_lo, o_shape, tables = self._back_gather_tables(
            tuple(prepc["out_shape"]),
            np.asarray(prepc["spacing"]) / prepc["iso_spacing"],
            np.asarray(prepc["crop_lo"]), prepc["iso_shape"])
        prepc["_back"] = (o_lo, o_shape)
        prepc["_back_tables"] = tables  # host copy for expand_packed_mask
        m_u8, m_i32, m_f32 = _wire_layout_m(
            self.n_lobes, self.chunk_size, prepc["bucket"])
        s_i32, s_f32 = _wire_layout_s(
            self.n_lobes, prepc["bucket"], prepc["iso_shape"], o_shape)
        fw, bw = prepc["fw"], prepc["bw"]
        mi32, mf32 = {}, {}
        si32 = {"starts": prepc["starts"], "box_lo": prepc["offsets"],
                "box_sz": prepc["sizes"], "gz": tables[0], "gy": tables[1],
                "gx": tables[2]}
        sf32 = {"present": prepc["present"]}
        for ax in range(3):
            mi32[f"fw_lo{ax}"], mi32[f"fw_hi{ax}"] = fw[0][ax], fw[1][ax]
            mf32[f"fw_fr{ax}"] = fw[2][ax]
            si32[f"bw_lo{ax}"], si32[f"bw_hi{ax}"] = bw[0][ax], bw[1][ax]
            sf32[f"bw_fr{ax}"] = bw[2][ax]
        def put(x):
            return jnp.asarray(x) if device is None \
                else jax.device_put(x, device)

        prepc["_dev_m"] = [
            put(_pack_blob(m_u8, {
                "x80": np.ascontiguousarray(
                    prepc["x80_bits"]).view(np.uint8),
                "lobe_bits": prepc["lobe_bits"]}, np.uint8)),
            put(_pack_blob(m_i32, mi32, np.int32)),
            put(_pack_blob(m_f32, mf32, np.float32))]
        prepc["_dev_s"] = [
            put(_pack_blob(s_i32, si32, np.int32)),
            put(_pack_blob(s_f32, sf32, np.float32))]
        prepc["_device"] = device
        return prepc

    def process_chunks(self, prepc, unpack=True, want_heatmap=False):
        """Device path for the chunk wire (prep_scan_chunks): H2D moves
        only the 5 bf16-bit windowed model chunks, 1-bit lobe bucket masks and
        the stitch tables — the 1-bit post-rule candidate stays host-side
        (post = packed-pred AND packed-cand after the D2H) — ~8x less
        than the w8 scan wire.
        All stitching/Otsu/thresholding stays on device, in three chained
        programs (pre/model/post) whose intermediates never leave HBM;
        only pre and post are geometry-keyed (cheap XLA compiles), the
        heavy model program is compiled once for ALL geometries."""
        iso_shape = prepc["iso_shape"]
        bucket = prepc["bucket"]
        if "_dev_m" not in prepc:
            self.upload_chunks_prep(prepc)
        o_lo, o_shape = prepc["_back"]
        params, batch_stats = self._params_on(prepc.get("_device"))
        x80, l80f, lmask = self._get_stage2pre(bucket)(*prepc["_dev_m"])
        out_l, ratio = self._get_stage2model()(params, batch_stats,
                                               x80, l80f)
        stage2post = self._get_stage2post(iso_shape, bucket, o_shape,
                                          want_heatmap)
        on_iso = not want_heatmap  # stage2post ships the iso-grid pred then
        if want_heatmap:
            # the archive path runs the post rule on device: lazily put
            # the packed candidate (the hot path never uploads it)
            if "_dev_cand" not in prepc:
                cb = np.asarray(prepc["cand_bits"], np.uint8)
                dev = prepc.get("_device")
                prepc["_dev_cand"] = jnp.asarray(cb) if dev is None \
                    else jax.device_put(cb, dev)
            res = stage2post(out_l, ratio, lmask, *prepc["_dev_s"],
                             prepc["_dev_cand"])
        else:
            res = stage2post(out_l, ratio, lmask, *prepc["_dev_s"])
        masks, meta = res[0], res[1]
        cand_np = np.asarray(prepc["cand_bits"], np.uint8) if on_iso \
            else None
        # iso wire: the meta f32s ride as trailing bytes of `masks`
        # (single-RPC D2H); mask_bytes marks the split point
        mask_bytes = int(np.prod(iso_shape)) // 8 if on_iso else None
        if unpack:
            if on_iso:
                combined = np.asarray(masks)
                pred_p = combined[:mask_bytes]
                meta_np = combined[mask_bytes:].view(np.float32)
                post_p = np.bitwise_and(pred_p, cand_np)
            else:
                meta_np = np.asarray(meta)
                masks_np = np.asarray(masks)
                pred_p, post_p = masks_np[0], masks_np[1]
            th, ratio = float(meta_np[-1]), meta_np[:-1]
        else:
            # keep everything on device: the caller's finish stage fetches
            # the combined masks+meta vector in ONE RPC, off the dispatch
            # path, and (iso wire) derives post by ANDing the packed pred
            # with `cand_bits` host-side. threshold/ratios stay as LAZY
            # device slices — materializing them costs an extra RPC.
            th, ratio = meta[-1], meta[:-1]
            if on_iso:
                pred_p, post_p = masks, None
            else:
                pred_p, post_p = masks[0], masks[1]
        out = {"masks_packed": masks, "meta": meta,
               "meta_in_masks": bool(on_iso), "mask_bytes": mask_bytes,
               "pred_packed": pred_p, "post_packed": post_p,
               "cand_bits": cand_np,
               "threshold": th, "ratios": ratio,
               "present": prepc["present"],
               "out_shape": tuple(prepc["out_shape"]),
               "out_window": (tuple(o_lo), o_shape),
               "masks_on_iso": on_iso, "iso_shape": tuple(iso_shape),
               "back_tables": prepc["_back_tables"]}
        sl = tuple(slice(l, l + s) for l, s in zip(o_lo, o_shape))
        if want_heatmap:
            heat = np.zeros(out["out_shape"], np.uint8)
            heat[sl] = np.asarray(res[2])
            out["heatmap_u8"] = heat
        if unpack:
            for name, packed in (("pred", pred_p), ("post", post_p)):
                if on_iso:
                    out[name] = expand_packed_mask(
                        packed, iso_shape, out["out_shape"], o_lo, o_shape,
                        prepc["_back_tables"])
                else:
                    full = np.zeros(out["out_shape"], np.uint8)
                    full[sl] = unpackbits_np(packed, o_shape)
                    out[name] = full
        return out


def expand_packed_mask(packed, iso_shape, out_shape, o_lo, o_shape,
                       tables):
    """Host nearest back-resample of an iso-crop packed mask into a full-
    resolution u8 volume — the exact twin of stage2post's device `back()`
    (same index tables; nearest gather of bits commutes with packing, so
    the result is bit-identical to the device-side gather-then-pack).
    C++ fast path (native.unpack_nearest_gather); NumPy fallback."""
    full = np.zeros(tuple(out_shape), np.uint8)
    packed = np.asarray(packed)
    try:
        from ..native import hostprep_native
        hostprep_native.unpack_nearest_gather(
            packed, iso_shape, full, o_lo, o_shape, tables)
    except Exception:
        bits = unpackbits_np(packed, iso_shape)
        sl = tuple(slice(l, l + s) for l, s in zip(o_lo, o_shape))
        full[sl] = bits[np.ix_(*tables)]
    return full


def _host_gather_resize(x, los, his, fracs):
    """Host twin of gather_resize for one volume (same axis order and
    f32 lerp as the device): x (D,H,W) float32 -> (out_z, out_y, out_x)."""
    for ax in range(3):
        a = np.take(x, los[ax], axis=ax)
        b = np.take(x, his[ax], axis=ax)
        shape = [1, 1, 1]
        shape[ax] = -1
        f = fracs[ax].astype(np.float32).reshape(shape)
        x = a * (1.0 - f) + b * f
    return x


def prep_scan_chunks(scan_int16, lobe_u8, spacing, iso_spacing=1.0,
                     pad_value=-2048, vessel_u8=None,
                     windowing_span=DEFAULT_WINDOWING_SPAN,
                     chunk_size=(80, 80, 80), n_lobes=5,
                     crop_border_mm=5.0):
    """Host prep for the chunk wire: iso resample + lung crop, then
    per-lobe chunk extraction and the intensity post-rule candidate, so
    the device sees only:

      x80_bits   (n_lobes, *chunk) windowed model inputs, bf16 bits
      lobe_bits  packbits(n_lobes, *bucket) lobe masks
      cand_bits  packbits(iso crop grid) intensity-Otsu & ~vessel

    Chunk math mirrors stage2 exactly (mask -> window -> fw gather
    resize, then RNE-rounded to bf16 — the same rounding the model's
    bf16 input cast applies, so the wire adds no quantization beyond the
    compute dtype; residual wc-vs-w8 differences are f32 lerp
    association ulps that flip a bf16 rounding on ~2^-16 of voxels).
    The intensity threshold mirrors stage3's
    binary_cam_threshold on the w8-decoded scan, which quantizes to the
    same u8 levels this prep Otsu's over (reference job_runner.py:966-982
    crop/mask/window and :1008-1014 post rules).

    The hot path is C++/GIL-free (native.hostprep_native chunk kernels) —
    on single-core deploy hosts the NumPy version starves the dispatch
    loop; the NumPy twin below is the portable fallback and parity
    oracle."""
    try:
        return _prep_scan_chunks_native(
            scan_int16, lobe_u8, spacing, iso_spacing, pad_value,
            vessel_u8, windowing_span, chunk_size, n_lobes, crop_border_mm)
    except Exception:
        global _NATIVE_PREP_WARNED
        if not _NATIVE_PREP_WARNED:
            _NATIVE_PREP_WARNED = True
            logging.getLogger(__name__).warning(
                "native chunk prep failed; falling back to the NumPy prep "
                "(GIL-holding — expect degraded throughput on single-core "
                "deploy hosts)", exc_info=True)
        return _prep_scan_chunks_np(
            scan_int16, lobe_u8, spacing, iso_spacing, pad_value,
            vessel_u8, windowing_span, chunk_size, n_lobes, crop_border_mm)


def _prep_scan_chunks_native(scan_int16, lobe_u8, spacing, iso_spacing,
                             pad_value, vessel_u8, windowing_span,
                             chunk_size, n_lobes, crop_border_mm):
    from ..core.ops import otsu_threshold_from_hist
    from ..native import hostprep_native as hp

    spacing = np.asarray(spacing, np.float64)
    # lung crop from one C++ subgrid-bbox pass over the RAW lobe volume
    # (identical to bboxing the materialized iso resample — same nearest
    # axis tables — without building the full iso grid), with
    # data.hostprep.lung_crop's border/rounding semantics
    mins, maxs, iso_full_shape = hp.subgrid_bboxes(lobe_u8, spacing,
                                                   iso_spacing, n_lobes)
    have = maxs[:, 0] >= mins[:, 0]
    shape_arr = np.asarray(iso_full_shape, np.int64)
    if have.any():
        lo = np.maximum(mins[have].min(axis=0).astype(np.int64) - 8, 0)
        hi = np.minimum(maxs[have].max(axis=0).astype(np.int64) + 1 + 8,
                        shape_arr)
    else:
        lo, hi = np.zeros(3, np.int64), shape_arr.copy()
    size = np.minimum(-(-(hi - lo) // 32) * 32, shape_arr)
    crop_lo = np.maximum(np.minimum(lo, shape_arr - size), 0)
    iso_shape = tuple(int(s) for s in size)
    # the scan is resampled only inside the crop window (the rest of the
    # iso grid is never consumed by the chunk wire); the windowed-u8 twin
    # and Otsu histogram are emitted in the same pass
    lobe_c = hp.resample_window_labels(lobe_u8, spacing, iso_spacing,
                                       crop_lo, iso_shape)
    scan_c, u8, hist = hp.resample_window_w8hist(
        scan_int16, spacing, iso_spacing, crop_lo, iso_shape, lobe_c,
        windowing_span, fill=pad_value)

    # per-lobe bboxes inside the crop (+border), python _bboxes semantics
    border_vox = int(np.ceil(crop_border_mm / iso_spacing))
    lows = np.zeros((n_lobes, 3), np.int32)
    sizes = np.ones((n_lobes, 3), np.int32)
    present = np.zeros((n_lobes,), np.float32)
    for li in range(n_lobes):
        if not have[li]:
            continue
        present[li] = 1.0
        for ax in range(3):
            l = max(0, int(mins[li, ax] - crop_lo[ax]) - border_vox)
            h = min(iso_shape[ax],
                    int(maxs[li, ax] - crop_lo[ax]) + 1 + border_vox)
            lows[li, ax] = l
            sizes[li, ax] = h - l
    bucket, starts, offsets = plan_bucket(lows, sizes, iso_shape)
    fw = forward_resize_weights(sizes, offsets, chunk_size, bucket)
    bw = backward_resize_weights(sizes, offsets, chunk_size, bucket)

    x80 = np.zeros((n_lobes, *chunk_size), np.uint16)
    for li in range(n_lobes):
        if present[li]:
            x80[li] = hp.extract_chunk_bf16(scan_c, lobe_c, li + 1,
                                            lows[li], sizes[li],
                                            windowing_span, chunk_size)

    th = otsu_threshold_from_hist(hist)
    nz = np.nonzero(hist)[0]
    if th is None:
        # empty lung: nothing passes (device otsu degrades to 255)
        th_u8 = 256.0
    elif len(nz) == 1:
        th_u8 = th  # single-colour: threshold is that colour, unscaled
    else:
        th_u8 = min(th * 0.75, 255.0)
    vessel_c = None
    if vessel_u8 is not None and np.any(vessel_u8):
        vessel_c = hp.resample_window_labels(vessel_u8, spacing,
                                             iso_spacing, crop_lo,
                                             iso_shape)
    cand_bits = hp.cand_bits(u8, vessel_c, th_u8)
    lobe_bits = hp.lobe_bucket_bits(lobe_c, starts, bucket, n_lobes)

    return {"wire": "wc",
            "x80_bits": x80,
            "lobe_bits": lobe_bits,
            "cand_bits": cand_bits,
            "starts": starts, "bucket": bucket,
            "fw": fw, "bw": bw, "present": present,
            "offsets": offsets, "sizes": sizes,
            "intensity_threshold": min(th_u8, 255.0) / 255.0,
            "iso_shape": iso_shape,
            "crop_lo": crop_lo.astype(np.int64),
            "spacing": tuple(spacing.tolist()),
            "iso_spacing": float(iso_spacing),
            "out_shape": tuple(scan_int16.shape)}


def _prep_scan_chunks_np(scan_int16, lobe_u8, spacing, iso_spacing,
                         pad_value, vessel_u8, windowing_span,
                         chunk_size, n_lobes, crop_border_mm):
    from ..data.hostprep import prep_scan, unpack12_np, window8

    # p12 wire: the chunks interpolate the FULL-PRECISION windowed field
    # of the integer-HU iso grid (reference windowing is f32); only the
    # intensity post rule below works on u8 levels (the reference's own
    # Otsu quantizes to u8, reference utils.py:226-242)
    prep = prep_scan(scan_int16, lobe_u8, spacing, iso_spacing=iso_spacing,
                     pad_value=pad_value, vessel_u8=vessel_u8,
                     windowing_span=None)
    iso_shape = prep["iso_shape"]
    iso_i16 = unpack12_np(prep["packed_scan"],
                          prep["n_voxels"]).reshape(iso_shape)
    u = window8(iso_i16, windowing_span).reshape(iso_shape)  # u8 twin
    lo_w, hi_w = float(windowing_span[0]), float(windowing_span[1])
    iso_lobe = prep["iso_lobe_host"]

    border_vox = int(np.ceil(crop_border_mm / prep["iso_spacing"]))
    lows, sizes, present = FastScanPipeline._bboxes_from_labels(
        iso_lobe, n_lobes, border_vox, iso_shape)
    bucket, starts, offsets = plan_bucket(lows, sizes, iso_shape)
    fw = forward_resize_weights(sizes, offsets, chunk_size, bucket)
    bw = backward_resize_weights(sizes, offsets, chunk_size, bucket)

    x80 = np.zeros((n_lobes, *chunk_size), np.uint16)
    lmask = np.zeros((n_lobes, *bucket), bool)
    for li in range(n_lobes):
        if not present[li]:
            continue
        sl = tuple(slice(int(s), int(s) + b)
                   for s, b in zip(starts[li], bucket))
        crop_l = iso_lobe[sl] == (li + 1)
        lmask[li] = crop_l
        xw = np.where(
            crop_l,
            np.clip((iso_i16[sl].astype(np.float32) - lo_w)
                    / max(hi_w - lo_w, 1e-6), 0.0, 1.0), 0.0)
        r = _host_gather_resize(
            xw, [fw[0][ax][li] for ax in range(3)],
            [fw[1][ax][li] for ax in range(3)],
            [fw[2][ax][li] for ax in range(3)])
        import ml_dtypes
        x80[li] = np.asarray(r, ml_dtypes.bfloat16).view(np.uint16)

    # intensity post-rule candidate (stage3 semantics on the w8 wire):
    # Otsu over the windowed-u8 scan within lung, scaled 0.75, compared
    # strictly; all-outside-lung -> nothing passes; vessel excluded here
    lung = iso_lobe > 0
    vals = u[lung]
    if vals.size == 0:
        cand = np.zeros(iso_shape, bool)
        th_i = 1.0
    else:
        vmin, vmax = int(vals.min()), int(vals.max())
        if vmin >= vmax:
            th_u8 = float(vmin)
        else:
            th_u8 = min(otsu_threshold_u8_np(vals) * 0.75, 255.0)
        cand = u.astype(np.float32) > th_u8
        th_i = th_u8 / 255.0
    vessel = prep.get("iso_vessel_host")
    if vessel is not None:
        cand &= ~(vessel > 0)

    return {"wire": "wc",
            "x80_bits": x80,
            "lobe_bits": np.packbits(lmask.reshape(-1)),
            "cand_bits": np.packbits(cand.reshape(-1)),
            "starts": starts, "bucket": bucket,
            "fw": fw, "bw": bw, "present": present,
            "offsets": offsets, "sizes": sizes,
            "intensity_threshold": th_i,
            "iso_shape": iso_shape,
            "crop_lo": prep["crop_lo"],
            "spacing": prep["spacing"],
            "iso_spacing": prep["iso_spacing"],
            "out_shape": prep["out_shape"]}
