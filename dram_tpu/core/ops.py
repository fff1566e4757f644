"""Device-side imaging ops: windowing, Otsu, masked pooling, bbox, stitching.

TPU-native equivalents of the reference's host/NumPy imaging utilities
(reference: dram/utils.py:189-198 windowing, :226-242 binary_cam/Otsu,
:244-254 find_crops, :437-462 IOU/Dice; dram/models.py:37-49 masked pooling).
Everything here is jittable with fixed shapes: boolean masks are carried as
arrays (never used for shape-changing indexing), histograms are fixed 256-bin,
and bounding boxes are returned as index arrays.

Arrays are channels-last: volumes are (D, H, W) or (B, D, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windowing (HU clip + linear rescale). Reference: utils.py:189-198.
# ---------------------------------------------------------------------------

def windowing(image, from_span=(-1150, 350), to_span=(0, 255)):
    """Clip to `from_span` and linearly rescale to `to_span`.

    `from_span=None` uses the image min/max (like the reference). Works on
    jnp and np arrays; a single fused XLA op under jit.
    """
    if from_span is None:
        lo = image.min()
        hi = image.max()
    else:
        lo, hi = from_span
    image = jnp.clip(image, lo, hi)
    return (image - lo) / (hi - lo) * (to_span[1] - to_span[0]) + to_span[0]


def windowing_np(image, from_span=(-1150, 350), to_span=(0, 255)):
    """NumPy twin of `windowing` for host-side (I/O, viz) paths."""
    if from_span is None:
        lo, hi = np.min(image), np.max(image)
    else:
        lo, hi = from_span
    image = np.clip(image, lo, hi)
    return ((image - lo) / float(hi - lo)) * (to_span[1] - to_span[0]) + to_span[0]


# ---------------------------------------------------------------------------
# Otsu thresholding on a fixed 256-bin histogram.
#
# Replaces skimage.filters.threshold_otsu on uint8-windowed data
# (reference binary_cam, utils.py:226-242). The histogram restriction to the
# observed [vmin, vmax] range reproduces skimage's behaviour of binning only
# over the data range; masked voxels contribute zero weight.
# ---------------------------------------------------------------------------

def histogram256_mxu(v_int, mask_bool):
    """Masked 256-bin histogram without scatter: an MXU one-hot matmul.

    TPU scatter-add serializes: the profiler measured ~230 ms for the
    26M-voxel heatmap histogram inside the inference device stage — 70%
    of the whole device step. Decompose the bin id into nibbles so
    counts[hi, lo] = sum_n m_n * onehot(v_n >> 4)[hi] * onehot(v_n & 15)[lo],
    an int8 contraction with int32 accumulation (exact: the one-hots and
    the mask are 0/1). Traffic is 32 int8/value instead of a serialized
    scatter; the dot itself rides the MXU.

    `v_int` int values in [0, 255], any shape; `mask_bool` same shape.
    Returns float32 (256,) counts.
    """
    v = v_int.reshape(-1)
    m = mask_bool.reshape(-1)
    pad = (-v.shape[0]) % 128
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
        m = jnp.concatenate([m, jnp.zeros((pad,), bool)])
    v2 = v.reshape(-1, 128)
    m2 = m.reshape(-1, 128)
    rng = jnp.arange(16, dtype=v2.dtype)
    hi = ((v2 >> 4)[..., None] == rng) & m2[..., None]
    lo = (v2 & 15)[..., None] == rng
    counts = jnp.einsum("mli,mlj->ij", hi.astype(jnp.int8),
                        lo.astype(jnp.int8),
                        preferred_element_type=jnp.int32)
    return counts.reshape(256).astype(jnp.float32)


def otsu_threshold_u8(values, mask=None):
    """Otsu threshold of float values in [0, 255] (uint8-quantized by floor).

    Returns the threshold as a float in [0, 255] (a bin center, i.e. an
    integer value). `mask` selects which entries participate; shapes stay
    fixed. Matches skimage.threshold_otsu on the masked uint8 data.
    """
    v = jnp.floor(jnp.clip(values, 0.0, 255.0)).astype(jnp.int32)
    if jax.default_backend() == "tpu":
        m = jnp.ones(v.shape, bool) if mask is None else mask.astype(bool)
        counts = histogram256_mxu(v, m)
    else:
        # CPU/GPU scatter-add is fine (and fastest) off-TPU
        w = (jnp.ones(v.shape, jnp.float32) if mask is None
             else mask.astype(jnp.float32))
        counts = jnp.zeros((256,), jnp.float32).at[v.reshape(-1)].add(
            w.reshape(-1))
    centers = jnp.arange(256, dtype=jnp.float32)

    big = jnp.float32(1e9)
    vmin = jnp.min(jnp.where(counts > 0, centers, big))
    vmax = jnp.max(jnp.where(counts > 0, centers, -big))

    weight1 = jnp.cumsum(counts)
    weight2 = jnp.cumsum(counts[::-1])[::-1]
    cum_cv = jnp.cumsum(counts * centers)
    cum_cv_rev = jnp.cumsum((counts * centers)[::-1])[::-1]
    mean1 = cum_cv / jnp.maximum(weight1, 1e-12)
    mean2 = cum_cv_rev / jnp.maximum(weight2, 1e-12)

    # variance of a cut between bin k and k+1 (skimage: weight1[:-1]*weight2[1:]*...)
    var12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    cut = centers[:-1]
    # only cuts inside the observed data range are candidates (skimage bins
    # span [vmin, vmax] only)
    valid = (cut >= vmin) & (cut < vmax)
    var12 = jnp.where(valid, var12, -jnp.inf)
    th = cut[jnp.argmax(var12)]
    # single-color input: reference returns that color as the threshold.
    # An all-masked-out input degrades to 255 ("nothing passes") instead of
    # the reference's ValueError (utils.py:231-232) — jit-safe behaviour.
    return jnp.clip(jnp.where(vmin >= vmax, vmin, th), 0.0, 255.0)


def otsu_threshold_from_hist(counts256):
    """Otsu threshold from a 256-bin histogram of uint8 data (same math as
    `otsu_threshold_u8_np`); None for an empty histogram."""
    counts256 = np.asarray(counts256, np.float64)
    nz = np.nonzero(counts256)[0]
    if len(nz) == 0:
        return None
    vmin, vmax = int(nz[0]), int(nz[-1])
    if vmin == vmax:
        return float(vmin)
    centers = np.arange(vmin, vmax + 1, dtype=np.float64)
    counts = counts256[vmin:vmax + 1]
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / w1
    m2 = (np.cumsum((counts * centers)[::-1]) / w2[::-1])[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return float(centers[:-1][np.argmax(var12)])


def otsu_threshold_u8_np(values_u8):
    """Host twin of `otsu_threshold_u8` on already-quantized uint8 data:
    the exact skimage.threshold_otsu algorithm over the observed range."""
    v = np.asarray(values_u8).astype(np.uint8).ravel()
    return otsu_threshold_from_hist(np.bincount(v, minlength=256))


def binary_cam_np(values, scaler=1.0, from_span=(0, 1)):
    """Host twin of the reference binary_cam (utils.py:226-242): returns
    (binary mask, threshold-in-[0,1])."""
    values = np.asarray(values)
    if values.size == 0:
        raise ValueError("empty array encountered! values.size == 0.")
    w = windowing_np(values, from_span=from_span, to_span=(0, 255)).astype(np.uint8)
    uniq = np.unique(w)
    if len(uniq) < 2:
        return np.ones_like(w, bool), float(uniq[0]) / 255.0
    th = min(otsu_threshold_u8_np(w) * scaler, 255.0)
    return w >= th, th / 255.0


def binary_cam_threshold(values01, mask=None, scaler=1.0, from_span=(0, 1)):
    """Threshold (in the [0,1] domain) of a CAM/probability volume.

    Reference binary_cam (utils.py:226-242): window values to uint8,
    Otsu-threshold within `mask`, scale by `scaler`, cap at 255.
    The reference then tests `volume > threshold` at full-volume scale.
    """
    w = windowing(values01, from_span=from_span, to_span=(0, 255))
    th_u8 = otsu_threshold_u8(w, mask=mask)
    v = jnp.floor(jnp.clip(w, 0.0, 255.0))
    if mask is not None:
        mvals = jnp.where(mask, v, jnp.nan)
        single = jnp.nanmin(mvals) >= jnp.nanmax(mvals)
    else:
        single = v.min() >= v.max()
    th_u8 = jnp.where(single, th_u8, jnp.minimum(th_u8 * scaler, 255.0))
    return th_u8 / 255.0


# ---------------------------------------------------------------------------
# Masked pooling. Reference: models.py:37-49.
# ---------------------------------------------------------------------------

def pooling_dense_features(dense_outs, lungs=None, pooling_method="avg"):
    """Pool dense logits (B, D, H, W, C) to (B, C).

    'global_avg' / 'global_max' ignore the mask; the default ('avg') is a
    lung-masked mean, matching reference pooling_dense_features.
    """
    if pooling_method == "global_avg":
        return jnp.mean(dense_outs, axis=(1, 2, 3))
    if pooling_method == "global_max":
        return jnp.max(dense_outs, axis=(1, 2, 3))
    lungs = lungs.astype(dense_outs.dtype)
    num = jnp.sum(dense_outs * lungs, axis=(1, 2, 3))
    den = jnp.sum(lungs, axis=(1, 2, 3)) * jnp.ones((dense_outs.shape[-1],), dense_outs.dtype)
    return num / den


def masked_mean(x, mask, axes):
    """sum(x*mask)/sum(mask) over `axes` with fixed shapes."""
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axes) / jnp.maximum(jnp.sum(m, axis=axes), 1e-12)


def gsum(x, axis_name=None):
    """Global scalar sum: jnp.sum, then a cross-shard psum when running
    inside shard_map/pmap (`axis_name` set). The building block that makes
    every batch-pooled loss statistic exact under data-parallel sharding:
    losses compute local sums and divide global numerators by global
    denominators, so per-shard loss VALUES match the single-device math.
    Gradient convention: psum transposes to psum under shard_map, so each
    shard's grad of a gsum'd loss is N x its local contribution — the
    trainer pmeans (not psums) grads to recover the global gradient."""
    s = jnp.sum(x)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


# ---------------------------------------------------------------------------
# Bounding boxes.
# ---------------------------------------------------------------------------

def find_crops_np(mask, spacing, border):
    """Host bbox of a binary mask + physical border in mm -> tuple of slices.

    Pure-NumPy equivalent of the reference find_crops (utils.py:244-254,
    which used scipy.ndimage.find_objects): per-axis extent of mask>0,
    padded by ceil(border/spacing[axis]) voxels, clamped to the volume.
    """
    mask = np.asarray(mask) > 0
    if not mask.any():
        raise ValueError("find_crops_np: empty mask")
    slices = []
    ndim = mask.ndim
    for ax in range(ndim):
        proj = mask.any(axis=tuple(i for i in range(ndim) if i != ax))
        idx = np.where(proj)[0]
        start, stop = int(idx[0]), int(idx[-1]) + 1
        if border > 0:
            pad = int(np.ceil(border / float(spacing[ax])))
            start = max(0, start - pad)
            stop = min(mask.shape[ax], stop + pad)
        slices.append(slice(start, stop))
    return tuple(slices)


def masked_bbox(mask):
    """Device bbox: (starts, stops) int32 arrays of length ndim.

    Runs under jit with fixed shapes (returns indices, does not slice).
    Empty mask yields starts=shape, stops=0.
    """
    mask = mask > 0
    ndim = mask.ndim
    starts, stops = [], []
    for ax in range(ndim):
        proj = jnp.any(mask, axis=tuple(i for i in range(ndim) if i != ax))
        idx = jnp.arange(proj.shape[0])
        big = proj.shape[0]
        starts.append(jnp.min(jnp.where(proj, idx, big)))
        stops.append(jnp.max(jnp.where(proj, idx + 1, 0)))
    return jnp.stack(starts), jnp.stack(stops)


# ---------------------------------------------------------------------------
# Heatmap stitching (scatter a chunk back into the full volume under a mask).
# Replaces the reference's host-side `htp[crop][mask] = probs[mask]`
# (job_runner.py:769-770, :1002-1004) with an on-device dynamic-slice update.
# ---------------------------------------------------------------------------

def stitch_masked(full, chunk, starts, mask):
    """full[starts:starts+chunk.shape][mask] = chunk[mask], on device.

    `full`: (D,H,W) accumulator; `chunk`, `mask`: (d,h,w); `starts`: 3 ints.
    """
    region = jax.lax.dynamic_slice(full, starts, chunk.shape)
    updated = jnp.where(mask > 0, chunk.astype(full.dtype), region)
    return jax.lax.dynamic_update_slice(full, updated, starts)


# ---------------------------------------------------------------------------
# Binary-mask bit packing: D2H transfer compression for low-bandwidth links.
# A 512x512x400 uint8 mask is 105 MB; packed it is 13 MB. np.unpackbits on
# the host reverses it (MSB-first order).
# ---------------------------------------------------------------------------

def packbits_u8(mask):
    """Pack a boolean/0-1 array into uint8 (np.packbits MSB-first order).

    Returns a 1-D uint8 array of length ceil(mask.size/8); unpack with
    `unpackbits_np(packed, shape)`.
    """
    flat = (mask.reshape(-1) > 0).astype(jnp.uint8)
    pad = (-flat.shape[0]) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    groups = flat.reshape(-1, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(groups * weights, axis=1, dtype=jnp.uint8)


def unpackbits_u8_dev(packed, shape):
    """Device inverse of np.packbits (MSB-first): packed (n_bytes,) uint8
    -> boolean array of `shape`. Lets 1-bit masks ride the host->device
    wire at 8x compression and decode on device."""
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    bits = (packed[:, None] >> shifts) & jnp.uint8(1)
    n = 1
    for s in shape:
        n *= int(s)
    return (bits.reshape(-1)[:n] > 0).reshape(shape)


def unpackbits_np(packed, shape):
    """Host inverse of packbits_u8 (C++/OpenMP fast path when built)."""
    try:
        from ..native import hostprep_native
        return hostprep_native.unpackbits(np.asarray(packed, np.uint8), shape)
    except Exception:
        bits = np.unpackbits(np.asarray(packed, np.uint8))
        return bits[: int(np.prod(shape))].reshape(shape)


# ---------------------------------------------------------------------------
# Segmentation metrics. Reference: utils.py:437-462.
# ---------------------------------------------------------------------------

def iou(predict, target, smooth=1e-5):
    predict = predict > 0
    target = target > 0
    inter = jnp.sum(jnp.logical_and(predict, target))
    union = jnp.sum(jnp.logical_or(predict, target))
    return (inter + smooth) / (union + smooth)


def dice(predict, target, smooth=1e-5):
    predict = predict > 0
    target = target > 0
    inter = jnp.sum(jnp.logical_and(predict, target))
    return (2.0 * inter + smooth) / (jnp.sum(predict) + jnp.sum(target) + smooth)


def tpr(predict, target):
    t = jnp.sum(target > 0)
    hits = jnp.sum(jnp.logical_and(predict > 0, target > 0))
    return jnp.where(t == 0, jnp.inf, hits / jnp.maximum(t, 1))


def fdr(predict, target):
    p = jnp.sum(predict > 0)
    fp = jnp.sum(jnp.logical_and(predict > 0, jnp.logical_not(target > 0)))
    return jnp.where(p == 0, jnp.inf, fp / jnp.maximum(p, 1))
