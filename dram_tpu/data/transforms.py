"""Host-side data transforms over the `#key`/meta sample-dict contract.

Rebuild of the reference transform pipeline (reference data_transforms.py):
samples are dicts whose `#`-prefixed keys hold arrays (`#image`,
`#lobe_reference`, ...) and whose `meta` dict carries uid/spacing/size.
Keys containing "reference"/"weight_map" are resampled nearest-neighbour,
image keys linearly (data_transforms.py:183-187).

These run on the host data-pipeline threads over ragged pre-chunk arrays;
the batched *device* augmentation path (the one-shot transforms used inside
the training step) lives in losses/equivariance.py. The resampling backend
is this package's separable-matrix resampler, not ITK.
"""

from __future__ import annotations

import copy

import numpy as np
from scipy import ndimage

from ..core.ops import windowing_np
from ..core.resample import itk_resample3d_np


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


def _is_tensor_key(k):
    return "#" in k


def _is_image_key(k):
    return "#" in k and "image" in k


def _is_reference_key(k):
    return "#" in k and ("reference" in k or "weight_map" in k)


class RemoveMeta:
    """Strip meta entries not needed downstream (ref data_transforms.py:26-35)."""

    KEEP = ("uid", "size", "spacing", "slices", "crop_slices",
            "original_spacing", "original_size", "origin", "direction",
            "cle", "pse", "ctss")

    def __call__(self, sample, keep_keys=None):
        keep = keep_keys or self.KEEP
        meta = {k: v for k, v in sample["meta"].items() if k in keep}
        sample = dict(sample)
        sample["meta"] = meta
        return sample


class Windowing:
    """HU clip + rescale on image keys (ref data_transforms.py:37-54)."""

    def __init__(self, min=-1200, max=600, out_min=0.0, out_max=1.0):
        self.min = min
        self.max = max
        self.out = (out_min, out_max)

    def __call__(self, sample):
        from_span = (self.min, self.max) if self.min is not None else None
        return {k: (windowing_np(v.astype(np.float32), from_span, self.out)
                    if _is_image_key(k) else v)
                for k, v in sample.items()}


def resample_array(v, spacing, require_spacing=None, new_size=None,
                   interpolator="linear", fill_value=0.0):
    """Reference `resample` contract (utils.py:414-434) on the separable
    resampler: spacing is z-y-x; returns (array, new_spacing).

    Integer inputs come back in the INPUT dtype: the reference's
    resample_sitk_image passes `orig_pixelid` as the output pixel type
    (reference utils.py:373-382), so sitk rounds a linear resample of an
    int16 CT back to int16 — the iso grid every downstream consumer sees
    is integer-HU quantized. Mirroring that here keeps the engine's
    host-stitch path bit-aligned with the device wires (which carry
    integer HU by construction); rounding is nearest-even, matching the
    C++ fast path's cvtps2dq."""
    spacing = np.asarray(spacing, np.float64)
    if require_spacing is None:
        if new_size is None:
            raise ValueError("need require_spacing or new_size")
        require_spacing = spacing * np.asarray(v.shape) / np.asarray(new_size)
    require_spacing = np.asarray(require_spacing, np.float64)
    if new_size is not None and tuple(v.shape) == tuple(new_size) \
            and np.allclose(require_spacing, spacing):
        # identity only when the index mapping is identity too — ITK
        # resamples by SPACING even when the grid sizes happen to match
        return v, tuple(float(s) for s in require_spacing)
    if new_size is None:
        new_size = np.ceil(np.asarray(v.shape) * spacing / require_spacing).astype(int)
    scales = (require_spacing / spacing).tolist()
    out_shape = tuple(int(s) for s in new_size)
    in_dtype = np.asarray(v).dtype
    int_in = np.issubdtype(in_dtype, np.integer)

    def cast(out):
        if int_in:
            info = np.iinfo(in_dtype)
            return np.clip(np.round(out), info.min,
                           info.max).astype(in_dtype)
        return out

    # C++/OpenMP fast path (the hot loop of the training data pipeline)
    try:
        from ..native import hostprep_native as hp
        if interpolator == "linear":
            out = hp.resample_scales_f32(np.asarray(v, np.float32), scales,
                                         out_shape, fill_value)
            return cast(out), tuple(float(s) for s in require_spacing)
        if interpolator == "nearest" and \
                np.asarray(v).dtype in (np.uint8, np.bool_):
            out = hp.resample_scales_u8_nearest(
                np.asarray(v).astype(np.uint8), scales, out_shape)
            return out, tuple(float(s) for s in require_spacing)
    except Exception:
        pass
    out = itk_resample3d_np(v, out_shape, scales=scales,
                            method=interpolator, fill_value=fill_value)
    return cast(out), tuple(float(s) for s in require_spacing)


class Resample:
    """All 14 resample modes of the reference (data_transforms.py:56-211).

    The default training/inference path uses mode="fixed_size"
    (RESAMPLE_MODE, st_dram_ref.py:27).
    """

    def __init__(self, mode, factor, size=None):
        self.mode = mode
        self.factor = factor
        self.size = list(size) if size else None

    def _plan(self, sample):
        spacing = np.asarray(sample["meta"]["spacing"], np.float64)
        size = np.asarray(sample["meta"]["size"])
        mode, factor = self.mode, self.factor
        if mode == "random_spacing":
            f = np.random.uniform(factor[0], factor[1])
            return [f] * len(spacing), None
        if mode == "fixed_factor":
            return (spacing * factor).tolist(), None
        if mode == "fixed_spacing":
            if isinstance(factor, (float, int)):
                return [factor] * len(spacing), None
            return list(factor), None
        if mode == "inplane_spacing_only":
            return [spacing[0], factor[1], factor[2]], None
        if mode == "inplane_resolution_only":
            rs = [spacing[0], spacing[1] * size[1] / self.size[1],
                  spacing[2] * size[2] / self.size[2]]
            return rs, [int(size[0]), self.size[1], self.size[2]]
        if mode == "inplane_resolution_z_spacing":
            rs = [factor[0], spacing[1] * size[1] / self.size[1],
                  spacing[2] * size[2] / self.size[2]]
            return rs, [int(round(size[0] * spacing[0] / factor[0])),
                        self.size[1], self.size[2]]
        if mode == "inplane_resolution_z_jittering":
            z = spacing[0] + np.random.uniform(-factor, factor)
            rs = [z, spacing[1] * size[1] / self.size[1],
                  spacing[2] * size[2] / self.size[2]]
            return rs, [int(round(size[0] * spacing[0] / z)),
                        self.size[1], self.size[2]]
        if mode == "inplane_resolution_min_z_spacing":
            if spacing[0] < factor[0]:
                rs = [factor[0], spacing[1] * size[1] / self.size[1],
                      spacing[2] * size[2] / self.size[2]]
                return rs, [int(round(size[0] * spacing[0] / factor[0])),
                            self.size[1], self.size[2]]
            rs = [spacing[0], spacing[1] * size[1] / self.size[1],
                  spacing[2] * size[2] / self.size[2]]
            return rs, [int(size[0]), self.size[1], self.size[2]]
        if mode == "fixed_spacing_min_in_plane_resolution":
            f = [factor] * 3 if not isinstance(factor, (tuple, list)) else factor
            new_y = int(round(size[1] * spacing[1] / f[1]))
            if new_y > self.size[1]:
                rs = [spacing[0], spacing[1] * size[1] / self.size[1],
                      spacing[2] * size[2] / self.size[2]]
                return rs, [int(size[0]), self.size[1], self.size[2]]
            return [spacing[0], f[1], f[2]], None
        if mode == "iso_minimal":
            return [float(spacing.min())] * len(spacing), None
        if mode == "fixed_output_size":
            ratio = size[-1] / self.size[-1]
            rs = [spacing[-1] * ratio] * len(spacing)
            ns = self.size[:]
            ns[0] = int(round(size[0] * spacing[0] / rs[0]))
            ns[1] = int(round(size[1] * spacing[1] / rs[1]))
            return rs, ns
        if mode == "fixed_size":
            ratios = size / np.asarray(self.size)
            return (spacing * ratios).tolist(), self.size[:]
        if mode == "spacing_size_match":
            return list(factor), self.size[:]
        raise NotImplementedError(mode)

    def __call__(self, sample):
        require_spacing, new_size = self._plan(sample)
        spacing = sample["meta"]["spacing"]
        new_sample = {}
        new_spacing = tuple(require_spacing)
        out_size = new_size
        for k, v in sample.items():
            if not _is_tensor_key(k):
                new_sample[k] = v
                continue
            interp = "nearest" if _is_reference_key(k) else "linear"
            if v.ndim == 4:
                rs = [resample_array(vv, spacing, require_spacing, out_size,
                                     interp) for vv in v]
                nv = np.stack([r[0] for r in rs], axis=0)
                new_spacing = rs[0][1]
            elif v.ndim == 3:
                nv, new_spacing = resample_array(v, spacing, require_spacing,
                                                 out_size, interp)
            else:
                raise NotImplementedError
            if _is_reference_key(k):
                nv = nv.astype(v.dtype)
            new_sample[k] = nv
            out_size = nv.shape  # subsequent keys match the first
        meta = copy.deepcopy(sample["meta"])
        meta["size_before_resample"] = meta.get("size")
        meta["spacing"] = tuple(new_spacing)
        meta["size"] = out_size
        new_sample["meta"] = meta
        return new_sample


# ---------------------------------------------------------------------------
# Train-time augmentation pool (reference job_runner.py:561-568):
# GaussianBlur, RandomMaskOut, RandomFlip, RandomRotate90, GaussianAddictive.
# ---------------------------------------------------------------------------

class GaussianBlur:
    def __init__(self, sigma, mode="fixed"):
        self.sigma = sigma
        self.mode = mode

    def __call__(self, sample):
        s = self.sigma[0] if self.mode == "fixed" else \
            np.random.uniform(self.sigma[0], self.sigma[1])
        return {k: (ndimage.gaussian_filter(v.astype(np.float32), s)
                    if _is_image_key(k) else v)
                for k, v in sample.items()}


class GaussianAddictive:
    """Additive Gaussian noise in the image's own dynamic range
    (ref data_transforms.py:365-407)."""

    def __init__(self, sigma, channel_dim=None):
        self.sigma = sigma
        self.eps = 1e-7

    def _apply(self, data):
        s = np.random.uniform(self.sigma[0], self.sigma[1])
        lo, hi = data.min(), data.max()
        rng_span = hi - lo
        x = (data - lo) / float(rng_span + self.eps)
        x = np.clip(x + np.random.normal(0, s, data.shape), 0.0, 1.0)
        return x * rng_span + lo

    def __call__(self, sample):
        return {k: (self._apply(v.astype(np.float32)) if _is_image_key(k) else v)
                for k, v in sample.items()}


class RandomMaskOut:
    """Cut out `times` random boxes, filled with a random constant
    (ref data_transforms.py:756-801)."""

    def __init__(self, times=5, region_range=((0.2, 0.8),) * 3,
                 region_size=((0.01, 0.06),) * 3, spatial_dim=3,
                 assign_value=0):
        self.times = times
        self.region_range = region_range
        self.region_size = region_size
        self.spatial_dim = spatial_dim

    def __call__(self, sample):
        shape = next(v for k, v in sample.items()
                     if _is_tensor_key(k)).shape[-self.spatial_dim:]
        centers = [tuple(int(ds * np.random.uniform(*r))
                         for ds, r in zip(shape, self.region_range))
                   for _ in range(self.times)]
        sizes = [tuple(int(np.random.uniform(*rs) * ds)
                       for rs, ds in zip(self.region_size, shape))
                 for _ in range(self.times)]

        def mask_out(data):
            out = data.copy()
            lo, hi = data.min(), data.max()
            for c, s in zip(centers, sizes):
                sl = tuple(slice(max(0, cc - ss // 2),
                                 min(cc + (ss - ss // 2), sp))
                           for cc, sp, ss in zip(c, data.shape[-3:], s))
                sl = (Ellipsis,) + sl
                out[sl] = np.random.uniform(lo, hi)
            return out

        return {k: (mask_out(v) if _is_image_key(k) else v)
                for k, v in sample.items()}


class RandomFlip:
    """Flip every tensor key along one random spatial axis
    (ref data_transforms.py:935-960)."""

    def __init__(self, spatial_dim=3):
        self.spatial_dim = spatial_dim

    def __call__(self, sample):
        ax = -int(np.random.randint(1, self.spatial_dim + 1))
        return {k: (np.flip(v, axis=ax).copy() if _is_tensor_key(k) else v)
                for k, v in sample.items()}


class RandomRotate90:
    """Rotate every tensor key by k*90 degrees in a random spatial plane
    (ref data_transforms.py:962-993)."""

    def __init__(self, spatial_dim=3):
        self.spatial_dim = spatial_dim

    def __call__(self, sample):
        from itertools import combinations
        k = int(np.random.randint(0, 4))
        axes = list(combinations([-n for n in range(1, self.spatial_dim + 1)], 2))
        ax = axes[np.random.randint(len(axes))]
        return {key: (np.rot90(v, k=k, axes=ax).copy()
                      if _is_tensor_key(key) else v)
                for key, v in sample.items()}


# ---------------------------------------------------------------------------
# Extended zoo (intensity + spatial) — reference data_transforms.py:213-1131.
# ---------------------------------------------------------------------------

class IntensityInverse:
    def __call__(self, sample):
        def inv(v):
            lo, hi = v.min(), v.max()
            return (hi + lo) - v
        return {k: (inv(v.astype(np.float32)) if _is_image_key(k) else v)
                for k, v in sample.items()}


class GammaTransform:
    def __init__(self, gamma_range=(0.7, 1.5)):
        self.gamma_range = gamma_range

    def __call__(self, sample):
        g = np.random.uniform(*self.gamma_range)

        def apply(v):
            lo, hi = v.min(), v.max()
            x = (v - lo) / max(hi - lo, 1e-7)
            return np.power(x, g) * (hi - lo) + lo
        return {k: (apply(v.astype(np.float32)) if _is_image_key(k) else v)
                for k, v in sample.items()}


class ContrastJitter:
    def __init__(self, jitter_range=(0.75, 1.25), if_keep_range=True,
                 channel_dim=None):
        self.jitter_range = jitter_range
        self.keep = if_keep_range

    def __call__(self, sample):
        f = np.random.uniform(*self.jitter_range)

        def apply(v):
            m = v.mean()
            out = (v - m) * f + m
            if self.keep:
                out = np.clip(out, v.min(), v.max())
            return out
        return {k: (apply(v.astype(np.float32)) if _is_image_key(k) else v)
                for k, v in sample.items()}


class ContrastStretchingTransform:
    def __init__(self, percentiles=(2, 98)):
        self.percentiles = percentiles

    def __call__(self, sample):
        def apply(v):
            p_lo, p_hi = np.percentile(v, self.percentiles)
            return windowing_np(v, (p_lo, p_hi), (v.min(), v.max()))
        return {k: (apply(v.astype(np.float32)) if _is_image_key(k) else v)
                for k, v in sample.items()}


class HistogramEqual:
    def __init__(self, nbins=256):
        self.nbins = nbins

    def __call__(self, sample):
        def apply(v):
            lo, hi = v.min(), v.max()
            hist, bins = np.histogram(v.ravel(), self.nbins, range=(lo, hi))
            cdf = hist.cumsum().astype(np.float64)
            cdf = cdf / cdf[-1]
            out = np.interp(v.ravel(), bins[:-1], cdf)
            return (out.reshape(v.shape) * (hi - lo) + lo).astype(np.float32)
        return {k: (apply(v.astype(np.float32)) if _is_image_key(k) else v)
                for k, v in sample.items()}


class StandarizeChannel:
    def __call__(self, sample):
        def apply(v):
            return (v - v.mean()) / max(v.std(), 1e-7)
        return {k: (apply(v.astype(np.float32)) if _is_image_key(k) else v)
                for k, v in sample.items()}


class CenterCrop:
    def __init__(self, crop_sizes_ratio, spatial_dim=3):
        self.ratio = crop_sizes_ratio
        self.spatial_dim = spatial_dim

    def __call__(self, sample):
        shape = next(v for k, v in sample.items()
                     if _is_tensor_key(k)).shape[-self.spatial_dim:]
        sizes = [int(s * r) for s, r in zip(shape, self.ratio)]
        sl = tuple(slice((s - c) // 2, (s - c) // 2 + c)
                   for s, c in zip(shape, sizes))
        sl = (Ellipsis,) + sl
        out = {k: (v[sl].copy() if _is_tensor_key(k) else v)
               for k, v in sample.items()}
        meta = copy.deepcopy(sample["meta"])
        meta["size"] = tuple(sizes)
        out["meta"] = meta
        return out


class RandomCrop:
    """Random crop + re-resample back to the original size
    (ref data_transforms.py:582-637 behaviour)."""

    def __init__(self, crop_ratio_range=(0.7, 0.95), spatial_dim=3):
        self.range = crop_ratio_range
        self.spatial_dim = spatial_dim

    def __call__(self, sample):
        shape = next(v for k, v in sample.items()
                     if _is_tensor_key(k)).shape[-self.spatial_dim:]
        ratios = np.random.uniform(*self.range, size=self.spatial_dim)
        sizes = [max(2, int(s * r)) for s, r in zip(shape, ratios)]
        starts = [np.random.randint(0, s - c + 1) for s, c in zip(shape, sizes)]
        sl = (Ellipsis,) + tuple(slice(st, st + c)
                                 for st, c in zip(starts, sizes))
        out = {}
        for k, v in sample.items():
            if not _is_tensor_key(k):
                out[k] = v
                continue
            crop = v[sl]
            interp = "nearest" if _is_reference_key(k) else "linear"
            rs, _ = resample_array(crop.astype(np.float32),
                                   (1.0,) * 3, new_size=shape,
                                   interpolator=interp)
            out[k] = rs.astype(v.dtype) if _is_reference_key(k) else rs
        return out


class RandomCubeMask:
    def __init__(self, times=3, size_range=(0.05, 0.15), fill="min"):
        self.times = times
        self.size_range = size_range
        self.fill = fill

    def __call__(self, sample):
        shape = next(v for k, v in sample.items()
                     if _is_tensor_key(k)).shape[-3:]
        boxes = []
        for _ in range(self.times):
            size = [int(np.random.uniform(*self.size_range) * s) for s in shape]
            start = [np.random.randint(0, max(1, s - c)) for s, c in zip(shape, size)]
            boxes.append(tuple(slice(st, st + c) for st, c in zip(start, size)))

        def apply(v):
            out = v.copy()
            fill = out.min() if self.fill == "min" else 0
            for b in boxes:
                out[(Ellipsis,) + b] = fill
            return out
        return {k: (apply(v) if _is_image_key(k) else v)
                for k, v in sample.items()}


class RandomMaskGaussian:
    def __init__(self, times=3, size_range=(0.05, 0.15), sigma=0.1):
        self.times = times
        self.size_range = size_range
        self.sigma = sigma

    def __call__(self, sample):
        shape = next(v for k, v in sample.items()
                     if _is_tensor_key(k)).shape[-3:]
        boxes = []
        for _ in range(self.times):
            size = [max(1, int(np.random.uniform(*self.size_range) * s))
                    for s in shape]
            start = [np.random.randint(0, max(1, s - c)) for s, c in zip(shape, size)]
            boxes.append(tuple(slice(st, st + c) for st, c in zip(start, size)))

        def apply(v):
            out = v.copy().astype(np.float32)
            for b in boxes:
                region = out[(Ellipsis,) + b]
                out[(Ellipsis,) + b] = region + np.random.normal(
                    0, self.sigma * max(v.std(), 1e-7), region.shape)
            return out
        return {k: (apply(v) if _is_image_key(k) else v)
                for k, v in sample.items()}


class DiskMaskOut:
    """Zero everything outside a centered sphere."""

    def __init__(self, radius_ratio=0.5):
        self.radius_ratio = radius_ratio

    def __call__(self, sample):
        shape = next(v for k, v in sample.items()
                     if _is_tensor_key(k)).shape[-3:]
        grids = np.meshgrid(*[np.arange(s) - s / 2 for s in shape], indexing="ij")
        r2 = sum((g / (s * self.radius_ratio / 2 + 1e-7)) ** 2
                 for g, s in zip(grids, shape))
        mask = r2 <= 1.0

        def apply(v):
            out = v.copy()
            out[..., ~mask] = out.min()
            return out
        return {k: (apply(v) if _is_image_key(k) else v)
                for k, v in sample.items()}


class RandomMoveAxis:
    def __init__(self, spatial_dim=3):
        self.spatial_dim = spatial_dim

    def __call__(self, sample):
        perm = np.random.permutation(self.spatial_dim)
        src = [-n for n in range(1, self.spatial_dim + 1)]
        dst = [src[p] for p in perm]
        return {k: (np.moveaxis(v, src, dst).copy() if _is_tensor_key(k) else v)
                for k, v in sample.items()}


class RandomRotate:
    """Small-angle in-plane rotation via scipy (spatial keys nearest)."""

    def __init__(self, angle_range=(-10, 10), axes=(-2, -1)):
        self.angle_range = angle_range
        self.axes = axes

    def __call__(self, sample):
        angle = np.random.uniform(*self.angle_range)
        out = {}
        for k, v in sample.items():
            if not _is_tensor_key(k):
                out[k] = v
                continue
            order = 0 if _is_reference_key(k) else 1
            out[k] = ndimage.rotate(v, angle, axes=self.axes, reshape=False,
                                    order=order, mode="nearest")
        return out


class RandomRotateInplane90:
    def __call__(self, sample):
        k = int(np.random.randint(0, 4))
        return {key: (np.rot90(v, k=k, axes=(-2, -1)).copy()
                      if _is_tensor_key(key) else v)
                for key, v in sample.items()}


class RandomAffineTransform3D:
    """Random rotation+scale 3-D affine (ref data_transforms.py:1033-1102)."""

    def __init__(self, rot_range=(-10, 10), scale_range=(0.9, 1.1)):
        self.rot_range = rot_range
        self.scale_range = scale_range

    def _matrix(self):
        ax, ay, az = np.deg2rad(np.random.uniform(*self.rot_range, 3))
        s = np.random.uniform(*self.scale_range, 3)
        Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                       [0, np.sin(ax), np.cos(ax)]])
        Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                       [-np.sin(ay), 0, np.cos(ay)]])
        Rz = np.array([[np.cos(az), -np.sin(az), 0],
                       [np.sin(az), np.cos(az), 0], [0, 0, 1]])
        return (Rx @ Ry @ Rz) * s

    def __call__(self, sample):
        M = self._matrix()
        out = {}
        for k, v in sample.items():
            if not _is_tensor_key(k):
                out[k] = v
                continue
            order = 0 if _is_reference_key(k) else 1
            center = np.asarray(v.shape[-3:]) / 2.0
            offset = center - M @ center
            out[k] = ndimage.affine_transform(v, M, offset=offset, order=order,
                                              mode="nearest")
        return out


def _trailing_projection(data, slab, axis, reduce_max):
    """Exact reference slab projection (data_transforms.py:416-430): output
    slice si = min/max over input slices [max(0, si-slab), si] along `axis`
    — a TRAILING window of length slab+1, clipped at the volume start.

    Implemented as a 1-d sliding filter with origin +(slab//2) (scipy:
    positive origin shifts the window toward lower indices) and
    edge-replicate padding: at si < slab the replicated edge values repeat
    data[0], which never changes a min/max over a window already containing
    index 0, so the clipped-window semantics are reproduced exactly.
    """
    filt = ndimage.maximum_filter1d if reduce_max else ndimage.minimum_filter1d
    return filt(data, size=slab + 1, axis=axis, mode="nearest",
                origin=slab // 2)


class MinimalIntensityProjection:
    """Sliding minimum-intensity slab projection (ref :409-441): per call,
    a random slab thickness from [lo, hi) and a random projection axis."""

    reduce_max = False

    def __init__(self, slab_thickness=(3, 10), angle=(0, 3)):
        self.slab_thickness = tuple(slab_thickness)
        self.angle = tuple(angle)

    def _draw(self):
        slab = int(np.random.randint(*self.slab_thickness))
        axis = int(np.random.randint(*self.angle))
        return slab, axis

    def __call__(self, sample):
        slab, axis = self._draw()
        return {k: (_trailing_projection(v.astype(np.float32), slab,
                                         axis - 3, self.reduce_max)
                    if _is_image_key(k) else v)
                for k, v in sample.items()}


class MinimalIntensityAxialProjection(MinimalIntensityProjection):
    """Axial (z-only) variant (ref :443-470). The reference computes a
    spacing-scaled axial_thickness but then projects with the raw
    slab_thickness (a latent defect we mirror for parity: :453-457)."""

    def __init__(self, slab_thickness=(3, 10)):
        super().__init__(slab_thickness, angle=(0, 1))


class MaximumIntensityProjection(MinimalIntensityProjection):
    """Maximum-intensity counterpart (ref :473-504)."""

    reduce_max = True


# the reference train pool (job_runner.py:561-568) with random-permutation
# sampling gated by AUG_RATIO (job_runner.py:570-579)
def ensemble_augmentation(aug_ratio):
    pool = [
        GaussianBlur((0.3, 0.5), "random"),
        RandomMaskOut(region_range=((0.2, 0.8),) * 3,
                      region_size=((0.01, 0.05),) * 3),
        RandomFlip(3),
        RandomRotate90(3),
        GaussianAddictive((0.01, 0.02)),
    ]

    class _T:
        def __call__(self, sample):
            order = np.random.permutation(len(pool))
            for i in order:
                if np.random.randint(0, 10) < 10 * aug_ratio:
                    sample = pool[i](sample)
            return sample

    return _T()
