"""Separable 3-D resampling as per-axis interpolation matrices (MXU matmuls).

TPU-native replacement for the reference's two resampling dependencies:

* torch ``F.interpolate(mode='trilinear', align_corners=True)`` /
  ``nn.Upsample`` used inside the model and for heatmap back-resizing
  (reference models.py:146, 588; job_runner.py:766, 993) — mode
  ``'linear'``/``'nearest'`` with ``align_corners=True`` semantics.
* SimpleITK grid resampling used by the data pipeline
  (reference utils.py:299-434 resample_sitk_image/resample) — mode
  ``'itk_linear'``/``'itk_nearest'``: output voxel centers are mapped by the
  spacing ratio (src = i_out * in/out along each axis, no corner alignment),
  and points outside the input buffer take the fill value.

Instead of gather-based interpolation, each axis is resized by a dense
(out, in) weight matrix with <=2 non-zeros per row, applied with einsum.
On TPU these lower to MXU matmuls and XLA fuses the three axis passes;
for typical CT sizes (<=512 per axis) the matrices are tiny.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _sinc(x):
    return np.sinc(x)  # sin(pi x)/(pi x), sinc(0)=1


# windowed-sinc window functions over |x| <= m (ITK
# itkWindowedSincInterpolateImageFunction.h; radius m=3, the SimpleITK
# default for sitk{Hamming,Cosine,Welch,Lanczos}WindowedSinc)
_SINC_RADIUS = 3
_SINC_WINDOWS = {
    "itk_hamming_sinc": lambda x, m: 0.54 + 0.46 * np.cos(np.pi * x / m),
    "itk_cosine_sinc": lambda x, m: np.cos(np.pi * x / (2 * m)),
    "itk_welch_sinc": lambda x, m: 1.0 - (x / m) ** 2,
    "itk_lanczos_sinc": lambda x, m: _sinc(x / m),
}


@functools.lru_cache(maxsize=64)
def _bspline_coeff_matrix(n: int):
    """(n, n) inverse of the cubic B-spline collocation matrix under
    mirror (whole-sample symmetric) boundary extension — the prefilter of
    an interpolating cubic spline (ITK BSplineInterpolateImageFunction
    order 3 / Unser's recursive filter expressed as a dense solve)."""
    if n == 1:
        return np.ones((1, 1), np.float32)
    M = np.zeros((n, n), np.float64)
    for i in range(n):
        for j, w in ((i - 1, 1 / 6), (i, 2 / 3), (i + 1, 1 / 6)):
            jm = -j if j < 0 else (2 * (n - 1) - j if j > n - 1 else j)
            M[i, jm] += w
    return np.linalg.inv(M).astype(np.float32)


def _bspline3(x):
    ax = np.abs(x)
    return np.where(ax < 1, 2 / 3 - ax ** 2 + ax ** 3 / 2,
                    np.where(ax < 2, (2 - ax) ** 3 / 6, 0.0))


def _mirror_idx(j, n):
    j = np.abs(j)
    if n > 1:
        j = np.where(j > n - 1, 2 * (n - 1) - j, j)
    return np.clip(j, 0, n - 1)


@functools.lru_cache(maxsize=512)
def _axis_weights(in_size: int, out_size: int, mode: str, scale: float | None,
                  param: float | None = None):
    """(out,in) float32 weight matrix + (out,) validity vector, as np arrays.

    scale is only used by itk modes; it is the output->input index ratio
    (new_spacing/old_spacing). None means in_size/out_size. `param` is the
    Gaussian sigma (input-voxel units) for mode 'itk_gaussian'.
    """
    W = np.zeros((out_size, in_size), np.float32)
    valid = np.ones((out_size,), np.float32)
    if mode in _SINC_WINDOWS or mode in ("itk_bspline", "itk_gaussian"):
        # the remaining reference interpolators (reference utils.py:286-296
        # _SITK_INTERPOLATOR_DICT; no shipped pipeline path uses them).
        # All are separable kernels -> per-axis weight matrices. Boundary:
        # out-of-range taps clamp/mirror to the edge sample; outputs whose
        # source point leaves the buffer ([-0.5, size-0.5), ITK
        # IsInsideBuffer) are zeroed via `valid` and take the fill value.
        s = (in_size / out_size) if scale is None else scale
        src = np.arange(out_size) * s
        valid = ((src >= -0.5) & (src < in_size - 0.5)).astype(np.float32)
        src = np.clip(src, 0.0, in_size - 1)
        rows = np.arange(out_size)
        if mode in _SINC_WINDOWS:
            # w(x) = window(x) * sinc(x), radius 3, NOT normalized (ITK
            # WindowedSincInterpolateImageFunction); exact at integer src
            m = _SINC_RADIUS
            base = np.floor(src).astype(np.int64)
            for k in range(-m + 1, m + 1):
                j = base + k
                x = src - j
                w = _SINC_WINDOWS[mode](x, m) * _sinc(x)
                w = np.where(np.abs(x) <= m, w, 0.0)
                np.add.at(W, (rows, np.clip(j, 0, in_size - 1)),
                          (w * valid).astype(np.float32))
        elif mode == "itk_bspline":
            # interpolating cubic spline: evaluation basis x prefilter
            B = np.zeros((out_size, in_size), np.float64)
            base = np.floor(src).astype(np.int64)
            for k in range(-1, 3):
                j = base + k
                w = _bspline3(src - j)
                np.add.at(B, (rows, _mirror_idx(j, in_size)), w)
            W = (B @ _bspline_coeff_matrix(in_size).astype(np.float64))
            W = (W * valid[:, None]).astype(np.float32)
        else:  # itk_gaussian
            # cell-integrated Gaussian weights, normalized (ITK
            # GaussianInterpolateImageFunction); sigma in input-voxel
            # units (`param`, default 1.0), taps within 4 sigma
            from math import erf
            sig = 1.0 if param is None else float(param)
            r = max(1, int(np.ceil(4.0 * sig)))
            base = np.floor(src).astype(np.int64)
            erfv = np.vectorize(erf)
            den = np.sqrt(2.0) * sig
            for k in range(-r, r + 2):
                j = base + k
                d = j - src
                w = 0.5 * (erfv((d + 0.5) / den) - erfv((d - 0.5) / den))
                np.add.at(W, (rows, np.clip(j, 0, in_size - 1)),
                          w.astype(np.float32))
            W /= np.maximum(W.sum(axis=1, keepdims=True), 1e-12)
            W = (W * valid[:, None]).astype(np.float32)
        return W, valid
    if mode == "linear_ac":  # torch align_corners=True
        if out_size == 1:
            src = np.zeros((1,))
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    elif mode == "linear_hp":  # torch align_corners=False (half-pixel)
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    elif mode == "nearest_torch":  # torch F.interpolate nearest
        idx = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        W[np.arange(out_size), idx] = 1.0
        return W, valid
    elif mode in ("itk_linear", "itk_nearest"):
        s = (in_size / out_size) if scale is None else scale
        src = np.arange(out_size) * s
        # ITK ImageFunction::IsInsideBuffer: continuous index inside
        # [-0.5, size-0.5) — start inclusive, end EXCLUSIVE; outside points
        # take the fill value.
        valid = ((src >= -0.5) & (src < in_size - 0.5)).astype(np.float32)
        if mode == "itk_nearest":
            idx = np.floor(src + 0.5).astype(np.int64)  # round-half-up
            idx = np.clip(idx, 0, in_size - 1)
            W[np.arange(out_size), idx] = valid
            return W, valid
        src = np.clip(src, 0.0, in_size - 1)
    else:
        raise ValueError(f"unknown resize mode {mode}")

    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(W, (rows, lo), (1.0 - frac) * valid)
    np.add.at(W, (rows, hi), frac * valid)
    return W, valid


def _apply_axis(x, W, axis):
    """Contract spatial `axis` of x with (out,in) matrix W."""
    x = jnp.moveaxis(x, axis, -1)
    # precision='highest': interpolation weights must not round to bf16 on
    # TPU or mask/heatmap parity with the reference degrades.
    y = jnp.einsum("oi,...i->...o", W, x, precision="highest",
                   preferred_element_type=jnp.float32)
    return jnp.moveaxis(y.astype(x.dtype), -1, axis)


def _spatial_axes(ndim):
    if ndim == 3:  # (D,H,W)
        return (0, 1, 2)
    if ndim == 4:  # (B,D,H,W) or (D,H,W,C) -- require explicit 5D for batches
        return (0, 1, 2)
    if ndim == 5:  # (B,D,H,W,C)
        return (1, 2, 3)
    raise ValueError(f"resize3d expects 3/4/5-D input, got {ndim}-D")


def resize3d(x, out_size, method="trilinear", align_corners=True):
    """torch-parity 3-D resize (model-internal semantics).

    x: (D,H,W), (D,H,W,C) or (B,D,H,W,C); out_size: 3 static ints.
    method 'trilinear' requires align_corners=True (the only variant the
    reference uses); 'nearest' matches torch nearest.
    """
    axes = _spatial_axes(x.ndim)
    if method == "trilinear":
        # align_corners=True: model-internal Upsample (reference models.py:
        # 146, 588); align_corners=False (half-pixel): the one-shot rescale
        # (reference data_transforms.py:1221 F.interpolate default)
        mode = "linear_ac" if align_corners else "linear_hp"
    elif method == "nearest":
        mode = "nearest_torch"
    else:
        raise ValueError(method)
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    for ax, o in zip(axes, out_size):
        in_size = x.shape[ax]
        if in_size == o and mode != "nearest_torch":
            continue
        if in_size == o:
            continue
        W, _ = _axis_weights(in_size, int(o), mode, None)
        x = _apply_axis(x, jnp.asarray(W), ax)
    if jnp.issubdtype(orig_dtype, jnp.floating):
        return x.astype(orig_dtype)
    return x  # float result for integer inputs (caller decides rounding)


# reference interpolator names (reference utils.py:286-296
# _SITK_INTERPOLATOR_DICT) -> _axis_weights modes. Only linear/nearest are
# used by any reference pipeline path; the rest exist for parity of record.
ITK_METHODS = {
    "linear": "itk_linear",
    "nearest": "itk_nearest",
    "bspline": "itk_bspline",
    "gaussian": "itk_gaussian",
    "hamming_sinc": "itk_hamming_sinc",
    "cosine_windowed_sinc": "itk_cosine_sinc",
    "welch_windowed_sinc": "itk_welch_sinc",
    "lanczos_windowed_sinc": "itk_lanczos_sinc",
}


def _label_gaussian_resample(x, out_size, scales, fill_value, xp_resample):
    """ITK LabelImageGaussianInterpolate semantics: per-label Gaussian
    smoothing (the 'gaussian' kernel above) of each label's indicator,
    argmax over labels. Host-side (labels come from the concrete data)."""
    xv = np.asarray(x)
    labels = np.unique(xv)
    votes = [xp_resample((xv == lb).astype(np.float32), out_size,
                         scales=scales, method="gaussian", fill_value=-1.0)
             for lb in labels]
    stack = np.stack([np.asarray(v) for v in votes])
    out = np.asarray(labels)[np.argmax(stack, axis=0)].astype(xv.dtype)
    # outside-buffer voxels (every vote carries the -1 fill) -> fill_value
    return np.where(stack.max(axis=0) < 0, np.asarray(fill_value, xv.dtype),
                    out)


def itk_resample3d(x, out_size, scales=None, method="linear", fill_value=0.0):
    """SimpleITK-style grid resample (data-pipeline semantics).

    x: (D,H,W) volume. out_size: 3 static ints. scales: per-axis
    new_spacing/old_spacing ratios (defaults to in/out). Output voxels whose
    source point falls outside the input buffer get `fill_value`. `method`
    accepts every reference interpolator name (ITK_METHODS) plus
    'label_gaussian' (host-side: labels are read from the concrete data).
    """
    if x.ndim != 3:
        raise ValueError("itk_resample3d operates on (D,H,W) volumes")
    if method == "label_gaussian":
        return jnp.asarray(_label_gaussian_resample(
            x, out_size, scales, fill_value, itk_resample3d_np))
    mode = ITK_METHODS[method]
    if scales is None:
        scales = [None] * 3
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    valid_mask = None
    for ax in range(3):
        in_size = y.shape[ax]
        W, valid = _axis_weights(in_size, int(out_size[ax]),
                                 mode, None if scales[ax] is None else float(scales[ax]))
        if mode == "itk_nearest":
            # nearest is a pure gather: cheaper than a 0/1 matmul and exact
            idx = np.argmax(W, axis=1).astype(np.int32)
            y = jnp.take(y, jnp.asarray(idx), axis=ax)
        else:
            y = _apply_axis(y, jnp.asarray(W), ax)
        v = jnp.asarray(valid).reshape([-1 if i == ax else 1 for i in range(3)])
        valid_mask = v if valid_mask is None else valid_mask * v
    if mode == "itk_nearest":
        y = y * valid_mask
    y = y + (1.0 - valid_mask) * fill_value
    if jnp.issubdtype(orig_dtype, jnp.floating):
        return y.astype(orig_dtype)
    return y


def itk_resample_to_spacing(x, in_spacing, out_spacing=None, out_size=None,
                            method="linear", fill_value=0.0):
    """Resample (D,H,W) array from in_spacing to out_spacing (z,y,x mm).

    Mirrors the reference `resample` contract (utils.py:414-434): if
    out_size is None it is ceil(in_size * in_spacing/out_spacing); returns
    (array, out_spacing). When out_size is given, out_spacing still defines
    the index mapping (ITK semantics: spacing drives the transform, size
    just bounds the output grid).
    """
    in_spacing = np.asarray(in_spacing, np.float64)
    if out_spacing is None:
        if out_size is None:
            raise ValueError("need out_spacing or out_size")
        out_spacing = in_spacing * np.asarray(x.shape) / np.asarray(out_size)
    out_spacing = np.asarray(out_spacing, np.float64)
    if out_size is None:
        out_size = np.ceil(np.asarray(x.shape) * in_spacing / out_spacing).astype(int)
    scales = (out_spacing / in_spacing).tolist()
    y = itk_resample3d(x, tuple(int(s) for s in out_size), scales=scales,
                       method=method, fill_value=fill_value)
    return y, tuple(float(s) for s in out_spacing)


def upsample2x_local(x):
    """Strictly local (shift-invariant) 2x trilinear upsample, half-pixel
    centers: out[2i] = 0.25*in[i-1] + 0.75*in[i], out[2i+1] = 0.75*in[i] +
    0.25*in[i+1], edges clamped. Unlike align_corners=True (whose source
    mapping depends on the axis length), this commutes with overlap-tile
    spatial sharding — used by the context-parallel whole-scan path."""
    axes = _spatial_axes(x.ndim)
    for ax in axes:
        lo = jnp.concatenate([jax.lax.slice_in_dim(x, 0, 1, axis=ax),
                              jax.lax.slice_in_dim(x, 0, x.shape[ax] - 1,
                                                   axis=ax)], axis=ax)
        hi = jnp.concatenate([jax.lax.slice_in_dim(x, 1, x.shape[ax],
                                                   axis=ax),
                              jax.lax.slice_in_dim(x, x.shape[ax] - 1,
                                                   x.shape[ax], axis=ax)],
                             axis=ax)
        even = 0.25 * lo + 0.75 * x
        odd = 0.75 * x + 0.25 * hi
        y = jnp.stack([even, odd], axis=ax + 1)
        new_shape = list(x.shape)
        new_shape[ax] *= 2
        x = y.reshape(new_shape)
    return x


def resize3d_np(x, out_size, method="trilinear"):
    """Host twin of resize3d (align_corners semantics) for ragged host-side
    back-resizes where per-shape device compiles would dominate."""
    mode = {"trilinear": "linear_ac", "nearest": "nearest_torch"}[method]
    y = np.asarray(x, np.float32)
    axes = _spatial_axes(y.ndim)
    for ax, o in zip(axes, out_size):
        if y.shape[ax] == int(o):
            continue
        W, _ = _axis_weights(y.shape[ax], int(o), mode, None)
        y = np.moveaxis(np.moveaxis(y, ax, -1) @ W.T, -1, ax)
    return y


# Host (NumPy) twin, used by the host data pipeline for ragged pre-chunks
# and by tests as an oracle-free cross-check of the device path.
def itk_resample3d_np(x, out_size, scales=None, method="linear", fill_value=0.0):
    if method == "label_gaussian":
        return _label_gaussian_resample(x, out_size, scales, fill_value,
                                        itk_resample3d_np)
    mode = ITK_METHODS[method]
    if scales is None:
        scales = [None] * 3
    y = np.asarray(x, np.float32)
    valid_mask = None
    for ax in range(3):
        W, valid = _axis_weights(y.shape[ax], int(out_size[ax]),
                                 mode, None if scales[ax] is None else float(scales[ax]))
        y = np.moveaxis(np.moveaxis(y, ax, -1) @ W.T, -1, ax)
        v = valid.reshape([-1 if i == ax else 1 for i in range(3)])
        valid_mask = v if valid_mask is None else valid_mask * v
    return y + (1.0 - valid_mask) * fill_value
