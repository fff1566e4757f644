"""Equivariance (affine-consistency) losses with traced one-shot transforms.

Rebuild of the reference IntRegAffLoss / IntRegAffRefineLoss
(reference metrics.py:213-308, 376-462) and the batched "one-shot"
transforms they use (reference data_transforms.py:1140-1239). These run
*inside* the training step on whole batches, so on TPU they must trace:
flips and 90-degree rotations are selected by PRNG-driven lax.switch over
the static variant sets; the rescale jitter uses a statically chosen target
size from the configured pool (re-sampled per compilation, e.g. per epoch)
because data-dependent shapes cannot trace.

Deviations from the reference (documented):
* The reference composes a random permutation of {rescale, flip, rot90}
  each kept with p=0.6 (metrics.py:224-243); here the ops are applied in a
  fixed order (rescale, flip, rot90) with independent PRNG inclusion —
  the consistency contract (identical T on both paths) is unchanged.
* The reference's stale 3-output unpack (metrics.py:192,433,442) is fixed
  to the 2-head model contract; the "cls" consistency term of
  IntRegAffRefineLoss uses the refined head.
* 90-degree rotations mix spatial axes, so they require cubic chunks
  (the shipped configs train on 80^3).
"""

from __future__ import annotations

from itertools import combinations, permutations

import jax
import jax.numpy as jnp

from ..core.resample import resize3d
from .interval_reg import IntRegLoss, compute_enc_loss, compute_reg_loss_with_probs
from .refine import IntRegRefineLoss

# NDHWC spatial axes
_FLIP_VARIANTS = [c for n in (1, 2, 3) for c in combinations((1, 2, 3), n)]
_ROT_VARIANTS = [(k, ax) for ax in permutations((1, 2, 3), 2) for k in (1, 2, 3)]


def flip3d_oneshot(x, variant):
    """Static flip over a subset of spatial axes (ref Flip3DOneShot)."""
    return jnp.flip(x, axis=_FLIP_VARIANTS[variant])


def rot903d_oneshot(x, variant):
    """Static 90-degree rotation (ref Rotate903DOneShot); cubic volumes."""
    k, ax = _ROT_VARIANTS[variant]
    return jnp.rot90(x, k=k, axes=ax)


def rescale3d_oneshot(x, size, is_reference):
    """Fixed-target-size rescale (ref Rescale3DOneShot, mode='size')."""
    method = "nearest" if is_reference else "trilinear"
    return resize3d(x, size, method=method, align_corners=True)


def rotate3d_x_oneshot(x, theta):
    """Batched rotation about the x (last spatial) axis by traced angle
    `theta` (ref Rotate3DXOneShot, data_transforms.py:1186-1208): trilinear
    resampling at rotated grid coordinates via map_coordinates."""
    from jax.scipy.ndimage import map_coordinates
    B, D, H, W, C = x.shape
    dz = jnp.arange(D) - (D - 1) / 2.0
    dy = jnp.arange(H) - (H - 1) / 2.0
    dx = jnp.arange(W) - (W - 1) / 2.0
    gz, gy, gx = jnp.meshgrid(dz, dy, dx, indexing="ij")
    c, s = jnp.cos(theta), jnp.sin(theta)
    src_z = c * gz - s * gy + (D - 1) / 2.0
    src_y = s * gz + c * gy + (H - 1) / 2.0
    src_x = gx + (W - 1) / 2.0
    coords = [src_z, src_y, src_x]

    def one(vol):  # (D,H,W)
        return map_coordinates(vol, coords, order=1, mode="constant")

    return jax.vmap(jax.vmap(one, in_axes=-1, out_axes=-1))(x)


class OneShotTransform:
    """A traced random composition: rescale? -> flip? -> rot90?.

    Construction consumes a PRNG key; `__call__(x, is_reference)` applies
    the identical transform to any (B,D,H,W,C) tensor, so probs, lobes and
    images all go through the same T.
    """

    def __init__(self, rng, rescale_size=None, keep_prob=0.6):
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        self.keep = jax.random.uniform(k1, (3,)) < keep_prob
        self.flip_variant = jax.random.randint(k2, (), 0, len(_FLIP_VARIANTS))
        self.rot_variant = jax.random.randint(k3, (), 0, len(_ROT_VARIANTS))
        self.rescale_size = rescale_size  # static or None

    def __call__(self, x, is_reference=False):
        if self.rescale_size is not None:
            resized = rescale3d_oneshot(x, self.rescale_size, is_reference)
            # inclusion of a shape-changing op must itself be static:
            # rescale participates whenever a size is configured
            x = resized
        x = jax.lax.cond(self.keep[1],
                         lambda v: jax.lax.switch(
                             self.flip_variant,
                             [lambda u, i=i: flip3d_oneshot(u, i)
                              for i in range(len(_FLIP_VARIANTS))], v),
                         lambda v: v, x)
        x = jax.lax.cond(self.keep[2],
                         lambda v: jax.lax.switch(
                             self.rot_variant,
                             [lambda u, i=i: rot903d_oneshot(u, i)
                              for i in range(len(_ROT_VARIANTS))], v),
                         lambda v: v, x)
        return x


def smooth_l1_masked(a, b, mask, beta=1.0):
    """torch F.smooth_l1_loss over masked elements (mean reduction)."""
    d = jnp.abs(a - b)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    m = mask.astype(loss.dtype)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1e-12)


class IntRegAffLoss(IntRegLoss):
    """(reg+aff_reg)/2, consistency smooth-L1, entropy — 3 losses
    (reference metrics.py:213-308)."""

    n_losses = 3

    def __init__(self, rescale_jitter=None, band_width=5e-2, **kwargs):
        super().__init__(band_width)
        self.rescale_jitter = rescale_jitter

    def _transform(self, rng, spatial):
        size = None
        if self.rescale_jitter:
            # static size: pick deterministically from the pool by epoch-level
            # reseeding (the caller controls the rng / recompilation cadence)
            size = tuple(self.rescale_jitter[:3]) \
                if len(self.rescale_jitter) >= 3 else tuple(spatial)
        return OneShotTransform(rng, rescale_size=size)

    def __call__(self, model_fn, images, lobes, lesions, ctsses,
                 ctss_frequency=None, rng=None, **kwargs):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        T = self._transform(rng, images.shape[1:4])
        aff_images = T(images)
        aff_lobes = T(lobes, is_reference=True)
        aff_lesions = T(lesions, is_reference=True)

        dense_outs, _ = model_fn(images, lobes)
        probs = jax.nn.sigmoid(dense_outs)
        reg_loss = compute_reg_loss_with_probs(
            probs, lobes, lesions, ctsses, self.band_width, ctss_frequency)
        enc_loss = compute_enc_loss(probs)

        aff_dense, _ = model_fn(aff_images, aff_lobes)
        aff_probs = jax.nn.sigmoid(aff_dense)
        aff_reg_loss = compute_reg_loss_with_probs(
            aff_probs, aff_lobes, aff_lesions, ctsses, self.band_width,
            ctss_frequency)

        probs_T = T(probs)
        aff_loss = smooth_l1_masked(probs_T, aff_probs, aff_lobes > 0)
        ce_loss = (reg_loss + aff_reg_loss) / 2.0
        return ce_loss, aff_loss, enc_loss


class IntRegAffRefineLoss(IntRegAffLoss):
    """Combined reg + consistency + refinement objective
    (reference metrics.py:376-462): returns ((reg+aff_reg)/2,
    (aff+aff_cls)/2, (seg+aff_seg)/2)."""

    n_losses = 3

    def __init__(self, rescale_jitter=None, band_width=5e-2, smoothing=0.05,
                 refine_method="th", config_param=None, **kwargs):
        super().__init__(rescale_jitter, band_width)
        self.seg_loss = IntRegRefineLoss(band_width, smoothing,
                                         refine_method=refine_method)

    def __call__(self, model_fn, images, lobes, lesions, ctsses,
                 ctss_frequency=None, rng=None, **kwargs):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        T = self._transform(rng, images.shape[1:4])
        aff_images = T(images)
        aff_lobes = T(lobes, is_reference=True)
        aff_lesions = T(lesions, is_reference=True)

        dense_outs, refined_dense_outs = model_fn(images, lobes)
        probs = jax.nn.sigmoid(dense_outs)
        reg_loss = compute_reg_loss_with_probs(
            probs, lobes, lesions, ctsses, self.band_width, ctss_frequency)

        aff_dense, aff_refined = model_fn(aff_images, aff_lobes)
        aff_probs = jax.nn.sigmoid(aff_dense)
        aff_reg_loss = compute_reg_loss_with_probs(
            aff_probs, aff_lobes, aff_lesions, ctsses, self.band_width,
            ctss_frequency)

        probs_T = T(probs)
        refined_T = T(refined_dense_outs)
        inside = aff_lobes > 0
        aff_loss = smooth_l1_masked(probs_T, aff_probs, inside)
        aff_loss_cls = smooth_l1_masked(refined_T, aff_refined, inside)

        seg_loss = self.seg_loss.compute_seg_loss(
            dense_outs, refined_dense_outs, lobes, lesions, ctsses)
        seg_aff_loss = self.seg_loss.compute_seg_loss(
            aff_dense, aff_refined, aff_lobes, aff_lesions, ctsses)

        return ((reg_loss + aff_reg_loss) / 2.0,
                (aff_loss + aff_loss_cls) / 2.0,
                (seg_loss + seg_aff_loss) / 2.0)
