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
* The reference composes a random PERMUTATION of {rescale, flip, rot90}
  (metrics.py:224-243). Here the two shape-preserving ops (flip, rot90)
  compose in a traced random order (lax.cond over both orderings, drawn
  per call like the reference's permutation); the shape-CHANGING rescale
  always applies first because XLA traces static shapes — a rescale in
  the middle of the chain would make the rot90 branch shapes dynamic.
  Keep-probability (0.6 each) and the per-axis rescale-size sampling
  from the configured pool match the reference, drawn per CALL: the
  rescale is re-drawn on host every step (draw_rescale_static + trainer
  reseed) and the trainer swaps in the jitted step cached for that size —
  one compile per distinct size, reference cadence at static XLA shapes.
  The consistency contract (identical T on both paths) is unchanged; the
  one remaining distributional difference is the rescale's position in
  the permutation.
* The reference's stale 3-output unpack (metrics.py:192,433,442) is fixed
  to the 2-head model contract; the "cls" consistency term of
  IntRegAffRefineLoss uses the refined head.
* On non-cubic grids the rot90 pool is trimmed to shape-preserving
  variants (k=2, or quarter turns over equal-extent axis pairs).
"""

from __future__ import annotations

from itertools import combinations, permutations

import jax
import jax.numpy as jnp
import numpy as np

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
    """Fixed-target-size rescale (ref Rescale3DOneShot, mode='size'):
    trilinear with torch's DEFAULT align_corners=False for images
    (data_transforms.py:1221), nearest for references."""
    method = "nearest" if is_reference else "trilinear"
    return resize3d(x, size, method=method, align_corners=False)


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


def _shape_preserving_rot_variants(spatial):
    """Indices into _ROT_VARIANTS that keep (D,H,W) = `spatial` unchanged:
    k=2 always, k=1/3 only over equal-extent axis pairs. (lax.cond branches
    must agree on shapes; the reference's torch.rot90 freely changes shape,
    but both consistency paths go through the same T so the restriction
    only trims the variant pool on non-cubic grids.)"""
    out = []
    for i, (k, ax) in enumerate(_ROT_VARIANTS):
        if k == 2 or spatial[ax[0] - 1] == spatial[ax[1] - 1]:
            out.append(i)
    return out


def draw_rescale_static(seed, pool):
    """Host-side static draw of the rescale op, matching the reference's
    per-call sampling (metrics.py:224-231 + data_transforms.py:1210-1217):
    kept with p = 0.6 (np.random.randint(0,10) < 6) and, when kept, a
    per-axis target size np.random.choice(pool, 3). Shape-changing ops
    can't be traced, so the trainer re-seeds this draw per STEP and swaps
    in the matching jitted step from its cache (one compile per distinct
    drawn size) — the reference's per-call cadence at static shapes.
    Returns a (D,H,W) size tuple or None."""
    if not pool:
        return None
    rng = np.random.default_rng(seed)
    if rng.integers(0, 10) >= 6:
        return None
    return tuple(int(s) for s in rng.choice(np.asarray(pool, np.int64), 3))


class OneShotTransform:
    """A traced random composition: rescale? -> perm(flip?, rot90?).

    Construction consumes a PRNG key; `__call__(x, is_reference)` applies
    the identical transform to any (B,D,H,W,C) tensor, so probs, lobes and
    images all go through the same T. The rescale op is static (epoch-drawn
    via draw_rescale_static); flip and rot90 are traced per step, each kept
    with p=keep_prob and composed in a traced random ORDER, matching the
    reference's random permutation draw (metrics.py:224-235) up to the
    rescale's position (see module docstring).
    """

    def __init__(self, rng, rescale_size=None, keep_prob=0.6):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        self.keep = jax.random.uniform(k1, (2,)) < keep_prob
        self.flip_variant = jax.random.randint(k2, (), 0, len(_FLIP_VARIANTS))
        self._rot_key = k3
        # permutation of the two traced ops, uniform like the reference's
        # random.sample over orderings (metrics.py:234-235)
        self.flip_first = jax.random.bernoulli(k4)
        self.rescale_size = rescale_size  # static or None

    def __call__(self, x, is_reference=False):
        if self.rescale_size is not None:
            x = rescale3d_oneshot(x, self.rescale_size, is_reference)
        allowed = _shape_preserving_rot_variants(x.shape[1:4])
        rot_idx = jax.random.randint(self._rot_key, (), 0, len(allowed))

        def do_flip(v):
            return jax.lax.cond(self.keep[0],
                                lambda u: jax.lax.switch(
                                    self.flip_variant,
                                    [lambda w, i=i: flip3d_oneshot(w, i)
                                     for i in range(len(_FLIP_VARIANTS))], u),
                                lambda u: u, v)

        def do_rot(v):
            return jax.lax.cond(self.keep[1],
                                lambda u: jax.lax.switch(
                                    rot_idx,
                                    [lambda w, i=i: rot903d_oneshot(w, i)
                                     for i in allowed], u),
                                lambda u: u, v)

        # both ops preserve shape (the rot pool is trimmed on non-cubic
        # grids), so the two orderings trace to identical output shapes
        return jax.lax.cond(self.flip_first,
                            lambda v: do_rot(do_flip(v)),
                            lambda v: do_flip(do_rot(v)), x)


def smooth_l1_masked(a, b, mask, beta=1.0, sample_weight=None,
                     axis_name=None):
    """torch F.smooth_l1_loss over masked elements (mean reduction;
    global under shard_map when `axis_name` is set)."""
    from ..core.ops import gsum
    d = jnp.abs(a - b)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    m = mask.astype(loss.dtype)
    if sample_weight is not None:
        m = m * sample_weight.astype(m.dtype).reshape(
            (-1,) + (1,) * (m.ndim - 1))
    return gsum(loss * m, axis_name) / jnp.maximum(gsum(m, axis_name), 1e-12)


class IntRegAffLoss(IntRegLoss):
    """(reg+aff_reg)/2, consistency smooth-L1, entropy — 3 losses
    (reference metrics.py:213-308)."""

    n_losses = 3

    def __init__(self, rescale_jitter=None, band_width=5e-2, **kwargs):
        super().__init__(band_width)
        self.rescale_jitter = rescale_jitter
        self.epoch_reseed(0)

    def epoch_reseed(self, seed):
        """Redraw the static (shape-changing) rescale op for a new epoch.
        Called by the trainer with an epoch-derived seed; returns True when
        the drawn size changed (the caller must rebuild its jitted step)."""
        size = draw_rescale_static(seed, self.rescale_jitter)
        changed = size != getattr(self, "_static_rescale_size", None)
        self._static_rescale_size = size
        return changed

    def static_key(self):
        """Hashable epoch-static configuration (jit-cache key)."""
        return ("rescale", self._static_rescale_size)

    def _transform(self, rng, spatial):
        return OneShotTransform(rng, rescale_size=self._static_rescale_size)

    def __call__(self, model_fn, images, lobes, lesions, ctsses,
                 ctss_frequency=None, rng=None, sample_weight=None,
                 axis_name=None, **kwargs):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        T = self._transform(rng, images.shape[1:4])
        aff_images = T(images)
        aff_lobes = T(lobes, is_reference=True)
        aff_lesions = T(lesions, is_reference=True)

        dense_outs, _ = model_fn(images, lobes)
        probs = jax.nn.sigmoid(dense_outs)
        reg_loss = compute_reg_loss_with_probs(
            probs, lobes, lesions, ctsses, self.band_width, ctss_frequency,
            sample_weight, axis_name)
        enc_loss = compute_enc_loss(probs, sample_weight, axis_name)

        aff_dense, _ = model_fn(aff_images, aff_lobes)
        aff_probs = jax.nn.sigmoid(aff_dense)
        aff_reg_loss = compute_reg_loss_with_probs(
            aff_probs, aff_lobes, aff_lesions, ctsses, self.band_width,
            ctss_frequency, sample_weight, axis_name)

        probs_T = T(probs)
        aff_loss = smooth_l1_masked(probs_T, aff_probs, aff_lobes > 0,
                                    sample_weight=sample_weight,
                                    axis_name=axis_name)
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
                 ctss_frequency=None, rng=None, sample_weight=None,
                 axis_name=None, **kwargs):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        T = self._transform(rng, images.shape[1:4])
        aff_images = T(images)
        aff_lobes = T(lobes, is_reference=True)
        aff_lesions = T(lesions, is_reference=True)

        dense_outs, refined_dense_outs = model_fn(images, lobes)
        probs = jax.nn.sigmoid(dense_outs)
        reg_loss = compute_reg_loss_with_probs(
            probs, lobes, lesions, ctsses, self.band_width, ctss_frequency,
            sample_weight, axis_name)

        aff_dense, aff_refined = model_fn(aff_images, aff_lobes)
        aff_probs = jax.nn.sigmoid(aff_dense)
        aff_reg_loss = compute_reg_loss_with_probs(
            aff_probs, aff_lobes, aff_lesions, ctsses, self.band_width,
            ctss_frequency, sample_weight, axis_name)

        probs_T = T(probs)
        refined_T = T(refined_dense_outs)
        inside = aff_lobes > 0
        aff_loss = smooth_l1_masked(probs_T, aff_probs, inside,
                                    sample_weight=sample_weight,
                                    axis_name=axis_name)
        aff_loss_cls = smooth_l1_masked(refined_T, aff_refined, inside,
                                        sample_weight=sample_weight,
                                        axis_name=axis_name)

        seg_loss = self.seg_loss.compute_seg_loss(
            dense_outs, refined_dense_outs, lobes, lesions, ctsses,
            sample_weight, axis_name)
        seg_aff_loss = self.seg_loss.compute_seg_loss(
            aff_dense, aff_refined, aff_lobes, aff_lesions, ctsses,
            sample_weight, axis_name)

        return ((reg_loss + aff_reg_loss) / 2.0,
                (aff_loss + aff_loss_cls) / 2.0,
                (seg_loss + seg_aff_loss) / 2.0)
