"""DRAM interval-regression loss — the core weak supervision objective.

Rebuild of the reference IntRegLoss (reference metrics.py:75-210). The CTSS
score implies an interval of admissible lesion-volume ratios per lobe; the
predicted ratio (lobe-masked mean of the sigmoid CAM) is penalised with a
squared hinge for leaving the intersection of that interval with a band
around the intensity-derived pseudo-ratio upper bound.

TPU redesign: the reference's per-sample `torch.split` over ragged lobe
sizes (metrics.py:162-165) becomes a per-sample masked mean (fixed shapes);
the host-side interval table lookups (metrics.py:121-137) become branchless
gathers/wheres, so the whole loss traces into the training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ops import gsum, masked_mean

# score -> admissible lesion-ratio interval (reference metrics.py:76-83)
CTSS_RATIO_LB = np.array([0.0, 0.001, 0.01, 0.05, 0.35, 0.5], np.float32)
CTSS_RATIO_UB = np.array([0.001, 0.01, 0.05, 0.35, 0.5, 1.00001], np.float32)

# static fallback frequency map (reference metrics.py:85-92); the trainer
# normally passes the sampler-derived map instead
DEFAULT_CTSS_FREQUENCY = np.array([0.3, 0.25, 0.23, 0.2, 0.18, 0.15], np.float32)


def get_labels(ctsses, lesion_ps, band_width):
    """(B,) int scores + (B,) pseudo-ratio upper bounds -> (B,2) intervals.

    Branchless version of reference get_labels (metrics.py:121-137):
    intersect [ctss_lb, ctss_ub] with [p-bw, p+bw]; if empty, fall back to
    the band (when it lies below the interval) or the interval (when the
    band lies above).
    """
    ctsses = ctsses.astype(jnp.int32)
    lb = jnp.maximum(0.0, lesion_ps - band_width)
    ub = jnp.minimum(1.0, lesion_ps + band_width)
    ctss_lb = jnp.asarray(CTSS_RATIO_LB)[ctsses]
    ctss_ub = jnp.asarray(CTSS_RATIO_UB)[ctsses]
    lo = jnp.maximum(ctss_lb, lb)
    hi = jnp.minimum(ctss_ub, ub)
    empty = hi < lo
    below = ub <= ctss_lb  # band entirely below the score interval
    lo = jnp.where(empty, jnp.where(below, lb, ctss_lb), lo)
    hi = jnp.where(empty, jnp.where(below, ub, ctss_ub), hi)
    return jnp.stack([lo, hi], axis=-1)


def ratio_to_label(ratios):
    """Host-side inverse lookup: predicted ratio -> ordinal class
    (reference metrics.py:109-115)."""
    ratios = np.atleast_1d(np.asarray(ratios, np.float64))
    labels = []
    for r in ratios:
        idx = np.where((CTSS_RATIO_LB <= r) & (r < CTSS_RATIO_UB))[0]
        labels.append(int(idx[0]) if len(idx) else 5)
    return labels


def gen_qwk(n):
    """Quadratic-weight matrix (reference metrics.py:100-107; unused by the
    default path, kept for API completeness)."""
    from itertools import permutations
    qwk = np.zeros((n, n), np.float32)
    for i, j in permutations(range(n), 2):
        qwk[i, j] = (abs(i - j) + 1) ** 2 / (n ** 2)
    return qwk + 1.0


def compute_enc_loss(p, sample_weight=None, axis_name=None):
    """Entropy regulariser pushing probabilities toward {0,1}
    (reference metrics.py:154-156). With `sample_weight` (B,), padded
    batch rows (weight 0) are excluded exactly — used by pad-and-mask
    data parallelism (core/mesh.py pad_batch). Under shard_map
    (`axis_name`), the mean pools over the GLOBAL batch."""
    ent = (-p * jnp.log(p + 1e-7)) + (p - 1.0) * jnp.log(1.0 - p + 1e-7)
    if sample_weight is None:
        n = jnp.asarray(ent.size, ent.dtype)
        return gsum(ent, axis_name) / gsum(n, axis_name)
    w = sample_weight.astype(ent.dtype)
    per_sample = jnp.mean(ent, axis=tuple(range(1, ent.ndim)))
    return gsum(per_sample * w, axis_name) / \
        jnp.maximum(gsum(w, axis_name), 1e-12)


def compute_reg_loss_with_probs(probs, lobes, lesion_candidates, ctsses,
                                band_width, ctss_frequency=None,
                                sample_weight=None, axis_name=None):
    """probs/lobes/lesion_candidates: (B,D,H,W,1); ctsses: (B,) ints.

    Returns the summed hinge-squared interval loss (reference
    metrics.py:158-177), weighted by the inverse clamped label frequency.
    `sample_weight` (B,) zeroes padded batch rows exactly; `axis_name`
    makes the batch sum global under shard_map data parallelism.
    """
    if ctss_frequency is None:
        ctss_frequency = jnp.asarray(DEFAULT_CTSS_FREQUENCY)
    axes = tuple(range(1, probs.ndim))
    lobes_f = (lobes > 0).astype(probs.dtype)
    cand_f = (lesion_candidates > 0).astype(probs.dtype)

    ratio_upper_bound = jnp.sum(cand_f * lobes_f, axes) / \
        jnp.maximum(jnp.sum(lobes_f, axes), 1e-12)
    pred_ratio = masked_mean(probs, lobes_f, axes)

    targets = get_labels(ctsses, ratio_upper_bound, band_width)
    lo, hi = targets[:, 0], targets[:, 1]
    K = (0.5 * (hi - lo)) ** 2
    loss_unhinge = (pred_ratio - (hi + lo) / 2.0) ** 2 - K
    loss_unweight = jnp.maximum(loss_unhinge, 0.0)

    wf = jnp.clip(ctss_frequency[ctsses.astype(jnp.int32)], 0.2, 0.8)
    per_sample = loss_unweight / wf
    if sample_weight is not None:
        per_sample = per_sample * sample_weight.astype(per_sample.dtype)
    return gsum(per_sample, axis_name)


class IntRegLoss:
    """Reference-parity loss object: returns (reg_loss, entropy_loss).

    `model_fn(images, lobes) -> (dense_outs, refined_dense_outs)` — the loss
    calls the model itself, like the reference contract
    (job_runner.py:664-667).
    """

    n_losses = 2

    def __init__(self, band_width=5e-2, **kwargs):
        self.band_width = band_width

    def ratio_to_label(self, ratios):
        return ratio_to_label(ratios)

    def __call__(self, model_fn, images, lobes, lesions, ctsses,
                 ctss_frequency=None, rng=None, sample_weight=None,
                 axis_name=None, **kwargs):
        dense_outs, _ = model_fn(images, lobes)
        probs = jax.nn.sigmoid(dense_outs)
        reg_loss = compute_reg_loss_with_probs(
            probs, lobes, lesions, ctsses, self.band_width, ctss_frequency,
            sample_weight, axis_name)
        enc_loss = compute_enc_loss(probs, sample_weight, axis_name)
        return reg_loss, enc_loss
