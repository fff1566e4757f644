"""IntRegRefineLoss — the configured training loss (st_dram_ref.py:110).

Rebuild of the reference IntRegRefineLoss (reference metrics.py:311-373):
(1) interval-regression loss on the first head's probabilities;
(2) bootstrapped segmentation loss training the refined head against
    pseudo-labels thresholded from the first head.

TPU redesign: the reference generates pseudo-labels on the CPU per sample
(detach -> .cpu().numpy() -> threshold -> back to GPU, metrics.py:338-352
— a D2H round-trip inside every training step). Here pseudo-labeling is
three comparisons and two logical_ands on device, under stop_gradient,
fully inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bootstrap_bce import BootBinCrossEntropy
from .interval_reg import IntRegLoss, compute_reg_loss_with_probs


def pseudo_labels(dense_outs, lobes, lesion_candidates, ctsses):
    """On-device pseudo-label generation (reference threshold_postprocessing
    + compute_seg_loss, metrics.py:325-352):

      pseudo = (sigmoid(dense) > 0.5) & inside-lobe & intensity-candidate,
      zeroed when the lobe's CTSS is 0.
    """
    probs = jax.lax.stop_gradient(jax.nn.sigmoid(dense_outs))
    inside = lobes > 0
    pred = jnp.logical_and(probs > 0.5, inside)
    cand = jnp.logical_and(pred, lesion_candidates > 0)
    score_pos = (ctsses.astype(jnp.float32) >= 1e-7)
    shape = [-1] + [1] * (dense_outs.ndim - 1)
    return jnp.logical_and(cand, score_pos.reshape(shape)).astype(jnp.float32)


class IntRegRefineLoss(IntRegLoss):
    n_losses = 2

    def __init__(self, band_width=1e-2, smoothing=0.1, refine_method="th",
                 config_param=None, **kwargs):
        super().__init__(band_width)
        if refine_method != "th":
            raise NotImplementedError(f"refine method {refine_method}")
        self.smoothing = smoothing
        self.bootstrap_loss = BootBinCrossEntropy(smoothing)

    def compute_seg_loss(self, dense_outs, refined_dense_outs, lobes,
                         lesions, ctsses, sample_weight=None, axis_name=None):
        pseudo = pseudo_labels(dense_outs, lobes, lesions, ctsses)
        p = jax.nn.sigmoid(refined_dense_outs)
        voi = (lobes > 0).astype(p.dtype)
        return self.bootstrap_loss(p, pseudo, voi,
                                   sample_weight=sample_weight,
                                   axis_name=axis_name)

    def __call__(self, model_fn, images, lobes, lesions, ctsses,
                 ctss_frequency=None, rng=None, sample_weight=None,
                 axis_name=None, **kwargs):
        dense_outs, refined_dense_outs = model_fn(images, lobes)
        probs = jax.nn.sigmoid(dense_outs)
        reg_loss = compute_reg_loss_with_probs(
            probs, lobes, lesions, ctsses, self.band_width, ctss_frequency,
            sample_weight, axis_name)
        seg_loss = self.compute_seg_loss(dense_outs, refined_dense_outs,
                                         lobes, lesions, ctsses,
                                         sample_weight, axis_name)
        return reg_loss, seg_loss
