"""Bootstrapped / class-balanced binary cross-entropies (jit-safe).

Rebuild of the reference losses (reference metrics.py:10-72). The reference
indexes tensors with boolean masks (`p[voi<eps]`), which is shape-dynamic;
here every region statistic is a masked reduction with fixed shapes, which
XLA fuses into the surrounding graph. Semantics match exactly, including
the *global* (whole-batch) alpha balancing the reference gets from its
flattened boolean indexing.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.ops import gsum


def _masked_mean(x, m, axis_name=None):
    m = m.astype(x.dtype)
    return gsum(x * m, axis_name) / jnp.maximum(gsum(m, axis_name), 1e-12)


class BootBinCrossEntropy:
    """Outside-lobe plain BCE toward 0 + inside-lobe class-balanced BCE
    blended with a self-bootstrap term (reference metrics.py:10-51).

    p: probabilities, t: {0,1} pseudo targets, voi: region of interest.
    All shapes equal; statistics pool over the whole batch.
    """

    def __init__(self, smoothing=0.1):
        self.smoothing = smoothing
        self.eps = 1e-7

    def __call__(self, p, t, voi, class_weights=None, sample_weight=None,
                 axis_name=None):
        t = t.astype(p.dtype)
        outside = (voi < 1e-7).astype(p.dtype)
        inside = (voi > 0.0).astype(p.dtype)
        if sample_weight is not None:
            # padded batch rows (weight 0) leave every pooled statistic —
            # alpha balance, region means — exactly as without them
            w_b = sample_weight.astype(p.dtype).reshape(
                (-1,) + (1,) * (p.ndim - 1))
            outside = outside * w_b
            inside = inside * w_b

        pt = p * t + (1.0 - p) * (1.0 - t)
        ptc = jnp.clip(pt, self.eps, 1.0 - self.eps)
        nll = -jnp.log(ptc)

        bceo_loss = _masked_mean(nll, outside, axis_name)

        # alpha balances over the GLOBAL batch (the reference pools its
        # boolean-indexed statistics over the whole flattened batch)
        n_in = gsum(inside, axis_name)
        t_in = gsum(t * inside, axis_name)
        alpha = jnp.clip(1.0 - t_in / jnp.maximum(n_in, 1e-12), 0.25, 0.75)
        w = (alpha * t + (1.0 - alpha) * (1.0 - t)) * inside
        bce_loss = gsum(nll * w, axis_name) / \
            jnp.maximum(gsum(w, axis_name), 1e-12)

        t_hat = (p > 0.5).astype(p.dtype)
        pt_hat = p * t_hat + (1.0 - p) * (1.0 - t_hat)
        nll_hat = -jnp.log(jnp.clip(pt_hat, self.eps, 1.0 - self.eps))
        bootstrap_loss = _masked_mean(nll_hat, inside, axis_name)

        inside_term = (1.0 - self.smoothing) * bce_loss + \
            self.smoothing * bootstrap_loss
        return bceo_loss + jnp.where(n_in > 0, inside_term, 0.0)


class BinaryCrossEntropySmooth:
    """Class-balanced weighted BCE over the flattened batch
    (reference metrics.py:53-72; unused by the shipped configs)."""

    def __init__(self, smooth):
        self.smooth = smooth
        self.eps = 1e-6

    def __call__(self, probs, targets):
        p = probs.reshape(-1)
        t = targets.reshape(-1).astype(p.dtype)
        alpha = jnp.clip(1.0 - jnp.sum(t) / t.shape[0], 0.3, 0.7)
        p = jnp.clip(p, self.eps, 1.0 - self.eps)
        pt = jnp.log(p) * t + jnp.log(1.0 - p) * (1.0 - t)
        w = alpha * t + (1.0 - alpha) * (1.0 - t)
        nll = -self.smooth * pt * w
        return jnp.sum(nll) / jnp.sum(w)
