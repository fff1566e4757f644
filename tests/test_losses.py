"""Loss-layer tests against hand-written NumPy/torch oracles that follow the
reference math literally (boolean indexing, torch.split per-lobe means)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dram_tpu.losses import (BootBinCrossEntropy, IntRegLoss, IntRegRefineLoss,
                             IntRegAffLoss)
from dram_tpu.losses.interval_reg import (compute_reg_loss_with_probs,
                                          compute_enc_loss, get_labels,
                                          ratio_to_label, CTSS_RATIO_LB,
                                          CTSS_RATIO_UB)
from dram_tpu.losses.refine import pseudo_labels
from dram_tpu.losses.equivariance import smooth_l1_masked, OneShotTransform


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def boot_bce_oracle(p, t, voi, smoothing):
    """Literal reference BootBinCrossEntropy (metrics.py:10-51)."""
    eps = 1e-7
    p, t, voi = (np.asarray(a, np.float64).ravel() for a in (p, t, voi))
    tb = voi < 1e-7
    po, to = p[tb], t[tb]
    pto = np.clip(po * to + (1 - po) * (1 - to), eps, 1 - eps)
    bceo = (-np.log(pto)).mean()
    tf = voi > 0
    if tf.sum() == 0:
        return bceo
    pi, ti = p[tf], t[tf]
    alpha = np.clip(1.0 - ti.sum() / tf.sum(), 0.25, 0.75)
    pti = np.clip(pi * ti + (1 - pi) * (1 - ti), eps, 1 - eps)
    w = alpha * ti + (1 - alpha) * (1 - ti)
    bce = (-np.log(pti) * w).sum() / w.sum()
    ti_hat = (pi > 0.5).astype(np.float64)
    pit = np.clip(pi * ti_hat + (1 - pi) * (1 - ti_hat), eps, 1 - eps)
    boot = (-np.log(pit)).mean()
    return bceo + (1 - smoothing) * bce + smoothing * boot


def reg_loss_oracle(probs, lobes, cands, ctsses, band_width, freq):
    """Literal reference compute_reg_loss_with_probs (metrics.py:158-177)."""
    B = probs.shape[0]
    loss = 0.0
    for b in range(B):
        lobe = lobes[b] > 0
        rub = (cands[b] * lobe).sum() / lobe.sum()
        pred = probs[b][lobe].mean()
        lb, ub = max(0.0, rub - band_width), min(1.0, rub + band_width)
        clb, cub = CTSS_RATIO_LB[ctsses[b]], CTSS_RATIO_UB[ctsses[b]]
        lo, hi = max(clb, lb), min(cub, ub)
        if hi < lo:
            if ub <= clb:
                lo, hi = lb, ub
            elif lb >= cub:
                lo, hi = clb, cub
        K = (0.5 * (hi - lo)) ** 2
        unhinged = (pred - (hi + lo) / 2.0) ** 2 - K
        wf = np.clip(freq[ctsses[b]], 0.2, 0.8)
        loss += max(unhinged, 0.0) / wf
    return loss


class TestBootBCE:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference_math(self, seed):
        rng = np.random.default_rng(seed)
        p = rng.random((2, 6, 6, 6, 1)).astype(np.float32)
        voi = (rng.random((2, 6, 6, 6, 1)) > 0.4).astype(np.float32)
        t = ((rng.random((2, 6, 6, 6, 1)) > 0.7) & (voi > 0)).astype(np.float32)
        got = float(BootBinCrossEntropy(0.1)(jnp.asarray(p), jnp.asarray(t),
                                             jnp.asarray(voi)))
        want = boot_bce_oracle(p, t, voi, 0.1)
        assert got == pytest.approx(want, rel=1e-5)

    def test_empty_inside(self):
        p = np.full((1, 4, 4, 4, 1), 0.3, np.float32)
        voi = np.zeros_like(p)
        t = np.zeros_like(p)
        got = float(BootBinCrossEntropy(0.1)(jnp.asarray(p), jnp.asarray(t),
                                             jnp.asarray(voi)))
        want = boot_bce_oracle(p, t, voi, 0.1)
        assert got == pytest.approx(want, rel=1e-5)


class TestIntervalLabels:
    def test_get_labels_cases(self):
        # (ctss, pseudo_ratio) covering: normal intersection, band below
        # interval, band above interval
        ctss = jnp.asarray([3, 3, 0])
        ps = jnp.asarray([0.10, 0.01, 0.50])
        out = np.asarray(get_labels(ctss, ps, band_width=0.01))
        # ctss 3 -> [0.05, 0.35]; band [0.09, 0.11] -> intersection
        np.testing.assert_allclose(out[0], [0.09, 0.11], atol=1e-6)
        # band [0.0, 0.02] below [0.05, 0.35] -> band
        np.testing.assert_allclose(out[1], [0.0, 0.02], atol=1e-6)
        # ctss 0 -> [0, 0.001]; band [0.49, 0.51] above -> interval
        np.testing.assert_allclose(out[2], [0.0, 0.001], atol=1e-6)

    def test_ratio_to_label(self):
        assert ratio_to_label([0.0, 0.005, 0.02, 0.2, 0.4, 0.9]) == \
            [0, 1, 2, 3, 4, 5]


class TestRegLoss:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_split_oracle(self, seed):
        rng = np.random.default_rng(seed)
        B = 4
        probs = rng.random((B, 8, 8, 8, 1)).astype(np.float32)
        lobes = (rng.random((B, 8, 8, 8, 1)) > 0.3).astype(np.float32)
        cands = ((rng.random((B, 8, 8, 8, 1)) > 0.8) * lobes).astype(np.float32)
        ctss = rng.integers(0, 6, B)
        freq = np.array([0.3, 0.25, 0.23, 0.2, 0.18, 0.15], np.float32)
        got = float(compute_reg_loss_with_probs(
            jnp.asarray(probs), jnp.asarray(lobes), jnp.asarray(cands),
            jnp.asarray(ctss), 1e-2, jnp.asarray(freq)))
        want = reg_loss_oracle(probs, lobes, cands, ctss, 1e-2, freq)
        assert got == pytest.approx(want, rel=1e-4)

    def test_enc_loss(self):
        p = jnp.asarray(np.array([0.5, 0.9, 0.1], np.float32))
        got = float(compute_enc_loss(p))
        pn = np.array([0.5, 0.9, 0.1])
        want = np.mean(-pn * np.log(pn + 1e-7) + (pn - 1) * np.log(1 - pn + 1e-7))
        assert got == pytest.approx(want, rel=1e-5)


class TestPseudoLabels:
    def test_threshold_logic(self, rng):
        dense = rng.normal(size=(3, 6, 6, 6, 1)).astype(np.float32)
        lobes = (rng.random((3, 6, 6, 6, 1)) > 0.3).astype(np.float32)
        cands = (rng.random((3, 6, 6, 6, 1)) > 0.5).astype(np.float32)
        ctss = np.array([0, 2, 5])
        got = np.asarray(pseudo_labels(jnp.asarray(dense), jnp.asarray(lobes),
                                       jnp.asarray(cands), jnp.asarray(ctss)))
        probs = _sigmoid(dense)
        probs = probs * (lobes > 0)  # zero outside lobe, like the reference
        want = np.logical_and(probs > 0.5, cands > 0).astype(np.float32)
        want[0] = 0.0  # ctss == 0 -> all zero
        np.testing.assert_array_equal(got, want)


class TestRefineLoss:
    def test_end_to_end_composition(self, rng):
        dense = rng.normal(size=(2, 6, 6, 6, 1)).astype(np.float32)
        refined = rng.normal(size=(2, 6, 6, 6, 1)).astype(np.float32)
        lobes = (rng.random((2, 6, 6, 6, 1)) > 0.3).astype(np.float32)
        cands = (rng.random((2, 6, 6, 6, 1)) > 0.6).astype(np.float32)
        ctss = np.array([1, 4])
        freq = np.array([0.3, 0.25, 0.23, 0.2, 0.18, 0.15], np.float32)

        loss = IntRegRefineLoss(band_width=1e-2, smoothing=0.1)
        model_fn = lambda x, l: (jnp.asarray(dense), jnp.asarray(refined))
        reg, seg = loss(model_fn, jnp.zeros_like(dense), jnp.asarray(lobes),
                        jnp.asarray(cands), jnp.asarray(ctss),
                        ctss_frequency=jnp.asarray(freq))
        want_reg = reg_loss_oracle(_sigmoid(dense), lobes, cands, ctss, 1e-2, freq)
        assert float(reg) == pytest.approx(want_reg, rel=1e-4)

        pseudo = np.asarray(pseudo_labels(jnp.asarray(dense), jnp.asarray(lobes),
                                          jnp.asarray(cands), jnp.asarray(ctss)))
        want_seg = boot_bce_oracle(_sigmoid(refined), pseudo, lobes, 0.1)
        assert float(seg) == pytest.approx(want_seg, rel=1e-4)

    def test_jits(self, rng):
        loss = IntRegRefineLoss()
        dense = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 1)).astype(np.float32))
        lobes = jnp.ones((1, 4, 4, 4, 1), jnp.float32)

        @jax.jit
        def f(d, l):
            return loss(lambda x, m: (d, d), d, l, l,
                        jnp.asarray([2]))
        reg, seg = f(dense, lobes)
        assert np.isfinite(float(reg)) and np.isfinite(float(seg))


class TestEquivariance:
    def test_smooth_l1_matches_torch(self, rng):
        a = rng.normal(size=(64,)).astype(np.float32) * 2
        b = rng.normal(size=(64,)).astype(np.float32)
        got = float(smooth_l1_masked(jnp.asarray(a), jnp.asarray(b),
                                     jnp.ones(64, bool)))
        want = torch.nn.functional.smooth_l1_loss(
            torch.from_numpy(a), torch.from_numpy(b)).item()
        assert got == pytest.approx(want, rel=1e-5)

    def test_transform_is_consistent_and_invertible_family(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
        T = OneShotTransform(jax.random.PRNGKey(7))
        a = np.asarray(T(x))
        b = np.asarray(T(x))
        np.testing.assert_array_equal(a, b)  # same T both times
        assert a.shape == x.shape
        # volume-preserving family: values are a permutation of the input
        np.testing.assert_allclose(np.sort(a.ravel()),
                                   np.sort(np.asarray(x).ravel()), atol=0)

    def test_aff_loss_zero_for_equivariant_model(self, rng):
        """If the model is pointwise (dense = images), then T(probs(x)) ==
        probs(T(x)) and the consistency loss must be 0."""
        images = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
        lobes = jnp.ones_like(images)
        loss = IntRegAffLoss(band_width=1e-2)
        model_fn = lambda x, l: (x, x)
        ce, aff, enc = loss(model_fn, images, lobes,
                            jnp.zeros_like(images), jnp.asarray([2, 3]),
                            rng=jax.random.PRNGKey(3))
        assert float(aff) == pytest.approx(0.0, abs=1e-6)


class TestSampleWeight:
    """Pad-and-mask DP contract: every loss with `sample_weight` must equal
    its unpadded value when the padded rows (wrap-around copies) get
    weight 0 (core/mesh.py pad_batch)."""

    def _batch(self, rng, B=5):
        x = rng.normal(size=(B, 6, 6, 6, 1)).astype(np.float32)
        lobes = (rng.random((B, 6, 6, 6, 1)) > 0.3).astype(np.float32)
        cands = ((rng.random((B, 6, 6, 6, 1)) > 0.6) * lobes).astype(np.float32)
        ctss = rng.integers(0, 6, B).astype(np.int32)
        return x, lobes, cands, ctss

    def _padded(self, arrays, n_shards=4):
        from dram_tpu.core.mesh import pad_batch
        return pad_batch(arrays, n_shards)

    @pytest.mark.parametrize("loss_cls,kwargs", [
        (IntRegLoss, {"band_width": 5e-2}),
        (IntRegRefineLoss, {"band_width": 1e-2, "smoothing": 0.1}),
    ])
    def test_padded_equals_unpadded(self, rng, loss_cls, kwargs):
        x, lobes, cands, ctss = self._batch(rng)
        loss = loss_cls(**kwargs)
        model_fn = lambda im, lo: (im * 0.3 + lo * 0.1, im * 0.2 - lo * 0.05)
        want = loss(model_fn, *(jnp.asarray(a) for a in (x, lobes, cands, ctss)))
        (px, pl, pc, pt), w = self._padded((x, lobes, cands, ctss))
        assert px.shape[0] == 8
        got = loss(model_fn, jnp.asarray(px), jnp.asarray(pl),
                   jnp.asarray(pc), jnp.asarray(pt),
                   sample_weight=jnp.asarray(w))
        for a, b in zip(want, got):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-5)

    def test_aff_refine_padded_equals_unpadded(self, rng):
        from dram_tpu.losses import IntRegAffRefineLoss
        x, lobes, cands, ctss = self._batch(rng)
        loss = IntRegAffRefineLoss(band_width=1e-2, smoothing=0.1)
        model_fn = lambda im, lo: (im * 0.3 + lo * 0.1, im * 0.2 - lo * 0.05)
        key = jax.random.PRNGKey(11)
        want = loss(model_fn, *(jnp.asarray(a) for a in (x, lobes, cands, ctss)),
                    rng=key)
        (px, pl, pc, pt), w = self._padded((x, lobes, cands, ctss))
        got = loss(model_fn, jnp.asarray(px), jnp.asarray(pl),
                   jnp.asarray(pc), jnp.asarray(pt), rng=key,
                   sample_weight=jnp.asarray(w))
        for a, b in zip(want, got):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-5)

    def test_boot_bce_weighted(self, rng):
        p = _sigmoid(rng.normal(size=(3, 5, 5, 5, 1))).astype(np.float32)
        t = (rng.random((3, 5, 5, 5, 1)) > 0.5).astype(np.float32)
        voi = (rng.random((3, 5, 5, 5, 1)) > 0.4).astype(np.float32)
        loss = BootBinCrossEntropy(0.1)
        want = float(loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(voi)))
        pp = np.concatenate([p, p[:1]], 0)
        tt = np.concatenate([t, t[:1]], 0)
        vv = np.concatenate([voi, voi[:1]], 0)
        w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        got = float(loss(jnp.asarray(pp), jnp.asarray(tt), jnp.asarray(vv),
                         sample_weight=w))
        assert got == pytest.approx(want, rel=1e-6)


class TestOneShotReferenceOracle:
    def test_fixed_draw_matches_torch_composition(self, rng):
        """Oracle for ONE fixed transform draw: rescale(per-axis size,
        F.interpolate default align_corners=False / nearest) -> flip ->
        rot90, composed exactly like the reference one-shots
        (metrics.py:219-243, data_transforms.py:1140-1239)."""
        from dram_tpu.losses.equivariance import (
            rescale3d_oneshot, flip3d_oneshot, rot903d_oneshot,
            _FLIP_VARIANTS, _ROT_VARIANTS)
        x = rng.normal(size=(2, 9, 8, 7, 1)).astype(np.float32)
        size = (12, 10, 8)

        y = rescale3d_oneshot(jnp.asarray(x), size, is_reference=False)
        y = flip3d_oneshot(y, _FLIP_VARIANTS.index((1, 3)))
        y = np.asarray(rot903d_oneshot(y, _ROT_VARIANTS.index((2, (1, 2)))))

        t = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCDHW
        t = torch.nn.functional.interpolate(t, size=size, mode="trilinear")
        t = torch.flip(t, (2, 4))
        t = torch.rot90(t, 2, (2, 3))
        want = t.numpy().transpose(0, 2, 3, 4, 1)
        np.testing.assert_allclose(y, want, atol=2e-5)

        # reference-mask channel: torch nearest
        yr = np.asarray(rescale3d_oneshot(jnp.asarray(x), size,
                                          is_reference=True))
        tr = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), size=size,
            mode="nearest")
        np.testing.assert_allclose(
            yr, tr.numpy().transpose(0, 2, 3, 4, 1), atol=0)

    def test_draw_rescale_static_semantics(self):
        """Keep-prob 0.6 + per-axis pool choice (reference
        metrics.py:224-231, data_transforms.py:1216-1217)."""
        from dram_tpu.losses.equivariance import draw_rescale_static
        pool = [8, 10, 12]
        draws = [draw_rescale_static(s, pool) for s in range(400)]
        kept = [d for d in draws if d is not None]
        assert 0.5 < len(kept) / len(draws) < 0.7
        assert all(all(v in pool for v in d) for d in kept)
        # per-axis sampling: non-cubic sizes must occur
        assert any(len(set(d)) > 1 for d in kept)
        assert draw_rescale_static(5, None) is None

    def test_noncubic_rot90_shape_preserving(self, rng):
        """On non-cubic grids the traced rot90 pool is trimmed to shape-
        preserving variants; the transform still runs and keeps shapes."""
        from dram_tpu.losses.equivariance import OneShotTransform
        x = jnp.asarray(rng.normal(size=(1, 6, 4, 4, 1)).astype(np.float32))
        for seed in range(6):
            T = OneShotTransform(jax.random.PRNGKey(seed))
            assert T(x).shape == x.shape

    def test_composition_order_matches_torch(self, rng):
        """The traced flip/rot90 ORDER matches the reference's random
        permutation draw (metrics.py:234-239): for every drawn T the
        output equals the torch ops composed in T's drawn order, and both
        orderings occur across seeds."""
        from dram_tpu.losses.equivariance import (
            OneShotTransform, _FLIP_VARIANTS, _ROT_VARIANTS,
            _shape_preserving_rot_variants)
        x = rng.normal(size=(2, 6, 6, 6, 1)).astype(np.float32)
        allowed = _shape_preserving_rot_variants((6, 6, 6))
        orders_seen = set()
        for seed in range(12):
            T = OneShotTransform(jax.random.PRNGKey(seed))
            got = np.asarray(T(jnp.asarray(x)))

            keep = np.asarray(T.keep)
            rot_idx = int(jax.random.randint(T._rot_key, (), 0,
                                             len(allowed)))
            flip_first = bool(T.flip_first)
            orders_seen.add(flip_first)

            t = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCDHW

            def tflip(v):
                if not keep[0]:
                    return v
                axes = _FLIP_VARIANTS[int(T.flip_variant)]
                return torch.flip(v, tuple(a + 1 for a in axes))

            def trot(v):
                if not keep[1]:
                    return v
                k, ax = _ROT_VARIANTS[allowed[rot_idx]]
                return torch.rot90(v, k, (ax[0] + 1, ax[1] + 1))

            t = trot(tflip(t)) if flip_first else tflip(trot(t))
            want = t.numpy().transpose(0, 2, 3, 4, 1)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"seed {seed}")
        assert orders_seen == {True, False}, \
            "both flip/rot90 orderings must occur"
