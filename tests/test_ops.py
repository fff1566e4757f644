"""Unit tests for core device ops against NumPy/torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dram_tpu.core import ops


def _otsu_reference(values_u8):
    """Literal reimplementation of skimage.filters.threshold_otsu for uint8
    data (histogram over the observed integer range), used as the oracle."""
    values_u8 = np.asarray(values_u8).astype(np.uint8).ravel()
    vmin, vmax = int(values_u8.min()), int(values_u8.max())
    bin_centers = np.arange(vmin, vmax + 1)
    counts = np.bincount(values_u8 - vmin, minlength=vmax - vmin + 1).astype(np.float64)
    weight1 = np.cumsum(counts)
    weight2 = np.cumsum(counts[::-1])[::-1]
    mean1 = np.cumsum(counts * bin_centers) / weight1
    mean2 = (np.cumsum((counts * bin_centers)[::-1]) / weight2[::-1])[::-1]
    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    return bin_centers[:-1][np.argmax(variance12)]


class TestWindowing:
    def test_basic_span(self):
        x = np.array([-2000.0, -1000.0, -650.0, -300.0, 500.0])
        y = np.asarray(ops.windowing(jnp.asarray(x), (-1000, -300), (0, 1)))
        np.testing.assert_allclose(y, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)

    def test_matches_numpy_twin(self, rng):
        x = rng.normal(size=(13, 11)).astype(np.float32) * 500
        a = np.asarray(ops.windowing(jnp.asarray(x), (-1000, 400), (0, 255)))
        b = ops.windowing_np(x, (-1000, 400), (0, 255))
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_from_span_none_uses_minmax(self, rng):
        x = rng.normal(size=(9, 9)).astype(np.float32)
        y = np.asarray(ops.windowing(jnp.asarray(x), None, (0, 255)))
        assert y.min() == pytest.approx(0.0, abs=1e-4)
        assert y.max() == pytest.approx(255.0, abs=1e-3)


class TestOtsu:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_skimage_algorithm(self, seed):
        rng = np.random.default_rng(seed)
        # bimodal uint8 data like a windowed CAM
        a = rng.normal(60, 12, size=4000)
        b = rng.normal(180, 20, size=2500)
        vals = np.clip(np.concatenate([a, b]), 0, 255)
        got = float(ops.otsu_threshold_u8(jnp.asarray(vals.astype(np.float32))))
        want = _otsu_reference(np.floor(vals))
        assert got == pytest.approx(want)

    def test_masked(self):
        rng = np.random.default_rng(5)
        vals = np.clip(np.concatenate([rng.normal(50, 10, 3000),
                                       rng.normal(200, 15, 3000)]), 0, 255)
        mask = np.zeros_like(vals, bool)
        mask[: len(vals) // 2] = True  # only the low mode
        got = float(ops.otsu_threshold_u8(jnp.asarray(vals.astype(np.float32)),
                                          jnp.asarray(mask)))
        want = _otsu_reference(np.floor(vals[mask]))
        assert got == pytest.approx(want)

    def test_single_color(self):
        vals = np.full((100,), 37.0, np.float32)
        got = float(ops.otsu_threshold_u8(jnp.asarray(vals)))
        assert got == 37.0

    @pytest.mark.parametrize("n", [1, 127, 128, 4096, 100_003])
    def test_histogram256_mxu_matches_bincount(self, n):
        # the TPU path of otsu_threshold_u8 (scatter-free MXU one-hot
        # histogram); exercised directly since the suite runs on CPU
        rng = np.random.default_rng(n)
        v = rng.integers(0, 256, size=n).astype(np.int32)
        m = rng.random(n) < 0.6
        got = np.asarray(ops.histogram256_mxu(jnp.asarray(v),
                                              jnp.asarray(m)))
        want = np.bincount(v[m], minlength=256).astype(np.float32)
        assert np.array_equal(got, want)

    def test_binary_cam_threshold_scaler(self):
        rng = np.random.default_rng(7)
        probs = np.clip(np.concatenate([rng.normal(0.2, 0.05, 4000),
                                        rng.normal(0.8, 0.1, 1000)]), 0, 1)
        th = float(ops.binary_cam_threshold(jnp.asarray(probs.astype(np.float32))))
        want_u8 = _otsu_reference(np.floor(np.clip(probs, 0, 1) * 255))
        assert th == pytest.approx(want_u8 / 255.0)
        th2 = float(ops.binary_cam_threshold(jnp.asarray(probs.astype(np.float32)),
                                             scaler=0.75))
        assert th2 == pytest.approx(0.75 * want_u8 / 255.0)


class TestPooling:
    def test_masked_avg(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32))
        m = jnp.asarray((rng.random((2, 4, 4, 4, 1)) > 0.5).astype(np.float32))
        got = ops.pooling_dense_features(x, m)
        xm = np.asarray(x) * np.asarray(m)
        want = xm.sum(axis=(1, 2, 3)) / np.asarray(m).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_global_modes(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(ops.pooling_dense_features(x, None, "global_avg")),
                                   np.asarray(x).mean(axis=(1, 2, 3)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ops.pooling_dense_features(x, None, "global_max")),
                                   np.asarray(x).max(axis=(1, 2, 3)), rtol=1e-5)


class TestBBox:
    def test_find_crops_np_matches_scipy(self):
        from scipy import ndimage
        rng = np.random.default_rng(3)
        mask = np.zeros((30, 25, 20), np.uint8)
        mask[5:12, 8:20, 3:9] = 1
        spacing = (2.0, 0.7, 0.7)
        got = ops.find_crops_np(mask, spacing, border=5)
        sl = ndimage.find_objects(mask > 0)[0]
        import math
        want = tuple(slice(max(0, s.start - int(math.ceil(5 / sp))),
                           min(n, s.stop + int(math.ceil(5 / sp))))
                     for s, n, sp in zip(sl, mask.shape, spacing))
        assert got == want

    def test_masked_bbox_device(self):
        mask = np.zeros((16, 16, 16), np.uint8)
        mask[2:5, 7:9, 10:16] = 1
        starts, stops = ops.masked_bbox(jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(starts), [2, 7, 10])
        np.testing.assert_array_equal(np.asarray(stops), [5, 9, 16])


class TestStitch:
    def test_masked_scatter(self):
        full = jnp.zeros((10, 10, 10), jnp.float32)
        chunk = jnp.ones((4, 4, 4), jnp.float32) * 3
        mask = np.zeros((4, 4, 4), np.uint8)
        mask[1:3, 1:3, 1:3] = 1
        out = np.asarray(ops.stitch_masked(full, chunk, (2, 3, 4), jnp.asarray(mask)))
        want = np.zeros((10, 10, 10), np.float32)
        want[3:5, 4:6, 5:7] = 3
        np.testing.assert_array_equal(out, want)


class TestMetrics:
    def test_iou_dice(self):
        p = np.zeros((8, 8), np.uint8)
        t = np.zeros((8, 8), np.uint8)
        p[2:6, 2:6] = 1  # 16 px
        t[4:8, 4:8] = 1  # 16 px, overlap 4
        got_iou = float(ops.iou(jnp.asarray(p), jnp.asarray(t), 1e-5))
        got_dice = float(ops.dice(jnp.asarray(p), jnp.asarray(t), 1e-5))
        assert got_iou == pytest.approx((4 + 1e-5) / (28 + 1e-5))
        assert got_dice == pytest.approx((8 + 1e-5) / (32 + 1e-5))

    def test_tpr_fdr_inf(self):
        z = jnp.zeros((4, 4))
        assert np.isinf(float(ops.tpr(z, z)))
        assert np.isinf(float(ops.fdr(z, z)))
