"""Pallas fused conv3d kernels (interpret mode) vs jax.lax conv oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dram_tpu.core.pallas.conv3d import conv3d_pallas, supported


def conv3d_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class TestConvForward:
    @pytest.mark.parametrize("shape,ci,co", [
        ((4, 4, 8), 3, 5),     # narrow: patch variant
        ((6, 2, 4), 1, 4),     # single input channel (first layer)
        ((4, 4, 4), 130, 6),   # wide: offset-loop variant
        ((4, 40, 40), 8, 8),   # lane-padded plane (1600 -> 1664, pad 64)
    ])
    def test_matches_xla(self, shape, ci, co, rng):
        x = jnp.asarray(rng.normal(size=(2, *shape, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co))
                        .astype(np.float32) * 0.1)
        got = conv3d_pallas(x, w, True)
        want = conv3d_xla(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_boundary_zero_padding(self, rng):
        """SAME zero padding at all 6 faces (the roll masks + z pad)."""
        x = jnp.asarray(np.ones((1, 3, 3, 3, 2), np.float32))
        w = jnp.asarray(np.ones((3, 3, 3, 2, 1), np.float32))
        got = np.asarray(conv3d_pallas(x, w, True))[0, ..., 0]
        want = np.asarray(conv3d_xla(x, w))[0, ..., 0]
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert got[1, 1, 1] == pytest.approx(54.0)   # full 27-stencil * 2ch
        assert got[0, 0, 0] == pytest.approx(16.0)   # corner: 8 voxels * 2

    def test_bf16_inputs(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 4))
                        .astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 8))
                        .astype(np.float32) * 0.1).astype(jnp.bfloat16)
        got = conv3d_pallas(x, w, True)
        assert got.dtype == jnp.bfloat16
        want = conv3d_xla(x, w)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.05, rtol=0.05)


class TestConvVJP:
    @pytest.mark.parametrize("shape,ci,co", [
        ((4, 4, 8), 3, 5),
        ((4, 4, 4), 130, 6),
        ((4, 40, 40), 8, 8),   # lane-padded plane
    ])
    def test_grads_match_xla(self, shape, ci, co, rng):
        x = jnp.asarray(rng.normal(size=(2, *shape, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co))
                        .astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.normal(size=(2, *shape, co))
                          .astype(np.float32))

        def loss_p(x, w):
            return jnp.sum(conv3d_pallas(x, w, True) * cot)

        def loss_x(x, w):
            return jnp.sum(conv3d_xla(x, w) * cot)

        assert float(loss_p(x, w)) == pytest.approx(float(loss_x(x, w)),
                                                    rel=1e-4)
        gp = jax.grad(loss_p, argnums=(0, 1))(x, w)
        gx = jax.grad(loss_x, argnums=(0, 1))(x, w)
        for a, b, name in zip(gp, gx, ("dx", "dw")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=1e-3,
                                       err_msg=f"grad {name}")


class TestSupported:
    def test_gating(self):
        assert supported((1, 80, 80, 80, 32), (3, 3, 3), (1, 1, 1), "SAME")
        assert supported((1, 80, 80, 80, 32), (3, 3, 3), (1, 1, 1),
                         ((1, 1), (1, 1), (1, 1)))
        # lane-padded planes: 40^2 (pad 64 >= 41) and 20^2 (pad 112 >= 21)
        # are covered; a pad smaller than W+1 is not (127^2: pad 127 < 128)
        assert supported((1, 40, 40, 40, 64), (3, 3, 3), (1, 1, 1),
                         "SAME")
        assert supported((1, 20, 20, 20, 128), (3, 3, 3), (1, 1, 1),
                         "SAME")
        assert not supported((1, 127, 127, 127, 32), (3, 3, 3), (1, 1, 1),
                             "SAME")
        assert not supported((1, 80, 80, 80, 32), (5, 5, 5), (1, 1, 1),
                             "SAME")
        assert not supported((1, 80, 80, 80, 32), (3, 3, 3), (2, 2, 2),
                             "SAME")
