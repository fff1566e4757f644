"""cm-layout residency ops (core/pallas/cm.py) vs their NDHWC twins, and
the CM-aware modules (Conv1x1, the fused DC3DATGeneric) vs the unfused
reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dram_tpu.core.pallas.cm import (CM, as_ndhwc, concat_cm, conv1x1_cm,
                                     from_cm, maxpool2_cm, resize_cm, to_cm,
                                     to_cm_t, upsample2x_cm)
from dram_tpu.core.resample import resize3d


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


class TestLayout:
    def test_round_trip(self, rng):
        x = _rand(rng, (2, 4, 5, 10, 7))
        cm = to_cm_t(x)
        assert cm.logical_shape == x.shape
        np.testing.assert_array_equal(np.asarray(as_ndhwc(cm)),
                                      np.asarray(x))

    def test_pytree(self, rng):
        x = to_cm_t(_rand(rng, (1, 2, 3, 4, 5)))
        y = jax.tree_util.tree_map(lambda a: a * 2, x)
        assert isinstance(y, CM) and (y.H, y.W) == (x.H, x.W)
        # static (H, W) survives jit tracing
        out = jax.jit(lambda c: as_ndhwc(c))(x)
        assert out.shape == x.logical_shape


class TestBoundaryOps:
    def test_maxpool2(self, rng):
        import flax.linen as nn
        x = _rand(rng, (2, 4, 6, 10, 5))
        want = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        got = as_ndhwc(maxpool2_cm(to_cm_t(x)))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_maxpool2_grad(self, rng):
        x = _rand(rng, (1, 2, 4, 4, 3))
        import flax.linen as nn

        def f_cm(a):
            return jnp.sum(as_ndhwc(maxpool2_cm(to_cm_t(a))) ** 2)

        def f_nd(a):
            return jnp.sum(nn.max_pool(a, (2, 2, 2), (2, 2, 2)) ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(f_cm)(x)),
                                   np.asarray(jax.grad(f_nd)(x)),
                                   atol=1e-6)

    @pytest.mark.parametrize("shape", [
        (1, 4, 16, 16, 6),    # lane-exact plane (M == H*W == 256)
        (1, 4, 10, 14, 5),    # lane-padded plane (140 -> 256)
        (2, 6, 6, 64, 3),     # W-dominant plane
    ])
    def test_maxpool2_flat_pallas_matches_xla(self, rng, shape):
        """Flat-layout Pallas pool kernel (interpret) == maxpool2_cm
        forward AND gradient, including the even tie-split (duplicate
        values in a window, common after ReLU zeros) and zero pad lanes
        of both the output and dx."""
        from dram_tpu.core.pallas.pool import maxpool2_flat
        B, D, H, W, C = shape
        x = _rand(rng, (B, D, H, W, C))
        # force ties inside pooling windows
        x = x.at[:, :, ::2].set(x[:, :, 1::2])
        cm = to_cm_t(x)

        def f_pallas(data):
            out = maxpool2_flat(data, H, W, True)
            return as_ndhwc(CM(out, H // 2, W // 2))

        def f_xla(data):
            return as_ndhwc(maxpool2_cm(CM(data, H, W), use_pallas=False))

        out_p = maxpool2_flat(cm.data, H, W, True)
        np.testing.assert_array_equal(
            np.asarray(as_ndhwc(CM(out_p, H // 2, W // 2))),
            np.asarray(f_xla(cm.data)))
        # pad lanes of the pooled output are zero (cm contract)
        hw2 = (H // 2) * (W // 2)
        np.testing.assert_array_equal(np.asarray(out_p[..., hw2:]), 0.0)
        # cotangent with garbage in its pad lanes: dx must ignore it
        cot = jnp.asarray(rng.normal(size=out_p.shape).astype(np.float32))
        g_p = jax.grad(
            lambda d: jnp.sum(maxpool2_flat(d, H, W, True) * cot))(cm.data)
        g_x = jax.grad(
            lambda d: jnp.sum(
                maxpool2_cm(CM(d, H, W), use_pallas=False).data * cot)
        )(cm.data)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(g_p[..., H * W:]), 0.0)

    @pytest.mark.parametrize("out_dhw", [(8, 12, 20), (3, 4, 5), (4, 6, 10)])
    def test_resize(self, rng, out_dhw):
        x = _rand(rng, (2, 4, 6, 10, 3))
        want = resize3d(x, out_dhw, method="trilinear", align_corners=True)
        got = as_ndhwc(resize_cm(to_cm_t(x), out_dhw))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_upsample2x(self, rng):
        x = _rand(rng, (1, 3, 4, 6, 2))
        want = resize3d(x, (6, 8, 12), method="trilinear",
                        align_corners=True)
        got = as_ndhwc(upsample2x_cm(to_cm_t(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_concat(self, rng):
        a = _rand(rng, (1, 2, 4, 6, 3))
        b = _rand(rng, (1, 2, 4, 6, 5))
        got = as_ndhwc(concat_cm([to_cm_t(a), to_cm_t(b)]))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.concatenate([a, b], axis=-1)))

    def test_pad_lanes_zero(self, rng):
        """Produced cm arrays keep to_cm's zero-pad-lane contract."""
        x = _rand(rng, (1, 2, 4, 10, 3))  # H*W=40 -> padded lanes
        for cm in (maxpool2_cm(to_cm_t(x)),
                   resize_cm(to_cm_t(x), (2, 4, 10)),
                   upsample2x_cm(to_cm_t(x))):
            pad = np.asarray(cm.data[..., cm.H * cm.W:])
            np.testing.assert_array_equal(pad, np.zeros_like(pad))

    def test_consumers_defend_against_poisoned_pad_lanes(self, rng):
        """Defend-on-read contract (cm.py module docstring): conv outputs
        may carry garbage in pad lanes, so every cm consumer must mask or
        slice before reducing over the full M axis. Poison the pad lanes
        with a 1e30 sentinel and assert each boundary op reproduces the
        clean result exactly — an unmasked full-M reduction would blow up
        loudly instead of silently passing on zeros (ADVICE r4)."""
        import flax.linen as nn
        from dram_tpu.core.pallas.cm import conv1x1_cm, poison_pad_lanes
        x = _rand(rng, (1, 2, 4, 10, 3))  # H*W=40 -> padded lanes
        clean = to_cm_t(x)
        poisoned = poison_pad_lanes(clean)
        assert np.isfinite(np.asarray(poisoned.data)).all() is not True \
            or np.asarray(poisoned.data[..., clean.H * clean.W:]).max() \
            >= 1e29  # the sentinel actually landed
        kernel = jnp.asarray(
            np.random.default_rng(7).normal(size=(1, 1, 1, 3, 5)),
            jnp.float32)
        bias = jnp.zeros((5,), jnp.float32)
        pairs = [
            (lambda c: as_ndhwc(c), "exit"),
            (lambda c: as_ndhwc(maxpool2_cm(c)), "pool"),
            (lambda c: as_ndhwc(resize_cm(c, (2, 4, 10))), "resize"),
            (lambda c: as_ndhwc(upsample2x_cm(c)), "up2"),
            (lambda c: as_ndhwc(conv1x1_cm(c, kernel, bias, jnp.float32)),
             "conv1x1"),
        ]
        for fn, name in pairs:
            np.testing.assert_array_equal(
                np.asarray(fn(poisoned)), np.asarray(fn(clean)),
                err_msg=f"{name} read poisoned pad lanes")


class TestUp2DepthGate:
    def test_oversized_rows_route_to_einsum(self, monkeypatch):
        """up2_depth_supported must reject (C, M) rows whose bd=1 working
        set exceeds the 56 MB VMEM budget (ADVICE r4: _pick_block only
        shrinks the block, never rejects, so an oversized row used to
        compile against the 100 MB vmem_limit and fail at RUNTIME)."""
        from dram_tpu.core.pallas import upsample as up
        monkeypatch.setattr(up.jax, "default_backend", lambda: "tpu")
        # normal training shape: C=64, M=80*80 lane-padded -> ~1.6 MB rows
        assert up.up2_depth_supported((5, 40, 64, 6400), 4)
        # pathological row: 10x over budget at bd=1
        assert not up.up2_depth_supported((1, 4, 2048, 32768), 4)
        # bf16 halves the row bytes; boundary case stays consistent
        assert up.up2_depth_supported((1, 4, 512, 4096), 2)


class TestConv1x1:
    def test_matches_nn_conv(self, rng):
        import flax.linen as nn
        from dram_tpu.models.blocks import Conv1x1
        x = _rand(rng, (2, 3, 4, 6, 5))
        ref = nn.Conv(7, kernel_size=(1, 1, 1), padding="VALID",
                      use_bias=True)
        new = Conv1x1(7, use_bias=True)
        v = ref.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == \
            jax.tree_util.tree_structure(new.init(jax.random.PRNGKey(0), x))
        want = ref.apply(v, x)
        np.testing.assert_allclose(np.asarray(new.apply(v, x)),
                                   np.asarray(want), atol=1e-5, rtol=1e-5)
        got_cm = new.apply(v, to_cm_t(x))
        np.testing.assert_allclose(np.asarray(as_ndhwc(got_cm)),
                                   np.asarray(want), atol=1e-5, rtol=1e-5)


class TestFusedAttModel:
    """DC3DATGeneric with the fused cm-resident stack (interpret mode)
    matches the unfused model: forward heads and parameter gradients."""

    CFG = dict(n_layers=2,
               in_ch_list=(1, 8, 16, 48, 24),
               base_ch_list=(8, 8, 16, 16, 8),
               end_ch_list=(8, 16, 32, 16, 8),
               padding_list=((1, 1),) * 5,
               checkpoint_layers=(0, 1, 0, 0, 0),
               kernel_sizes=[(3, 3)] * 5,
               stacking=2, dropout=0.0, out_ch=1,
               at_spatial_size=(6, 6, 6), at_layers=(-1, 0, 1),
               at_f_dim=4, at_g_dim=4,
               at_merge_type="scaled_dot_product_relu")

    def test_forward_and_grads_match(self, rng):
        from dram_tpu.models import DC3DATGeneric
        ref = DC3DATGeneric(**self.CFG, train=True)
        fused = DC3DATGeneric(**self.CFG, train=True, use_fused_stack=True,
                              fused_interpret=True)
        x = _rand(rng, (2, 8, 8, 8, 1))
        v = ref.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            fused.init(jax.random.PRNGKey(0), x))

        def loss(model, params):
            (dense, refined), _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, mutable=["batch_stats"])
            return jnp.sum(dense ** 2) + jnp.sum(refined ** 2)

        (y1, r1), _ = ref.apply(v, x, mutable=["batch_stats"])
        (y2, r2), _ = fused.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   atol=1e-3, rtol=1e-3)

        g1 = jax.grad(lambda p: loss(ref, p))(v["params"])
        g2 = jax.grad(lambda p: loss(fused, p))(v["params"])
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"grad {p}")


class TestMaxpoolFlatTies:
    """Tie semantics of the flat Pallas pool on ReLU-like data (many
    exact duplicates) match jnp reduce-max exactly."""

    def test_relu_zero_ties(self, rng):
        from dram_tpu.core.pallas.pool import maxpool2_flat
        B, D, H, W, C = 2, 4, 8, 16, 3
        xn = rng.normal(size=(B, D, H, W, C)).astype(np.float32)
        xn[xn < 0] = 0.0  # ReLU-like zeros: many tied windows
        x = jnp.asarray(xn)
        cm = to_cm_t(x)

        def ref(d):
            return maxpool2_cm(CM(d, H, W), use_pallas=False).data

        def fast(d):
            return maxpool2_flat(d, H, W, True)

        np.testing.assert_array_equal(np.asarray(fast(cm.data)),
                                      np.asarray(ref(cm.data)))
        cot = jnp.asarray(rng.normal(
            size=ref(cm.data).shape).astype(np.float32))
        g1 = jax.grad(lambda d: jnp.sum(fast(d) * cot))(cm.data)
        g2 = jax.grad(lambda d: jnp.sum(ref(d) * cot))(cm.data)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-6)


class TestUp2DepthPallas:
    """The Pallas depth-2x row-lerp kernel (interpret mode) matches the
    einsum formulation exactly — same align-corners weight table, f32
    lerp (reference nn.Upsample align_corners depth axis)."""

    def test_fwd_and_vjp_match_einsum(self, rng):
        from dram_tpu.core.pallas.cm import _up2_depth_einsum
        from dram_tpu.core.pallas.upsample import up2_depth_flat
        for B, D, C, M in ((2, 10, 3, 128), (1, 7, 2, 128)):
            x = jnp.asarray(rng.normal(size=(B, D, C, M)).astype(np.float32))
            ref = _up2_depth_einsum(x, D)
            got = up2_depth_flat(x, True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)
            ct = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
            _, vr = jax.vjp(lambda v: _up2_depth_einsum(v, D), x)
            _, vg = jax.vjp(lambda v: up2_depth_flat(v, True), x)
            np.testing.assert_allclose(np.asarray(vg(ct)[0]),
                                       np.asarray(vr(ct)[0]),
                                       atol=1e-5, rtol=1e-5)
