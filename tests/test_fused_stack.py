"""Fused conv->bn->relu->conv->bn->relu chain vs the unfused reference
math (lax conv + explicit BatchNorm), interpret mode on CPU: forward
values, batch statistics, running-stat updates, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dram_tpu.core.pallas.fused_stack import fused_cbr2, fused_stack_supported


def _ref_chain(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1, train,
               eps=1e-5, momentum=0.9):
    """Literal unfused math (flax BatchNorm semantics, f32)."""
    def conv(a, w):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def bn(a, g, b, m, v):
        if train:
            mean = jnp.mean(a, axis=(0, 1, 2, 3))
            var = jnp.mean(a * a, axis=(0, 1, 2, 3)) - mean * mean
        else:
            mean, var = m, v
        y = (a - mean) * jax.lax.rsqrt(var + eps) * g + b
        return jax.nn.relu(y), mean, var

    h0 = conv(x, w0)
    a0, mean0, var0 = bn(h0, g0, b0, m0, v0)
    h1 = conv(a0, w1)
    a1, mean1, var1 = bn(h1, g1, b1, m1, v1)
    if train:
        upd = tuple(momentum * r + (1 - momentum) * s
                    for r, s in ((m0, mean0), (v0, var0),
                                 (m1, mean1), (v1, var1)))
    else:
        upd = (m0, v0, m1, v1)
    return a1, upd


def _inputs(rng, B=2, D=4, H=4, W=8, Ci=8, C0=16, C1=8):
    x = rng.normal(size=(B, D, H, W, Ci)).astype(np.float32)
    w0 = (rng.normal(size=(3, 3, 3, Ci, C0)) * 0.1).astype(np.float32)
    w1 = (rng.normal(size=(3, 3, 3, C0, C1)) * 0.1).astype(np.float32)
    g0 = rng.uniform(0.5, 1.5, C0).astype(np.float32)
    b0 = rng.normal(size=C0).astype(np.float32) * 0.1
    g1 = rng.uniform(0.5, 1.5, C1).astype(np.float32)
    b1 = rng.normal(size=C1).astype(np.float32) * 0.1
    m0 = rng.normal(size=C0).astype(np.float32) * 0.05
    v0 = rng.uniform(0.5, 1.5, C0).astype(np.float32)
    m1 = rng.normal(size=C1).astype(np.float32) * 0.05
    v1 = rng.uniform(0.5, 1.5, C1).astype(np.float32)
    return tuple(jnp.asarray(a)
                 for a in (x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1))


class TestFusedForward:
    @pytest.mark.parametrize("train", [True, False])
    def test_matches_unfused(self, rng, train):
        x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1 = _inputs(rng)
        y, upd = fused_cbr2(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                            train=train, interpret=True)
        y_ref, upd_ref = _ref_chain(x, w0, g0, b0, m0, v0, w1, g1, b1,
                                    m1, v1, train)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=1e-4)
        for a, b, name in zip(upd, upd_ref,
                              ("m0", "v0", "m1", "v1")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4,
                                       err_msg=f"running stat {name}")

    def test_lane_padded_plane(self, rng):
        """H*W not a multiple of 128 exercises the lane-pad masking."""
        x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1 = _inputs(
            rng, D=4, H=4, W=10)  # 40 lanes -> pad 88 >= W+1
        y, upd = fused_cbr2(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                            train=True, interpret=True)
        y_ref, upd_ref = _ref_chain(x, w0, g0, b0, m0, v0, w1, g1, b1,
                                    m1, v1, True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=1e-4)
        for a, b in zip(upd, upd_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_single_z_block(self, rng):
        """D small enough for one z block (first==last DMA branch)."""
        x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1 = _inputs(rng, D=2)
        y, _ = fused_cbr2(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                          train=True, interpret=True)
        y_ref, _ = _ref_chain(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                              True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=1e-4)


class TestFusedGrads:
    @pytest.mark.parametrize("train", [True, False])
    def test_grads_match_unfused(self, rng, train):
        x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1 = _inputs(rng)
        cot = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 8)).astype(np.float32))

        def loss_fused(x, w0, g0, b0, w1, g1, b1):
            y, _ = fused_cbr2(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                              train=train, interpret=True)
            return jnp.sum(y * cot)

        def loss_ref(x, w0, g0, b0, w1, g1, b1):
            y, _ = _ref_chain(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                              train)
            return jnp.sum(y * cot)

        args = (x, w0, g0, b0, w1, g1, b1)
        l1 = float(loss_fused(*args))
        l2 = float(loss_ref(*args))
        assert l1 == pytest.approx(l2, rel=1e-4, abs=1e-4)
        gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        names = ("x", "w0", "g0", "b0", "w1", "g1", "b1")
        for a, b, nm in zip(gf, gr, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"grad {nm} ({train=})")


class TestFirstXlaChain:
    """Partial fusion (conv_0 via XLA — the Ci=1 input stack)."""

    @pytest.mark.parametrize("train", [True, False])
    def test_forward_and_grads(self, rng, train):
        from dram_tpu.core.pallas.fused_stack import fused_cbr2_first_xla
        x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1 = _inputs(rng, Ci=1)
        y, upd = fused_cbr2_first_xla(x, w0, g0, b0, m0, v0, w1, g1, b1,
                                      m1, v1, train=train, interpret=True)
        y_ref, upd_ref = _ref_chain(x, w0, g0, b0, m0, v0, w1, g1, b1,
                                    m1, v1, train)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=1e-4)
        for a, b in zip(upd, upd_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

        cot = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))

        def lf(x, w0, g0, b0, w1, g1, b1):
            yy, _ = fused_cbr2_first_xla(x, w0, g0, b0, m0, v0, w1, g1, b1,
                                         m1, v1, train=train, interpret=True)
            return jnp.sum(yy * cot)

        def lr(x, w0, g0, b0, w1, g1, b1):
            yy, _ = _ref_chain(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                               train)
            return jnp.sum(yy * cot)

        args = (x, w0, g0, b0, w1, g1, b1)
        gf = jax.grad(lf, argnums=tuple(range(7)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
        for a, b, nm in zip(gf, gr, ("x", "w0", "g0", "b0", "w1", "g1",
                                     "b1")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"grad {nm}")


class TestModuleIntegration:
    CFG = dict(n_layers=2,
               in_ch_list=(1, 8, 16, 48, 24),
               base_ch_list=(8, 8, 16, 16, 8),
               end_ch_list=(8, 16, 32, 16, 8),
               padding_list=((1, 1),) * 5,
               checkpoint_layers=(0, 0, 0, 0, 0),
               kernel_sizes=[(3, 3)] * 5,
               stacking=2, dropout=0.0, out_ch=1)

    def _models(self):
        from dram_tpu.models import DC3D
        ref = DC3D(**self.CFG, train=True)
        fused = DC3D(**self.CFG, train=True, use_fused_stack=True,
                     fused_interpret=True)
        return ref, fused

    def test_identical_tree_and_train_step(self, rng):
        """Fused DC3D shares the unfused parameter/stat tree exactly, and
        one train-mode apply matches outputs + batch-stat updates."""
        ref, fused = self._models()
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1))
                        .astype(np.float32))
        v1 = ref.init(jax.random.PRNGKey(0), x)
        v2 = fused.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v1) == \
            jax.tree_util.tree_structure(v2)

        (y1, _), mut1 = ref.apply(v1, x, mutable=["batch_stats"])
        (y2, _), mut2 = fused.apply(v1, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=5e-4, rtol=5e-4)
        flat1 = jax.tree_util.tree_leaves_with_path(mut1)
        flat2dict = {jax.tree_util.keystr(p): l for p, l in
                     jax.tree_util.tree_leaves_with_path(mut2)}
        for p, l in flat1:
            np.testing.assert_allclose(
                np.asarray(l), np.asarray(flat2dict[jax.tree_util.keystr(p)]),
                atol=1e-4, rtol=1e-4, err_msg=f"batch stat {p}")

    def test_grads_match(self, rng):
        ref, fused = self._models()
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1))
                        .astype(np.float32))
        v = ref.init(jax.random.PRNGKey(0), x)

        def loss(model, params):
            (y, _), _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, mutable=["batch_stats"])
            return jnp.sum(y * y)

        g1 = jax.grad(lambda p: loss(ref, p))(v["params"])
        g2 = jax.grad(lambda p: loss(fused, p))(v["params"])
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"grad {p}")


needs_devices = pytest.mark.skipif(jax.device_count() < 8,
                                   reason="needs 8 fake devices")


@needs_devices
class TestFusedDPExact:
    """VERDICT r2 item 4: the fused chain must be DP-exact — under
    shard_map data parallelism its BatchNorm psums the epilogue stats
    over the batch axis, so loss, gradients AND running-stat updates
    match the single-device (global batch) run bit-for-tolerance."""

    def _check(self, rng, chain_fn, Ci):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1 = _inputs(
            rng, B=8, D=2, H=4, W=8, Ci=Ci)
        cot = jnp.asarray(rng.normal(size=(8, 2, 4, 8, 8))
                          .astype(np.float32))
        params = (w0, g0, b0, w1, g1, b1)

        def make_loss(axis_name):
            def loss(params, xb, cb):
                w0, g0, b0, w1, g1, b1 = params
                y, upd = chain_fn(xb, w0, g0, b0, m0, v0, w1, g1, b1,
                                  m1, v1, train=True, interpret=True,
                                  axis_name=axis_name)
                l = jnp.sum(y * cb)
                if axis_name is not None:
                    l = jax.lax.psum(l, axis_name)
                return l, upd
            return loss

        # oracle: single-device unfused math over the GLOBAL batch
        def ref_loss(params, xb, cb):
            w0, g0, b0, w1, g1, b1 = params
            y, upd = _ref_chain(xb, w0, g0, b0, m0, v0, w1, g1, b1,
                                m1, v1, True)
            return jnp.sum(y * cb), upd

        (l1, upd1), g1s = jax.value_and_grad(
            ref_loss, has_aux=True)(params, x, cot)

        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

        def dp_step(params, xb, cb):
            (l, upd), gs = jax.value_and_grad(
                make_loss("data"), has_aux=True)(params, xb, cb)
            # psum transposes to psum: the psum'd loss hands each shard
            # N x its local grad contribution, so the pmean (the trainer
            # does the same once per step) is exactly the global gradient
            gs = jax.lax.pmean(gs, "data")
            return l, upd, gs

        # check_vma=False: Pallas calls don't carry vma metadata (the
        # trainer's shard_map step sets the same)
        f = shard_map(dp_step, mesh=mesh,
                      in_specs=(P(), P("data"), P("data")),
                      out_specs=(P(), P(), P()), check_vma=False)
        l8, upd8, g8s = f(params, x, cot)

        assert float(l8) == pytest.approx(float(l1), rel=1e-4, abs=1e-4)
        for a, b, nm in zip(upd8, upd1, ("m0", "v0", "m1", "v1")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4,
                                       err_msg=f"DP running stat {nm}")
        for a, b, nm in zip(g8s, g1s, ("w0", "g0", "b0", "w1", "g1", "b1")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"DP grad {nm}")

    def test_fused_cbr2_dp_exact(self, rng):
        self._check(rng, fused_cbr2, Ci=8)

    def test_first_xla_chain_dp_exact(self, rng):
        from dram_tpu.core.pallas.fused_stack import fused_cbr2_first_xla
        self._check(rng, fused_cbr2_first_xla, Ci=1)


def test_supported_predicate():
    assert fused_stack_supported((2, 8, 80, 80, 64), (64, 64), [3, 3],
                                 [1, 1], [1, 1], "bn", "relu", 0.0)
    assert not fused_stack_supported((2, 8, 80, 80, 64), (64, 64), [3, 3],
                                     [1, 1], [1, 1], "ln", "relu", 0.0)
    assert not fused_stack_supported((2, 8, 80, 80, 64), (64,), [3],
                                     [1], [1], "bn", "relu", 0.0)
    assert not fused_stack_supported((2, 8, 80, 80, 64), (64, 64), [3, 3],
                                     [1, 1], [1, 1], "bn", "relu", 0.1)


class TestVirtualConcat:
    """fused_cbr2 on a tuple of CM parts (virtual channel concat — the
    decoder's upsample+skip) must match the chain on the materialized
    concat, forward and backward, with dx returned as the split parts."""

    @pytest.mark.parametrize("train", [True, False])
    def test_matches_materialized_concat(self, rng, train):
        from dram_tpu.core.pallas.cm import to_cm_t, concat_cm, from_cm
        B, D, H, W = 2, 4, 4, 8
        C_up, C_skip = 16, 8
        Ci = C_up + C_skip
        _, _, g0, b0, m0, v0, _, g1, b1, m1, v1 = _inputs(
            rng, B=B, D=D, H=H, W=W, Ci=Ci, C0=16, C1=8)
        w0 = jnp.asarray((rng.normal(size=(3, 3, 3, Ci, 16)) * 0.1)
                         .astype(np.float32))
        w1 = jnp.asarray((rng.normal(size=(3, 3, 3, 16, 8)) * 0.1)
                         .astype(np.float32))
        up = jnp.asarray(rng.normal(size=(B, D, H, W, C_up))
                         .astype(np.float32))
        skip = jnp.asarray(rng.normal(size=(B, D, H, W, C_skip))
                           .astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(B, D, H, W, 8))
                          .astype(np.float32))

        def loss_virtual(up, skip, w0, g0, b0, w1, g1, b1):
            xs = (to_cm_t(up), to_cm_t(skip))
            y, _ = fused_cbr2(xs, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                              train=train, interpret=True, cm_out=True)
            return jnp.sum(from_cm(y.data, H, W) * cot)

        def loss_concat(up, skip, w0, g0, b0, w1, g1, b1):
            xc = concat_cm([to_cm_t(up), to_cm_t(skip)])
            y, _ = fused_cbr2(xc, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                              train=train, interpret=True, cm_out=True)
            return jnp.sum(from_cm(y.data, H, W) * cot)

        args = (up, skip, w0, g0, b0, w1, g1, b1)
        lv, lc = float(loss_virtual(*args)), float(loss_concat(*args))
        assert lv == pytest.approx(lc, rel=1e-4, abs=1e-4)
        gv = jax.grad(loss_virtual, argnums=tuple(range(8)))(*args)
        gc = jax.grad(loss_concat, argnums=tuple(range(8)))(*args)
        for a, b, nm in zip(gv, gc, ("up", "skip", "w0", "g0", "b0",
                                     "w1", "g1", "b1")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"virtual-concat grad {nm} "
                                               f"({train=})")

    def test_convstack_tuple_input_module(self, rng):
        """ConvStack takes a tuple of CMs on both the fused and the
        fallback (materialized) path with identical results."""
        from dram_tpu.core.pallas.cm import to_cm_t, concat_cm
        from dram_tpu.models.blocks import ConvStack
        B, D, H, W = 1, 4, 4, 8
        up = jnp.asarray(rng.normal(size=(B, D, H, W, 16))
                         .astype(np.float32))
        skip = jnp.asarray(rng.normal(size=(B, D, H, W, 8))
                           .astype(np.float32))
        xs = (to_cm_t(up), to_cm_t(skip))

        def run(use_fused, x):
            m = ConvStack([16, 8], [3, 3], [1, 1], [1, 1], False,
                          "bn", "relu", 0.0, train=False,
                          use_fused_stack=use_fused,
                          fused_interpret=True, cm_out=use_fused)
            v = m.init(jax.random.PRNGKey(0), x)
            return m.apply(v, x), v

        y_f, v_f = run(True, xs)
        y_u, v_u = run(False, concat_cm(list(xs)))
        assert jax.tree_util.tree_structure(v_f) \
            == jax.tree_util.tree_structure(v_u)
        from dram_tpu.core.pallas.cm import as_ndhwc
        np.testing.assert_allclose(np.asarray(as_ndhwc(y_f)),
                                   np.asarray(y_u), atol=2e-3, rtol=2e-3)
