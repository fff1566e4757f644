"""Model-layer tests: conv semantics vs torch, remat equivalence, BN modes,
init statistics, and full-config forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dram_tpu.models import DC3D, DC3DATGeneric
from dram_tpu.models.blocks import crop_concat


SMALL = dict(n_layers=2,
             in_ch_list=(1, 8, 16, 48, 24),
             base_ch_list=(4, 8, 16, 16, 8),
             end_ch_list=(8, 16, 32, 16, 8),
             padding_list=((1, 1),) * 5,
             checkpoint_layers=(0, 1, 1, 0, 1),
             kernel_sizes=[(3, 3)] * 5,
             stacking=2, dropout=0.0)

REF = dict(n_layers=3,
           in_ch_list=(1, 64, 128, 256, 768, 384, 192),
           base_ch_list=(32, 64, 128, 256, 256, 128, 64),
           end_ch_list=(64, 128, 256, 512, 256, 128, 64),
           padding_list=((1, 1),) * 7,
           checkpoint_layers=(0, 1, 0, 1, 0, 1, 0),
           kernel_sizes=[(3, 3)] * 7,
           stacking=3, dropout=0.0)


class TestConvSemantics:
    def test_flax_conv_matches_torch_conv3d(self, rng):
        """Channels-last flax conv == torch Conv3d with transposed weights."""
        import flax.linen as nn
        x = rng.normal(size=(2, 6, 6, 6, 3)).astype(np.float32)
        conv = nn.Conv(features=5, kernel_size=(3, 3, 3), padding=[(1, 1)] * 3)
        variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(conv.apply(variables, jnp.asarray(x)))

        tconv = torch.nn.Conv3d(3, 5, 3, padding=1)
        k = np.asarray(variables["params"]["kernel"])  # (kd,kh,kw,in,out)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(k.transpose(4, 3, 0, 1, 2)))
            tconv.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["bias"])))
            want = tconv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_crop_concat_centers(self, rng):
        t1 = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
        t2 = jnp.asarray(rng.normal(size=(1, 7, 6, 5, 3)).astype(np.float32))
        out = crop_concat(t1, t2)
        assert out.shape == (1, 4, 4, 4, 5)
        # ceil((7-4)/2)=2, ceil((6-4)/2)=1, ceil((5-4)/2)=1
        np.testing.assert_array_equal(np.asarray(out[..., 2:]),
                                      np.asarray(t2[:, 2:6, 1:5, 1:5, :]))


class TestDC3D:
    def test_forward_shapes_and_twin_output(self, rng):
        m = DC3D(**SMALL)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        (a, b), _ = m.apply(variables, x, mutable=["batch_stats"])
        assert a.shape == (2, 16, 16, 16, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_remat_mask_does_not_change_output(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
        m1 = DC3D(**SMALL)
        cfg0 = dict(SMALL, checkpoint_layers=(0,) * 5)
        m0 = DC3D(**cfg0)
        v = m1.init(jax.random.PRNGKey(0), x)
        (a, _), _ = m1.apply(v, x, mutable=["batch_stats"])
        (b, _), _ = m0.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_remat_gradients_match(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
        cfg = dict(SMALL, norm_method="ln")  # avoid BN mutability in grad fn
        m1 = DC3D(**cfg)
        m0 = DC3D(**dict(cfg, checkpoint_layers=(0,) * 5))
        v = m1.init(jax.random.PRNGKey(0), x)

        def loss(p, model):
            out, _ = model.apply({"params": p}, x)
            return jnp.sum(out ** 2)

        g1 = jax.grad(loss)(v["params"], m1)
        g0 = jax.grad(loss)(v["params"], m0)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_batchnorm_train_vs_eval(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 8, 8, 8, 1)).astype(np.float32) * 3)
        m_tr = DC3D(**SMALL, train=True)
        v = m_tr.init(jax.random.PRNGKey(0), x)
        # several train steps update running stats
        bs = v["batch_stats"]
        for _ in range(3):
            (_, _), mut = m_tr.apply({"params": v["params"], "batch_stats": bs},
                                     x, mutable=["batch_stats"])
            bs = mut["batch_stats"]
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(v["batch_stats"]), jax.tree.leaves(bs)))
        assert changed
        m_ev = DC3D(**SMALL, train=False)
        (e1, _) = m_ev.apply({"params": v["params"], "batch_stats": bs}, x)
        (e2, _) = m_ev.apply({"params": v["params"], "batch_stats": bs}, x)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_henorm_init_statistics(self):
        m = DC3D(**REF)
        x = jnp.zeros((1, 32, 32, 32, 1))
        v = m.init(jax.random.PRNGKey(0), x)
        k = np.asarray(v["params"]["ds_1"]["convs"]["conv_0"]["kernel"])
        fan_in = k.shape[0] * k.shape[1] * k.shape[2] * k.shape[3]
        want_std = np.sqrt(2.0 / fan_in)
        assert k.std() == pytest.approx(want_std, rel=0.1)

    def test_reference_config_shapes(self, rng):
        m = DC3D(**REF)
        x = jnp.asarray(rng.normal(size=(1, 80, 80, 80, 1)).astype(np.float32))
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        # parameter count of the conv stacks should match the reference plan
        top_kernel = v["params"]["top_layer"]["kernel"]
        assert top_kernel.shape == (1, 1, 1, 64, 1)
        # decoder block 2: in = end[3-skip]+up = 128+64 = 192, base = 64
        assert v["params"]["us_2"]["convs"]["conv_0"]["kernel"].shape == \
            (3, 3, 3, 192, 64)

    def test_masked_pooling_method(self, rng):
        m = DC3D(**SMALL)
        dense = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
        lungs = jnp.asarray((rng.random((2, 8, 8, 8, 1)) > 0.4).astype(np.float32))
        pooled = m.pooling_dense_features(dense, lungs)
        want = (np.asarray(dense) * np.asarray(lungs)).sum((1, 2, 3)) / \
            np.asarray(lungs).sum((1, 2, 3))
        np.testing.assert_allclose(np.asarray(pooled), want, rtol=1e-5)


class TestDC3DATGeneric:
    AT = dict(at_spatial_size=(8, 8, 8), at_layers=(-1, 0, 1), at_f_dim=4,
              at_g_dim=4, at_merge_type="scaled_dot_product_relu",
              at_self_loop=False, at_p_enc_dim=0, at_geo_f_dim=0, at_g_iter=1,
              at_k_size=3)

    def test_forward_two_heads(self, rng):
        m = DC3DATGeneric(**SMALL, **self.AT)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        (dense, refined), _ = m.apply(v, x, mutable=["batch_stats"])
        assert dense.shape == refined.shape == (2, 16, 16, 16, 1)
        assert not np.allclose(np.asarray(dense), np.asarray(refined))

    def test_taps_are_detached(self, rng):
        """Gradient of the refined head w.r.t. encoder convs flows only
        through the CAM path (reference detaches tapped features,
        models.py:563-565): the reshape heads' grads must not touch the
        backbone weights via the taps."""
        cfg = dict(SMALL, norm_method="ln")
        m = DC3DATGeneric(**cfg, **self.AT)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)

        def loss_refined_only(p):
            (dense, refined), _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                mutable=["batch_stats"])
            return jnp.sum(refined ** 2)

        g = jax.grad(loss_refined_only)(v["params"])
        # reshape heads DO get gradient (they are trained)
        gr = np.concatenate([np.asarray(t).ravel() for t in
                             jax.tree.leaves(g["reshape_0"])])
        assert np.abs(gr).max() > 0

    def test_reference_att_config_initializes(self):
        m = DC3DATGeneric(**REF, **dict(self.AT, at_spatial_size=(64, 64, 64)))
        x = jnp.zeros((1, 80, 80, 80, 1))
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        # 2 reshape heads for at_layers (-1,0,1): -1 is the raw input
        assert "reshape_0" in v["params"] and "reshape_1" in v["params"]
        assert "reshape_2" not in v["params"]
        # attention input channels: 2 taps * at_f_dim + 1 raw = 9
        assert v["params"]["attention_module"]["theta"]["kernel"].shape[0] == 9
