"""Pallas stencil-attention kernel (interpret mode) vs the XLA PCM path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dram_tpu.core.pallas.window_attention import stencil_attention_pallas
from dram_tpu.models.pcm import PCM, stencil_offsets


class TestPallasKernel:
    @pytest.mark.parametrize("shape,block_d", [((6, 8, 16), 2),
                                               ((8, 8, 8), 8)])
    def test_matches_pcm_xla_path(self, shape, block_d, rng):
        """Full PCM forward with use_pallas (interpret) == XLA path."""
        B, F = 1, 4
        cam = rng.normal(size=(B, *shape, 1)).astype(np.float32)
        f = rng.normal(size=(B, *shape, 5)).astype(np.float32)
        kw = dict(pool_size=shape, g_ch=1, f_dim=F, g_dim=3,
                  non_local_iter=2, k_size=3,
                  merge_type="scaled_dot_product_relu", self_loop=False,
                  connectivity=2, residual=True, p_enc_dim=0)
        m_x = PCM(**kw, use_pallas=False)
        v = m_x.init(jax.random.PRNGKey(0), jnp.asarray(cam), jnp.asarray(f))
        want = np.asarray(m_x.apply(v, jnp.asarray(cam), jnp.asarray(f)))

        import dram_tpu.core.pallas.window_attention as wa
        orig = wa.stencil_attention_pallas

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        wa.stencil_attention_pallas = interp
        try:
            m_p = PCM(**kw, use_pallas=True)
            got = np.asarray(m_p.apply(v, jnp.asarray(cam), jnp.asarray(f)))
        finally:
            wa.stencil_attention_pallas = orig
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_kernel_batched(self, rng):
        offs = stencil_offsets(3, 2, False)
        theta = rng.normal(size=(2, 4, 4, 8, 3)).astype(np.float32)
        phi = rng.normal(size=(2, 4, 4, 8, 3)).astype(np.float32)
        g = rng.normal(size=(2, 4, 4, 8, 2)).astype(np.float32)
        out = stencil_attention_pallas(jnp.asarray(theta), jnp.asarray(phi),
                                       jnp.asarray(g), offs, block_d=2,
                                       interpret=True)
        assert out.shape == (2, 4, 4, 8, 2)
        assert np.isfinite(np.asarray(out)).all()


def _xla_attention(theta, phi, g, offsets):
    """Pure-XLA twin of the kernel math (PCM scaled_dot_product_relu path):
    the grad-parity oracle."""
    from dram_tpu.models.pcm import _valid_masks, _masked_softmax, _shift
    spatial = theta.shape[1:4]
    valid = _valid_masks(spatial, offsets).astype(theta.dtype)
    deg = jnp.sum(valid, axis=-1)
    sqrt_deg = jnp.sqrt(jnp.maximum(deg, 1.0))[..., None]
    dots = jnp.stack([jnp.sum(theta * _shift(phi, off), -1)
                      for off in offsets], -1)
    w = _masked_softmax(jax.nn.relu(dots) / sqrt_deg, valid[None])
    out = 0.0
    for k, off in enumerate(offsets):
        out = out + w[..., k:k + 1] * _shift(g, off)
    return out


class TestPallasVJP:
    @pytest.mark.parametrize("shape,block_d", [((6, 4, 8), 2),
                                               ((4, 8, 8), 4)])
    def test_grads_match_xla_path(self, shape, block_d, rng):
        """custom_vjp (recompute-based Pallas backward, interpret mode)
        == jax.grad through the XLA stencil-attention math, for theta,
        phi and g_cam."""
        from dram_tpu.core.pallas.window_attention import stencil_attention
        offs = stencil_offsets(3, 2, False)
        B, F, G = 2, 3, 2
        theta = jnp.asarray(rng.normal(size=(B, *shape, F)).astype(np.float32))
        phi = jnp.asarray(rng.normal(size=(B, *shape, F)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(B, *shape, G)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(B, *shape, G)).astype(np.float32))

        def loss_pallas(t, p, gg):
            out = stencil_attention(t, p, gg, offs, block_d, True)
            return jnp.sum(out * cot)

        def loss_xla(t, p, gg):
            return jnp.sum(_xla_attention(t, p, gg, offs) * cot)

        f1 = float(loss_pallas(theta, phi, g))
        f2 = float(loss_xla(theta, phi, g))
        assert f1 == pytest.approx(f2, rel=1e-4)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(theta, phi, g)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(theta, phi, g)
        for a, b, name in zip(g1, g2, ("theta", "phi", "g_cam")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=1e-4,
                                       err_msg=f"grad {name}")

    def test_pcm_training_grads_with_pallas(self, rng):
        """Full PCM module grads (params incl. theta/phi/G/r Dense layers)
        match between use_pallas (interpret) and the XLA path."""
        import dram_tpu.core.pallas.window_attention as wa
        shape = (4, 4, 8)
        cam = jnp.asarray(rng.normal(size=(1, *shape, 1)).astype(np.float32))
        f = jnp.asarray(rng.normal(size=(1, *shape, 5)).astype(np.float32))
        kw = dict(pool_size=shape, g_ch=1, f_dim=3, g_dim=2,
                  non_local_iter=2, k_size=3,
                  merge_type="scaled_dot_product_relu", self_loop=False,
                  connectivity=2, residual=True, p_enc_dim=0)
        m_x = PCM(**kw, use_pallas=False)
        v = m_x.init(jax.random.PRNGKey(0), cam, f)

        orig = wa.stencil_attention_pallas

        def interp(*a, **k):
            return orig(*a[:4], interpret=True)

        def loss_of(module):
            def go(params):
                out = module.apply({"params": params}, cam, f)
                return jnp.sum(out ** 2)
            return go

        g_x = jax.grad(loss_of(m_x))(v["params"])
        wa.stencil_attention_pallas = interp
        try:
            import dram_tpu.models.pcm as pcm_mod
            g_p = jax.grad(loss_of(PCM(**kw, use_pallas=True)))(v["params"])
        finally:
            wa.stencil_attention_pallas = orig
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4),
            g_x, g_p)
