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
