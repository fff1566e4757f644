"""PCM stencil attention vs an explicit-graph NumPy oracle.

The oracle literally enumerates each voxel's stencil neighbours (what the
reference's DGL graph + degree-bucketed reduce computes, models.py:223-411)
and applies the attention math per node — truncated neighbourhoods at the
boundary, per-node degree scaling, the lot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dram_tpu.models.pcm import PCM, stencil_offsets, build_geo_feature


def _linear(x, kernel, bias):
    return x @ kernel + bias


def pcm_oracle(cam, f, p, offsets, merge, n_iter=1, residual=False,
               f_dim=None, g_dim=None):
    """cam: (B,D,H,W,1), f: (B,D,H,W,C); p: dict of kernel/bias arrays."""
    B = cam.shape[0]
    spatial = cam.shape[1:4]
    out = cam.copy()
    nodes = list(np.ndindex(*spatial))
    th = (lambda v: _linear(v, p["theta"]["kernel"], p["theta"]["bias"])) \
        if f_dim else (lambda v: v)
    ph = (lambda v: _linear(v, p["phi"]["kernel"], p["phi"]["bias"])) \
        if f_dim else (lambda v: v)
    G = (lambda v: _linear(v, p["G"]["kernel"], p["G"]["bias"])) \
        if g_dim else (lambda v: v)
    r = (lambda v: _linear(v, p["r"]["kernel"], p["r"]["bias"])) \
        if g_dim else (lambda v: v)

    for _ in range(n_iter):
        new = np.zeros_like(out)
        for b in range(B):
            for i in nodes:
                nbrs = []
                for off in offsets:
                    j = tuple(np.add(i, off))
                    if all(0 <= jj < s for jj, s in zip(j, spatial)):
                        nbrs.append(j)
                deg = len(nbrs)
                ti = th(f[b][i])
                logits = np.array([ti @ ph(f[b][j]) for j in nbrs])
                if merge == "scaled_dot_product_relu":
                    w = np.maximum(logits, 0) / np.sqrt(deg)
                    w = np.exp(w - w.max())
                    w = w / w.sum()
                elif merge == "sm":
                    w = np.exp(logits - logits.max())
                    w = w / w.sum()
                elif merge == "smrelu":
                    w = np.maximum(logits, 0)
                    w = np.exp(w - w.max())
                    w = w / w.sum()
                elif merge == "heu2":
                    absd = np.array([np.abs(ti - ph(f[b][j])).sum() for j in nbrs])
                    w = np.maximum(logits / (1.0 + absd), 0)
                    w = w / (1e-7 + w.sum())
                elif merge == "l2":
                    d2 = np.array([((ti - ph(f[b][j])) ** 2).sum() for j in nbrs])
                    w = np.exp(-5.0 * d2)
                    w = w / w.sum()
                elif merge == "cosine":
                    def cs(a, c):
                        return (a @ c) / max(np.linalg.norm(a) * np.linalg.norm(c), 1e-8 ** 2)
                    w = np.array([cs(ti / max(np.linalg.norm(ti), 1e-8),
                                     ph(f[b][j]) / max(np.linalg.norm(ph(f[b][j])), 1e-8))
                                  for j in nbrs])
                    w = np.array([(ti / max(np.linalg.norm(ti), 1e-8)) @
                                  (ph(f[b][j]) / max(np.linalg.norm(ph(f[b][j])), 1e-8))
                                  for j in nbrs])
                    w = w / w.sum()
                else:
                    raise NotImplementedError(merge)
                y = sum(wj * G(out[b][j]) for wj, j in zip(w, nbrs))
                new[b][i] = r(y)
        out = new + out if residual else new
    return out


def _np_params(variables):
    return jax.tree.map(np.asarray, variables["params"])


@pytest.mark.parametrize("merge", ["scaled_dot_product_relu", "sm", "smrelu",
                                   "heu2", "l2", "cosine"])
def test_pcm_matches_graph_oracle(merge, rng):
    spatial = (4, 5, 6)
    B, C = 2, 5
    cam = rng.normal(size=(B, *spatial, 1)).astype(np.float32)
    f = rng.normal(size=(B, *spatial, C)).astype(np.float32)
    m = PCM(pool_size=spatial, g_ch=1, f_dim=3, g_dim=4, non_local_iter=1,
            k_size=3, merge_type=merge, self_loop=False, connectivity=2,
            p_enc_dim=0, geo_f_dim=0)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(cam), jnp.asarray(f))
    got = np.asarray(m.apply(variables, jnp.asarray(cam), jnp.asarray(f)))
    offs = stencil_offsets(3, 2, False)
    want = pcm_oracle(cam, f, _np_params(variables), offs, merge,
                      f_dim=3, g_dim=4)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pcm_self_loop_and_connectivity():
    offs2 = stencil_offsets(3, 2, True)
    assert len(offs2) == 19  # 18-neighbourhood + center
    offs2_nl = stencil_offsets(3, 2, False)
    assert len(offs2_nl) == 18 and (0, 0, 0) not in offs2_nl
    offs1 = stencil_offsets(3, 1, True)
    assert len(offs1) == 7  # 6-neighbourhood + center
    offs3 = stencil_offsets(3, 3, True)
    assert len(offs3) == 27


def test_pcm_iterations_and_residual(rng):
    spatial = (3, 3, 3)
    cam = rng.normal(size=(1, *spatial, 1)).astype(np.float32)
    f = rng.normal(size=(1, *spatial, 4)).astype(np.float32)
    m = PCM(pool_size=spatial, g_ch=1, f_dim=2, g_dim=2, non_local_iter=2,
            k_size=3, merge_type="scaled_dot_product_relu", self_loop=True,
            connectivity=3, residual=True, p_enc_dim=0)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(cam), jnp.asarray(f))
    got = np.asarray(m.apply(variables, jnp.asarray(cam), jnp.asarray(f)))
    offs = stencil_offsets(3, 3, True)
    want = pcm_oracle(cam, f, _np_params(variables), offs,
                      "scaled_dot_product_relu", n_iter=2, residual=True,
                      f_dim=2, g_dim=2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pcm_identity_projections(rng):
    """f_dim=0 / g_dim=0 use raw features (reference Identity fallbacks)."""
    spatial = (3, 4, 3)
    cam = rng.normal(size=(1, *spatial, 1)).astype(np.float32)
    f = rng.normal(size=(1, *spatial, 3)).astype(np.float32)
    m = PCM(pool_size=spatial, g_ch=1, f_dim=0, g_dim=0, non_local_iter=1,
            k_size=3, merge_type="sm", self_loop=True, connectivity=1,
            p_enc_dim=0)
    variables = m.init(jax.random.PRNGKey(2), jnp.asarray(cam), jnp.asarray(f))
    got = np.asarray(m.apply(variables, jnp.asarray(cam), jnp.asarray(f)))
    offs = stencil_offsets(3, 1, True)
    want = pcm_oracle(cam, f, {}, offs, "sm", f_dim=None, g_dim=None)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_geo_feature_matches_reference_formula():
    pe = build_geo_feature((4, 5, 6), 12)
    assert pe.shape == (4, 5, 6, 12)
    # axis-0 block: channels 0..3; sin/cos of pos * 1e-4^(2j/4)
    d_model = 4
    div = np.power(1e-4, np.arange(0, d_model, 2) / d_model)
    for z in range(4):
        np.testing.assert_allclose(pe[z, 0, 0, 0], np.sin(z * div[0]), rtol=1e-6)
        np.testing.assert_allclose(pe[z, 0, 0, 1], np.cos(z * div[0]), rtol=1e-6)
        np.testing.assert_allclose(pe[z, 0, 0, 2], np.sin(z * div[1]), rtol=1e-6)
    # axis-2 block: channels 8..11 vary with x
    assert not np.allclose(pe[0, 0, 0, 8], pe[0, 0, 3, 8])


def test_pcm_geo_merge_runs(rng):
    spatial = (4, 4, 4)
    cam = rng.normal(size=(1, *spatial, 1)).astype(np.float32)
    f = rng.normal(size=(1, *spatial, 3)).astype(np.float32)
    m = PCM(pool_size=spatial, g_ch=1, f_dim=2, g_dim=2, non_local_iter=1,
            k_size=3, merge_type="scaled_dot_product_geo", self_loop=False,
            connectivity=2, p_enc_dim=12, geo_f_dim=4)
    variables = m.init(jax.random.PRNGKey(3), jnp.asarray(cam), jnp.asarray(f))
    out = m.apply(variables, jnp.asarray(cam), jnp.asarray(f))
    assert out.shape == cam.shape
    assert np.isfinite(np.asarray(out)).all()
