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


def _softmax(v):
    e = np.exp(v - v.max())
    return e / e.sum()


def _l2norm(v, eps=1e-12):
    # torch F.normalize(dim=-1) semantics (reference models.py:270,296)
    return v / max(np.linalg.norm(v), eps)


def pcm_oracle(cam, f, p, offsets, merge, n_iter=1, residual=False,
               f_dim=None, g_dim=None, geo=None, geo_f_dim=None):
    """cam: (B,D,H,W,1), f: (B,D,H,W,C); p: dict of kernel/bias arrays.

    `geo`: optional (D,H,W,p_enc_dim) positional-encoding volume for the
    geo merge types (reference models.py:278-290); `geo_f_dim` truthy means
    geo features go through the geo_theta/geo_phi linears.

    Edge weights follow reference merge_func (models.py:261-320) literally,
    per node over its truncated neighbour list; the degree scale
    sqrt(f.shape[-1]) is the per-node in-degree because DGL's reduce is
    degree-bucketed.
    """
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
    gth = (lambda v: _linear(v, p["geo_theta"]["kernel"],
                             p["geo_theta"]["bias"])) \
        if geo_f_dim else (lambda v: v)
    gph = (lambda v: _linear(v, p["geo_phi"]["kernel"],
                             p["geo_phi"]["bias"])) \
        if geo_f_dim else (lambda v: v)

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
                if geo is not None:
                    gti = gth(geo[i])
                    geo_logits = np.array([gti @ gph(geo[j]) for j in nbrs])
                if merge == "scaled_dot_product_relu":
                    w = _softmax(np.maximum(logits, 0) / np.sqrt(deg))
                elif merge == "scaled_dot_product":
                    w = _softmax(logits / np.sqrt(deg))
                elif merge == "scaled_dot_product_geo":
                    w = _softmax((logits + geo_logits) / np.sqrt(deg))
                elif merge == "scaled_dot_product_geo_relu":
                    w = _softmax((np.maximum(logits, 0) + geo_logits)
                                 / np.sqrt(deg))
                elif merge == "att_is_all":
                    s = np.array([(ti + gti) @ (ph(f[b][j]) + gph(geo[j]))
                                  for j in nbrs])
                    w = _softmax(s / np.sqrt(deg))
                elif merge == "sm":
                    w = _softmax(logits)
                elif merge == "smscaled":
                    w = _softmax(logits / 0.01)
                elif merge == "smrelu":
                    w = _softmax(np.maximum(logits, 0))
                elif merge == "l2sm":
                    w = _softmax(_l2norm(logits))
                elif merge == "l2smrelu":
                    w = _softmax(_l2norm(np.maximum(logits, 0)))
                elif merge == "heu1":
                    absd = np.array([np.abs(ti - ph(f[b][j])).sum()
                                     for j in nbrs])
                    v = logits / (1.0 + absd)
                    v = np.where(v < 0.03, 0.0, v)
                    w = v / (1e-7 + v.sum())
                elif merge == "heu2":
                    absd = np.array([np.abs(ti - ph(f[b][j])).sum()
                                     for j in nbrs])
                    w = np.maximum(logits / (1.0 + absd), 0)
                    w = w / (1e-7 + w.sum())
                elif merge == "l2":
                    d2 = np.array([((ti - ph(f[b][j])) ** 2).sum() for j in nbrs])
                    w = np.exp(-5.0 * d2)
                    w = w / w.sum()
                elif merge == "cosine":
                    w = np.array([_l2norm(ti, 1e-8) @ _l2norm(ph(f[b][j]), 1e-8)
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


# every non-geo merge branch of reference merge_func (models.py:261-320)
@pytest.mark.parametrize("merge", ["scaled_dot_product_relu",
                                   "scaled_dot_product", "sm", "smscaled",
                                   "smrelu", "l2sm", "l2smrelu", "heu1",
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


# every geo merge branch (p_enc_dim > 0), projected and identity geo feats
@pytest.mark.parametrize("merge,geo_f_dim", [
    ("scaled_dot_product_geo", 4),
    ("scaled_dot_product_geo_relu", 4),
    ("att_is_all", 4),          # needs f_dim == geo_f_dim for theta+geo_theta
    ("scaled_dot_product_geo", 0),  # identity geo projections
])
def test_pcm_geo_merges_match_oracle(merge, geo_f_dim, rng):
    spatial = (4, 4, 5)
    cam = rng.normal(size=(1, *spatial, 1)).astype(np.float32)
    f = rng.normal(size=(1, *spatial, 3)).astype(np.float32)
    f_dim = 4 if merge == "att_is_all" else 3
    m = PCM(pool_size=spatial, g_ch=1, f_dim=f_dim, g_dim=2, non_local_iter=1,
            k_size=3, merge_type=merge, self_loop=False, connectivity=2,
            p_enc_dim=12, geo_f_dim=geo_f_dim)
    variables = m.init(jax.random.PRNGKey(4), jnp.asarray(cam), jnp.asarray(f))
    got = np.asarray(m.apply(variables, jnp.asarray(cam), jnp.asarray(f)))
    offs = stencil_offsets(3, 2, False)
    geo = build_geo_feature(spatial, 12)
    want = pcm_oracle(cam, f, _np_params(variables), offs, merge,
                      f_dim=f_dim, g_dim=2, geo=geo, geo_f_dim=geo_f_dim)
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
