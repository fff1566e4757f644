"""PCM: pixel-correlation module as masked stencil attention — no graph lib.

The reference PCM (reference models.py:150-411) builds a 262k-node DGL graph
over the attention grid (numpy+networkx edge lists, C++/CUDA message
passing) where each voxel attends to its k^3-stencil neighbours, with
truncated neighbourhoods at the volume boundary and optional self-loop
removal. On TPU that graph is pure overhead: the neighbourhood is a regular
stencil, so neighbour gathering is a set of static shifts (jnp.roll) with a
validity mask, and the per-node variable-degree softmax of DGL's
degree-bucketed reduce becomes a masked fixed-K attention:

    w_ij = merge(theta(f_i) . phi(f_j), deg_i)   over valid j in stencil(i)
    cam'_i = r( sum_j w_ij * G(cam_j) )

All 13 merge types of the reference are implemented; the default configs use
'scaled_dot_product_relu' (st_dram_ref_att.py:77), whose sqrt(deg_i) scale
reproduces DGL's bucket-size scaling (f.shape[-1] == in-degree per bucket).

Deviations (documented, both reference-side artifacts):
* 'l2' and derivatives ('cosine') are defined per-edge on the projected
  feature vectors: the reference broadcasts shapes that only line up for
  f_dim==1; here l2 = exp(-5*||theta_i-phi_j||^2) per edge.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .initializers import torch_linear_kernel, torch_linear_bias


@functools.lru_cache(maxsize=32)
def stencil_offsets(k_size: int, connectivity: int, self_loop: bool):
    """Neighbour offsets of the reference's zoomed binary structure
    (models.py:232-234): generate_binary_structure(3, connectivity) zoomed
    to k_size with nearest-neighbour, minus the center if not self_loop."""
    from scipy import ndimage
    base = ndimage.generate_binary_structure(3, connectivity)
    if k_size != 3:
        base = ndimage.zoom(base, k_size / 3.0, order=0)
    offs = np.argwhere(base > 0) - k_size // 2
    if not self_loop:
        offs = offs[~np.all(offs == 0, axis=1)]
    return tuple(map(tuple, offs.tolist()))


def build_geo_feature(spatial_size, p_enc_dim, dtype=np.float32):
    """Sin/cos 3-D positional encoding, channels-last (D,H,W,p_enc_dim).

    Matches reference build_geo_feature (models.py:194-221): the channel
    range [d*d_model, (d+1)*d_model) encodes axis d, even channels sin,
    odd channels cos, frequencies 1e-4^(2j/d_model)."""
    nd = len(spatial_size)
    if p_enc_dim % (2 * nd) != 0:
        raise ValueError(f"p_enc_dim ({p_enc_dim}) must be divisible by {2 * nd}")
    d_model = p_enc_dim // nd
    div = np.power(1e-4, np.arange(0, d_model, 2) / d_model).astype(dtype)
    pe = np.zeros((*spatial_size, p_enc_dim), dtype)
    grids = np.meshgrid(*[np.arange(s, dtype=dtype) for s in spatial_size],
                        indexing="ij")
    for d in range(nd):
        start = d * d_model
        arg = grids[d][..., None] * div  # (D,H,W,d_model/2)
        pe[..., start:start + d_model:2] = np.sin(arg)
        pe[..., start + 1:start + d_model:2] = np.cos(arg)
    return pe


def build_geo_feature_z0(spatial_size, p_enc_dim, z0):
    """build_geo_feature with a (possibly traced) global z offset: local
    z index i encodes position z0 + i. With z0=0 this equals the numpy
    builder bit-for-bit (same float32 sin/cos); sharded PCM blocks pass
    their global block origin so positional encodings are identical to
    the unsharded volume's."""
    nd = len(spatial_size)
    if p_enc_dim % (2 * nd) != 0:
        raise ValueError(f"p_enc_dim ({p_enc_dim}) must be divisible by "
                         f"{2 * nd}")
    d_model = p_enc_dim // nd
    div = jnp.asarray(
        np.power(1e-4, np.arange(0, d_model, 2) / d_model), jnp.float32)
    grids = [jax.lax.broadcasted_iota(jnp.float32, spatial_size, d)
             for d in range(nd)]
    grids[0] = grids[0] + jnp.asarray(z0, jnp.float32)
    parts = []
    for d in range(nd):
        arg = grids[d][..., None] * div  # (D,H,W,d_model/2)
        sc = jnp.stack([jnp.sin(arg), jnp.cos(arg)], axis=-1)
        parts.append(sc.reshape(*spatial_size, d_model))
    return jnp.concatenate(parts, axis=-1)


def _shift(x, off):
    """x[i] <- x[i + off] along the 3 spatial axes (B,D,H,W,C); rolled
    values that wrapped around are handled by the validity mask."""
    return jnp.roll(x, shift=(-off[0], -off[1], -off[2]), axis=(1, 2, 3))


def _valid_masks(spatial_size, offsets, z0=0, z_extent=None):
    """(D,H,W,K) validity: neighbour i+off inside the (global) volume.

    For spatially sharded execution the block's z axis is a window of a
    larger volume: `z0` is the global index of local z=0 and `z_extent`
    the global depth, so true volume boundaries (not shard seams) decide
    validity.
    """
    D, H, W = spatial_size
    if z_extent is None:
        z_extent = D
    iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0) + z0
    iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
    masks = []
    for dz, dy, dx in offsets:
        m = ((iz + dz >= 0) & (iz + dz < z_extent) &
             (iy + dy >= 0) & (iy + dy < H) &
             (ix + dx >= 0) & (ix + dx < W))
        masks.append(m)
    return jnp.stack(masks, axis=-1)


def _masked_softmax(logits, valid):
    logits = jnp.where(valid, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    # all-invalid rows (e.g. pcm_sharded's pad-and-mask z rows): -inf max
    # would make (logits - m) = nan and 0*nan contaminate neighbors'
    # weighted sums next iteration; pin m so those rows come out exact 0
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(logits - m) * valid
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-12)


def _l2_normalize(x, valid, eps=1e-12):
    x = x * valid
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


class PCM(nn.Module):
    pool_size: Sequence[int] = (64, 64, 64)
    in_ch: int = 17           # parity only; flax infers input channels
    g_ch: int = 1
    f_dim: int = 8
    geo_f_dim: int = 0
    g_dim: int = 8
    non_local_iter: int = 1
    k_size: int = 3
    merge_type: str = "l2"
    self_loop: bool = True
    connectivity: int = 2
    residual: bool = False
    p_enc_dim: int = 32
    dtype: Any = jnp.float32
    # fused Pallas kernel for the shipped merge type (TPU); differentiable
    # via its recompute-based Pallas VJP, so training uses it too
    use_pallas: bool = False

    def _dense(self, feats, in_feats, name):
        return nn.Dense(feats,
                        kernel_init=torch_linear_kernel,
                        bias_init=torch_linear_bias(in_feats),
                        dtype=self.dtype, name=name)

    def merge_weights(self, acc, valid, deg):
        """Edge accumulators -> normalized attention weights (…, K)."""
        mt = self.merge_type
        sqrt_deg = jnp.sqrt(jnp.maximum(deg, 1.0))[..., None]
        if mt == "l2":
            w = jnp.exp(-5.0 * acc["l2"]) * valid
            return w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
        if mt == "sm":
            return _masked_softmax(acc["dot"], valid)
        if mt == "l2sm":
            return _masked_softmax(_l2_normalize(acc["dot"], valid), valid)
        if mt == "scaled_dot_product":
            return _masked_softmax(acc["dot"] / sqrt_deg, valid)
        if mt == "scaled_dot_product_relu":
            return _masked_softmax(nn.relu(acc["dot"]) / sqrt_deg, valid)
        if mt == "scaled_dot_product_geo":
            return _masked_softmax((acc["dot"] + acc["geodot"]) / sqrt_deg, valid)
        if mt == "scaled_dot_product_geo_relu":
            return _masked_softmax(
                (nn.relu(acc["dot"]) + acc["geodot"]) / sqrt_deg, valid)
        if mt == "att_is_all":
            return _masked_softmax(acc["sumdot"] / sqrt_deg, valid)
        if mt == "smscaled":
            return _masked_softmax(acc["dot"] / 0.01, valid)
        if mt == "l2smrelu":
            return _masked_softmax(_l2_normalize(nn.relu(acc["dot"]), valid), valid)
        if mt == "cosine":
            # reference normalizes by the raw (possibly negative) sum
            # (models.py:298-300) — keep that semantics for parity
            w = acc["cos"] * valid
            return w / jnp.sum(w, -1, keepdims=True)
        if mt == "smrelu":
            return _masked_softmax(nn.relu(acc["dot"]), valid)
        if mt == "heu1":
            f = acc["dot"] / (1.0 + acc["absdiff"])
            f = f * jax.lax.stop_gradient((f >= 0.03).astype(f.dtype)) * valid
            return f / (1e-7 + jnp.sum(f, -1, keepdims=True))
        if mt == "heu2":
            f = nn.relu(acc["dot"] / (1.0 + acc["absdiff"])) * valid
            return f / (1e-7 + jnp.sum(f, -1, keepdims=True))
        raise NotImplementedError(f"merge type {mt}")

    @nn.compact
    def __call__(self, cam, f, z0=0, z_extent=None):
        """cam: (B, D, H, W, g_ch); f: (B, D, H, W, C) -> refined cam.

        z0/z_extent place the block inside a larger volume for spatially
        sharded (context-parallel) execution; defaults mean "whole volume".
        """
        spatial = f.shape[1:4]
        offsets = stencil_offsets(self.k_size, self.connectivity, self.self_loop)
        valid = _valid_masks(spatial, offsets, z0, z_extent).astype(cam.dtype)
        deg = jnp.sum(valid, axis=-1)  # (D,H,W)

        in_ch = f.shape[-1]
        if self.f_dim > 0:
            theta = self._dense(self.f_dim, in_ch, "theta")(f)
            phi = self._dense(self.f_dim, in_ch, "phi")(f)
        else:
            theta, phi = f, f

        if (self.use_pallas and self.merge_type == "scaled_dot_product_relu"
                and self.p_enc_dim == 0 and isinstance(z0, int) and z0 == 0
                and z_extent is None):
            from ..core.pallas.window_attention import stencil_attention_pallas
            G = self._dense(self.g_dim, self.g_ch, "G") \
                if self.g_dim > 0 else None
            r = self._dense(self.g_ch, self.g_dim, "r") \
                if self.g_dim > 0 else None
            for _ in range(self.non_local_iter):
                g_cam = G(cam) if G is not None else cam
                out = stencil_attention_pallas(
                    theta.astype(jnp.float32), phi.astype(jnp.float32),
                    g_cam.astype(jnp.float32), offsets)
                refined = r(out) if r is not None else out
                cam = refined + cam if self.residual else refined
            return cam

        geo_theta = geo_phi = None
        if self.p_enc_dim > 0:
            # global-coordinate positional encodings: under spatial
            # sharding the block passes its global origin z0, so every
            # voxel encodes the same position as in the unsharded volume
            geo = build_geo_feature_z0(spatial, self.p_enc_dim, z0)
            geo = jnp.broadcast_to(geo[None], (f.shape[0], *spatial, self.p_enc_dim))
            geo = jax.lax.stop_gradient(geo)
            if self.geo_f_dim > 0:
                geo_theta = self._dense(self.geo_f_dim, self.p_enc_dim, "geo_theta")(geo)
                geo_phi = self._dense(self.geo_f_dim, self.p_enc_dim, "geo_phi")(geo)
            else:
                geo_theta, geo_phi = geo, geo

        mt = self.merge_type
        need_dot = mt in ("sm", "l2sm", "scaled_dot_product",
                          "scaled_dot_product_relu", "scaled_dot_product_geo",
                          "scaled_dot_product_geo_relu", "smscaled", "l2smrelu",
                          "smrelu", "heu1", "heu2")
        need_geo = mt in ("scaled_dot_product_geo", "scaled_dot_product_geo_relu")
        need_sumdot = mt == "att_is_all"
        need_l2 = mt == "l2"
        need_cos = mt == "cosine"
        need_absdiff = mt in ("heu1", "heu2")

        # per-offset edge statistics (XLA fuses the rolls; K is static)
        acc = {k: [] for k in ("dot", "geodot", "sumdot", "l2", "cos", "absdiff")}
        for off in offsets:
            phi_j = _shift(phi, off)
            if need_dot:
                acc["dot"].append(jnp.sum(theta * phi_j, -1))
            if need_geo or need_sumdot:
                gphi_j = _shift(geo_phi, off)
                if need_geo:
                    acc["geodot"].append(jnp.sum(geo_theta * gphi_j, -1))
                if need_sumdot:
                    acc["sumdot"].append(
                        jnp.sum((theta + geo_theta) * (phi_j + gphi_j), -1))
            if need_l2:
                acc["l2"].append(jnp.sum((theta - phi_j) ** 2, -1))
            if need_cos:
                tn = theta / jnp.maximum(
                    jnp.linalg.norm(theta, axis=-1, keepdims=True), 1e-8)
                pn = phi_j / jnp.maximum(
                    jnp.linalg.norm(phi_j, axis=-1, keepdims=True), 1e-8)
                acc["cos"].append(jnp.sum(tn * pn, -1))
            if need_absdiff:
                acc["absdiff"].append(jnp.sum(jnp.abs(theta - phi_j), -1))
        acc = {k: jnp.stack(v, -1) for k, v in acc.items() if v}

        w = self.merge_weights(acc, valid[None], deg[None])  # (B,D,H,W,K)

        G = self._dense(self.g_dim, self.g_ch, "G") if self.g_dim > 0 else None
        r = self._dense(self.g_ch, self.g_dim, "r") if self.g_dim > 0 else None
        for _ in range(self.non_local_iter):
            g_cam = G(cam) if G is not None else cam  # (B,D,H,W,g_dim)
            out = 0.0
            for k, off in enumerate(offsets):
                out = out + w[..., k:k + 1] * _shift(g_cam, off)
            refined = r(out) if r is not None else out
            cam = refined + cam if self.residual else refined
        return cam


def pcm_sharded(pcm, variables, cam, f, mesh, axis_name="space"):
    """Context-parallel PCM: shard the D axis of (B,D,H,W,C) volumes over
    `mesh`, exchange 1-ring halos of cam and features per iteration with
    ppermute, and keep volume-boundary semantics exact by passing global z
    coordinates into the validity mask. Numerically identical to the
    single-device forward (tests/test_mesh.py).

    This is the TPU scaling story for the reference's DGL module
    (SURVEY.md §2.7): stencil locality (k<=3) means 1-wide halos replace
    any ring/all-to-all pass.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    halo = pcm.k_size // 2
    D = cam.shape[1]
    n = mesh.devices.size
    # pad-and-mask for D % n != 0: pad rows carry global z >= D, which the
    # validity masks (z_extent=D) exclude from every neighborhood, so real
    # rows never attend into padding; the pad rows' own garbage is sliced
    # off below. Positional encodings use the block's global origin
    # (build_geo_feature_z0), so p_enc_dim > 0 shards exactly too.
    d_pad = (-D) % n
    if d_pad:
        widths = [(0, 0), (0, d_pad), (0, 0), (0, 0), (0, 0)]
        cam = jnp.pad(cam, widths)
        f = jnp.pad(f, widths)
    pcm_single = pcm.clone(non_local_iter=1)
    spec = P(None, axis_name, None, None, None)

    def local(cam_blk, f_blk):
        from ..core.mesh import halo_exchange
        idx = jax.lax.axis_index(axis_name)
        d_local = cam_blk.shape[1]
        z0 = idx * d_local - halo
        f_ext = halo_exchange(f_blk, axis_name, halo, axis=1)
        out = cam_blk
        for _ in range(pcm.non_local_iter):
            cam_ext = halo_exchange(out, axis_name, halo, axis=1)
            ref = pcm_single.apply(variables, cam_ext, f_ext,
                                   z0=z0, z_extent=D)
            out = jax.lax.slice_in_dim(ref, halo, halo + d_local, axis=1)
        return out

    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    out = fn(cam, f)
    return out[:, :D] if d_pad else out
