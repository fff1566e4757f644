"""Pallas TPU kernels: fused k^3-stencil attention (the PCM hot op).

The XLA lowering of the stencil attention (models/pcm.py) materialises the
K (<=27) shifted logit maps in HBM; these kernels keep a z-slab of the
projected features in VMEM and produce attention + aggregation in one
pass — one HBM read of theta/phi/G(cam), one write of the output.

Layout: volumes are carried as (z, channel, H*W) so the flattened plane
rides the 128-lane minor dimension (64^3 grids flatten to 4096 = 32x128
exactly) and the small channel dim (f_dim/g_dim <= 8) sits on sublanes;
in-plane neighbour shifts are lane rolls, z shifts index the haloed VMEM
slab, and out-of-volume neighbours are masked by global-coordinate
validity.

Training: `stencil_attention` is a jax.custom_vjp whose backward is also
Pallas — a recompute-based pipeline in the same streaming structure:
(1) a scalar-map kernel recomputes the per-voxel softmax statistics
    (rsqrt-degree r, running max m, denominator, and the softmax-jacobian
    contraction c_i = sum_j a_ij u_ij), then
(2) a gradient kernel evaluates d_theta as a gather over +offsets and
    d_phi / d_gcam as gathers over -offsets (the scatter "j receives from
    i = j-o" formulated as a gather at j), so no cross-block accumulation
    is needed.

Scope: the shipped merge type 'scaled_dot_product_relu'
(st_dram_ref_att.py:77); other merges use the XLA path (models/pcm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _coords(BD, z0, H, W):
    iz = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 0) + z0
    iy = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 1) // W
    ix = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 1) % W
    return iz, iy, ix


def _valid(iz, iy, ix, dz, dy, dx, D, H, W):
    return ((iz + dz >= 0) & (iz + dz < D) &
            (iy + dy >= 0) & (iy + dy < H) &
            (ix + dx >= 0) & (ix + dx < W)).astype(jnp.float32)


def _fwd_kernel(theta_ref, phi_hbm, gcam_hbm, out_ref, scratch_phi,
                scratch_g, sem_phi, sem_g, *, offsets, BD, D, H, W, F, G,
                halo):
    b = pl.program_id(0)
    zb = pl.program_id(1)
    z0 = zb * BD

    # DMA the haloed phi/gcam slabs HBM -> VMEM (inputs are z-padded by
    # halo, so the padded slab starts exactly at z0)
    cp1 = pltpu.make_async_copy(
        phi_hbm.at[b, pl.ds(z0, BD + 2 * halo)], scratch_phi, sem_phi)
    cp2 = pltpu.make_async_copy(
        gcam_hbm.at[b, pl.ds(z0, BD + 2 * halo)], scratch_g, sem_g)
    cp1.start()
    cp2.start()
    theta = theta_ref[:]  # (BD, F, H*W)
    cp1.wait()
    cp2.wait()

    iz, iy, ix = _coords(BD, z0, H, W)

    def logit_of(dz, dy, dx):
        phi_s = scratch_phi[pl.ds(halo + dz, BD)]  # (BD, F, H*W)
        phi_s = pltpu.roll(phi_s, (-(dy * W + dx)) % (H * W), 2)
        return jnp.maximum(jnp.sum(theta * phi_s, axis=1), 0.0)

    # three streaming passes over the K offsets (recomputing the cheap lane
    # rolls) instead of keeping K logit/valid maps live — bounded VMEM
    deg = jnp.zeros((BD, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        deg = deg + _valid(iz, iy, ix, dz, dy, dx, D, H, W)
    r = jax.lax.rsqrt(jnp.maximum(deg, 1.0))

    # relu bounds logits below by 0, so the masked max is >= 0 and the
    # masked exp-sum needs no -inf handling
    m = jnp.zeros((BD, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        s = logit_of(dz, dy, dx) * r
        m = jnp.maximum(m, s * _valid(iz, iy, ix, dz, dy, dx, D, H, W))

    denom = jnp.zeros((BD, H * W), jnp.float32)
    acc = jnp.zeros((BD, G, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        e = jnp.exp(logit_of(dz, dy, dx) * r - m) * \
            _valid(iz, iy, ix, dz, dy, dx, D, H, W)
        denom = denom + e
        g_s = scratch_g[pl.ds(halo + dz, BD)]
        g_s = pltpu.roll(g_s, (-(dy * W + dx)) % (H * W), 2)
        acc = acc + e[:, None, :] * g_s

    out_ref[:] = acc / jnp.maximum(denom, 1e-12)[:, None, :]


def _scal_kernel(theta_ref, ybar_ref, phi_hbm, gcam_hbm, scal_ref,
                 scratch_phi, scratch_g, sem_phi, sem_g, *, offsets, BD, D,
                 H, W, F, G, halo):
    """Per-voxel backward statistics: scal = [r, m, denom, c]."""
    b = pl.program_id(0)
    zb = pl.program_id(1)
    z0 = zb * BD

    cp1 = pltpu.make_async_copy(
        phi_hbm.at[b, pl.ds(z0, BD + 2 * halo)], scratch_phi, sem_phi)
    cp2 = pltpu.make_async_copy(
        gcam_hbm.at[b, pl.ds(z0, BD + 2 * halo)], scratch_g, sem_g)
    cp1.start()
    cp2.start()
    theta = theta_ref[:]
    ybar = ybar_ref[:]  # (BD, G, H*W)
    cp1.wait()
    cp2.wait()

    iz, iy, ix = _coords(BD, z0, H, W)

    def logit_of(dz, dy, dx):
        phi_s = scratch_phi[pl.ds(halo + dz, BD)]
        phi_s = pltpu.roll(phi_s, (-(dy * W + dx)) % (H * W), 2)
        return jnp.maximum(jnp.sum(theta * phi_s, axis=1), 0.0)

    deg = jnp.zeros((BD, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        deg = deg + _valid(iz, iy, ix, dz, dy, dx, D, H, W)
    r = jax.lax.rsqrt(jnp.maximum(deg, 1.0))

    m = jnp.zeros((BD, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        s = logit_of(dz, dy, dx) * r
        m = jnp.maximum(m, s * _valid(iz, iy, ix, dz, dy, dx, D, H, W))

    denom = jnp.zeros((BD, H * W), jnp.float32)
    num = jnp.zeros((BD, H * W), jnp.float32)  # sum_j e_j * u_j
    for dz, dy, dx in offsets:
        e = jnp.exp(logit_of(dz, dy, dx) * r - m) * \
            _valid(iz, iy, ix, dz, dy, dx, D, H, W)
        denom = denom + e
        g_s = scratch_g[pl.ds(halo + dz, BD)]
        g_s = pltpu.roll(g_s, (-(dy * W + dx)) % (H * W), 2)
        u = jnp.sum(ybar * g_s, axis=1)  # (BD, H*W)
        num = num + e * u

    c = num / jnp.maximum(denom, 1e-12)
    scal_ref[:] = jnp.stack([r, m, denom, c], axis=1)  # (BD, 4, H*W)


def _bwd_kernel(theta_hbm, phi_hbm, gcam_hbm, ybar_hbm, scal_hbm,
                dtheta_ref, dphi_ref, dgcam_ref,
                s_theta, s_phi, s_g, s_ybar, s_scal,
                sem0, sem1, sem2, sem3, sem4, *, offsets, BD, D, H, W, F, G,
                halo):
    """Gather-formulated gradients.

    At voxel j:
      d_theta_j = sum_o ds_o(j) * phi_{j+o}                      (+o gathers)
      d_phi_j   = sum_o ds_o(j-o) * theta_{j-o}                  (-o gathers)
      d_gcam_j  = sum_o a_o(j-o) * ybar_{j-o}                    (-o gathers)
    with s_o(i) = theta_i . phi_{i+o}, l = relu(s) * r_i,
    a = exp(l - m_i) * valid / denom_i, u_o(i) = ybar_i . gcam_{i+o},
    ds = a * (u - c_i) * r_i * [s > 0].
    """
    b = pl.program_id(0)
    zb = pl.program_id(1)
    z0 = zb * BD

    copies = []
    for hbm, vmem, sem in ((theta_hbm, s_theta, sem0), (phi_hbm, s_phi, sem1),
                           (gcam_hbm, s_g, sem2), (ybar_hbm, s_ybar, sem3),
                           (scal_hbm, s_scal, sem4)):
        cp = pltpu.make_async_copy(hbm.at[b, pl.ds(z0, BD + 2 * halo)],
                                   vmem, sem)
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    iz, iy, ix = _coords(BD, z0, H, W)

    def slab(s, dz):
        return s[pl.ds(halo + dz, BD)]

    def rolled(s, dz, dy, dx):
        return pltpu.roll(slab(s, dz), (-(dy * W + dx)) % (H * W), 2)

    theta_j = slab(s_theta, 0)   # (BD, F, H*W)
    phi_j = slab(s_phi, 0)
    g_j = slab(s_g, 0)
    ybar_j = slab(s_ybar, 0)
    scal_j = slab(s_scal, 0)     # (BD, 4, H*W)
    r_j, m_j = scal_j[:, 0], scal_j[:, 1]
    den_j = jnp.maximum(scal_j[:, 2], 1e-12)
    c_j = scal_j[:, 3]

    dtheta = jnp.zeros((BD, F, H * W), jnp.float32)
    dphi = jnp.zeros((BD, F, H * W), jnp.float32)
    dgcam = jnp.zeros((BD, G, H * W), jnp.float32)

    for dz, dy, dx in offsets:
        # ---- +o side: contribution to d_theta at j ----
        phi_s = rolled(s_phi, dz, dy, dx)
        s = jnp.sum(theta_j * phi_s, axis=1)
        v = _valid(iz, iy, ix, dz, dy, dx, D, H, W)
        a = jnp.exp(jnp.maximum(s, 0.0) * r_j - m_j) * v / den_j
        g_s = rolled(s_g, dz, dy, dx)
        u = jnp.sum(ybar_j * g_s, axis=1)
        ds = a * (u - c_j) * r_j * (s > 0.0).astype(jnp.float32)
        dtheta = dtheta + ds[:, None, :] * phi_s

        # ---- -o side: contributions to d_phi and d_gcam at j ----
        # i = j - o must lie in the volume (edge validity from i's view)
        vi = _valid(iz, iy, ix, -dz, -dy, -dx, D, H, W)
        theta_i = rolled(s_theta, -dz, (-dy), (-dx))
        scal_i = rolled(s_scal, -dz, (-dy), (-dx))
        r_i, m_i = scal_i[:, 0], scal_i[:, 1]
        den_i = jnp.maximum(scal_i[:, 2], 1e-12)
        c_i = scal_i[:, 3]
        s2 = jnp.sum(theta_i * phi_j, axis=1)          # theta_i . phi_j
        a2 = jnp.exp(jnp.maximum(s2, 0.0) * r_i - m_i) * vi / den_i
        ybar_i = rolled(s_ybar, -dz, (-dy), (-dx))
        u2 = jnp.sum(ybar_i * g_j, axis=1)             # ybar_i . gcam_j
        ds2 = a2 * (u2 - c_i) * r_i * (s2 > 0.0).astype(jnp.float32)
        dphi = dphi + ds2[:, None, :] * theta_i
        dgcam = dgcam + a2[:, None, :] * ybar_i

    dtheta_ref[:] = dtheta
    dphi_ref[:] = dphi
    dgcam_ref[:] = dgcam


def _layout(x, B, D, H, W, C):
    """(B,D,H,W,C) -> (B,D,C,H*W) float32."""
    return jnp.transpose(x.reshape(B, D, H * W, C).astype(jnp.float32),
                         (0, 1, 3, 2))


def _unlayout(x, B, D, H, W, C):
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(B, D, H, W, C)


def _zpad(x, halo):
    return jnp.pad(x, [(0, 0), (halo, halo), (0, 0), (0, 0)])


def _block_d(D, block_d):
    BD = min(block_d, D)
    while D % BD:
        BD -= 1
    return BD


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def stencil_attention(theta, phi, g_cam, offsets, block_d=4,
                      interpret=False):
    """Fused stencil attention (merge='scaled_dot_product_relu').

    theta, phi: (B, D, H, W, F); g_cam: (B, D, H, W, G).
    Returns (B, D, H, W, G): per-voxel masked softmax over the stencil of
    relu(theta . phi_j)/sqrt(deg_i), aggregating g_cam. Differentiable via
    a recompute-based Pallas backward.
    """
    return _fwd_impl(theta, phi, g_cam, offsets, block_d, interpret)


def _fwd_impl(theta, phi, g_cam, offsets, block_d, interpret):
    B, D, H, W, F = theta.shape
    G = g_cam.shape[-1]
    offsets = tuple(map(tuple, offsets))
    halo = max(abs(o[0]) for o in offsets)
    BD = _block_d(D, block_d)

    theta2 = _layout(theta, B, D, H, W, F)
    phi2 = _zpad(_layout(phi, B, D, H, W, F), halo)
    g2 = _zpad(_layout(g_cam, B, D, H, W, G), halo)

    kernel = functools.partial(
        _fwd_kernel, offsets=offsets, BD=BD, D=D, H=H, W=W, F=F, G=G,
        halo=halo)
    out = pl.pallas_call(
        kernel,
        grid=(B, D // BD),
        in_specs=[
            pl.BlockSpec((None, BD, F, H * W), lambda b, z: (b, z, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, BD, G, H * W),
                               lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, G, H * W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BD + 2 * halo, F, H * W), jnp.float32),
            pltpu.VMEM((BD + 2 * halo, G, H * W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(theta2, phi2, g2)
    return _unlayout(out, B, D, H, W, G)


def _vjp_fwd(theta, phi, g_cam, offsets, block_d, interpret):
    out = _fwd_impl(theta, phi, g_cam, offsets, block_d, interpret)
    return out, (theta, phi, g_cam)


def _vjp_bwd(offsets, block_d, interpret, res, ybar):
    theta, phi, g_cam = res
    B, D, H, W, F = theta.shape
    G = g_cam.shape[-1]
    offsets = tuple(map(tuple, offsets))
    halo = max(abs(o[0]) for o in offsets)
    # the gradient kernel holds 5 haloed slabs + 3 output blocks in VMEM:
    # half the forward block depth keeps it inside the 16MB scoped limit
    BD = _block_d(D, max(1, min(block_d, block_d // 2 or 1)))

    theta2 = _layout(theta, B, D, H, W, F)
    phi2p = _zpad(_layout(phi, B, D, H, W, F), halo)
    g2p = _zpad(_layout(g_cam, B, D, H, W, G), halo)
    ybar2 = _layout(ybar, B, D, H, W, G)

    scal_kernel = functools.partial(
        _scal_kernel, offsets=offsets, BD=BD, D=D, H=H, W=W, F=F, G=G,
        halo=halo)
    scal = pl.pallas_call(
        scal_kernel,
        grid=(B, D // BD),
        in_specs=[
            pl.BlockSpec((None, BD, F, H * W), lambda b, z: (b, z, 0, 0)),
            pl.BlockSpec((None, BD, G, H * W), lambda b, z: (b, z, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, BD, 4, H * W),
                               lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, 4, H * W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BD + 2 * halo, F, H * W), jnp.float32),
            pltpu.VMEM((BD + 2 * halo, G, H * W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(theta2, ybar2, phi2p, g2p)

    theta2p = _zpad(theta2, halo)
    ybar2p = _zpad(ybar2, halo)
    scalp = _zpad(scal, halo)

    bwd_kernel = functools.partial(
        _bwd_kernel, offsets=offsets, BD=BD, D=D, H=H, W=W, F=F, G=G,
        halo=halo)
    hw = H * W
    dtheta2, dphi2, dg2 = pl.pallas_call(
        bwd_kernel,
        grid=(B, D // BD),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=[
            pl.BlockSpec((None, BD, F, hw), lambda b, z: (b, z, 0, 0)),
            pl.BlockSpec((None, BD, F, hw), lambda b, z: (b, z, 0, 0)),
            pl.BlockSpec((None, BD, G, hw), lambda b, z: (b, z, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, F, hw), jnp.float32),
            jax.ShapeDtypeStruct((B, D, F, hw), jnp.float32),
            jax.ShapeDtypeStruct((B, D, G, hw), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BD + 2 * halo, F, hw), jnp.float32),
            pltpu.VMEM((BD + 2 * halo, F, hw), jnp.float32),
            pltpu.VMEM((BD + 2 * halo, G, hw), jnp.float32),
            pltpu.VMEM((BD + 2 * halo, G, hw), jnp.float32),
            pltpu.VMEM((BD + 2 * halo, 4, hw), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(theta2p, phi2p, g2p, ybar2p, scalp)

    dtheta = _unlayout(dtheta2, B, D, H, W, F).astype(theta.dtype)
    dphi = _unlayout(dphi2, B, D, H, W, F).astype(phi.dtype)
    dg = _unlayout(dg2, B, D, H, W, G).astype(g_cam.dtype)
    return dtheta, dphi, dg


stencil_attention.defvjp(_vjp_fwd, _vjp_bwd)


def stencil_attention_pallas(theta, phi, g_cam, offsets, block_d=4,
                             interpret=False):
    """Back-compat alias of `stencil_attention` (now batched over the grid
    and differentiable)."""
    return stencil_attention(theta, phi, g_cam, tuple(map(tuple, offsets)),
                             block_d, interpret)
