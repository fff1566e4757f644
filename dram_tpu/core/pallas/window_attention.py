"""Pallas TPU kernel: fused k^3-stencil attention (the PCM hot op).

The XLA lowering of the stencil attention (models/pcm.py) materialises the
K (<=27) shifted logit maps in HBM; this kernel keeps a z-slab of the
projected features in VMEM and produces attention + aggregation in one
pass — one HBM read of theta/phi/G(cam), one write of the output.

Layout: volumes are carried as (z, channel, H*W) so the flattened plane
rides the 128-lane minor dimension (64^3 grids flatten to 4096 = 32x128
exactly) and the small channel dim (f_dim/g_dim <= 8) sits on sublanes;
in-plane neighbour shifts are lane rolls, z shifts index the haloed VMEM
slab, and out-of-volume neighbours are masked by global-coordinate
validity.

Scope: the shipped merge type 'scaled_dot_product_relu'
(st_dram_ref_att.py:77) in inference; training and the other 12 merges use
the XLA path (models/pcm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(theta_ref, phi_hbm, gcam_hbm, out_ref, scratch_phi, scratch_g,
            sem_phi, sem_g, *, offsets, BD, D, H, W, F, G, halo):
    zb = pl.program_id(1)
    z0 = zb * BD

    # DMA the haloed phi/gcam slabs HBM -> VMEM (inputs are z-padded by
    # halo, so the padded slab starts exactly at z0)
    cp1 = pltpu.make_async_copy(
        phi_hbm.at[pl.ds(z0, BD + 2 * halo)], scratch_phi, sem_phi)
    cp2 = pltpu.make_async_copy(
        gcam_hbm.at[pl.ds(z0, BD + 2 * halo)], scratch_g, sem_g)
    cp1.start()
    cp2.start()
    theta = theta_ref[:]  # (BD, F, H*W)
    cp1.wait()
    cp2.wait()

    iz = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 0) + z0
    iy = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 1) // W
    ix = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 1) % W

    def valid_of(dz, dy, dx):
        return ((iz + dz >= 0) & (iz + dz < D) &
                (iy + dy >= 0) & (iy + dy < H) &
                (ix + dx >= 0) & (ix + dx < W)).astype(jnp.float32)

    def logit_of(dz, dy, dx):
        phi_s = scratch_phi[pl.ds(halo + dz, BD)]  # (BD, F, H*W)
        phi_s = pltpu.roll(phi_s, (-(dy * W + dx)) % (H * W), 2)
        return jnp.maximum(jnp.sum(theta * phi_s, axis=1), 0.0)

    # three streaming passes over the K offsets (recomputing the cheap lane
    # rolls) instead of keeping K logit/valid maps live — bounded VMEM
    deg = jnp.zeros((BD, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        deg = deg + valid_of(dz, dy, dx)
    inv_sqrt_deg = jax.lax.rsqrt(jnp.maximum(deg, 1.0))

    # relu bounds logits below by 0, so the masked max is >= 0 and the
    # masked exp-sum needs no -inf handling
    m = jnp.zeros((BD, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        s = logit_of(dz, dy, dx) * inv_sqrt_deg
        m = jnp.maximum(m, s * valid_of(dz, dy, dx))

    denom = jnp.zeros((BD, H * W), jnp.float32)
    acc = jnp.zeros((BD, G, H * W), jnp.float32)
    for dz, dy, dx in offsets:
        e = jnp.exp(logit_of(dz, dy, dx) * inv_sqrt_deg - m) * \
            valid_of(dz, dy, dx)
        denom = denom + e
        g_s = scratch_g[pl.ds(halo + dz, BD)]
        g_s = pltpu.roll(g_s, (-(dy * W + dx)) % (H * W), 2)
        acc = acc + e[:, None, :] * g_s

    out_ref[:] = acc / jnp.maximum(denom, 1e-12)[:, None, :]


def stencil_attention_pallas(theta, phi, g_cam, offsets, block_d=4,
                             interpret=False):
    """Fused stencil attention (merge='scaled_dot_product_relu').

    theta, phi: (B, D, H, W, F); g_cam: (B, D, H, W, G).
    Returns (B, D, H, W, G): per-voxel masked softmax over the stencil of
    relu(theta . phi_j)/sqrt(deg_i), aggregating g_cam.
    """
    B, D, H, W, F = theta.shape
    G = g_cam.shape[-1]
    offsets = tuple(map(tuple, offsets))
    halo = max(abs(o[0]) for o in offsets)
    BD = min(block_d, D)
    while D % BD:
        BD -= 1

    # channels-on-sublanes layout: (D, C, H*W)
    def to_zc(x, C):
        return jnp.transpose(x.reshape(B, D, H * W, C).astype(jnp.float32),
                             (0, 1, 3, 2))

    theta2 = to_zc(theta, F)
    pad = [(0, 0), (halo, halo), (0, 0), (0, 0)]
    phi2 = jnp.pad(to_zc(phi, F), pad)
    g2 = jnp.pad(to_zc(g_cam, G), pad)

    kernel = functools.partial(
        _kernel, offsets=offsets, BD=BD, D=D, H=H, W=W, F=F, G=G, halo=halo)

    def run(theta_b, phi_b, g_b):
        out = pl.pallas_call(
            kernel,
            grid=(1, D // BD),
            in_specs=[
                pl.BlockSpec((None, BD, F, H * W),
                             lambda b, z: (0, z, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((None, BD, G, H * W),
                                   lambda b, z: (0, z, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, D, G, H * W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((BD + 2 * halo, F, H * W), jnp.float32),
                pltpu.VMEM((BD + 2 * halo, G, H * W), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(theta_b[None], phi_b, g_b)
        return out[0]

    outs = [run(theta2[b], phi2[b], g2[b]) for b in range(B)]
    out = jnp.stack(outs)  # (B, D, G, H*W)
    return jnp.transpose(out, (0, 1, 3, 2)).reshape(B, D, H, W, G)
