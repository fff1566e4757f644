"""Pallas TPU kernel: fused k^3-stencil attention (the PCM hot op).

The XLA lowering of the stencil attention (models/pcm.py) materialises the
K (<=27) shifted logit maps in HBM; this kernel keeps a z-slab of the
projected features in VMEM and produces attention + aggregation in one
pass — one HBM read of theta/phi/G(cam), one write of the output.

Scope: the shipped merge type 'scaled_dot_product_relu'
(st_dram_ref_att.py:77) in inference; training and the other 12 merges use
the XLA path (models/pcm.py). Grid: (B, D/BD); each program DMAs a
(BD+2*halo) slab of phi/g_cam from HBM, computes masked per-voxel softmax
over the stencil and the weighted aggregation.

Inputs are channels-last volumes; H*W should be lane-friendly (the 64^3
attention grid of the shipped config flattens to 4096 = 32 sublanes x 128
lanes exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(theta_ref, phi_hbm, gcam_hbm, out_ref, *, offsets, BD, D, H, W,
            F, G, halo, scratch_phi, scratch_g, sem_phi, sem_g):
    zb = pl.program_id(1)
    z0 = zb * BD

    # DMA the haloed phi/gcam slabs HBM -> VMEM (input is z-padded by halo,
    # so the padded slab starts exactly at z0)
    cp1 = pltpu.make_async_copy(
        phi_hbm.at[pl.ds(z0, BD + 2 * halo)], scratch_phi, sem_phi)
    cp2 = pltpu.make_async_copy(
        gcam_hbm.at[pl.ds(z0, BD + 2 * halo)], scratch_g, sem_g)
    cp1.start()
    cp2.start()
    theta = theta_ref[:]  # (BD, H*W, F)
    cp1.wait()
    cp2.wait()

    iz = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 0) + z0
    iy = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 1) // W
    ix = jax.lax.broadcasted_iota(jnp.int32, (BD, H * W), 1) % W

    # first pass: degree + running max of relu-logits is not needed because
    # relu bounds logits below by 0 and the masked softmax uses exp(x - m)
    # with m >= 0; we accumulate exp terms and the weighted sum in one pass
    # using m = max over k (computed in a first loop over the small K).
    deg = jnp.zeros((BD, H * W), jnp.float32)
    logits = []
    valids = []
    for dz, dy, dx in offsets:
        valid = ((iz + dz >= 0) & (iz + dz < D) &
                 (iy + dy >= 0) & (iy + dy < H) &
                 (ix + dx >= 0) & (ix + dx < W))
        # phi slab is haloed in z: local z index = z + halo + dz
        phi_s = scratch_phi[pl.ds(halo + dz, BD)]  # (BD, H*W, F)
        # shift within the plane: roll the flattened H*W axis by dy*W+dx;
        # out-of-row wrap is killed by the validity mask
        shift = (-(dy * W + dx)) % (H * W)
        phi_s = pltpu.roll(phi_s, shift, 1)
        logit = jnp.sum(theta * phi_s, axis=-1)  # (BD, H*W)
        v = valid.astype(jnp.float32)
        logits.append(jnp.maximum(logit, 0.0))
        valids.append(v)
        deg = deg + v

    inv_sqrt_deg = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    m = jnp.zeros((BD, H * W), jnp.float32)
    for lg, v in zip(logits, valids):
        m = jnp.maximum(m, jnp.where(v > 0, lg * inv_sqrt_deg, 0.0))

    denom = jnp.zeros((BD, H * W), jnp.float32)
    acc = jnp.zeros((BD, H * W, G), jnp.float32)
    for (dz, dy, dx), lg, v in zip(offsets, logits, valids):
        e = jnp.exp(lg * inv_sqrt_deg - m) * v
        denom = denom + e
        g_s = scratch_g[pl.ds(halo + dz, BD)]
        g_s = pltpu.roll(g_s, (-(dy * W + dx)) % (H * W), 1)
        acc = acc + e[..., None] * g_s

    out_ref[:] = acc / jnp.maximum(denom, 1e-12)[..., None]


def stencil_attention_pallas(theta, phi, g_cam, offsets, block_d=8,
                             interpret=False):
    """Fused stencil attention (merge='scaled_dot_product_relu').

    theta, phi: (B, D, H, W, F); g_cam: (B, D, H, W, G).
    Returns (B, D, H, W, G): per-voxel masked softmax over the stencil of
    relu(theta . phi_j)/sqrt(deg), aggregating g_cam.
    """
    B, D, H, W, F = theta.shape
    G = g_cam.shape[-1]
    offsets = tuple(map(tuple, offsets))
    halo = max(abs(o[0]) for o in offsets)
    BD = min(block_d, D)
    while D % BD:
        BD -= 1

    theta2 = theta.reshape(B, D, H * W, F).astype(jnp.float32)
    # z-pad phi/gcam by halo so slab DMAs never go out of bounds
    pad = [(0, 0), (halo, halo), (0, 0), (0, 0)]
    phi2 = jnp.pad(phi.reshape(B, D, H * W, F).astype(jnp.float32),
                   pad)
    g2 = jnp.pad(g_cam.reshape(B, D, H * W, G).astype(jnp.float32), pad)

    kernel = functools.partial(
        _kernel, offsets=offsets, BD=BD, D=D, H=H, W=W, F=F, G=G, halo=halo)

    def run(theta_b, phi_b, g_b):
        return pl.pallas_call(
            lambda t, p, g, o, sp, sg, s1, s2: kernel(
                t, p, g, o, scratch_phi=sp, scratch_g=sg,
                sem_phi=s1, sem_g=s2),
            grid=(1, D // BD),
            in_specs=[
                pl.BlockSpec((None, BD, H * W, F),
                             lambda b, z: (0, z, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((None, BD, H * W, G),
                                   lambda b, z: (0, z, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, D, H * W, G), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((BD + 2 * halo, H * W, F), jnp.float32),
                pltpu.VMEM((BD + 2 * halo, H * W, G), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(theta_b[None], phi_b, g_b)[0]

    outs = [run(theta2[b], phi2[b], g2[b]) for b in range(B)]
    return jnp.stack(outs).reshape(B, D, H, W, G)
