"""Pallas TPU kernels: fused 3x3x3 'SAME' convolution (the U-Net hot op).

XLA's conv3d lowering reaches only 5-25% of the v5e MXU on the DC3D layer
shapes (80^3 batches with 32-192 channels); these kernels reformulate the
convolution as large explicit matmuls fed from VMEM:

* layout: volumes ride as (B, D, C, H*W) so the flattened plane sits on
  the 128-lane minor dimension (80^2 = 6400 = 50x128 exactly) and the
  channel dim on sublanes; in-plane neighbour shifts are lane rolls with
  iota validity masks (SAME zero padding), z shifts index a z-padded slab
  DMA'd to VMEM;
* narrow layers (C_in < 128): per z-offset, the 9 in-plane shifts are
  packed into a (9*C_in, H*W) patch buffer and contracted with the
  (9*C_in, C_out) weight plane in ONE MXU dot (K = 9*C_in instead of the
  K = C_in that starves the systolic array);
* wide layers: 27 accumulating dots with K = C_in (already MXU-sized);
* f32 accumulation, bf16/f32 in and out.

Training uses a custom VJP built from the same machinery:
  dx = conv3d(dy, W flipped spatially with C_in/C_out swapped)   (exact)
  dW = per-offset reduction dots (C_in, M) @ (M, C_out) accumulated
       across an offset-major grid                                (exact)

Replaces the reference's cuDNN conv3d blocks (reference parts.py:66-113);
wired into models/blocks.py behind use_pallas_conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFS = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)]


def _plane_valid(H, W, dy, dx, dtype):
    """(1, H*W) mask: in-plane neighbour (y+dy, x+dx) inside the plane."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, H * W), 1) // W
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, H * W), 1) % W
    m = ((iy + dy >= 0) & (iy + dy < H) & (ix + dx >= 0) & (ix + dx < W))
    return m.astype(dtype)


def _roll_lanes(x, s):
    """np.roll(x, -s) on the minor axis via static slices (Mosaic's
    dynamic_rotate does not lower for bf16 vectors; two lane-shifts do)."""
    size = x.shape[-1]
    s = s % size
    if s == 0:
        return x
    return jnp.concatenate([x[..., s:], x[..., :s]], axis=-1)


def _shifted(slab, dz, dy, dx, H, W, BD_index):
    """Neighbour plane x[z+dz, :, p + dy*W+dx] for the output row, masked
    to zero outside the plane. slab: (BD+2, C, H*W) with z padding 1."""
    base = slab[BD_index + dz + 1]  # (C, H*W)
    rolled = _roll_lanes(base, dy * W + dx)
    return rolled * _plane_valid(H, W, dy, dx, base.dtype)


def _fwd_kernel(w_ref, x_hbm, out_ref, acc, patch, slab, sem, *,
                H, W, Ci, Co, BD):
    """Forward: dx via a K=3*Ci patch, dz via slab rows, dy via 3 output
    rolls (an output roll moves the small (Co, H*W) plane instead of 9
    input planes — VPU copies are the kernel's second-order cost)."""
    b, z = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(z * BD, BD + 2)], slab, sem)
    cp.start()
    w = w_ref[:]  # (9, Co, 3*Ci), j = dz*3+dy, K-minor is dx-major
    cp.wait()

    # dx patches for every slab row, built once per grid step
    for r in range(BD + 2):
        row = slab[r]
        for k, dx in enumerate((-1, 0, 1)):
            patch[r, pl.ds(k * Ci, Ci)] = _roll_lanes(row, dx) * \
                _plane_valid(H, W, 0, dx, row.dtype)

    for r in range(BD):
        acc[:] = jnp.zeros_like(acc)
        for dyi, dy in enumerate((-1, 0, 1)):
            v = jnp.zeros((Co, H * W), jnp.float32)
            for dzi in range(3):
                v += jax.lax.dot_general(
                    w[dzi * 3 + dyi], patch[r + dzi],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Co, H*W)
            # out[y] += v[y + dy], zero where y + dy leaves the plane
            acc[:] += _roll_lanes(v, dy * W) * \
                _plane_valid(H, W, dy, 0, jnp.float32)
        out_ref[r] = acc[:].astype(out_ref.dtype)


def _dw_kernel(x_hbm, dy_hbm, dw_ref, slab, dyb, sems, semd, *,
               H, W, Ci, Co, BD):
    """dW[o] = sum over voxels of x_shift[o] (Ci, M) @ dy (M, Co);
    offset-major grid, accumulated across the (b, z) minor dims."""
    o, b, z = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cp1 = pltpu.make_async_copy(x_hbm.at[b, pl.ds(z * BD, BD + 2)], slab,
                                sems)
    cp2 = pltpu.make_async_copy(dy_hbm.at[b, pl.ds(z * BD, BD)], dyb, semd)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # offset decoded from the traced grid index: dynamic slab row + roll
    dz = o // 9 - 1
    dy_ = (o % 9) // 3 - 1
    dx = o % 3 - 1
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, H * W), 1) // W
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, H * W), 1) % W
    valid = ((iy + dy_ >= 0) & (iy + dy_ < H) &
             (ix + dx >= 0) & (ix + dx < W))
    shift = jnp.mod(-(dy_ * W + dx), H * W)

    @pl.when(jnp.logical_and(b == 0, z == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    acc = jnp.zeros((Ci, Co), jnp.float32)
    for r in range(BD):
        base = slab[pl.ds(r + 1 + dz, 1)][0]             # (Ci, H*W)
        # traced shift -> dynamic_rotate, which only lowers for f32
        xs = pltpu.roll(base.astype(jnp.float32), shift, 1) * \
            valid.astype(jnp.float32)
        acc += jax.lax.dot_general(
            xs, dyb[r].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Ci, Co)
    dw_ref[:] += acc


def _block_d_for(Ci, H, W, budget_bytes=6 * 1024 * 1024):
    per_row = Ci * H * W * 4  # slab rows held as f32 in VMEM
    bd = max(1, budget_bytes // per_row - 2)
    return int(min(bd, 8))


def _to_cp(x, B, D, H, W, C):
    """(B,D,H,W,C) -> z-padded (B, D+2, C, H*W), dtype preserved (bf16
    inputs stay bf16 through DMA and MXU feeds; accumulation is f32)."""
    x = jnp.transpose(x.reshape(B, D, H * W, C), (0, 1, 3, 2))
    return jnp.pad(x, [(0, 0), (1, 1), (0, 0), (0, 0)])


def _fwd_impl(x, w, interpret):
    B, D, H, W, Ci = x.shape
    Co = w.shape[-1]
    xp = _to_cp(x, B, D, H, W, Ci)
    # (9, Co, 3*Ci): [dz*3+dy][co, dx*Ci+ci] = w[dz,dy,dx,ci,co]
    wk = jnp.transpose(w.astype(x.dtype), (0, 1, 4, 2, 3)).reshape(
        9, Co, 3 * Ci)

    # patch scratch is the VMEM governor: (BD+2) rows of (3*Ci, H*W)
    per_row = 3 * Ci * H * W * x.dtype.itemsize
    BD = int(max(1, min(8, (48 * 1024 * 1024) // per_row - 2)))
    while D % BD:
        BD -= 1
    kernel = functools.partial(_fwd_kernel, H=H, W=W, Ci=Ci, Co=Co, BD=BD)
    out = pl.pallas_call(
        kernel,
        grid=(B, D // BD),
        in_specs=[
            pl.BlockSpec((9, Co, 3 * Ci), lambda b, z: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, BD, Co, H * W),
                               lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, Co, H * W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Co, H * W), jnp.float32),
            pltpu.VMEM((BD + 2, 3 * Ci, H * W), x.dtype),
            pltpu.VMEM((BD + 2, Ci, H * W), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wk, xp)
    # (B, D, Co, H*W) -> NDHWC
    return jnp.transpose(out, (0, 1, 3, 2)).reshape(B, D, H, W, Co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_pallas(x, w, interpret=False):
    """3x3x3 stride-1 SAME convolution, NDHWC x DHWIO -> NDHWC.

    Matches jax.lax.conv_general_dilated(x, w, (1,1,1), 'SAME') with f32
    accumulation; differentiable (custom VJP on the same kernels).
    """
    return _fwd_impl(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    return _fwd_impl(x, w, interpret), (x, w)


def _flip_w(w):
    """Spatially flipped, channel-swapped weights: conv_T kernel."""
    return jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)


def _vjp_bwd(interpret, res, dy):
    x, w = res
    B, D, H, W, Ci = x.shape
    Co = w.shape[-1]
    dx = _fwd_impl(dy, _flip_w(w), interpret).astype(x.dtype)

    xp = _to_cp(x, B, D, H, W, Ci)
    dyp = dy.reshape(B, D, H * W, Co)

    BD = _block_d_for(Ci + Co, H, W)
    while D % BD:
        BD -= 1
    kernel = functools.partial(_dw_kernel, H=H, W=W, Ci=Ci, Co=Co, BD=BD)
    dw = pl.pallas_call(
        kernel,
        grid=(27, B, D // BD),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, Ci, Co), lambda o, b, z: (o, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((27, Ci, Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BD + 2, Ci, H * W), x.dtype),
            pltpu.VMEM((BD, H * W, Co), dy.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dyp)
    dw = dw.reshape(3, 3, 3, Ci, Co).astype(w.dtype)
    return dx, dw


conv3d_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def supported(x_shape, kernel_size, strides, padding):
    """The kernel covers the DC3D conv configuration: k=3^3, stride 1,
    SAME ('(1,1)' symmetric) padding, and a plane that fills whole lane
    tiles (H*W % 128 == 0 — true for the hot 80^2/40^2 planes; smaller
    planes stay on XLA, they are cheap there)."""
    H, W = x_shape[-3], x_shape[-2]
    return (tuple(kernel_size) == (3, 3, 3)
            and tuple(strides) == (1, 1, 1)
            and (H * W) % 128 == 0
            and x_shape[-1] >= 8  # sub-sublane-tile channel counts -> XLA
            and padding in ("SAME", ((1, 1), (1, 1), (1, 1))))
