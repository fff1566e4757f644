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


def _plane_valid(H, W, M, dy, dx, dtype):
    """(1, M) mask: in-plane neighbour (y+dy, x+dx) inside the plane.

    M >= H*W is the lane-padded plane length; pad positions get iy >= H
    so every offset with dy >= 0 masks them, and for dy == -1 they are
    only ever *read* via rolls whose target position is itself masked
    (requires pad == 0 or pad >= W+1, enforced by supported())."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1) // W
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1) % W
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


def _fwd_kernel(w_ref, x_hbm, out_ref, acc, patch, slab, sem, *,
                H, W, M, Ci, Co, BD):
    """Forward: dx via a K=3*Ci patch, dz via slab rows; the three dy
    weight planes are STACKED on the dot's output dim ((3*Co, 3*Ci) x
    (3*Ci, M) per dz) so Co=64 layers fill the 128-row MXU, then combined
    with 2 output rolls (an output roll moves the small (Co, H*W) plane
    instead of 9 input planes)."""
    b, z = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(z * BD, BD + 2)], slab, sem)
    cp.start()
    w = w_ref[:]  # (3, 3*Co, 3*Ci): dz-major, dy*Co rows, dx-major cols
    cp.wait()

    # dx patches for every slab row, built once per grid step. The dx=0
    # column skips the roll and pad-lane mask: its pad garbage reaches
    # only output pad lanes (masked or sliced by every consumer); the dW
    # kernel keeps the mask (see fused_stack._cbr_kernel).
    for r in range(BD + 2):
        row = slab[r]
        patch[r, pl.ds(Ci, Ci)] = row
        for k, dx in ((0, -1), (2, 1)):
            patch[r, pl.ds(k * Ci, Ci)] = _roll_lanes(row, dx) * \
                _plane_valid(H, W, M, 0, dx, row.dtype)

    for r in range(BD):
        acc[:] = jnp.zeros_like(acc)
        for dzi in range(3):
            acc[:] += jax.lax.dot_general(
                w[dzi], patch[r + dzi],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (3*Co, M)
        v = acc[:]
        # out[y] += v[dy][y + dy], zero where y + dy leaves the plane;
        # dy=0 unmasked (only pad lanes are invalid there — defended on
        # read by every consumer)
        o = v[Co:2 * Co]
        for dyi, dy in ((0, -1), (2, 1)):
            o += _roll_lanes(v[dyi * Co:(dyi + 1) * Co], dy * W) * \
                _plane_valid(H, W, M, dy, 0, jnp.float32)
        out_ref[r] = o.astype(out_ref.dtype)


def _dw_kernel(x_hbm, dy_hbm, dw_ref, patch, dyb, slab, sems, semd, *,
               H, W, M, Ci, Co, BD):
    """All 27 offsets' dW contributions per slab load (same HBM traffic
    as the forward; the round-1 offset-major grid re-read x and dy 27x).

    dW[dz,dy,dx] = sum_p X[p + dz,dy,dx] . DY[p]. The dx shifts ride the
    forward's (3*Ci, M) x-patch; the dy shift moves to the DY side
    (dot(roll(P, dyW), yv*DY) == dot(P, roll(yv*DY, -dyW)) — the patch's
    x-validity mask is invariant under W-multiple rolls). Per row: 3
    masked DY rolls + 9 dots (3Ci, M)x(Co, M) -> (3Ci, Co).

    Both HBM operands ride plane-minor ((.., C, H*W)): Mosaic requires
    manual-DMA slices to keep a 128-aligned minor dim, which channel
    counts (32-256) don't satisfy but H*W (multiples of 128) does."""
    b, z = pl.program_id(0), pl.program_id(1)
    cp1 = pltpu.make_async_copy(x_hbm.at[b, pl.ds(z * BD, BD + 2)], slab,
                                sems)
    cp2 = pltpu.make_async_copy(dy_hbm.at[b, pl.ds(z * BD, BD)], dyb, semd)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    @pl.when(jnp.logical_and(b == 0, z == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # dx patches for every slab row (identical layout to the forward)
    for r in range(BD + 2):
        row = slab[r]
        for k, dx in enumerate((-1, 0, 1)):
            patch[r, pl.ds(k * Ci, Ci)] = _roll_lanes(row, dx) * \
                _plane_valid(H, W, M, 0, dx, row.dtype)

    for r in range(BD):
        # the 3 dy-shifted cotangent planes stacked on the dot's output
        # dim: one (3Ci, M) x (3Co, M) dot per dz instead of three Co-wide
        dyr3 = jnp.concatenate([
            _roll_lanes(dyb[r] * _plane_valid(H, W, M, dy_, 0, dyb.dtype),
                        -dy_ * W)
            for dy_ in (-1, 0, 1)], axis=0)               # (3*Co, M)
        for dzi in range(3):
            dw_ref[dzi] += jax.lax.dot_general(
                patch[r + dzi], dyr3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (3Ci, 3Co)


def _plane_pad(HW):
    """Lane-padded plane length: the tiled HBM layout pads the minor dim
    to 128 anyway; padding explicitly (with zeros) keeps manual DMAs
    tile-aligned and the pad lanes provably masked."""
    return -(-HW // 128) * 128


def _to_cp(x, B, D, H, W, C, M):
    """(B,D,H,W,C) -> z-padded, lane-padded (B, D+2, C, M), dtype
    preserved (bf16 stays bf16 through DMA and MXU feeds; f32 accum)."""
    x = jnp.transpose(x.reshape(B, D, H * W, C), (0, 1, 3, 2))
    return jnp.pad(x, [(0, 0), (1, 1), (0, 0), (0, M - H * W)])


def _fwd_impl(x, w, interpret):
    B, D, H, W, Ci = x.shape
    Co = w.shape[-1]
    M = _plane_pad(H * W)
    xp = _to_cp(x, B, D, H, W, Ci, M)
    # (3, 3*Co, 3*Ci): [dz][dy*Co+co, dx*Ci+ci] = w[dz,dy,dx,ci,co]
    wk = jnp.transpose(w.astype(x.dtype), (0, 1, 4, 2, 3)).reshape(
        3, 3 * Co, 3 * Ci)

    # patch scratch is the VMEM governor: (BD+2) rows of (3*Ci, M), after
    # the (3*Co, M) f32 dy-stacked accumulator takes its cut
    acc_bytes = 3 * Co * M * 4
    per_row = 3 * Ci * M * x.dtype.itemsize
    BD = int(max(1, min(8, (48 * 1024 * 1024 - acc_bytes) // per_row - 2)))
    while D % BD:
        BD -= 1
    kernel = functools.partial(_fwd_kernel, H=H, W=W, M=M, Ci=Ci, Co=Co,
                               BD=BD)
    out = pl.pallas_call(
        kernel,
        grid=(B, D // BD),
        in_specs=[
            pl.BlockSpec((3, 3 * Co, 3 * Ci), lambda b, z: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, BD, Co, M),
                               lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, Co, M), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3 * Co, M), jnp.float32),
            pltpu.VMEM((BD + 2, 3 * Ci, M), x.dtype),
            pltpu.VMEM((BD + 2, Ci, M), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wk, xp)
    # (B, D, Co, M) -> NDHWC (dropping the lane pad)
    return jnp.transpose(out[..., :H * W], (0, 1, 3, 2)).reshape(
        B, D, H, W, Co)


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

    M = _plane_pad(H * W)
    xp = _to_cp(x, B, D, H, W, Ci, M)
    # plane-minor dy: (B, D, Co, M) keeps the DMA minor dim 128-aligned
    dyp = jnp.pad(jnp.transpose(dy.reshape(B, D, H * W, Co), (0, 1, 3, 2)),
                  [(0, 0), (0, 0), (0, 0), (0, M - H * W)])

    # VMEM governor: patch (3Ci) + slab (Ci) + dyb (Co) rows, + dw accum
    per_row = (4 * Ci + Co) * M * x.dtype.itemsize
    dw_bytes = 9 * 3 * Ci * Co * 4
    BD = int(max(1, min(8, (44 * 1024 * 1024 - dw_bytes) // per_row - 2)))
    while D % BD:
        BD -= 1
    kernel = functools.partial(_dw_kernel, H=H, W=W, M=M, Ci=Ci, Co=Co,
                               BD=BD)
    dw = pl.pallas_call(
        kernel,
        grid=(B, D // BD),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((3, 3 * Ci, 3 * Co), lambda b, z: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3 * Ci, 3 * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BD + 2, 3 * Ci, M), x.dtype),
            pltpu.VMEM((BD, Co, M), dy.dtype),
            pltpu.VMEM((BD + 2, Ci, M), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dyp)
    # (dz, dx*Ci, dy*Co) -> (dz, dy, dx, ci, co)
    dw = dw.reshape(3, 3, Ci, 3, Co).transpose(0, 3, 1, 2, 4).astype(w.dtype)
    return dx, dw


conv3d_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def supported(x_shape, kernel_size, strides, padding):
    """The kernel covers the DC3D conv configuration: k=3^3, stride 1,
    SAME ('(1,1)' symmetric) padding. Planes are lane-padded to 128;
    safe when the pad is 0 or at least W+1 (the largest roll), so every
    pad-lane read lands on a masked position — true for all DC3D planes
    (80^2 pad 0, 40^2 pad 64 >= 41, 20^2 pad 112 >= 21)."""
    H, W = x_shape[-3], x_shape[-2]
    pad = (-(H * W)) % 128
    return (tuple(kernel_size) == (3, 3, 3)
            and tuple(strides) == (1, 1, 1)
            and (pad == 0 or pad >= W + 1)
            and x_shape[-1] >= 8  # sub-sublane-tile channel counts -> XLA
            and padding in ("SAME", ((1, 1), (1, 1), (1, 1))))
