"""Pallas 2x2x2 max-pool (stride 2) for the fused stack's cm activations.

The XLA lowering of the fused path's reshape+max pool (cm.py maxpool2_cm)
is cheap forward but expensive backward: the reduce-max VJP materializes
window broadcasts of the pooled maxima and the pooled cotangent at FULL
pre-pool resolution with size-2 minor dims — T(2,128)-tiled vregs are 64x
padded, so the 80^3/64ch DC3D encoder layer alone measures ~25 ms
fwd+bwd. This kernel streams x once and writes dx once; maxima and tie
counts are recomputed on VMEM rows, nothing full-size is materialized.

Mosaic cannot shape-cast between the flat (C, H*W) lane layout and the
(C, H, W) plane at W != 128 (tools/probe_mosaic_ops.py), so the kernel
takes 5-D (B, D, C, H, W) operands — the flat<->5-D relayout is left to
XLA (measured 2.4 ms for a full round trip at the 80^3 layer, and the
forward-relayout cost is paid once: the VJP residual keeps the 5-D x).
In-kernel halvings ride ops that do lower: leading-dim split + reduce for
H pairs, a lane roll + max followed by an MXU compaction dot with a 0/1
even-lane selection matrix for W pairs (pair-sum / pair-expand matrices
serve the tie counts and the backward re-broadcast).

Gradient tie semantics match maxpool2_cm exactly (jax's reduce_max VJP:
the cotangent is split evenly across all tied window positions), so the
fused path's numerics are unchanged when the kernel is enabled.

Enabled for even dims with W >= 64 (smaller planes waste the 128-lane
vregs and their XLA pool is already cheap). Reference analog:
nn.MaxPool3d(2, 2) in ConvPoolBlock5d (reference parts.py:157-196).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv3d import _plane_pad, _roll_lanes


def _row_dma(src_hbm, buf2, sems, b, z, *, rows, start):
    """Start/wait the contiguous `rows`-row copy of block (b, z) into
    double buffer buf2[z % 2]."""
    i = jax.lax.rem(z, 2)
    cp = pltpu.make_async_copy(src_hbm.at[b, pl.ds(z * rows, rows)],
                               buf2.at[i], sems.at[i])
    cp.start() if start else cp.wait()


def _db_read(src_hbm, buf2, sems, b, z, nz, *, rows):
    """Double-buffer step: ensure block z in flight, prefetch z+1, wait."""
    @pl.when(z == 0)
    def _():
        _row_dma(src_hbm, buf2, sems, b, 0, rows=rows, start=True)

    if nz > 1:
        @pl.when(z + 1 < nz)
        def _():
            _row_dma(src_hbm, buf2, sems, b, z + 1, rows=rows, start=True)
    _row_dma(src_hbm, buf2, sems, b, z, rows=rows, start=False)
    return jax.lax.rem(z, 2)


def _iota2(shape, d0, d1):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, d0),
            jax.lax.broadcasted_iota(jnp.int32, shape, d1))


def _sel_even(W, dtype):
    """(W, W/2) 0/1: picks even lanes (the lane holding each pair max)."""
    r, c = _iota2((W, W // 2), 0, 1)
    return (r == 2 * c).astype(dtype)


def _sum_pairs(W, dtype):
    """(W, W/2) 0/1: sums lane pairs."""
    r, c = _iota2((W, W // 2), 0, 1)
    return ((r == 2 * c) | (r == 2 * c + 1)).astype(dtype)


def _expand_pairs(W, dtype):
    """(W/2, W) 0/1: broadcasts each value to its lane pair."""
    r, c = _iota2((W // 2, W), 0, 1)
    return ((c == 2 * r) | (c == 2 * r + 1)).astype(dtype)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pool_max(v, H, W):
    """(C, H, W) -> (C, H/2, W/2) f32 window max. Exact: the compaction
    dot picks single (input-representable) values."""
    C = v.shape[0]
    u = jnp.max(v.reshape(C, H // 2, 2, W), axis=2)         # (C, H2, W)
    u = jnp.maximum(u, _roll_lanes(u, 1))                   # pair max @ even
    u = _dot(u.reshape(C * (H // 2), W), _sel_even(W, u.dtype))
    return u.reshape(C, H // 2, W // 2)


def _pool_sum(v, H, W):
    """(C, H, W) f32 -> (C, H/2, W/2) window sum (tie counting)."""
    C = v.shape[0]
    u = v.reshape(C, H // 2, 2, W).sum(axis=2)
    u = _dot(u.reshape(C * (H // 2), W), _sum_pairs(W, u.dtype))
    return u.reshape(C, H // 2, W // 2)


def _up(p, H, W):
    """(C, H/2, W/2) f32 -> (C, H, W) window broadcast."""
    C = p.shape[0]
    q = _dot(p.reshape(C * (H // 2), W // 2), _expand_pairs(W, p.dtype))
    q = q.reshape(C, H // 2, 1, W)
    q = jnp.broadcast_to(q, (C, H // 2, 2, W))
    return q.reshape(C, H, W)


def _pad_w(v, Wp):
    if Wp > v.shape[-1]:
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, Wp - v.shape[-1])])
    return v


def _mp_fwd_kernel(x_hbm, out_ref, slab2, sems, *, H, W, BDo):
    """Operands ride with the W (lane) dim padded to 128 — manual DMA
    slices must be tile-aligned on the minor dim; values are sliced back
    to the true W inside the kernel."""
    b, z = pl.program_id(0), pl.program_id(1)
    nz = pl.num_programs(1)
    buf = _db_read(x_hbm, slab2, sems, b, z, nz, rows=2 * BDo)
    for ro in range(BDo):
        v = jnp.maximum(slab2[buf, 2 * ro], slab2[buf, 2 * ro + 1])[..., :W]
        out_ref[ro] = _pad_w(_pool_max(v, H, W),
                             out_ref.shape[-1]).astype(out_ref.dtype)


def _mp_bwd_kernel(x_hbm, dp_hbm, dx_ref, slab2, dpb2, sems, semd, *,
                   H, W, BDo):
    b, z = pl.program_id(0), pl.program_id(1)
    nz = pl.num_programs(1)

    @pl.when(z == 0)
    def _():
        _row_dma(dp_hbm, dpb2, semd, b, 0, rows=BDo, start=True)

    if nz > 1:
        @pl.when(z + 1 < nz)
        def _():
            _row_dma(dp_hbm, dpb2, semd, b, z + 1, rows=BDo, start=True)

    buf = _db_read(x_hbm, slab2, sems, b, z, nz, rows=2 * BDo)
    _row_dma(dp_hbm, dpb2, semd, b, z, rows=BDo, start=False)

    Wp = dx_ref.shape[-1]
    for ro in range(BDo):
        v0 = slab2[buf, 2 * ro][..., :W].astype(jnp.float32)
        v1 = slab2[buf, 2 * ro + 1][..., :W].astype(jnp.float32)
        pooled = _pool_max(jnp.maximum(v0, v1), H, W)       # (C, H2, W2)
        pb = _up(pooled, H, W)                              # (C, H, W)
        eq0 = (v0 == pb).astype(jnp.float32)
        eq1 = (v1 == pb).astype(jnp.float32)
        cnt = _pool_sum(eq0 + eq1, H, W)
        g = dpb2[buf, ro][..., :W // 2].astype(jnp.float32) / cnt
        gb = _up(g, H, W)
        dx_ref[2 * ro] = _pad_w(eq0 * gb, Wp).astype(dx_ref.dtype)
        dx_ref[2 * ro + 1] = _pad_w(eq1 * gb, Wp).astype(dx_ref.dtype)


def pool_supported(D, H, W):
    """Even dims; W >= 64 keeps the 128-lane vreg waste of the 5-D plane
    form tolerable (only the 80^3 DC3D layer qualifies).

    OFF by default (DRAM_PALLAS_POOL=1 enables): measured END-TO-END the
    kernel loses to the XLA cm pool — its in-kernel compaction dots plus
    the flat<->5-D boundary relayouts cost ~24 ms/step vs ~19 ms for the
    XLA reduce-max path (bs10 DC3DATGeneric step: 413 ms with XLA pool,
    421 ms with the kernel), even though the kernel wins the standalone
    microbenchmark. Kept (bit-exact, tested) as the base for a future
    flat-layout rewrite."""
    import os
    if os.environ.get("DRAM_PALLAS_POOL", "0") != "1":
        return False
    return D % 2 == 0 and H % 2 == 0 and W % 2 == 0 and W >= 64


def _choose_bdo(D2, C, H, W, itemsize, bwd=False,
                budget=60 * 1024 * 1024):
    """Output rows per grid block, bounded by VMEM: the double-buffered
    input slab (4 full-res rows per output row), the Pallas-managed
    output window (2 buffers; full-res in the backward, pooled-res
    forward), and the pooled dp buffer (backward only)."""
    lanes = -(-W // 128) * 128
    lanes2 = -(-(W // 2) // 128) * 128
    slab = 4 * C * H * lanes
    out = 4 * C * H * lanes if bwd else 2 * C * (H // 2) * lanes2
    dpb = 2 * C * (H // 2) * lanes2 if bwd else 0
    per_o = (slab + out + dpb) * itemsize
    bdo = max(1, min(8, budget // max(per_o, 1)))
    while D2 % bdo:
        bdo -= 1
    return bdo


def _mp_fwd5(x5, H, W, interpret):
    B, D, C, _, Wp = x5.shape
    D2 = D // 2
    Wp2 = _plane_pad(W // 2)
    BDo = _choose_bdo(D2, C, H, W, x5.dtype.itemsize)
    kernel = functools.partial(_mp_fwd_kernel, H=H, W=W, BDo=BDo)
    return pl.pallas_call(
        kernel,
        grid=(B, D2 // BDo),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, BDo, C, H // 2, Wp2),
                               lambda b, z: (b, z, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D2, C, H // 2, Wp2), x5.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * BDo, C, H, Wp), x5.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x5)


def _flat_to5(x, H, W):
    """(B, D, C, M) flat cm -> (B, D, C, H, Wp) with the lane dim padded
    to the 128 tiling (manual DMA slices require an aligned minor dim)."""
    B, D, C, _ = x.shape
    x5 = x[..., :H * W].reshape(B, D, C, H, W)
    Wp = _plane_pad(W)
    if Wp > W:
        x5 = jnp.pad(x5, [(0, 0)] * 4 + [(0, Wp - W)])
    return x5


def _to_flat(y5, H2, W2):
    B, D2, C = y5.shape[:3]
    out = y5[..., :W2].reshape(B, D2, C, H2 * W2)
    M2 = _plane_pad(H2 * W2)
    if M2 > H2 * W2:
        out = jnp.pad(out, [(0, 0)] * 3 + [(0, M2 - H2 * W2)])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def maxpool2_cm_pallas(x, H, W, D, interpret=False):
    """(B, D, C, M) cm activation -> (B, D/2, C, M2) 2x2x2 max pool."""
    return _to_flat(_mp_fwd5(_flat_to5(x, H, W), H, W, interpret),
                    H // 2, W // 2)


def _vjp_fwd(x, H, W, D, interpret):
    x5 = _flat_to5(x, H, W)
    return _to_flat(_mp_fwd5(x5, H, W, interpret), H // 2, W // 2), x5


def _vjp_bwd(H, W, D, interpret, x5, dp):
    B, _, C, _, Wp = x5.shape
    H2, W2 = H // 2, W // 2
    D2 = D // 2
    dp5 = _flat_to5(dp, H2, W2)
    BDo = _choose_bdo(D2, C, H, W, x5.dtype.itemsize, bwd=True)
    kernel = functools.partial(_mp_bwd_kernel, H=H, W=W, BDo=BDo)
    dx5 = pl.pallas_call(
        kernel,
        grid=(B, D2 // BDo),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, 2 * BDo, C, H, Wp),
                               lambda b, z: (b, z, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, C, H, Wp), x5.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * BDo, C, H, Wp), x5.dtype),
            pltpu.VMEM((2, BDo, C, H2, _plane_pad(W2)), dp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x5, dp5)
    dx = dx5[..., :W].reshape(B, D2 * 2, C, H * W)
    M = _plane_pad(H * W)
    if M > H * W:
        dx = jnp.pad(dx, [(0, 0)] * 3 + [(0, M - H * W)])
    return (dx,)


maxpool2_cm_pallas.defvjp(_vjp_fwd, _vjp_bwd)
