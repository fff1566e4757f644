"""Pallas 2x2x2 max-pool (stride 2) on the FLAT cm activation layout.

Operands are (B, D, C, M) kernel-layout rows (M = lane-padded H*W) —
the layout the fused conv stacks already produce — so the pool adds NO
relayout: XLA formulations either pay T(2,128) window-broadcast padding
(reshape+reduce-max, ~19 ms/step at DC3D bs10) or lower lane-strided
slices as while-loops of full-resolution dynamic-update-slices
(~27 ms/step); a 5-D-operand Pallas kernel pays flat<->5-D boundary
relayouts (~24 ms/step, the previous revision of this file). This
kernel reads x once forward; the backward reads x + the pooled
cotangent and writes dx once, with maxima/ties recomputed on VMEM rows.

The only non-trivial op on the flat layout is window COMPACTION /
EXPANSION — lanes {2*h2*W + 2*j} -> {h2*(W/2) + j} and back. Mosaic has
no strided lane slice (tools/probe_mosaic_ops.py), but 128-aligned lane
slicing + MXU dots do lower, and the maps are fixed permutations: they
run as BLOCK-SPARSE 0/1 lane-matrix dots — out_block = sum_k
in_block[ib_k] @ S_k with the nonzero (128, 128) blocks built host-side
per (H, W) and streamed in as one stacked array. Three matrices serve
the pool: S picks each window's even-corner lane (max compaction is
exact: single-source columns), T sums window members (tie counts), and
E = T^T broadcasts pooled values back to member lanes.

Gradient tie semantics match jnp reduce-max exactly (the cotangent is
split evenly across tied window positions), so enabling the kernel does
not change the fused path's numerics. Pad lanes of every output are
zero, matching the cm contract. Reference analog: nn.MaxPool3d(2, 2) in
ConvPoolBlock5d (reference parts.py:157-196).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv3d import _plane_pad, _roll_lanes


def flat_pool_supported(D, H, W):
    """Even dims on a TPU backend (DRAM_FLAT_POOL=0 disables)."""
    if os.environ.get("DRAM_FLAT_POOL", "1") != "1":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return D % 2 == 0 and H % 2 == 0 and W % 2 == 0 and W >= 2


# ---------------------------------------------------------------------------
# Host-built block-sparse lane matrices


def _blockify(A):
    """Dense (Min, Mout) 0/1 -> (((ib, ob), ...), (K, 128, 128) f32)."""
    Min, Mout = A.shape
    idx, blks = [], []
    for ib in range(Min // 128):
        rows = A[128 * ib:128 * (ib + 1)]
        for ob in range(Mout // 128):
            blk = rows[:, 128 * ob:128 * (ob + 1)]
            if blk.any():
                idx.append((ib, ob))
                blks.append(blk)
    return tuple(idx), np.stack(blks).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _pool_mats(H, W):
    """(S, T, E) block-sparse lane matrices for the (H, W) plane."""
    HW, H2, W2 = H * W, H // 2, W // 2
    M, M2 = _plane_pad(HW), _plane_pad(H2 * W2)
    S = np.zeros((M, M2), np.float32)
    T = np.zeros((M, M2), np.float32)
    for l in range(HW):
        h, w = divmod(l, W)
        T[l, (h // 2) * W2 + (w // 2)] = 1.0
    for p in range(H2 * W2):
        h2, j = divmod(p, W2)
        S[2 * h2 * W + 2 * j, p] = 1.0
    return _blockify(S), _blockify(T), _blockify(T.T.copy())


def _apply_blocks(v, mat_ref, idx, k0, Mout):
    """v (C, Min) f32 x block-sparse matrix -> (C, Mout) f32."""
    C = v.shape[0]
    cols = [None] * (Mout // 128)
    for k, (ib, ob) in enumerate(idx):
        d = jax.lax.dot_general(
            v[:, 128 * ib:128 * (ib + 1)], mat_ref[k0 + k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        cols[ob] = d if cols[ob] is None else cols[ob] + d
    zero = None
    out = []
    for c in cols:
        if c is None:
            if zero is None:
                zero = jnp.zeros((C, 128), jnp.float32)
            c = zero
        out.append(c)
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# DMA helpers (contiguous row blocks, double-buffered)


def _row_dma(src_hbm, buf2, sems, b, z, *, rows, start):
    i = jax.lax.rem(z, 2)
    cp = pltpu.make_async_copy(src_hbm.at[b, pl.ds(z * rows, rows)],
                               buf2.at[i], sems.at[i])
    cp.start() if start else cp.wait()


def _db_read(src_hbm, buf2, sems, b, z, nz, *, rows):
    @pl.when(z == 0)
    def _():
        _row_dma(src_hbm, buf2, sems, b, 0, rows=rows, start=True)

    if nz > 1:
        @pl.when(z + 1 < nz)
        def _():
            _row_dma(src_hbm, buf2, sems, b, z + 1, rows=rows, start=True)
    _row_dma(src_hbm, buf2, sems, b, z, rows=rows, start=False)
    return jax.lax.rem(z, 2)


# ---------------------------------------------------------------------------
# Kernels


def _corner_max(v, W):
    """f32 (C, M) -> window max at even-corner lanes (others garbage)."""
    t = jnp.maximum(v, _roll_lanes(v, W))
    return jnp.maximum(t, _roll_lanes(t, 1))


def _bwd_kernel(mats_ref, x_hbm, g_hbm, dx_ref, slab2, gb2, sems, semg,
                *, H, W, M, M2, BDo, idxS, idxT, idxE, kT, kE):
    b, z = pl.program_id(0), pl.program_id(1)
    nz = pl.num_programs(1)

    @pl.when(z == 0)
    def _():
        _row_dma(g_hbm, gb2, semg, b, 0, rows=BDo, start=True)

    if nz > 1:
        @pl.when(z + 1 < nz)
        def _():
            _row_dma(g_hbm, gb2, semg, b, z + 1, rows=BDo, start=True)

    buf = _db_read(x_hbm, slab2, sems, b, z, nz, rows=2 * BDo)
    _row_dma(g_hbm, gb2, semg, b, z, rows=BDo, start=False)

    C = slab2.shape[2]
    lane_v = (jax.lax.broadcasted_iota(jnp.int32, (C, M), 1)
              < H * W).astype(jnp.float32)
    lane2_v = jax.lax.broadcasted_iota(jnp.int32, (C, M2), 1) \
        < (H // 2) * (W // 2)
    for ro in range(BDo):
        x0 = slab2[buf, 2 * ro].astype(jnp.float32)
        x1 = slab2[buf, 2 * ro + 1].astype(jnp.float32)
        t = _corner_max(jnp.maximum(x0, x1), W)
        m = _apply_blocks(t, mats_ref, idxS, 0, M2)
        mb = _apply_blocks(m, mats_ref, idxE, kE, M)
        eq0 = (x0 == mb).astype(jnp.float32) * lane_v
        eq1 = (x1 == mb).astype(jnp.float32) * lane_v
        cnt = _apply_blocks(eq0 + eq1, mats_ref, idxT, kT, M2)
        g = gb2[buf, ro].astype(jnp.float32)
        r = jnp.where(lane2_v, g / jnp.maximum(cnt, 1.0), 0.0)
        rb = _apply_blocks(r, mats_ref, idxE, kE, M)
        dx_ref[2 * ro] = (eq0 * rb).astype(dx_ref.dtype)
        dx_ref[2 * ro + 1] = (eq1 * rb).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP


def _choose_bdo(D2, C, M, M2, itemsize, n_temps, budget=64 * 1024 * 1024):
    """Pooled rows per grid block, bounded by VMEM (slab + out + temps)."""
    per_o = (2 * 2 * C * M + 2 * C * M2) * itemsize \
        + 2 * 2 * C * M * itemsize + n_temps * C * M * 4
    bdo = max(1, min(4, budget // max(per_o, 1)))
    while D2 % bdo:
        bdo -= 1
    return bdo


def _fwd_call(x, H, W, interpret):
    B, D, C, M = x.shape
    D2 = D // 2
    M2 = _plane_pad((H // 2) * (W // 2))
    (idxS, Sb), _, _ = _pool_mats(H, W)
    BDo = _choose_bdo(D2, C, M, M2, x.dtype.itemsize, n_temps=2)

    def kernel(s_ref, x_hbm, out_ref, slab2, sems):
        b, z = pl.program_id(0), pl.program_id(1)
        nz = pl.num_programs(1)
        buf = _db_read(x_hbm, slab2, sems, b, z, nz, rows=2 * BDo)
        for ro in range(BDo):
            v = jnp.maximum(slab2[buf, 2 * ro],
                            slab2[buf, 2 * ro + 1]).astype(jnp.float32)
            t = _corner_max(v, W)
            out_ref[ro] = _apply_blocks(t, s_ref, idxS, 0, M2) \
                .astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, D2 // BDo),
        in_specs=[
            pl.BlockSpec(Sb.shape, lambda b, z: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, BDo, C, M2),
                               lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D2, C, M2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * BDo, C, M), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(Sb), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def maxpool2_flat(x, H, W, interpret=False):
    """(B, D, C, M) flat cm -> (B, D/2, C, M2) 2x2x2 max pool."""
    return _fwd_call(x, H, W, interpret)


def _mp_vjp_fwd(x, H, W, interpret):
    return _fwd_call(x, H, W, interpret), x


def _mp_vjp_bwd(H, W, interpret, x, g):
    B, D, C, M = x.shape
    D2 = D // 2
    M2 = _plane_pad((H // 2) * (W // 2))
    (idxS, Sb), (idxT, Tb), (idxE, Eb) = _pool_mats(H, W)
    mats = jnp.asarray(np.concatenate([Sb, Tb, Eb], axis=0))
    kT, kE = len(idxS), len(idxS) + len(idxT)
    BDo = _choose_bdo(D2, C, M, M2, x.dtype.itemsize, n_temps=8)
    kernel = functools.partial(_bwd_kernel, H=H, W=W, M=M, M2=M2, BDo=BDo,
                               idxS=idxS, idxT=idxT, idxE=idxE, kT=kT,
                               kE=kE)
    dx = pl.pallas_call(
        kernel,
        grid=(B, D2 // BDo),
        in_specs=[
            pl.BlockSpec(mats.shape, lambda b, z: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, 2 * BDo, C, M),
                               lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, C, M), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * BDo, C, M), x.dtype),
            pltpu.VMEM((2, BDo, C, M2), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mats, x, g)
    return (dx,)


maxpool2_flat.defvjp(_mp_vjp_fwd, _mp_vjp_bwd)
