"""Pallas align-corners 2x DEPTH upsample on the flat cm layout.

The decoder's upsample depth pass ran as an XLA dot (einsum
"od,bdcm->bocm"): the dot wants the contracted depth axis minor, so XLA
wraps it in relayout copies on BOTH sides — the train-step trace showed
~8-10 ms/step of pure layout copies at the us levels (fusion.33 /
copy.470 / copy.495 class), on top of the dot itself. A jnp.take
formulation is layout-native but lowers as a TPU gather and measured
~50 ms/step SLOWER than the einsum.

This kernel streams (C, M) depth rows through VMEM and emits each
output row as a two-tap lerp of its bracketing input rows — one HBM
read of x, one write of y, no dot, no relayout. Tap indices and weights
are precomputed host-side (cm._up2_tables, torch align_corners
semantics) and ride along as SMEM scalar tables; the input DMA window
per grid step comes from a per-block start table, so the drifting
lo/hi pattern needs no in-kernel arithmetic beyond offset lookups.

The backward pass is the exact adjoint via fixed-K gather tables
(cm._up2_adjoint_tables): input row d accumulates dy[g_k[d]] * w_k[d].
Both directions compute the lerp in f32 and store in the input dtype —
identical math to the einsum path (the weights are the same table).

Reference analog: nn.Upsample(scale_factor=2, align_corners=True) in
UpsampleConvBlock5d (reference parts.py:116-155).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def up2_depth_supported(shape, itemsize=4):
    """(B, D, C, M) with D >= 2 on a TPU backend (DRAM_UP2_PALLAS=0
    disables; M is lane-padded by construction).

    Also requires the minimum kernel working set to fit the VMEM budget:
    _pick_block can bottom out at bd=1 while still over budget (it only
    shrinks the block, never rejects), in which case the pallas_call
    would compile against the 100 MB vmem_limit and fail at RUNTIME.
    Oversized (C, M) rows must instead route to the einsum fallback
    (cm._up2_depth_einsum). Worst-case rows at bd=1: a double-buffered
    input slab of SI <= 4 rows (the x2 linear-lerp window per output row
    spans <= 2 input rows; the adjoint <= 4) plus the double-buffered
    1-row output window -> 2*4 + 2 = 10 rows."""
    if os.environ.get("DRAM_UP2_PALLAS", "1") != "1":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if not (len(shape) == 4 and shape[1] >= 2 and shape[3] % 128 == 0):
        return False
    row_bytes = int(shape[2]) * int(shape[3]) * int(itemsize)
    return 10 * row_bytes <= 56 * 1024 * 1024


def _pick_block(n_out, row_bytes, out_win, budget=56 * 1024 * 1024):
    """Output rows per grid step: slab(2*SI) + double-buffered out."""
    bd = 8
    while bd > 1 and (2 * (out_win(bd)) + 2 * bd) * row_bytes > budget:
        bd -= 1
    while n_out % bd:
        bd -= 1
    return bd


def _dma(x_hbm, slab2, sems, starts_ref, b, z, *, SI, start):
    i = jax.lax.rem(z, 2)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(starts_ref[z], SI)],
                               slab2.at[i], sems.at[i])
    cp.start() if start else cp.wait()


def _db_read(x_hbm, slab2, sems, starts_ref, b, z, nz, *, SI):
    @pl.when(z == 0)
    def _():
        _dma(x_hbm, slab2, sems, starts_ref, b, 0, SI=SI, start=True)

    if nz > 1:
        @pl.when(z + 1 < nz)
        def _():
            _dma(x_hbm, slab2, sems, starts_ref, b, z + 1, SI=SI, start=True)
    _dma(x_hbm, slab2, sems, starts_ref, b, z, SI=SI, start=False)
    return jax.lax.rem(z, 2)


def _fwd_call(x, interpret=False):
    from .cm import _up2_tables
    B, D, C, M = x.shape
    lo, hi, f = _up2_tables(D)
    n_out = 2 * D
    it = x.dtype.itemsize

    def out_win(bd):  # input rows needed for bd output rows (max over z)
        return max(int(hi[min(z0 + bd - 1, n_out - 1)] - lo[z0] + 1)
                   for z0 in range(0, n_out, bd))

    BDo = _pick_block(n_out, C * M * it, out_win)
    SI = out_win(BDo)
    nz = n_out // BDo
    starts = np.minimum(lo[::BDo].astype(np.int32), max(D - SI, 0))
    off_lo = (lo - np.repeat(starts, BDo)).astype(np.int32)
    off_hi = (hi - np.repeat(starts, BDo)).astype(np.int32)

    def kernel(starts_ref, lo_ref, hi_ref, f_ref, x_hbm, out_ref,
               slab2, sems):
        b, z = pl.program_id(0), pl.program_id(1)
        buf = _db_read(x_hbm, slab2, sems, starts_ref, b, z,
                       pl.num_programs(1), SI=SI)
        for r in range(BDo):
            o = z * BDo + r
            w = f_ref[o]
            a = slab2[buf, lo_ref[o]].astype(jnp.float32)
            bb = slab2[buf, hi_ref[o]].astype(jnp.float32)
            out_ref[r] = (a * (1.0 - w) + bb * w).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, nz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, BDo, C, M), lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_out, C, M), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, SI, C, M), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(starts), jnp.asarray(off_lo), jnp.asarray(off_hi),
      jnp.asarray(f), x)


def _bwd_call(g, D, interpret=False):
    from .cm import _up2_adjoint_tables
    B, n_out, C, M = g.shape
    gk, wk = _up2_adjoint_tables(D)
    K = gk.shape[0]
    it = g.dtype.itemsize

    def out_win(bd):  # dy rows needed for bd input rows (max over z)
        return max(int(gk[:, d0:d0 + bd].max() - gk[:, d0:d0 + bd].min()
                       + 1) for d0 in range(0, D, bd))

    BDi = _pick_block(D, C * M * it, out_win)
    SJ = out_win(BDi)
    nz = D // BDi
    starts = np.array([min(int(gk[:, z0:z0 + BDi].min()), max(n_out - SJ, 0))
                       for z0 in range(0, D, BDi)], np.int32)
    offs = (gk - np.repeat(starts, BDi)[None, :]).astype(np.int32)

    def kernel(offs_ref, w_ref, starts_ref, g_hbm, out_ref, slab2, sems):
        b, z = pl.program_id(0), pl.program_id(1)
        buf = _db_read(g_hbm, slab2, sems, starts_ref, b, z,
                       pl.num_programs(1), SI=SJ)
        for r in range(BDi):
            d = z * BDi + r
            acc = slab2[buf, offs_ref[0, d]].astype(jnp.float32) \
                * w_ref[0, d]
            for k in range(1, K):
                acc += slab2[buf, offs_ref[k, d]].astype(jnp.float32) \
                    * w_ref[k, d]
            out_ref[r] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, nz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, BDi, C, M), lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, C, M), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, SJ, C, M), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(offs), jnp.asarray(wk), jnp.asarray(starts), g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def up2_depth_flat(x, interpret=False):
    """(B, D, C, M) -> (B, 2D, C, M) align-corners 2x along depth."""
    return _fwd_call(x, interpret)


def _vjp_fwd(x, interpret):
    return _fwd_call(x, interpret), x.shape[1]


def _vjp_bwd(interpret, D, g):
    return (_bwd_call(g, D, interpret),)


up2_depth_flat.defvjp(_vjp_fwd, _vjp_bwd)
