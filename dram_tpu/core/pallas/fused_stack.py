"""Fused Conv3d->BN->ReLU->Conv3d->BN->ReLU chain (the DC3D conv stack).

The train-step profile (tools/parse_trace.py on tools/bench_train_step.py)
shows ~290 ms/step of non-matmul overhead around the per-conv Pallas calls:
NDHWC<->plane-minor layout copies, z/lane pads, bf16<->f32 converts, BN
stat reductions and BN-apply/ReLU passes — each a full HBM round trip over
multi-100MB activation tensors. This module removes the round trips
between the two convolutions of every DC3D conv stack (reference
parts.py:66-113 ConvBlock5d et al.):

* activations stay in the kernel's (B, D, C, M=lane-padded H*W) layout
  from stack entry to stack exit — no per-conv transposes;
* the z halo is handled inside the kernel (clamped DMA + row masking), so
  inputs are never re-padded between convs;
* BatchNorm batch statistics are accumulated in the conv kernel's
  epilogue (per-channel sum / sum-of-squares over valid lanes) — the
  stats never re-read the conv output from HBM;
* the BN affine + ReLU of conv i is applied in conv i+1's PROLOGUE on the
  VMEM slab rows as they stream in — the normalized activation tensor is
  never materialized;
* a custom VJP reuses the same kernels: dx via flipped weights, dW with
  the same prologue recomputing the normalized input on the fly, and the
  BN/ReLU backward folded into two layout-native XLA passes per norm.

Numerics match the unfused path up to bf16 rounding: stats are f32
sums (flax BatchNorm's E[x^2]-E[x]^2 formula), the affine runs in f32 on
the slab rows.

Used by models/blocks.py (ConvStack) when `use_pallas_conv` and the stack
is the bn/relu configuration the flagship configs ship.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv3d import _plane_pad, _plane_valid, _roll_lanes, supported


def _lane_valid(HW, M):
    i = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    return (i < HW).astype(jnp.float32)


def _slab_dma(x_hbm, slab2, sems, b, z, *, BD, D, start):
    """Start or wait the clamped z-halo copy of block (b, z) into the
    double buffer slab2[z % 2].

    slab2: (2, BD+2, C, M) scratch, sems: (2,) DMA semaphores. Source rows
    [z0-1, z0+BD+1) clamped to [0, D); out-of-volume buffer rows are
    masked at patch-build time, so their contents are don't-care. The
    kernels prefetch block z+1 while computing block z — without this the
    grid pays DMA + compute serially (measured ~20% of the big-layer conv
    time at 80^3/192ch)."""
    z0 = z * BD
    nz = D // BD
    first = z == 0
    last = z == nz - 1
    i = jax.lax.rem(z, 2)

    def run(cp):
        cp.start() if start else cp.wait()

    if D >= BD + 2:  # an interior block exists (or the slice at least fits)
        @pl.when(jnp.logical_and(jnp.logical_not(first),
                                 jnp.logical_not(last)))
        def _():
            run(pltpu.make_async_copy(x_hbm.at[b, pl.ds(z0 - 1, BD + 2)],
                                      slab2.at[i], sems.at[i]))
    if D > BD:  # branches only reachable with >1 z block
        @pl.when(jnp.logical_and(first, jnp.logical_not(last)))
        def _():
            run(pltpu.make_async_copy(x_hbm.at[b, pl.ds(0, BD + 1)],
                                      slab2.at[i, pl.ds(1, BD + 1)],
                                      sems.at[i]))

        @pl.when(jnp.logical_and(last, jnp.logical_not(first)))
        def _():
            run(pltpu.make_async_copy(x_hbm.at[b, pl.ds(z0 - 1, BD + 1)],
                                      slab2.at[i, pl.ds(0, BD + 1)],
                                      sems.at[i]))
    else:
        @pl.when(jnp.logical_and(first, last))
        def _():
            run(pltpu.make_async_copy(x_hbm.at[b, pl.ds(0, BD)],
                                      slab2.at[i, pl.ds(1, BD)], sems.at[i]))


def _slab_prefetch_wait(x_hbm, slab2, sems, b, z, *, BD, D):
    """Double-buffer step: ensure block z's copy is in flight, start block
    z+1's, wait for z's. Returns the buffer index holding block z."""
    nz = D // BD

    @pl.when(z == 0)
    def _():
        _slab_dma(x_hbm, slab2, sems, b, 0, BD=BD, D=D, start=True)

    if nz > 1:
        @pl.when(z + 1 < nz)
        def _():
            _slab_dma(x_hbm, slab2, sems, b, z + 1, BD=BD, D=D, start=True)
    _slab_dma(x_hbm, slab2, sems, b, z, BD=BD, D=D, start=False)
    return jax.lax.rem(z, 2)


def _cbr_kernel(w_ref, s_ref, b_ref, x_hbms, out_refs, stats_ref,
                acc, patch, slabs, semss, *, H, W, M, ci_parts, co_parts,
                BD, D, prologue, stats):
    """Conv with optional affine+relu prologue and stats epilogue.

    x_hbms: tuple of (B, D, Ci_p, M) refs — a VIRTUAL channel concat:
    the parts are streamed into adjacent patch columns, so the
    concatenated (B, D, sum(Ci_p), M) input never exists in HBM (the
    decoder's upsample+skip concatenation, reference parts.py:116-155,
    costs ~14 ms/step materialized at the 80^3 level). NOT z-padded; the
    halo is DMA'd clamped (double-buffered: block z+1 streams while block
    z computes) and out-of-volume rows are masked during patch build.
    w_ref: (3, 3*Co, 3*Ci) — dz-major, the dy=-1/0/+1 weight planes
    STACKED on the output dim so each MXU dot writes 3*Co rows (Co=64
    layers only fill half the 128-row MXU otherwise) and the dz loop
    needs one dot instead of three.
    s_ref/b_ref: (1, Ci) f32 prologue affine (concat channel order).
    out_refs: tuple of (BD, Co_p, M) windows — more than one is the
    transpose of a virtual concat (the dx of the fused decoder stack
    lands directly in the two branch cotangents, no HBM split pass).
    stats_ref: (2, Co) f32 accumulators (sum, sumsq) over valid lanes
    (only present when stats=True; the kernel signature drops it
    otherwise via the pallas_call output list).
    """
    b, z = pl.program_id(0), pl.program_id(1)
    z0 = z * BD
    Ci = sum(ci_parts)
    Co = sum(co_parts)

    bufs = [_slab_prefetch_wait(x_hbms[p], slabs[p], semss[p], b, z,
                                BD=BD, D=D) for p in range(len(x_hbms))]

    w = w_ref[:]  # (3, 3*Co, 3*Ci)
    if prologue:
        s = s_ref[0].astype(jnp.float32)  # (Ci,)
        t = b_ref[0].astype(jnp.float32)

    # patch rows: prologue affine+relu, z-validity mask (0 outside volume)
    for r in range(BD + 2):
        zvalid = jnp.logical_and(z0 - 1 + r >= 0, z0 - 1 + r < D)
        off = 0
        for p, cp in enumerate(ci_parts):
            row = slabs[p][bufs[p], r]
            if prologue:
                row = jnp.maximum(
                    row.astype(jnp.float32) * s[off:off + cp, None]
                    + t[off:off + cp, None], 0.0
                ).astype(slabs[p].dtype)
            row = jnp.where(zvalid, row, jnp.zeros_like(row))
            # dx=0 column: no roll, and no pad-lane mask — pad garbage in
            # this column reaches only pad lanes of the OUTPUT (dx=0 maps
            # lane m to out lane m; the dy=+-1 output rolls mask the two
            # boundary rows), and every cm consumer masks pad lanes on
            # read. The dW kernels keep the mask (their dy side can wrap
            # nonzero lanes into pad columns). Saves a third of the
            # patch-build VPU work.
            patch[r, pl.ds(Ci + off, cp)] = row
            for k, dx in ((0, -1), (2, 1)):
                patch[r, pl.ds(k * Ci + off, cp)] = _roll_lanes(row, dx) * \
                    _plane_valid(H, W, M, 0, dx, row.dtype)
            off += cp

    if stats:
        @pl.when(jnp.logical_and(b == 0, z == 0))
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)
        lane_v = _lane_valid(H * W, M)

    for r in range(BD):
        acc[:] = jnp.zeros_like(acc)
        for dzi in range(3):
            acc[:] += jax.lax.dot_general(
                w[dzi], patch[r + dzi],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (3*Co, M)
        v = acc[:]
        # the dy=0 block needs no mask (its only invalid targets are pad
        # lanes, which every cm consumer masks or slices on read); the
        # dy=+-1 blocks roll then mask their targets
        o = v[Co:2 * Co]
        for dyi, dy in ((0, -1), (2, 1)):
            o += _roll_lanes(v[dyi * Co:(dyi + 1) * Co], dy * W) * \
                _plane_valid(H, W, M, dy, 0, jnp.float32)
        off = 0
        for j, cj in enumerate(co_parts):
            out_refs[j][r] = o[off:off + cj].astype(out_refs[j].dtype)
            off += cj
        if stats:
            ov = o * lane_v
            stats_ref[0] += jnp.sum(ov, axis=1)
            stats_ref[1] += jnp.sum(ov * o, axis=1)


def _dy_dma(dy_hbm, dyb2, semd, b, z, *, BD, start):
    """Start/wait the (halo-free) dy block copy into dyb2[z % 2]."""
    i = jax.lax.rem(z, 2)
    cp = pltpu.make_async_copy(dy_hbm.at[b, pl.ds(z * BD, BD)],
                               dyb2.at[i], semd.at[i])
    cp.start() if start else cp.wait()


def _dw_kernel_pro(x_hbms, dy_hbm, s_ref, b_ref, dw_ref, patch, dyb2, slabs,
                   semss, semd, *, H, W, M, ci_parts, Co, BD, D, prologue):
    """dW with the x side streamed through the same optional prologue
    (recomputes the normalized activation instead of materializing it);
    x_hbms is a tuple of NOT-z-padded virtual-concat parts (same
    double-buffered clamped-halo DMA as _cbr_kernel; dy too)."""
    b, z = pl.program_id(0), pl.program_id(1)
    nz = pl.num_programs(1)
    z0 = z * BD
    Ci = sum(ci_parts)

    @pl.when(z == 0)
    def _():
        _dy_dma(dy_hbm, dyb2, semd, b, 0, BD=BD, start=True)

    if nz > 1:
        @pl.when(z + 1 < nz)
        def _():
            _dy_dma(dy_hbm, dyb2, semd, b, z + 1, BD=BD, start=True)

    bufs = [_slab_prefetch_wait(x_hbms[p], slabs[p], semss[p], b, z,
                                BD=BD, D=D) for p in range(len(x_hbms))]
    _dy_dma(dy_hbm, dyb2, semd, b, z, BD=BD, start=False)

    @pl.when(jnp.logical_and(b == 0, z == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    if prologue:
        s = s_ref[0].astype(jnp.float32)
        t = b_ref[0].astype(jnp.float32)

    for r in range(BD + 2):
        zvalid = jnp.logical_and(z0 - 1 + r >= 0, z0 - 1 + r < D)
        off = 0
        for p, cp in enumerate(ci_parts):
            row = slabs[p][bufs[p], r]
            if prologue:
                row = jnp.maximum(
                    row.astype(jnp.float32) * s[off:off + cp, None]
                    + t[off:off + cp, None], 0.0
                ).astype(slabs[p].dtype)
            row = jnp.where(zvalid, row, jnp.zeros_like(row))
            for k, dx in enumerate((-1, 0, 1)):
                patch[r, pl.ds(k * Ci + off, cp)] = _roll_lanes(row, dx) * \
                    _plane_valid(H, W, M, 0, dx, row.dtype)
            off += cp

    # pad lanes must not leak into the dy_=-1 shifts: unlike the old
    # z-padded wire, dout's pad lanes are NOT guaranteed zero here (the
    # BN backward writes garbage there), and _plane_valid's iy>=H trick
    # admits the first pad row for dy=-1
    lane_v = _lane_valid(H * W, M).astype(dyb2.dtype)
    buf = jax.lax.rem(z, 2)  # dy's double-buffer slot for block z
    for r in range(BD):
        # stack the 3 dy-shifted cotangent planes on the dot's output dim
        # (one (3Ci, M)x(3Co, M) MXU dot per dz instead of three Co-wide
        # ones); dw_ref rows follow the same (dz, dx*Ci, dy*Co) layout
        dyr3 = jnp.concatenate([
            _roll_lanes(
                dyb2[buf, r] * lane_v
                * _plane_valid(H, W, M, dy_, 0, dyb2.dtype),
                -dy_ * W)
            for dy_ in (-1, 0, 1)], axis=0)  # (3*Co, M)
        for dzi in range(3):
            dw_ref[dzi] += jax.lax.dot_general(
                patch[r + dzi], dyr3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# host-side wrappers


from .cm import CM, from_cm, to_cm  # noqa: E402  (canonical layout ops)


def _wk(w, dtype):
    """(3,3,3,Ci,Co) -> (3, 3*Co, 3*Ci) kernel weight layout: dz-major,
    the three dy planes stacked on the output (MXU-row) dim, dx-major
    columns."""
    Ci, Co = w.shape[3], w.shape[4]
    return jnp.transpose(w.astype(dtype), (0, 1, 4, 2, 3)).reshape(
        3, 3 * Co, 3 * Ci)


def _flip_wk(w, dtype):
    """Transposed-conv weights in kernel layout: flip spatial, swap io."""
    wf = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    return _wk(wf, dtype)


def conv_cm(x_cm, wk, s, b, H, W, D, *, prologue, stats, interpret=False,
            out_split=None):
    """One conv on kernel-layout input. Returns (out_cm, stats or None).

    x_cm: (B, D, Ci, M) array, or a tuple of such parts forming a VIRTUAL
    channel concat (the parts stream into adjacent patch columns; the
    concatenated input never exists in HBM). out_split: optional tuple of
    output channel sizes — the output is written as separate part arrays
    (a virtual concat's transpose, for the dx of the decoder stacks);
    returns a tuple of parts then. s, b: (Ci,) f32 prologue affine in
    concat channel order (pass zeros when prologue=False).
    """
    parts = tuple(x_cm) if isinstance(x_cm, (tuple, list)) else (x_cm,)
    B, M = parts[0].shape[0], parts[0].shape[3]
    ci_parts = tuple(p.shape[2] for p in parts)
    Ci = sum(ci_parts)
    Co = wk.shape[1] // 3  # wk rows are the 3 dy-stacked output planes
    co_parts = tuple(out_split) if out_split is not None else (Co,)
    assert sum(co_parts) == Co, (co_parts, Co)
    assert not (stats and out_split), "stats only on the un-split forward"
    dt = parts[0].dtype

    # full VMEM budget: double-buffered slab + patch rows, f32
    # accumulator, and the DOUBLE-buffered output window (dominant when
    # Co is large, e.g. the dx conv of a 192-channel layer: 2*BD*192*M*4 B)
    it = dt.itemsize
    row_bytes = 5 * Ci * M * it          # slab (2*Ci) + patch (3*Ci)
    out_bytes = Co * M * it              # output window, 2 buffer levels
    acc_bytes = 3 * Co * M * 4           # dy-stacked accumulator
    budget = 80 * 1024 * 1024
    BD = 8
    while BD > 1 and ((BD + 2) * row_bytes + 2 * BD * out_bytes
                      + acc_bytes) > budget:
        BD -= 1
    while D % BD:
        BD -= 1
    kw = dict(H=H, W=W, M=M, ci_parts=ci_parts, co_parts=co_parts,
              BD=BD, D=D, prologue=prologue, stats=stats)
    np_, no = len(parts), len(co_parts)

    def kernel(*refs):
        w_ref, s_ref, b_ref = refs[:3]
        x_hbms = refs[3:3 + np_]
        out_refs = refs[3 + np_:3 + np_ + no]
        k = 3 + np_ + no
        stats_ref = refs[k] if stats else None
        scr = refs[k + (1 if stats else 0):]
        acc, patch = scr[0], scr[1]
        slabs, semss = scr[2:2 + np_], scr[2 + np_:2 + 2 * np_]
        _cbr_kernel(w_ref, s_ref, b_ref, x_hbms, out_refs, stats_ref,
                    acc, patch, slabs, semss, **kw)

    out_shapes = [jax.ShapeDtypeStruct((B, D, cj, M), dt)
                  for cj in co_parts]
    out_specs = [pl.BlockSpec((None, BD, cj, M), lambda b_, z: (b_, z, 0, 0))
                 for cj in co_parts]
    if stats:
        out_shapes.append(jax.ShapeDtypeStruct((2, Co), jnp.float32))
        out_specs.append(pl.BlockSpec((2, Co), lambda b_, z: (0, 0)))
    res = pl.pallas_call(
        kernel,
        grid=(B, D // BD),
        in_specs=[
            pl.BlockSpec((3, 3 * Co, 3 * Ci), lambda b_, z: (0, 0, 0)),
            pl.BlockSpec((1, Ci), lambda b_, z: (0, 0)),
            pl.BlockSpec((1, Ci), lambda b_, z: (0, 0)),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * np_,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3 * Co, M), jnp.float32),
            pltpu.VMEM((BD + 2, 3 * Ci, M), dt),
        ] + [pltpu.VMEM((2, BD + 2, cp, M), dt) for cp in ci_parts]
          + [pltpu.SemaphoreType.DMA((2,)) for _ in parts],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wk, s.reshape(1, -1), b.reshape(1, -1), *parts)
    st = res[no] if stats else None
    outs = tuple(res[:no])
    return (outs if out_split is not None else outs[0]), st


def conv_dw_cm(x_cm, dy_cm, s, b, H, W, D, *, prologue, interpret=False):
    """dW from kernel-layout x (through the optional prologue) and dy.
    x_cm: array or tuple of virtual-concat parts (dw is returned for the
    whole concatenated Ci — the weight is one parameter either way)."""
    parts = tuple(x_cm) if isinstance(x_cm, (tuple, list)) else (x_cm,)
    B, M = parts[0].shape[0], parts[0].shape[3]
    ci_parts = tuple(p.shape[2] for p in parts)
    Ci = sum(ci_parts)
    dt = parts[0].dtype
    Co = dy_cm.shape[2]
    per_row = (5 * Ci + 2 * Co) * M * dt.itemsize
    dw_bytes = 9 * 3 * Ci * Co * 4
    BD = int(max(1, min(8, (80 * 1024 * 1024 - dw_bytes) // per_row - 2)))
    while D % BD:
        BD -= 1
    kw = dict(H=H, W=W, M=M, ci_parts=ci_parts, Co=Co, BD=BD, D=D,
              prologue=prologue)
    np_ = len(parts)

    def kernel(*refs):
        x_hbms = refs[:np_]
        dy_hbm, s_ref, b_ref, dw_ref = refs[np_:np_ + 4]
        scr = refs[np_ + 4:]
        patch, dyb2 = scr[0], scr[1]
        slabs = scr[2:2 + np_]
        semss, semd = scr[2 + np_:2 + 2 * np_], scr[2 + 2 * np_]
        _dw_kernel_pro(x_hbms, dy_hbm, s_ref, b_ref, dw_ref, patch, dyb2,
                       slabs, semss, semd, **kw)

    dw = pl.pallas_call(
        kernel,
        grid=(B, D // BD),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * np_ + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ci), lambda b_, z: (0, 0)),
            pl.BlockSpec((1, Ci), lambda b_, z: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 3 * Ci, 3 * Co),
                               lambda b_, z: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3 * Ci, 3 * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BD + 2, 3 * Ci, M), dt),
            pltpu.VMEM((2, BD, Co, M), dy_cm.dtype),
        ] + [pltpu.VMEM((2, BD + 2, cp, M), dt) for cp in ci_parts]
          + [pltpu.SemaphoreType.DMA((2,)) for _ in parts]
          + [pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*parts, dy_cm, s.reshape(1, -1), b.reshape(1, -1))
    # (dz, dx*Ci, dy*Co) -> (dz, dy, dx, Ci, Co)
    return dw.reshape(3, 3, Ci, 3, Co).transpose(0, 3, 1, 2, 4)


# ---------------------------------------------------------------------------
# the fused 2-conv stack with custom VJP


def _affine_from_stats(gamma, beta, mean, var, eps):
    """Per-channel (scale, offset) folding BN into one affine."""
    inv = jax.lax.rsqrt(var + eps)
    s = gamma * inv
    return s, beta - mean * s


def _bn_stats(st, count):
    mean = st[0] / count
    var = st[1] / count - mean * mean
    return mean, jnp.maximum(var, 0.0)


def _global_stats(st, n_local, axis_name):
    """(sum, sumsq) accumulators + local element count -> cross-shard
    (sums, global count). Under shard_map data parallelism (`axis_name`)
    the per-shard epilogue sums are psum'd over the batch axis BEFORE the
    BN affine, so the fused BatchNorm sees the GLOBAL batch statistics —
    exactly like the unfused cross-replica path (reference `sbn` intent,
    parts.py:32-33)."""
    if axis_name is None:
        return st, n_local
    st = jax.lax.psum(st, axis_name)
    return st, n_local * float(_axis_size(axis_name))


def _axis_size(axis_name):
    names = axis_name if isinstance(axis_name, (tuple, list)) \
        else (axis_name,)
    size = 1
    for n in names:
        size *= jax.lax.axis_size(n)
    return size


def _lane_mask_cm(shape, HW):
    i = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return i < HW


def fused_cbr2(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
               train=True, eps=1e-5, momentum=0.9, interpret=False,
               cm_out=False, axis_name=None):
    """conv->bn->relu->conv->bn->relu as a fused chain.

    x: NDHWC array, a CM kernel-layout activation, or a tuple of
    same-plane CMs (virtual channel concat in the reference's order —
    the decoder's [upsample, skip]; the concatenated tensor never
    materializes in HBM, and dx comes back as a tuple of part
    cotangents); w*: (3,3,3,Ci,Co) f32 (Ci = summed part channels); g/b:
    BN scale/bias; m/v: running stats. Returns
    (y NDHWC — or CM when cm_out, (new_m0, new_v0, new_m1, new_v1)).
    Differentiable in x, w*, g*, b* via a custom VJP; with CM in/out the
    cotangents also stay in the kernel layout (no transposes in either
    pass — see core/pallas/cm.py). With `axis_name` (shard_map data
    parallelism) the BN batch statistics are psum'd over the axis, so the
    fused chain is exact under DP; the backward psums the batch-coupled
    BN reduction terms and otherwise propagates whatever scale the
    incoming cotangent carries (under shard_map, psum transposes to
    psum, so a psum'd loss hands every shard N x its local cotangent —
    the trainer's grads-pmean then recovers the exact global gradient;
    tests/test_fused_stack.py::TestFusedDPExact).
    """
    if isinstance(x, (tuple, list)):
        assert all(isinstance(p, CM) for p in x)
        assert all((p.H, p.W) == (x[0].H, x[0].W) for p in x[1:])
        cm_in, hw, xa = True, (x[0].H, x[0].W), tuple(p.data for p in x)
    elif isinstance(x, CM):
        cm_in, hw, xa = True, (x.H, x.W), x.data
    else:
        cm_in, hw, xa = False, (x.shape[2], x.shape[3]), x
    y, stats = _fused_cbr2_vjp(xa, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
                               train, eps, interpret, cm_in, cm_out, hw,
                               axis_name)
    if cm_out:
        y = CM(y, hw[0], hw[1])
    if train:
        bm0, bv0, bm1, bv1 = stats
        new = tuple(momentum * r + (1 - momentum) * s
                    for r, s in ((m0, bm0), (v0, bv0), (m1, bm1), (v1, bv1)))
    else:
        new = (m0, v0, m1, v1)
    return y, new


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16, 17))
def _fused_cbr2_vjp(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
                    train, eps, interpret, cm_in, cm_out, hw, axis_name):
    y, stats, _ = _fused_fwd(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
                             train, eps, interpret, cm_in, cm_out, hw,
                             axis_name)
    return y, stats


def _fused_fwd(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
               train, eps, interpret, cm_in, cm_out, hw, axis_name):
    H, W = hw
    multi = isinstance(x, (tuple, list))
    if multi:
        B, D = x[0].shape[0], x[0].shape[1]
        Ci = sum(p.shape[2] for p in x)
        x_cm = tuple(x)
        dt = x[0].dtype
    elif cm_in:
        B, D = x.shape[0], x.shape[1]
        Ci = x.shape[2]
        x_cm = x
        dt = x.dtype
    else:
        B, D, _, _, Ci = x.shape
        x_cm = to_cm(x)
        dt = x.dtype
    zero0 = jnp.zeros((Ci,), jnp.float32)
    out0, st0 = conv_cm(x_cm, _wk(w0, dt), zero0, zero0, H, W, D,
                        prologue=False, stats=train, interpret=interpret)
    n = float(B * D * H * W)
    if train:
        st0, n_g = _global_stats(st0, n, axis_name)
        bm0, bv0 = _bn_stats(st0, n_g)
    else:
        bm0, bv0 = m0, v0
    s0, t0 = _affine_from_stats(g0, b0, bm0, bv0, eps)

    out1, st1 = conv_cm(out0, _wk(w1, dt), s0, t0, H, W, D,
                        prologue=True, stats=train, interpret=interpret)
    if train:
        st1, n_g = _global_stats(st1, n, axis_name)
        bm1, bv1 = _bn_stats(st1, n_g)
    else:
        bm1, bv1 = m1, v1
    s1, t1 = _affine_from_stats(g1, b1, bm1, bv1, eps)

    # exit: affine+relu (+un-layout unless staying cm) in one XLA pass
    y_cm = jnp.maximum(
        out1.astype(jnp.float32) * s1[None, None, :, None]
        + t1[None, None, :, None], 0.0).astype(dt)
    y = y_cm if cm_out else from_cm(y_cm, H, W)
    stats = (bm0, bv0, bm1, bv1) if train \
        else (jnp.zeros_like(m0), jnp.zeros_like(v0),
              jnp.zeros_like(m1), jnp.zeros_like(v1))
    res = (x_cm, w0, g0, b0, w1, g1, b1, out0, out1,
           (bm0, bv0, bm1, bv1))
    return y, stats, res


def _vjp_fwd(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
             train, eps, interpret, cm_in, cm_out, hw, axis_name):
    y, stats, res = _fused_fwd(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
                               train, eps, interpret, cm_in, cm_out, hw,
                               axis_name)
    return (y, stats), res


def _bn_back_cm(d_post, out, gamma, beta, mean, var, *, eps, train, n, HW,
                dt, axis_name):
    """relu+BN backward at kernel layout; returns (d_out, dg, db).

    `n` is the GLOBAL element count; under shard_map (`axis_name`) the
    dbeta/dgamma reduction terms entering d_out are psum'd (the batch-stat
    dependence couples every shard's rows), while the RETURNED dg/db are
    per-shard partial sums at the incoming cotangent's scale — with a
    psum'd loss each shard's cotangent is N x the true one, so the
    trainer's grads-pmean recovers the exact global dg/db."""
    inv = jax.lax.rsqrt(var + eps)
    s = (gamma * inv)[None, None, :, None]
    t = (beta - mean * gamma * inv)[None, None, :, None]
    of = out.astype(jnp.float32)
    lane = _lane_mask_cm(out.shape, HW)
    post = of * s + t
    dp = jnp.where((post > 0) & lane, d_post.astype(jnp.float32), 0.0)
    xhat = (of - mean[None, None, :, None]) * inv[None, None, :, None]
    dbeta = jnp.sum(dp, axis=(0, 1, 3))
    dgamma = jnp.sum(dp * xhat, axis=(0, 1, 3))
    if train:
        if axis_name is not None:
            dbeta_g = jax.lax.psum(dbeta, axis_name)
            dgamma_g = jax.lax.psum(dgamma, axis_name)
        else:
            dbeta_g, dgamma_g = dbeta, dgamma
        dxhat = dp * gamma[None, None, :, None]
        mean_dxhat = (dbeta_g * gamma) / n
        mean_dxhat_xhat = (dgamma_g * gamma) / n
        d_out = inv[None, None, :, None] * (
            dxhat - mean_dxhat[None, None, :, None]
            - xhat * mean_dxhat_xhat[None, None, :, None])
    else:
        d_out = dp * s
    return d_out.astype(dt), dgamma, dbeta


def _vjp_bwd(train, eps, interpret, cm_in, cm_out, hw, axis_name, res, cot):
    dy, _dstats = cot
    (x_cm, w0, g0, b0, w1, g1, b1, out0, out1, stats) = res
    bm0, bv0, bm1, bv1 = stats
    multi = isinstance(x_cm, (tuple, list))
    x0 = x_cm[0] if multi else x_cm
    H, W = hw
    B, D = x0.shape[0], x0.shape[1]
    HW = H * W
    n = float(B * D * HW)
    if axis_name is not None:
        n = n * float(_axis_size(axis_name))
    dt = x0.dtype

    def bn_back(d_post, out, gamma, beta, mean, var):
        return _bn_back_cm(d_post, out, gamma, beta, mean, var, eps=eps,
                           train=train, n=n, HW=HW, dt=dt,
                           axis_name=axis_name)

    dy_cm = dy if cm_out else to_cm(dy)
    dout1, dg1, db1 = bn_back(dy_cm, out1, g1, b1, bm1, bv1)

    s0, t0 = _affine_from_stats(g0, b0, bm0, bv0, eps)
    # conv1 backward (prologue affines sized to each conv's INPUT channels)
    z1 = jnp.zeros((dout1.shape[2],), jnp.float32)
    da, _ = conv_cm(dout1, _flip_wk(w1, dt), z1, z1, H, W, D,
                    prologue=False, stats=False, interpret=interpret)
    dw1 = conv_dw_cm(out0, dout1, s0, t0, H, W, D, prologue=True,
                     interpret=interpret).astype(w1.dtype)

    dout0, dg0, db0 = bn_back(da, out0, g0, b0, bm0, bv0)

    z0v = jnp.zeros((dout0.shape[2],), jnp.float32)
    split = tuple(p.shape[2] for p in x_cm) if multi else None
    dx_cm, _ = conv_cm(dout0, _flip_wk(w0, dt), z0v, z0v, H, W, D,
                       prologue=False, stats=False, interpret=interpret,
                       out_split=split)
    zx = jnp.zeros((sum(split) if multi else x_cm.shape[2],), jnp.float32)
    dw0 = conv_dw_cm(x_cm, dout0, zx, zx, H, W, D, prologue=False,
                     interpret=interpret)
    dw0 = dw0.astype(w0.dtype)

    if multi:
        dx = tuple(p.astype(dt) for p in dx_cm)
    else:
        dx = dx_cm.astype(dt) if cm_in else from_cm(dx_cm, H, W).astype(dt)
    zf = jnp.zeros_like
    return (dx, dw0.astype(w0.dtype), dg0.astype(g0.dtype),
            db0.astype(b0.dtype), dw1, dg1.astype(g1.dtype),
            db1.astype(b1.dtype), zf(bm0), zf(bv0), zf(bm1), zf(bv1))


_fused_cbr2_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def fused_stack_supported(x_shape, features, kernel_sizes, paddings,
                          strides, norm_method, act_method, dropout):
    """The fused chain covers exactly the DC3D stack configuration.

    Channel counts below the kernel's sublane floor (the Ci=1 network
    entry) are accepted: the caller zero-pads input channels to 8
    (blocks.py ConvStack._fused) — zeros contribute nothing to the
    convolution."""
    if len(features) != 2 or norm_method != "bn" or act_method != "relu" \
            or dropout > 0:
        return False
    shape8 = tuple(x_shape[:-1]) + (max(int(x_shape[-1]), 8),)
    for k, p, s in zip(kernel_sizes, paddings, strides):
        if not supported(shape8, (k, k, k), (s, s, s),
                         ((p, p), (p, p), (p, p))):
            return False
    return True


def fused_stack_first_xla_supported(x_shape, features, kernel_sizes,
                                    paddings, strides, norm_method,
                                    act_method, dropout):
    """Partial fusion for the stack whose FIRST conv the kernel can't run
    (ds0's Ci=1): conv_0 via XLA, everything after fused. The plane/shape
    constraints must still hold for conv_1 (same H, W)."""
    if len(features) != 2 or norm_method != "bn" or act_method != "relu" \
            or dropout > 0:
        return False
    shape1 = tuple(x_shape[:-1]) + (features[0],)
    return supported(shape1, (kernel_sizes[1],) * 3, (strides[1],) * 3,
                     ((paddings[1],) * 2,) * 3)


def fused_cbr2_first_xla(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                         train=True, eps=1e-5, momentum=0.9,
                         interpret=False, cm_out=False, axis_name=None):
    """Like fused_cbr2 but conv_0 runs as an XLA convolution (used when
    the first conv's channel count is below the kernel's floor, e.g. the
    DC3D input stack's Ci=1). Everything downstream of conv_0 — stats,
    BN0 affine+relu (in conv_1's prologue), conv_1, BN1+relu — is fused.
    Input is always NDHWC (this is the network entry); cm_out keeps the
    output (and its cotangent) in the kernel layout. `axis_name` as in
    fused_cbr2 (global BN stats under shard_map DP).
    """
    y, stats = _fused_first_xla_vjp(x, w0, g0, b0, w1, g1, b1,
                                    m0, v0, m1, v1, train, eps, interpret,
                                    cm_out, axis_name)
    if cm_out:
        y = CM(y, x.shape[2], x.shape[3])
    if train:
        bm0, bv0, bm1, bv1 = stats
        new = tuple(momentum * r + (1 - momentum) * s
                    for r, s in ((m0, bm0), (v0, bv0), (m1, bm1), (v1, bv1)))
    else:
        new = (m0, v0, m1, v1)
    return y, new


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _fused_first_xla_vjp(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
                         train, eps, interpret, cm_out, axis_name):
    y, stats, _ = _fused_first_xla_fwd(x, w0, g0, b0, w1, g1, b1,
                                       m0, v0, m1, v1, train, eps,
                                       interpret, cm_out, axis_name)
    return y, stats


def _fused_first_xla_fwd(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
                         train, eps, interpret, cm_out, axis_name):
    B, D, H, W, _ = x.shape
    dt = x.dtype
    h0 = _xla_conv(x, w0)
    h0_cm = to_cm(h0)
    n = float(B * D * H * W)
    if train:
        h0f = h0.astype(jnp.float32)
        st0 = jnp.stack([jnp.sum(h0f, axis=(0, 1, 2, 3)),
                         jnp.sum(h0f * h0f, axis=(0, 1, 2, 3))])
        st0, n_g = _global_stats(st0, n, axis_name)
        bm0, bv0 = _bn_stats(st0, n_g)
    else:
        bm0, bv0 = m0, v0
    s0, t0 = _affine_from_stats(g0, b0, bm0, bv0, eps)

    out1, st1 = conv_cm(h0_cm, _wk(w1, dt), s0, t0, H, W, D,
                        prologue=True, stats=train, interpret=interpret)
    if train:
        st1, n_g = _global_stats(st1, n, axis_name)
        bm1, bv1 = _bn_stats(st1, n_g)
    else:
        bm1, bv1 = m1, v1
    s1, t1 = _affine_from_stats(g1, b1, bm1, bv1, eps)
    y_cm = jnp.maximum(
        out1.astype(jnp.float32) * s1[None, None, :, None]
        + t1[None, None, :, None], 0.0).astype(dt)
    y = y_cm if cm_out else from_cm(y_cm, H, W)
    stats = (bm0, bv0, bm1, bv1) if train \
        else (jnp.zeros_like(m0), jnp.zeros_like(v0),
              jnp.zeros_like(m1), jnp.zeros_like(v1))
    res = (x, w0, g0, b0, w1, g1, b1, h0_cm, out1, (bm0, bv0, bm1, bv1))
    return y, stats, res


def _first_xla_vjp_fwd(x, w0, g0, b0, w1, g1, b1, m0, v0, m1, v1,
                       train, eps, interpret, cm_out, axis_name):
    y, stats, res = _fused_first_xla_fwd(x, w0, g0, b0, w1, g1, b1,
                                         m0, v0, m1, v1, train, eps,
                                         interpret, cm_out, axis_name)
    return (y, stats), res


def _first_xla_vjp_bwd(train, eps, interpret, cm_out, axis_name, res, cot):
    dy, _ = cot
    (x, w0, g0, b0, w1, g1, b1, h0_cm, out1, stats) = res
    bm0, bv0, bm1, bv1 = stats
    B, D, H, W = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
    HW = H * W
    n = float(B * D * HW)
    if axis_name is not None:
        n = n * float(_axis_size(axis_name))
    dt = x.dtype

    def bn_back(d_post, out, gamma, beta, mean, var):
        return _bn_back_cm(d_post, out, gamma, beta, mean, var, eps=eps,
                           train=train, n=n, HW=HW, dt=dt,
                           axis_name=axis_name)

    dy_cm = dy if cm_out else to_cm(dy)
    dout1, dg1, db1 = bn_back(dy_cm, out1, g1, b1, bm1, bv1)

    s0, t0 = _affine_from_stats(g0, b0, bm0, bv0, eps)
    z1 = jnp.zeros((dout1.shape[2],), jnp.float32)
    da, _ = conv_cm(dout1, _flip_wk(w1, dt), z1, z1, H, W, D,
                    prologue=False, stats=False, interpret=interpret)
    dw1 = conv_dw_cm(h0_cm, dout1, s0, t0, H, W, D, prologue=True,
                     interpret=interpret).astype(w1.dtype)

    dh0_cm, dg0, db0 = bn_back(da, h0_cm, g0, b0, bm0, bv0)
    dh0 = from_cm(dh0_cm, H, W)
    _, pullback = jax.vjp(lambda xx, ww: _xla_conv(xx, ww), x, w0)
    dx, dw0 = pullback(dh0.astype(x.dtype))

    zf = jnp.zeros_like
    return (dx, dw0.astype(w0.dtype), dg0.astype(g0.dtype),
            db0.astype(b0.dtype), dw1, dg1.astype(g1.dtype),
            db1.astype(b1.dtype), zf(bm0), zf(bv0), zf(bm1), zf(bv1))


_fused_first_xla_vjp.defvjp(_first_xla_vjp_fwd, _first_xla_vjp_bwd)
