"""Prototype: channels-minor (NDHWC-native) Pallas conv3d forward.

The shipped kernel (core/pallas/conv3d.py) is plane-minor: it transposes
activations to (B, D, C, H*W), which XLA materializes as large padded
copies around each call — the HBM cost that blocks default-on training.
This prototype keeps the native (B, D, H*W, C) layout: rolls ride the
sublane (H*W) axis and the MXU contracts over C.

FINDING (v5e, jax 0.8 Mosaic): manual-DMA slices require the memref's
minor dimension to be a multiple of 128, so this layout only lowers for
Ci in {128, 256, 384, 512, 768} — the hot 80^3 DC3D layers (Ci=64/192)
cannot use it (tpu.memref_slice fails on the lane-padded source). The
shipped plane-minor kernel stays; its layout copies turned out not to
block bs=10 training (see BASELINE.md), so this remains exploratory.

Usage: python tools/proto_conv_cminor.py [D H W Ci Co B]  (Ci % 128 == 0)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dram_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def _row_valid(H, W, dy, dx, dtype):
    """(H*W, 1) mask over the sublane axis: neighbour inside the plane."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (H * W, 1), 0) // W
    ix = jax.lax.broadcasted_iota(jnp.int32, (H * W, 1), 0) % W
    m = ((iy + dy >= 0) & (iy + dy < H) & (ix + dx >= 0) & (ix + dx < W))
    return m.astype(dtype)


def _roll_rows(x, s):
    """out[p] = x[p + s] along the sublane axis (axis 0)."""
    if s == 0:
        return x
    s = s % x.shape[0]
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _fwd_kernel(w_ref, x_hbm, out_ref, acc, pm, p0, pp, slab, sem, *,
                H, W, Ci, Co, BD):
    b, z = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(z * BD, BD + 2)], slab, sem)
    cp.start()
    w = w_ref[:]  # (9, 3*Ci, Co): [dz*3+dy][dx*Ci+ci, co]
    cp.wait()

    M = H * W
    for r in range(BD + 2):
        row = slab[r]                       # (M, Ci)
        pm[r] = _roll_rows(row, -1) * _row_valid(H, W, 0, -1, row.dtype)
        p0[r] = row
        pp[r] = _roll_rows(row, 1) * _row_valid(H, W, 0, 1, row.dtype)

    for r in range(BD):
        acc[:] = jnp.zeros_like(acc)
        for dyi, dy in enumerate((-1, 0, 1)):
            v = jnp.zeros((M, Co), jnp.float32)
            for dzi in range(3):
                wk = w[dzi * 3 + dyi]       # (3*Ci, Co)
                for k, buf in enumerate((pm, p0, pp)):
                    v += jax.lax.dot_general(
                        buf[r + dzi], wk[k * Ci:(k + 1) * Ci],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc[:] += _roll_rows(v, dy * W) * \
                _row_valid(H, W, dy, 0, jnp.float32)
        out_ref[r] = acc[:].astype(out_ref.dtype)


def conv3d_cminor(x, w, interpret=False):
    B, D, H, W, Ci = x.shape
    Co = w.shape[-1]
    M = H * W
    xp = jnp.pad(x.reshape(B, D, M, Ci), [(0, 0), (1, 1), (0, 0), (0, 0)])
    # (9, 3*Ci, Co): [dz*3+dy][dx*Ci+ci, co] — (dx, ci) flatten dx-major
    wk = w.astype(x.dtype).reshape(9, 3 * Ci, Co)

    per_row = 4 * Ci * M * x.dtype.itemsize  # 3 patch bufs + slab
    BD = int(max(1, min(8, (48 * 1024 * 1024) // per_row - 2)))
    while D % BD:
        BD -= 1
    kernel = functools.partial(_fwd_kernel, H=H, W=W, Ci=Ci, Co=Co, BD=BD)
    out = pl.pallas_call(
        kernel,
        grid=(B, D // BD),
        in_specs=[
            pl.BlockSpec((9, 3 * Ci, Co), lambda b, z: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, BD, M, Co),
                               lambda b, z: (b, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, M, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, Co), jnp.float32),
            pltpu.VMEM((BD + 2, M, Ci), x.dtype),
            pltpu.VMEM((BD + 2, M, Ci), x.dtype),
            pltpu.VMEM((BD + 2, M, Ci), x.dtype),
            pltpu.VMEM((BD + 2, M, Ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(wk, xp)
    return out.reshape(B, D, H, W, Co)


def main():
    args = [int(a) for a in sys.argv[1:]] or []
    D, H, W, Ci, Co, B = (args + [40, 40, 40, 64, 64, 1][len(args):])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.05, jnp.bfloat16)

    ref = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
    f = jax.jit(lambda x, w: conv3d_cminor(x, w))

    t0 = time.perf_counter()
    got = f(x, w)
    jax.block_until_ready(got)
    print(f"compile+run {time.perf_counter() - t0:.1f}s")
    want = ref(x, w)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want)) / \
        jnp.maximum(jnp.max(jnp.abs(want)), 1e-6)
    print("rel err:", float(err))

    from dram_tpu.core.pallas.conv3d import conv3d_pallas
    g = jax.jit(lambda x, w: conv3d_pallas(x, w))
    jax.block_until_ready(g(x, w))

    for name, fn in (("cminor", f), ("plane-minor", g)):
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x, w))
            times.append(time.perf_counter() - t0)
        print(f"{name}: {np.median(times)*1e3:.2f} ms median")


if __name__ == "__main__":
    main()
