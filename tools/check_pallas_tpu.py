#!/usr/bin/env python3
"""Numeric check of both Pallas kernels at PRODUCTION shapes on a real TPU.

The CPU test suite grad-checks the kernels in interpret mode at toy shapes
(tests/test_pallas_attention.py, tests/test_pallas_conv.py); Mosaic
lowering at the real shapes is a different code path, so this script runs
on the actual chip and asserts:

  1. stencil attention fwd + VJP at the flagship 64^3 / F=G=8 / B=5 shape
     (reference st_dram_ref_att.py:72-76) vs the XLA stencil math;
  2. fused conv3d fwd + VJP at a production DC3D layer shape (80^3, Ci=64)
     vs lax.conv_general_dilated.

Run it alone (the TPU grant is exclusive):  python tools/check_pallas_tpu.py
Part of the verify recipe after editing core/pallas/*.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _report(name, got, want, atol, rtol):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    adiff = np.abs(got - want).max()
    denom = np.maximum(np.abs(want), 1e-6)
    rdiff = (np.abs(got - want) / denom).max()
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{name}: max abs diff {adiff:.3e}, max rel diff {rdiff:.3e} "
          f"-> {'OK' if ok else 'FAIL'}")
    return ok


def check_attention():
    from dram_tpu.core.pallas.window_attention import stencil_attention
    from dram_tpu.models.pcm import (_masked_softmax, _shift, _valid_masks,
                                     stencil_offsets)

    offs = stencil_offsets(3, 2, False)
    B, S, F, G = 5, (64, 64, 64), 8, 8
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(B, *S, F)).astype(np.float32))
    phi = jnp.asarray(rng.normal(size=(B, *S, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, *S, G)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(B, *S, G)).astype(np.float32))

    def xla_attention(t, p, gg):
        valid = _valid_masks(S, offs).astype(t.dtype)
        sqrt_deg = jnp.sqrt(jnp.maximum(jnp.sum(valid, -1), 1.0))[..., None]
        dots = jnp.stack([jnp.sum(t * _shift(p, off), -1) for off in offs], -1)
        w = _masked_softmax(jax.nn.relu(dots) / sqrt_deg, valid[None])
        out = 0.0
        for k, off in enumerate(offs):
            out = out + w[..., k:k + 1] * _shift(gg, off)
        return out

    def loss_pallas(t, p, gg):
        return jnp.sum(stencil_attention(t, p, gg, offs, 4, False) * cot)

    def loss_xla(t, p, gg):
        return jnp.sum(xla_attention(t, p, gg) * cot)

    ok = True
    t0 = time.time()
    fwd_p = jax.jit(lambda t, p, gg: stencil_attention(
        t, p, gg, offs, 4, False))(theta, phi, g)
    fwd_p.block_until_ready()
    print(f"attention fwd (pallas) compiled+ran in {time.time() - t0:.1f}s")
    fwd_x = jax.jit(xla_attention)(theta, phi, g)
    ok &= _report("attention fwd 64^3 F=G=8 B=5", fwd_p, fwd_x,
                  atol=2e-3, rtol=2e-3)

    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(theta, phi, g)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(theta, phi, g)
    for a, b, name in zip(gp, gx, ("theta", "phi", "g_cam")):
        ok &= _report(f"attention VJP d{name}", a, b, atol=5e-3, rtol=5e-3)
    return ok


def check_conv3d():
    from dram_tpu.core.pallas.conv3d import conv3d_pallas

    B, S, Ci, Co = 2, (80, 80, 80), 64, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, *S, Ci)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)).astype(np.float32)
                    * 0.05)
    cot = jnp.asarray(rng.normal(size=(B, *S, Co)).astype(np.float32))

    def xla_conv(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    ok = True
    t0 = time.time()
    yp = jax.jit(conv3d_pallas)(x, w)
    yp.block_until_ready()
    print(f"conv3d fwd (pallas) compiled+ran in {time.time() - t0:.1f}s")
    yx = jax.jit(xla_conv)(x, w)
    ok &= _report("conv3d fwd 80^3 64->32", yp, yx, atol=2e-3, rtol=2e-2)

    gp = jax.jit(jax.grad(lambda a, b: jnp.sum(conv3d_pallas(a, b) * cot),
                          argnums=(0, 1)))(x, w)
    gx = jax.jit(jax.grad(lambda a, b: jnp.sum(xla_conv(a, b) * cot),
                          argnums=(0, 1)))(x, w)
    ok &= _report("conv3d VJP dx", gp[0], gx[0], atol=5e-3, rtol=2e-2)
    ok &= _report("conv3d VJP dw", gp[1], gx[1], atol=5e-2, rtol=2e-2)
    return ok


def check_fused_stack():
    """Fused conv->bn->relu chain at a production stack shape (us2: 80^3,
    192->64->64, bs4) vs the unfused reference math, fwd + grads."""
    from dram_tpu.core.pallas.fused_stack import fused_cbr2

    B, D, H, W, Ci, C0, C1 = 4, 80, 80, 80, 192, 64, 64
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)).astype(np.float32)
                    * 0.3)
    w0 = jnp.asarray((rng.normal(size=(3, 3, 3, Ci, C0)) * 0.02)
                     .astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(3, 3, 3, C0, C1)) * 0.05)
                     .astype(np.float32))
    g0 = jnp.ones((C0,)); b0 = jnp.zeros((C0,))
    g1 = jnp.ones((C1,)); b1 = jnp.zeros((C1,))
    m0 = jnp.zeros((C0,)); v0 = jnp.ones((C0,))
    m1 = jnp.zeros((C1,)); v1 = jnp.ones((C1,))

    def ref(x, w0, g0, b0, w1, g1, b1):
        def conv(a, w):
            return jax.lax.conv_general_dilated(
                a, w, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        def bn(a, g, b):
            mean = jnp.mean(a, axis=(0, 1, 2, 3))
            var = jnp.mean(a * a, axis=(0, 1, 2, 3)) - mean * mean
            return jax.nn.relu((a - mean) * jax.lax.rsqrt(var + 1e-5)
                               * g + b)

        return bn(conv(bn(conv(x, w0), g0, b0), w1), g1, b1)

    ok = True
    t0 = time.time()
    yf, _ = jax.jit(lambda *a: fused_cbr2(*a, train=True))(
        x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1)
    yf.block_until_ready()
    print(f"fused stack fwd compiled+ran in {time.time() - t0:.1f}s")
    yr = jax.jit(ref)(x, w0, g0, b0, w1, g1, b1)
    ok &= _report("fused stack fwd 80^3 192->64->64", yf, yr,
                  atol=5e-3, rtol=5e-2)

    cot = jnp.asarray(rng.normal(size=yf.shape).astype(np.float32))

    # cot MUST be an argument: closed over, the 131 MB constant is baked
    # into the remote-compile request and trips the axon tunnel's body
    # limit (HTTP 413)
    def lf(x, w0, w1, cot):
        y, _ = fused_cbr2(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                          train=True)
        return jnp.sum(y * cot)

    def lr(x, w0, w1, cot):
        return jnp.sum(ref(x, w0, g0, b0, w1, g1, b1) * cot)

    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(x, w0, w1, cot)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(x, w0, w1, cot)
    # elementwise tolerances are the wrong metric here: the two forwards
    # differ by ~3e-3 (BN-stat accumulation order), so a handful of relu
    # gates near zero flip between them (~0.0004% of 131M elements,
    # measured), and each flip injects an O(1) elementwise grad spike.
    # rel-L2 + cosine are robust to that and still catch real kernel bugs
    # (any systematic error shows up at >1e-2 rel-L2).
    for a, b, name in zip(gf, gr, ("x", "w0", "w1")):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        cos = float(np.sum(a * b)
                    / (np.linalg.norm(a) * np.linalg.norm(b)))
        good = rel < 1e-2 and cos > 0.9999
        print(f"fused stack grad d{name}: rel-L2 {rel:.3e} cos {cos:.6f}"
              f" -> {'OK' if good else 'FAIL'}")
        ok &= good

    # cm-resident wrapper (CM in / CM out, the layout the model keeps
    # between stacks) must be bit-identical to the NDHWC wrapper: same
    # kernels, only the boundary transposes move
    from dram_tpu.core.pallas.cm import as_ndhwc, to_cm_t

    def f_cm(x):
        y, _ = fused_cbr2(to_cm_t(x), w0, g0, b0, m0, v0, w1, g1, b1,
                          m1, v1, train=True, cm_out=True)
        return as_ndhwc(y)

    y_cm = jax.jit(f_cm)(x)
    ok &= _report("fused stack cm-in/cm-out vs NDHWC", y_cm, yf,
                  atol=0.0, rtol=0.0)

    # VIRTUAL concat (tuple of CM parts, the decoder's upsample+skip
    # streaming path): must be bit-identical to the same stack on the
    # materialized concat — the kernel only changes which HBM ref each
    # patch column streams from. 192 = 128 (upsampled) + 64 (skip).
    def f_vc(x, cot):
        parts = (to_cm_t(x[..., :128]), to_cm_t(x[..., 128:]))
        y, _ = fused_cbr2(parts, w0, g0, b0, m0, v0, w1, g1, b1,
                          m1, v1, train=True, cm_out=True)
        return jnp.sum(as_ndhwc(y) * cot)

    y_vc = jax.jit(lambda x: as_ndhwc(fused_cbr2(
        (to_cm_t(x[..., :128]), to_cm_t(x[..., 128:])),
        w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
        train=True, cm_out=True)[0]))(x)
    ok &= _report("fused stack VIRTUAL concat vs single CM", y_vc, yf,
                  atol=0.0, rtol=0.0)
    g_vc = jax.jit(jax.grad(f_vc))(x, cot)
    g_cm = jax.jit(jax.grad(lambda x, cot:
                            jnp.sum(f_cm(x) * cot)))(x, cot)
    ok &= _report("fused stack VIRTUAL concat dx", g_vc, g_cm,
                  atol=0.0, rtol=0.0)
    return ok


def check_pool():
    """Pallas 2x2x2 max-pool vs the XLA cm pool at the production 80^3
    encoder shape — forward and gradient must be bit-identical (even
    tie-split semantics)."""
    import time

    from dram_tpu.core.pallas.cm import CM, maxpool2_cm
    from dram_tpu.core.pallas.pool import maxpool2_flat

    B, D, H, W, C = 10, 80, 80, 80, 64
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, D, C, H * W)), jnp.bfloat16)
    HW2 = (H // 2) * (W // 2)

    def f_p(d):
        return maxpool2_flat(d, H, W)[..., :HW2]

    def f_x(d):
        return maxpool2_cm(CM(d, H, W), use_pallas=False).data[..., :HW2]

    t0 = time.time()
    got = jax.jit(f_p)(x)
    jax.block_until_ready(got)
    print(f"pool fwd (pallas) compiled+ran in {time.time() - t0:.1f}s")
    ok = _report("pool fwd 80^3 C=64", got, jax.jit(f_x)(x),
                 atol=0.0, rtol=0.0)
    gp = jax.jit(jax.grad(lambda d: jnp.sum(f_p(d).astype(jnp.float32)
                                            ** 2)))(x)
    gx = jax.jit(jax.grad(lambda d: jnp.sum(f_x(d).astype(jnp.float32)
                                            ** 2)))(x)
    ok &= _report("pool grad 80^3 C=64", gp, gx, atol=0.0, rtol=0.0)
    return ok


def check_upsample():
    """Pallas depth-2x row-lerp vs the einsum formulation at the
    production us_2 shape — fwd and VJP (same f32 lerp weights, so the
    tolerance is pure summation-order noise)."""
    import time

    from dram_tpu.core.pallas.cm import _up2_depth_einsum
    from dram_tpu.core.pallas.upsample import up2_depth_flat

    B, D, C, M = 10, 40, 128, 6400
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, D, C, M)), jnp.bfloat16)
    ct = jnp.asarray(rng.normal(size=(B, 2 * D, C, M)), jnp.bfloat16)

    t0 = time.time()
    got = jax.jit(up2_depth_flat)(x)
    jax.block_until_ready(got)
    print(f"up2_depth fwd (pallas) compiled+ran in {time.time() - t0:.1f}s")
    want = jax.jit(lambda v: _up2_depth_einsum(v, D))(x)
    ok = _report("up2_depth fwd 40->80 C=128", got.astype(jnp.float32),
                 want.astype(jnp.float32), atol=1e-2, rtol=1e-2)
    _, vp = jax.vjp(lambda v: up2_depth_flat(v), x)
    _, vx = jax.vjp(lambda v: _up2_depth_einsum(v, D), x)
    gp, = jax.jit(vp)(ct)
    gx, = jax.jit(vx)(ct)
    ok &= _report("up2_depth VJP dx", gp.astype(jnp.float32),
                  gx.astype(jnp.float32), atol=2e-2, rtol=2e-2)
    return ok


def main():
    from dram_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend != "tpu":
        print("WARNING: not on TPU — this checks Mosaic lowering; "
              "run it on the chip.")
    ok = check_attention()
    ok &= check_conv3d()
    ok &= check_fused_stack()
    ok &= check_pool()
    ok &= check_upsample()
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
