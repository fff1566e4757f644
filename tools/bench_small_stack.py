"""Fused Pallas chain vs plain-XLA conv stack at the small DC3D shapes.

tools/bench_fused_shapes.py shows ds2 (20^3) and ds3 (10^3) running at
7-21 TF/s — far off the 60-90 TF/s of the big decoder stacks. The tiny
grids leave the fused kernels dispatch/DMA-bound. This tool times the
same stack as a plain XLA NDHWC conv+bn+relu chain (what blocks.py runs
when the fused gate is off) to decide whether small stacks should fall
back to XLA.

Usage: python tools/bench_small_stack.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dram_tpu.core.pallas.cm import CM, to_cm, from_cm
from dram_tpu.core.pallas.fused_stack import fused_cbr2
from dram_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B = 10
# (name, D=H=W, Ci, C0, C1)
STACKS = [
    ("ds2", 20, 128, 128, 256),
    ("ds3", 10, 256, 256, 512),
    ("us2", 20, 768, 256, 256),
]


def xla_stack(x, w0, g0, b0, w1, g1, b1, eps=1e-5):
    """Plain XLA conv->bn->relu x2 (batch-stats path, NDHWC)."""
    def cbr(x, w, g, b):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, axis=(0, 1, 2, 3))
        v = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1, 2, 3)) - m * m, 0.0)
        inv = jax.lax.rsqrt(v + eps)
        return jnp.maximum((yf - m) * (g * inv) + b, 0.0).astype(x.dtype)
    return cbr(cbr(x, w0, g0, b0), w1, g1, b1)


def bench(fn, args, iters=10):
    out = jax.block_until_ready(fn(*args))
    del out
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    rng = np.random.default_rng(0)
    for name, S, Ci, C0, C1 in STACKS:
        x = jnp.asarray(rng.normal(size=(B, S, S, S, Ci)), jnp.bfloat16)
        w0 = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, C0)) * 0.05,
                         jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 3, C0, C1)) * 0.05,
                         jnp.float32)
        g0, b0 = jnp.ones((C0,)), jnp.zeros((C0,))
        g1, b1 = jnp.ones((C1,)), jnp.zeros((C1,))
        m0, v0 = jnp.zeros((C0,)), jnp.ones((C0,))
        m1, v1 = jnp.zeros((C1,)), jnp.ones((C1,))

        @jax.jit
        def fused_fb(x, w0, g0, b0, w1, g1, b1):
            def loss(x, w0, g0, b0, w1, g1, b1):
                y, _ = fused_cbr2(CM(to_cm(x), x.shape[2], x.shape[3]),
                                  w0, g0, b0, m0, v0, w1, g1, b1, m1, v1,
                                  train=True, cm_out=True)
                return jnp.sum(y.data.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
                x, w0, g0, b0, w1, g1, b1)

        @jax.jit
        def xla_fb(x, w0, g0, b0, w1, g1, b1):
            def loss(x, w0, g0, b0, w1, g1, b1):
                y = xla_stack(x, w0, g0, b0, w1, g1, b1)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
                x, w0, g0, b0, w1, g1, b1)

        args = (x, w0, g0, b0, w1, g1, b1)
        tf = bench(fused_fb, args)
        tx = bench(xla_fb, args)
        flops = 2 * 27 * B * S ** 3 * (Ci * C0 + C0 * C1) * 3  # fwd+dx+dw
        print(f"{name}: {S}^3 {Ci}->{C0}->{C1}  fused {tf:7.2f} ms "
              f"({flops / tf / 1e9:5.1f} TF/s)  xla {tx:7.2f} ms "
              f"({flops / tx / 1e9:5.1f} TF/s)")


if __name__ == "__main__":
    main()
