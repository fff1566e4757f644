"""Per-stack timing of the fused conv chain at every DC3D stack shape.

Attributes the train step's Pallas time (tools/parse_trace.py shows the
fused kernels at ~53% of the step) to individual stacks so optimization
effort goes to the right kernel. Prints fwd and fwd+bwd wall ms plus the
achieved TFLOP/s per stack (B=10, bf16, the shipped config's geometry).

Usage: python tools/bench_fused_shapes.py [--batch 10] [--dtype bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dram_tpu.core.pallas.fused_stack import fused_cbr2, fused_cbr2_first_xla
from dram_tpu.utils import enable_compilation_cache

# (name, D=H=W, Ci, C0, C1, first_xla)
STACKS = [
    ("ds0", 80, 1, 32, 64, True),
    ("ds1", 40, 64, 64, 128, False),
    ("ds2", 20, 128, 128, 256, False),
    ("ds3", 10, 256, 256, 512, False),
    ("us2", 20, 768, 256, 256, False),
    ("us1", 40, 384, 128, 128, False),
    ("us0", 80, 192, 64, 64, False),
]


def time_call(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    enable_compilation_cache()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    rng = np.random.default_rng(0)

    print(f"backend: {jax.default_backend()}  B={B} dtype={args.dtype}")
    tot_f = tot_b = 0.0
    for name, S, Ci, C0, C1, first_xla in STACKS:
        x = jnp.asarray(rng.normal(size=(B, S, S, S, Ci)) * 0.3, dt)
        w0 = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, C0)) * 0.05,
                         jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 3, C0, C1)) * 0.05,
                         jnp.float32)
        g0 = jnp.ones((C0,)); b0 = jnp.zeros((C0,))
        g1 = jnp.ones((C1,)); b1 = jnp.zeros((C1,))
        m0 = jnp.zeros((C0,)); v0 = jnp.ones((C0,))
        m1 = jnp.zeros((C1,)); v1 = jnp.ones((C1,))
        fn = fused_cbr2_first_xla if first_xla else fused_cbr2

        def fwd(x, w0, w1):
            y, _ = fn(x, w0, g0, b0, m0, v0, w1, g1, b1, m1, v1, train=True)
            return y

        def loss(x, w0, w1):
            return jnp.sum(jnp.square(fwd(x, w0, w1)))

        f_ms = time_call(jax.jit(fwd), x, w0, w1, iters=args.iters)
        fb_ms = time_call(jax.jit(jax.grad(loss, argnums=(0, 1, 2))),
                          x, w0, w1, iters=args.iters)
        vox = B * S ** 3
        tf_fwd = 2 * 27 * (Ci * C0 + C0 * C1) * vox / 1e12
        tf_all = 3 * tf_fwd  # fwd + dx + dw
        tot_f += f_ms
        tot_b += fb_ms
        print(f"{name}: {S}^3 {Ci}->{C0}->{C1}  fwd {f_ms:7.2f} ms "
              f"({tf_fwd / f_ms * 1e3:6.1f} TF/s)   fwd+bwd {fb_ms:7.2f} ms "
              f"({tf_all / fb_ms * 1e3:6.1f} TF/s)", flush=True)
    print(f"total: fwd {tot_f:.1f} ms, fwd+bwd {tot_b:.1f} ms")


if __name__ == "__main__":
    main()
