"""Probe conv3d_pallas fwd+bwd per DC3D layer shape on the current backend.

Finds which (spatial, Ci, Co) combination fails to lower/compile, so the
supported() gate can exclude it.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dram_tpu.core.pallas.conv3d import conv3d_pallas, supported

# (D, H, W, Ci, Co) for every DC3D conv (bs10 config), deduped
SHAPES = [
    (80, 80, 80, 32, 64),
    (40, 40, 40, 64, 64),
    (40, 40, 40, 64, 128),
    (20, 20, 20, 128, 128),
    (20, 20, 20, 128, 256),
    (10, 10, 10, 256, 256),
    (10, 10, 10, 256, 512),
    (20, 20, 20, 768, 256),
    (20, 20, 20, 256, 256),
    (40, 40, 40, 384, 128),
    (40, 40, 40, 128, 128),
    (80, 80, 80, 192, 64),
    (80, 80, 80, 64, 64),
]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dtype = jnp.bfloat16
    for (D, H, W, Ci, Co) in SHAPES:
        shape = (B, D, H, W, Ci)
        if not supported(shape, (3, 3, 3), (1, 1, 1), "SAME"):
            print(f"{shape} Co={Co}: gated out")
            continue
        x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                        dtype=dtype)
        w = jnp.asarray(np.random.default_rng(1).normal(
            size=(3, 3, 3, Ci, Co)) * 0.05, dtype=dtype)

        def f(x, w):
            return jnp.sum(conv3d_pallas(x, w) ** 2)

        try:
            t0 = time.perf_counter()
            g = jax.jit(jax.grad(f, argnums=(0, 1)))(x, w)
            jax.block_until_ready(g)
            dt = time.perf_counter() - t0
            print(f"{shape} Co={Co}: OK ({dt:.1f}s compile+run)")
        except Exception:
            print(f"{shape} Co={Co}: FAIL")
            traceback.print_exc(limit=3)


if __name__ == "__main__":
    main()
