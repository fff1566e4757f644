"""Forward-only benchmark of the flagship eval model (stage2 shape:
B lobe chunks of 80^3), Pallas conv / attention on or off."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dram_tpu.models import DC3DATGeneric
from dram_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas-conv", type=int, default=0)
    ap.add_argument("--pallas-att", type=int, default=1)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    model = DC3DATGeneric(train=False, at_spatial_size=(64, 64, 64),
                          use_pallas_attention=bool(args.pallas_att),
                          use_pallas_conv=bool(args.pallas_conv),
                          dtype=jnp.bfloat16)
    B = args.batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 80, 80, 80, 1)),
                         dtype=jnp.float32)
    lobes = jnp.asarray(rng.uniform(size=(B, 80, 80, 80, 1)) > 0.3,
                        dtype=jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1],
                                    lobes[:1])

    @jax.jit
    def fwd(images, lobes):
        dense, refined = model.apply(variables, images, lobes)
        return jnp.sum(refined)

    t0 = time.perf_counter()
    jax.block_until_ready(fwd(images, lobes))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        out = fwd(images, lobes)
        # force a real D2H: device timing via block_until_ready is
        # unreliable on this backend
        float(out)
        times.append(time.perf_counter() - t0)
    ms = np.median(times) * 1e3
    print(f"fwd pallas_conv={args.pallas_conv} pallas_att={args.pallas_att}"
          f" batch={B}: {ms:.1f} ms median, min {min(times)*1e3:.1f}")


if __name__ == "__main__":
    main()
