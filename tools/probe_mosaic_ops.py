"""Probe which plane-restructuring ops lower in Mosaic on this libtpu:
lane-split reshapes, strided lane/sublane slices, small reduces — the
building blocks for an in-kernel 2x2 plane pool. Each probe compiles a
tiny kernel and reports OK / fail reason (first line)."""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, H, W = 8, 16, 128
M = H * W


def run(name, body, out_shape):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    x = jnp.asarray(np.random.default_rng(0).normal(size=(C, M)), jnp.float32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )
        got = jax.jit(f)(x)
        jax.block_until_ready(got)
        print(f"OK    {name}")
        return np.asarray(got)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL  {name}: {msg}")
        return None


def main():
    print(f"backend: {jax.default_backend()}")
    # 1. lane-split reshape (C, M) -> (C, H, W)
    run("reshape_lane_split", lambda v: v.reshape(C, H, W).sum(axis=1),
        (C, W))
    # 2. strided lane slice
    run("strided_lane_slice", lambda v: v[:, ::2], (C, M // 2))
    # 3. lane pair reshape + reduce
    run("lane_pair_reduce", lambda v: v.reshape(C, M // 2, 2).max(axis=2),
        (C, M // 2))
    # 4. sublane strided slice on 3-D value
    run("sublane_strided", lambda v: v.reshape(C * H, W)[::2, :],
        (C * H // 2, W))
    # 5. sublane-collapse reshape (merge leading dims)
    run("sublane_collapse", lambda v: v.reshape(C * H, W) + 0.0,
        (C * H, W))
    # 6. transpose last two dims of 2-D
    run("transpose2d", lambda v: v.reshape(C * H, W)[:128, :].T,
        (W, 128))
    # 7. lane roll (known good)
    run("lane_roll", lambda v: jnp.concatenate([v[:, 1:], v[:, :1]], -1),
        (C, M))
    # 8. gather even lanes via iota-select + reshape... dynamic? skip
    # 9. sum-reduce over sublane dim of 3-D
    run("reduce_mid_3d", lambda v: v.reshape(C, H, W).max(axis=1), (C, W))
    # 10. lane-merge reshape (C, H, W) -> (C, H*W)
    run("lane_merge", lambda v: (v.reshape(C, H, W) + 1.0).reshape(C, M),
        (C, M))
    # 11. mid-split reshape + reduce: (C, H, W) -> (C, H/2, 2, W) max ax2
    run("mid_split_reduce",
        lambda v: v.reshape(C, H, W).reshape(C, H // 2, 2, W).max(axis=2),
        (C, H // 2, W))
    # 12. in-kernel small dot for lane compaction: (C*H, W) @ (W, W/2)
    def compact(v):
        sel = (jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 0)
               == 2 * jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 1)
               ).astype(jnp.float32)
        return jax.lax.dot_general(v.reshape(C * H, W), sel,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    run("compact_dot", compact, (C * H, W // 2))
    # 13. leading broadcast expand: (C, H, W) -> (C, H, 2, W) -> (C, 2H, W)
    run("bcast_expand",
        lambda v: jnp.broadcast_to(v.reshape(C, H, 1, W),
                                   (C, H, 2, W)).reshape(C, 2 * H, W),
        (C, 2 * H, W))


if __name__ == "__main__":
    main()
