"""Microbenchmark: 2x align-corners trilinear upsample formulations on the
cm layout (the us_2 decoder step: (10, 40, 128, 40^2) -> 80^3), fwd+bwd.

The train-step trace shows ~30 ms/step of copies + conv-lowered einsums
around resize_cm at the us_2 level; this bench compares rewrites.

Usage: python tools/bench_upsample.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dram_tpu.core.pallas.cm import CM, concat_cm, upsample2x_cm, _repack, _unpack
from dram_tpu.core.resample import _axis_weights
from dram_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, D, C, H, W = 10, 40, 128, 40, 40
CS = 64  # skip channels at 80^3


def wmat(n, dtype=jnp.float32):
    Wm, _ = _axis_weights(n, 2 * n, "linear_ac", None)
    return jnp.asarray(Wm, dtype)


def current(cm, skip):
    return concat_cm([upsample2x_cm(cm), skip]).data


def v_bf16(cm, skip):
    """All three axis mixes in bf16 (activations are bf16 anyway)."""
    x = _unpack(cm)  # (B, D, C, H, W)
    dt = x.dtype
    WD, WH, WW = wmat(D, dt), wmat(H, dt), wmat(W, dt)
    x = jnp.einsum("oi,bichw->bochw", WD, x)
    x = jnp.einsum("oh,bdchw->bdcow", WH, x)
    x = jnp.einsum("ow,bdchw->bdcho", WW, x)
    up = CM(_repack(x, cm.dtype), 2 * H, 2 * W)
    return concat_cm([up, skip]).data


def v_gemm(cm, skip):
    """Contraction-minor GEMM chain: D on (B,D,CM); H/W via the
    double-swap trick (each dot contracts the middle dim; two swaps
    restore plane orientation)."""
    dt = cm.data.dtype
    WD, WH, WW = wmat(D, dt), wmat(H, dt), wmat(W, dt)
    data = cm.data  # (B, D, C, M)
    M = data.shape[-1]
    # D axis: (2D, D) x (B, D, C*M)
    x = jax.lax.dot_general(WD, data.reshape(B, D, C * M),
                            (((1,), (1,)), ((), ())))  # (2D, B, C*M)
    x = jnp.transpose(x, (1, 0, 2)).reshape(B, 2 * D, C, M)[..., :H * W]
    x = x.reshape(B * 2 * D * C, H, W)
    # H axis: contract H -> (N, W, 2H)
    x = jax.lax.dot_general(x, WH, (((1,), (1,)), ((), ())))
    # W axis: contract W -> (N, 2H, 2W)
    x = jax.lax.dot_general(x, WW, (((1,), (1,)), ((), ())))
    x = x.reshape(B, 2 * D, C, 2 * H, 2 * W)
    up = CM(_repack(x, cm.dtype), 2 * H, 2 * W)
    return concat_cm([up, skip]).data


def bench(fn, cm, skip):
    """Per-iteration time via an in-jit scan (the tunneled backend's
    dispatch overhead and lazy block_until_ready make per-call timing
    meaningless)."""
    def run(iters):
        def body(c, _):
            g = jax.grad(lambda cd: jnp.sum(
                fn(CM(cd, H, W), skip).astype(jnp.float32) ** 2))(c)
            return c + 1e-12 * g.astype(c.dtype), None

        @jax.jit
        def loop(c, skip_data):
            c, _ = jax.lax.scan(
                lambda cc, _: ((cc + 1e-12 * jax.grad(lambda cd: jnp.sum(
                    fn(CM(cd, H, W), CM(skip_data, 2 * H, 2 * W))
                    .astype(jnp.float32) ** 2))(cc).astype(cc.dtype)), None),
                c, None, length=iters)
            return jnp.sum(c.astype(jnp.float32))

        float(loop(cm.data, skip.data))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop(cm.data, skip.data))
            ts.append(time.perf_counter() - t0)
        return np.median(ts) * 1e3

    t1, t11 = run(1), run(11)
    return (t11 - t1) / 10


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
    s = jnp.asarray(rng.normal(size=(B, 2 * D, 2 * H, 2 * W, CS)), jnp.bfloat16)
    from dram_tpu.core.pallas.cm import to_cm_t
    cm, skip = to_cm_t(x), to_cm_t(s)

    ref = None
    for name, fn in [("current_f32", current), ("bf16_einsum", v_bf16),
                     ("gemm_chain", v_gemm)]:
        out = fn(cm, skip)
        if ref is None:
            ref = out.astype(jnp.float32)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        ms = bench(fn, cm, skip)
        print(f"{name:14s} {ms:7.2f} ms fwd+bwd   max|diff vs f32| {err:.3e}")


if __name__ == "__main__":
    main()
