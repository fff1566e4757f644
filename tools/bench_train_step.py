"""TPU training-step microbenchmark: DC3D / DC3DATGeneric, Pallas conv
and attention on/off.

Times the full jitted train step (forward + IntRegRefineLoss + backward +
Adam update) on batch 10 x 80^3 bf16 chunks, matching the shipped
`configs/st_dram_ref.py` hyperparameters (reference job_runner.py:649-681
is the loop being modelled).

Usage: python tools/bench_train_step.py [--model dc3d|att] [--pallas-conv 0|1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dram_tpu.models import DC3D, DC3DATGeneric
from dram_tpu.losses import IntRegRefineLoss
from dram_tpu.utils import enable_compilation_cache

enable_compilation_cache()

REF = dict(n_layers=3,
           in_ch_list=(1, 64, 128, 256, 768, 384, 192),
           base_ch_list=(32, 64, 128, 256, 256, 128, 64),
           end_ch_list=(64, 128, 256, 512, 256, 128, 64),
           padding_list=((1, 1),) * 7,
           checkpoint_layers=(0, 0, 0, 0, 0, 0, 0),  # shipped config: remat off
           kernel_sizes=[(3, 3)] * 7,
           stacking=3, dropout=0.0)

ATT = dict(at_layers=(-1, 0, 1), at_spatial_size=(64, 64, 64),
           at_f_dim=8, at_g_dim=8,
           at_merge_type="scaled_dot_product_relu", at_g_iter=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dc3d", choices=["dc3d", "att"])
    ap.add_argument("--pallas-conv", type=int, default=0)
    ap.add_argument("--fused-stack", type=int, default=0)
    ap.add_argument("--pallas-att", type=int, default=1)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--remat-all", action="store_true")
    ap.add_argument("--mask", default=None,
                    help="comma-separated checkpoint_layers override")
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of 3 steps to this dir")
    args = ap.parse_args()

    cfg = dict(REF, use_pallas_conv=bool(args.pallas_conv),
               use_fused_stack=bool(args.fused_stack))
    if args.remat_all:
        cfg["checkpoint_layers"] = (1,) * 7
    if args.mask:
        cfg["checkpoint_layers"] = tuple(
            int(v) for v in args.mask.split(","))
    if args.model == "att":
        cfg.update(ATT, use_pallas_attention=bool(args.pallas_att))
        model = DC3DATGeneric(**cfg, train=True, dtype=jnp.bfloat16)
    else:
        model = DC3D(**cfg, train=True, dtype=jnp.bfloat16)

    B = args.batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 80, 80, 80, 1)),
                         dtype=jnp.float32)
    lobes = jnp.asarray(rng.uniform(size=(B, 80, 80, 80, 1)) > 0.3,
                        dtype=jnp.float32)
    lesions = jnp.asarray(rng.uniform(size=(B, 80, 80, 80, 1)) > 0.9,
                          dtype=jnp.float32)
    ctss = jnp.asarray(rng.integers(0, 6, size=(B,)), dtype=jnp.int32)
    freq = jnp.full((6,), 1.0 / 6.0, jnp.float32)
    weights = jnp.ones((B,), jnp.float32)

    key = jax.random.PRNGKey(0)
    variables = model.init(key, images[:1], lobes[:1])
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})

    loss_func = IntRegRefineLoss(band_width=1e-2, smoothing=0.1)
    factors = [2.0, 1.0]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            carry = {"bs": batch_stats}

            def model_fn(im, lo):
                out, mut = model.apply(
                    {"params": p, "batch_stats": carry["bs"]},
                    im, lo, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                carry["bs"] = mut["batch_stats"]
                return out

            losses = loss_func(model_fn, images, lobes, lesions, ctss,
                               ctss_frequency=freq, rng=rng,
                               sample_weight=weights)
            total = sum(l * f for l, f in zip(losses, factors))
            return total, (jnp.stack(losses), carry["bs"])

        (loss, (losses, new_bs)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    t0 = time.perf_counter()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, key)
    float(loss)  # real D2H — block_until_ready can return early on the
    # tunneled backend (see .claude/skills/verify)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    if args.profile:
        with jax.profiler.trace(args.profile):
            for i in range(3):
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, jax.random.PRNGKey(i))
                jax.block_until_ready(loss)
        print(f"profile written to {args.profile}")

    # trainer-cadence timing (trainer.py train loop): the loss sync is
    # deferred one step — step k+1 is dispatched BEFORE step k's loss is
    # fetched, so the device never idles on the per-step D2H round trip
    # (through the tunnel that stall measured ~35-40 ms/step). The final
    # float() closes the dependency chain, so wall/steps is the honest
    # steady-state step time.
    times = []
    pending = None
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jax.random.PRNGKey(i))
        if pending is not None:
            float(pending)
            times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
        pending = loss
    float(pending)
    times.append(time.perf_counter() - t0)
    ms = np.median(times) * 1e3
    print(f"model={args.model} pallas_conv={args.pallas_conv} "
          f"pallas_att={args.pallas_att} batch={B}: "
          f"{ms:.1f} ms/step median ({B / ms * 1e3:.1f} chunks/s), "
          f"min {min(times)*1e3:.1f} max {max(times)*1e3:.1f} "
          f"(deferred-sync, trainer cadence)")


if __name__ == "__main__":
    main()
