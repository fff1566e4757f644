"""Shared worker for the true multi-process (jax.distributed) parity test.

`compute(mesh)` runs one deterministic train-style step — conv+BN model,
non-divisible batch padded with zero-weight rows, batch sharded over every
mesh axis via the production feed (`shard_batch_arrays`, which uses
jax.make_array_from_process_local_data under multi-process) — and returns
scalars that must be identical whether the mesh spans one process or many.

Run as a script it becomes one process of an N-process jax.distributed CPU
cluster (spawned by tests/test_multiprocess.py):

    python _mp_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys


def compute(mesh, dcn_mesh=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dram_tpu.core.mesh import (batch_spec, pad_batch, replicate,
                                    shard_batch_arrays)
    from dram_tpu.models.blocks import ConvBlock5d

    rng = np.random.default_rng(0)
    B = 6  # does not divide 8 devices -> pad-and-mask path
    x = rng.normal(size=(B, 8, 8, 8, 1)).astype(np.float32)
    t = rng.normal(size=(B, 8, 8, 8, 4)).astype(np.float32)

    model = ConvBlock5d(features=(4, 4), train=True)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))

    def run_on(m):
        params = replicate(m, v["params"])
        bs = replicate(m, v["batch_stats"])
        arrays, w = pad_batch((x, t), m.devices.size)
        xs, ts, ws = shard_batch_arrays(m, arrays + (w,))

        def loss_fn(p, b, xa, ta, wa):
            out, mut = model.apply({"params": p, "batch_stats": b}, xa,
                                   mutable=["batch_stats"])
            se = jnp.mean((out - ta) ** 2, axis=(1, 2, 3, 4))
            return jnp.sum(se * wa) / jnp.sum(wa), mut["batch_stats"]

        repl = NamedSharding(m, P())
        bsh = NamedSharding(m, batch_spec(m))
        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                       in_shardings=(repl, repl, bsh, bsh, bsh))
        (loss, new_bs), grads = step(params, bs, xs, ts, ws)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        out = {"loss": float(loss)}
        for path, leaf in flat:
            out["grad:" + jax.tree_util.keystr(path)] = \
                float(jnp.sum(jnp.abs(leaf)))
        # cross-replica BN: batch stats are reduced over the sharded batch
        for path, leaf in jax.tree_util.tree_leaves_with_path(new_bs):
            out["bn:" + jax.tree_util.keystr(path)] = float(jnp.sum(leaf))
        return out

    def run_local_rows(m):
        """Per-process loading parity: each process constructs ONLY its
        own rows of the padded global batch (core/mesh.py
        local_batch_rows) — loss/grads/BN must equal the global-feed
        path bit-for-bit."""
        from dram_tpu.core.mesh import local_batch_rows

        params = replicate(m, v["params"])
        bs = replicate(m, v["batch_stats"])
        (lo, hi), padded = local_batch_rows(m, B)
        idx = np.arange(lo, hi) % B  # wrap-pad, like pad_batch
        w = np.zeros(hi - lo, np.float32)
        w[np.arange(lo, hi) < B] = 1.0
        xs, ts, ws = shard_batch_arrays(
            m, (x[idx], t[idx], w), local_rows=((lo, hi), padded))

        def loss_fn(p, b, xa, ta, wa):
            out, mut = model.apply({"params": p, "batch_stats": b}, xa,
                                   mutable=["batch_stats"])
            se = jnp.mean((out - ta) ** 2, axis=(1, 2, 3, 4))
            return jnp.sum(se * wa) / jnp.sum(wa), mut["batch_stats"]

        repl = NamedSharding(m, P())
        bsh = NamedSharding(m, batch_spec(m))
        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                       in_shardings=(repl, repl, bsh, bsh, bsh))
        (loss, new_bs), grads = step(params, bs, xs, ts, ws)
        out = {"loss": float(loss)}
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            out["grad:" + jax.tree_util.keystr(path)] = \
                float(jnp.sum(jnp.abs(leaf)))
        for path, leaf in jax.tree_util.tree_leaves_with_path(new_bs):
            out["bn:" + jax.tree_util.keystr(path)] = float(jnp.sum(leaf))
        return out

    res = {"data_mesh": run_on(mesh),
           "local_rows": run_local_rows(mesh)}
    if dcn_mesh is not None:
        res["dcn_mesh"] = run_on(dcn_mesh)
    return res


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, \
        f"global devices {len(jax.devices())}"

    from dram_tpu.core.mesh import best_mesh

    mesh = best_mesh()
    dcn = best_mesh(dcn_axis="dcn")  # process-grouped (dcn, ici) mesh
    res = compute(mesh, dcn)
    if pid == 0:
        with open(out_path, "w") as fp:
            json.dump(res, fp)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
