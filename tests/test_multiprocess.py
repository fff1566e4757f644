"""True 2-process jax.distributed parity: the production batch feed
(`shard_batch_arrays` -> make_array_from_process_local_data) over a mesh
whose devices span two OS processes must reproduce the single-process
loss, gradients, and cross-replica BN stats exactly.

The fake-mesh tests (tests/test_mesh.py) reshape one process's devices;
this is the only test where non-addressable devices actually exist.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_matches_single_process(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_mp_worker.py")
    port = _free_port()
    out_json = str(tmp_path / "mp.json")

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), out_json],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o}"
    with open(out_json) as fp:
        multi = json.load(fp)

    # single-process oracle on this process's 8 fake devices
    import importlib.util
    from dram_tpu.core.mesh import best_mesh

    spec = importlib.util.spec_from_file_location("_mp_worker", worker)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    compute = mod.compute

    single = compute(best_mesh(), best_mesh(dcn_axis="dcn", dcn_size=2))

    # local_rows: per-process loading (each process constructs only its
    # own batch rows) must match the global-feed path and the oracle
    for mesh_key in ("data_mesh", "dcn_mesh", "local_rows"):
        assert mesh_key in multi
        for k, v in single[mesh_key].items():
            assert multi[mesh_key][k] == pytest.approx(v, rel=1e-5,
                                                       abs=1e-6), \
                f"{mesh_key}/{k}: multi {multi[mesh_key][k]} vs single {v}"
