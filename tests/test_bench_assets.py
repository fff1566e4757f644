"""The tracked bench-weights asset must stay loadable and structurally
aligned with the flagship model.

bench.py skips model.init when assets/bench_weights.ckpt.xz is present,
so a model-code edit that changes the parameter tree would otherwise
surface only as a mid-bench apply failure on the driver — after which
the round artifact has no headline. eval_shape keeps this check cheap
(no compute, no compile)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET = os.path.join(REPO, "assets", "bench_weights.ckpt.xz")

needs_asset = pytest.mark.skipif(not os.path.exists(ASSET),
                                 reason="bench weights asset not present")


@needs_asset
class TestBenchWeightsAsset:
    def test_tree_matches_flagship_model(self):
        import jax
        import jax.numpy as jnp

        sys.path.insert(0, REPO)
        import bench
        from dram_tpu.models import DC3DATGeneric

        tree = bench.load_bench_weights()
        assert tree is not None and "params" in tree \
            and "batch_stats" in tree

        model = DC3DATGeneric(train=False, at_spatial_size=(64, 64, 64),
                              dtype=jnp.bfloat16)
        want = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 80, 80, 80, 1), jnp.float32))

        got_p = jax.tree_util.tree_leaves_with_path(tree["params"])
        want_p = dict(jax.tree_util.tree_leaves_with_path(want["params"]))
        assert len(got_p) == len(want_p)
        for path, leaf in got_p:
            assert path in want_p, f"asset has extra param {path}"
            assert tuple(np.asarray(leaf).shape) == \
                tuple(want_p[path].shape), \
                f"shape drift at {path}: asset " \
                f"{np.asarray(leaf).shape} vs model {want_p[path].shape}"
            assert np.asarray(leaf).dtype == np.float32  # restored f32
        got_bs = dict(jax.tree_util.tree_leaves_with_path(
            tree["batch_stats"]))
        want_bs = dict(jax.tree_util.tree_leaves_with_path(
            want["batch_stats"]))
        assert set(got_bs) == set(want_bs)

    def test_weights_are_trained_not_init(self):
        """Guard against accidentally shipping random-init weights: the
        trained top-layer bias is far from HeNorm's constant 0.01."""
        sys.path.insert(0, REPO)
        import bench

        tree = bench.load_bench_weights()
        flat = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
                for path, leaf in
                __import__("jax").tree_util.tree_leaves_with_path(
                    tree["params"])}
        bias = [v for k, v in flat.items()
                if "top_layer" in k and "bias" in k]
        assert bias and float(np.abs(np.asarray(bias[0])).max()) > 0.05
