"""Mesh-layer tests on the fake 8-device CPU mesh: halo exchange, sharded
stencil application, and data-parallel train-step parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dram_tpu.core.mesh import (best_mesh, halo_exchange, pad_batch,
                                replicate, shard_batch_arrays,
                                sharded_stencil_apply)


needs_devices = pytest.mark.skipif(jax.device_count() < 8,
                                   reason="needs 8 fake devices")


@needs_devices
class TestHaloExchange:
    def test_halo_matches_zero_padded_slices(self):
        mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
        x = jnp.arange(16.0).reshape(16, 1)

        def local(block):
            return halo_exchange(block, "space", 1, 0)

        f = shard_map(local, mesh=mesh, in_specs=(P("space", None),),
                      out_specs=P("space", None))
        out = np.asarray(f(x))  # each 4-row shard becomes 6 rows
        assert out.shape == (24, 1)
        # shard 1 (rows 6..12): left halo = 3 (last row of shard 0)
        np.testing.assert_allclose(out[6, 0], 3.0)
        np.testing.assert_allclose(out[11, 0], 8.0)  # right halo = row 8
        # boundary shards get zeros
        np.testing.assert_allclose(out[0, 0], 0.0)
        np.testing.assert_allclose(out[-1, 0], 0.0)

    def test_sharded_mean_filter_exact(self, rng):
        mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
        vol = jnp.asarray(rng.normal(size=(32, 8, 8)).astype(np.float32))

        def mean3(x):  # zero-padded 3-tap mean along axis 0
            xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
            return (xp[:-2] + xp[1:-1] + xp[2:]) / 3.0

        def fn(block):  # receptive field radius 1, shape-preserving
            return (jnp.concatenate([block[:1] * 0, block[:-1]]) +
                    block +
                    jnp.concatenate([block[1:], block[-1:] * 0])) / 3.0

        got = np.asarray(sharded_stencil_apply(fn, vol, mesh, halo=1, axis=0))
        want = np.asarray(mean3(vol))
        np.testing.assert_allclose(got, want, atol=1e-6)


@needs_devices
class TestDataParallelStep:
    def test_sharded_loss_and_grads_match_single_device(self, rng):
        """The DP-sharded train step must be numerically equivalent to the
        single-device step: XLA's inserted collectives implement exactly
        the global batch reductions."""
        from dram_tpu.models import DC3D
        from dram_tpu.losses import IntRegRefineLoss

        cfg = dict(n_layers=1, in_ch_list=(1, 4, 12), base_ch_list=(2, 4, 4),
                   end_ch_list=(4, 8, 4), padding_list=((1, 1),) * 3,
                   checkpoint_layers=(0, 0, 0), kernel_sizes=[(3, 3)] * 3,
                   stacking=1, norm_method="ln")
        model = DC3D(**cfg)
        B = 8
        x = rng.normal(size=(B, 8, 8, 8, 1)).astype(np.float32)
        lobes = (rng.random((B, 8, 8, 8, 1)) > 0.3).astype(np.float32)
        cands = ((rng.random((B, 8, 8, 8, 1)) > 0.7) * lobes).astype(np.float32)
        ctss = rng.integers(0, 6, B).astype(np.int32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
        loss_obj = IntRegRefineLoss()

        def loss_fn(params, images, lo, le, ct):
            def model_fn(im, l):
                return model.apply({"params": params}, im, l)
            reg, seg = loss_obj(model_fn, images, lo, le, ct)
            return 2.0 * reg + seg

        grad_fn = jax.value_and_grad(loss_fn)

        l1, g1 = jax.jit(grad_fn)(v["params"], jnp.asarray(x),
                                  jnp.asarray(lobes), jnp.asarray(cands),
                                  jnp.asarray(ctss))

        mesh = best_mesh()
        assert mesh is not None and mesh.devices.size == 8
        from jax.sharding import NamedSharding
        batch_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        jitted = jax.jit(grad_fn, in_shardings=(repl, batch_sh, batch_sh,
                                                batch_sh, batch_sh))
        params_r = replicate(mesh, v["params"])
        arrs = shard_batch_arrays(mesh, (x, lobes, cands, ctss))
        l8, g8 = jitted(params_r, *arrs)

        np.testing.assert_allclose(float(l1), float(l8), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_best_mesh_uses_all_devices(self):
        m = best_mesh()
        assert m is not None and m.devices.size == jax.device_count()

    def test_pad_batch(self):
        a = np.arange(10)
        b = np.arange(20.0).reshape(10, 2)
        (pa, pb), w = pad_batch((a, b), 8)
        assert pa.shape[0] == 16 and pb.shape == (16, 2)
        assert w.sum() == 10 and (w[:10] == 1).all() and (w[10:] == 0).all()
        np.testing.assert_array_equal(pa[10:], a[:6])  # wrap-around rows
        (qa,), w1 = pad_batch((a,), 5)  # already divisible: no-op
        assert qa.shape[0] == 10 and (w1 == 1).all()

    def test_padded_batch_grads_match_unpadded(self, rng):
        """Batch 10 on an 8-device mesh: padded to 16 with zero-weight rows,
        the loss and grads equal the unpadded single-device run exactly —
        the trainer's DP_BATCH_MODE='pad' contract (TRAIN_BATCH_SIZE stays
        the reference global batch, no chip idles, no semantic drift)."""
        from dram_tpu.models import DC3D
        from dram_tpu.losses import IntRegRefineLoss

        cfg = dict(n_layers=1, in_ch_list=(1, 4, 12), base_ch_list=(2, 4, 4),
                   end_ch_list=(4, 8, 4), padding_list=((1, 1),) * 3,
                   checkpoint_layers=(0, 0, 0), kernel_sizes=[(3, 3)] * 3,
                   stacking=1, norm_method="ln")
        model = DC3D(**cfg)
        B = 10
        x = rng.normal(size=(B, 8, 8, 8, 1)).astype(np.float32)
        lobes = (rng.random((B, 8, 8, 8, 1)) > 0.3).astype(np.float32)
        cands = ((rng.random((B, 8, 8, 8, 1)) > 0.7) * lobes).astype(np.float32)
        ctss = rng.integers(0, 6, B).astype(np.int32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
        loss_obj = IntRegRefineLoss()

        def loss_fn(params, images, lo, le, ct, w):
            def model_fn(im, l):
                return model.apply({"params": params}, im, l)
            reg, seg = loss_obj(model_fn, images, lo, le, ct,
                                sample_weight=w)
            return 2.0 * reg + seg

        grad_fn = jax.value_and_grad(loss_fn)
        ones = jnp.ones(B, jnp.float32)
        l1, g1 = jax.jit(grad_fn)(v["params"], jnp.asarray(x),
                                  jnp.asarray(lobes), jnp.asarray(cands),
                                  jnp.asarray(ctss), ones)

        mesh = best_mesh()
        (px, pl, pc, pt), w = pad_batch((x, lobes, cands, ctss), 8)
        assert px.shape[0] == 16
        from jax.sharding import NamedSharding
        batch_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        jitted = jax.jit(grad_fn, in_shardings=(repl,) + (batch_sh,) * 5)
        params_r = replicate(mesh, v["params"])
        arrs = shard_batch_arrays(mesh, (px, pl, pc, pt, w))
        l8, g8 = jitted(params_r, *arrs)

        np.testing.assert_allclose(float(l1), float(l8), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


@needs_devices
class TestShardedPCM:
    @pytest.mark.parametrize("iters,residual", [(1, False), (2, True)])
    def test_matches_single_device(self, iters, residual, rng):
        """Context-parallel PCM over an 8-way spatial mesh is numerically
        identical to the single-device forward, including true volume
        boundaries (not shard seams)."""
        import jax.numpy as jnp
        from dram_tpu.models.pcm import PCM, pcm_sharded

        spatial = (16, 6, 6)  # D=16 over 8 shards -> 2-deep blocks
        cam = rng.normal(size=(1, *spatial, 1)).astype(np.float32)
        f = rng.normal(size=(1, *spatial, 5)).astype(np.float32)
        m = PCM(pool_size=spatial, g_ch=1, f_dim=3, g_dim=4,
                non_local_iter=iters, k_size=3,
                merge_type="scaled_dot_product_relu", self_loop=False,
                connectivity=2, residual=residual, p_enc_dim=0)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(cam), jnp.asarray(f))
        want = np.asarray(m.apply(v, jnp.asarray(cam), jnp.asarray(f)))

        mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
        got = np.asarray(pcm_sharded(m, v, jnp.asarray(cam), jnp.asarray(f),
                                     mesh))
        np.testing.assert_allclose(got, want, atol=3e-5)

    @pytest.mark.parametrize("geo_f_dim", [0, 4])
    def test_geo_and_nondivisible_d(self, geo_f_dim, rng):
        """(VERDICT r2 item 10) pcm_sharded completeness: positional
        encodings (p_enc_dim=32, global-coordinate geo features) and a D
        axis that does NOT divide the mesh (pad-and-mask, 2 iterations so
        pad-row sanitization is exercised) — still exact vs single
        device."""
        import jax.numpy as jnp
        from dram_tpu.models.pcm import PCM, pcm_sharded

        spatial = (13, 6, 6)  # 13 % 8 != 0 -> 3 pad rows, some all-invalid
        cam = rng.normal(size=(1, *spatial, 1)).astype(np.float32)
        f = rng.normal(size=(1, *spatial, 5)).astype(np.float32)
        m = PCM(pool_size=spatial, g_ch=1, f_dim=3, g_dim=4,
                non_local_iter=2, k_size=3,
                merge_type="scaled_dot_product_geo_relu",
                self_loop=False, connectivity=2, residual=True,
                p_enc_dim=30, geo_f_dim=geo_f_dim)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(cam), jnp.asarray(f))
        want = np.asarray(m.apply(v, jnp.asarray(cam), jnp.asarray(f)))
        assert np.isfinite(want).all()

        mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
        got = np.asarray(pcm_sharded(m, v, jnp.asarray(cam), jnp.asarray(f),
                                     mesh))
        np.testing.assert_allclose(got, want, atol=3e-5)


@needs_devices
class TestShardedUNetInference:
    def test_overlap_tile_matches_single_device(self, rng):
        """Context-parallel DC3D inference (clamped-window overlap tiles,
        sharded over the mesh) == single-device forward when the halo
        covers the network's receptive field."""
        import jax.numpy as jnp
        from dram_tpu.core.mesh import overlap_tile_infer
        from dram_tpu.models import DC3D

        cfg = dict(n_layers=2, in_ch_list=(1, 8, 16, 48, 24),
                   base_ch_list=(4, 8, 16, 16, 8),
                   end_ch_list=(8, 16, 32, 16, 8),
                   padding_list=((1, 1),) * 5,
                   checkpoint_layers=(0,) * 5, kernel_sizes=[(3, 3)] * 5,
                   stacking=2, norm_method="bn", train=False,
                   local_upsample=True)
        # eval-mode BatchNorm normalises with running stats (pointwise) and
        # local_upsample swaps align-corners (whose source mapping depends on
        # the axis length, i.e. is global) for a shift-invariant half-pixel
        # 2x kernel — together the network is stencil-local
        model = DC3D(**cfg)
        x = jnp.asarray(rng.normal(size=(1, 64, 16, 16, 1)).astype(np.float32))
        lobe = jnp.asarray((rng.random((1, 64, 16, 16, 1)) > 0.3)
                           .astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x[:, :16])

        def apply_fn(xb, lb):
            return model.apply({"params": v["params"],
                                "batch_stats": v["batch_stats"]}, xb, lb)

        want_d, want_r = apply_fn(x, lobe)

        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        got_d, got_r = overlap_tile_infer(apply_fn, x, lobe, n_tiles=2,
                                          halo=24, mesh=mesh)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                                   atol=1e-3)
        # and without a mesh (single-chip memory-saving mode)
        got1_d, _ = overlap_tile_infer(apply_fn, x, lobe, n_tiles=4, halo=24)
        np.testing.assert_allclose(np.asarray(got1_d), np.asarray(want_d),
                                   atol=1e-3)


@needs_devices
class TestDcnIciMesh:
    def test_2d_mesh_grads_match_single_device(self, rng):
        """(dcn, ici) 2x4 mesh: batch sharded over hosts-then-chips gives
        the same loss/grads as the single-device run (multi-host readiness
        on a fake single-process mesh; SURVEY §2.7 mesh row)."""
        from dram_tpu.core.mesh import batch_spec, best_mesh
        from dram_tpu.models import DC3D
        from dram_tpu.losses import IntRegRefineLoss
        from jax.sharding import NamedSharding

        mesh = best_mesh(dcn_axis="dcn", dcn_size=2)
        assert mesh is not None and mesh.devices.shape == (2, 4)
        assert mesh.axis_names == ("dcn", "data")

        cfg = dict(n_layers=1, in_ch_list=(1, 4, 12), base_ch_list=(2, 4, 4),
                   end_ch_list=(4, 8, 4), padding_list=((1, 1),) * 3,
                   checkpoint_layers=(0, 0, 0), kernel_sizes=[(3, 3)] * 3,
                   stacking=1, norm_method="ln")
        model = DC3D(**cfg)
        B = 8
        x = rng.normal(size=(B, 8, 8, 8, 1)).astype(np.float32)
        lobes = (rng.random((B, 8, 8, 8, 1)) > 0.3).astype(np.float32)
        cands = ((rng.random((B, 8, 8, 8, 1)) > 0.7) * lobes).astype(np.float32)
        ctss = rng.integers(0, 6, B).astype(np.int32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
        loss_obj = IntRegRefineLoss()

        def loss_fn(params, images, lo, le, ct):
            def model_fn(im, l):
                return model.apply({"params": params}, im, l)
            reg, seg = loss_obj(model_fn, images, lo, le, ct)
            return 2.0 * reg + seg

        grad_fn = jax.value_and_grad(loss_fn)
        l1, g1 = jax.jit(grad_fn)(v["params"], jnp.asarray(x),
                                  jnp.asarray(lobes), jnp.asarray(cands),
                                  jnp.asarray(ctss))

        bsh = NamedSharding(mesh, batch_spec(mesh))
        repl = NamedSharding(mesh, P())
        jitted = jax.jit(grad_fn, in_shardings=(repl,) + (bsh,) * 4)
        params_r = replicate(mesh, v["params"])
        arrs = shard_batch_arrays(mesh, (x, lobes, cands, ctss))
        l8, g8 = jitted(params_r, *arrs)

        np.testing.assert_allclose(float(l1), float(l8), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


@needs_devices
class TestSbnShardMap:
    def test_sbn_batch_stats_are_cross_replica_under_shard_map(self, rng):
        """'sbn' BatchNorm with an axis_name inside shard_map computes
        GLOBAL batch statistics: per-shard outputs equal the unsharded
        BatchNorm over the full batch (the reference's SyncBatchNorm
        contract, parts.py:32-33)."""
        import flax.linen as nn
        from dram_tpu.models.blocks import make_norm

        class SBN(nn.Module):
            axis_name: str | None = None

            @nn.compact
            def __call__(self, x):
                return make_norm("sbn", jnp.float32, self.axis_name)(
                    use_running_average=False)(x)

        B = 8
        x = rng.normal(size=(B, 4, 4, 4, 3)).astype(np.float32) * 2 + 1
        ref_mod = SBN(axis_name=None)
        v = ref_mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        want, want_stats = ref_mod.apply(
            v, jnp.asarray(x), mutable=["batch_stats"])

        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        sbn_mod = SBN(axis_name="data")

        def local(xb):
            out, stats = sbn_mod.apply(v, xb, mutable=["batch_stats"])
            return out, stats["batch_stats"]["BatchNorm_0"]["mean"]

        f = shard_map(local, mesh=mesh,
                      in_specs=(P("data", None, None, None, None),),
                      out_specs=(P("data", None, None, None, None), P()))
        got, got_mean = f(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_mean),
            np.asarray(want_stats["batch_stats"]["BatchNorm_0"]["mean"]),
            atol=1e-6)
