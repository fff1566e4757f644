"""End-to-end trainer tests on a synthetic dataset (CPU, tiny model)."""

import os
import textwrap

import numpy as np
import pytest

from dram_tpu.data.prepare_data import make_synthetic_dataset
from dram_tpu.train.checkpoint import (load_checkpoint, save_checkpoint,
                                       tolerant_merge)
from dram_tpu.utils import Settings, get_callable_by_name


TINY_SETTINGS = textwrap.dedent("""
    DB_PATH = {db!r}
    VALID_CSV = {db!r} + "/val.csv"
    TEST_CSV = {db!r} + "/test.csv"
    DEBUG_PATH = {out!r} + "/debug/"
    MODEL_ROOT_PATH = {out!r} + "/models/"
    JOB_RUNNER_CLS = "job_runner.LesionSegChunkTrain"
    EXP_NAME = "tiny"
    MODEL_NAME = "DC3D"
    RESAMPLE_MODE = "fixed_size"
    NUM_EPOCHS = 2
    VAL_EPOCHS = 1
    STATE_EPOCHS = 1
    NUM_WORKERS = 0
    LOG_STEPS = 100
    AUG_RATIO = 0.0
    BALANCED_LABEL_COUNT = 2
    TRAIN_BATCH_SIZE = 2
    RESAMPLE_SPACING = 1.0
    TEST_RESAMPLE_SPACING = 2.0
    RESAMPLE_SIZE = (16, 16, 16)
    LOSS_FACTORS = [2.0, 1.0]
    PAD_VALUE = -2048
    WINDOWING_MAX = -300
    WINDOWING_MIN = -1000
    NR_CLASS = 1
    COMPUTE_DTYPE = "float32"
    RELOAD_CHECKPOINT = {reload}
    RELOAD_CHECKPOINT_PATH = None
    RELOAD_DICT_LIST = ["model", "optimizer"]
    MODEL = {{
        "method": "models.DC3D",
        "n_layers": 2,
        "in_ch_list": [1, 8, 16, 48, 24],
        "base_ch_list": [4, 8, 16, 16, 8],
        "end_ch_list": [8, 16, 32, 16, 8],
        "kernel_sizes": [(3, 3)] * 5,
        "stacking": 2,
        "padding_list": [(1, 1)] * 5,
        "checkpoint_layers": [0, 1, 1, 0, 0],
        "dropout": 0.0,
        "out_ch": 1,
    }}
    INITIALIZER = {{"method": "models.HeNorm", "mode": "fan_in"}}
    OPTIMIZER = {{"method": "torch.optim.Adam", "lr": 0.001}}
    SCHEDULER = {{"method": "torch.optim.lr_scheduler.ExponentialLR",
                  "gamma": 0.9}}
    LOSS_FUNC = {{"method": "metrics.IntRegRefineLoss",
                  "band_width": 1e-2, "smoothing": 0.1}}
""")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("db"))
    out = str(tmp_path_factory.mktemp("out"))
    make_synthetic_dataset(db, n_scans=3, size=(24, 32, 32), seed=0)
    return db, out


def _settings(tmp_path, db, out, reload=False):
    p = tmp_path / "settings_tiny.py"
    p.write_text(TINY_SETTINGS.format(db=db, out=out, reload=reload))
    return Settings(str(p))


class TestTrainerEndToEnd:
    def test_two_epochs(self, env, tmp_path):
        db, out = env
        settings = _settings(tmp_path, db, out)
        runner_cls = get_callable_by_name(settings.JOB_RUNNER_CLS)
        runner = runner_cls(settings_module=settings)
        runner.run()

        exp = os.path.join(out, "models", "tiny")
        assert os.path.exists(os.path.join(exp, "records.csv"))
        assert os.path.exists(os.path.join(exp, "settings.txt"))
        assert os.path.exists(os.path.join(exp, "1.ckpt"))
        import pandas as pd
        rec = pd.read_csv(os.path.join(exp, "records.csv"))
        assert "val_acc_reg_cls" in rec.columns
        assert np.isfinite(rec["tr_loss"]).all()
        # scheduler stepped once per validated epoch
        assert runner.scheduler.steps == 2
        # the decayed lr actually reached the optimizer's injected
        # hyperparams (the last train step ran at gamma^1)
        lr_states = runner._lr_states()
        injected = float(lr_states["__default__"].hyperparams["learning_rate"])
        base, gamma = runner.scheduler.base_lr, runner.scheduler.gamma
        assert injected == pytest.approx(base * gamma, rel=1e-6)
        # and with 8 fake devices, the full mesh is used (no silent shrink
        # for the non-dividing batch; rows are padded + zero-weighted)
        import jax
        if jax.device_count() >= 8:
            assert runner.mesh is not None
            assert runner.mesh.devices.size == jax.device_count()

    def test_device_batch_local_rows_matches_global(self, env, tmp_path):
        """Per-process sampler sharding glue (VERDICT r2 item 9): with
        _local_rows set (as the trainer does under jax.distributed), the
        wrap-padded local feed must assemble byte-identical device arrays
        to the default global-batch path. Single process owns every row,
        so the two paths are directly comparable."""
        import jax
        if jax.device_count() < 8:
            pytest.skip("needs 8 fake devices")
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_localrows"
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        batch = next(iter(runner.tr_loader))

        g = runner._device_batch(dict(batch))

        from dram_tpu.core.mesh import local_batch_rows
        (lo, hi), padded = local_batch_rows(runner.mesh,
                                            runner.loader_batch_size)
        assert (lo, hi) == (0, padded)  # single process owns all rows
        runner._local_rows = ((lo, hi), padded, runner.loader_batch_size)
        loc = runner._device_batch(dict(batch))
        for a, b, nm in zip(g, loc, ("images", "lobes", "lesions", "ctss",
                                     "weights", "span")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=nm)

    def test_resume_from_checkpoint(self, env, tmp_path):
        db, out = env
        settings = _settings(tmp_path, db, out, reload=True)
        settings.NUM_EPOCHS = 3  # continue one more epoch
        runner_cls = get_callable_by_name(settings.JOB_RUNNER_CLS)
        runner = runner_cls(settings_module=settings)
        assert runner.epoch_n == 1  # restored from newest ckpt
        assert runner.current_iteration > 0
        runner.run()
        exp = os.path.join(out, "models", "tiny")
        assert os.path.exists(os.path.join(exp, "2.ckpt"))


class TestFastValidation:
    """Training validation rides the inference chunk pipeline (VERDICT r3
    item 4): same per-scan ordinal predictions as the reference-shaped
    host-stitch loop, and no separate B=1 eval program is compiled."""

    def test_fast_val_matches_hoststitch(self, env, tmp_path):
        db, out = env
        settings = _settings(tmp_path, db, out)  # fresh init params
        runner_cls = get_callable_by_name(settings.JOB_RUNNER_CLS)
        runner = runner_cls(settings_module=settings)
        runner.reset_data()
        fast = [runner.evaluate_scan(runner.val_dataset[i])
                for i in range(len(runner.val_dataset))]
        # the fast path never built the legacy B=1 eval forward...
        assert not hasattr(runner, "_eval_fwd")
        # ...and shares the heavy model program with inference
        assert ("wcm",) in runner._val_pipe._stage2
        for i, (p_fast, t_fast, _) in enumerate(fast):
            scan_data = runner.val_dataset[i]
            p_slow, t_slow, _ = runner._evaluate_scan_hoststitch(scan_data)
            assert t_fast == t_slow
            assert p_fast == p_slow, (
                f"scan {scan_data['meta']['uid']}: fast {p_fast} "
                f"vs host-stitch {p_slow}")

    def test_val_metrics_identical_across_paths(self, env, tmp_path):
        db, out = env
        settings = _settings(tmp_path, db, out)
        runner_cls = get_callable_by_name(settings.JOB_RUNNER_CLS)
        runner = runner_cls(settings_module=settings)
        runner.reset_data()
        fast = runner.validate()
        runner.settings.VAL_USE_FAST_PIPELINE = False
        slow = runner.validate()
        assert fast["val_acc_reg_cls"] == slow["val_acc_reg_cls"]


class TestOptimizerGroups:
    def test_groups_build_and_step(self, env, tmp_path):
        """OPTIMIZER 'groups' (reference job_runner.py:385-393: params whose
        name matches a group key get that group's overrides) builds an
        optax.multi_transform whose per-group lrs follow the scheduler."""
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_groups"
        settings.NUM_EPOCHS = 1
        settings.OPTIMIZER = {"method": "torch.optim.Adam", "lr": 0.001,
                              "groups": {"top_layer": {"lr": 0.01}}}
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        states = runner._lr_states()
        assert set(states) == {"top_layer", "__default__"}
        assert float(states["top_layer"].hyperparams["learning_rate"]) == \
            pytest.approx(0.01)
        assert float(states["__default__"].hyperparams["learning_rate"]) == \
            pytest.approx(0.001)
        runner.run()
        # the scheduler stepped once; the next train step would run both
        # groups at their base lr scaled by gamma
        runner._set_lr(runner.scheduler.lr)
        states = runner._lr_states()
        g = runner.scheduler.gamma
        assert runner.scheduler.steps == 1
        assert float(states["top_layer"].hyperparams["learning_rate"]) == \
            pytest.approx(0.01 * g, rel=1e-6)
        assert float(states["__default__"].hyperparams["learning_rate"]) == \
            pytest.approx(0.001 * g, rel=1e-6)


class TestTolerantMerge:
    def test_shape_mismatch_dropped(self):
        cur = {"a": np.zeros((2, 2)), "b": {"c": np.ones(3), "d": np.ones(1)}}
        saved = {"a": np.ones((2, 2)), "b": {"c": np.zeros(4)}, "extra": 1}
        logs = []
        out = tolerant_merge(cur, saved, log=logs.append)
        np.testing.assert_array_equal(out["a"], np.ones((2, 2)))
        np.testing.assert_array_equal(out["b"]["c"], np.ones(3))  # kept
        np.testing.assert_array_equal(out["b"]["d"], np.ones(1))
        assert "extra" not in out
        assert any("does not match" in l for l in logs)

    def test_ignored_keys(self):
        cur = {"a": np.zeros(2)}
        saved = {"a": np.ones(2)}
        out = tolerant_merge(cur, saved, ignored_keys=("a",))
        np.testing.assert_array_equal(out["a"], np.zeros(2))

    def test_roundtrip_file(self, tmp_path):
        tree = {"epoch": 3, "model": {"w": np.arange(6).reshape(2, 3)}}
        p = str(tmp_path / "x.ckpt")
        save_checkpoint(p, tree)
        got = load_checkpoint(p)
        assert got["epoch"] == 3
        np.testing.assert_array_equal(got["model"]["w"], tree["model"]["w"])


class TestNewestCheckpoint:
    def test_epoch_number_beats_ctime(self, tmp_path):
        """Resume picks the highest epoch number even if an older-epoch
        file was written (copied/restored) more recently."""
        from dram_tpu.train.checkpoint import newest_checkpoint
        (tmp_path / "10.ckpt").write_bytes(b"x")
        (tmp_path / "2.ckpt").write_bytes(b"x")  # most recent ctime
        assert os.path.basename(
            newest_checkpoint(str(tmp_path))) == "10.ckpt"

    def test_non_numeric_falls_back_to_ctime(self, tmp_path):
        from dram_tpu.train.checkpoint import newest_checkpoint
        import time
        (tmp_path / "best.ckpt").write_bytes(b"x")
        time.sleep(0.01)
        (tmp_path / "latest.ckpt").write_bytes(b"x")
        assert os.path.basename(
            newest_checkpoint(str(tmp_path))) == "latest.ckpt"
        # any epoch-named checkpoint outranks non-numeric names
        (tmp_path / "1.ckpt").write_bytes(b"x")
        assert os.path.basename(
            newest_checkpoint(str(tmp_path))) == "1.ckpt"

    def test_empty_dir(self, tmp_path):
        from dram_tpu.train.checkpoint import newest_checkpoint
        assert newest_checkpoint(str(tmp_path)) is None


class TestLossFactorArity:
    def test_fewer_factors_than_losses_raises(self, env, tmp_path):
        """LOSS_FACTORS shorter than the loss tuple would silently drop a
        loss term via zip — the trainer must refuse loudly."""
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_arity"
        settings.NUM_EPOCHS = 1
        settings.LOSS_FACTORS = [2.0]  # IntRegRefineLoss returns 2 terms
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        with pytest.raises(ValueError, match="LOSS_FACTORS"):
            runner.run()

    def test_extra_factors_allowed(self, env, tmp_path):
        """The reference ships 4 factors for the 2-term IntRegRefineLoss;
        extra factors stay legal (unused)."""
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_extra_factors"
        settings.NUM_EPOCHS = 1
        settings.LOSS_FACTORS = [2.0, 1.0, 0.5, 0.5]
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        runner.run()
        import pandas as pd
        rec = pd.read_csv(os.path.join(out, "models", "tiny_extra_factors",
                                       "records.csv"))
        assert np.isfinite(rec["tr_loss"]).all()


class TestEquivarianceTraining:
    def test_aff_refine_loss_in_trainer(self, env, tmp_path):
        """The 3-term equivariance+refinement objective trains through the
        jitted step (traced one-shot transforms, two model passes)."""
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_aff"
        settings.NUM_EPOCHS = 1
        settings.LOSS_FACTORS = [2.0, 1.0, 0.5]
        settings.LOSS_FUNC = {"method": "metrics.IntRegAffRefineLoss",
                              "band_width": 1e-2, "smoothing": 0.1,
                              "rescale_jitter": None}
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        runner.run()
        import pandas as pd
        rec = pd.read_csv(os.path.join(out, "models", "tiny_aff",
                                       "records.csv"))
        assert np.isfinite(rec["tr_loss"]).all()


class TestPerStepRescaleRedraw:
    def test_rescale_drawn_per_step(self, env, tmp_path):
        """The equivariance rescale is re-drawn every STEP (reference
        metrics.py:224-231 per-call cadence); the trainer compiles one
        jitted step per distinct drawn size and swaps between them."""
        from dram_tpu.losses.equivariance import draw_rescale_static
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_rescale_step"
        settings.NUM_EPOCHS = 1
        settings.BALANCED_LABEL_COUNT = 1  # 6 chunks -> 3 steps at bs 2
        settings.LOSS_FACTORS = [2.0, 1.0, 0.5]
        settings.LOSS_FUNC = {"method": "metrics.IntRegAffRefineLoss",
                              "band_width": 1e-2, "smoothing": 0.1,
                              "rescale_jitter": [12, 16]}
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        runner.run()
        # every step's expected draw is present in the jit cache
        expected = {("rescale", draw_rescale_static(
            33 + 104729 * k, [12, 16])) for k in range(runner.num_steps)}
        assert expected <= set(runner._step_cache.keys())
        # the drawn sizes genuinely vary across these step seeds
        assert len(expected) >= 2


class TestTrainTrace:
    def test_trace_dumps_heatmaps_during_training(self, env, tmp_path):
        """TRACE=True dumps attention heatmap tiles on the first step of
        each epoch (reference models.py:520-546 train-time trace hook)."""
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_trace"
        settings.NUM_EPOCHS = 1
        settings.VAL_EPOCHS = 5
        settings.TRACE = True
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        runner.run()
        trace_root = os.path.join(out, "debug", "tiny_trace", "train_trace")
        assert os.path.isdir(trace_root)
        dumps = []
        for root, _, files in os.walk(trace_root):
            dumps.extend(os.path.join(root, f) for f in files)
        assert any(f.endswith(".jpg") for f in dumps), dumps

    def test_param_log_epochs_writes_histograms(self, env, tmp_path):
        """PARAM_LOG_EPOCHS=1 routes print_model_parameters through the
        run loop every epoch (the reference's job_runner.py:347-354 is
        dead code — this knob, default off, is the strictly-better
        wiring). Asserts per-parameter histogram artifacts land in the
        summary dir (TB event files or the JSONL fallback)."""
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_paramlog"
        settings.NUM_EPOCHS = 1
        settings.VAL_EPOCHS = 5
        settings.PARAM_LOG_EPOCHS = 1
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        runner.run()
        summary = os.path.join(out, "models", "tiny_paramlog", "summary")
        hist_jsonl = os.path.join(summary, "histograms.jsonl")
        if os.path.exists(hist_jsonl):
            import json
            tags = [json.loads(l)["tag"] for l in open(hist_jsonl)]
        else:  # tensorboard backend: histogram tags live in event files
            from tensorboard.backend.event_processing.event_accumulator \
                import EventAccumulator
            acc = EventAccumulator(summary)
            acc.Reload()
            tags = acc.Tags().get("histograms", [])
        assert any("kernel" in t for t in tags), tags

    def test_aff_trace_writes_transform_params(self, env, tmp_path):
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "tiny_trace_aff"
        settings.NUM_EPOCHS = 1
        settings.VAL_EPOCHS = 5
        settings.TRACE = True
        settings.LOSS_FACTORS = [2.0, 1.0, 0.5]
        settings.LOSS_FUNC = {"method": "metrics.IntRegAffRefineLoss",
                              "band_width": 1e-2, "smoothing": 0.1,
                              "rescale_jitter": None}
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        runner.run()
        trace_root = os.path.join(out, "debug", "tiny_trace_aff",
                                  "train_trace")
        found = []
        for root, _, files in os.walk(trace_root):
            found.extend(f for f in files if f == "transform.txt")
        assert found


class TestDeterminism:
    def test_same_seed_same_params(self, env, tmp_path):
        """Seeded PRNG threading makes single-worker training bit-
        reproducible (SURVEY §5: determinism replaces the reference's
        contradictory cudnn benchmark+deterministic flags)."""
        import jax
        db, out = env

        def run_once(tag):
            settings = _settings(tmp_path, db, out)
            settings.EXP_NAME = f"det_{tag}"
            settings.NUM_EPOCHS = 1
            settings.VAL_EPOCHS = 5  # skip validation
            settings.RANDOM_SEED = 123
            settings.NUM_WORKERS = 0
            runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
                settings_module=settings)
            runner.run()
            return jax.tree.leaves(runner.params)

        a = run_once("a")
        b = run_once("b")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestTrainWire:
    """H2D wire packing (trainer.pack_train_batch): u16 image + u8 masks."""

    def _raw_batch(self, rng):
        from dram_tpu.data.pipeline import collate_dict
        img = rng.random((2, 8, 8, 8)).astype(np.float32)
        lobe = (rng.random((2, 8, 8, 8)) > 0.5).astype(np.float32)
        les = (rng.random((2, 8, 8, 8)) > 0.7).astype(np.float32)
        samples = [{"#image": img[i], "#lobe_reference": lobe[i],
                    "#lesion_reference": les[i],
                    "meta": {"ctss": str(i + 1)}} for i in range(2)]
        return collate_dict(samples)

    def test_pack_round_trip(self):
        from dram_tpu.train.trainer import pack_train_batch
        rng = np.random.default_rng(0)
        raw = self._raw_batch(rng)
        p = pack_train_batch(raw, "u16")
        assert p["images"].dtype == np.uint16
        assert p["lobes"].dtype == np.uint8
        assert p["lesions"].dtype == np.uint8
        # span is per-SAMPLE (B, 2): each row quantizes over its own range
        assert p["span"].shape == (2, 2)
        bshape = (2, 1, 1, 1, 1)
        lo = p["span"][:, 0].reshape(bshape)
        hi = p["span"][:, 1].reshape(bshape)
        back = p["images"].astype(np.float32) * ((hi - lo) / 65535.0) + lo
        err = np.abs(back - raw["#image"][..., None])
        assert (err <= (hi - lo) / 65535.0 * 0.5 + 1e-7).all()
        # masks are bit-exact
        np.testing.assert_array_equal(
            p["lobes"].astype(np.float32),
            raw["#lobe_reference"][..., None])
        np.testing.assert_array_equal(p["ctss"], [1, 2])

    def test_non_integral_mask_stays_f32(self):
        from dram_tpu.train.trainer import MaskWireLatch
        latch = MaskWireLatch()
        m = np.array([0.0, 5.0, 255.0], np.float32)
        assert latch.pack(m).dtype == np.uint8
        m = np.array([0.0, 0.5, 1.0], np.float32)
        assert latch.pack(m).dtype == np.float32
        # the latch is one-way: once any batch needed f32, later
        # u8-representable batches ALSO ship f32 (at most one retrace)
        m = np.array([0.0, 5.0, 255.0], np.float32)
        assert latch.pack(m).dtype == np.float32
        latch2 = MaskWireLatch()
        m = np.array([0.0, 300.0], np.float32)  # out of u8 range
        assert latch2.pack(m).dtype == np.float32

    def test_nonfinite_image_falls_back_to_f32_wire(self):
        from dram_tpu.train.trainer import pack_train_batch
        rng = np.random.default_rng(3)
        raw = self._raw_batch(rng)
        raw["#image"][0, 0, 0, 0] = np.nan
        p = pack_train_batch(raw, "u16")
        assert p["images"].dtype == np.float32  # not undefined u16 garbage
        assert np.isnan(p["images"]).any()
        np.testing.assert_array_equal(p["span"], [[0.0, 1.0]] * 2)

    def test_u16_step_matches_f32_step(self, env, tmp_path):
        """One optimizer step through the u16 wire matches the f32 wire to
        quantization tolerance (the jitted step dequantizes on device)."""
        import jax
        import jax.numpy as jnp
        from dram_tpu.train.trainer import pack_train_batch
        db, out = env
        settings = _settings(tmp_path, db, out)
        settings.EXP_NAME = "wire_step"
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        ds = runner.tr_loader.dataset
        from dram_tpu.data.pipeline import collate_dict
        raw = collate_dict([ds[0], ds[1]])
        freq = jnp.asarray(runner.ctss_frequency_array)
        rng = jax.random.PRNGKey(7)

        def step(wire):
            packed = pack_train_batch(raw, wire)
            im, lob, les, ct, w, span = runner._device_batch(packed)
            params = jax.tree.map(jnp.array, runner.params)
            bs = jax.tree.map(jnp.array, runner.batch_stats)
            opt = jax.tree.map(
                lambda x: jnp.array(x) if hasattr(x, "dtype") else x,
                runner.opt_state)
            out = runner.train_step(params, bs, opt, im, lob, les, ct,
                                    freq, w, rng, span)
            return float(out[3])

        l_f32 = step("f32")
        l_u16 = step("u16")
        assert l_u16 == pytest.approx(l_f32, rel=2e-3, abs=2e-4)
