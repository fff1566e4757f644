"""Settings/config-system, checkpoint-discovery and viz smoke tests."""

import os
import time

import numpy as np
import pytest

from dram_tpu.utils import (Settings, get_callable_by_name, AverageMeter,
                            MovingAverage, PD_Stats, get_value_recursively,
                            read_csv_in_dict, read_csv_in_dict_double,
                            count_params, expand_dims_np, squeeze_dims_np)
from dram_tpu.train.checkpoint import newest_checkpoint, save_checkpoint


class TestSettings:
    def test_uppercase_lift_and_overrides(self, tmp_path):
        p = tmp_path / "s.py"
        p.write_text("EXP_NAME = 'x'\nMODEL_NAME = 'm'\nLR = 0.1\n"
                     "lower_case = 5\n")
        s = Settings(str(p))
        assert s.EXP_NAME == "x" and s.LR == 0.1
        assert not hasattr(s, "lower_case")
        assert s.is_overridden("LR") and not s.is_overridden("MISSING")
        # argparse-style post-load mutation (reference train.py:17-21)
        s.LR = 0.5
        assert s.LR == 0.5
        assert "EXP_NAME" in str(s)

    def test_compulsory_exp_name(self, tmp_path):
        p = tmp_path / "bad.py"
        p.write_text("MODEL_NAME = 'm'\n")
        with pytest.raises(AttributeError):
            Settings(str(p))

    def test_alias_registry(self):
        from dram_tpu.models.unet3d import DC3D
        assert get_callable_by_name("models.DC3D") is DC3D
        from dram_tpu.losses.refine import IntRegRefineLoss
        assert get_callable_by_name("metrics.IntRegRefineLoss") \
            is IntRegRefineLoss


class TestHelpers:
    def test_meters(self):
        m = AverageMeter()
        m.update(1.0, 2)
        m.update(3.0, 2)
        assert m.avg == pytest.approx(2.0)
        mv = MovingAverage(0.5)
        mv.update(4.0)
        assert mv.avg == pytest.approx(2.0)

    def test_csv_readers(self, tmp_path):
        p = tmp_path / "t.csv"
        p.write_text("uid,a,b\nx,1,2\ny,3,4\n")
        d, fields = read_csv_in_dict(str(p), "uid")
        assert d["x"]["a"] == "1" and fields == ["uid", "a", "b"]
        d2, _ = read_csv_in_dict_double(str(p), ["uid", "a"])
        assert d2[("y", "3")]["b"] == "4"
        assert read_csv_in_dict("/nonexistent.csv", "uid") == ({}, None)

    def test_get_value_recursively(self):
        d = {"a": {"filename": "f1"}, "b": [{"filename": "f2"}], "c": 3}
        assert sorted(get_value_recursively(d, "filename")) == ["f1", "f2"]

    def test_dims_helpers(self):
        a = np.zeros((3, 4))
        assert expand_dims_np(a, 4).shape == (1, 1, 3, 4)
        assert squeeze_dims_np(np.zeros((1, 1, 3, 4)), 2).shape == (3, 4)

    def test_count_params(self):
        tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
        assert count_params(tree) == 10

    def test_pd_stats(self, tmp_path):
        p = str(tmp_path / "stats.pkl")
        st = PD_Stats(p, ["x", "y"])
        st.update([1, 2])
        st2 = PD_Stats(p, ["x", "y"])
        assert len(st2.stats) == 1


class TestCheckpointDiscovery:
    def test_newest_checkpoint(self, tmp_path):
        assert newest_checkpoint(str(tmp_path)) is None
        save_checkpoint(str(tmp_path / "0.ckpt"), {"e": 0})
        time.sleep(0.02)
        save_checkpoint(str(tmp_path / "5.ckpt"), {"e": 5})
        assert newest_checkpoint(str(tmp_path)).endswith("5.ckpt")


class TestViz:
    def test_confusion_matrix_smoke(self, tmp_path):
        from dram_tpu.viz import plot_confusion_matrix_from_data
        plot_confusion_matrix_from_data([0, 1, 2, 2], [0, 1, 1, 2],
                                        labels=list(range(6)),
                                        save_path=str(tmp_path / "cm"))
        assert os.path.exists(str(tmp_path / "cm") + ".jpg")

    def test_tile_views_smoke(self, tmp_path):
        from dram_tpu.viz import (draw_mask_tile_single_view,
                                  draw_mask_tile_singleview_heatmap)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (24, 32, 32)).astype(np.uint8)
        m = np.zeros((24, 32, 32), np.uint8)
        m[5:15, 8:20, 8:20] = 1
        draw_mask_tile_single_view(img, [[m]], m > 0, 5,
                                   str(tmp_path / "contour"),
                                   colors=[(0, 0, 255)], thickness=[-1])
        draw_mask_tile_singleview_heatmap(img, [[(m * 255)]], m > 0, 5,
                                          str(tmp_path / "heat"),
                                          titles=["cam"])
        assert os.path.exists(str(tmp_path / "contour.jpg"))
        assert os.path.exists(str(tmp_path / "heat.jpg"))

    def test_summary_histogram_tensorboard(self, tmp_path):
        """add_histogram (reference job_runner.py:352) writes a real TB
        event when tensorboard is importable."""
        from dram_tpu.viz import SummaryWriter
        w = SummaryWriter(str(tmp_path / "tb"))
        if w._tb is None:
            pytest.skip("tensorboard not importable in this env")
        w.add_histogram("conv_0_kernel", np.random.default_rng(0)
                        .normal(size=(3, 3, 3, 4)), 7)
        w.close()
        evs = [f for f in os.listdir(str(tmp_path / "tb"))
               if "tfevents" in f]
        assert evs and max(os.path.getsize(os.path.join(
            str(tmp_path / "tb"), f)) for f in evs) > 0

    def test_summary_histogram_jsonl_fallback(self, tmp_path):
        import json
        from dram_tpu.viz import SummaryWriter
        w = SummaryWriter(str(tmp_path / "js"))
        w._tb = None  # force the no-tensorboard backend
        vals = np.linspace(-1.0, 1.0, 101)
        w.add_histogram("p", vals, 3)
        w.close()
        lines = [json.loads(l) for l in open(
            str(tmp_path / "js" / "histograms.jsonl"))]
        assert lines[0]["tag"] == "p" and lines[0]["step"] == 3
        assert lines[0]["count"] == 101
        q = lines[0]["quantiles"]
        assert q[0] == pytest.approx(-1.0) and q[-1] == pytest.approx(1.0)
        assert q[5] == pytest.approx(0.0)


class TestSeedCache:
    """warm_cache seeding: tracked xz entries unpack into a fresh runtime
    cache exactly once (tools/seed_xla_cache.py + utils.seed_compilation_cache)."""

    def test_pack_unpack_roundtrip(self, tmp_path):
        import lzma
        from dram_tpu.utils import seed_compilation_cache

        seed = tmp_path / "warm_cache"
        cache = tmp_path / "runtime"
        seed.mkdir()
        cache.mkdir()
        blobs = {"jit_stage2c-aaaa-cache": b"\x00executable\x01" * 1000,
                 "jit_fwd-bbbb-cache": b"mosaic" * 50}
        for name, data in blobs.items():
            with lzma.open(seed / (name + ".xz"), "wb") as f:
                f.write(data)
        # pre-existing entry must not be clobbered
        (cache / "jit_fwd-bbbb-cache").write_bytes(b"already-here")

        n = seed_compilation_cache(str(seed), str(cache))
        assert n == 1
        assert (cache / "jit_stage2c-aaaa-cache").read_bytes() == \
            blobs["jit_stage2c-aaaa-cache"]
        assert (cache / "jit_fwd-bbbb-cache").read_bytes() == b"already-here"
        # second call is a no-op
        assert seed_compilation_cache(str(seed), str(cache)) == 0

    def test_corrupt_entry_skipped(self, tmp_path):
        from dram_tpu.utils import seed_compilation_cache

        seed = tmp_path / "warm_cache"
        cache = tmp_path / "runtime"
        seed.mkdir()
        cache.mkdir()
        (seed / "bad-cache.xz").write_bytes(b"not xz at all")
        assert seed_compilation_cache(str(seed), str(cache)) == 0
        assert not (cache / "bad-cache").exists()
