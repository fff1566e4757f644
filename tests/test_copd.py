"""COPDGene emphysema-subtyping workload end-to-end through the same
trainer via config-selected dataset/sampler classes."""

import os
import textwrap

import numpy as np
import pytest

from dram_tpu.data.prepare_data import make_synthetic_copd_dataset
from dram_tpu.data.datasets import (COPDGeneSubtyping,
                                    COPDGeneSubtypingLobeChunk)
from dram_tpu.data.sampler import LobeChunkCLESampler
from dram_tpu.utils import Settings, get_callable_by_name


SETTINGS = textwrap.dedent("""
    DB_PATH = {db!r}
    VALID_CSV = {db!r} + "/val.csv"
    TEST_CSV = {db!r} + "/test.csv"
    DEBUG_PATH = {out!r} + "/debug/"
    MODEL_ROOT_PATH = {out!r} + "/models/"
    JOB_RUNNER_CLS = "job_runner.LesionSegChunkTrain"
    TRAIN_DATASET_CLS = "dram_tpu.data.datasets.COPDGeneSubtypingLobeChunk"
    VAL_DATASET_CLS = "dram_tpu.data.datasets.COPDGeneSubtyping"
    SAMPLER_CLS = "dram_tpu.data.sampler.LobeChunkCLESampler"
    TRAIN_MEMO_CSV = {db!r} + "/memo.csv"
    EXP_NAME = "tiny_copd"
    MODEL_NAME = "DC3D"
    RESAMPLE_MODE = "fixed_size"
    NUM_EPOCHS = 1
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
    WINDOWING_MAX = -700
    WINDOWING_MIN = -1000
    NR_CLASS = 1
    COMPUTE_DTYPE = "float32"
    RELOAD_CHECKPOINT = False
    RELOAD_CHECKPOINT_PATH = None
    RELOAD_DICT_LIST = ["model"]
    MODEL = {{
        "method": "models.DC3D",
        "n_layers": 2,
        "in_ch_list": [1, 8, 16, 48, 24],
        "base_ch_list": [4, 8, 16, 16, 8],
        "end_ch_list": [8, 16, 32, 16, 8],
        "kernel_sizes": [(3, 3)] * 5,
        "stacking": 2,
        "padding_list": [(1, 1)] * 5,
        "checkpoint_layers": [0, 0, 0, 0, 0],
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
def copd_db(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("copd"))
    info = make_synthetic_copd_dataset(db, n_scans=3, size=(24, 32, 32),
                                       seed=0)
    return db, info


class TestCOPDDatasets:
    def test_chunk_dataset(self, copd_db):
        db, info = copd_db
        uids = COPDGeneSubtypingLobeChunk.get_series_uids(db + "/memo.csv")
        assert len(uids) == info["n_chunks"]
        ds = COPDGeneSubtypingLobeChunk(db, uids)
        s = ds[0]
        assert "#lesion_reference" in s
        assert "cle" in s["meta"]

    def test_unique_scan_sampling(self, copd_db):
        db, _ = copd_db
        picked = COPDGeneSubtypingLobeChunk.get_series_uids_unique_scans(
            db + "/memo.csv")
        scans = {u[:-2] for u in picked}
        assert len(picked) == len(scans)  # one lobe per scan

    def test_full_scan_dataset(self, copd_db):
        db, _ = copd_db
        uids = COPDGeneSubtyping.get_series_uids(db + "/meta/ctss.csv")
        ds = COPDGeneSubtyping(db, uids)
        s = ds[0]
        # lesion reference = low-HU voxels inside the lung (emphysema)
        assert s["#lesion_reference"].sum() > 0
        assert (s["#image"][s["#lesion_reference"] > 0] < -950).all()
        assert "cle" in s["meta"] and "pse" in s["meta"]

    def test_cle_sampler_stats(self, copd_db):
        db, _ = copd_db
        uids = COPDGeneSubtypingLobeChunk.get_series_uids(db + "/memo.csv")
        ds = COPDGeneSubtypingLobeChunk(db, uids)
        sm = LobeChunkCLESampler(None, ds, batch_size=2,
                                 balance_label_count=3, seed=0)
        assert len(list(iter(sm))) == len(sm)
        assert sm.frequency_array().shape == (6,)


class TestCOPDTraining:
    def test_one_epoch_through_config(self, copd_db, tmp_path):
        db, _ = copd_db
        out = str(tmp_path / "out")
        sfile = tmp_path / "copd.py"
        sfile.write_text(SETTINGS.format(db=db, out=out))
        settings = Settings(str(sfile))
        runner = get_callable_by_name(settings.JOB_RUNNER_CLS)(
            settings_module=settings)
        runner.run()
        exp = os.path.join(out, "models", "tiny_copd")
        import pandas as pd
        rec = pd.read_csv(os.path.join(exp, "records.csv"))
        assert np.isfinite(rec["tr_loss"]).all()
        assert "val_acc_reg_cls" in rec.columns
