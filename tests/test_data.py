"""Data-layer tests: transforms, sampler statistics, synthetic dataset
round-trip, chunk extraction, loader collation/prefetch."""

import numpy as np
import pytest

from dram_tpu.data import transforms as T
from dram_tpu.data.pipeline import DataLoader, collate_dict
from dram_tpu.data.prepare_data import make_synthetic_dataset
from dram_tpu.data.sampler import LobeChunkCTSSSampler
from dram_tpu.data.datasets import RadboudCOVID, RadboudCOVIDLobeVesselChunk


def _sample(rng, size=(12, 14, 16)):
    scan = (rng.normal(-600, 200, size)).astype(np.int16)
    lobe = np.zeros(size, np.uint8)
    lobe[2:10, 3:12, 4:14] = 1
    return {"#image": scan, "#lobe_reference": lobe,
            "meta": {"uid": "u1", "size": size, "spacing": (2.0, 1.0, 1.0),
                     "original_spacing": (2.0, 1.0, 1.0),
                     "original_size": size, "origin": (0, 0, 0),
                     "direction": list(np.eye(3).flatten())}}


class TestTransforms:
    def test_windowing_image_keys_only(self, rng):
        s = _sample(rng)
        out = T.Windowing(min=-1000, max=-300, out_min=0, out_max=1)(s)
        assert out["#image"].min() >= 0 and out["#image"].max() <= 1
        np.testing.assert_array_equal(out["#lobe_reference"],
                                      s["#lobe_reference"])

    def test_resample_fixed_size(self, rng):
        s = _sample(rng)
        out = T.Resample(mode="fixed_size", factor=1.0, size=(8, 8, 8))(s)
        assert out["#image"].shape == (8, 8, 8)
        assert out["#lobe_reference"].shape == (8, 8, 8)
        assert out["#lobe_reference"].dtype == np.uint8
        assert set(np.unique(out["#lobe_reference"])) <= {0, 1}
        # spacing scaled by size ratio
        np.testing.assert_allclose(out["meta"]["spacing"],
                                   (2.0 * 12 / 8, 1.0 * 14 / 8, 1.0 * 16 / 8))
        assert out["meta"]["size_before_resample"] == (12, 14, 16)

    def test_resample_fixed_spacing(self, rng):
        s = _sample(rng)
        out = T.Resample(mode="fixed_spacing", factor=1.0)(s)
        assert out["#image"].shape == (24, 14, 16)

    @pytest.mark.parametrize("reduce_max", [False, True])
    def test_slab_projection_matches_reference_loop(self, rng, reduce_max):
        """MIP/MinIP slab projections == the literal reference loop
        (data_transforms.py:416-430): out[si] = min/max over the TRAILING
        window [max(0, si-slab), si] along the drawn axis."""
        from dram_tpu.data.transforms import _trailing_projection
        data = rng.normal(size=(9, 7, 8)).astype(np.float32)
        red = np.max if reduce_max else np.min
        for slab in (1, 3, 6):
            for axis in (0, 1, 2):
                got = _trailing_projection(data, slab, axis - 3, reduce_max)
                moved = np.moveaxis(data, axis, 0)
                want = np.stack([red(moved[max(0, si - slab):si + 1], axis=0)
                                 for si in range(moved.shape[0])])
                want = np.moveaxis(want, 0, axis)
                np.testing.assert_array_equal(got, want)

    def test_slab_projection_transform_draws(self, rng):
        np.random.seed(3)
        s = _sample(rng)
        out = T.MinimalIntensityProjection(slab_thickness=(3, 10))(s)
        assert out["#image"].shape == s["#image"].shape
        assert (out["#image"] <= s["#image"] + 1e-6).all()  # min projection
        np.testing.assert_array_equal(out["#lobe_reference"],
                                      s["#lobe_reference"])
        out2 = T.MaximumIntensityProjection()(s)
        assert (out2["#image"] >= s["#image"] - 1e-6).all()
        out3 = T.MinimalIntensityAxialProjection()(s)
        assert out3["#image"].shape == s["#image"].shape

    def test_flip_applies_to_all_tensor_keys(self, rng):
        np.random.seed(0)
        s = _sample(rng)
        out = T.RandomFlip(3)(s)
        # some axis flipped consistently on both keys
        found = False
        for ax in (-1, -2, -3):
            if np.array_equal(out["#image"], np.flip(s["#image"], ax)):
                np.testing.assert_array_equal(
                    out["#lobe_reference"], np.flip(s["#lobe_reference"], ax))
                found = True
        assert found

    def test_rot90_consistency(self, rng):
        np.random.seed(1)
        s = {"#image": rng.normal(size=(8, 8, 8)).astype(np.float32),
             "#lobe_reference": (rng.random((8, 8, 8)) > 0.5).astype(np.uint8),
             "meta": {}}
        out = T.RandomRotate90(3)(s)
        assert out["#image"].shape == (8, 8, 8)
        assert sorted(out["#image"].ravel().tolist()) == \
            sorted(s["#image"].ravel().tolist())

    def test_maskout_only_images(self, rng):
        np.random.seed(2)
        s = _sample(rng)
        out = T.RandomMaskOut(times=5, region_range=((0.2, 0.8),) * 3,
                              region_size=((0.1, 0.3),) * 3)(s)
        assert not np.array_equal(out["#image"], s["#image"])
        np.testing.assert_array_equal(out["#lobe_reference"],
                                      s["#lobe_reference"])

    def test_gaussian_addictive_range_preserved(self, rng):
        np.random.seed(3)
        s = _sample(rng)
        out = T.GaussianAddictive((0.01, 0.02))(s)
        assert out["#image"].min() >= s["#image"].min() - 1e-3
        assert out["#image"].max() <= s["#image"].max() + 1e-3

    def test_remove_meta(self, rng):
        s = _sample(rng)
        s["meta"]["patient_meta"] = {"junk": 1}
        out = T.RemoveMeta()(s)
        assert "patient_meta" not in out["meta"]
        assert "uid" in out["meta"]

    def test_ensemble_zero_ratio_is_identity(self, rng):
        s = _sample(rng)
        out = T.ensemble_augmentation(0.0)(s)
        np.testing.assert_array_equal(out["#image"], s["#image"])


class TestSyntheticDataset:
    @pytest.fixture(scope="class")
    def db(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("db"))
        info = make_synthetic_dataset(path, n_scans=3, size=(30, 40, 40),
                                      seed=0)
        return path, info

    def test_layout_and_chunks(self, db):
        path, info = db
        assert len(info["uids"]) == 3
        assert info["n_chunks"] == 15  # 3 scans x 5 lobes
        uids = RadboudCOVID.get_series_uids(path + "/wss_all.csv")
        assert uids == sorted(info["uids"])

    def test_full_scan_dataset(self, db):
        path, _ = db
        ds = RadboudCOVID(path, RadboudCOVID.get_series_uids(
            path + "/wss_all.csv"))
        s = ds[0]
        assert s["#image"].shape == (30, 40, 40)
        assert s["#image"][s["#lobe_reference"] == 0].max() == -2048
        assert set(np.unique(s["#lobe_reference"])) == {0, 1, 2, 3, 4, 5}
        assert s["#lesion_reference"].sum() > 0

    def test_chunk_dataset_and_sampler(self, db):
        path, _ = db
        case_uids = RadboudCOVIDLobeVesselChunk.get_series_uids(
            path + "/wss_chunk/memo.csv")
        ds = RadboudCOVIDLobeVesselChunk(path, case_uids)
        assert len(ds) == 15
        s = ds[0]
        assert "#pseudo_lesion_reference" in s
        assert s["#pseudo_lesion_reference"].sum() >= 0
        assert s["meta"]["ctss"] == s["ctss"]

        sampler = LobeChunkCTSSSampler(None, ds, batch_size=2,
                                       balance_label_count=6, seed=0)
        idx = list(iter(sampler))
        assert len(idx) == sampler.total_n
        freq = sampler.frequency_array()
        assert freq.shape == (6,)
        assert abs(sum(sampler.ctss_frequency_map[int(l)]
                       for l in sampler.ctss_labels) - 1.0) < 1e-6

    def test_loader_prefetch_matches_serial(self, db):
        path, _ = db
        case_uids = RadboudCOVIDLobeVesselChunk.get_series_uids(
            path + "/wss_chunk/memo.csv")
        ds = RadboudCOVIDLobeVesselChunk(
            path, case_uids,
            transforms=T.Compose([
                T.Windowing(min=-1000, max=-300),
                T.Resample(mode="fixed_size", factor=1.0, size=(16, 16, 16)),
                T.RemoveMeta()]))

        class FixedSampler:
            def __iter__(self):
                return iter(range(6))

            def __len__(self):
                return 6

        serial = list(DataLoader(ds, FixedSampler(), 2, num_workers=0))
        threaded = list(DataLoader(ds, FixedSampler(), 2, num_workers=3))
        assert len(serial) == len(threaded) == 3
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a["#image"], b["#image"])
            assert a["#image"].shape == (2, 16, 16, 16)
            assert a["meta"]["uid"] == b["meta"]["uid"]

    def test_collate_meta_tuples(self):
        b = [{"#image": np.zeros((2, 2)), "meta": {"uid": "a", "x": 1}},
             {"#image": np.ones((2, 2)), "meta": {"uid": "b", "x": 2}}]
        c = collate_dict(b)
        assert c["#image"].shape == (2, 2, 2)
        assert c["meta"]["uid"] == ("a", "b")
        assert c["meta"]["x"] == (1, 2)
