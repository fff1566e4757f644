"""C++ native host-prep kernels vs the NumPy implementations."""

import numpy as np
import pytest

from dram_tpu.data import hostprep as hp_np

try:
    from dram_tpu.native import hostprep_native as hp_cc
    _ = hp_cc.pack12(np.zeros(4, np.int16))  # force build
    HAVE_NATIVE = True
except Exception as e:  # pragma: no cover
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason="native toolchain unavailable")


@needs_native
class TestNativeHostprep:
    def test_pack12_matches_numpy(self, rng):
        v = rng.integers(-3000, 3000, 1001).astype(np.int16)
        a, na = hp_cc.pack12(v)
        b, nb = hp_np.pack12(v)
        assert na == nb
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(hp_np.unpack12_np(a, na),
                                      np.clip(v, -2048, 2047))

    def test_pack4_matches_numpy(self, rng):
        l = rng.integers(0, 6, 999).astype(np.uint8)
        a, _ = hp_cc.pack4(l)
        b, _ = hp_np.pack4(l)
        np.testing.assert_array_equal(a, b)

    def test_linear_resample_matches_numpy(self, rng):
        scan = rng.integers(-1000, 400, (40, 52, 48)).astype(np.int16)
        spacing = (1.6, 0.8, 0.9)
        a, shape_a = hp_cc.resample_iso_int16(scan, spacing, 1.0, -2048)
        b_f, shape_b = hp_np.resample_iso_np(scan, spacing, 1.0, "linear",
                                             fill_value=-2048)
        assert shape_a == tuple(shape_b)
        # int rounding: allow +/-1 HU from accumulation-order differences
        diff = np.abs(a.astype(np.int32) - np.round(b_f).astype(np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02

    def test_nearest_resample_matches_numpy(self, rng):
        lobe = rng.integers(0, 6, (40, 52, 48)).astype(np.uint8)
        spacing = (1.6, 0.8, 0.9)
        a = hp_cc.resample_iso_labels(lobe, spacing, 1.0)
        b_f, _ = hp_np.resample_iso_np(lobe, spacing, 1.0, "nearest",
                                       dtype=np.float32)
        np.testing.assert_array_equal(a, b_f.astype(np.uint8))

    def test_unpackbits_matches_numpy(self, rng):
        packed = rng.integers(0, 256, 1000).astype(np.uint8)
        a = hp_cc.unpackbits(packed, (100, 80))
        want = np.unpackbits(packed)[:8000].reshape(100, 80)
        np.testing.assert_array_equal(a, want)

    def test_prep_scan_uses_native(self, rng):
        scan = rng.integers(-1000, 400, (30, 40, 40)).astype(np.int16)
        lobe = np.zeros((30, 40, 40), np.uint8)
        lobe[5:25, 5:35, 5:35] = 1
        prep = hp_np.prep_scan(scan, lobe, (1.5, 1.0, 1.0))
        assert prep["iso_shape"] == (45, 40, 40)
        assert prep["packed_scan"].dtype == np.uint8
        got = hp_np.unpack12_np(prep["packed_scan"], prep["n_voxels"])
        assert got.shape[0] == int(np.prod(prep["iso_shape"]))

    def test_chunk_prep_native_matches_numpy(self):
        """The C++ chunk-wire prep (bboxes, chunk extraction, windowed
        histogram, candidate/mask bit-packing) matches the NumPy twin:
        exact on everything except the trilinear chunk values (within
        one bf16 ulp, fp association order)."""
        from dram_tpu.data.prepare_data import _synth_scan
        from dram_tpu.infer.fast import (_prep_scan_chunks_native,
                                         _prep_scan_chunks_np)
        rng = np.random.default_rng(11)
        scan, lobe, *_ = _synth_scan(rng, (48, 64, 64),
                                     lesion_severity=[3, 4, 2, 5, 3])
        vessel = (rng.uniform(size=scan.shape) > 0.97).astype(np.uint8)
        args = (scan, lobe, (1.2, 0.9, 0.9), 1.0, -2048, vessel,
                (-1000, -700), (16, 16, 16), 5, 5.0)
        a = _prep_scan_chunks_np(*args)
        b = _prep_scan_chunks_native(*args)
        for k in ("iso_shape", "bucket", "starts", "present", "crop_lo",
                  "out_shape"):
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)
        for i in range(3):
            for ax in range(3):
                np.testing.assert_array_equal(a["fw"][i][ax],
                                              b["fw"][i][ax])
                np.testing.assert_array_equal(a["bw"][i][ax],
                                              b["bw"][i][ax])
        import ml_dtypes
        av = a["x80_bits"].view(ml_dtypes.bfloat16).astype(np.float32)
        bv = b["x80_bits"].view(ml_dtypes.bfloat16).astype(np.float32)
        d = np.abs(av - bv)
        # f32 lerp association ulps -> at most one bf16 ulp apart
        assert d.max() <= 1.0 / 128.0 and (d > 0).mean() < 0.01
        np.testing.assert_array_equal(a["lobe_bits"], b["lobe_bits"])
        np.testing.assert_array_equal(a["cand_bits"], b["cand_bits"])
        assert a["intensity_threshold"] == pytest.approx(
            b["intensity_threshold"])

    def test_subgrid_bboxes_match_materialized(self, rng):
        """Bboxing the raw volume on the sampled subgrid == bboxing the
        materialized nearest resample (same axis tables)."""
        lobe = np.zeros((40, 52, 48), np.uint8)
        lobe[3:17, 10:30, 6:20] = 1
        lobe[20:33, 25:50, 22:47] = 3
        spacing = (1.6, 0.8, 0.9)
        iso = hp_cc.resample_iso_labels(lobe, spacing, 1.0)
        want_mins, want_maxs = hp_cc.lobe_bboxes(iso, 5)
        mins, maxs, shape = hp_cc.subgrid_bboxes(lobe, spacing, 1.0, 5)
        assert tuple(shape) == iso.shape
        np.testing.assert_array_equal(mins, want_mins)
        np.testing.assert_array_equal(maxs, want_maxs)

    def test_window_labels_match_crop(self, rng):
        lobe = rng.integers(0, 6, (40, 52, 48)).astype(np.uint8)
        spacing = (1.6, 0.8, 0.9)
        iso = hp_cc.resample_iso_labels(lobe, spacing, 1.0)
        lo, size = (5, 7, 3), (30, 20, 24)
        got = hp_cc.resample_window_labels(lobe, spacing, 1.0, lo, size)
        want = iso[5:35, 7:27, 3:27]
        np.testing.assert_array_equal(got, want)

    def test_window_int16_matches_crop(self, rng):
        scan = rng.integers(-1400, 400, (40, 52, 48)).astype(np.int16)
        spacing = (1.6, 0.8, 0.9)
        iso, _ = hp_cc.resample_iso_int16(scan, spacing, 1.0, fill=-2048)
        lo, size = (5, 7, 3), (30, 20, 24)
        got = hp_cc.resample_window_int16(scan, spacing, 1.0, lo, size,
                                          fill=-2048)
        np.testing.assert_array_equal(got, iso[5:35, 7:27, 3:27])

    def test_prep_scan_window_path_matches_full_crop(self):
        """prep_scan's native path resamples only inside the lung crop
        (VERDICT r4 #4); must be bit-identical to the old
        full-resample-then-crop sequence on every wire field."""
        from dram_tpu.data.prepare_data import _synth_scan
        rng = np.random.default_rng(3)
        scan, lobe, _, vessel, _ = _synth_scan(
            rng, (48, 64, 64), lesion_severity=[1, 2, 3, 4, 5])
        spacing, span = (1.2, 0.9, 0.9), (-1000, -700)
        new = hp_np.prep_scan(scan, lobe, spacing, vessel_u8=vessel,
                              windowing_span=span)
        iso_scan, iso_shape = hp_cc.resample_iso_int16(scan, spacing, 1.0,
                                                       fill=-2048)
        iso_lobe = hp_cc.resample_iso_labels(lobe, spacing, 1.0)
        iso_vessel = hp_cc.resample_iso_labels(vessel, spacing, 1.0)
        crop_lo, crop_shape = hp_np.lung_crop(iso_lobe)
        sl = tuple(slice(int(l), int(l) + s)
                   for l, s in zip(crop_lo, crop_shape))
        assert new["full_iso_shape"] == tuple(iso_shape)
        np.testing.assert_array_equal(np.asarray(new["crop_lo"]),
                                      np.asarray(crop_lo))
        assert new["iso_shape"] == crop_shape
        np.testing.assert_array_equal(new["iso_lobe_host"], iso_lobe[sl])
        np.testing.assert_array_equal(new["iso_vessel_host"],
                                      iso_vessel[sl])
        np.testing.assert_array_equal(
            new["packed_scan"],
            hp_np.window8(np.ascontiguousarray(iso_scan[sl]), span))

    def test_window_w8hist_matches_two_pass(self, rng):
        scan = rng.integers(-1400, 400, (40, 52, 48)).astype(np.int16)
        lobe = rng.integers(0, 6, (40, 52, 48)).astype(np.uint8)
        spacing = (1.6, 0.8, 0.9)
        span = (-1000, -700)
        lo, size = (2, 4, 6), (40, 30, 28)
        lobe_c = hp_cc.resample_window_labels(lobe, spacing, 1.0, lo, size)
        want_scan = hp_cc.resample_window_int16(scan, spacing, 1.0, lo,
                                                size, fill=-2048)
        want_u8, want_hist = hp_cc.window8_hist(want_scan, lobe_c, span)
        got_scan, got_u8, got_hist = hp_cc.resample_window_w8hist(
            scan, spacing, 1.0, lo, size, lobe_c, span, fill=-2048)
        np.testing.assert_array_equal(got_scan, want_scan)
        np.testing.assert_array_equal(got_u8, want_u8)
        np.testing.assert_array_equal(got_hist, want_hist)

    def test_crop_copy_matches_slice(self, rng):
        vol = rng.integers(0, 256, (30, 40, 50)).astype(np.uint8)
        got = hp_cc.crop_copy(vol, (3, 5, 7), (20, 30, 40))
        np.testing.assert_array_equal(got, vol[3:23, 5:35, 7:47])

    def test_chunk_prep_native_empty_lung(self):
        from dram_tpu.infer.fast import _prep_scan_chunks_native
        rng = np.random.default_rng(12)
        scan = rng.integers(-1000, 400, (24, 32, 32)).astype(np.int16)
        lobe = np.zeros((24, 32, 32), np.uint8)
        p = _prep_scan_chunks_native(scan, lobe, (1.0, 1.0, 1.0), 1.0,
                                     -2048, None, (-1000, -700),
                                     (16, 16, 16), 5, 5.0)
        assert p["present"].sum() == 0
        assert np.unpackbits(p["cand_bits"]).sum() == 0
