"""FastScanPipeline (all-device path) vs the reference-shaped engine path:
same synthetic scan, same weights -> near-identical lesion masks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dram_tpu.data.prepare_data import _synth_scan
from dram_tpu.infer.fast import FastScanPipeline
from dram_tpu.models import DC3D


CFG = dict(n_layers=2, in_ch_list=(1, 8, 16, 48, 24),
           base_ch_list=(4, 8, 16, 16, 8), end_ch_list=(8, 16, 32, 16, 8),
           padding_list=((1, 1),) * 5, checkpoint_layers=(0, 0, 0, 0, 0),
           kernel_sizes=[(3, 3)] * 5, stacking=2)
CHUNK = (16, 16, 16)


@pytest.fixture(scope="module")
def model_and_params():
    model = DC3D(**CFG, train=False)
    v = jax.jit(model.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, *CHUNK, 1)))
    return model, v["params"], v["batch_stats"]


def _engine_like_reference(scan, lobe, spacing, model, params, batch_stats):
    """Replica of the host-stitch path (engine.process_scan semantics) to
    serve as the oracle for the fused device pipeline."""
    from dram_tpu.core.ops import binary_cam_np, find_crops_np, windowing_np
    from dram_tpu.core.resample import resize3d_np
    from dram_tpu.data import transforms as T
    from dram_tpu.losses.interval_reg import ratio_to_label

    iso_t = T.Resample(mode="fixed_spacing", factor=1.0)
    s = iso_t({"#image": scan.astype(np.int16),
               "#lobe_reference": lobe.astype(np.uint8),
               "meta": {"size": scan.shape, "spacing": spacing}})
    iso_scan, iso_lobe = s["#image"], s["#lobe_reference"]
    iso_spacing = s["meta"]["spacing"]
    htp = np.zeros(iso_scan.shape, np.float32)
    pre = T.Compose([T.Windowing(min=-1000, max=-300),
                     T.Resample(mode="fixed_size", factor=1.0, size=CHUNK)])
    for li in range(1, 6):
        m = iso_lobe == li
        if not m.any():
            continue
        crop = find_crops_np(m, iso_spacing, 5)
        lobe_chunk = m[crop]
        scan_chunk = iso_scan[crop].copy()
        scan_chunk[~lobe_chunk] = -2048
        ret = pre({"#image": scan_chunk.astype(np.int16),
                   "#lobe_reference": lobe_chunk.astype(np.uint8),
                   "meta": {"size": scan_chunk.shape,
                            "spacing": iso_spacing}})
        dense, refined = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(ret["#image"][None, ..., None], jnp.float32),
            jnp.asarray(ret["#lobe_reference"][None, ..., None], jnp.float32))
        out = np.asarray(refined, np.float32)[0, ..., 0]
        l16 = ret["#lobe_reference"] > 0
        probs = 1 / (1 + np.exp(-out))
        ratio = float(probs[l16].mean()) if l16.any() else 0.0
        # reference order: resize raw logits back, then relu + /max
        cam = resize3d_np(out, scan_chunk.shape, "trilinear")
        cam = np.maximum(cam, 0)
        if cam.max() > 0:
            cam = cam / cam.max()
        if ratio_to_label([ratio])[0] == 0:
            cam[:] = 0
        htp[crop][lobe_chunk] = cam[lobe_chunk]
    lung = iso_lobe > 0
    _, th = binary_cam_np(htp[lung])
    pred_iso = htp > th
    return htp, pred_iso, th, iso_scan.shape


class TestFastPipelineParity:
    def test_pred_mask_close_to_reference_path(self, model_and_params):
        model, params, batch_stats = model_and_params
        rng = np.random.default_rng(0)
        scan, lobe, lesion, vessel, sev = _synth_scan(
            rng, (40, 48, 48), lesion_severity=[3, 4, 2, 5, 3])
        spacing = (1.5, 0.9, 0.9)

        fast = FastScanPipeline(model, params, batch_stats,
                                chunk_size=CHUNK,
                                windowing_span=(-1000, -300))
        out = fast.process(scan, lobe, spacing)

        htp_o, pred_iso_o, th_o, iso_shape = _engine_like_reference(
            scan, lobe, spacing, model, params, batch_stats)

        htp_f = np.asarray(out["heatmap_iso"])
        assert htp_f.shape == iso_shape
        # With the reference resize->relu->/max order in stage2, the only
        # remaining fast-vs-host difference is the gather-resize twin of
        # the ITK/align-corners resizes (attribution: the former 0.08/0.92
        # gates were dominated by the normalise-before-resize order, now
        # fixed). Heatmaps agree almost pointwise:
        mask = (htp_o > 0) | (htp_f > 0)
        if mask.any():
            diff = np.abs(htp_f - htp_o)[mask]
            assert np.quantile(diff, 0.95) < 0.005
        # thresholds land within one Otsu bin
        assert out["threshold"] == pytest.approx(th_o, abs=2 / 255)

        # final mask at the original grid matches
        pred_f = out["pred"] > 0
        from dram_tpu.data.transforms import resample_array
        pred_o_orig, _ = resample_array(
            pred_iso_o.astype(np.uint8), (1.0, 1.0, 1.0),
            list(spacing), list(scan.shape), "nearest")
        pred_o_orig = pred_o_orig > 0
        inter = np.logical_and(pred_f, pred_o_orig).sum()
        denom = pred_f.sum() + pred_o_orig.sum()
        dice = 2 * inter / max(denom, 1)
        assert denom == 0 or dice > 0.99, f"dice {dice}"

    def test_prepped_path_matches_device_path(self, model_and_params):
        """Host-prep (iso resample + 12/4-bit packing) + device decode must
        reproduce the all-device path (quantization: HU rounds to int)."""
        from dram_tpu.data.hostprep import prep_scan, pack12, unpack12_np, \
            pack4, unpack4_np
        model, params, batch_stats = model_and_params
        rng = np.random.default_rng(2)
        scan, lobe, *_ = _synth_scan(rng, (36, 44, 44),
                                     lesion_severity=[3, 4, 2, 5, 3])
        spacing = (1.5, 0.9, 0.9)

        # packing round-trips exactly
        v = rng.integers(-2048, 2047, 999).astype(np.int16)
        pk, n = pack12(v)
        np.testing.assert_array_equal(unpack12_np(pk, n), v)
        l = rng.integers(0, 6, 999).astype(np.uint8)
        pk4, n4 = pack4(l)
        np.testing.assert_array_equal(unpack4_np(pk4, n4), l)

        fast = FastScanPipeline(model, params, batch_stats, chunk_size=CHUNK,
                                windowing_span=(-1000, -300))
        a = fast.process(scan, lobe, spacing)
        prep = prep_scan(scan, lobe, spacing)
        b = fast.process_prepped(prep)
        assert b["pred"].shape == scan.shape
        inter = np.logical_and(a["pred"] > 0, b["pred"] > 0).sum()
        denom = (a["pred"] > 0).sum() + (b["pred"] > 0).sum()
        assert denom == 0 or 2 * inter / denom > 0.98
        np.testing.assert_allclose(a["ratios"], b["ratios"], atol=5e-3)

    def test_empty_lobe_handled(self, model_and_params):
        model, params, batch_stats = model_and_params
        rng = np.random.default_rng(1)
        scan, lobe, *_ = _synth_scan(rng, (32, 40, 40))
        lobe[lobe == 5] = 0  # drop a lobe entirely
        fast = FastScanPipeline(model, params, batch_stats, chunk_size=CHUNK,
                                windowing_span=(-1000, -300))
        out = fast.process(scan, lobe, (1.0, 1.0, 1.0))
        assert out["pred"].shape == scan.shape
        assert np.isfinite(out["ratios"]).all()


class TestW8Wire:
    def test_window8_roundtrip_matches_windowing(self, rng):
        """The 8-bit windowed wire decodes to values whose downstream
        windowing equals u8/255 — within one quantization step of the
        full-precision windowing (the reference's own Otsu input is uint8,
        reference utils.py:226-242)."""
        from dram_tpu.core.ops import windowing_np
        from dram_tpu.data.hostprep import window8
        span = (-1000, -700)
        v = rng.integers(-2048, 2047, size=(9, 9, 9)).astype(np.int16)
        u8 = window8(v, span).reshape(v.shape)
        lo, hi = span
        decoded = lo + u8.astype(np.float32) * ((hi - lo) / 255.0)
        w_wire = windowing_np(decoded, from_span=span, to_span=(0.0, 1.0))
        w_full = windowing_np(v.astype(np.float32), from_span=span,
                              to_span=(0.0, 1.0))
        np.testing.assert_allclose(w_wire, u8 / 255.0, atol=1e-6)
        np.testing.assert_allclose(w_wire, w_full, atol=0.5 / 255.0 + 1e-6)

    def test_w8_prepped_path_close_to_p12(self, model_and_params):
        """Full fast pipeline on the w8 wire vs the 12-bit wire: same
        masks up to quantization (Dice > 0.98) and near-equal ratios."""
        from dram_tpu.data.hostprep import prep_scan
        rng = np.random.default_rng(4)
        scan, lobe, *_ = _synth_scan(rng, (32, 40, 40))
        model, params, batch_stats = model_and_params
        span = (-1000, -300)
        fast = FastScanPipeline(model, params, batch_stats, chunk_size=CHUNK,
                                windowing_span=span)
        spacing = (1.0, 1.0, 1.0)
        a = fast.process_prepped(prep_scan(scan, lobe, spacing))
        b = fast.process_prepped(prep_scan(scan, lobe, spacing,
                                           windowing_span=span))
        inter = np.logical_and(a["pred"] > 0, b["pred"] > 0).sum()
        denom = (a["pred"] > 0).sum() + (b["pred"] > 0).sum()
        assert denom == 0 or 2 * inter / denom > 0.98
        np.testing.assert_allclose(a["ratios"], b["ratios"], atol=5e-3)


class TestChunkWire:
    def test_chunk_wire_matches_w8_path(self, model_and_params):
        """Chunk wire (host-extracted 80^3 chunks + 1-bit masks) vs the w8
        scan wire: same masks up to wire quantization, same ratios."""
        from dram_tpu.data.hostprep import prep_scan
        from dram_tpu.infer.fast import prep_scan_chunks
        rng = np.random.default_rng(7)
        scan, lobe, *_ = _synth_scan(rng, (36, 44, 44),
                                     lesion_severity=[3, 4, 2, 5, 3])
        model, params, batch_stats = model_and_params
        span = (-1000, -300)
        spacing = (1.5, 0.9, 0.9)
        fast = FastScanPipeline(model, params, batch_stats, chunk_size=CHUNK,
                                windowing_span=span)
        a = fast.process_prepped(prep_scan(scan, lobe, spacing,
                                           windowing_span=span))
        prepc = prep_scan_chunks(scan, lobe, spacing, windowing_span=span,
                                 chunk_size=CHUNK)
        b = fast.process_chunks(prepc)
        assert b["pred"].shape == scan.shape
        for k in ("pred", "post"):
            inter = np.logical_and(a[k] > 0, b[k] > 0).sum()
            denom = (a[k] > 0).sum() + (b[k] > 0).sum()
            assert denom == 0 or 2 * inter / denom > 0.98, \
                f"{k} dice {2 * inter / max(denom, 1)}"
        np.testing.assert_allclose(a["ratios"], b["ratios"], atol=5e-3)
        assert b["threshold"] == pytest.approx(a["threshold"], abs=5 / 255)

    def test_chunk_wire_empty_lobe(self, model_and_params):
        from dram_tpu.infer.fast import prep_scan_chunks
        model, params, batch_stats = model_and_params
        rng = np.random.default_rng(8)
        scan, lobe, *_ = _synth_scan(rng, (32, 40, 40))
        lobe[lobe == 5] = 0
        fast = FastScanPipeline(model, params, batch_stats, chunk_size=CHUNK,
                                windowing_span=(-1000, -300))
        prepc = prep_scan_chunks(scan, lobe, (1.0, 1.0, 1.0),
                                 windowing_span=(-1000, -300),
                                 chunk_size=CHUNK)
        out = fast.process_chunks(prepc)
        assert out["pred"].shape == scan.shape
        assert np.isfinite(np.asarray(out["ratios"])).all()

    def test_unpackbits_dev_roundtrip(self, rng):
        from dram_tpu.core.ops import unpackbits_u8_dev
        m = rng.uniform(size=(3, 7, 9)) > 0.4
        packed = np.packbits(m.reshape(-1))
        got = np.asarray(unpackbits_u8_dev(jnp.asarray(packed), m.shape))
        np.testing.assert_array_equal(got, m)

    def test_host_post_rule_matches_device_rule(self, model_and_params):
        """The hot (no-heatmap) path derives post by ANDing PACKED pred
        with the host candidate; the archive (heatmap) path ANDs the
        unpacked bits on device. Same scan -> identical post voxels
        inside the output window (AND commutes with MSB-first packing;
        reference post rule dram/job_runner.py:1008-1014)."""
        from dram_tpu.infer.fast import prep_scan_chunks
        model, params, batch_stats = model_and_params
        rng = np.random.default_rng(11)
        scan, lobe, *_ = _synth_scan(rng, (36, 44, 44),
                                     lesion_severity=[3, 4, 2, 5, 3])
        span = (-1000, -300)
        fast = FastScanPipeline(model, params, batch_stats, chunk_size=CHUNK,
                                windowing_span=span)
        prepc = prep_scan_chunks(scan, lobe, (1.2, 0.9, 0.9),
                                 windowing_span=span, chunk_size=CHUNK)
        host = fast.process_chunks(prepc, unpack=True)   # host AND
        dev = fast.process_chunks(prepc, unpack=True,
                                  want_heatmap=True)     # device AND
        assert host["masks_on_iso"] and not dev["masks_on_iso"]
        lo, oshape = dev["out_window"]
        sl = tuple(slice(l, l + s) for l, s in zip(lo, oshape))
        np.testing.assert_array_equal(host["post"][sl] > 0,
                                      dev["post"][sl] > 0)
        np.testing.assert_array_equal(host["pred"][sl] > 0,
                                      dev["pred"][sl] > 0)
        # packed post equals pack(unpacked post) on the iso grid
        pp = np.bitwise_and(np.asarray(host["pred_packed"]),
                            prepc["cand_bits"])
        np.testing.assert_array_equal(pp, host["post_packed"])


class TestGatherNearest:
    def test_matches_transform_nearest(self, rng):
        """gather_resize_nearest == T.Resample's nearest (mask-key)
        convention on the same crop->chunk geometry: the lobe chunk the
        model consumes must be NEAREST-resampled exactly like the
        reference preprocessing (the old linear>0.5 approximation
        differed by a one-voxel shell at lobe boundaries)."""
        import numpy as np
        from dram_tpu.data import transforms as T
        from dram_tpu.infer.fast import (forward_resize_weights,
                                         gather_resize_nearest)
        size = (13, 21, 17)
        out = (16, 16, 16)
        mask = (rng.uniform(size=size) > 0.5).astype(np.uint8)
        # bucket == crop (offset 0)
        fw = forward_resize_weights(np.array([size]), np.zeros((1, 3), int),
                                    out, size)
        got = np.asarray(gather_resize_nearest(
            mask[None].astype(np.float32), fw))[0]
        ret = T.Resample(mode="fixed_size", factor=1.0, size=out)(
            {"#image": np.zeros(size, np.int16),
             "#lobe_reference": mask,
             "meta": {"size": size, "spacing": (1.0, 1.0, 1.0)}})
        np.testing.assert_array_equal(got.astype(np.uint8),
                                      ret["#lobe_reference"])
