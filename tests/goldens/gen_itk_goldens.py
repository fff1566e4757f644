#!/usr/bin/env python3
"""Generate ITK-resampling golden fixtures (itk_goldens.npz).

The goldens anchor dram_tpu's resampler to ITK's documented resampling
semantics (reference dram/utils.py:299-434 uses SimpleITK; Dice parity
hinges on matching its linear/NN behaviour exactly). Two generators:

* `itk_resample_spec` — an independent, literal transcription of
  ITK ResampleImageFilter + Linear/NearestNeighborInterpolateImageFunction:
  identity transform/direction, shared origin, so the physical-point
  mapping collapses to per-axis continuous index c[d] = i[d] * scale[d];
  IsInsideBuffer is [-0.5, size-0.5) (end EXCLUSIVE); linear interpolation
  clamps neighbor indices to the image region; nearest uses
  Math::RoundHalfIntegerUp (floor(c + 0.5)). It deliberately shares no
  code with dram_tpu (8-corner gather here vs separable weight matrices
  there).
* When SimpleITK is importable (not in the TPU image), the script ALSO
  resamples every case with the real library — applying the z-y-x <-> x-y-z
  flip contract of the reference (utils.py:419-430) — and asserts the spec
  matches bit-for-bit before writing, hard-anchoring the fixtures.

Run from the repo root: python tests/goldens/gen_itk_goldens.py
"""

import os

import numpy as np


def itk_resample_spec(vol, in_spacing, out_spacing, out_size,
                      method="linear", fill=0.0):
    vol = np.asarray(vol, np.float64)
    scales = np.asarray(out_spacing, np.float64) / \
        np.asarray(in_spacing, np.float64)
    cs = [np.arange(out_size[d]) * scales[d] for d in range(3)]

    inside = np.ones(tuple(out_size), bool)
    for d in range(3):
        v = (cs[d] >= -0.5) & (cs[d] < vol.shape[d] - 0.5)
        inside &= v.reshape([-1 if i == d else 1 for i in range(3)])

    if method == "nearest":
        idx = [np.clip(np.floor(c + 0.5).astype(np.int64), 0,
                       vol.shape[d] - 1) for d, c in enumerate(cs)]
        out = vol[np.ix_(*idx)]
    elif method == "linear":
        lo = [np.floor(c).astype(np.int64) for c in cs]
        fr = [c - l for c, l in zip(cs, lo)]
        out = np.zeros(tuple(out_size), np.float64)
        for bz in (0, 1):
            for by in (0, 1):
                for bx in (0, 1):
                    iz = np.clip(lo[0] + bz, 0, vol.shape[0] - 1)
                    iy = np.clip(lo[1] + by, 0, vol.shape[1] - 1)
                    ix = np.clip(lo[2] + bx, 0, vol.shape[2] - 1)
                    wz = fr[0] if bz else 1.0 - fr[0]
                    wy = fr[1] if by else 1.0 - fr[1]
                    wx = fr[2] if bx else 1.0 - fr[2]
                    w = wz[:, None, None] * wy[None, :, None] * \
                        wx[None, None, :]
                    out += w * vol[np.ix_(iz, iy, ix)]
    else:
        raise ValueError(method)
    return np.where(inside, out, fill).astype(np.float32)


def sitk_resample(vol, in_spacing, out_spacing, out_size, method, fill):
    """Real-SimpleITK twin with the reference's z-y-x flip contract."""
    import SimpleITK as sitk
    img = sitk.GetImageFromArray(np.asarray(vol, np.float32))
    img.SetSpacing(tuple(float(s) for s in in_spacing[::-1]))  # x-y-z
    interp = sitk.sitkLinear if method == "linear" \
        else sitk.sitkNearestNeighbor
    out = sitk.Resample(
        img, [int(s) for s in out_size[::-1]], sitk.Transform(),
        interp, img.GetOrigin(),
        tuple(float(s) for s in out_spacing[::-1]),
        img.GetDirection(), float(fill), sitk.sitkFloat32)
    return sitk.GetArrayFromImage(out)


def cases():
    rng = np.random.default_rng(1234)
    v1 = (rng.normal(size=(9, 8, 7)) * 100).astype(np.float32)
    v2 = (rng.normal(size=(6, 5, 4)) * 100).astype(np.float32)
    v3 = (rng.normal(size=(5, 5, 5)) * 100).astype(np.float32)

    def ceil_size(shape, in_sp, out_sp):
        return tuple(int(np.ceil(s * i / o))
                     for s, i, o in zip(shape, in_sp, out_sp))

    out = []
    # anisotropic downsample to 1 mm iso (the test-pipeline hot case)
    in_sp = (2.5, 0.7, 1.3)
    size = ceil_size(v1.shape, in_sp, (1.0, 1.0, 1.0))
    out.append(("aniso_down_linear", v1, in_sp, (1.0, 1.0, 1.0), size,
                "linear", -2048.0))
    out.append(("aniso_down_nearest", v1, in_sp, (1.0, 1.0, 1.0), size,
                "nearest", 0.0))
    # upsample
    out_sp = (0.4, 0.5, 0.8)
    size = ceil_size(v2.shape, (1.0, 1.0, 1.0), out_sp)
    out.append(("up_linear", v2, (1.0, 1.0, 1.0), out_sp, size,
                "linear", 0.0))
    out.append(("up_nearest", v2, (1.0, 1.0, 1.0), out_sp, size,
                "nearest", 0.0))
    # buffer edge: out grid extends past the input; includes the EXACT
    # c == size-0.5 boundary point (scale 0.5, i=9 -> 4.5), which ITK
    # treats as OUTSIDE (IsInsideBuffer end-exclusive)
    out.append(("edge_exact_half_linear", v3, (1.0, 1.0, 1.0),
                (0.5, 1.0, 1.0), (12, 5, 5), "linear", -7.0))
    out.append(("edge_exact_half_nearest", v3, (1.0, 1.0, 1.0),
                (0.5, 1.0, 1.0), (12, 5, 5), "nearest", -7.0))
    # coarse fill: every other output row outside
    out.append(("coarse_fill_linear", v3, (1.0, 1.0, 1.0),
                (2.0, 2.0, 2.0), (5, 5, 5), "linear", -2048.0))
    return out


def main():
    try:
        import SimpleITK  # noqa: F401
        have_sitk = True
    except ImportError:
        have_sitk = False
    payload = {}
    for name, vol, in_sp, out_sp, size, method, fill in cases():
        golden = itk_resample_spec(vol, in_sp, out_sp, size, method, fill)
        if have_sitk:
            real = sitk_resample(vol, in_sp, out_sp, size, method, fill)
            np.testing.assert_allclose(golden, real, atol=1e-3, rtol=1e-5,
                                       err_msg=f"spec != SimpleITK: {name}")
            golden = real
        payload[f"{name}/vol"] = vol
        payload[f"{name}/in_spacing"] = np.asarray(in_sp, np.float64)
        payload[f"{name}/out_spacing"] = np.asarray(out_sp, np.float64)
        payload[f"{name}/out_size"] = np.asarray(size, np.int64)
        payload[f"{name}/method"] = np.asarray(method)
        payload[f"{name}/fill"] = np.asarray(fill, np.float64)
        payload[f"{name}/golden"] = golden
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "itk_goldens.npz")
    np.savez_compressed(path, **payload,
                        generated_with_simpleitk=np.asarray(have_sitk))
    print(f"wrote {path} ({len(cases())} cases, "
          f"SimpleITK verified: {have_sitk})")


if __name__ == "__main__":
    main()
