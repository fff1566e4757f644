// Native host-prep kernels: ITK-semantics iso resampling + wire packing.
//
// The Python data layer (dram_tpu/data/hostprep.py) calls these through
// ctypes for the prep->device hot path; the NumPy implementations remain
// as the portable fallback and the parity oracle (tests compare both).
//
// Semantics mirror core/resample.py: output voxel centers map to input
// continuous index src = i_out * scale per axis; linear interpolation with
// fill outside [-0.5, size-0.5); nearest = round-half-up. OpenMP over the
// output z axis.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct AxisTable {
    std::vector<int32_t> lo, hi;
    std::vector<float> frac;   // weight of hi
    std::vector<uint8_t> valid;
};

AxisTable make_axis(int in_size, int out_size, double scale, bool nearest,
                    int out_off = 0) {
    AxisTable t;
    t.lo.resize(out_size);
    t.hi.resize(out_size);
    t.frac.resize(out_size);
    t.valid.resize(out_size);
    for (int i = 0; i < out_size; ++i) {
        double src = (double)(i + out_off) * scale;
        // ITK IsInsideBuffer: [-0.5, size-0.5), end exclusive
        bool valid = (src >= -0.5) && (src < in_size - 0.5);
        t.valid[i] = valid ? 1 : 0;
        if (nearest) {
            int idx = (int)std::floor(src + 0.5);
            if (idx < 0) idx = 0;
            if (idx > in_size - 1) idx = in_size - 1;
            t.lo[i] = idx;
            t.hi[i] = idx;
            t.frac[i] = 0.f;
        } else {
            double s = src < 0 ? 0 : (src > in_size - 1 ? in_size - 1 : src);
            int lo = (int)std::floor(s);
            int hi = lo + 1 > in_size - 1 ? in_size - 1 : lo + 1;
            t.lo[i] = lo;
            t.hi[i] = hi;
            t.frac[i] = (float)(s - lo);
        }
    }
    return t;
}

// x-lerp one input row to oW floats — the only gathering loop of the
// plane-cache resample; everything downstream is contiguous and
// auto-vectorizes. Values match the naive 8-tap math bit-exactly: int16
// source values are exactly representable in f32, so computing the x
// lerp once and reusing it produces the identical f32 expression tree.
template <typename T>
inline void xlerp_row(const T* src, const AxisTable& tx, int oW,
                      float* out) {
    const int32_t* lo = tx.lo.data();
    const int32_t* hi = tx.hi.data();
    const float* fr = tx.frac.data();
    for (int x = 0; x < oW; ++x) {
        const float a = (float)src[lo[x]];
        out[x] = a + fr[x] * ((float)src[hi[x]] - a);
    }
}

// xy-lerped plane of input z index zi. A 2-slot x-lerped row cache
// exploits the monotone y source indices so each input row is x-lerped
// once per plane.
template <typename T>
void build_plane(const T* in, int64_t HW, int W, int zi,
                 const AxisTable& ty, const AxisTable& tx,
                 int oH, int oW, float* P, float* rowa, float* rowb) {
    const T* plane = in + (int64_t)zi * HW;
    int ia = -1, ib = -1;
    auto ensure = [&](int yi) -> const float* {
        if (yi == ia) return rowa;
        if (yi == ib) return rowb;
        if (ia < ib) {  // evict the older (smaller) index
            xlerp_row(plane + (int64_t)yi * W, tx, oW, rowa);
            ia = yi;
            return rowa;
        }
        xlerp_row(plane + (int64_t)yi * W, tx, oW, rowb);
        ib = yi;
        return rowb;
    };
    for (int y = 0; y < oH; ++y) {
        const float fy = ty.frac[y];
        const float* r0 = ensure(ty.lo[y]);
        const float* r1 = ensure(ty.hi[y]);
        float* op = P + (int64_t)y * oW;
        for (int x = 0; x < oW; ++x)
            op[x] = r0[x] + fy * (r1[x] - r0[x]);
    }
}

// Shared trilinear resample: plane-cached separable evaluation, serial z
// (the deploy host has one core; the z-plane cache depends on in-order
// traversal). ROUND selects int16 rounding vs raw float stores. EPI is a
// per-output-row epilogue (row pointer + flat row index) run while the
// row is still cache-hot — the w8+hist wire fuses there.
template <typename T, bool ROUND, typename EPI>
void resample_linear_impl(const T* in, int D, int H, int W,
                          double sz, double sy, double sx,
                          int offz, int offy, int offx,
                          int oD, int oH, int oW, double fill, T* out,
                          EPI epi) {
    AxisTable tz = make_axis(D, oD, sz, false, offz);
    AxisTable ty = make_axis(H, oH, sy, false, offy);
    AxisTable tx = make_axis(W, oW, sx, false, offx);
    const int64_t HW = (int64_t)H * W;
    const int64_t oHW = (int64_t)oH * oW;
    const T tfill = (T)fill;

    // contiguous valid spans (src coords are monotone in the index)
    int ya = 0, yb = oH, xa = 0, xb = oW;
    while (ya < oH && !ty.valid[ya]) ++ya;
    while (yb > ya && !ty.valid[yb - 1]) --yb;
    while (xa < oW && !tx.valid[xa]) ++xa;
    while (xb > xa && !tx.valid[xb - 1]) --xb;

    std::vector<float> P0((size_t)oHW), P1((size_t)oHW);
    std::vector<float> rowa(oW), rowb(oW);
    int c0 = -1, c1 = -1;

    for (int z = 0; z < oD; ++z) {
        T* orow = out + (int64_t)z * oHW;
        if (!tz.valid[z]) {
            for (int y = 0; y < oH; ++y) {
                T* op = orow + (int64_t)y * oW;
                for (int x = 0; x < oW; ++x) op[x] = tfill;
                epi(op, (int64_t)z * oH + y);
            }
            continue;
        }
        const int z0 = tz.lo[z], z1 = tz.hi[z];
        const float fz = tz.frac[z];
        if (c0 != z0) {
            if (c1 == z0) {
                std::swap(P0, P1);
                std::swap(c0, c1);
            } else {
                build_plane(in, HW, W, z0, ty, tx, oH, oW, P0.data(),
                            rowa.data(), rowb.data());
                c0 = z0;
            }
        }
        const float* A = P0.data();
        const float* B;
        if (z1 == z0) {
            B = A;
        } else {
            if (c1 != z1) {
                build_plane(in, HW, W, z1, ty, tx, oH, oW, P1.data(),
                            rowa.data(), rowb.data());
                c1 = z1;
            }
            B = P1.data();
        }
        for (int y = 0; y < oH; ++y) {
            T* op = orow + (int64_t)y * oW;
            if (y < ya || y >= yb) {
                for (int x = 0; x < oW; ++x) op[x] = tfill;
                epi(op, (int64_t)z * oH + y);
                continue;
            }
            for (int x = 0; x < xa; ++x) op[x] = tfill;
            const float* a = A + (int64_t)y * oW;
            const float* b = B + (int64_t)y * oW;
            if (ROUND) {
                for (int x = xa; x < xb; ++x)
                    op[x] = (T)std::lrintf(a[x] + fz * (b[x] - a[x]));
            } else {
                for (int x = xa; x < xb; ++x)
                    op[x] = (T)(a[x] + fz * (b[x] - a[x]));
            }
            for (int x = xb; x < oW; ++x) op[x] = tfill;
            epi(op, (int64_t)z * oH + y);
        }
    }
}

struct NoEpi {
    template <typename T>
    void operator()(const T*, int64_t) const {}
};

}  // namespace

extern "C" {

// Trilinear resample int16 -> int16 (rounded), fill for outside points.
void resample_iso_linear_i16(const int16_t* in, int D, int H, int W,
                             double sz, double sy, double sx,
                             int oD, int oH, int oW,
                             double fill, int16_t* out) {
    resample_linear_impl<int16_t, true>(in, D, H, W, sz, sy, sx, 0, 0, 0,
                                        oD, oH, oW, fill, out, NoEpi());
}

// Window variant: emits only the output block starting at (offz, offy,
// offx) of the virtual full output grid — the prep path resamples the
// scan only inside the lung crop.
void resample_window_linear_i16(const int16_t* in, int D, int H, int W,
                                double sz, double sy, double sx,
                                int offz, int offy, int offx,
                                int oD, int oH, int oW,
                                double fill, int16_t* out) {
    resample_linear_impl<int16_t, true>(in, D, H, W, sz, sy, sx,
                                        offz, offy, offx,
                                        oD, oH, oW, fill, out, NoEpi());
}

// Trilinear resample float32 -> float32 (windowed images in the host
// transform pipeline), fill for outside points.
void resample_iso_linear_f32(const float* in, int D, int H, int W,
                             double sz, double sy, double sx,
                             int oD, int oH, int oW,
                             double fill, float* out) {
    resample_linear_impl<float, false>(in, D, H, W, sz, sy, sx, 0, 0, 0,
                                       oD, oH, oW, fill, out, NoEpi());
}

void window8_hist_i16(const int16_t* scan, const uint8_t* lobe, int64_t n,
                      double w_lo, double w_hi, uint8_t* u8_out,
                      int64_t* hist256);  // defined below

// Fused window-resample + u8 windowing + lung-masked histogram: one pass
// emits the cropped iso scan (i16), its windowed-u8 twin and the 256-bin
// Otsu histogram, replacing a separate full re-read of the crop
// (window8_hist). Outputs are bit-identical to the two-pass sequence:
// the u8 LUT is indexed by the already-rounded i16 value.
void resample_window_w8hist_i16(const int16_t* in, int D, int H, int W,
                                double sz, double sy, double sx,
                                int offz, int offy, int offx,
                                int oD, int oH, int oW,
                                double fill, double w_lo, double w_hi,
                                const uint8_t* lobe_c, int16_t* out,
                                uint8_t* u8_out, int64_t* hist256) {
    const float inv = (float)(255.0 / (w_hi - w_lo));
    const float flo = (float)w_lo, fhi = (float)w_hi;
    std::vector<uint8_t> lut(65536);
    for (int v16 = -32768; v16 < 32768; ++v16) {
        float v = (float)v16;
        if (v < flo) v = flo;
        if (v > fhi) v = fhi;
        lut[(uint16_t)(int16_t)v16] =
            (uint8_t)std::nearbyintf((v - flo) * inv);
    }
    std::memset(hist256, 0, 256 * sizeof(int64_t));
    const uint8_t* lutp = lut.data();
    auto epi = [=](const int16_t* row, int64_t ri) {
        uint8_t* u8row = u8_out + ri * oW;
        const uint8_t* lrow = lobe_c + ri * oW;
        for (int x = 0; x < oW; ++x) {
            const uint8_t u = lutp[(uint16_t)row[x]];
            u8row[x] = u;
            hist256[u] += (int64_t)(lrow[x] > 0);
        }
    };
    resample_linear_impl<int16_t, true>(in, D, H, W, sz, sy, sx,
                                        offz, offy, offx,
                                        oD, oH, oW, fill, out, epi);
}

// Per-label bbox over the nearest-sampled iso subgrid WITHOUT
// materializing the resampled volume: bbox(subgrid) == bbox of
// resample_iso_nearest_u8's output by construction (same axis tables).
void subgrid_bboxes_u8(const uint8_t* lobe, int D, int H, int W,
                       double sz, double sy, double sx,
                       int oD, int oH, int oW,
                       int n_labels, int32_t* mins, int32_t* maxs) {
    AxisTable tz = make_axis(D, oD, sz, true);
    AxisTable ty = make_axis(H, oH, sy, true);
    AxisTable tx = make_axis(W, oW, sx, true);
    for (int l = 0; l < n_labels; ++l)
        for (int ax = 0; ax < 3; ++ax) {
            mins[l * 3 + ax] = INT32_MAX;
            maxs[l * 3 + ax] = -1;
        }
    const int64_t HW = (int64_t)H * W;
    for (int z = 0; z < oD; ++z) {
        if (!tz.valid[z]) continue;
        const uint8_t* plane = lobe + (int64_t)tz.lo[z] * HW;
        for (int y = 0; y < oH; ++y) {
            if (!ty.valid[y]) continue;
            const uint8_t* row = plane + (int64_t)ty.lo[y] * W;
            for (int x = 0; x < oW; ++x) {
                const int l =
                    (tx.valid[x] ? row[tx.lo[x]] : 0) - 1;
                if (l < 0 || l >= n_labels) continue;
                int32_t* mn = mins + l * 3;
                int32_t* mx = maxs + l * 3;
                if (z < mn[0]) mn[0] = z;
                if (z > mx[0]) mx[0] = z;
                if (y < mn[1]) mn[1] = y;
                if (y > mx[1]) mx[1] = y;
                if (x < mn[2]) mn[2] = x;
                if (x > mx[2]) mx[2] = x;
            }
        }
    }
}

// Windowed nearest resample u8 -> u8 (labels inside the lung crop only).
void resample_window_nearest_u8(const uint8_t* in, int D, int H, int W,
                                double sz, double sy, double sx,
                                int offz, int offy, int offx,
                                int oD, int oH, int oW, uint8_t* out) {
    AxisTable tz = make_axis(D, oD, sz, true, offz);
    AxisTable ty = make_axis(H, oH, sy, true, offy);
    AxisTable tx = make_axis(W, oW, sx, true, offx);
    const int64_t HW = (int64_t)H * W;
    const int64_t oHW = (int64_t)oH * oW;
    for (int z = 0; z < oD; ++z) {
        uint8_t* orow = out + (int64_t)z * oHW;
        if (!tz.valid[z]) {
            std::memset(orow, 0, oHW);
            continue;
        }
        const uint8_t* slab = in + (int64_t)tz.lo[z] * HW;
        for (int y = 0; y < oH; ++y) {
            uint8_t* op = orow + (int64_t)y * oW;
            if (!ty.valid[y]) {
                std::memset(op, 0, oW);
                continue;
            }
            const uint8_t* row = slab + (int64_t)ty.lo[y] * W;
            for (int x = 0; x < oW; ++x)
                op[x] = tx.valid[x] ? row[tx.lo[x]] : 0;
        }
    }
}

// Nearest resample uint8 -> uint8 (labels), 0 outside.
void resample_iso_nearest_u8(const uint8_t* in, int D, int H, int W,
                             double sz, double sy, double sx,
                             int oD, int oH, int oW, uint8_t* out) {
    AxisTable tz = make_axis(D, oD, sz, true);
    AxisTable ty = make_axis(H, oH, sy, true);
    AxisTable tx = make_axis(W, oW, sx, true);
    const int64_t HW = (int64_t)H * W;
    const int64_t oHW = (int64_t)oH * oW;
#pragma omp parallel for schedule(static)
    for (int z = 0; z < oD; ++z) {
        uint8_t* orow = out + (int64_t)z * oHW;
        if (!tz.valid[z]) {
            std::memset(orow, 0, oHW);
            continue;
        }
        const uint8_t* slab = in + (int64_t)tz.lo[z] * HW;
        for (int y = 0; y < oH; ++y) {
            uint8_t* op = orow + (int64_t)y * oW;
            if (!ty.valid[y]) {
                std::memset(op, 0, oW);
                continue;
            }
            const uint8_t* row = slab + (int64_t)ty.lo[y] * W;
            for (int x = 0; x < oW; ++x)
                op[x] = tx.valid[x] ? row[tx.lo[x]] : 0;
        }
    }
}

// 12-bit wire packing of int16 HU values (clipped to [-2048, 2047]).
void pack12_i16(const int16_t* in, int64_t n, uint8_t* out) {
    const int64_t pairs = (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < pairs; ++p) {
        int32_t v0 = in[2 * p];
        int32_t v1 = (2 * p + 1 < n) ? in[2 * p + 1] : -2048;
        if (v0 < -2048) v0 = -2048;
        if (v0 > 2047) v0 = 2047;
        if (v1 < -2048) v1 = -2048;
        if (v1 > 2047) v1 = 2047;
        const uint32_t u0 = (uint32_t)(v0 + 2048);
        const uint32_t u1 = (uint32_t)(v1 + 2048);
        out[3 * p] = (uint8_t)(u0 >> 4);
        out[3 * p + 1] = (uint8_t)(((u0 & 0xF) << 4) | (u1 >> 8));
        out[3 * p + 2] = (uint8_t)(u1 & 0xFF);
    }
}

// 4-bit packing of labels (0..15).
void pack4_u8(const uint8_t* in, int64_t n, uint8_t* out) {
    const int64_t pairs = (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < pairs; ++p) {
        const uint8_t l0 = in[2 * p] & 0xF;
        const uint8_t l1 = (2 * p + 1 < n) ? (in[2 * p + 1] & 0xF) : 0;
        out[p] = (uint8_t)((l0 << 4) | l1);
    }
}

// ---------------------------------------------------------------------
// Chunk-wire prep kernels (dram_tpu/infer/fast.py prep_scan_chunks): the
// whole per-lobe chunk extraction runs here so the prep thread holds no
// GIL and allocates no NumPy temporaries — on single-core deploy hosts
// the Python version starved the dispatch loop.
// ---------------------------------------------------------------------

// Per-label inclusive bbox over the label volume, one pass.
// mins/maxs are (n_labels, 3); labels are 1..n_labels; a label with no
// voxels keeps min > max.
void lobe_bboxes_u8(const uint8_t* lobe, int D, int H, int W,
                    int n_labels, int32_t* mins, int32_t* maxs) {
    for (int l = 0; l < n_labels; ++l)
        for (int ax = 0; ax < 3; ++ax) {
            mins[l * 3 + ax] = INT32_MAX;
            maxs[l * 3 + ax] = -1;
        }
    // word-scan: lobe volumes are mostly zero, so rows are skipped at
    // 8 bytes per test; only nonzero words fall to the byte loop
    for (int z = 0; z < D; ++z)
        for (int y = 0; y < H; ++y) {
            const uint8_t* row = lobe + ((int64_t)z * H + y) * W;
            int x = 0;
            for (; x + 8 <= W; x += 8) {
                uint64_t w8;
                std::memcpy(&w8, row + x, 8);
                if (w8 == 0) continue;
                for (int k = 0; k < 8; ++k) {
                    const int l = row[x + k] - 1;
                    if (l < 0 || l >= n_labels) continue;
                    int32_t* mn = mins + l * 3;
                    int32_t* mx = maxs + l * 3;
                    if (z < mn[0]) mn[0] = z;
                    if (z > mx[0]) mx[0] = z;
                    if (y < mn[1]) mn[1] = y;
                    if (y > mx[1]) mx[1] = y;
                    if (x + k < mn[2]) mn[2] = x + k;
                    if (x + k > mx[2]) mx[2] = x + k;
                }
            }
            for (; x < W; ++x) {
                const int l = row[x] - 1;
                if (l < 0 || l >= n_labels) continue;
                int32_t* mn = mins + l * 3;
                int32_t* mx = maxs + l * 3;
                if (z < mn[0]) mn[0] = z;
                if (z > mx[0]) mx[0] = z;
                if (y < mn[1]) mn[1] = y;
                if (y > mx[1]) mx[1] = y;
                if (x < mn[2]) mn[2] = x;
                if (x > mx[2]) mx[2] = x;
            }
        }
}

// Contiguous copy of a crop window (replaces a slow NumPy strided copy
// in the prep path: ~250 ms -> memcpy speed for a 26 MB crop).
void crop_copy_u8(const uint8_t* in, int D, int H, int W,
                  int loz, int loy, int lox,
                  int od, int oh, int ow, uint8_t* out) {
    (void)D;
    for (int z = 0; z < od; ++z)
        for (int y = 0; y < oh; ++y)
            std::memcpy(out + ((int64_t)z * oh + y) * ow,
                        in + (((int64_t)(loz + z) * H + (loy + y)) * W
                              + lox),
                        (size_t)ow);
}

// Windowed-u8 lerp table for one axis of the fw chunk resize
// (fast.py _src_to_gather on the lobe's own crop): src = i*size/out,
// clipped to [0, size-1].
static void chunk_axis(int size, int out, int lo0, int32_t* lo,
                       int32_t* hi, float* fr) {
    for (int i = 0; i < out; ++i) {
        double src = (double)i * size / out;
        if (src < 0) src = 0;
        if (src > size - 1) src = size - 1;
        int l = (int)std::floor(src);
        int h = l + 1 > size - 1 ? size - 1 : l + 1;
        lo[i] = lo0 + l;
        hi[i] = lo0 + h;
        fr[i] = (float)(src - l);
    }
}

// One lobe's model chunk: value = (lobe == label) ? window8(scan) : 0 at
// full res, trilinear-resized from the lobe bbox (lo3, size3) to
// (cd, ch, cw), emitted as u8 (wire quantization).
void extract_chunk_w8(const int16_t* scan, const uint8_t* lobe,
                      int D, int H, int W, int label,
                      const int32_t* lo3, const int32_t* size3,
                      double w_lo, double w_hi,
                      int cd, int ch, int cw, uint8_t* out) {
    (void)D;
    std::vector<int32_t> zlo(cd), zhi(cd), ylo(ch), yhi(ch), xlo(cw), xhi(cw);
    std::vector<float> zf(cd), yf(ch), xf(cw);
    chunk_axis(size3[0], cd, lo3[0], zlo.data(), zhi.data(), zf.data());
    chunk_axis(size3[1], ch, lo3[1], ylo.data(), yhi.data(), yf.data());
    chunk_axis(size3[2], cw, lo3[2], xlo.data(), xhi.data(), xf.data());
    const float inv = (float)(255.0 / (w_hi - w_lo));
    const float flo = (float)w_lo, fhi = (float)w_hi;

    auto val = [&](int z, int y, int x) -> float {
        const int64_t i = ((int64_t)z * H + y) * W + x;
        if (lobe[i] != label) return 0.f;
        float v = (float)scan[i];
        if (v < flo) v = flo;
        if (v > fhi) v = fhi;
        return std::nearbyintf((v - flo) * inv);
    };

#pragma omp parallel for schedule(static)
    for (int z = 0; z < cd; ++z) {
        const float wz = zf[z];
        for (int y = 0; y < ch; ++y) {
            const float wy = yf[y];
            uint8_t* orow = out + ((int64_t)z * ch + y) * cw;
            for (int x = 0; x < cw; ++x) {
                const float wx = xf[x];
                const float v000 = val(zlo[z], ylo[y], xlo[x]);
                const float v001 = val(zlo[z], ylo[y], xhi[x]);
                const float v010 = val(zlo[z], yhi[y], xlo[x]);
                const float v011 = val(zlo[z], yhi[y], xhi[x]);
                const float v100 = val(zhi[z], ylo[y], xlo[x]);
                const float v101 = val(zhi[z], ylo[y], xhi[x]);
                const float v110 = val(zhi[z], yhi[y], xlo[x]);
                const float v111 = val(zhi[z], yhi[y], xhi[x]);
                const float v00 = v000 * (1.f - wx) + v001 * wx;
                const float v01 = v010 * (1.f - wx) + v011 * wx;
                const float v10 = v100 * (1.f - wx) + v101 * wx;
                const float v11 = v110 * (1.f - wx) + v111 * wx;
                const float v0 = v00 * (1.f - wy) + v01 * wy;
                const float v1 = v10 * (1.f - wy) + v11 * wy;
                float r = v0 * (1.f - wz) + v1 * wz;
                r = std::nearbyintf(r);
                if (r < 0.f) r = 0.f;
                if (r > 255.f) r = 255.f;
                orow[x] = (uint8_t)r;
            }
        }
    }
}

// Windowed-u8 wire + lung-masked 256-bin histogram in one pass (the
// histogram feeds the host Otsu for the intensity post rule).
void window8_hist_i16(const int16_t* scan, const uint8_t* lobe, int64_t n,
                      double w_lo, double w_hi, uint8_t* u8_out,
                      int64_t* hist256) {
    const float inv = (float)(255.0 / (w_hi - w_lo));
    const float flo = (float)w_lo, fhi = (float)w_hi;
    // 64K-entry LUT over the full int16 range replaces the per-voxel
    // clamp + nearbyint (identical rounding: the LUT is built with the
    // exact per-voxel math)
    static_assert(sizeof(int16_t) == 2, "int16 LUT");
    std::vector<uint8_t> lut(65536);
    for (int v16 = -32768; v16 < 32768; ++v16) {
        float v = (float)v16;
        if (v < flo) v = flo;
        if (v > fhi) v = fhi;
        lut[(uint16_t)(int16_t)v16] =
            (uint8_t)std::nearbyintf((v - flo) * inv);
    }
    std::memset(hist256, 0, 256 * sizeof(int64_t));
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t u = lut[(uint16_t)scan[i]];
        u8_out[i] = u;
        hist256[u] += (int64_t)(lobe[i] > 0);
    }
}

// Post-rule candidate, packed MSB-first: (u8 > th) && !vessel.
void cand_bits_u8(const uint8_t* u8, const uint8_t* vessel, int64_t n,
                  double th, uint8_t* bits) {
    const int64_t bytes = (n + 7) / 8;
    // integer threshold with identical semantics: (float)u > th for u8 u
    // is u >= uth where uth is the smallest u8 strictly above th
    const double fl = std::floor(th);
    int ith = (int)fl + 1;  // works for fractional and integer th alike
    if (th < 0) ith = 0;
    if (ith > 256) ith = 256;  // nothing passes
    const int64_t full = n / 8;
    if (vessel == nullptr) {
        for (int64_t b = 0; b < full; ++b) {
            const uint8_t* p = u8 + b * 8;
            bits[b] = (uint8_t)(((p[0] >= ith) << 7) | ((p[1] >= ith) << 6)
                                | ((p[2] >= ith) << 5) | ((p[3] >= ith) << 4)
                                | ((p[4] >= ith) << 3) | ((p[5] >= ith) << 2)
                                | ((p[6] >= ith) << 1) | (p[7] >= ith));
        }
    } else {
        for (int64_t b = 0; b < full; ++b) {
            const uint8_t* p = u8 + b * 8;
            const uint8_t* v = vessel + b * 8;
            uint8_t acc = 0;
            for (int k = 0; k < 8; ++k)
                acc |= (uint8_t)(((p[k] >= ith) & (v[k] == 0)) << (7 - k));
            bits[b] = acc;
        }
    }
    for (int64_t b = full; b < bytes; ++b) {
        uint8_t acc = 0;
        const int64_t base = b * 8;
        const int64_t lim = n - base;
        for (int64_t k = 0; k < lim; ++k) {
            const int64_t i = base + k;
            const bool c = (u8[i] >= ith) &&
                           (vessel == nullptr || vessel[i] == 0);
            if (c) acc |= (uint8_t)(0x80u >> k);
        }
        bits[b] = acc;
    }
}

// Per-lobe bucket masks (lobe == label within the bucket window starting
// at starts[l]), packed MSB-first over the flat (n_labels, bd, bh, bw).
void lobe_bucket_bits_u8(const uint8_t* lobe, int D, int H, int W,
                         const int32_t* starts, int bd, int bh, int bw,
                         int n_labels, uint8_t* bits) {
    (void)D;
    const int64_t per = (int64_t)bd * bh * bw;
    const int64_t total = per * n_labels;
    const int64_t bytes = (total + 7) / 8;
    if (bw % 8 == 0) {
        // fast path (bucket dims are multiples of 16 in practice): every
        // (l, z, y) row is byte-aligned — straight row-major bit packing,
        // no per-bit index arithmetic
        for (int l = 0; l < n_labels; ++l) {
            const uint8_t lab = (uint8_t)(l + 1);
            const int sz = starts[l * 3], sy = starts[l * 3 + 1],
                      sx = starts[l * 3 + 2];
            uint8_t* ob = bits + (int64_t)l * per / 8;
            for (int z = 0; z < bd; ++z)
                for (int y = 0; y < bh; ++y) {
                    const uint8_t* src = lobe +
                        ((int64_t)(sz + z) * H + (sy + y)) * W + sx;
                    for (int xb = 0; xb < bw / 8; ++xb) {
                        const uint8_t* p = src + xb * 8;
                        *ob++ = (uint8_t)(
                            ((p[0] == lab) << 7) | ((p[1] == lab) << 6) |
                            ((p[2] == lab) << 5) | ((p[3] == lab) << 4) |
                            ((p[4] == lab) << 3) | ((p[5] == lab) << 2) |
                            ((p[6] == lab) << 1) | (p[7] == lab));
                    }
                }
        }
        return;
    }
    for (int64_t b = 0; b < bytes; ++b) {
        uint8_t acc = 0;
        const int64_t base = b * 8;
        const int64_t lim = (base + 8 < total) ? 8 : total - base;
        for (int64_t k = 0; k < lim; ++k) {
            const int64_t fi = base + k;
            const int l = (int)(fi / per);
            const int64_t r = fi % per;
            const int z = (int)(r / ((int64_t)bh * bw));
            const int64_t r2 = r % ((int64_t)bh * bw);
            const int y = (int)(r2 / bw);
            const int x = (int)(r2 % bw);
            const int64_t src = ((int64_t)(starts[l * 3] + z) * H +
                                 (starts[l * 3 + 1] + y)) * W +
                                (starts[l * 3 + 2] + x);
            if (lobe[src] == l + 1) acc |= (uint8_t)(0x80u >> k);
        }
        bits[b] = acc;
    }
}

// MSB-first bit unpacking (np.unpackbits) for mask D2H decode.
void unpackbits_u8(const uint8_t* in, int64_t n_bytes, uint8_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_bytes; ++i) {
        const uint8_t b = in[i];
        uint8_t* o = out + i * 8;
        o[0] = (b >> 7) & 1; o[1] = (b >> 6) & 1;
        o[2] = (b >> 5) & 1; o[3] = (b >> 4) & 1;
        o[4] = (b >> 3) & 1; o[5] = (b >> 2) & 1;
        o[6] = (b >> 1) & 1; o[7] = b & 1;
    }
}

}  // extern "C"
