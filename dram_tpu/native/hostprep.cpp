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

}  // namespace

extern "C" {

// Trilinear resample int16 -> int16 (rounded), fill for outside points.
void resample_iso_linear_i16(const int16_t* in, int D, int H, int W,
                             double sz, double sy, double sx,
                             int oD, int oH, int oW,
                             double fill, int16_t* out) {
    AxisTable tz = make_axis(D, oD, sz, false);
    AxisTable ty = make_axis(H, oH, sy, false);
    AxisTable tx = make_axis(W, oW, sx, false);
    const int64_t HW = (int64_t)H * W;
    const int64_t oHW = (int64_t)oH * oW;
#pragma omp parallel for schedule(static)
    for (int z = 0; z < oD; ++z) {
        const int z0 = tz.lo[z], z1 = tz.hi[z];
        const float fz = tz.frac[z];
        int16_t* orow = out + (int64_t)z * oHW;
        if (!tz.valid[z]) {
            for (int64_t i = 0; i < oHW; ++i) orow[i] = (int16_t)fill;
            continue;
        }
        for (int y = 0; y < oH; ++y) {
            const int y0 = ty.lo[y], y1 = ty.hi[y];
            const float fy = ty.frac[y];
            const bool vy = ty.valid[y];
            const int16_t* p00 = in + (int64_t)z0 * HW + (int64_t)y0 * W;
            const int16_t* p01 = in + (int64_t)z0 * HW + (int64_t)y1 * W;
            const int16_t* p10 = in + (int64_t)z1 * HW + (int64_t)y0 * W;
            const int16_t* p11 = in + (int64_t)z1 * HW + (int64_t)y1 * W;
            int16_t* op = orow + (int64_t)y * oW;
            for (int x = 0; x < oW; ++x) {
                if (!vy || !tx.valid[x]) {
                    op[x] = (int16_t)fill;
                    continue;
                }
                const int x0 = tx.lo[x], x1 = tx.hi[x];
                const float fx = tx.frac[x];
                const float v00 = p00[x0] + fx * (p00[x1] - p00[x0]);
                const float v01 = p01[x0] + fx * (p01[x1] - p01[x0]);
                const float v10 = p10[x0] + fx * (p10[x1] - p10[x0]);
                const float v11 = p11[x0] + fx * (p11[x1] - p11[x0]);
                const float v0 = v00 + fy * (v01 - v00);
                const float v1 = v10 + fy * (v11 - v10);
                op[x] = (int16_t)std::lrintf(v0 + fz * (v1 - v0));
            }
        }
    }
}

// Window variant: emits only the output block starting at (offz, offy,
// offx) of the virtual full output grid — the prep path resamples the
// scan only inside the lung crop.
void resample_window_linear_i16(const int16_t* in, int D, int H, int W,
                                double sz, double sy, double sx,
                                int offz, int offy, int offx,
                                int oD, int oH, int oW,
                                double fill, int16_t* out) {
    AxisTable tz = make_axis(D, oD, sz, false, offz);
    AxisTable ty = make_axis(H, oH, sy, false, offy);
    AxisTable tx = make_axis(W, oW, sx, false, offx);
    const int64_t HW = (int64_t)H * W;
    const int64_t oHW = (int64_t)oH * oW;
#pragma omp parallel for schedule(static)
    for (int z = 0; z < oD; ++z) {
        const int z0 = tz.lo[z], z1 = tz.hi[z];
        const float fz = tz.frac[z];
        int16_t* orow = out + (int64_t)z * oHW;
        if (!tz.valid[z]) {
            for (int64_t i = 0; i < oHW; ++i) orow[i] = (int16_t)fill;
            continue;
        }
        for (int y = 0; y < oH; ++y) {
            const int y0 = ty.lo[y], y1 = ty.hi[y];
            const float fy = ty.frac[y];
            const bool vy = ty.valid[y];
            const int16_t* p00 = in + (int64_t)z0 * HW + (int64_t)y0 * W;
            const int16_t* p01 = in + (int64_t)z0 * HW + (int64_t)y1 * W;
            const int16_t* p10 = in + (int64_t)z1 * HW + (int64_t)y0 * W;
            const int16_t* p11 = in + (int64_t)z1 * HW + (int64_t)y1 * W;
            int16_t* op = orow + (int64_t)y * oW;
            for (int x = 0; x < oW; ++x) {
                if (!vy || !tx.valid[x]) {
                    op[x] = (int16_t)fill;
                    continue;
                }
                const int x0 = tx.lo[x], x1 = tx.hi[x];
                const float fx = tx.frac[x];
                const float v00 = p00[x0] + fx * (p00[x1] - p00[x0]);
                const float v01 = p01[x0] + fx * (p01[x1] - p01[x0]);
                const float v10 = p10[x0] + fx * (p10[x1] - p10[x0]);
                const float v11 = p11[x0] + fx * (p11[x1] - p11[x0]);
                const float v0 = v00 + fy * (v01 - v00);
                const float v1 = v10 + fy * (v11 - v10);
                op[x] = (int16_t)std::lrintf(v0 + fz * (v1 - v0));
            }
        }
    }
}

// Trilinear resample float32 -> float32 (windowed images in the host
// transform pipeline), fill for outside points.
void resample_iso_linear_f32(const float* in, int D, int H, int W,
                             double sz, double sy, double sx,
                             int oD, int oH, int oW,
                             double fill, float* out) {
    AxisTable tz = make_axis(D, oD, sz, false);
    AxisTable ty = make_axis(H, oH, sy, false);
    AxisTable tx = make_axis(W, oW, sx, false);
    const int64_t HW = (int64_t)H * W;
    const int64_t oHW = (int64_t)oH * oW;
#pragma omp parallel for schedule(static)
    for (int z = 0; z < oD; ++z) {
        const int z0 = tz.lo[z], z1 = tz.hi[z];
        const float fz = tz.frac[z];
        float* orow = out + (int64_t)z * oHW;
        if (!tz.valid[z]) {
            for (int64_t i = 0; i < oHW; ++i) orow[i] = (float)fill;
            continue;
        }
        for (int y = 0; y < oH; ++y) {
            const int y0 = ty.lo[y], y1 = ty.hi[y];
            const float fy = ty.frac[y];
            const bool vy = ty.valid[y];
            const float* p00 = in + (int64_t)z0 * HW + (int64_t)y0 * W;
            const float* p01 = in + (int64_t)z0 * HW + (int64_t)y1 * W;
            const float* p10 = in + (int64_t)z1 * HW + (int64_t)y0 * W;
            const float* p11 = in + (int64_t)z1 * HW + (int64_t)y1 * W;
            float* op = orow + (int64_t)y * oW;
            for (int x = 0; x < oW; ++x) {
                if (!vy || !tx.valid[x]) {
                    op[x] = (float)fill;
                    continue;
                }
                const int x0 = tx.lo[x], x1 = tx.hi[x];
                const float fx = tx.frac[x];
                const float v00 = p00[x0] + fx * (p00[x1] - p00[x0]);
                const float v01 = p01[x0] + fx * (p01[x1] - p01[x0]);
                const float v10 = p10[x0] + fx * (p10[x1] - p10[x0]);
                const float v11 = p11[x0] + fx * (p11[x1] - p11[x0]);
                const float v0 = v00 + fy * (v01 - v00);
                const float v1 = v10 + fy * (v11 - v10);
                op[x] = v0 + fz * (v1 - v0);
            }
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
    for (int z = 0; z < D; ++z)
        for (int y = 0; y < H; ++y) {
            const uint8_t* row = lobe + ((int64_t)z * H + y) * W;
            for (int x = 0; x < W; ++x) {
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
    std::memset(hist256, 0, 256 * sizeof(int64_t));
    for (int64_t i = 0; i < n; ++i) {
        float v = (float)scan[i];
        if (v < flo) v = flo;
        if (v > fhi) v = fhi;
        const uint8_t u = (uint8_t)std::nearbyintf((v - flo) * inv);
        u8_out[i] = u;
        if (lobe[i] > 0) ++hist256[u];
    }
}

// Post-rule candidate, packed MSB-first: (u8 > th) && !vessel.
void cand_bits_u8(const uint8_t* u8, const uint8_t* vessel, int64_t n,
                  double th, uint8_t* bits) {
    const int64_t bytes = (n + 7) / 8;
    const float fth = (float)th;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < bytes; ++b) {
        uint8_t acc = 0;
        const int64_t base = b * 8;
        const int64_t lim = (base + 8 < n) ? 8 : n - base;
        for (int64_t k = 0; k < lim; ++k) {
            const int64_t i = base + k;
            const bool c = ((float)u8[i] > fth) &&
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
#pragma omp parallel for schedule(static)
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
