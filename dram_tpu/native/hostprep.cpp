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

AxisTable make_axis(int in_size, int out_size, double scale, bool nearest) {
    AxisTable t;
    t.lo.resize(out_size);
    t.hi.resize(out_size);
    t.frac.resize(out_size);
    t.valid.resize(out_size);
    for (int i = 0; i < out_size; ++i) {
        double src = i * scale;
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
