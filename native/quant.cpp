// ggml-block quantizers (Q8_0 / Q4_K / Q6_K) — native host path.
//
// Byte-identical to dsocr_tpu/dsq/quant.py's NumPy spec (itself faithful
// to the ggml/candle quantizers the reference links — see
// crates/dsq-writer/src/lib.rs:555-660): same block layouts, same scale
// searches (make_qx_quants rmse_type=1, make_qkx2_quants use_mad=false),
// same nearest-even rounding, and — critically — the same float32
// summation ORDER as NumPy's pairwise reduction (8-accumulator base
// case), so the iterative scale searches pick identical steps and the
// payload bytes match bit-for-bit. Single-threaded (this host has one
// core); ~10x the NumPy path by fusing its many temporaries.
//
// Built lazily by dsocr_tpu.native via g++ -O3 -shared -fPIC.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

constexpr float GROUP_MAX_EPS = 1e-15f;

// NumPy pairwise_sum base case (n <= 128): 8 accumulators striding by 8,
// combined ((r0+r1)+(r2+r3)) + ((r4+r5)+(r6+r7)), remainder serial.
inline float np_sum(const float* a, int n) {
    if (n < 8) {
        float res = 0.0f;
        for (int i = 0; i < n; ++i) res += a[i];
        return res;
    }
    float r[8];
    for (int i = 0; i < 8; ++i) r[i] = a[i];
    int i = 8;
    for (; i + 8 <= n; i += 8)
        for (int j = 0; j < 8; ++j) r[j] += a[i + j];
    float res = ((r[0] + r[1]) + (r[2] + r[3])) + ((r[4] + r[5]) + (r[6] + r[7]));
    for (; i < n; ++i) res += a[i];
    return res;
}

inline int nearest_int(float x) { return (int)std::nearbyintf(x); }  // half-to-even

inline uint16_t f16_bits(float x) {
    _Float16 h = (_Float16)x;  // IEEE round-to-nearest-even, matches np.float16
    uint16_t bits;
    std::memcpy(&bits, &h, 2);
    return bits;
}

inline float f16_round(float x) {  // value after the f16 round trip
    _Float16 h = (_Float16)x;
    return (float)h;
}

// ---------------------------------------------------------------------------
// Q8_0: 32 values -> f16 scale + 32 x i8 (34 B)
// ---------------------------------------------------------------------------

void q8_0_block(const float* x, uint8_t* out) {
    float amax = 0.0f;
    for (int i = 0; i < 32; ++i) amax = std::max(amax, std::fabs(x[i]));
    float scale = amax > 0.0f ? amax / 127.0f : 0.0f;
    uint16_t sb = f16_bits(scale);
    std::memcpy(out, &sb, 2);
    if (scale == 0.0f) {
        std::memset(out + 2, 0, 32);
        return;
    }
    float inv = 1.0f / scale;
    for (int i = 0; i < 32; ++i) {
        float t = x[i] * inv;
        // Rust f32::round = ties away from zero (dsq-writer lib.rs:592)
        float q = t >= 0.0f ? std::floor(t + 0.5f) : std::ceil(t - 0.5f);
        q = std::min(127.0f, std::max(-128.0f, q));
        out[2 + i] = (uint8_t)(int8_t)q;
    }
}

// ---------------------------------------------------------------------------
// make_qx_quants (rmse_type=1, weight = x^2) over one n-element sub-block
// ---------------------------------------------------------------------------

// trial: quantize with iscale, compute sumlx/suml2 with NumPy's temp
// layout: p1[i] = (w[i]*x[i])*l[i], p2[i] = (w[i]*l[i])*l[i]
inline void qx_trial(const float* x, const float* w, int n, int nmax,
                     float iscale, int8_t* l, float* sumlx, float* suml2) {
    float p1[32], p2[32];
    for (int i = 0; i < n; ++i) {
        int li = nearest_int(iscale * x[i]);
        li = std::min(nmax - 1, std::max(-nmax, li));
        l[i] = (int8_t)li;
        float lf = (float)li;
        p1[i] = (w[i] * x[i]) * lf;
        p2[i] = (w[i] * lf) * lf;
    }
    *sumlx = np_sum(p1, n);
    *suml2 = np_sum(p2, n);
}

// Returns scale; fills L (stored l, NOT offset).
float make_qx_quants(const float* x, int n, int nmax, int8_t* L) {
    int amax_idx = 0;
    float amax = 0.0f;
    for (int i = 0; i < n; ++i) {
        float a = std::fabs(x[i]);
        if (a > amax) { amax = a; amax_idx = i; }
    }
    if (amax < GROUP_MAX_EPS) {
        std::memset(L, 0, n);
        return 0.0f;
    }
    float maxv = x[amax_idx];
    float w[32];
    for (int i = 0; i < n; ++i) w[i] = x[i] * x[i];

    int8_t l[32];
    float sumlx, suml2;
    qx_trial(x, w, n, nmax, -nmax / maxv, L, &sumlx, &suml2);
    float scale = suml2 != 0.0f ? sumlx / suml2 : 0.0f;
    float best = scale * sumlx;
    for (int step = -9; step <= 9; ++step) {
        if (step == 0) continue;
        // NumPy computes the scalar (nmax + 0.1*step) in float64, then
        // casts to f32 for the division (NEP 50 weak scalars)
        float num = (float)((double)nmax + 0.1 * (double)step);
        float iscale = -num / maxv;
        float slx, sl2;
        qx_trial(x, w, n, nmax, iscale, l, &slx, &sl2);
        if (sl2 > 0.0f && slx * slx > best * sl2) {
            std::memcpy(L, l, n);
            scale = slx / sl2;
            best = scale * slx;
        }
    }
    return scale;
}

// ---------------------------------------------------------------------------
// Q6_K: 256 values -> 128 B ql + 64 B qh + 16 x i8 scales + f16 d (210 B)
// ---------------------------------------------------------------------------

void q6_k_block(const float* x, uint8_t* out) {
    int8_t L0[256];   // make_qx codes + 32 offset
    float scales[16];
    for (int s = 0; s < 16; ++s) {
        int8_t l[16];
        scales[s] = make_qx_quants(x + 16 * s, 16, 32, l);
        for (int i = 0; i < 16; ++i) L0[16 * s + i] = (int8_t)(l[i] + 32);
    }
    int max_idx = 0;
    float max_abs = 0.0f;
    for (int s = 0; s < 16; ++s) {
        float a = std::fabs(scales[s]);
        if (a > max_abs) { max_abs = a; max_idx = s; }
    }
    if (max_abs < GROUP_MAX_EPS) {
        std::memset(out, 0, 210);
        return;
    }
    float iscale = -128.0f / scales[max_idx];
    float d = f16_round(1.0f / iscale);
    int8_t q_scales[16];
    for (int s = 0; s < 16; ++s)
        q_scales[s] = (int8_t)std::min(127, nearest_int(iscale * scales[s]));

    uint8_t Lf[256];
    for (int s = 0; s < 16; ++s) {
        float dd = d * (float)q_scales[s];
        if (dd == 0.0f) {
            // ggml's requantize pass skips dd==0 sub-blocks
            for (int i = 0; i < 16; ++i) Lf[16 * s + i] = (uint8_t)L0[16 * s + i];
            continue;
        }
        for (int i = 0; i < 16; ++i) {
            int li = nearest_int(x[16 * s + i] / dd);
            li = std::min(31, std::max(-32, li));
            Lf[16 * s + i] = (uint8_t)(li + 32);
        }
    }

    uint8_t* ql = out;
    uint8_t* qh = out + 128;
    for (int half = 0; half < 2; ++half) {
        const uint8_t* seg = Lf + half * 128;
        for (int i = 0; i < 32; ++i) {
            uint8_t a0 = seg[i], a1 = seg[32 + i], a2 = seg[64 + i], a3 = seg[96 + i];
            ql[half * 64 + i] = (a0 & 0xF) | ((a2 & 0xF) << 4);
            ql[half * 64 + 32 + i] = (a1 & 0xF) | ((a3 & 0xF) << 4);
            qh[half * 32 + i] =
                (a0 >> 4) | ((a1 >> 4) << 2) | ((a2 >> 4) << 4) | ((a3 >> 4) << 6);
        }
    }
    std::memcpy(out + 192, q_scales, 16);
    uint16_t db = f16_bits(1.0f / iscale);
    std::memcpy(out + 208, &db, 2);
}

// ---------------------------------------------------------------------------
// make_qkx2_quants (use_mad=false) over one 32-element sub-block
// ---------------------------------------------------------------------------

void make_qkx2_quants(const float* x, const float* w, int n, int nmax,
                      float rmin, float rdelta, int nstep,
                      float* out_scale, float* out_min) {
    float vmin = 0.0f, vmax = x[0];
    for (int i = 0; i < n; ++i) {
        vmin = std::min(vmin, x[i]);
        vmax = std::max(vmax, x[i]);
    }
    // NumPy: vmin = min(x.min(), 0); flat test vmax == x.min() BEFORE the
    // zero clamp. Mirror exactly: x.min() may exceed 0 only when all > 0.
    float xmin = x[0];
    for (int i = 1; i < n; ++i) xmin = std::min(xmin, x[i]);
    vmin = std::min(xmin, 0.0f);
    bool flat = (vmax == vmin);
    if (flat) {
        *out_scale = 0.0f;
        *out_min = -vmin;
        return;
    }
    float pw[32], pwx[32];
    for (int i = 0; i < n; ++i) { pw[i] = w[i]; pwx[i] = w[i] * x[i]; }
    float sum_w = np_sum(pw, n);
    float sum_x = np_sum(pwx, n);

    float iscale = nmax / (vmax - vmin);
    float scale = 1.0f / iscale;
    float tmp[32];
    uint8_t L[32];
    for (int i = 0; i < n; ++i) {
        int li = nearest_int(iscale * (x[i] - vmin));
        li = std::min(nmax, std::max(0, li));
        L[i] = (uint8_t)li;
        float diff = scale * (float)li + vmin - x[i];
        tmp[i] = (w[i] * diff) * diff;
    }
    float best_mad = np_sum(tmp, n);
    float cur_min = vmin;

    for (int step = 0; step <= nstep; ++step) {
        // f64 scalar, cast to f32 for the division (NumPy NEP 50)
        float num = (float)((double)rmin + (double)rdelta * (double)step + (double)nmax);
        float isc = num / (vmax - cur_min);
        uint8_t laux[32];
        float pl[32], pl2[32], pxl[32];
        for (int i = 0; i < n; ++i) {
            int li = nearest_int(isc * (x[i] - cur_min));
            li = std::min(nmax, std::max(0, li));
            laux[i] = (uint8_t)li;
            float lf = (float)li;
            pl[i] = w[i] * lf;
            pl2[i] = (w[i] * lf) * lf;
            pxl[i] = (w[i] * lf) * x[i];
        }
        float sum_l = np_sum(pl, n);
        float sum_l2 = np_sum(pl2, n);
        float sum_xl = np_sum(pxl, n);
        float D = sum_w * sum_l2 - sum_l * sum_l;
        float this_scale = (sum_w * sum_xl - sum_x * sum_l) / D;
        float this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D;
        if (this_min > 0.0f) {
            this_min = 0.0f;
            this_scale = sum_l2 != 0.0f ? sum_xl / sum_l2 : 0.0f;
        }
        for (int i = 0; i < n; ++i) {
            float diff = this_scale * (float)laux[i] + this_min - x[i];
            tmp[i] = (w[i] * diff) * diff;
        }
        float mad = np_sum(tmp, n);
        if (D > 0.0f && mad < best_mad) {
            std::memcpy(L, laux, n);
            best_mad = mad;
            scale = this_scale;
            cur_min = this_min;
        }
    }
    *out_scale = scale;
    *out_min = -cur_min;
}

// ---------------------------------------------------------------------------
// Q4_K: 256 values -> f16 d + f16 dmin + 12 B 6-bit scales/mins + 128 B codes
// ---------------------------------------------------------------------------

void q4_k_block(const float* x, uint8_t* out) {
    float scales[8], mins[8];
    for (int s = 0; s < 8; ++s) {
        const float* sub = x + 32 * s;
        float p[32];
        for (int i = 0; i < 32; ++i) p[i] = sub[i] * sub[i];
        float av_x = std::sqrt(np_sum(p, 32) / 32.0f);
        float w[32];
        for (int i = 0; i < 32; ++i) w[i] = av_x + std::fabs(sub[i]);
        make_qkx2_quants(sub, w, 32, 15, -1.0f, 0.1f, 20, &scales[s], &mins[s]);
    }
    float max_scale = scales[0], max_min = mins[0];
    for (int s = 1; s < 8; ++s) {
        max_scale = std::max(max_scale, scales[s]);
        max_min = std::max(max_min, mins[s]);
    }
    float inv_scale = max_scale > 0.0f ? 63.0f / max_scale : 0.0f;
    float inv_min = max_min > 0.0f ? 63.0f / max_min : 0.0f;
    uint8_t ls[8], lm[8];
    for (int s = 0; s < 8; ++s) {
        ls[s] = (uint8_t)std::min(63, nearest_int(inv_scale * scales[s]));
        lm[s] = (uint8_t)std::min(63, nearest_int(inv_min * mins[s]));
    }
    uint8_t packed[12];
    std::memset(packed, 0, 12);
    for (int j = 0; j < 8; ++j) {
        if (j < 4) {
            packed[j] |= ls[j] & 63;
            packed[j + 4] |= lm[j] & 63;
        } else {
            packed[j + 4] = (uint8_t)((ls[j] & 0xF) | ((lm[j] & 0xF) << 4));
            packed[j - 4] |= (uint8_t)((ls[j] >> 4) << 6);
            packed[j] |= (uint8_t)((lm[j] >> 4) << 6);
        }
    }
    float d = f16_round(max_scale / 63.0f);
    float dmin = f16_round(max_min / 63.0f);

    // requantize against the PACKED (lossy) scales, ggml get_scale_min_k4
    uint8_t L[256];
    for (int s = 0; s < 8; ++s) {
        int sc, mm;
        if (s < 4) {
            sc = packed[s] & 63;
            mm = packed[s + 4] & 63;
        } else {
            sc = (packed[s + 4] & 0xF) | ((packed[s - 4] >> 6) << 4);
            mm = (packed[s + 4] >> 4) | ((packed[s] >> 6) << 4);
        }
        float dd = d * (float)sc;
        float mmf = dmin * (float)mm;
        for (int i = 0; i < 32; ++i) {
            int li = 0;
            if (dd != 0.0f) {
                li = nearest_int((x[32 * s + i] + mmf) / dd);
                li = std::min(15, std::max(0, li));
            }
            L[32 * s + i] = (uint8_t)li;
        }
    }

    uint16_t db = f16_bits(max_scale / 63.0f);
    uint16_t dminb = f16_bits(max_min / 63.0f);
    std::memcpy(out, &db, 2);
    std::memcpy(out + 2, &dminb, 2);
    std::memcpy(out + 4, packed, 12);
    uint8_t* qs = out + 16;
    for (int j = 0; j < 256; j += 64)
        for (int i = 0; i < 32; ++i)
            qs[j / 2 + i] = (uint8_t)(L[j + i] | (L[j + 32 + i] << 4));
}

}  // namespace

extern "C" {

void quantize_q8_0_native(const float* x, int64_t n_blocks, uint8_t* out) {
    for (int64_t b = 0; b < n_blocks; ++b)
        q8_0_block(x + 32 * b, out + 34 * b);
}

void quantize_q6_k_native(const float* x, int64_t n_blocks, uint8_t* out) {
    for (int64_t b = 0; b < n_blocks; ++b)
        q6_k_block(x + 256 * b, out + 210 * b);
}

void quantize_q4_k_native(const float* x, int64_t n_blocks, uint8_t* out) {
    for (int64_t b = 0; b < n_blocks; ++b)
        q4_k_block(x + 256 * b, out + 144 * b);
}

}  // extern "C"
