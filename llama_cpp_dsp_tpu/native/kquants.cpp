// Native k-quant encoders — the host-side hot loop of tools/quantize.py
// (role of the reference's quantize_row_q{4,5,6}_K_ref, ggml-quants.c;
// the numpy oracle quant/ref_numpy.py runs ~1 M elem/s on the scale
// searches — ~2 h for a 7B — because the nstep loops are Python-level).
//
// BYTE-EXACT with the oracle (and therefore with the reference binary,
// tests/test_reference_ab.py): every f32 product/sum follows the same
// order and grouping ((w*l)*l, sequential accumulation), nearest_int is
// lrintf under round-to-nearest-even, and the build uses -ffp-contract=off
// so no FMA changes the last ulp of the knife-edge comparisons.
//
// ABI (ctypes, native/kquants_bind.py):
//   void quant_q4_K(const float* x, int64_t nb, uint8_t* out);
//   void quant_q5_K(const float* x, int64_t nb, uint8_t* out);
//   void quant_q6_K(const float* x, int64_t nb, uint8_t* out);
// x has nb*256 floats; out has nb * block_size bytes (144/176/210).
// Blocks are independent; work splits over LLAMA_TPU_QUANT_THREADS
// threads (default hardware_concurrency).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int QK_K = 256;
constexpr float GROUP_MAX_EPS = 1e-15f;

inline int nearest_int(float x) { return (int)lrintf(x); }

// IEEE f32 -> f16 bits, round to nearest even (matches numpy astype(f16))
inline uint16_t fp32_to_fp16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (((x >> 23) & 0xFF) == 0xFF)  // inf/nan
        return (uint16_t)(sign | 0x7C00u | (mant ? 0x200u : 0u));
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
    if (exp <= 0) {                                      // subnormal/zero
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        int shift = 14 - exp;
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FFu;
    uint32_t x;
    if (exp == 0) {
        if (mant == 0) {
            x = sign;
        } else {  // subnormal
            int e = -1;
            do { mant <<= 1; e++; } while (!(mant & 0x400u));
            mant &= 0x3FFu;
            x = sign | (uint32_t)(127 - 15 - e) << 23 | (mant << 13);
        }
    } else if (exp == 0x1F) {
        x = sign | 0x7F800000u | (mant << 13);
    } else {
        x = sign | (exp - 15 + 127) << 23 | (mant << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

// make_qkx2_quants (ggml-quants.c:480) for one n-element group.
// Returns scale; writes L[n] and *the_min.
float make_qkx2(const float* x, const float* w, int n, int nmax, float rmin,
                float rdelta, int nstep, bool use_mad, uint8_t* L,
                float* the_min) {
    float mn = x[0], mx = x[0];
    float sum_w = w[0];
    float sum_x = w[0] * x[0];
    for (int i = 1; i < n; ++i) {
        if (x[i] < mn) mn = x[i];
        if (x[i] > mx) mx = x[i];
        sum_w += w[i];
        sum_x += w[i] * x[i];
    }
    if (mn > 0) mn = 0;
    if (mx == mn) {
        for (int i = 0; i < n; ++i) L[i] = 0;
        *the_min = -mn;
        return 0.f;
    }
    float iscale = (float)nmax / (mx - mn);
    float scale = 1.f / iscale;
    float best_mad = 0;
    for (int i = 0; i < n; ++i) {
        int l = nearest_int(iscale * (x[i] - mn));
        L[i] = (uint8_t)(l < 0 ? 0 : (l > nmax ? nmax : l));
        float diff = scale * (float)L[i] + mn - x[i];
        diff = use_mad ? fabsf(diff) : diff * diff;
        best_mad += w[i] * diff;
    }
    uint8_t laux[64];
    for (int is = 0; is <= nstep; ++is) {
        float isc = (rmin + rdelta * (float)is + (float)nmax) / (mx - mn);
        float sum_l = 0, sum_l2 = 0, sum_xl = 0;
        for (int i = 0; i < n; ++i) {
            int l = nearest_int(isc * (x[i] - mn));
            l = l < 0 ? 0 : (l > nmax ? nmax : l);
            laux[i] = (uint8_t)l;
            float wl = w[i] * (float)l;
            sum_l += wl;
            sum_l2 += wl * (float)l;
            sum_xl += wl * x[i];
        }
        float D = sum_w * sum_l2 - sum_l * sum_l;
        if (D > 0) {
            float this_scale = (sum_w * sum_xl - sum_x * sum_l) / D;
            float this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D;
            if (this_min > 0) {
                this_min = 0;
                this_scale = sum_xl / sum_l2;
            }
            float mad = 0;
            for (int i = 0; i < n; ++i) {
                float diff = this_scale * (float)laux[i] + this_min - x[i];
                diff = use_mad ? fabsf(diff) : diff * diff;
                mad += w[i] * diff;
            }
            if (mad < best_mad) {
                for (int i = 0; i < n; ++i) L[i] = laux[i];
                best_mad = mad;
                scale = this_scale;
                mn = this_min;  // next candidates quantize vs the new min
            }
        }
    }
    *the_min = -mn;
    return scale;
}

// make_qx_quants (ggml-quants.c:379), rmse_type 1, qw = NULL.
// Writes L[n] biased by +nmax; returns scale. Dead groups: L=0, scale=0.
float make_qx(const float* x, int n, int nmax, int8_t* Lout) {
    float amax = 0, maxv = 0;
    for (int i = 0; i < n; ++i) {
        float ax = fabsf(x[i]);
        if (ax > amax) { amax = ax; maxv = x[i]; }
    }
    if (amax < GROUP_MAX_EPS) {
        for (int i = 0; i < n; ++i) Lout[i] = 0;
        return 0.f;
    }
    int8_t L[64], l2[64];
    float iscale = -(float)nmax / maxv;
    float sumlx = 0, suml2 = 0;
    for (int i = 0; i < n; ++i) {
        int l = nearest_int(iscale * x[i]);
        l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
        L[i] = (int8_t)l;
        float wv = x[i] * x[i];
        float lf = (float)l;
        sumlx += (wv * x[i]) * lf;
        suml2 += (wv * lf) * lf;
    }
    float scale = suml2 != 0 ? sumlx / suml2 : 0.f;
    float best = scale * sumlx;
    for (int is = -9; is <= 9; ++is) {
        if (is == 0) continue;
        iscale = -((float)nmax + 0.1f * (float)is) / maxv;
        float sl = 0, s2 = 0;
        for (int i = 0; i < n; ++i) {
            int l = nearest_int(iscale * x[i]);
            l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
            l2[i] = (int8_t)l;
            float wv = x[i] * x[i];
            float lf = (float)l;
            sl += (wv * x[i]) * lf;
            s2 += (wv * lf) * lf;
        }
        if (s2 > 0 && sl * sl > best * s2) {
            for (int i = 0; i < n; ++i) L[i] = l2[i];
            scale = sl / s2;
            best = scale * sl;
        }
    }
    for (int i = 0; i < n; ++i) Lout[i] = (int8_t)(L[i] + nmax);
    return scale;
}

// make_qx_quants with EXPLICIT weights (the reference's qw branch used by
// the imatrix paths). Dead groups bias L to +nmax (the oracle's weighted
// convention) instead of 0.
float make_qx_w(const float* x, const float* w, int n, int nmax,
                int8_t* Lout) {
    float amax = 0, maxv = 0;
    for (int i = 0; i < n; ++i) {
        float ax = fabsf(x[i]);
        if (ax > amax) { amax = ax; maxv = x[i]; }
    }
    if (amax < GROUP_MAX_EPS) {
        for (int i = 0; i < n; ++i) Lout[i] = (int8_t)nmax;
        return 0.f;
    }
    int8_t L[64], l2[64];
    float iscale = -(float)nmax / maxv;
    float sumlx = 0, suml2 = 0;
    for (int i = 0; i < n; ++i) {
        int l = nearest_int(iscale * x[i]);
        l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
        L[i] = (int8_t)l;
        float lf = (float)l;
        sumlx += (w[i] * x[i]) * lf;
        suml2 += (w[i] * lf) * lf;
    }
    float scale = suml2 != 0 ? sumlx / suml2 : 0.f;
    float best = scale * sumlx;
    for (int is = -9; is <= 9; ++is) {
        if (is == 0) continue;
        iscale = -((float)nmax + 0.1f * (float)is) / maxv;
        float sl = 0, s2 = 0;
        for (int i = 0; i < n; ++i) {
            int l = nearest_int(iscale * x[i]);
            l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
            l2[i] = (int8_t)l;
            float lf = (float)l;
            sl += (w[i] * x[i]) * lf;
            s2 += (w[i] * lf) * lf;
        }
        if (s2 > 0 && sl * sl > best * s2) {
            for (int i = 0; i < n; ++i) L[i] = l2[i];
            scale = sl / s2;
            best = scale * sl;
        }
    }
    for (int i = 0; i < n; ++i) Lout[i] = (int8_t)(L[i] + nmax);
    return scale;
}

inline void get_scale_min_k4(int j, const uint8_t* q, uint8_t* sc,
                             uint8_t* m) {
    if (j < 4) {
        *sc = q[j] & 63;
        *m = q[j + 4] & 63;
    } else {
        *sc = (uint8_t)((q[j + 4] & 0x0F) | ((q[j - 4] >> 6) << 4));
        *m = (uint8_t)((q[j + 4] >> 4) | ((q[j] >> 6) << 4));
    }
}

void qkx_weights_32(const float* xb, float* wout) {
    for (int g = 0; g < 8; ++g) {
        const float* xg = xb + 32 * g;
        float sum_x2 = 0;
        for (int i = 0; i < 32; ++i) sum_x2 += xg[i] * xg[i];
        float av_x = sqrtf(sum_x2 / 32.f);
        for (int i = 0; i < 32; ++i) wout[32 * g + i] = av_x + fabsf(xg[i]);
    }
}

// shared q4_K/q5_K block body (they differ only in nmax/rmin/nstep + pack);
// `ext_weights` non-null = imatrix path (reference *_impl with
// quant_weights: rmin -0.9, rdelta 0.05, nstep 36)
void quant_k45_block(const float* xb, int nmax, float rmin, float rdelta,
                     int nstep, const float* ext_weights,
                     uint8_t* Lq /*[256]*/, uint8_t* scales12,
                     uint16_t* d16, uint16_t* dmin16, uint8_t* Lfinal) {
    float wbuf[256];
    const float* weights = ext_weights;
    if (weights == nullptr) {
        qkx_weights_32(xb, wbuf);
        weights = wbuf;
    }
    float scales[8], mins[8];
    for (int g = 0; g < 8; ++g)
        scales[g] = make_qkx2(xb + 32 * g, weights + 32 * g, 32, nmax, rmin,
                              rdelta, nstep, false, Lq + 32 * g, &mins[g]);
    float max_scale = scales[0], max_min = mins[0];
    for (int g = 1; g < 8; ++g) {
        if (scales[g] > max_scale) max_scale = scales[g];
        if (mins[g] > max_min) max_min = mins[g];
    }
    float inv_scale = max_scale > 0 ? 63.f / max_scale : 0.f;
    float inv_min = max_min > 0 ? 63.f / max_min : 0.f;
    uint8_t ls[8], lm[8];
    for (int g = 0; g < 8; ++g) {
        int l = nearest_int(inv_scale * scales[g]);
        ls[g] = (uint8_t)(l > 63 ? 63 : l);
        l = nearest_int(inv_min * mins[g]);
        lm[g] = (uint8_t)(l > 63 ? 63 : l);
    }
    for (int j = 0; j < 4; ++j) {
        scales12[j] = ls[j];
        scales12[j + 4] = lm[j];
        scales12[j + 8] = (uint8_t)((ls[j + 4] & 0x0F) | ((lm[j + 4] & 0x0F) << 4));
    }
    for (int j = 0; j < 4; ++j) {
        scales12[j] |= (uint8_t)((ls[j + 4] >> 4) << 6);
        scales12[j + 4] |= (uint8_t)((lm[j + 4] >> 4) << 6);
    }
    *d16 = fp32_to_fp16(max_scale / 63.f);
    *dmin16 = fp32_to_fp16(max_min / 63.f);
    float d = fp16_to_fp32(*d16);
    float dmin = fp16_to_fp32(*dmin16);
    for (int g = 0; g < 8; ++g) {
        uint8_t sc, m;
        get_scale_min_k4(g, scales12, &sc, &m);
        float dd = d * (float)sc;
        float dm = dmin * (float)m;
        for (int i = 0; i < 32; ++i) {
            if (dd == 0) {
                Lfinal[32 * g + i] = Lq[32 * g + i];
            } else {
                int l = nearest_int((xb[32 * g + i] + dm) / dd);
                Lfinal[32 * g + i] =
                    (uint8_t)(l < 0 ? 0 : (l > nmax ? nmax : l));
            }
        }
    }
}

// make_q3_quants (ggml-quants.c:448) n=16, nmax=4, do_rmse=true.
// Writes L[16] biased +4 (0..7); returns scale.
float make_q3_rmse(const float* x, int8_t* Lout) {
    const int n = 16, nmax = 4;
    float amax = 0, maxv = 0;
    for (int i = 0; i < n; ++i) {
        float ax = fabsf(x[i]);
        if (ax > amax) { amax = ax; maxv = x[i]; }
    }
    if (amax < GROUP_MAX_EPS) {
        for (int i = 0; i < n; ++i) Lout[i] = 0;
        return 0.f;
    }
    float iscale = -(float)nmax / maxv;
    int L[16];
    float lf[16], w[16];
    float sumlx = 0, suml2 = 0;
    for (int i = 0; i < n; ++i) {
        int l = nearest_int(iscale * x[i]);
        l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
        L[i] = l;
        lf[i] = (float)l;
        w[i] = x[i] * x[i];
        sumlx += (w[i] * x[i]) * lf[i];
        suml2 += (w[i] * lf[i]) * lf[i];
    }
    for (int pass = 0; pass < 5; ++pass) {
        for (int i = 0; i < n; ++i) {
            float slx = sumlx - (w[i] * x[i]) * lf[i];
            if (slx > 0) {
                float sl2 = suml2 - (w[i] * lf[i]) * lf[i];
                int newl = nearest_int(x[i] * sl2 / slx);
                newl = newl < -nmax ? -nmax : (newl > nmax - 1 ? nmax - 1 : newl);
                float nlf = (float)newl;
                if (nlf != lf[i]) {
                    float slx2 = slx + (w[i] * x[i]) * nlf;
                    float sl22 = sl2 + (w[i] * nlf) * nlf;
                    if (sl22 > 0 &&
                        (slx2 * slx2) * suml2 > (sumlx * sumlx) * sl22) {
                        L[i] = newl;
                        lf[i] = nlf;
                        sumlx = slx2;
                        suml2 = sl22;
                    }
                }
            }
        }
    }
    for (int i = 0; i < n; ++i) Lout[i] = (int8_t)(L[i] + nmax);
    return sumlx / suml2;
}

// run fn(b0, b1) over [0, nb) on LLAMA_TPU_QUANT_THREADS threads
// (default hardware_concurrency; blocks are independent)
template <typename F>
void parallel_blocks(int64_t nb, F fn) {
    int nt = (int)std::thread::hardware_concurrency();
    if (const char* e = std::getenv("LLAMA_TPU_QUANT_THREADS")) nt = atoi(e);
    if (nt < 1) nt = 1;
    if (nt == 1 || nb < 2 * nt) {
        fn((int64_t)0, nb);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (nb + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t b0 = t * chunk, b1 = b0 + chunk > nb ? nb : b0 + chunk;
        if (b0 >= b1) break;
        ts.emplace_back([=] { fn(b0, b1); });
    }
    for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// block_q4_K: d f16, dmin f16, scales[12], qs[128]  (144 bytes)
void quant_q4_K(const float* x, int64_t nb, uint8_t* out) {
    parallel_blocks(nb, [=](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
        const float* xb = x + b * QK_K;
        uint8_t* o = out + b * 144;
        uint8_t Lq[256], L[256];
        quant_k45_block(xb, 15, -1.f, 0.1f, 20, nullptr, Lq, o + 4,
                        (uint16_t*)o, (uint16_t*)(o + 2), L);
        uint8_t* qs = o + 16;
        for (int n = 0; n < 4; ++n)
            for (int i = 0; i < 32; ++i)
                qs[32 * n + i] =
                    (uint8_t)(L[64 * n + i] | (L[64 * n + 32 + i] << 4));
    }
    });
}

// block_q5_K: d f16, dmin f16, scales[12], qh[32], qs[128]  (176 bytes)
void quant_q5_K(const float* x, int64_t nb, uint8_t* out) {
    parallel_blocks(nb, [=](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
        const float* xb = x + b * QK_K;
        uint8_t* o = out + b * 176;
        uint8_t Lq[256], L[256];
        quant_k45_block(xb, 31, -0.5f, 0.1f, 15, nullptr, Lq, o + 4,
                        (uint16_t*)o, (uint16_t*)(o + 2), L);
        uint8_t* qh = o + 16;
        uint8_t* qs = o + 48;
        std::memset(qh, 0, 32);
        for (int n = 0; n < 4; ++n) {
            for (int i = 0; i < 32; ++i) {
                uint8_t a = L[64 * n + i], c = L[64 * n + 32 + i];
                qs[32 * n + i] = (uint8_t)((a & 0x0F) | ((c & 0x0F) << 4));
                qh[i] |= (uint8_t)(((a >> 4) & 1) << (2 * n));
                qh[i] |= (uint8_t)(((c >> 4) & 1) << (2 * n + 1));
            }
        }
    }
    });
}

// block_q6_K: ql[128], qh[64], scales[16] i8, d f16  (210 bytes)
void quant_q6_K(const float* x, int64_t nb, uint8_t* out) {
    parallel_blocks(nb, [=](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
        const float* xb = x + b * QK_K;
        uint8_t* o = out + b * 210;
        int8_t Lq[256];
        float scales[16];
        for (int g = 0; g < 16; ++g)
            scales[g] = make_qx(xb + 16 * g, 16, 32, Lq + 16 * g);
        float amax = 0, max_scale = 0;
        for (int g = 0; g < 16; ++g) {
            float ax = fabsf(scales[g]);
            if (ax > amax) { amax = ax; max_scale = scales[g]; }
        }
        if (amax < GROUP_MAX_EPS) {
            std::memset(o, 0, 210);
            continue;
        }
        float iscale = -128.f / max_scale;
        uint16_t d16 = fp32_to_fp16(1.f / iscale);
        float d = fp16_to_fp32(d16);
        int8_t* sc8 = (int8_t*)(o + 192);
        for (int g = 0; g < 16; ++g) {
            int l = nearest_int(iscale * scales[g]);
            sc8[g] = (int8_t)(l > 127 ? 127 : l);
        }
        uint8_t L[256];
        for (int g = 0; g < 16; ++g) {
            float dd = d * (float)sc8[g];
            for (int i = 0; i < 16; ++i) {
                if (dd == 0) {
                    L[16 * g + i] = (uint8_t)Lq[16 * g + i];
                } else {
                    int l = nearest_int(xb[16 * g + i] / dd);
                    l = l < -32 ? -32 : (l > 31 ? 31 : l);
                    L[16 * g + i] = (uint8_t)(l + 32);
                }
            }
        }
        uint8_t* ql = o;
        uint8_t* qh = o + 128;
        for (int h = 0; h < 2; ++h) {
            const uint8_t* Lh = L + 128 * h;
            for (int i = 0; i < 32; ++i) {
                uint8_t q1 = Lh[i], q2 = Lh[32 + i], q3 = Lh[64 + i],
                        q4 = Lh[96 + i];
                ql[64 * h + i] = (uint8_t)((q1 & 0x0F) | ((q3 & 0x0F) << 4));
                ql[64 * h + 32 + i] =
                    (uint8_t)((q2 & 0x0F) | ((q4 & 0x0F) << 4));
                qh[32 * h + i] = (uint8_t)((q1 >> 4) | ((q2 >> 4) << 2) |
                                           ((q3 >> 4) << 4) | ((q4 >> 4) << 6));
            }
        }
        std::memcpy(o + 208, &d16, 2);
    }
    });
}

// block_q2_K: scales[16], qs[64], d f16, dmin f16  (84 bytes)
void quant_q2_K(const float* x, int64_t nb, uint8_t* out) {
    parallel_blocks(nb, [=](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
        const float* xb = x + b * QK_K;
        uint8_t* o = out + b * 84;
        uint8_t Lq[256];
        float weights[256];
        for (int i = 0; i < 256; ++i) weights[i] = fabsf(xb[i]);
        float scales[16], mins[16];
        for (int g = 0; g < 16; ++g)
            scales[g] = make_qkx2(xb + 16 * g, weights + 16 * g, 16, 3,
                                  -0.5f, 0.1f, 15, true, Lq + 16 * g,
                                  &mins[g]);
        float max_scale = scales[0], max_min = mins[0];
        for (int g = 1; g < 16; ++g) {
            if (scales[g] > max_scale) max_scale = scales[g];
            if (mins[g] > max_min) max_min = mins[g];
        }
        uint8_t* sc_packed = o;
        const float q4scale = 15.f;
        if (max_scale > 0) {
            float isc = q4scale / max_scale;
            for (int g = 0; g < 16; ++g)
                sc_packed[g] = (uint8_t)nearest_int(isc * scales[g]);
        } else {
            for (int g = 0; g < 16; ++g) sc_packed[g] = 0;
        }
        uint16_t d16 = max_scale > 0 ? fp32_to_fp16(max_scale / q4scale)
                                     : fp32_to_fp16(0.f);
        if (max_min > 0) {
            float imn = q4scale / max_min;
            for (int g = 0; g < 16; ++g)
                sc_packed[g] |= (uint8_t)(nearest_int(imn * mins[g]) << 4);
        }
        uint16_t dmin16 = max_min > 0 ? fp32_to_fp16(max_min / q4scale)
                                      : fp32_to_fp16(0.f);
        std::memcpy(o + 80, &d16, 2);
        std::memcpy(o + 82, &dmin16, 2);
        float d = fp16_to_fp32(d16), dmin = fp16_to_fp32(dmin16);
        uint8_t L[256];
        for (int g = 0; g < 16; ++g) {
            float dd = d * (float)(sc_packed[g] & 0x0F);
            float dm = dmin * (float)(sc_packed[g] >> 4);
            for (int i = 0; i < 16; ++i) {
                if (dd == 0) {
                    L[16 * g + i] = Lq[16 * g + i];
                } else {
                    int l = nearest_int((xb[16 * g + i] + dm) / dd);
                    L[16 * g + i] = (uint8_t)(l < 0 ? 0 : (l > 3 ? 3 : l));
                }
            }
        }
        uint8_t* qs = o + 16;
        for (int h = 0; h < 2; ++h)
            for (int i = 0; i < 32; ++i)
                qs[32 * h + i] =
                    (uint8_t)(L[128 * h + i] | (L[128 * h + 32 + i] << 2) |
                              (L[128 * h + 64 + i] << 4) |
                              (L[128 * h + 96 + i] << 6));
    }
    });
}

// block_q3_K: hmask[32], qs[64], scales[12], d f16  (110 bytes)
void quant_q3_K(const float* x, int64_t nb, uint8_t* out) {
    parallel_blocks(nb, [=](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
        const float* xb = x + b * QK_K;
        uint8_t* o = out + b * 110;
        int8_t Lq[256];
        float scales[16];
        for (int g = 0; g < 16; ++g)
            scales[g] = make_q3_rmse(xb + 16 * g, Lq + 16 * g);
        float amax = 0, max_scale = 0;
        for (int g = 0; g < 16; ++g) {
            float ax = fabsf(scales[g]);
            if (ax > amax) { amax = ax; max_scale = scales[g]; }
        }
        uint8_t* packed = o + 96;
        std::memset(packed, 0, 12);
        uint16_t d16;
        if (max_scale != 0) {
            float iscale = -32.f / max_scale;
            uint8_t l6[16];
            for (int g = 0; g < 16; ++g) {
                int l = nearest_int(iscale * scales[g]);
                l = l < -32 ? -32 : (l > 31 ? 31 : l);
                l6[g] = (uint8_t)(l + 32);
            }
            for (int j = 0; j < 8; ++j)
                packed[j] = (uint8_t)((l6[j] & 0x0F) | ((l6[j + 8] & 0x0F) << 4));
            for (int j = 0; j < 16; ++j)
                packed[8 + (j % 4)] |= (uint8_t)((l6[j] >> 4) << (2 * (j / 4)));
            d16 = fp32_to_fp16(1.f / iscale);
        } else {
            d16 = fp32_to_fp16(0.f);
        }
        std::memcpy(o + 108, &d16, 2);
        float d = fp16_to_fp32(d16);
        int Lf[256];
        for (int g = 0; g < 16; ++g) {
            int lo = g < 8 ? (packed[g] & 0x0F) : (packed[g - 8] >> 4);
            int hi = (packed[8 + (g % 4)] >> (2 * (g / 4))) & 3;
            int sc6 = (lo | (hi << 4)) - 32;
            float dd = d * (float)sc6;
            for (int i = 0; i < 16; ++i) {
                if (dd == 0) {
                    Lf[16 * g + i] = Lq[16 * g + i];
                } else {
                    int l = nearest_int(xb[16 * g + i] / dd);
                    l = l < -4 ? -4 : (l > 3 ? 3 : l);
                    Lf[16 * g + i] = l + 4;
                }
            }
        }
        uint8_t* hmask = o;
        uint8_t* qs = o + 32;
        std::memset(hmask, 0, 32);
        uint8_t L2[256];
        for (int j = 0; j < 256; ++j) {
            int v = Lf[j];
            if (v > 3) {
                hmask[j % 32] |= (uint8_t)(1 << (j / 32));
                v -= 4;
            }
            L2[j] = (uint8_t)v;
        }
        for (int h = 0; h < 2; ++h)
            for (int i = 0; i < 32; ++i)
                qs[32 * h + i] =
                    (uint8_t)(L2[128 * h + i] | (L2[128 * h + 32 + i] << 2) |
                              (L2[128 * h + 64 + i] << 4) |
                              (L2[128 * h + 96 + i] << 6));
    }
    });
}

// -- imatrix-weighted entry points (reference quantize_row_*_impl with
// quant_weights; qw has n_per_row entries, reused for every row) ----------

// block_q4_0 weighted: rows of n_per_row; w = qw * sqrt(sigma2_row + x^2)
void quant_q4_0_w(const float* x, const float* qw, int64_t n_rows,
                  int64_t n_per_row, uint8_t* out) {
    int64_t bpr = n_per_row / 32;
    parallel_blocks(n_rows, [=](int64_t r0, int64_t r1) {
    std::vector<float> w(32);
    for (int64_t r = r0; r < r1; ++r) {
        const float* xr = x + r * n_per_row;
        float sum2 = 0;
        for (int64_t i = 0; i < n_per_row; ++i) sum2 += xr[i] * xr[i];
        float sigma2 = sum2 / (float)n_per_row;
        for (int64_t g = 0; g < bpr; ++g) {
            const float* xg = xr + 32 * g;
            for (int i = 0; i < 32; ++i)
                w[i] = qw[32 * g + i] * sqrtf(sigma2 + xg[i] * xg[i]);
            int8_t L[32];
            float d = make_qx_w(xg, w.data(), 32, 8, L);
            uint8_t* o = out + (r * bpr + g) * 18;
            uint16_t d16 = fp32_to_fp16(d);
            std::memcpy(o, &d16, 2);
            for (int i = 0; i < 16; ++i)
                o[2 + i] = (uint8_t)((uint8_t)L[i] | ((uint8_t)L[16 + i] << 4));
        }
    }
    });
}

// block_q6_K weighted: weights are the qw values directly
void quant_q6_K_w(const float* x, const float* qw, int64_t n_rows,
                  int64_t n_per_row, uint8_t* out) {
    int64_t bpr = n_per_row / QK_K;
    parallel_blocks(n_rows * bpr, [=](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
        const float* xb = x + b * QK_K;
        const float* qwb = qw + (b % bpr) * QK_K;
        uint8_t* o = out + b * 210;
        int8_t Lq[256];
        float scales[16];
        for (int g = 0; g < 16; ++g)
            scales[g] = make_qx_w(xb + 16 * g, qwb + 16 * g, 16, 32,
                                  Lq + 16 * g);
        float amax = 0, max_scale = 0;
        for (int g = 0; g < 16; ++g) {
            float ax = fabsf(scales[g]);
            if (ax > amax) { amax = ax; max_scale = scales[g]; }
        }
        if (amax < GROUP_MAX_EPS) {
            std::memset(o, 0, 210);
            continue;
        }
        float iscale = -128.f / max_scale;
        uint16_t d16 = fp32_to_fp16(1.f / iscale);
        float d = fp16_to_fp32(d16);
        int8_t* sc8 = (int8_t*)(o + 192);
        for (int g = 0; g < 16; ++g) {
            int l = nearest_int(iscale * scales[g]);
            sc8[g] = (int8_t)(l > 127 ? 127 : l);
        }
        uint8_t L[256];
        for (int g = 0; g < 16; ++g) {
            float dd = d * (float)sc8[g];
            for (int i = 0; i < 16; ++i) {
                if (dd == 0) {
                    L[16 * g + i] = (uint8_t)Lq[16 * g + i];
                } else {
                    int l = nearest_int(xb[16 * g + i] / dd);
                    l = l < -32 ? -32 : (l > 31 ? 31 : l);
                    L[16 * g + i] = (uint8_t)(l + 32);
                }
            }
        }
        uint8_t* ql = o;
        uint8_t* qh = o + 128;
        for (int h = 0; h < 2; ++h) {
            const uint8_t* Lh = L + 128 * h;
            for (int i = 0; i < 32; ++i) {
                uint8_t q1 = Lh[i], q2 = Lh[32 + i], q3 = Lh[64 + i],
                        q4 = Lh[96 + i];
                ql[64 * h + i] = (uint8_t)((q1 & 0x0F) | ((q3 & 0x0F) << 4));
                ql[64 * h + 32 + i] =
                    (uint8_t)((q2 & 0x0F) | ((q4 & 0x0F) << 4));
                qh[32 * h + i] = (uint8_t)((q1 >> 4) | ((q2 >> 4) << 2) |
                                           ((q3 >> 4) << 4) | ((q4 >> 4) << 6));
            }
        }
        std::memcpy(o + 208, &d16, 2);
    }
    });
}

// q4_K/q5_K weighted: sigma2 = 2*sum(row^2)/QK_K per row; qkx2 with
// rmin -0.9, rdelta 0.05, nstep 36 (oracle _quant_k4_with_weights)
static void quant_k45_w(const float* x, const float* qw, int64_t n_rows,
                        int64_t n_per_row, uint8_t* out, int nmax) {
    int64_t bpr = n_per_row / QK_K;
    int bs = nmax == 15 ? 144 : 176;
    parallel_blocks(n_rows, [=](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; ++r) {
        const float* xr = x + r * n_per_row;
        float sum2 = 0;
        for (int64_t i = 0; i < n_per_row; ++i) sum2 += xr[i] * xr[i];
        float sigma2 = 2.f * sum2 / (float)QK_K;
        for (int64_t blk = 0; blk < bpr; ++blk) {
            const float* xb = xr + blk * QK_K;
            const float* qwb = qw + blk * QK_K;
            float weights[256];
            for (int i = 0; i < 256; ++i)
                weights[i] = qwb[i] * sqrtf(sigma2 + xb[i] * xb[i]);
            uint8_t* o = out + (r * bpr + blk) * bs;
            uint8_t Lq[256], L[256];
            quant_k45_block(xb, nmax, -0.9f, 0.05f, 36, weights, Lq, o + 4,
                            (uint16_t*)o, (uint16_t*)(o + 2), L);
            if (nmax == 15) {
                uint8_t* qs = o + 16;
                for (int n = 0; n < 4; ++n)
                    for (int i = 0; i < 32; ++i)
                        qs[32 * n + i] = (uint8_t)(L[64 * n + i] |
                                                   (L[64 * n + 32 + i] << 4));
            } else {
                uint8_t* qh = o + 16;
                uint8_t* qs = o + 48;
                std::memset(qh, 0, 32);
                for (int n = 0; n < 4; ++n) {
                    for (int i = 0; i < 32; ++i) {
                        uint8_t a = L[64 * n + i], c = L[64 * n + 32 + i];
                        qs[32 * n + i] =
                            (uint8_t)((a & 0x0F) | ((c & 0x0F) << 4));
                        qh[i] |= (uint8_t)(((a >> 4) & 1) << (2 * n));
                        qh[i] |= (uint8_t)(((c >> 4) & 1) << (2 * n + 1));
                    }
                }
            }
        }
    }
    });
}

void quant_q4_K_w(const float* x, const float* qw, int64_t n_rows,
                  int64_t n_per_row, uint8_t* out) {
    quant_k45_w(x, qw, n_rows, n_per_row, out, 15);
}

void quant_q5_K_w(const float* x, const float* qw, int64_t n_rows,
                  int64_t n_per_row, uint8_t* out) {
    quant_k45_w(x, qw, n_rows, n_per_row, out, 31);
}

}  // extern "C"
