// Native quantization codec hot path for ggllm_tpu.
//
// Scalar, bit-faithful implementations of the ggml block formats, mirroring
// the Python reference codecs in ggllm_tpu/quant/{legacy,kquants}.py (which
// are themselves validated bit-exactly against the upstream C layouts).
// Used through ctypes from ggllm_tpu/native/__init__.py to accelerate model
// loading, LoRA base dequantization, and the quantizer tool; the Python
// codecs remain the semantic reference and fallback.
//
// Compile with -O3 -ffp-contract=off (strict f32, no FMA) — see Makefile.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------- fp16

inline float fp16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; exp--; }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

inline uint16_t f32_to_fp16(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    uint32_t sign = (bits >> 16) & 0x8000;
    int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
    uint32_t man = bits & 0x7FFFFF;
    if (((bits >> 23) & 0xFF) == 0xFF) {  // inf/nan
        return (uint16_t)(sign | 0x7C00 | (man ? 0x200 : 0));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00);  // overflow -> inf
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;  // underflow -> 0
        // subnormal with round-to-nearest-even
        man |= 0x800000;
        uint32_t shift = 14 - exp;
        uint32_t half = man >> shift;
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    // normal, round-to-nearest-even on the 13 dropped bits
    uint32_t half = (uint32_t)(exp << 10) | (man >> 13);
    uint32_t rem = man & 0x1FFF;
    if (rem > 0x1000 || (rem == 0x1000 && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

inline uint16_t rd16(const uint8_t* p) { uint16_t v; std::memcpy(&v, p, 2); return v; }
inline float rdf32(const uint8_t* p) { float v; std::memcpy(&v, p, 4); return v; }

// ------------------------------------------------------------ legacy dequant

void deq_q4_0(const uint8_t* b, float* y) {  // 18 bytes -> 32 floats
    float d = fp16_to_f32(rd16(b));
    for (int j = 0; j < 16; j++) {
        y[j] = (float)((int)(b[2 + j] & 0xF) - 8) * d;
        y[j + 16] = (float)((int)(b[2 + j] >> 4) - 8) * d;
    }
}

void deq_q4_1(const uint8_t* b, float* y) {  // 20 bytes
    float d = fp16_to_f32(rd16(b)), m = fp16_to_f32(rd16(b + 2));
    for (int j = 0; j < 16; j++) {
        y[j] = (float)(b[4 + j] & 0xF) * d + m;
        y[j + 16] = (float)(b[4 + j] >> 4) * d + m;
    }
}

void deq_q5_0(const uint8_t* b, float* y) {  // 22 bytes
    float d = fp16_to_f32(rd16(b));
    uint32_t qh; std::memcpy(&qh, b + 2, 4);
    for (int j = 0; j < 16; j++) {
        int lo = (b[6 + j] & 0xF) | (((qh >> j) & 1) << 4);
        int hi = (b[6 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
        y[j] = (float)(lo - 16) * d;
        y[j + 16] = (float)(hi - 16) * d;
    }
}

void deq_q5_1(const uint8_t* b, float* y) {  // 24 bytes
    float d = fp16_to_f32(rd16(b)), m = fp16_to_f32(rd16(b + 2));
    uint32_t qh; std::memcpy(&qh, b + 4, 4);
    for (int j = 0; j < 16; j++) {
        int lo = (b[8 + j] & 0xF) | (((qh >> j) & 1) << 4);
        int hi = (b[8 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
        y[j] = (float)lo * d + m;
        y[j + 16] = (float)hi * d + m;
    }
}

void deq_q8_0(const uint8_t* b, float* y) {  // 34 bytes
    float d = fp16_to_f32(rd16(b));
    const int8_t* qs = (const int8_t*)(b + 2);
    for (int j = 0; j < 32; j++) y[j] = (float)qs[j] * d;
}

void deq_q8_1(const uint8_t* b, float* y) {  // 40 bytes
    float d = rdf32(b);
    const int8_t* qs = (const int8_t*)(b + 8);
    for (int j = 0; j < 32; j++) y[j] = (float)qs[j] * d;
}

// ------------------------------------------------------------ k-quant dequant

void deq_q2_K(const uint8_t* b, float* y) {  // 84 bytes -> 256
    const uint8_t* sc = b;
    const uint8_t* qs = b + 16;
    float d = fp16_to_f32(rd16(b + 80));
    float dmin = fp16_to_f32(rd16(b + 82));
    for (int half = 0; half < 2; half++) {
        const uint8_t* q = qs + half * 32;
        for (int j = 0; j < 4; j++) {
            int base = half * 128 + j * 32;
            int g = half * 8 + 2 * j;
            float dl1 = d * (float)(sc[g] & 0xF), ml1 = dmin * (float)(sc[g] >> 4);
            float dl2 = d * (float)(sc[g + 1] & 0xF), ml2 = dmin * (float)(sc[g + 1] >> 4);
            for (int i = 0; i < 16; i++) {
                y[base + i] = dl1 * (float)((q[i] >> (2 * j)) & 3) - ml1;
                y[base + 16 + i] = dl2 * (float)((q[16 + i] >> (2 * j)) & 3) - ml2;
            }
        }
    }
}

void q3k_scales(const uint8_t* sc, int32_t* out) {  // 12 packed -> 16 int
    for (int j = 0; j < 16; j++) {
        int s4 = (j < 8) ? (sc[j] & 0xF) : (sc[j - 8] >> 4);
        int s2 = (sc[8 + (j % 4)] >> (2 * (j / 4))) & 3;
        out[j] = (int32_t)(int8_t)(s4 | (s2 << 4)) - 32;
    }
}

void deq_q3_K(const uint8_t* b, float* y) {  // 110 bytes
    const uint8_t* hmask = b;
    const uint8_t* qs = b + 32;
    int32_t sc[16];
    q3k_scales(b + 96, sc);
    float d = fp16_to_f32(rd16(b + 108));
    for (int half = 0; half < 2; half++) {
        const uint8_t* q = qs + half * 32;
        for (int j = 0; j < 4; j++) {
            int mbit = half * 4 + j;
            int base = half * 128 + j * 32;
            int g = half * 8 + 2 * j;
            float dl1 = d * (float)sc[g], dl2 = d * (float)sc[g + 1];
            for (int i = 0; i < 16; i++) {
                int v1 = ((q[i] >> (2 * j)) & 3) - (((hmask[i] >> mbit) & 1) ? 0 : 4);
                int v2 = ((q[16 + i] >> (2 * j)) & 3) - (((hmask[16 + i] >> mbit) & 1) ? 0 : 4);
                y[base + i] = dl1 * (float)v1;
                y[base + 16 + i] = dl2 * (float)v2;
            }
        }
    }
}

void k4_scales(const uint8_t* sc, uint8_t* dout, uint8_t* mout) {  // 12 -> 8+8
    for (int j = 0; j < 8; j++) {
        if (j < 4) {
            dout[j] = sc[j] & 63;
            mout[j] = sc[j + 4] & 63;
        } else {
            dout[j] = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4);
            mout[j] = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4);
        }
    }
}

void deq_q4_K(const uint8_t* b, float* y) {  // 144 bytes
    float d = fp16_to_f32(rd16(b)), dmin = fp16_to_f32(rd16(b + 2));
    uint8_t sd[8], sm[8];
    k4_scales(b + 4, sd, sm);
    const uint8_t* qs = b + 16;
    for (int c = 0; c < 4; c++) {
        float dl = d * (float)sd[2 * c], ml = dmin * (float)sm[2 * c];
        float dh = d * (float)sd[2 * c + 1], mh = dmin * (float)sm[2 * c + 1];
        for (int i = 0; i < 32; i++) {
            y[c * 64 + i] = dl * (float)(qs[c * 32 + i] & 0xF) - ml;
            y[c * 64 + 32 + i] = dh * (float)(qs[c * 32 + i] >> 4) - mh;
        }
    }
}

void deq_q5_K(const uint8_t* b, float* y) {  // 176 bytes
    float d = fp16_to_f32(rd16(b)), dmin = fp16_to_f32(rd16(b + 2));
    uint8_t sd[8], sm[8];
    k4_scales(b + 4, sd, sm);
    const uint8_t* qh = b + 16;
    const uint8_t* qs = b + 48;
    for (int c = 0; c < 4; c++) {
        float dl = d * (float)sd[2 * c], ml = dmin * (float)sm[2 * c];
        float dh = d * (float)sd[2 * c + 1], mh = dmin * (float)sm[2 * c + 1];
        for (int i = 0; i < 32; i++) {
            int lo = (qs[c * 32 + i] & 0xF) | (((qh[i] >> (2 * c)) & 1) << 4);
            int hi = (qs[c * 32 + i] >> 4) | (((qh[i] >> (2 * c + 1)) & 1) << 4);
            y[c * 64 + i] = dl * (float)lo - ml;
            y[c * 64 + 32 + i] = dh * (float)hi - mh;
        }
    }
}

void deq_q6_K(const uint8_t* b, float* y) {  // 210 bytes
    const uint8_t* ql = b;
    const uint8_t* qh = b + 128;
    const int8_t* sc = (const int8_t*)(b + 192);
    float d = fp16_to_f32(rd16(b + 208));
    for (int half = 0; half < 2; half++) {
        const uint8_t* l = ql + half * 64;
        const uint8_t* h = qh + half * 32;
        int base = half * 128;
        for (int i = 0; i < 32; i++) {
            int q1 = (l[i] & 0xF) | (((h[i] >> 0) & 3) << 4);
            int q2 = (l[32 + i] & 0xF) | (((h[i] >> 2) & 3) << 4);
            int q3 = (l[i] >> 4) | (((h[i] >> 4) & 3) << 4);
            int q4 = (l[32 + i] >> 4) | (((h[i] >> 6) & 3) << 4);
            y[base + i] = d * (float)sc[(base + i) / 16] * (float)(q1 - 32);
            y[base + 32 + i] = d * (float)sc[(base + 32 + i) / 16] * (float)(q2 - 32);
            y[base + 64 + i] = d * (float)sc[(base + 64 + i) / 16] * (float)(q3 - 32);
            y[base + 96 + i] = d * (float)sc[(base + 96 + i) / 16] * (float)(q4 - 32);
        }
    }
}

void deq_q8_K(const uint8_t* b, float* y) {  // 292 bytes
    float d = rdf32(b);
    const int8_t* qs = (const int8_t*)(b + 4);
    for (int j = 0; j < 256; j++) y[j] = d * (float)qs[j];
}

// ------------------------------------------------------------ legacy quantize

inline int32_t c_roundf(float x) {  // C roundf: half away from zero
    return (int32_t)truncf(x + copysignf(0.5f, x));
}

void qz_q4_0(const float* x, uint8_t* b) {
    float maxv = 0.f, amax = 0.f;
    for (int j = 0; j < 32; j++) {
        float a = fabsf(x[j]);
        if (a > amax) { amax = a; maxv = x[j]; }
    }
    float d = maxv / -8.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    uint16_t h = f32_to_fp16(d);
    std::memcpy(b, &h, 2);
    uint8_t xi[32];
    for (int j = 0; j < 32; j++)
        xi[j] = (uint8_t)std::min(15, (int)(x[j] * id + 8.5f));
    for (int j = 0; j < 16; j++) b[2 + j] = xi[j] | (xi[j + 16] << 4);
}

void qz_q4_1(const float* x, uint8_t* b) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < 32; j++) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
    float d = (mx - mn) / 15.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    uint16_t hd = f32_to_fp16(d), hm = f32_to_fp16(mn);
    std::memcpy(b, &hd, 2);
    std::memcpy(b + 2, &hm, 2);
    uint8_t xi[32];
    for (int j = 0; j < 32; j++)
        xi[j] = (uint8_t)std::min(15, (int)((x[j] - mn) * id + 0.5f));
    for (int j = 0; j < 16; j++) b[4 + j] = xi[j] | (xi[j + 16] << 4);
}

void qz_q5_0(const float* x, uint8_t* b) {
    float maxv = 0.f, amax = 0.f;
    for (int j = 0; j < 32; j++) {
        float a = fabsf(x[j]);
        if (a > amax) { amax = a; maxv = x[j]; }
    }
    float d = maxv / -16.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    uint16_t h = f32_to_fp16(d);
    std::memcpy(b, &h, 2);
    uint8_t xi[32];
    uint32_t qh = 0;
    for (int j = 0; j < 32; j++) {
        xi[j] = (uint8_t)std::min(31, (int)(x[j] * id + 16.5f));
        qh |= (uint32_t)((xi[j] >> 4) & 1) << j;
    }
    std::memcpy(b + 2, &qh, 4);
    for (int j = 0; j < 16; j++)
        b[6 + j] = (xi[j] & 0xF) | ((xi[j + 16] & 0xF) << 4);
}

void qz_q5_1(const float* x, uint8_t* b) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < 32; j++) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
    float d = (mx - mn) / 31.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    uint16_t hd = f32_to_fp16(d), hm = f32_to_fp16(mn);
    std::memcpy(b, &hd, 2);
    std::memcpy(b + 2, &hm, 2);
    uint8_t xi[32];
    uint32_t qh = 0;
    for (int j = 0; j < 32; j++) {
        xi[j] = (uint8_t)(int)((x[j] - mn) * id + 0.5f);
        qh |= (uint32_t)((xi[j] >> 4) & 1) << j;
    }
    std::memcpy(b + 4, &qh, 4);
    for (int j = 0; j < 16; j++)
        b[8 + j] = (xi[j] & 0xF) | ((xi[j + 16] & 0xF) << 4);
}

void qz_q8_0(const float* x, uint8_t* b) {
    float amax = 0.f;
    for (int j = 0; j < 32; j++) amax = std::max(amax, fabsf(x[j]));
    float d = amax / 127.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    uint16_t h = f32_to_fp16(d);
    std::memcpy(b, &h, 2);
    int8_t* qs = (int8_t*)(b + 2);
    for (int j = 0; j < 32; j++) qs[j] = (int8_t)c_roundf(x[j] * id);
}

void qz_q8_1(const float* x, uint8_t* b) {
    float amax = 0.f;
    for (int j = 0; j < 32; j++) amax = std::max(amax, fabsf(x[j]));
    float d = amax / 127.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    std::memcpy(b, &d, 4);
    int8_t* qs = (int8_t*)(b + 8);
    int32_t sum = 0;
    for (int j = 0; j < 32; j++) {
        qs[j] = (int8_t)c_roundf(x[j] * id);
        sum += qs[j];
    }
    float s = (float)sum * d;
    std::memcpy(b + 4, &s, 4);
}

// ----------------------------------------------------------- K-quant quantize
//
// Scalar ports of the Python reference codecs (ggllm_tpu/quant/kquants.py,
// themselves bit-exact vs the upstream layouts): two-level scale searches
// with weighted-RMSE refinement, then requantization against the
// fp16-rounded super-block scale. Strict f32 arithmetic (-ffp-contract=off)
// keeps every rounding decision identical to the numpy reference.

inline int nearest_int(float x) {  // round-half-to-even (np.rint)
    return (int)std::nearbyintf(x);
}

inline float fp16_rt(float x) {  // value as stored: f32 -> fp16 -> f32
    return fp16_to_f32(f32_to_fp16(x));
}

// weighted-RMSE scale search + greedy per-element refinement (rmse_type 1).
// x[n] -> L[n] in [0, 2*nmax-1], returns the scale.
float kq_search_qx(int n, int nmax, const float* x, int* L) {
    float amax = 0.f, smax = 0.f;
    for (int i = 0; i < n; i++) {
        float ax = fabsf(x[i]);
        if (ax > amax) { amax = ax; smax = x[i]; }
    }
    if (amax == 0.f) {
        for (int i = 0; i < n; i++) L[i] = 0;
        return 0.f;
    }
    float iscale = -(float)nmax / smax;
    int Ls[64];
    float w[64];
    for (int i = 0; i < n; i++) {
        w[i] = x[i] * x[i];
        int l = nearest_int(iscale * x[i]);
        Ls[i] = std::max(-nmax, std::min(nmax - 1, l));
    }
    float sumlx = 0.f, suml2 = 0.f;
    for (int i = 0; i < n; i++) {
        sumlx += w[i] * x[i] * (float)Ls[i];
        suml2 += w[i] * (float)Ls[i] * (float)Ls[i];
    }
    float scale = suml2 != 0.f ? sumlx / suml2 : 0.f;
    float best = scale * sumlx;
    for (int itry = 0; itry < 3; itry++) {
        float isc = scale != 0.f ? 1.0f / scale : 0.f;
        int newL[64];
        bool changed = false;
        for (int i = 0; i < n; i++) {
            int l = nearest_int(isc * x[i]);
            newL[i] = std::max(-nmax, std::min(nmax - 1, l));
            if (newL[i] != Ls[i]) changed = true;
        }
        float slx = 0.f, sl2 = 0.f;
        for (int i = 0; i < n; i++) {
            slx += w[i] * x[i] * (float)newL[i];
            sl2 += w[i] * (float)newL[i] * (float)newL[i];
        }
        if (!changed || sl2 == 0.f || slx * slx <= best * sl2) break;
        for (int i = 0; i < n; i++) Ls[i] = newL[i];
        sumlx = slx;
        suml2 = sl2;
        scale = slx / sl2;
        best = scale * slx;
    }
    for (int sweep = 0; sweep < 5; sweep++) {
        int n_changed = 0;
        for (int i = 0; i < n; i++) {
            float slx = sumlx - w[i] * x[i] * (float)Ls[i];
            if (slx > 0.f) {
                float sl2 = suml2 - w[i] * (float)Ls[i] * (float)Ls[i];
                int cand = nearest_int(x[i] * sl2 / slx);
                cand = std::max(-nmax, std::min(nmax - 1, cand));
                if (cand != Ls[i]) {
                    float slx2 = slx + w[i] * x[i] * (float)cand;
                    float sl22 = sl2 + w[i] * (float)cand * (float)cand;
                    if (sl22 > 0.f && slx2 * slx2 * suml2 > sumlx * sumlx * sl22) {
                        Ls[i] = cand;
                        sumlx = slx2;
                        suml2 = sl22;
                        n_changed++;
                    }
                }
            }
        }
        if (!n_changed) break;
        scale = suml2 != 0.f ? sumlx / suml2 : 0.f;
    }
    for (int i = 0; i < n; i++) L[i] = Ls[i] + nmax;
    return scale;
}

// the q3 variant: no 3-try rescale phase, scale taken at the end.
float kq_search_q3(int n, int nmax, const float* x, int* L) {
    float amax = 0.f, smax = 0.f;
    for (int i = 0; i < n; i++) {
        float ax = fabsf(x[i]);
        if (ax > amax) { amax = ax; smax = x[i]; }
    }
    if (amax == 0.f) {
        for (int i = 0; i < n; i++) L[i] = 0;
        return 0.f;
    }
    float iscale = -(float)nmax / smax;
    int Ls[64];
    float w[64];
    for (int i = 0; i < n; i++) {
        w[i] = x[i] * x[i];
        int l = nearest_int(iscale * x[i]);
        Ls[i] = std::max(-nmax, std::min(nmax - 1, l));
    }
    float sumlx = 0.f, suml2 = 0.f;
    for (int i = 0; i < n; i++) {
        sumlx += w[i] * x[i] * (float)Ls[i];
        suml2 += w[i] * (float)Ls[i] * (float)Ls[i];
    }
    for (int sweep = 0; sweep < 5; sweep++) {
        int n_changed = 0;
        for (int i = 0; i < n; i++) {
            float slx = sumlx - w[i] * x[i] * (float)Ls[i];
            if (slx > 0.f) {
                float sl2 = suml2 - w[i] * (float)Ls[i] * (float)Ls[i];
                int cand = nearest_int(x[i] * sl2 / slx);
                cand = std::max(-nmax, std::min(nmax - 1, cand));
                if (cand != Ls[i]) {
                    float slx2 = slx + w[i] * x[i] * (float)cand;
                    float sl22 = sl2 + w[i] * (float)cand * (float)cand;
                    if (sl22 > 0.f && slx2 * slx2 * suml2 > sumlx * sumlx * sl22) {
                        Ls[i] = cand;
                        sumlx = slx2;
                        suml2 = sl22;
                        n_changed++;
                    }
                }
            }
        }
        if (!n_changed) break;
    }
    float scale = suml2 != 0.f ? sumlx / suml2 : 0.f;
    for (int i = 0; i < n; i++) L[i] = Ls[i] + nmax;
    return scale;
}

// affine (scale, min) search for the min-bearing formats.
// x[n] -> L[n] in [0, nmax]; returns scale, writes the (negated) min.
float kq_search_affine(int n, int nmax, int ntry, const float* x, int* L,
                       float* the_min) {
    float mn = x[0], mx = x[0];
    for (int i = 1; i < n; i++) {
        mn = std::min(mn, x[i]);
        mx = std::max(mx, x[i]);
    }
    if (mx == mn) {
        for (int i = 0; i < n; i++) L[i] = 0;
        *the_min = 0.f;
        return 0.f;
    }
    if (mn > 0.f) mn = 0.f;
    float iscale = (float)nmax / (mx - mn);
    float scale = 1.0f / iscale;
    for (int i = 0; i < n; i++) L[i] = 0;
    for (int itry = 0; itry < ntry; itry++) {
        float sumlx = 0.f;
        int suml2 = 0;
        bool did_change = false;
        for (int i = 0; i < n; i++) {
            int l = nearest_int(iscale * (x[i] - mn));
            l = std::max(0, std::min(nmax, l));
            if (l != L[i]) { L[i] = l; did_change = true; }
            sumlx += (x[i] - mn) * (float)l;
            suml2 += l * l;
        }
        scale = sumlx / (float)suml2;
        float sum = 0.f;
        for (int i = 0; i < n; i++) sum += x[i] - scale * (float)L[i];
        mn = sum / (float)n;
        if (mn > 0.f) mn = 0.f;
        iscale = scale != 0.f ? 1.0f / scale : 0.f;
        if (!did_change) break;
    }
    *the_min = -mn;
    return scale;
}

void qz_q2_K(const float* x, uint8_t* b) {
    float scales[16], mins[16];
    int Lg[16];
    for (int g = 0; g < 16; g++)
        scales[g] = kq_search_affine(16, 3, 5, x + 16 * g, Lg, &mins[g]);
    float max_scale = 0.f, max_min = 0.f;
    for (int g = 0; g < 16; g++) {
        max_scale = std::max(max_scale, scales[g]);
        max_min = std::max(max_min, mins[g]);
    }
    uint8_t sc[16] = {0};
    uint16_t dh = 0, dmh = 0;
    if (max_scale > 0.f) {
        float isc = 15.0f / max_scale;
        for (int g = 0; g < 16; g++) sc[g] = (uint8_t)nearest_int(isc * scales[g]);
        dh = f32_to_fp16(max_scale / 15.0f);
    }
    if (max_min > 0.f) {
        float imn = 15.0f / max_min;
        for (int g = 0; g < 16; g++)
            sc[g] |= (uint8_t)((uint8_t)nearest_int(imn * mins[g]) << 4);
        dmh = f32_to_fp16(max_min / 15.0f);
    }
    float df = fp16_to_f32(dh), dmf = fp16_to_f32(dmh);
    uint8_t L[256];
    for (int g = 0; g < 16; g++) {
        float dl = df * (float)(sc[g] & 0xF);
        float ml = dmf * (float)(sc[g] >> 4);
        for (int i = 0; i < 16; i++) {
            int l = 0;
            if (dl != 0.f) {
                l = nearest_int((x[16 * g + i] + ml) / dl);
                l = std::max(0, std::min(3, l));
            }
            L[16 * g + i] = (uint8_t)l;
        }
    }
    std::memcpy(b, sc, 16);
    for (int half = 0; half < 2; half++)
        for (int l = 0; l < 32; l++) {
            const uint8_t* s = L + 128 * half;
            b[16 + 32 * half + l] =
                (uint8_t)(s[l] | (s[l + 32] << 2) | (s[l + 64] << 4) | (s[l + 96] << 6));
        }
    std::memcpy(b + 80, &dh, 2);
    std::memcpy(b + 82, &dmh, 2);
}

void qz_q3_K(const float* x, uint8_t* b) {
    float scales[16];
    int Lg[16];
    for (int g = 0; g < 16; g++)
        scales[g] = kq_search_q3(16, 4, x + 16 * g, Lg);
    float amax = 0.f, max_scale = 0.f;
    for (int g = 0; g < 16; g++) {
        float a = fabsf(scales[g]);
        if (a > amax) { amax = a; max_scale = scales[g]; }
    }
    uint8_t scb[12] = {0};
    uint16_t dh = 0;
    if (amax != 0.f) {
        float isc = -32.0f / max_scale;
        for (int g = 0; g < 16; g++) {
            int l = std::max(-32, std::min(31, nearest_int(isc * scales[g]))) + 32;
            if (g < 8) scb[g] = (uint8_t)(l & 0xF);
            else scb[g - 8] |= (uint8_t)((l & 0xF) << 4);
            scb[8 + g % 4] |= (uint8_t)((l >> 4) << (2 * (g / 4)));
        }
        dh = f32_to_fp16(1.0f / isc);
    }
    int32_t sdec[16];
    q3k_scales(scb, sdec);
    float df = fp16_to_f32(dh);
    uint8_t L[256];
    uint8_t hmask[32] = {0};
    for (int g = 0; g < 16; g++) {
        float dl = df * (float)sdec[g];
        for (int i = 0; i < 16; i++) {
            int j = 16 * g + i;
            int l = 0;
            if (dl != 0.f) {  // dl == 0 stores level 0 WITHOUT the +4 bias
                l = nearest_int(x[j] / dl);
                l = std::max(-4, std::min(3, l)) + 4;
            }
            if (l > 3) { hmask[j % 32] |= (uint8_t)(1 << (j / 32)); l -= 4; }
            L[j] = (uint8_t)l;
        }
    }
    std::memcpy(b, hmask, 32);
    for (int half = 0; half < 2; half++)
        for (int l = 0; l < 32; l++) {
            const uint8_t* s = L + 128 * half;
            b[32 + 32 * half + l] =
                (uint8_t)(s[l] | (s[l + 32] << 2) | (s[l + 64] << 4) | (s[l + 96] << 6));
        }
    std::memcpy(b + 96, scb, 12);
    std::memcpy(b + 108, &dh, 2);
}

// shared Q4_K/Q5_K path: 8 groups of 32, 6-bit packed scale/min pairs.
void qz_q45_K(const float* x, int nmax, uint16_t* dh, uint16_t* dmh,
              uint8_t* scb, uint8_t* L) {
    float scales[8], mins[8];
    int Lg[32];
    for (int g = 0; g < 8; g++)
        scales[g] = kq_search_affine(32, nmax, 5, x + 32 * g, Lg, &mins[g]);
    float max_scale = 0.f, max_min = 0.f;
    for (int g = 0; g < 8; g++) {
        max_scale = std::max(max_scale, scales[g]);
        max_min = std::max(max_min, mins[g]);
    }
    float inv_scale = max_scale > 0.f ? 63.0f / max_scale : 0.f;
    float inv_min = max_min > 0.f ? 63.0f / max_min : 0.f;
    for (int j = 0; j < 12; j++) scb[j] = 0;
    for (int g = 0; g < 8; g++) {
        uint8_t ls = (uint8_t)std::min(63, nearest_int(inv_scale * scales[g]));
        uint8_t lm = (uint8_t)std::min(63, nearest_int(inv_min * mins[g]));
        if (g < 4) {
            scb[g] = ls;
            scb[g + 4] = lm;
        } else {
            scb[g + 4] = (uint8_t)((ls & 0xF) | ((lm & 0xF) << 4));
            scb[g - 4] |= (uint8_t)((ls >> 4) << 6);
            scb[g] |= (uint8_t)((lm >> 4) << 6);
        }
    }
    *dh = f32_to_fp16(max_scale / 63.0f);
    *dmh = f32_to_fp16(max_min / 63.0f);
    uint8_t sd[8], sm[8];
    k4_scales(scb, sd, sm);
    float df = fp16_to_f32(*dh), dmf = fp16_to_f32(*dmh);
    for (int g = 0; g < 8; g++) {
        float dl = df * (float)sd[g];
        float ml = dmf * (float)sm[g];
        for (int i = 0; i < 32; i++) {
            int l = 0;
            if (dl != 0.f) {
                l = nearest_int((x[32 * g + i] + ml) / dl);
                l = std::max(0, std::min(nmax, l));
            }
            L[32 * g + i] = (uint8_t)l;
        }
    }
}

void qz_q4_K(const float* x, uint8_t* b) {
    uint16_t dh, dmh;
    uint8_t L[256];
    qz_q45_K(x, 15, &dh, &dmh, b + 4, L);
    std::memcpy(b, &dh, 2);
    std::memcpy(b + 2, &dmh, 2);
    for (int j = 0; j < 4; j++)
        for (int l = 0; l < 32; l++)
            b[16 + 32 * j + l] =
                (uint8_t)(L[64 * j + l] | (L[64 * j + 32 + l] << 4));
}

void qz_q5_K(const float* x, uint8_t* b) {
    uint16_t dh, dmh;
    uint8_t L[256];
    qz_q45_K(x, 31, &dh, &dmh, b + 4, L);
    std::memcpy(b, &dh, 2);
    std::memcpy(b + 2, &dmh, 2);
    uint8_t* qh = b + 16;
    uint8_t* ql = b + 48;
    for (int j = 0; j < 32; j++) qh[j] = 0;
    for (int j = 0; j < 4; j++)
        for (int l = 0; l < 32; l++) {
            uint8_t l1 = L[64 * j + l], l2 = L[64 * j + 32 + l];
            qh[l] |= (uint8_t)(((l1 > 15) << (2 * j)) | ((l2 > 15) << (2 * j + 1)));
            ql[32 * j + l] = (uint8_t)((l1 & 0xF) | ((l2 & 0xF) << 4));
        }
}

void qz_q6_K(const float* x, uint8_t* b) {
    float scales[16];
    int Lg[16];
    for (int g = 0; g < 16; g++)
        scales[g] = kq_search_qx(16, 32, x + 16 * g, Lg);
    float amax = 0.f, max_scale = 0.f;
    for (int g = 0; g < 16; g++) {
        float a = fabsf(scales[g]);
        if (a > amax) { amax = a; max_scale = scales[g]; }
    }
    int8_t sc8[16] = {0};
    uint16_t dh = 0;
    if (amax != 0.f) {
        float iscale = -128.0f / max_scale;
        for (int g = 0; g < 16; g++)
            sc8[g] = (int8_t)std::min(127, nearest_int(iscale * scales[g]));
        dh = f32_to_fp16(1.0f / iscale);
    }
    float df = fp16_to_f32(dh);
    uint8_t L[256];
    for (int g = 0; g < 16; g++) {
        float dl = df * (float)sc8[g];
        for (int i = 0; i < 16; i++) {
            int l = 0;
            if (dl != 0.f) {
                l = nearest_int(x[16 * g + i] / dl);
                l = std::max(-32, std::min(31, l)) + 32;
            }
            L[16 * g + i] = (uint8_t)l;
        }
    }
    uint8_t* ql = b;
    uint8_t* qh = b + 128;
    for (int half = 0; half < 2; half++) {
        const uint8_t* s = L + 128 * half;
        for (int l = 0; l < 32; l++) {
            uint8_t q1 = s[l], q2 = s[l + 32], q3 = s[l + 64], q4 = s[l + 96];
            ql[64 * half + l] = (uint8_t)((q1 & 0xF) | ((q3 & 0xF) << 4));
            ql[64 * half + 32 + l] = (uint8_t)((q2 & 0xF) | ((q4 & 0xF) << 4));
            qh[32 * half + l] =
                (uint8_t)((q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6));
        }
    }
    std::memcpy(b + 192, sc8, 16);
    std::memcpy(b + 208, &dh, 2);
}

void qz_q8_K(const float* x, uint8_t* b) {
    float amax = 0.f, smax = 0.f;
    for (int i = 0; i < 256; i++) {
        float ax = fabsf(x[i]);
        if (ax > amax) { amax = ax; smax = x[i]; }
    }
    int8_t qs[256] = {0};
    float d = 0.f;
    if (amax != 0.f) {
        float iscale = -128.0f / smax;
        for (int i = 0; i < 256; i++)
            qs[i] = (int8_t)std::min(127, nearest_int(iscale * x[i]));
        d = 1.0f / iscale;
    }
    int16_t bsums[16];
    for (int g = 0; g < 16; g++) {
        int s = 0;
        for (int i = 0; i < 16; i++) s += qs[16 * g + i];
        bsums[g] = (int16_t)s;
    }
    std::memcpy(b, &d, 4);
    std::memcpy(b + 4, qs, 256);
    std::memcpy(b + 260, bsums, 32);
}

// ------------------------------------------------------------- kernel repack
//
// Planar blobs -> fused-kernel bit-plane layout (kernels/layout.py
// _pack_plane semantics): the contraction dim splits into n_k chunks of ck
// columns; a b-bit plane stores 8/b code groups per byte, where within
// chunk c byte row r's bit-field i covers column c*ck + i*(ck/(8/b)) + r.
// This is the model-load hot path (to_kernel): pure byte shuffling that
// numpy does via int16 intermediates + transposes — minutes for a 7B file
// on a 1-core host; one fused C++ pass is ~10-20x.

// 4/5-bit planar code: nibble j<16 low / j-16 high of block byte row
inline uint8_t nib_code(const uint8_t* qs_row, int64_t k) {
    int64_t b = k >> 5;
    int j = (int)(k & 31);
    uint8_t byte = qs_row[b * 16 + (j & 15)];
    return j < 16 ? (byte & 0xF) : (byte >> 4);
}

void repack_q4(const uint8_t* qs, int64_t O, int64_t K, int64_t kp,
               int64_t ck, uint8_t* out, int64_t row_bytes) {
    int64_t n_k = kp / ck, half = ck / 2;
    for (int64_t c = 0; c < n_k; c++)
        for (int64_t r = 0; r < half; r++) {
            uint8_t* dst = out + (c * half + r) * O;
            int64_t k_lo = c * ck + r, k_hi = c * ck + half + r;
            if (k_hi < K) {
                for (int64_t o = 0; o < O; o++) {
                    const uint8_t* row = qs + o * row_bytes;
                    dst[o] = (uint8_t)(nib_code(row, k_lo)
                                       | (nib_code(row, k_hi) << 4));
                }
            } else if (k_lo < K) {
                for (int64_t o = 0; o < O; o++)
                    dst[o] = nib_code(qs + o * row_bytes, k_lo);
            } else {
                std::memset(dst, 0, O);
            }
        }
}

// q5 high-bit plane: 8 one-bit fields per byte; bit j of the block's u32
void repack_h1(const uint8_t* qh, int64_t O, int64_t K, int64_t kp,
               int64_t ck, uint8_t* out, int64_t row_bytes) {
    int64_t n_k = kp / ck, rows = ck / 8, part = ck / 8;
    for (int64_t c = 0; c < n_k; c++)
        for (int64_t r = 0; r < rows; r++) {
            uint8_t* dst = out + (c * rows + r) * O;
            std::memset(dst, 0, O);
            for (int i = 0; i < 8; i++) {
                int64_t k = c * ck + i * part + r;
                if (k >= K) continue;
                int64_t b = k >> 5;
                int j = (int)(k & 31);
                for (int64_t o = 0; o < O; o++) {
                    uint32_t h;
                    std::memcpy(&h, qh + o * row_bytes + b * 4, 4);
                    dst[o] |= (uint8_t)(((h >> j) & 1) << i);
                }
            }
        }
}

void repack_q8(const uint8_t* qs, int64_t O, int64_t K, int64_t kp,
               int64_t ck, uint8_t* out, int64_t row_bytes) {
    int64_t n_k = kp / ck;
    for (int64_t c = 0; c < n_k; c++)
        for (int64_t r = 0; r < ck; r++) {
            uint8_t* dst = out + (c * ck + r) * O;
            int64_t k = c * ck + r;
            if (k >= K) {
                std::memset(dst, 0, O);
                continue;
            }
            int64_t b = k >> 5;
            int j = (int)(k & 31);
            for (int64_t o = 0; o < O; o++)
                dst[o] = qs[o * row_bytes + b * 32 + j];
        }
}

// ------------------------------------------------------------------ tables

struct Fmt {
    int block;      // elements per block
    int bytes;      // bytes per block
    void (*deq)(const uint8_t*, float*);
    void (*qz)(const float*, uint8_t*);
};

// indexed by the ggml type id (ggml.h enum / core/dtypes.py)
Fmt fmt_of(int gtype) {
    switch (gtype) {
        case 2:  return {32, 18, deq_q4_0, qz_q4_0};   // Q4_0
        case 3:  return {32, 20, deq_q4_1, qz_q4_1};   // Q4_1
        case 6:  return {32, 22, deq_q5_0, qz_q5_0};   // Q5_0
        case 7:  return {32, 24, deq_q5_1, qz_q5_1};   // Q5_1
        case 8:  return {32, 34, deq_q8_0, qz_q8_0};   // Q8_0
        case 9:  return {32, 40, deq_q8_1, qz_q8_1};   // Q8_1
        case 10: return {256, 84, deq_q2_K, qz_q2_K};  // Q2_K
        case 11: return {256, 110, deq_q3_K, qz_q3_K}; // Q3_K
        case 12: return {256, 144, deq_q4_K, qz_q4_K}; // Q4_K
        case 13: return {256, 176, deq_q5_K, qz_q5_K}; // Q5_K
        case 14: return {256, 210, deq_q6_K, qz_q6_K}; // Q6_K
        case 15: return {256, 292, deq_q8_K, qz_q8_K}; // Q8_K
        default: return {0, 0, nullptr, nullptr};
    }
}

template <typename F>
void parallel_blocks(int64_t nb, int nthreads, F f) {
    nthreads = std::max(1, std::min<int>(nthreads, (int)std::thread::hardware_concurrency()));
    if (nthreads <= 1 || nb < 1024) {
        f(0, nb);
        return;
    }
    std::vector<std::thread> ts;
    int64_t per = (nb + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        int64_t lo = t * per, hi = std::min<int64_t>(nb, lo + per);
        if (lo >= hi) break;
        ts.emplace_back([=] { f(lo, hi); });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// blob of nb blocks -> nb*block floats. Returns 0 on success.
int gq_dequantize(int gtype, const uint8_t* blob, float* out, int64_t nb,
                  int nthreads) {
    Fmt fm = fmt_of(gtype);
    if (!fm.deq) return 1;
    parallel_blocks(nb, nthreads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++)
            fm.deq(blob + i * fm.bytes, out + i * fm.block);
    });
    return 0;
}

// nb*block floats -> blob. Returns 0 on success, 1 if unsupported.
int gq_quantize(int gtype, const float* in, uint8_t* out, int64_t nb,
                int nthreads) {
    Fmt fm = fmt_of(gtype);
    if (!fm.qz) return 1;
    parallel_blocks(nb, nthreads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++)
            fm.qz(in + i * fm.block, out + i * fm.bytes);
    });
    return 0;
}

int gq_block_size(int gtype) { return fmt_of(gtype).block; }
int gq_type_size(int gtype) { return fmt_of(gtype).bytes; }

// Planar code plane -> fused-kernel packed plane (kernels/layout.to_kernel
// fast path). plane: 0 = the 4-bit "q" plane (or the int8 q8_0 plane),
// 1 = the 1-bit "h" high-bit plane (q5_0/q5_1). qdata points at the
// per-row code bytes (the "qs"/"qh" planar array), row_bytes apart.
// Output rows are O-contiguous per (chunk, byte-row) as the Pallas kernels
// expect. Supported: 2/3 (q4_0/q4_1), 6/7 (q5_0/q5_1), 8 (q8_0).
int gq_repack(int gtype, int plane, const uint8_t* qdata, int64_t row_bytes,
              int64_t O, int64_t K, int64_t kp, int64_t ck, uint8_t* out,
              int nthreads) {
    (void)nthreads;  // single pass is memory-bound; host is 1-core anyway
    switch (gtype) {
        case 2: case 3:
            if (plane != 0) return 1;
            repack_q4(qdata, O, K, kp, ck, out, row_bytes);
            return 0;
        case 6: case 7:
            if (plane == 0) repack_q4(qdata, O, K, kp, ck, out, row_bytes);
            else repack_h1(qdata, O, K, kp, ck, out, row_bytes);
            return 0;
        case 8:
            if (plane != 0) return 1;
            repack_q8(qdata, O, K, kp, ck, out, row_bytes);
            return 0;
        default:
            return 1;
    }
}

}  // extern "C"
