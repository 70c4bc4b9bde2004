// Native host-side weight conversion + quantization for alg_tpu.
//
// The checkpoint-load path (io/weights.py, ops/quant.py host_init /
// quantize-before-streaming) converts bf16 safetensors tensors to f32 and
// quantizes block kernels to int8/int4 on the HOST before streaming to the
// TPU. numpy does this in ~8 temporaries per kernel (abs, max, divide,
// round, clip, astype, slice, pack) at ~0.03 GB/s; these fused single-pass
// loops run at memory speed. Results are BITWISE identical to the numpy
// reference implementations in ops/quant.py (round-half-to-even via
// nearbyintf under the default FE_TONEAREST mode, true f32 division by the
// scale — not reciprocal multiply).
//
// Layout contract (C-contiguous, Python flattens leading dims):
//   w:      [lead, kin, kout]  f32 or bf16 (uint16 storage)
//   wq8:    [lead, kin, kout]  int8
//   scale8: [lead, kout]       f32   (per-(lead,out) over the IN axis)
//   wq4:    [lead, kin/2, kout] int8 (low nibble = even IN row, high = odd)
//   s4:     [lead, kin/group, kout] f32
//   s8:     [lead, kout]       f32
//
// Reference for the semantics being matched: /root/reference has no native
// loader; this is a beyond-parity TPU-runtime component (SURVEY.md §5 aux).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <vector>
#include <thread>

namespace {

inline float bf16_to_f32(uint16_t v) {
    uint32_t bits = static_cast<uint32_t>(v) << 16;
    float out;
    std::memcpy(&out, &bits, sizeof(out));
    return out;
}

// Gather one IN-row of w as f32 regardless of storage dtype.
struct F32Src {
    const float* p;
    inline float operator()(int64_t i) const { return p[i]; }
};
struct BF16Src {
    const uint16_t* p;
    inline float operator()(int64_t i) const { return bf16_to_f32(p[i]); }
};

template <typename Src>
void quant_w8_one(Src w, int64_t kin, int64_t kout, int8_t* wq, float* scale,
                  float* absmax /* scratch [kout] */) {
    for (int64_t o = 0; o < kout; ++o) absmax[o] = 0.0f;
    for (int64_t i = 0; i < kin; ++i) {
        const int64_t row = i * kout;
        for (int64_t o = 0; o < kout; ++o) {
            float a = std::fabs(w(row + o));
            if (a > absmax[o]) absmax[o] = a;
        }
    }
    for (int64_t o = 0; o < kout; ++o)
        scale[o] = std::max(absmax[o], 1e-12f) / 127.0f;
    for (int64_t i = 0; i < kin; ++i) {
        const int64_t row = i * kout;
        for (int64_t o = 0; o < kout; ++o) {
            float q = nearbyintf(w(row + o) / scale[o]);
            q = std::min(127.0f, std::max(-127.0f, q));
            wq[row + o] = static_cast<int8_t>(q);
        }
    }
}

template <typename Src>
void quant_w4_one(Src w, int64_t kin, int64_t kout, int64_t group,
                  int8_t* packed, float* s4, float* s8,
                  float* scratch /* [2*kout] */) {
    float* amax = scratch;        // group absmax
    float* srow = scratch + kout; // group scale
    for (int64_t o = 0; o < kout; ++o) s8[o] = 0.0f; // running max of 7*s4
    const int64_t g_cnt = kin / group;
    for (int64_t g = 0; g < g_cnt; ++g) {
        const int64_t row0 = g * group;
        for (int64_t o = 0; o < kout; ++o) amax[o] = 0.0f;
        for (int64_t i = 0; i < group; ++i) {
            const int64_t row = (row0 + i) * kout;
            for (int64_t o = 0; o < kout; ++o) {
                float a = std::fabs(w(row + o));
                if (a > amax[o]) amax[o] = a;
            }
        }
        float* s4g = s4 + g * kout;
        for (int64_t o = 0; o < kout; ++o) {
            float s = std::max(amax[o], 1e-12f) / 7.0f;
            s4g[o] = s;
            srow[o] = s;
            float cand = 7.0f * s;
            if (cand > s8[o]) s8[o] = cand;
        }
        // group is even (validated in Python): pack row pairs within group
        for (int64_t i = 0; i < group; i += 2) {
            const int64_t rlo = (row0 + i) * kout;
            const int64_t rhi = rlo + kout;
            int8_t* prow = packed + ((row0 + i) / 2) * kout;
            for (int64_t o = 0; o < kout; ++o) {
                float qlo = nearbyintf(w(rlo + o) / srow[o]);
                float qhi = nearbyintf(w(rhi + o) / srow[o]);
                int lo = static_cast<int>(std::min(7.0f, std::max(-7.0f, qlo)));
                int hi = static_cast<int>(std::min(7.0f, std::max(-7.0f, qhi)));
                prow[o] = static_cast<int8_t>((lo & 0x0F) | (hi << 4));
            }
        }
    }
    for (int64_t o = 0; o < kout; ++o)
        s8[o] = std::max(s8[o], 1e-12f) / 127.0f;
}

// Run fn(l) for l in [0, lead) across nthreads (lead-level parallelism: each
// [kin, kout] kernel slab is independent).
template <typename Fn>
void parallel_lead(int64_t lead, int nthreads, Fn fn) {
    if (nthreads <= 1 || lead <= 1) {
        for (int64_t l = 0; l < lead; ++l) fn(l);
        return;
    }
    std::vector<std::thread> ts;
    int n = static_cast<int>(std::min<int64_t>(nthreads, lead));
    for (int t = 0; t < n; ++t)
        ts.emplace_back([=] {
            for (int64_t l = t; l < lead; l += n) fn(l);
        });
    for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

void alg_bf16_to_f32(const uint16_t* src, float* dst, int64_t n, int nthreads) {
    if (nthreads <= 1) {
        for (int64_t i = 0; i < n; ++i) dst[i] = bf16_to_f32(src[i]);
        return;
    }
    int64_t chunk = (n + nthreads - 1) / nthreads;
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; ++t) {
        int64_t a = t * chunk, b = std::min(n, a + chunk);
        if (a >= b) break;
        ts.emplace_back([=] {
            for (int64_t i = a; i < b; ++i) dst[i] = bf16_to_f32(src[i]);
        });
    }
    for (auto& th : ts) th.join();
}

void alg_quant_w8_f32(const float* w, int64_t lead, int64_t kin, int64_t kout,
                      int8_t* wq, float* scale, int nthreads) {
    parallel_lead(lead, nthreads, [=](int64_t l) {
        std::vector<float> scratch(kout);
        quant_w8_one(F32Src{w + l * kin * kout}, kin, kout,
                     wq + l * kin * kout, scale + l * kout, scratch.data());
    });
}

void alg_quant_w8_bf16(const uint16_t* w, int64_t lead, int64_t kin,
                       int64_t kout, int8_t* wq, float* scale, int nthreads) {
    parallel_lead(lead, nthreads, [=](int64_t l) {
        std::vector<float> scratch(kout);
        quant_w8_one(BF16Src{w + l * kin * kout}, kin, kout,
                     wq + l * kin * kout, scale + l * kout, scratch.data());
    });
}

void alg_quant_w4_f32(const float* w, int64_t lead, int64_t kin, int64_t kout,
                      int64_t group, int8_t* packed, float* s4, float* s8,
                      int nthreads) {
    const int64_t g_cnt = kin / group;
    parallel_lead(lead, nthreads, [=](int64_t l) {
        std::vector<float> scratch(2 * kout);
        quant_w4_one(F32Src{w + l * kin * kout}, kin, kout, group,
                     packed + l * (kin / 2) * kout, s4 + l * g_cnt * kout,
                     s8 + l * kout, scratch.data());
    });
}

void alg_quant_w4_bf16(const uint16_t* w, int64_t lead, int64_t kin,
                       int64_t kout, int64_t group, int8_t* packed, float* s4,
                       float* s8, int nthreads) {
    const int64_t g_cnt = kin / group;
    parallel_lead(lead, nthreads, [=](int64_t l) {
        std::vector<float> scratch(2 * kout);
        quant_w4_one(BF16Src{w + l * kin * kout}, kin, kout, group,
                     packed + l * (kin / 2) * kout, s4 + l * g_cnt * kout,
                     s8 + l * kout, scratch.data());
    });
}

}  // extern "C"
