#include "kws/int8_kernels.h"

#include <algorithm>
#include <cmath>

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#define WEKWS_X86 1
#endif

namespace wekws {

namespace {

// ---------- scalar reference (and non-x86 fallback) ----------

void AxpyRowScalar(int32_t* acc, const int8_t* w, int32_t v, int n) {
  for (int j = 0; j < n; ++j) acc[j] += v * w[j];
}

void MulAccumScalar(int32_t* acc, const int32_t* in, const int8_t* w, int n) {
  for (int j = 0; j < n; ++j) acc[j] += in[j] * w[j];
}

void QuantizeScalar(const float* x, size_t n, float scale, int zp,
                    int32_t* out) {
  for (size_t i = 0; i < n; ++i) {
    float q = std::nearbyint(x[i] / scale) + static_cast<float>(zp);
    q = std::min(127.0f, std::max(-128.0f, q));
    out[i] = static_cast<int32_t>(q) - zp;
  }
}

void DequantRowScalar(float* out, const int32_t* acc, float scale,
                      const float* wscale, const float* bias, int n) {
  if (bias != nullptr) {
    for (int j = 0; j < n; ++j) {
      out[j] = static_cast<float>(acc[j]) * (scale * wscale[j]) + bias[j];
    }
  } else {
    for (int j = 0; j < n; ++j) {
      out[j] = static_cast<float>(acc[j]) * (scale * wscale[j]);
    }
  }
}

void QuantizeU8Scalar(const float* x, size_t n, float scale, int zp,
                      uint8_t* out) {
  for (size_t i = 0; i < n; ++i) {
    float q = std::nearbyint(x[i] / scale) + static_cast<float>(zp);
    q = std::min(127.0f, std::max(-128.0f, q));
    out[i] = static_cast<uint8_t>(static_cast<int32_t>(q) + 128);
  }
}

void PackedDotScalar(int32_t* acc, const uint8_t* a, const int8_t* packed,
                     int groups, int cout) {
  const int coblocks = (cout + 7) / 8;
  for (int cb = 0; cb < coblocks; ++cb) {
    const int8_t* pb = packed + static_cast<size_t>(cb) * groups * 32;
    for (int g = 0; g < groups; ++g) {
      const uint8_t* av = a + g * 4;
      const int8_t* wv = pb + g * 32;
      for (int lane = 0; lane < 8; ++lane) {
        int32_t s = 0;
        for (int j = 0; j < 4; ++j) {
          s += static_cast<int32_t>(av[j]) *
               static_cast<int32_t>(wv[lane * 4 + j]);
        }
        acc[cb * 8 + lane] += s;
      }
    }
  }
}

#ifdef WEKWS_X86

// ---------- AVX2 (compiled with a target attribute so the TU builds
// without -mavx2; dispatch picks it only when the CPU supports it) ----

__attribute__((target("avx2")))
void AxpyRowAvx2(int32_t* acc, const int8_t* w, int32_t v, int n) {
  const __m256i vv = _mm256_set1_epi32(v);
  int j = 0;
  for (; j + 8 <= n; j += 8) {
    const __m128i w8 =
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + j));
    const __m256i w32 = _mm256_cvtepi8_epi32(w8);
    const __m256i a =
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + j));
    const __m256i prod = _mm256_mullo_epi32(vv, w32);
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(acc + j),
                        _mm256_add_epi32(a, prod));
  }
  for (; j < n; ++j) acc[j] += v * w[j];
}

__attribute__((target("avx2")))
void MulAccumAvx2(int32_t* acc, const int32_t* in, const int8_t* w, int n) {
  int j = 0;
  for (; j + 8 <= n; j += 8) {
    const __m128i w8 =
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + j));
    const __m256i w32 = _mm256_cvtepi8_epi32(w8);
    const __m256i x =
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(in + j));
    const __m256i a =
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + j));
    _mm256_storeu_si256(
        reinterpret_cast<__m256i*>(acc + j),
        _mm256_add_epi32(a, _mm256_mullo_epi32(x, w32)));
  }
  for (; j < n; ++j) acc[j] += in[j] * w[j];
}

// Bit-exact with QuantizeScalar: same divide, round-to-nearest-even
// (_MM_FROUND_TO_NEAREST_INT == FE_TONEAREST default), clamp in f32,
// then the zero-point shift in int32.
__attribute__((target("avx2")))
void QuantizeAvx2(const float* x, size_t n, float scale, int zp,
                  int32_t* out) {
  const __m256 vs = _mm256_set1_ps(scale);
  const __m256 vzp = _mm256_set1_ps(static_cast<float>(zp));
  const __m256 lo = _mm256_set1_ps(-128.0f);
  const __m256 hi = _mm256_set1_ps(127.0f);
  const __m256i vzpi = _mm256_set1_epi32(zp);
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    __m256 q = _mm256_div_ps(_mm256_loadu_ps(x + i), vs);
    q = _mm256_round_ps(q, _MM_FROUND_TO_NEAREST_INT | _MM_FROUND_NO_EXC);
    q = _mm256_add_ps(q, vzp);
    q = _mm256_min_ps(hi, _mm256_max_ps(lo, q));
    const __m256i qi = _mm256_cvtps_epi32(q);  // integral already
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(out + i),
                        _mm256_sub_epi32(qi, vzpi));
  }
  if (i < n) QuantizeScalar(x + i, n - i, scale, zp, out + i);
}

__attribute__((target("avx2")))
void DequantRowAvx2(float* out, const int32_t* acc, float scale,
                    const float* wscale, const float* bias, int n) {
  const __m256 vs = _mm256_set1_ps(scale);
  int j = 0;
  for (; j + 8 <= n; j += 8) {
    const __m256 a = _mm256_cvtepi32_ps(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + j)));
    __m256 r = _mm256_mul_ps(a, _mm256_mul_ps(vs, _mm256_loadu_ps(wscale + j)));
    if (bias != nullptr) r = _mm256_add_ps(r, _mm256_loadu_ps(bias + j));
    _mm256_storeu_ps(out + j, r);
  }
  DequantRowScalar(out + j, acc + j, scale, wscale + j,
                   bias != nullptr ? bias + j : nullptr, n - j);
}

// ---------- AVX-VNNI: u8·s8 packed dot, 64 MACs per vpdpbusd ----------

__attribute__((target("avxvnni,avx2")))
void PackedDotVnni(int32_t* acc, const uint8_t* a, const int8_t* packed,
                   int groups, int cout) {
  const int coblocks = (cout + 7) / 8;
  const int32_t* a32 = reinterpret_cast<const int32_t*>(a);
  for (int cb = 0; cb < coblocks; ++cb) {
    __m256i av = _mm256_loadu_si256(
        reinterpret_cast<const __m256i*>(acc + cb * 8));
    const int8_t* pb = packed + static_cast<size_t>(cb) * groups * 32;
    int g = 0;
    for (; g + 2 <= groups; g += 2) {
      const __m256i va0 = _mm256_set1_epi32(a32[g]);
      const __m256i vb0 = _mm256_loadu_si256(
          reinterpret_cast<const __m256i*>(pb + static_cast<size_t>(g) * 32));
      av = _mm256_dpbusd_avx_epi32(av, va0, vb0);
      const __m256i va1 = _mm256_set1_epi32(a32[g + 1]);
      const __m256i vb1 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(
          pb + static_cast<size_t>(g + 1) * 32));
      av = _mm256_dpbusd_avx_epi32(av, va1, vb1);
    }
    for (; g < groups; ++g) {
      const __m256i va = _mm256_set1_epi32(a32[g]);
      const __m256i vb = _mm256_loadu_si256(
          reinterpret_cast<const __m256i*>(pb + static_cast<size_t>(g) * 32));
      av = _mm256_dpbusd_avx_epi32(av, va, vb);
    }
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(acc + cb * 8), av);
  }
}

bool HasAvx2() { return __builtin_cpu_supports("avx2"); }
bool HasAvxVnni() {
  return __builtin_cpu_supports("avxvnni") && HasAvx2();
}

#endif  // WEKWS_X86

}  // namespace

#ifdef WEKWS_X86
void (*Int8AxpyRow)(int32_t*, const int8_t*, int32_t, int) =
    HasAvx2() ? AxpyRowAvx2 : AxpyRowScalar;
void (*Int8MulAccum)(int32_t*, const int32_t*, const int8_t*, int) =
    HasAvx2() ? MulAccumAvx2 : MulAccumScalar;
void (*QuantizeShiftedVec)(const float*, size_t, float, int, int32_t*) =
    HasAvx2() ? QuantizeAvx2 : QuantizeScalar;
void (*DequantRow)(float*, const int32_t*, float, const float*, const float*,
                   int) = HasAvx2() ? DequantRowAvx2 : DequantRowScalar;
void (*Int8PackedDot)(int32_t*, const uint8_t*, const int8_t*, int, int) =
    HasAvxVnni() ? PackedDotVnni : PackedDotScalar;
void (*QuantizeU8Vec)(const float*, size_t, float, int, uint8_t*) =
    QuantizeU8Scalar;
bool Int8PackedDotAvailable() { return HasAvxVnni(); }
#else
void (*Int8AxpyRow)(int32_t*, const int8_t*, int32_t, int) = AxpyRowScalar;
void (*Int8MulAccum)(int32_t*, const int32_t*, const int8_t*, int) =
    MulAccumScalar;
void (*QuantizeShiftedVec)(const float*, size_t, float, int, int32_t*) =
    QuantizeScalar;
void (*DequantRow)(float*, const int32_t*, float, const float*, const float*,
                   int) = DequantRowScalar;
void (*Int8PackedDot)(int32_t*, const uint8_t*, const int8_t*, int, int) =
    PackedDotScalar;
void (*QuantizeU8Vec)(const float*, size_t, float, int, uint8_t*) =
    QuantizeU8Scalar;
bool Int8PackedDotAvailable() { return false; }
#endif

}  // namespace wekws
