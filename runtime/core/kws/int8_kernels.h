// SIMD int8 inner kernels for the graph interpreter.
//
// The reference's int8 path is ONNX Runtime's qnnpack kernels
// (/root/reference/wekws/bin/static_quantize.py:57-130 produces the
// artifact; ORT executes it). This runtime executes its own int8
// artifact; these kernels make that execution SIMD on x86 (AVX2,
// selected at runtime via __builtin_cpu_supports, scalar elsewhere)
// so int8 is a latency win, not only a 4x size win.
//
// All kernels are bit-exact with the scalar spec
// (wekws_tpu/export/np_runtime.py): integer multiply-accumulate is
// exact in int32, and the vector quantizer performs the same
// divide -> round-to-nearest-even -> clamp -> shift sequence.

#ifndef KWS_INT8_KERNELS_H_
#define KWS_INT8_KERNELS_H_

#include <cstdint>
#include <cstddef>

namespace wekws {

// acc[j] += v * w[j] for j in [0, n)  (dense / full-conv row update)
extern void (*Int8AxpyRow)(int32_t* acc, const int8_t* w, int32_t v, int n);

// acc[j] += in[j] * w[j] for j in [0, n)  (depthwise / FSMN taps)
extern void (*Int8MulAccum)(int32_t* acc, const int32_t* in, const int8_t* w,
                            int n);

// out[i] = clamp(nearbyint(x[i] / scale) + zp, -128, 127) - zp
// (activation quantization; round half-to-even == np.rint)
extern void (*QuantizeShiftedVec)(const float* x, size_t n, float scale,
                                  int zp, int32_t* out);

// out[j] = acc[j] * scale * wscale[j] (+ bias[j])  (dequant epilogue)
extern void (*DequantRow)(float* out, const int32_t* acc, float scale,
                          const float* wscale, const float* bias, int n);

// ---- packed u8·s8 dot path (AVX-VNNI vpdpbusd: 64 MACs/instr) ----
//
// Activations are quantized to u8 as q+128 (q the signed spec value);
// the +128+zp shift is corrected by initializing acc[co] with
// -(128+zp)*colsum[co] (all-integer, bit-exact with the scalar spec).

// true when Int8PackedDot is usable on this CPU
bool Int8PackedDotAvailable();

// acc[co] += sum_g a[4g..4g+3] . packed[(co/8)*groups + g][co%8][0..3]
// REQUIRES: acc sized to a multiple of 8 (padded cout); packed built
// with zero-padded tail channels/groups; a sized groups*4 (tail 0).
extern void (*Int8PackedDot)(int32_t* acc, const uint8_t* a,
                             const int8_t* packed, int groups, int cout);

// out[i] = clamp(nearbyint(x[i]/scale) + zp, -128, 127) + 128  (u8)
extern void (*QuantizeU8Vec)(const float* x, size_t n, float scale, int zp,
                             uint8_t* out);

}  // namespace wekws

#endif  // KWS_INT8_KERNELS_H_
