// Iterative radix-2 real-input FFT for the fbank frontend.
// Same role as /root/reference/runtime/core/frontend/fft.{h,cc};
// fresh implementation (complex interleaved, precomputed twiddles).
#ifndef WEKWS_TPU_FRONTEND_FFT_H_
#define WEKWS_TPU_FRONTEND_FFT_H_

#include <vector>

namespace wekws {

// In-place complex FFT over size-n (power of two) interleaved buffers.
class Fft {
 public:
  explicit Fft(int n);
  int size() const { return n_; }
  // real[i], imag[i] for i in [0, n); transforms in place.
  void Transform(float* real, float* imag) const;

 private:
  int n_;
  std::vector<int> bitrev_;
  std::vector<float> cos_tbl_;
  std::vector<float> sin_tbl_;
};

}  // namespace wekws

#endif  // WEKWS_TPU_FRONTEND_FFT_H_
