#include "frontend/fft.h"

#include <cmath>

#include "utils/log.h"

namespace wekws {

Fft::Fft(int n) : n_(n), bitrev_(n), cos_tbl_(n / 2), sin_tbl_(n / 2) {
  WEKWS_CHECK((n & (n - 1)) == 0) << "FFT size must be a power of two";
  int bits = 0;
  while ((1 << bits) < n) ++bits;
  for (int i = 0; i < n; ++i) {
    int r = 0;
    for (int b = 0; b < bits; ++b) {
      if (i & (1 << b)) r |= 1 << (bits - 1 - b);
    }
    bitrev_[i] = r;
  }
  const double two_pi = 2.0 * M_PI;
  for (int i = 0; i < n / 2; ++i) {
    cos_tbl_[i] = static_cast<float>(std::cos(two_pi * i / n));
    sin_tbl_[i] = static_cast<float>(std::sin(two_pi * i / n));
  }
}

void Fft::Transform(float* real, float* imag) const {
  const int n = n_;
  for (int i = 0; i < n; ++i) {
    int j = bitrev_[i];
    if (j > i) {
      std::swap(real[i], real[j]);
      std::swap(imag[i], imag[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const int half = len >> 1;
    const int step = n / len;
    for (int base = 0; base < n; base += len) {
      for (int k = 0; k < half; ++k) {
        const float wr = cos_tbl_[k * step];
        const float wi = -sin_tbl_[k * step];  // e^{-i2πk/len}
        const int a = base + k;
        const int b = a + half;
        const float tr = real[b] * wr - imag[b] * wi;
        const float ti = real[b] * wi + imag[b] * wr;
        real[b] = real[a] - tr;
        imag[b] = imag[a] - ti;
        real[a] += tr;
        imag[a] += ti;
      }
    }
  }
}

}  // namespace wekws
