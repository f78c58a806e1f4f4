#include "frontend/fbank.h"

#include <cfloat>
#include <cmath>

#include "utils/log.h"

namespace wekws {

namespace {

int NextPowerOfTwo(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

double MelScale(double freq) { return 1127.0 * std::log(1.0 + freq / 700.0); }

}  // namespace

Fbank::Fbank(const FbankConfig& config)
    : config_(config),
      padded_size_(NextPowerOfTwo(config.frame_length())),
      fft_(NextPowerOfTwo(config.frame_length())) {
  const int frame_length = config_.frame_length();
  // povey window: hann(periodic=False) ** 0.85
  window_.resize(frame_length);
  for (int i = 0; i < frame_length; ++i) {
    double hann =
        0.5 - 0.5 * std::cos(2.0 * M_PI * i / (frame_length - 1));
    window_[i] = static_cast<float>(std::pow(hann, 0.85));
  }

  // triangular mel bank, Kaldi-style (kaldi.py mel_banks)
  const int num_bins = config_.num_mel_bins;
  const int num_fft_bins = padded_size_ / 2;
  double high_freq = config_.high_freq;
  const double nyquist = 0.5 * config_.sample_rate;
  if (high_freq <= 0.0) high_freq = nyquist + high_freq;
  const double fft_bin_width =
      static_cast<double>(config_.sample_rate) / padded_size_;
  const double mel_low = MelScale(config_.low_freq);
  const double mel_high = MelScale(high_freq);
  const double mel_delta = (mel_high - mel_low) / (num_bins + 1);
  mel_banks_.assign(num_bins,
                    std::vector<float>(num_fft_bins + 1, 0.0f));
  for (int b = 0; b < num_bins; ++b) {
    const double left = mel_low + b * mel_delta;
    const double center = left + mel_delta;
    const double right = center + mel_delta;
    for (int k = 0; k < num_fft_bins; ++k) {
      const double mel = MelScale(fft_bin_width * k);
      const double up = (mel - left) / (center - left);
      const double down = (right - mel) / (right - center);
      const double w = std::min(up, down);
      if (w > 0.0) mel_banks_[b][k] = static_cast<float>(w);
    }
  }

  if (config_.feature_type == "mfcc") {
    // orthonormal DCT-II with cepstral liftering folded in
    const int m = num_bins;
    dct_.assign(config_.num_ceps, std::vector<float>(m));
    for (int k = 0; k < config_.num_ceps; ++k) {
      double lift = 1.0;
      if (config_.cepstral_lifter != 0.0f) {
        lift = 1.0 + 0.5 * config_.cepstral_lifter *
                         std::sin(M_PI * k / config_.cepstral_lifter);
      }
      for (int j = 0; j < m; ++j) {
        double v = (k == 0)
                       ? std::sqrt(1.0 / m)
                       : std::sqrt(2.0 / m) *
                             std::cos(M_PI / m * (j + 0.5) * k);
        dct_[k][j] = static_cast<float>(v * lift);
      }
    }
  }
}

void Fbank::ComputeFrame(const float* samples,
                         std::vector<float>* out) const {
  const int frame_length = config_.frame_length();
  std::vector<float> frame(samples, samples + frame_length);

  if (config_.remove_dc_offset) {
    double mean = 0.0;
    for (float v : frame) mean += v;
    mean /= frame_length;
    for (float& v : frame) v -= static_cast<float>(mean);
  }
  if (config_.preemphasis != 0.0f) {
    for (int i = frame_length - 1; i > 0; --i) {
      frame[i] -= config_.preemphasis * frame[i - 1];
    }
    frame[0] -= config_.preemphasis * frame[0];
  }
  for (int i = 0; i < frame_length; ++i) frame[i] *= window_[i];

  std::vector<float> real(padded_size_, 0.0f), imag(padded_size_, 0.0f);
  std::copy(frame.begin(), frame.end(), real.begin());
  fft_.Transform(real.data(), imag.data());

  const int num_fft_bins = padded_size_ / 2;
  std::vector<float> power(num_fft_bins + 1);
  for (int k = 0; k <= num_fft_bins; ++k) {
    power[k] = real[k] * real[k] + imag[k] * imag[k];
  }

  std::vector<float> mel(config_.num_mel_bins);
  for (int b = 0; b < config_.num_mel_bins; ++b) {
    double acc = 0.0;
    const std::vector<float>& bank = mel_banks_[b];
    for (int k = 0; k <= num_fft_bins; ++k) acc += bank[k] * power[k];
    if (config_.use_log_fbank) {
      acc = std::log(std::max(acc, static_cast<double>(FLT_EPSILON)));
    }
    mel[b] = static_cast<float>(acc);
  }

  if (config_.feature_type == "mfcc") {
    out->assign(config_.num_ceps, 0.0f);
    for (int k = 0; k < config_.num_ceps; ++k) {
      double acc = 0.0;
      for (int j = 0; j < config_.num_mel_bins; ++j) {
        acc += dct_[k][j] * mel[j];
      }
      (*out)[k] = static_cast<float>(acc);
    }
  } else {
    *out = std::move(mel);
  }
}

int Fbank::Compute(const std::vector<float>& wave,
                   std::vector<std::vector<float>>* feats) const {
  const int frame_length = config_.frame_length();
  const int frame_shift = config_.frame_shift();
  if (static_cast<int>(wave.size()) < frame_length) return 0;
  const int num_frames =
      1 + (static_cast<int>(wave.size()) - frame_length) / frame_shift;
  for (int t = 0; t < num_frames; ++t) {
    std::vector<float> feat;
    ComputeFrame(wave.data() + t * frame_shift, &feat);
    feats->push_back(std::move(feat));
  }
  return num_frames;
}

}  // namespace wekws
