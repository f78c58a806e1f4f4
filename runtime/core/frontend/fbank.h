// Kaldi-compatible log-mel filterbank / MFCC.
//
// Numerics match the training frontend exactly (wekws_tpu/frontend/
// kaldi.py, itself validated against the reference training pipeline):
// snip_edges framing, per-frame DC removal, pre-emphasis 0.97, POVEY
// window (the training window — the reference C++ runtime used Hamming
// and thus mismatched its own training features, fbank.h:90-96; we fix
// that), power spectrum over a pow2-padded FFT, triangular mel bank
// 20 Hz..Nyquist, natural log floored at float eps.  MFCC adds the
// orthonormal DCT-II and cepstral liftering.
#ifndef WEKWS_TPU_FRONTEND_FBANK_H_
#define WEKWS_TPU_FRONTEND_FBANK_H_

#include <string>
#include <vector>

#include "frontend/fft.h"

namespace wekws {

struct FbankConfig {
  int sample_rate = 16000;
  int num_mel_bins = 40;
  int num_ceps = 40;          // mfcc only
  float frame_length_ms = 25.0f;
  float frame_shift_ms = 10.0f;
  float low_freq = 20.0f;
  float high_freq = 0.0f;     // <=0: offset from Nyquist
  float preemphasis = 0.97f;
  bool remove_dc_offset = true;
  bool use_log_fbank = true;
  float cepstral_lifter = 22.0f;
  std::string feature_type = "fbank";  // "fbank" | "mfcc"

  int frame_length() const {
    return static_cast<int>(sample_rate * frame_length_ms / 1000.0f);
  }
  int frame_shift() const {
    return static_cast<int>(sample_rate * frame_shift_ms / 1000.0f);
  }
  int feat_dim() const {
    return feature_type == "mfcc" ? num_ceps : num_mel_bins;
  }
};

class Fbank {
 public:
  explicit Fbank(const FbankConfig& config);

  // wave: int16-scale float samples.  Returns number of frames; each
  // frame appended to feats as feat_dim() floats.
  int Compute(const std::vector<float>& wave,
              std::vector<std::vector<float>>* feats) const;

  const FbankConfig& config() const { return config_; }

 private:
  void ComputeFrame(const float* samples, std::vector<float>* out) const;

  FbankConfig config_;
  int padded_size_;
  Fft fft_;
  std::vector<float> window_;                    // povey
  std::vector<std::vector<float>> mel_banks_;    // [bins][fft_bins+1]
  std::vector<std::vector<float>> dct_;          // [ceps][bins] (lifted)
};

}  // namespace wekws

#endif  // WEKWS_TPU_FRONTEND_FBANK_H_
