#include "capi/wekws_capi.h"

#include <algorithm>
#include <vector>

#include "frontend/wav.h"
#include "kws/keyword_spotting.h"

extern "C" {

wekws_handle wekws_create(const char* model_dir, int apply_softmax) {
  try {
    return new wekws::KeywordSpotting(model_dir, apply_softmax != 0);
  } catch (...) {
    return nullptr;
  }
}

void wekws_free(wekws_handle h) {
  delete static_cast<wekws::KeywordSpotting*>(h);
}

int wekws_output_dim(wekws_handle h) {
  return static_cast<wekws::KeywordSpotting*>(h)->model().output_dim();
}

int wekws_cache_len(wekws_handle h) {
  return static_cast<wekws::KeywordSpotting*>(h)->model().cache_len();
}

void wekws_accept_waveform(wekws_handle h, const float* samples, int n) {
  static_cast<wekws::KeywordSpotting*>(h)->AcceptWaveform(
      std::vector<float>(samples, samples + n));
}

void wekws_set_input_finished(wekws_handle h) {
  static_cast<wekws::KeywordSpotting*>(h)->SetInputFinished();
}

int wekws_decode(wekws_handle h, int max_frames, float* out,
                 int64_t* frame_index) {
  auto* kws = static_cast<wekws::KeywordSpotting*>(h);
  std::vector<int64_t> idx;
  auto probs = kws->Forward(max_frames, &idx);
  const int dim = kws->model().output_dim();
  for (size_t t = 0; t < probs.size(); ++t) {
    std::copy(probs[t].begin(), probs[t].end(), out + t * dim);
    if (frame_index != nullptr) frame_index[t] = idx[t];
  }
  return static_cast<int>(probs.size());
}

void wekws_reset(wekws_handle h) {
  static_cast<wekws::KeywordSpotting*>(h)->Reset();
}

int wekws_read_wav(const char* path, float* out, int max_n,
                   int* sample_rate) {
  try {
    wekws::WavReader reader(path, wekws::WavReader::NoAbort{});
    if (!reader.ok()) return -1;
    const auto& data = reader.data();
    if (sample_rate != nullptr) *sample_rate = reader.sample_rate();
    if (out != nullptr) {
      const int n = std::min<int>(max_n, static_cast<int>(data.size()));
      std::copy(data.begin(), data.begin() + n, out);
    }
    return static_cast<int>(data.size());
  } catch (...) {
    return -1;  // FFI boundary: never let exceptions terminate the host
  }
}

}  // extern "C"
