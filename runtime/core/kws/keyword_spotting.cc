#include "kws/keyword_spotting.h"

#include <cmath>

namespace wekws {

namespace {

FeaturePipelineConfig PipelineConfigFrom(const GraphModel& model) {
  FeaturePipelineConfig config;
  const FeatureMeta& meta = model.feature();
  config.fbank.feature_type = meta.feature_type;
  config.fbank.sample_rate = meta.sample_rate;
  config.fbank.num_mel_bins = meta.num_mel_bins;
  config.fbank.num_ceps = meta.num_ceps;
  config.fbank.frame_length_ms = meta.frame_length_ms;
  config.fbank.frame_shift_ms = meta.frame_shift_ms;
  config.context_left = meta.context_left;
  config.context_right = meta.context_right;
  config.frame_skip = meta.frame_skip;
  return config;
}

}  // namespace

KeywordSpotting::KeywordSpotting(const std::string& model_dir,
                                 bool apply_softmax)
    : model_(model_dir),
      pipeline_(PipelineConfigFrom(model_)),
      state_(model_.InitState()),
      apply_softmax_(apply_softmax) {}

void KeywordSpotting::AcceptWaveform(const std::vector<float>& wav) {
  pipeline_.AcceptWaveform(wav);
}

void KeywordSpotting::SetInputFinished() { pipeline_.SetInputFinished(); }

std::vector<std::vector<float>> KeywordSpotting::Forward(
    int batch_size, std::vector<int64_t>* frame_index) {
  auto frames = pipeline_.Read(batch_size, frame_index);
  if (frames.empty()) return {};
  Matrix feats(static_cast<int>(frames.size()),
               static_cast<int>(frames[0].size()));
  for (size_t t = 0; t < frames.size(); ++t) {
    std::copy(frames[t].begin(), frames[t].end(), feats.row(t));
  }
  Matrix out = model_.Forward(feats, &state_);
  std::vector<std::vector<float>> probs(out.rows,
                                        std::vector<float>(out.cols));
  for (int t = 0; t < out.rows; ++t) {
    std::copy(out.row(t), out.row(t) + out.cols, probs[t].begin());
    if (apply_softmax_) {
      float mx = probs[t][0];
      for (float v : probs[t]) mx = std::max(mx, v);
      float sum = 0.0f;
      for (float& v : probs[t]) {
        v = std::exp(v - mx);
        sum += v;
      }
      for (float& v : probs[t]) v /= sum;
    }
  }
  return probs;
}

void KeywordSpotting::Reset() {
  pipeline_.Reset();
  state_ = model_.InitState();
}

}  // namespace wekws
