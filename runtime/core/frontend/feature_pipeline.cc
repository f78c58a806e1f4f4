#include "frontend/feature_pipeline.h"

#include <utility>

namespace wekws {

FeaturePipeline::FeaturePipeline(const FeaturePipelineConfig& config)
    : config_(config), fbank_(config.fbank) {}

void FeaturePipeline::AcceptWaveform(const std::vector<float>& wav) {
  std::vector<float> buf;
  buf.reserve(remained_wav_.size() + wav.size());
  buf.insert(buf.end(), remained_wav_.begin(), remained_wav_.end());
  buf.insert(buf.end(), wav.begin(), wav.end());

  std::vector<std::vector<float>> feats;
  int n = fbank_.Compute(buf, &feats);
  const int shift = config_.fbank.frame_shift();
  remained_wav_.assign(buf.begin() + n * shift, buf.end());
  if (n == 0) return;

  const int left = config_.context_left;
  const int right = config_.context_right;
  if (left > 0 || right > 0) {
    // build padded window buffer: [carry | new frames]
    std::vector<std::vector<float>> padded;
    if (first_chunk_) {
      for (int i = 0; i < left; ++i) padded.push_back(feats[0]);
      first_chunk_ = false;
    } else {
      padded = remained_feats_;
    }
    padded.insert(padded.end(), feats.begin(), feats.end());
    const int total = static_cast<int>(padded.size());
    const int n_out = total - left - right;
    if (n_out <= 0) {
      remained_feats_ = std::move(padded);
      return;
    }
    const int ctx_win = left + 1 + right;
    const int dim = config_.fbank.feat_dim();
    for (int t = 0; t < n_out; ++t) {
      std::vector<float> spliced(ctx_win * dim);
      for (int c = 0; c < ctx_win; ++c) {
        std::copy(padded[t + c].begin(), padded[t + c].end(),
                  spliced.begin() + c * dim);
      }
      const int64_t idx = spliced_count_++;
      if (idx % config_.frame_skip == 0) {
        queue_.Push({idx, std::move(spliced)});
      }
    }
    remained_feats_.assign(padded.end() - (left + right), padded.end());
  } else {
    for (auto& f : feats) {
      const int64_t idx = spliced_count_++;
      if (idx % config_.frame_skip == 0) {
        queue_.Push({idx, std::move(f)});
      }
    }
  }
}

void FeaturePipeline::SetInputFinished() { queue_.Close(); }

std::vector<std::vector<float>> FeaturePipeline::Read(
    int n, std::vector<int64_t>* frame_index) {
  auto items = queue_.PopBatch(n);
  std::vector<std::vector<float>> feats;
  feats.reserve(items.size());
  if (frame_index != nullptr) frame_index->clear();
  for (auto& item : items) {
    if (frame_index != nullptr) frame_index->push_back(item.first);
    feats.push_back(std::move(item.second));
  }
  return feats;
}

void FeaturePipeline::Reset() {
  remained_wav_.clear();
  remained_feats_.clear();
  first_chunk_ = true;
  spliced_count_ = 0;
  queue_.Clear();
}

}  // namespace wekws
