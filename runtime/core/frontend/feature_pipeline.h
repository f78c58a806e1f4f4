// Thread-safe streaming feature frontend.
//
// Producer thread calls AcceptWaveform (audio callback); consumer
// calls Read, blocking until frames (or input-finished) are available.
// Same contract as the reference FeaturePipeline
// (/root/reference/runtime/core/frontend/feature_pipeline.h) — fresh
// implementation over the blocking queue, plus streaming context
// expansion and frame skipping (which the reference runtime lacked,
// making its FSMN models unservable).
#ifndef WEKWS_TPU_FRONTEND_FEATURE_PIPELINE_H_
#define WEKWS_TPU_FRONTEND_FEATURE_PIPELINE_H_

#include <vector>

#include "frontend/fbank.h"
#include "utils/blocking_queue.h"

namespace wekws {

struct FeaturePipelineConfig {
  FbankConfig fbank;
  int context_left = 0;
  int context_right = 0;
  int frame_skip = 1;

  int out_dim() const {
    return fbank.feat_dim() * (context_left + 1 + context_right);
  }
};

class FeaturePipeline {
 public:
  explicit FeaturePipeline(const FeaturePipelineConfig& config);

  // Producer side: samples in int16 scale.
  void AcceptWaveform(const std::vector<float>& wav);
  void SetInputFinished();

  // Consumer side: blocks until up to n frames are available; returns
  // the frames actually read (empty = finished and drained).  Each
  // frame is out_dim() floats; frame_index receives the absolute
  // pre-skip spliced frame index of each returned frame.
  std::vector<std::vector<float>> Read(int n,
                                       std::vector<int64_t>* frame_index);

  void Reset();
  int out_dim() const { return config_.out_dim(); }

 private:
  void Process(const std::vector<float>& wav);

  FeaturePipelineConfig config_;
  Fbank fbank_;
  std::vector<float> remained_wav_;
  std::vector<std::vector<float>> remained_feats_;  // splice left ctx
  bool first_chunk_ = true;
  int64_t spliced_count_ = 0;
  BlockingQueue<std::pair<int64_t, std::vector<float>>> queue_;
};

}  // namespace wekws

#endif  // WEKWS_TPU_FRONTEND_FEATURE_PIPELINE_H_
