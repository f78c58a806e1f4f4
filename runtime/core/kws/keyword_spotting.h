// Streaming KWS engine: frontend -> graph model -> per-frame
// posteriors, with rolling cache state.
// Same role as /root/reference/runtime/core/kws/keyword_spotting.h,
// executing the native graph artifact instead of an ONNX session.
#ifndef WEKWS_TPU_KWS_KEYWORD_SPOTTING_H_
#define WEKWS_TPU_KWS_KEYWORD_SPOTTING_H_

#include <memory>
#include <string>
#include <vector>

#include "frontend/feature_pipeline.h"
#include "kws/graph_model.h"

namespace wekws {

class KeywordSpotting {
 public:
  explicit KeywordSpotting(const std::string& model_dir,
                           bool apply_softmax = false);

  // Push int16-scale samples.
  void AcceptWaveform(const std::vector<float>& wav);
  void SetInputFinished();

  // Reads up to batch_size feature frames and runs the model.
  // Returns per-frame posteriors (empty when input drained); the
  // absolute pre-skip frame index of each row lands in frame_index.
  std::vector<std::vector<float>> Forward(int batch_size,
                                          std::vector<int64_t>* frame_index);

  void Reset();
  const GraphModel& model() const { return model_; }
  int sample_rate() const { return model_.feature().sample_rate; }

 private:
  GraphModel model_;
  FeaturePipeline pipeline_;
  std::vector<Matrix> state_;
  bool apply_softmax_;
};

}  // namespace wekws

#endif  // WEKWS_TPU_KWS_KEYWORD_SPOTTING_H_
