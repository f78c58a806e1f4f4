// Graph-artifact interpreter: the native inference core.
//
// Executes the op graph exported by wekws_tpu.export.graph (model.txt
// + weights.bin [+ weights_int8.bin]) with per-op streaming caches —
// replacing the reference's ONNX Runtime dependency
// (/root/reference/runtime/core/kws/keyword_spotting.cc) with ~zero-
// dependency native code.  Semantics mirror the numpy oracle
// (wekws_tpu/export/np_runtime.py); parity is tested via the C API.
#ifndef WEKWS_TPU_KWS_GRAPH_MODEL_H_
#define WEKWS_TPU_KWS_GRAPH_MODEL_H_

#include <map>
#include <string>
#include <vector>

namespace wekws {

// (T, C) row-major frame buffer.
struct Matrix {
  int rows = 0;
  int cols = 0;
  std::vector<float> data;
  Matrix() = default;
  Matrix(int r, int c) : rows(r), cols(c), data(r * c, 0.0f) {}
  float* row(int r) { return data.data() + r * cols; }
  const float* row(int r) const { return data.data() + r * cols; }
};

struct Tensor {
  std::vector<int> shape;
  std::vector<float> data;     // float weights (dequantized at load), or
                               // per-channel scales when qdata is set
  std::vector<int8_t> qdata;   // raw int8 weights: static-quant execution
  // VNNI fast path (built at load when the CPU supports it):
  // weights repacked per tap as [(co/8)*groups + g][lane 0..7][4 ci
  // bytes] for vpdpbusd, plus per-co column sums (over all taps and
  // ci) for the unsigned-activation-shift correction.
  std::vector<int8_t> qpacked;
  std::vector<int32_t> colsum;
  int dim(int i) const { return shape[i]; }
  bool is_int8() const { return !qdata.empty(); }
};

struct OpDef {
  std::string op;
  int out = 0;
  std::vector<int> inputs;
  std::map<std::string, std::string> attrs;
  std::map<std::string, Tensor> weights;

  int iattr(const std::string& key, int fallback = 0) const {
    auto it = attrs.find(key);
    return it == attrs.end() ? fallback : std::stoi(it->second);
  }
  float fattr(const std::string& key, float fallback = 0.0f) const {
    auto it = attrs.find(key);
    return it == attrs.end() ? fallback : std::stof(it->second);
  }
  std::string sattr(const std::string& key,
                    const std::string& fallback = "") const {
    auto it = attrs.find(key);
    return it == attrs.end() ? fallback : it->second;
  }
  bool has_attr(const std::string& key) const {
    return attrs.count(key) != 0;
  }
};

struct CacheSpec {
  int id, len, dim;
};

struct FeatureMeta {
  std::string feature_type = "fbank";
  int sample_rate = 16000;
  int num_mel_bins = 40;
  int num_ceps = 40;
  float frame_length_ms = 25.0f;
  float frame_shift_ms = 10.0f;
  int context_left = 0;
  int context_right = 0;
  int frame_skip = 1;
};

class GraphModel {
 public:
  explicit GraphModel(const std::string& model_dir);

  // Streaming state: one left-context matrix per cache slot.
  std::vector<Matrix> InitState() const;

  // feats: (T, in_dim) chunk.  Returns model output; updates state.
  Matrix Forward(const Matrix& feats, std::vector<Matrix>* state) const;

  int output_dim() const { return output_dim_; }
  int cache_len() const { return cache_len_; }
  int cache_dim() const { return cache_dim_; }
  const std::string& activation() const { return activation_; }
  const FeatureMeta& feature() const { return feature_; }

 private:
  void Load(const std::string& model_dir);

  std::vector<OpDef> ops_;
  std::vector<CacheSpec> caches_;
  FeatureMeta feature_;
  int output_buf_ = 0;
  int output_dim_ = 0;
  int cache_len_ = 0;
  int cache_dim_ = 0;
  std::string activation_ = "identity";
};

}  // namespace wekws

#endif  // WEKWS_TPU_KWS_GRAPH_MODEL_H_
