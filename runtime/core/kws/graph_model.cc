#include "kws/graph_model.h"

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <sstream>

#include "kws/int8_kernels.h"
#include "utils/log.h"

namespace wekws {

namespace {

std::vector<float> ReadFloats(const std::string& path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f.is_open()) return {};
  const size_t bytes = f.tellg();
  f.seekg(0);
  std::vector<float> out(bytes / sizeof(float));
  f.read(reinterpret_cast<char*>(out.data()), out.size() * sizeof(float));
  return out;
}

std::vector<int8_t> ReadInt8(const std::string& path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f.is_open()) return {};
  const size_t bytes = f.tellg();
  f.seekg(0);
  std::vector<int8_t> out(bytes);
  f.read(reinterpret_cast<char*>(out.data()), bytes);
  return out;
}

inline void Activate(float* x, int n, const std::string& act) {
  if (act == "relu") {
    for (int i = 0; i < n; ++i) x[i] = x[i] > 0.0f ? x[i] : 0.0f;
  } else if (act == "sigmoid") {
    for (int i = 0; i < n; ++i) x[i] = 1.0f / (1.0f + std::exp(-x[i]));
  }
}

// f32 -> zero-point-shifted int32: clamp(nearbyint(x/s) + zp, -128,
// 127) - zp.  Round half-to-even, bit-matching the numpy spec's
// np.rint (wekws_tpu/export/np_runtime.py:_quantize_shifted).
// SIMD via kws/int8_kernels.h (AVX2 when the CPU has it).
std::vector<int32_t> QuantizeShifted(const float* x, size_t n, float scale,
                                     int zp) {
  std::vector<int32_t> out(n);
  QuantizeShiftedVec(x, n, scale, zp, out.data());
  return out;
}

// y (t_out, cout) += ext[t + tap*dilation] @ w[tap]; w: (k, cin, cout)
void CausalConv(const Matrix& ext, const Tensor& w, const Tensor* bias,
                int dilation, Matrix* y) {
  const int k = w.dim(0), cin = w.dim(1), cout = w.dim(2);
  const int t_out = y->rows;
  for (int t = 0; t < t_out; ++t) {
    float* out = y->row(t);
    if (bias != nullptr) {
      std::copy(bias->data.begin(), bias->data.end(), out);
    }
    for (int tap = 0; tap < k; ++tap) {
      const float* in = ext.row(t + tap * dilation);
      const float* wt = w.data.data() + tap * cin * cout;
      for (int ci = 0; ci < cin; ++ci) {
        const float v = in[ci];
        if (v == 0.0f) continue;
        const float* wr = wt + ci * cout;
        for (int co = 0; co < cout; ++co) out[co] += v * wr[co];
      }
    }
  }
}

// Build the VNNI dot layout (see int8_kernels.h): per tap,
// [(co/8)*groups + g][lane 0..7][4 ci bytes], zero-padded tails, plus
// per-co column sums over all taps and ci for the u8-shift correction.
void PackInt8(Tensor* t, int k, int cin, int cout) {
  const int groups = (cin + 3) / 4;
  const int coblocks = (cout + 7) / 8;
  t->qpacked.assign(
      static_cast<size_t>(k) * coblocks * groups * 32, 0);
  t->colsum.assign(cout, 0);
  for (int tap = 0; tap < k; ++tap) {
    for (int ci = 0; ci < cin; ++ci) {
      const int8_t* wr =
          t->qdata.data() + (static_cast<size_t>(tap) * cin + ci) * cout;
      for (int co = 0; co < cout; ++co) {
        t->colsum[co] += wr[co];
        t->qpacked[((static_cast<size_t>(tap) * coblocks + co / 8) * groups +
                    ci / 4) *
                       32 +
                   (co % 8) * 4 + (ci % 4)] = wr[co];
      }
    }
  }
}

}  // namespace

GraphModel::GraphModel(const std::string& model_dir) { Load(model_dir); }

void GraphModel::Load(const std::string& model_dir) {
  std::vector<float> f32 = ReadFloats(model_dir + "/weights.bin");
  std::vector<int8_t> i8 = ReadInt8(model_dir + "/weights_int8.bin");

  std::ifstream f(model_dir + "/model.txt");
  WEKWS_CHECK(f.is_open()) << "cannot open " << model_dir << "/model.txt";
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "version") {
      int v;
      ss >> v;
      WEKWS_CHECK(v == 1) << "unsupported artifact version " << v;
    } else if (kind == "meta") {
      ss >> output_buf_ >> output_dim_ >> cache_len_ >> cache_dim_ >>
          activation_;
    } else if (kind == "feature") {
      std::string key, val;
      ss >> key >> val;
      if (key == "feature_type") feature_.feature_type = val;
      else if (key == "sample_rate") feature_.sample_rate = std::stoi(val);
      else if (key == "num_mel_bins") feature_.num_mel_bins = std::stoi(val);
      else if (key == "num_ceps") feature_.num_ceps = std::stoi(val);
      else if (key == "frame_length_ms")
        feature_.frame_length_ms = std::stof(val);
      else if (key == "frame_shift_ms")
        feature_.frame_shift_ms = std::stof(val);
      else if (key == "context_left") feature_.context_left = std::stoi(val);
      else if (key == "context_right")
        feature_.context_right = std::stoi(val);
      else if (key == "frame_skip") feature_.frame_skip = std::stoi(val);
    } else if (kind == "cache") {
      CacheSpec c;
      ss >> c.id >> c.len >> c.dim;
      caches_.push_back(c);
    } else if (kind == "op") {
      OpDef op;
      int n_in;
      ss >> op.op >> op.out >> n_in;
      for (int i = 0; i < n_in; ++i) {
        int b;
        ss >> b;
        op.inputs.push_back(b);
      }
      std::string tag;
      while (ss >> tag) {
        if (tag == "a") {
          std::string key, val;
          ss >> key >> val;
          op.attrs[key] = val;
        } else if (tag == "w" || tag == "q") {
          std::string name;
          long offset = 0, scale_offset = 0;
          int ndim = 0;
          ss >> name >> offset;
          if (tag == "q") ss >> scale_offset;
          ss >> ndim;
          Tensor t;
          size_t size = 1;
          for (int d = 0; d < ndim; ++d) {
            int dim;
            ss >> dim;
            t.shape.push_back(dim);
            size *= dim;
          }
          if (tag == "w") {
            WEKWS_CHECK(offset + size <= f32.size());
            t.data.assign(f32.begin() + offset, f32.begin() + offset + size);
          } else {
            WEKWS_CHECK(offset + size <= i8.size());
            const int cout = t.shape.back();
            // statically calibrated matmul/tap ops execute in int8:
            // keep the raw weights + per-channel scales (attrs precede
            // weights on the op line, so in_scale is already parsed)
            const bool int8_exec =
                op.attrs.count("in_scale") != 0 &&
                ((name == "W" &&
                  (op.op == "dense" || op.op == "conv" ||
                   op.op == "dw_conv")) ||
                 ((name == "Wl" || name == "Wr") &&
                  op.op == "fsmn_block"));
            if (int8_exec) {
              t.qdata.assign(i8.begin() + offset,
                             i8.begin() + offset + size);
              t.data.assign(f32.begin() + scale_offset,
                            f32.begin() + scale_offset + cout);
              if (Int8PackedDotAvailable() &&
                  (op.op == "dense" || op.op == "conv")) {
                if (t.shape.size() == 2) {
                  PackInt8(&t, 1, t.shape[0], t.shape[1]);
                } else {
                  PackInt8(&t, t.shape[0], t.shape[1], t.shape[2]);
                }
              }
            } else {  // dequantize per output channel (last axis)
              t.data.resize(size);
              for (size_t i = 0; i < size; ++i) {
                t.data[i] = static_cast<float>(i8[offset + i]) *
                            f32[scale_offset + (i % cout)];
              }
            }
          }
          op.weights[name] = std::move(t);
        }
      }
      ops_.push_back(std::move(op));
    }
  }
}

std::vector<Matrix> GraphModel::InitState() const {
  std::vector<Matrix> state;
  state.reserve(caches_.size());
  for (const auto& c : caches_) state.emplace_back(c.len, c.dim);
  return state;
}

Matrix GraphModel::Forward(const Matrix& feats,
                           std::vector<Matrix>* state) const {
  std::map<int, Matrix> bufs;
  bufs[0] = feats;
  for (const auto& op : ops_) {
    const Matrix& x = bufs[op.inputs[0]];
    Matrix y;
    if (op.op == "cmvn") {
      const Tensor& mean = op.weights.at("mean");
      const Tensor& istd = op.weights.at("istd");
      y = x;
      for (int t = 0; t < y.rows; ++t) {
        float* r = y.row(t);
        for (int c = 0; c < y.cols; ++c) {
          r[c] = (r[c] - mean.data[c]) * istd.data[c];
        }
      }
    } else if (op.op == "dense") {
      const Tensor& w = op.weights.at("W");
      const int cin = w.dim(0), cout = w.dim(1);
      WEKWS_CHECK(x.cols == cin) << op.op << ": " << x.cols << " vs " << cin;
      y = Matrix(x.rows, cout);
      auto bias = op.weights.find("b_");
      if (w.is_int8()) {
        // static int8 execution: quantize the activation row with the
        // calibrated (scale, zero_point), int32 dot, dequantize via
        // in_scale * weight_scale[channel]
        const float s = op.fattr("in_scale");
        const int zp = op.iattr("in_zp");
        const float* bptr = bias != op.weights.end()
                                ? bias->second.data.data()
                                : nullptr;
        if (!w.qpacked.empty()) {
          // VNNI path: u8 activations, packed s8 weights, integer
          // column-sum correction (bit-exact with the scalar spec)
          const int groups = (cin + 3) / 4;
          const int cout8 = (cout + 7) / 8 * 8;
          const int32_t shift = 128 + zp;
          std::vector<uint8_t> aq(groups * 4, 0);
          std::vector<int32_t> acc(cout8, 0);
          for (int t = 0; t < x.rows; ++t) {
            QuantizeU8Vec(x.row(t), cin, s, zp, aq.data());
            for (int co = 0; co < cout; ++co) {
              acc[co] = -shift * w.colsum[co];
            }
            Int8PackedDot(acc.data(), aq.data(), w.qpacked.data(), groups,
                          cout);
            float* out = y.row(t);
            DequantRow(out, acc.data(), s, w.data.data(), bptr, cout);
            Activate(out, cout, op.sattr("act", "none"));
          }
        } else {
          std::vector<int32_t> acc(cout);
          for (int t = 0; t < x.rows; ++t) {
            std::vector<int32_t> xq = QuantizeShifted(x.row(t), cin, s, zp);
            std::fill(acc.begin(), acc.end(), 0);
            for (int ci = 0; ci < cin; ++ci) {
              const int32_t v = xq[ci];
              if (v == 0) continue;
              Int8AxpyRow(acc.data(), w.qdata.data() + ci * cout, v, cout);
            }
            float* out = y.row(t);
            DequantRow(out, acc.data(), s, w.data.data(), bptr, cout);
            Activate(out, cout, op.sattr("act", "none"));
          }
        }
      } else {
        for (int t = 0; t < x.rows; ++t) {
          const float* in = x.row(t);
          float* out = y.row(t);
          if (bias != op.weights.end()) {
            std::copy(bias->second.data.begin(), bias->second.data.end(),
                      out);
          }
          for (int ci = 0; ci < cin; ++ci) {
            const float v = in[ci];
            if (v == 0.0f) continue;
            const float* wr = w.data.data() + ci * cout;
            for (int co = 0; co < cout; ++co) out[co] += v * wr[co];
          }
          Activate(out, cout, op.sattr("act", "none"));
        }
      }
    } else if (op.op == "conv" || op.op == "dw_conv") {
      const Tensor& w = op.weights.at("W");
      const int dilation = op.iattr("dilation", 1);
      const int k = w.dim(0);
      const int pad = (k - 1) * dilation;
      Matrix& cache = (*state)[op.iattr("cache")];
      // ext = [cache | x]
      Matrix ext(cache.rows + x.rows, x.cols);
      std::copy(cache.data.begin(), cache.data.end(), ext.data.begin());
      std::copy(x.data.begin(), x.data.end(),
                ext.data.begin() + cache.data.size());
      // new cache = last pad rows of ext
      for (int t = 0; t < pad; ++t) {
        std::copy(ext.row(ext.rows - pad + t),
                  ext.row(ext.rows - pad + t) + ext.cols, cache.row(t));
      }
      const int t_out = ext.rows - pad;
      if (w.is_int8()) {
        // static int8 execution over the cache-extended buffer (the
        // cache holds this buffer's own history, so one calibrated
        // scale covers it)
        const float s = op.fattr("in_scale");
        const int zp = op.iattr("in_zp");
        // extq is only needed by the non-VNNI branches; the VNNI path
        // quantizes to u8 instead, so defer it.
        std::vector<int32_t> extq;
        auto bias = op.weights.find("b_");
        if (op.op == "dw_conv") {
          extq = QuantizeShifted(ext.data.data(), ext.data.size(), s, zp);
          const int c = w.dim(1);
          y = Matrix(t_out, c);
          std::vector<int32_t> acc(c);
          for (int t = 0; t < t_out; ++t) {
            std::fill(acc.begin(), acc.end(), 0);
            for (int tap = 0; tap < k; ++tap) {
              Int8MulAccum(acc.data(),
                           extq.data() + (t + tap * dilation) * ext.cols,
                           w.qdata.data() + tap * c, c);
            }
            float* out = y.row(t);
            DequantRow(out, acc.data(), s, w.data.data(),
                       bias != op.weights.end() ? bias->second.data.data()
                                                : nullptr,
                       c);
            Activate(out, c, op.sattr("act", "none"));
          }
        } else if (!w.qpacked.empty()) {
          // VNNI path over the cache-extended buffer
          const int cin = w.dim(1), cout = w.dim(2);
          y = Matrix(t_out, cout);
          const float* bptr = bias != op.weights.end()
                                  ? bias->second.data.data()
                                  : nullptr;
          const int groups = (cin + 3) / 4;
          const int coblocks = (cout + 7) / 8;
          const int cout8 = coblocks * 8;
          const int astride = groups * 4;
          const int32_t shift = 128 + zp;
          std::vector<uint8_t> aq(
              static_cast<size_t>(ext.rows) * astride, 0);
          for (int r = 0; r < ext.rows; ++r) {
            QuantizeU8Vec(ext.row(r), cin, s, zp,
                          aq.data() + static_cast<size_t>(r) * astride);
          }
          std::vector<int32_t> acc(cout8, 0);
          for (int t = 0; t < t_out; ++t) {
            for (int co = 0; co < cout; ++co) {
              acc[co] = -shift * w.colsum[co];
            }
            for (int tap = 0; tap < k; ++tap) {
              Int8PackedDot(
                  acc.data(),
                  aq.data() +
                      static_cast<size_t>(t + tap * dilation) * astride,
                  w.qpacked.data() +
                      static_cast<size_t>(tap) * coblocks * groups * 32,
                  groups, cout);
            }
            float* out = y.row(t);
            DequantRow(out, acc.data(), s, w.data.data(), bptr, cout);
            Activate(out, cout, op.sattr("act", "none"));
          }
        } else {
          extq = QuantizeShifted(ext.data.data(), ext.data.size(), s, zp);
          const int cin = w.dim(1), cout = w.dim(2);
          y = Matrix(t_out, cout);
          std::vector<int32_t> acc(cout);
          for (int t = 0; t < t_out; ++t) {
            std::fill(acc.begin(), acc.end(), 0);
            for (int tap = 0; tap < k; ++tap) {
              const int32_t* in =
                  extq.data() + (t + tap * dilation) * ext.cols;
              const int8_t* wt = w.qdata.data() + tap * cin * cout;
              for (int ci = 0; ci < cin; ++ci) {
                const int32_t v = in[ci];
                if (v == 0) continue;
                Int8AxpyRow(acc.data(), wt + ci * cout, v, cout);
              }
            }
            float* out = y.row(t);
            DequantRow(out, acc.data(), s, w.data.data(),
                       bias != op.weights.end() ? bias->second.data.data()
                                                : nullptr,
                       cout);
            Activate(out, cout, op.sattr("act", "none"));
          }
        }
      } else if (op.op == "dw_conv") {
        const int c = w.dim(1);
        y = Matrix(t_out, c);
        auto bias = op.weights.find("b_");
        for (int t = 0; t < t_out; ++t) {
          float* out = y.row(t);
          if (bias != op.weights.end()) {
            std::copy(bias->second.data.begin(), bias->second.data.end(),
                      out);
          }
          for (int tap = 0; tap < k; ++tap) {
            const float* in = ext.row(t + tap * dilation);
            const float* wt = w.data.data() + tap * c;
            for (int ci = 0; ci < c; ++ci) out[ci] += in[ci] * wt[ci];
          }
          Activate(out, c, op.sattr("act", "none"));
        }
      } else {
        auto bias = op.weights.find("b_");
        y = Matrix(t_out, w.dim(2));
        CausalConv(ext, w,
                   bias == op.weights.end() ? nullptr : &bias->second,
                   dilation, &y);
        for (int t = 0; t < t_out; ++t) {
          Activate(y.row(t), y.cols, op.sattr("act", "none"));
        }
      }
    } else if (op.op == "fsmn_block") {
      const Tensor& wl = op.weights.at("Wl");
      const int lorder = op.iattr("lorder");
      const int rorder = op.iattr("rorder");
      const int lstride = op.iattr("lstride", 1);
      const int rstride = op.iattr("rstride", 1);
      const int pad = (lorder - 1) * lstride + rorder * rstride;
      Matrix& cache = (*state)[op.iattr("cache")];
      Matrix ext(cache.rows + x.rows, x.cols);
      std::copy(cache.data.begin(), cache.data.end(), ext.data.begin());
      std::copy(x.data.begin(), x.data.end(),
                ext.data.begin() + cache.data.size());
      for (int t = 0; t < pad; ++t) {
        std::copy(ext.row(ext.rows - pad + t),
                  ext.row(ext.rows - pad + t) + ext.cols, cache.row(t));
      }
      const int t_out = ext.rows - pad;
      const int c = x.cols;
      y = Matrix(t_out, c);
      const int start = (lorder - 1) * lstride;
      const int rspan = rorder * rstride;
      const int rbase = ext.rows - (t_out + rspan) + rstride;
      if (wl.is_int8()) {
        // int8 taps; the identity path stays exact f32 (implicit
        // weight 1.0 has no per-channel scale) — matches
        // np_runtime._fsmn_block
        const float s = op.fattr("in_scale");
        const int zp = op.iattr("in_zp");
        std::vector<int32_t> extq = QuantizeShifted(
            ext.data.data(), ext.data.size(), s, zp);
        std::vector<int32_t> acc(c);
        const Tensor* wr =
            rorder > 0 ? &op.weights.at("Wr") : nullptr;
        for (int t = 0; t < t_out; ++t) {
          float* out = y.row(t);
          std::copy(ext.row(start + t), ext.row(start + t) + c, out);
          std::fill(acc.begin(), acc.end(), 0);
          for (int tap = 0; tap < lorder; ++tap) {
            Int8MulAccum(acc.data(), extq.data() + (t + tap * lstride) * c,
                         wl.qdata.data() + tap * c, c);
          }
          for (int ci = 0; ci < c; ++ci) {
            out[ci] += static_cast<float>(acc[ci]) * (s * wl.data[ci]);
          }
          if (wr != nullptr) {
            std::fill(acc.begin(), acc.end(), 0);
            for (int tap = 0; tap < rorder; ++tap) {
              Int8MulAccum(acc.data(),
                           extq.data() + (rbase + t + tap * rstride) * c,
                           wr->qdata.data() + tap * c, c);
            }
            for (int ci = 0; ci < c; ++ci) {
              out[ci] +=
                  static_cast<float>(acc[ci]) * (s * wr->data[ci]);
            }
          }
        }
      } else {
        for (int t = 0; t < t_out; ++t) {
          float* out = y.row(t);
          std::copy(ext.row(start + t), ext.row(start + t) + c, out);
          for (int tap = 0; tap < lorder; ++tap) {
            const float* in = ext.row(t + tap * lstride);
            const float* w = wl.data.data() + tap * c;
            for (int ci = 0; ci < c; ++ci) out[ci] += in[ci] * w[ci];
          }
        }
        if (rorder > 0) {
          const Tensor& wr = op.weights.at("Wr");
          const int base = rbase;
          for (int t = 0; t < t_out; ++t) {
            float* out = y.row(t);
            for (int tap = 0; tap < rorder; ++tap) {
              const float* in = ext.row(base + t + tap * rstride);
              const float* w = wr.data.data() + tap * c;
              for (int ci = 0; ci < c; ++ci) out[ci] += in[ci] * w[ci];
            }
          }
        }
      }
    } else if (op.op == "gru") {
      const Tensor& wih = op.weights.at("Wih");
      const Tensor& bih = op.weights.at("bih");
      const Tensor& whh = op.weights.at("Whh");
      const Tensor& bhh = op.weights.at("bhh");
      const int h = op.iattr("hidden");
      Matrix& cache = (*state)[op.iattr("cache")];
      std::vector<float> hs(cache.row(0), cache.row(0) + h);
      y = Matrix(x.rows, h);
      std::vector<float> gi(3 * h), gh(3 * h);
      const int cin = x.cols;
      for (int t = 0; t < x.rows; ++t) {
        std::copy(bih.data.begin(), bih.data.end(), gi.begin());
        const float* in = x.row(t);
        for (int ci = 0; ci < cin; ++ci) {
          const float v = in[ci];
          if (v == 0.0f) continue;
          const float* wr = wih.data.data() + ci * 3 * h;
          for (int j = 0; j < 3 * h; ++j) gi[j] += v * wr[j];
        }
        std::copy(bhh.data.begin(), bhh.data.end(), gh.begin());
        for (int ci = 0; ci < h; ++ci) {
          const float v = hs[ci];
          if (v == 0.0f) continue;
          const float* wr = whh.data.data() + ci * 3 * h;
          for (int j = 0; j < 3 * h; ++j) gh[j] += v * wr[j];
        }
        float* out = y.row(t);
        for (int j = 0; j < h; ++j) {
          const float r = 1.0f / (1.0f + std::exp(-(gi[j] + gh[j])));
          const float z = 1.0f / (1.0f + std::exp(-(gi[h + j] + gh[h + j])));
          const float n = std::tanh(gi[2 * h + j] + r * gh[2 * h + j]);
          hs[j] = (1.0f - z) * n + z * hs[j];
          out[j] = hs[j];
        }
      }
      std::copy(hs.begin(), hs.end(), cache.row(0));
    } else if (op.op == "add") {
      const Matrix& b = bufs[op.inputs[1]];
      y = x;
      for (size_t i = 0; i < y.data.size(); ++i) y.data[i] += b.data[i];
    } else if (op.op == "relu") {
      y = x;
      Activate(y.data.data(), static_cast<int>(y.data.size()), "relu");
    } else if (op.op == "sigmoid") {
      y = x;
      Activate(y.data.data(), static_cast<int>(y.data.size()), "sigmoid");
    } else if (op.op == "softmax") {
      y = x;
      for (int t = 0; t < y.rows; ++t) {
        float* r = y.row(t);
        float mx = r[0];
        for (int c = 1; c < y.cols; ++c) mx = std::max(mx, r[c]);
        float sum = 0.0f;
        for (int c = 0; c < y.cols; ++c) {
          r[c] = std::exp(r[c] - mx);
          sum += r[c];
        }
        for (int c = 0; c < y.cols; ++c) r[c] /= sum;
      }
    } else if (op.op == "mean_pool") {
      y = Matrix(1, x.cols);
      for (int t = 0; t < x.rows; ++t) {
        for (int c = 0; c < x.cols; ++c) y.data[c] += x.row(t)[c];
      }
      for (int c = 0; c < x.cols; ++c) y.data[c] /= x.rows;
    } else if (op.op == "last_frame") {
      y = Matrix(1, x.cols);
      std::copy(x.row(x.rows - 1), x.row(x.rows - 1) + x.cols, y.data.data());
    } else {
      LOG_FATAL << "unknown op " << op.op;
    }
    bufs[op.out] = std::move(y);
  }
  return bufs[output_buf_];
}

}  // namespace wekws
