// JNI bridge for the Android app: Java `Spot` class -> native
// KeywordSpotting engine.  Same responsibilities as the reference's
// wekws.cc JNI layer (init/reset/acceptWaveform/setInputFinished/
// result polling) over our graph-artifact runtime.
#include <jni.h>

#include <memory>
#include <string>
#include <vector>

#include "kws/keyword_spotting.h"
#include "utils/log.h"

namespace {

std::unique_ptr<wekws::KeywordSpotting> g_spotter;
std::vector<std::vector<float>> g_probs;

}  // namespace

extern "C" {

JNIEXPORT void JNICALL Java_cn_org_wekws_1tpu_Spot_init(
    JNIEnv* env, jobject, jstring jModelDir, jboolean softmax) {
  const char* model_dir = env->GetStringUTFChars(jModelDir, nullptr);
  g_spotter = std::make_unique<wekws::KeywordSpotting>(
      model_dir, softmax == JNI_TRUE);
  env->ReleaseStringUTFChars(jModelDir, model_dir);
}

JNIEXPORT void JNICALL Java_cn_org_wekws_1tpu_Spot_reset(JNIEnv*, jobject) {
  if (g_spotter) g_spotter->Reset();
  g_probs.clear();
}

JNIEXPORT void JNICALL Java_cn_org_wekws_1tpu_Spot_acceptWaveform(
    JNIEnv* env, jobject, jshortArray jWaveform) {
  if (!g_spotter) return;
  jsize n = env->GetArrayLength(jWaveform);
  std::vector<jshort> pcm(n);
  env->GetShortArrayRegion(jWaveform, 0, n, pcm.data());
  std::vector<float> samples(n);
  for (jsize i = 0; i < n; ++i) samples[i] = static_cast<float>(pcm[i]);
  g_spotter->AcceptWaveform(samples);
}

JNIEXPORT void JNICALL Java_cn_org_wekws_1tpu_Spot_setInputFinished(
    JNIEnv*, jobject) {
  if (g_spotter) g_spotter->SetInputFinished();
}

// Decodes pending frames; returns a flattened (frames x output_dim)
// posterior array (empty when no frames are ready).
JNIEXPORT jfloatArray JNICALL Java_cn_org_wekws_1tpu_Spot_decode(
    JNIEnv* env, jobject, jint batchSize) {
  if (!g_spotter) return env->NewFloatArray(0);
  std::vector<int64_t> idx;
  auto probs = g_spotter->Forward(batchSize, &idx);
  const int dim =
      probs.empty() ? 0 : static_cast<int>(probs[0].size());
  jfloatArray out = env->NewFloatArray(probs.size() * dim);
  for (size_t t = 0; t < probs.size(); ++t) {
    env->SetFloatArrayRegion(out, t * dim, dim, probs[t].data());
  }
  return out;
}

}  // extern "C"
