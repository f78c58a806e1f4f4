// Concurrency stress for the streaming feature pipeline: a producer
// thread feeding random audio chunks races a consumer draining frames.
// Run under -DWEKWS_SANITIZE=thread to validate the queue/pipeline
// synchronization (the by-construction-only thread safety of the
// reference runtime, SURVEY.md §5, made checkable).
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

#include "frontend/feature_pipeline.h"

int main(int argc, char* argv[]) {
  const int iterations = argc > 1 ? std::atoi(argv[1]) : 200;
  wekws::FeaturePipelineConfig config;
  config.fbank.num_mel_bins = 23;
  config.context_left = 2;
  config.context_right = 2;
  config.frame_skip = 3;
  wekws::FeaturePipeline pipeline(config);

  std::thread producer([&pipeline, iterations]() {
    std::mt19937 gen(0);
    std::normal_distribution<float> dist(0.0f, 1000.0f);
    for (int i = 0; i < iterations; ++i) {
      std::vector<float> chunk(1600 + (i % 7) * 160);
      for (float& v : chunk) v = dist(gen);
      pipeline.AcceptWaveform(chunk);
    }
    pipeline.SetInputFinished();
  });

  size_t total = 0;
  std::vector<int64_t> idx;
  while (true) {
    auto frames = pipeline.Read(17, &idx);
    if (frames.empty()) break;
    total += frames.size();
  }
  producer.join();
  std::printf("consumed %zu frames\n", total);
  return total > 0 ? 0 : 1;
}
