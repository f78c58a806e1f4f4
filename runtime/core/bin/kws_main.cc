// Offline driver: wav file -> feature pipeline -> KWS engine,
// printing per-frame posteriors.  Same role as the reference's
// kws_main (/root/reference/runtime/core/bin/kws_main.cc).
//
// Usage: kws_main <model_dir> <wav_path> [batch_size] [apply_softmax]
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "frontend/wav.h"
#include "kws/keyword_spotting.h"

int main(int argc, char* argv[]) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <model_dir> <wav_path> [batch] [softmax]\n",
                 argv[0]);
    return 1;
  }
  const std::string model_dir = argv[1];
  const std::string wav_path = argv[2];
  const int batch_size = argc > 3 ? std::atoi(argv[3]) : 40;
  const bool softmax = argc > 4 && std::atoi(argv[4]) != 0;

  wekws::WavReader reader(wav_path);
  wekws::KeywordSpotting kws(model_dir, softmax);
  kws.AcceptWaveform(reader.data());
  kws.SetInputFinished();

  std::vector<int64_t> idx;
  while (true) {
    auto probs = kws.Forward(batch_size, &idx);
    if (probs.empty()) break;
    for (size_t t = 0; t < probs.size(); ++t) {
      std::printf("frame %ld:", static_cast<long>(idx[t]));
      for (float p : probs[t]) std::printf(" %.6f", p);
      std::printf("\n");
    }
  }
  return 0;
}
