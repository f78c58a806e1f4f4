// Real-time streaming driver: raw 16-bit PCM on stdin (e.g.
//   arecord -f S16_LE -r 16000 -c 1 -t raw | stream_kws_main <model>)
// -> feature pipeline (reader thread) -> KWS engine poll loop.
// Same role as the reference's PortAudio driver
// (/root/reference/runtime/core/bin/stream_kws_main.cc) without the
// audio-library dependency; the reader thread + blocking queue
// reproduce the audio-callback/decoder thread split.
#include <unistd.h>

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "kws/keyword_spotting.h"

int main(int argc, char* argv[]) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <model_dir> [batch] [softmax]\n",
                 argv[0]);
    return 1;
  }
  const std::string model_dir = argv[1];
  const int batch_size = argc > 2 ? std::atoi(argv[2]) : 16;
  const bool softmax = argc > 3 && std::atoi(argv[3]) != 0;

  wekws::KeywordSpotting kws(model_dir, softmax);

  std::thread reader([&kws]() {
    std::vector<int16_t> buf(1600);  // 100 ms
    while (true) {
      ssize_t n = read(STDIN_FILENO, buf.data(), buf.size() * 2);
      if (n <= 0) break;
      std::vector<float> samples(n / 2);
      for (ssize_t i = 0; i < n / 2; ++i) {
        samples[i] = static_cast<float>(buf[i]);
      }
      kws.AcceptWaveform(samples);
    }
    kws.SetInputFinished();
  });

  std::vector<int64_t> idx;
  while (true) {
    auto probs = kws.Forward(batch_size, &idx);
    if (probs.empty()) break;
    for (size_t t = 0; t < probs.size(); ++t) {
      std::printf("frame %ld:", static_cast<long>(idx[t]));
      for (float p : probs[t]) std::printf(" %.6f", p);
      std::printf("\n");
    }
    std::fflush(stdout);
  }
  reader.join();
  return 0;
}
