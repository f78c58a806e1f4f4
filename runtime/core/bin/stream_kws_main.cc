// Real-time streaming driver.  Audio sources:
//   * --mic[=device]    live ALSA capture (dlopen'd libasound — see
//                       frontend/alsa_capture.h), e.g. --mic=default
//   * --pulse[=source]  live PulseAudio/PipeWire capture (dlopen'd
//                       libpulse-simple — frontend/pulse_capture.h)
//   * stdin             raw 16-bit PCM (default), e.g.
//       arecord -f S16_LE -r 16000 -c 1 -t raw | stream_kws_main <model>
//       sox -d -t raw -r 16000 -e signed -b 16 -c 1 - | stream_kws_main <model>  (macOS)
//
// Source thread -> feature pipeline (blocking queue) -> KWS engine
// poll loop.  Same role as the reference's PortAudio driver
// (/root/reference/runtime/core/bin/stream_kws_main.cc:36-106: record
// callback feeds the spotter while the main loop decodes); the
// capture library is bound at runtime instead of link time so the
// binary builds and runs (stdin mode) on machines without ALSA.
#include <unistd.h>

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "frontend/alsa_capture.h"
#include "frontend/pulse_capture.h"
#include "kws/keyword_spotting.h"

namespace {

void StdinReader(wekws::KeywordSpotting* kws) {
  std::vector<int16_t> buf(1600);  // 100 ms
  while (true) {
    ssize_t n = read(STDIN_FILENO, buf.data(), buf.size() * 2);
    if (n <= 0) break;
    std::vector<float> samples(n / 2);
    for (ssize_t i = 0; i < n / 2; ++i) {
      samples[i] = static_cast<float>(buf[i]);
    }
    kws->AcceptWaveform(samples);
  }
  kws->SetInputFinished();
}

template <class Capture>
void MicReader(wekws::KeywordSpotting* kws, const std::string& device,
               int sample_rate, std::atomic<bool>* stop) {
  Capture cap;
  if (!cap.Open(device, sample_rate)) {
    std::fprintf(stderr, "falling back is not possible in mic mode\n");
    kws->SetInputFinished();
    return;
  }
  std::fprintf(stderr, "recording from '%s' at %d Hz...\n", device.c_str(),
               sample_rate);
  std::vector<int16_t> buf(1600);  // 100 ms
  while (!stop->load(std::memory_order_relaxed)) {
    int n = cap.Read(buf.data(), static_cast<int>(buf.size()));
    if (n < 0) break;
    if (n == 0) continue;  // recovered overrun
    std::vector<float> samples(n);
    for (int i = 0; i < n; ++i) samples[i] = static_cast<float>(buf[i]);
    kws->AcceptWaveform(samples);
  }
  kws->SetInputFinished();
}

}  // namespace

int main(int argc, char* argv[]) {
  std::string model_dir;
  std::string mic_device;
  bool use_mic = false;
  bool use_pulse = false;
  int batch_size = 16;
  bool softmax = false;
  std::vector<std::string> positional;
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg == "--mic") {
      use_mic = true;
      mic_device = "default";
    } else if (arg.rfind("--mic=", 0) == 0) {
      use_mic = true;
      mic_device = arg.substr(6);
    } else if (arg == "--pulse") {
      use_pulse = true;
    } else if (arg.rfind("--pulse=", 0) == 0) {
      use_pulse = true;
      mic_device = arg.substr(8);
    } else {
      positional.push_back(arg);
    }
  }
  if (positional.empty()) {
    std::fprintf(stderr,
                 "usage: %s [--mic[=device]|--pulse[=source]] "
                 "<model_dir> [batch] [softmax]\n",
                 argv[0]);
    return 1;
  }
  model_dir = positional[0];
  if (positional.size() > 1) batch_size = std::atoi(positional[1].c_str());
  if (positional.size() > 2) softmax = std::atoi(positional[2].c_str()) != 0;

  wekws::KeywordSpotting kws(model_dir, softmax);
  std::atomic<bool> stop{false};

  std::thread reader;
  if (use_mic) {
    const int rate = kws.sample_rate();
    reader = std::thread(MicReader<wekws::AlsaCapture>, &kws, mic_device,
                         rate, &stop);
  } else if (use_pulse) {
    const int rate = kws.sample_rate();
    reader = std::thread(MicReader<wekws::PulseCapture>, &kws, mic_device,
                         rate, &stop);
  } else {
    reader = std::thread(StdinReader, &kws);
  }

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
  stop.store(true);
  reader.join();
  return 0;
}
