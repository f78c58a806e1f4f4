// Live microphone capture via dlopen'd ALSA.
//
// The reference records with a PortAudio callback
// (/root/reference/runtime/core/bin/stream_kws_main.cc:36-106); this
// runtime keeps the zero-dependency build by binding the five
// libasound.so.2 entry points it needs at RUNTIME with dlopen/dlsym —
// no ALSA headers or link-time dependency.  On machines without ALSA
// (or without a capture device) Open() fails cleanly and callers fall
// back to the stdin PCM path.
#ifndef WEKWS_TPU_FRONTEND_ALSA_CAPTURE_H_
#define WEKWS_TPU_FRONTEND_ALSA_CAPTURE_H_

#include <cstdint>
#include <string>

namespace wekws {

class AlsaCapture {
 public:
  AlsaCapture() = default;
  ~AlsaCapture() { Close(); }
  AlsaCapture(const AlsaCapture&) = delete;
  AlsaCapture& operator=(const AlsaCapture&) = delete;

  // True when libasound.so.2 can be loaded on this machine.
  static bool Available();

  // Open `device` (e.g. "default") for S16_LE mono capture at
  // `sample_rate`.  Returns false (with a message on stderr) when the
  // library, device, or parameters are unavailable.
  bool Open(const std::string& device, int sample_rate);

  // Blocking read of up to `frames` samples.  Returns the number of
  // samples read, 0 on recoverable overrun (retry), or -1 on fatal
  // error / closed handle.
  int Read(int16_t* buf, int frames);

  void Close();

 private:
  void* pcm_ = nullptr;  // snd_pcm_t*
};

}  // namespace wekws

#endif  // WEKWS_TPU_FRONTEND_ALSA_CAPTURE_H_
