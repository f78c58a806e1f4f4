#include "frontend/alsa_capture.h"

#include <dlfcn.h>

#include <cstdio>
#include <mutex>

namespace wekws {

namespace {

// Minimal ALSA surface, bound at runtime.  Signatures and constants
// from the public alsa-lib API (stable ABI of libasound.so.2).
using snd_pcm_t = void;
constexpr int kSndPcmStreamCapture = 1;       // SND_PCM_STREAM_CAPTURE
constexpr int kSndPcmFormatS16Le = 2;         // SND_PCM_FORMAT_S16_LE
constexpr int kSndPcmAccessRwInterleaved = 3; // SND_PCM_ACCESS_RW_INTERLEAVED

struct AlsaApi {
  int (*open)(snd_pcm_t**, const char*, int, int) = nullptr;
  int (*set_params)(snd_pcm_t*, int, int, unsigned, unsigned, int,
                    unsigned) = nullptr;
  long (*readi)(snd_pcm_t*, void*, unsigned long) = nullptr;
  int (*recover)(snd_pcm_t*, int, int) = nullptr;
  int (*close)(snd_pcm_t*) = nullptr;
  const char* (*strerror)(int) = nullptr;
  bool ok = false;
};

const AlsaApi& Api() {
  static AlsaApi api;
  static std::once_flag once;
  std::call_once(once, []() {
    void* lib = dlopen("libasound.so.2", RTLD_NOW | RTLD_GLOBAL);
    if (lib == nullptr) lib = dlopen("libasound.so", RTLD_NOW | RTLD_GLOBAL);
    if (lib == nullptr) return;
    api.open = reinterpret_cast<decltype(api.open)>(
        dlsym(lib, "snd_pcm_open"));
    api.set_params = reinterpret_cast<decltype(api.set_params)>(
        dlsym(lib, "snd_pcm_set_params"));
    api.readi = reinterpret_cast<decltype(api.readi)>(
        dlsym(lib, "snd_pcm_readi"));
    api.recover = reinterpret_cast<decltype(api.recover)>(
        dlsym(lib, "snd_pcm_recover"));
    api.close = reinterpret_cast<decltype(api.close)>(
        dlsym(lib, "snd_pcm_close"));
    api.strerror = reinterpret_cast<decltype(api.strerror)>(
        dlsym(lib, "snd_strerror"));
    api.ok = api.open && api.set_params && api.readi && api.recover &&
             api.close;
  });
  return api;
}

}  // namespace

bool AlsaCapture::Available() { return Api().ok; }

bool AlsaCapture::Open(const std::string& device, int sample_rate) {
  const AlsaApi& api = Api();
  if (!api.ok) {
    std::fprintf(stderr,
                 "alsa_capture: libasound.so.2 not available on this "
                 "machine\n");
    return false;
  }
  snd_pcm_t* pcm = nullptr;
  int rc = api.open(&pcm, device.c_str(), kSndPcmStreamCapture, 0);
  if (rc < 0) {
    std::fprintf(stderr, "alsa_capture: cannot open '%s': %s\n",
                 device.c_str(),
                 api.strerror ? api.strerror(rc) : "error");
    return false;
  }
  // mono S16_LE, allow resampling, 500 ms ring buffer
  rc = api.set_params(pcm, kSndPcmFormatS16Le, kSndPcmAccessRwInterleaved,
                      1, static_cast<unsigned>(sample_rate), 1, 500000);
  if (rc < 0) {
    std::fprintf(stderr, "alsa_capture: set_params failed: %s\n",
                 api.strerror ? api.strerror(rc) : "error");
    api.close(pcm);
    return false;
  }
  pcm_ = pcm;
  return true;
}

int AlsaCapture::Read(int16_t* buf, int frames) {
  if (pcm_ == nullptr) return -1;
  const AlsaApi& api = Api();
  long n = api.readi(static_cast<snd_pcm_t*>(pcm_), buf,
                     static_cast<unsigned long>(frames));
  if (n < 0) {
    // overrun etc: try to recover the stream and signal a retry
    int rc = api.recover(static_cast<snd_pcm_t*>(pcm_),
                         static_cast<int>(n), 1);
    return rc == 0 ? 0 : -1;
  }
  return static_cast<int>(n);
}

void AlsaCapture::Close() {
  if (pcm_ != nullptr) {
    Api().close(static_cast<snd_pcm_t*>(pcm_));
    pcm_ = nullptr;
  }
}

}  // namespace wekws
