#include "frontend/pulse_capture.h"

#include <dlfcn.h>

#include <cstdio>
#include <mutex>

namespace wekws {

namespace {

// Minimal pulse-simple surface, bound at runtime.  Signatures and
// constants from the public PulseAudio API (stable ABI of
// libpulse-simple.so.0).
using pa_simple = void;

struct PaSampleSpec {       // pa_sample_spec
  int format;               // pa_sample_format_t
  uint32_t rate;
  uint8_t channels;
};

constexpr int kPaSampleS16Le = 3;   // PA_SAMPLE_S16LE
constexpr int kPaStreamRecord = 2;  // PA_STREAM_RECORD

struct PulseApi {
  pa_simple* (*new_)(const char*, const char*, int, const char*,
                     const char*, const PaSampleSpec*, const void*,
                     const void*, int*) = nullptr;
  int (*read)(pa_simple*, void*, size_t, int*) = nullptr;
  void (*free)(pa_simple*) = nullptr;
  const char* (*strerror)(int) = nullptr;  // libpulse, best-effort
  bool ok = false;
};

const PulseApi& Api() {
  static PulseApi api;
  static std::once_flag once;
  std::call_once(once, []() {
    void* lib = dlopen("libpulse-simple.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (lib == nullptr) {
      lib = dlopen("libpulse-simple.so", RTLD_NOW | RTLD_GLOBAL);
    }
    if (lib == nullptr) return;
    api.new_ = reinterpret_cast<decltype(api.new_)>(
        dlsym(lib, "pa_simple_new"));
    api.read = reinterpret_cast<decltype(api.read)>(
        dlsym(lib, "pa_simple_read"));
    api.free = reinterpret_cast<decltype(api.free)>(
        dlsym(lib, "pa_simple_free"));
    // pa_strerror lives in libpulse.so.0, which pulse-simple links;
    // RTLD_GLOBAL makes it visible here when present
    api.strerror = reinterpret_cast<decltype(api.strerror)>(
        dlsym(RTLD_DEFAULT, "pa_strerror"));
    api.ok = api.new_ && api.read && api.free;
  });
  return api;
}

}  // namespace

bool PulseCapture::Available() { return Api().ok; }

bool PulseCapture::Open(const std::string& source, int sample_rate) {
  const PulseApi& api = Api();
  if (!api.ok) {
    std::fprintf(stderr,
                 "pulse_capture: libpulse-simple.so.0 not available on "
                 "this machine\n");
    return false;
  }
  PaSampleSpec spec;
  spec.format = kPaSampleS16Le;
  spec.rate = static_cast<uint32_t>(sample_rate);
  spec.channels = 1;
  int error = 0;
  pa_simple* s = api.new_(
      nullptr, "wekws", kPaStreamRecord,
      source.empty() ? nullptr : source.c_str(), "capture", &spec,
      nullptr, nullptr, &error);
  if (s == nullptr) {
    std::fprintf(stderr, "pulse_capture: cannot open record stream: %s\n",
                 api.strerror ? api.strerror(error) : "error");
    return false;
  }
  stream_ = s;
  return true;
}

int PulseCapture::Read(int16_t* buf, int frames) {
  if (stream_ == nullptr) return -1;
  const PulseApi& api = Api();
  int error = 0;
  int rc = api.read(static_cast<pa_simple*>(stream_), buf,
                    static_cast<size_t>(frames) * sizeof(int16_t), &error);
  if (rc < 0) {
    std::fprintf(stderr, "pulse_capture: read failed: %s\n",
                 api.strerror ? api.strerror(error) : "error");
    return -1;
  }
  return frames;
}

void PulseCapture::Close() {
  if (stream_ != nullptr) {
    Api().free(static_cast<pa_simple*>(stream_));
    stream_ = nullptr;
  }
}

}  // namespace wekws
