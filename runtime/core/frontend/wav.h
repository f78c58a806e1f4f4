// Minimal RIFF/WAV reader+writer (16-bit PCM focus, skips unknown
// subchunks, handles extended fmt).  Same role as the reference's
// wav.h (/root/reference/runtime/core/frontend/wav.h) — fresh code.
#ifndef WEKWS_TPU_FRONTEND_WAV_H_
#define WEKWS_TPU_FRONTEND_WAV_H_

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "utils/log.h"

namespace wekws {

class WavReader {
 public:
  explicit WavReader(const std::string& path) {
    ok_ = Load(path);
    WEKWS_CHECK(ok_);
  }
  // Non-aborting construction for FFI callers (capi): check ok().
  struct NoAbort {};
  WavReader(const std::string& path, NoAbort) { ok_ = Load(path); }

  bool ok() const { return ok_; }
  int sample_rate() const { return sample_rate_; }
  int num_channels() const { return num_channels_; }
  // Mono samples in int16 scale (channel 0 when multi-channel).
  const std::vector<float>& data() const { return data_; }

 private:
  bool Load(const std::string& path) {
    FILE* fp = std::fopen(path.c_str(), "rb");
    if (fp == nullptr) {
      LOG_ERROR << "cannot open " << path;
      return false;
    }
    std::fseek(fp, 0, SEEK_END);
    const long file_size = std::ftell(fp);
    std::fseek(fp, 0, SEEK_SET);
    char riff[4], wave[4];
    uint32_t riff_size = 0;
    if (std::fread(riff, 1, 4, fp) != 4 ||
        std::fread(&riff_size, 4, 1, fp) != 1 ||
        std::fread(wave, 1, 4, fp) != 4 ||
        std::memcmp(riff, "RIFF", 4) != 0 ||
        std::memcmp(wave, "WAVE", 4) != 0) {
      std::fclose(fp);
      LOG_ERROR << "not a RIFF/WAVE file: " << path;
      return false;
    }
    uint16_t format = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    bool got_fmt = false;
    while (true) {
      char id[4];
      uint32_t size = 0;
      if (std::fread(id, 1, 4, fp) != 4 || std::fread(&size, 4, 1, fp) != 1) {
        break;
      }
      if (std::memcmp(id, "fmt ", 4) == 0) {
        uint16_t block_align = 0;
        uint32_t byte_rate = 0;
        std::fread(&format, 2, 1, fp);
        std::fread(&channels, 2, 1, fp);
        std::fread(&rate, 4, 1, fp);
        std::fread(&byte_rate, 4, 1, fp);
        std::fread(&block_align, 2, 1, fp);
        std::fread(&bits, 2, 1, fp);
        uint32_t consumed = 16;
        if (format == 0xFFFE && size >= 26) {
          // WAVE_FORMAT_EXTENSIBLE: the REAL format code is the first
          // two bytes of the SubFormat GUID (after cbSize,
          // wValidBitsPerSample, dwChannelMask) — resolve it so float
          // wavs wrapped in 0xFFFE are rejected, not decoded as int32
          uint16_t cb = 0, valid_bits = 0;
          uint32_t channel_mask = 0;
          uint16_t sub_format = 0;
          std::fread(&cb, 2, 1, fp);
          std::fread(&valid_bits, 2, 1, fp);
          std::fread(&channel_mask, 4, 1, fp);
          std::fread(&sub_format, 2, 1, fp);
          format = sub_format;
          consumed = 26;
        }
        if (size > consumed) std::fseek(fp, size - consumed, SEEK_CUR);
        got_fmt = true;
      } else if (std::memcmp(id, "data", 4) == 0) {
        if (!got_fmt) {
          LOG_ERROR << path << ": data chunk before fmt";
          std::fclose(fp);
          return false;
        }
        // a corrupt header can claim a multi-GB chunk: clamp to what
        // the file actually holds (fuzz finding — the old raw(size)
        // allocation aborted the process on bad_alloc)
        const long pos = std::ftell(fp);
        if (pos >= 0 && file_size >= pos &&
            size > static_cast<uint32_t>(file_size - pos)) {
          size = static_cast<uint32_t>(file_size - pos);
        }
        // Fail loudly on layouts we cannot decode instead of silently
        // producing zeros (an unsupported bit depth used to fall
        // through every branch and push 0.0f — e.g. a 24-bit wav
        // decoded as silence).  The plain constructor aborts via its
        // WEKWS_CHECK; the NoAbort form reports ok()=false.
        if (format != 1) {
          LOG_ERROR << path << ": unsupported wav format tag " << format
                    << " (integer PCM only)";
          std::fclose(fp);
          return false;
        }
        if (!(bits == 8 || bits == 16 || bits == 24 || bits == 32)) {
          LOG_ERROR << path << ": unsupported wav bit depth " << bits;
          std::fclose(fp);
          return false;
        }
        if (channels == 0) {
          LOG_ERROR << path << ": wav has zero channels";
          std::fclose(fp);
          return false;
        }
        const int bytes_per_sample = bits / 8;
        const size_t n = size / bytes_per_sample;
        std::vector<char> raw(size);
        size_t read = std::fread(raw.data(), 1, size, fp);
        const size_t samples = read / bytes_per_sample;
        data_.reserve(samples / channels);
        for (size_t i = 0; i < samples; i += channels) {
          float v = 0.0f;
          if (bits == 16) {
            int16_t s;
            std::memcpy(&s, raw.data() + i * 2, 2);
            v = static_cast<float>(s);
          } else if (bits == 32) {
            int32_t s;
            std::memcpy(&s, raw.data() + i * 4, 4);
            v = static_cast<float>(s) / 65536.0f;
          } else if (bits == 24) {
            // 3-byte little-endian signed -> int16 scale
            const unsigned char* p =
                reinterpret_cast<unsigned char*>(raw.data()) + i * 3;
            int32_t s = (static_cast<int32_t>(p[2]) << 24 |
                         static_cast<int32_t>(p[1]) << 16 |
                         static_cast<int32_t>(p[0]) << 8) >> 8;
            v = static_cast<float>(s) / 256.0f;
          } else if (bits == 8) {
            v = (static_cast<float>(
                     static_cast<unsigned char>(raw[i])) - 128.0f) * 256.0f;
          }
          data_.push_back(v);
        }
        (void)n;
        break;
      } else {
        std::fseek(fp, size + (size & 1), SEEK_CUR);  // skip (word align)
      }
    }
    std::fclose(fp);
    sample_rate_ = static_cast<int>(rate);
    num_channels_ = channels;
    return got_fmt && !data_.empty();
  }

  bool ok_ = false;
  int sample_rate_ = 0;
  int num_channels_ = 0;
  std::vector<float> data_;
};

class WavWriter {
 public:
  // samples in int16 scale
  static void Write(const std::string& path, const std::vector<float>& data,
                    int sample_rate) {
    FILE* fp = std::fopen(path.c_str(), "wb");
    WEKWS_CHECK(fp != nullptr) << "cannot open " << path;
    const uint32_t data_size = static_cast<uint32_t>(data.size() * 2);
    const uint32_t riff_size = 36 + data_size;
    const uint16_t one = 1, channels = 1, bits = 16;
    const uint32_t rate = sample_rate, byte_rate = sample_rate * 2;
    const uint16_t block_align = 2;
    const uint32_t fmt_size = 16;
    std::fwrite("RIFF", 1, 4, fp);
    std::fwrite(&riff_size, 4, 1, fp);
    std::fwrite("WAVE", 1, 4, fp);
    std::fwrite("fmt ", 1, 4, fp);
    std::fwrite(&fmt_size, 4, 1, fp);
    std::fwrite(&one, 2, 1, fp);
    std::fwrite(&channels, 2, 1, fp);
    std::fwrite(&rate, 4, 1, fp);
    std::fwrite(&byte_rate, 4, 1, fp);
    std::fwrite(&block_align, 2, 1, fp);
    std::fwrite(&bits, 2, 1, fp);
    std::fwrite("data", 1, 4, fp);
    std::fwrite(&data_size, 4, 1, fp);
    for (float v : data) {
      int16_t s = static_cast<int16_t>(
          std::max(-32768.0f, std::min(32767.0f, v)));
      std::fwrite(&s, 2, 1, fp);
    }
    std::fclose(fp);
  }
};

}  // namespace wekws

#endif  // WEKWS_TPU_FRONTEND_WAV_H_
