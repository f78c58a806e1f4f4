// Minimal glog-style logging for the streaming runtime.
// Structural equivalent of the reference's header-only logger
// (/root/reference/runtime/core/utils/log.h) — fresh implementation.
#ifndef WEKWS_TPU_UTILS_LOG_H_
#define WEKWS_TPU_UTILS_LOG_H_

#include <cstdlib>
#include <iostream>
#include <sstream>

namespace wekws {

enum class LogSeverity { kInfo = 0, kWarning, kError, kFatal };

class LogMessage {
 public:
  LogMessage(const char* file, int line, LogSeverity severity)
      : severity_(severity) {
    stream_ << "[" << Label(severity) << " " << file << ":" << line << "] ";
  }
  ~LogMessage() {
    std::cerr << stream_.str() << std::endl;
    if (severity_ == LogSeverity::kFatal) std::abort();
  }
  std::ostream& stream() { return stream_; }

 private:
  static const char* Label(LogSeverity s) {
    switch (s) {
      case LogSeverity::kInfo: return "INFO";
      case LogSeverity::kWarning: return "WARN";
      case LogSeverity::kError: return "ERROR";
      default: return "FATAL";
    }
  }
  LogSeverity severity_;
  std::ostringstream stream_;
};

}  // namespace wekws

#define LOG_INFO \
  ::wekws::LogMessage(__FILE__, __LINE__, ::wekws::LogSeverity::kInfo).stream()
#define LOG_WARN \
  ::wekws::LogMessage(__FILE__, __LINE__, ::wekws::LogSeverity::kWarning) \
      .stream()
#define LOG_ERROR \
  ::wekws::LogMessage(__FILE__, __LINE__, ::wekws::LogSeverity::kError).stream()
#define LOG_FATAL \
  ::wekws::LogMessage(__FILE__, __LINE__, ::wekws::LogSeverity::kFatal).stream()

#define WEKWS_CHECK(cond)                                   \
  if (!(cond))                                              \
  ::wekws::LogMessage(__FILE__, __LINE__,                   \
                      ::wekws::LogSeverity::kFatal)         \
          .stream()                                         \
      << "Check failed: " #cond " "

#endif  // WEKWS_TPU_UTILS_LOG_H_
