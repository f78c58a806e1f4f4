// Bounded thread-safe MPMC queue (producer: audio thread, consumer:
// decode loop).  Same role as the reference's BlockingQueue
// (/root/reference/runtime/core/utils/blocking_queue.h) — fresh
// implementation with batch pop and a finish/close signal folded in.
#ifndef WEKWS_TPU_UTILS_BLOCKING_QUEUE_H_
#define WEKWS_TPU_UTILS_BLOCKING_QUEUE_H_

#include <condition_variable>
#include <deque>
#include <mutex>
#include <vector>

namespace wekws {

template <typename T>
class BlockingQueue {
 public:
  explicit BlockingQueue(size_t capacity = 1 << 20) : capacity_(capacity) {}

  void Push(T value) {
    {
      std::unique_lock<std::mutex> lock(mutex_);
      not_full_.wait(lock,
                     [this] { return queue_.size() < capacity_ || closed_; });
      if (closed_) return;
      queue_.push_back(std::move(value));
    }
    not_empty_.notify_one();
  }

  // Pops one element; returns false when the queue is closed and empty.
  bool Pop(T* out) {
    std::unique_lock<std::mutex> lock(mutex_);
    not_empty_.wait(lock, [this] { return !queue_.empty() || closed_; });
    if (queue_.empty()) return false;
    *out = std::move(queue_.front());
    queue_.pop_front();
    not_full_.notify_one();
    return true;
  }

  // Pops up to n elements (at least 1 unless closed+empty).
  std::vector<T> PopBatch(size_t n) {
    std::vector<T> out;
    std::unique_lock<std::mutex> lock(mutex_);
    not_empty_.wait(lock, [this] { return !queue_.empty() || closed_; });
    while (!queue_.empty() && out.size() < n) {
      out.push_back(std::move(queue_.front()));
      queue_.pop_front();
    }
    not_full_.notify_all();
    return out;
  }

  void Close() {
    {
      std::lock_guard<std::mutex> lock(mutex_);
      closed_ = true;
    }
    not_empty_.notify_all();
    not_full_.notify_all();
  }

  size_t Size() const {
    std::lock_guard<std::mutex> lock(mutex_);
    return queue_.size();
  }

  bool Empty() const { return Size() == 0; }

  void Clear() {
    std::lock_guard<std::mutex> lock(mutex_);
    queue_.clear();
    not_full_.notify_all();
  }

 private:
  size_t capacity_;
  mutable std::mutex mutex_;
  std::condition_variable not_empty_;
  std::condition_variable not_full_;
  std::deque<T> queue_;
  bool closed_ = false;
};

}  // namespace wekws

#endif  // WEKWS_TPU_UTILS_BLOCKING_QUEUE_H_
