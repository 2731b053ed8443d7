// host_loader — native (C++17) data-loading core for ddti_tpu.
//
// The torch reference hides its data-path parallelism inside DataLoader
// worker *processes* (fork + pickle + pipe per batch). This is the
// TPU-framework equivalent as a native component: the decoded uint8 dataset
// store (written by ddti_tpu.data.store_io) is mmap'd, and a pool of
// C++ threads assembles shuffled batches into a bounded ring of
// pre-allocated buffers while the device computes. Python talks to it via
// ctypes (no pybind11 dependency): ddti_tpu/runtime/native.py.
//
// Store format: raw uint8 array of shape (N, H, W) in C order, one file for
// images and one for masks (metadata travels on the Python side).
//
// Build: make -C ddti_tpu/runtime   (produces libhostloader.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <queue>
#include <random>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct MappedFile {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path, size_t expect) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < expect) {
      ::close(fd);
      fd = -1;
      return false;
    }
    size = st.st_size;
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      ::close(fd);
      fd = -1;
      return false;
    }
    data = static_cast<const uint8_t*>(p);
    ::madvise(const_cast<uint8_t*>(data), size, MADV_WILLNEED);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<uint8_t*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

struct Batch {
  std::vector<uint8_t> imgs;
  std::vector<uint8_t> masks;
  long epoch = 0;
};

class Loader {
 public:
  Loader(int n, int h, int w, int batch, uint64_t seed, int threads,
         int queue_depth, bool drop_last)
      : n_(n), item_(static_cast<size_t>(h) * w), batch_(batch),
        seed_(seed), queue_depth_(queue_depth), drop_last_(drop_last),
        num_threads_(threads < 1 ? 1 : threads) {}

  bool open(const char* imgs, const char* masks) {
    size_t expect = static_cast<size_t>(n_) * item_;
    if (!imgs_.open(imgs, expect) || !masks_.open(masks, expect))
      return false;
    // start workers only once the mappings are live
    for (int t = 0; t < num_threads_; ++t)
      workers_.emplace_back([this] { this->work(0); });
    return true;
  }

  // Blocks until a batch is ready; copies into caller buffers.
  // Returns the epoch index of the batch, or -1 after destroy().
  long next(uint8_t* imgs_out, uint8_t* masks_out) {
    std::unique_lock<std::mutex> lk(mu_);
    ready_cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
    if (stop_ && queue_.empty()) return -1;
    Batch b = std::move(queue_.front());
    queue_.pop();
    lk.unlock();
    space_cv_.notify_one();
    std::memcpy(imgs_out, b.imgs.data(), b.imgs.size());
    std::memcpy(masks_out, b.masks.data(), b.masks.size());
    return b.epoch;
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    ready_cv_.notify_all();
    space_cv_.notify_all();
    for (auto& t : workers_)
      if (t.joinable()) t.join();
  }

  ~Loader() { stop(); }

 private:
  // Each claim hands a worker one batch slot (epoch, step); epochs are
  // reshuffled deterministically from (seed, epoch).
  bool claim(long& epoch, long& step) {
    long ticket = ticket_.fetch_add(1);
    long steps = steps_per_epoch();
    epoch = ticket / steps;
    step = ticket % steps;
    return true;
  }

  long steps_per_epoch() const {
    return drop_last_ ? n_ / batch_ : (n_ + batch_ - 1) / batch_;
  }

  void fill_perm(std::vector<int>& perm, long epoch) {
    perm.resize(n_);
    for (int i = 0; i < n_; ++i) perm[i] = i;
    std::mt19937_64 rng(seed_ ^ (0x9e3779b97f4a7c15ULL * (epoch + 1)));
    for (int i = n_ - 1; i > 0; --i) {
      std::uniform_int_distribution<int> d(0, i);
      std::swap(perm[i], perm[d(rng)]);
    }
  }

  void work(int /*tid*/) {
    std::vector<int> perm;
    long cached_epoch = -1;
    while (true) {
      {
        std::unique_lock<std::mutex> lk(mu_);
        space_cv_.wait(lk, [this] {
          return stop_ || queue_.size() < static_cast<size_t>(queue_depth_);
        });
        if (stop_) return;
      }
      long epoch, step;
      claim(epoch, step);
      if (epoch != cached_epoch) {
        fill_perm(perm, epoch);
        cached_epoch = epoch;
      }
      Batch b;
      b.epoch = epoch;
      b.imgs.resize(static_cast<size_t>(batch_) * item_);
      b.masks.resize(static_cast<size_t>(batch_) * item_);
      for (int j = 0; j < batch_; ++j) {
        // wrap-pad the final short batch (static shapes for XLA)
        int pos = static_cast<int>((step * batch_ + j) % n_);
        int idx = perm[pos];
        std::memcpy(b.imgs.data() + static_cast<size_t>(j) * item_,
                    imgs_.data + static_cast<size_t>(idx) * item_, item_);
        std::memcpy(b.masks.data() + static_cast<size_t>(j) * item_,
                    masks_.data + static_cast<size_t>(idx) * item_, item_);
      }
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stop_) return;
        queue_.push(std::move(b));
      }
      ready_cv_.notify_one();
    }
  }

  const int n_;
  const size_t item_;
  const int batch_;
  const uint64_t seed_;
  const int queue_depth_;
  const bool drop_last_;
  const int num_threads_;

  MappedFile imgs_, masks_;
  std::vector<std::thread> workers_;
  std::queue<Batch> queue_;
  std::mutex mu_;
  std::condition_variable ready_cv_, space_cv_;
  std::atomic<long> ticket_{0};
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* loader_create(const char* imgs_path, const char* masks_path, int n,
                    int h, int w, int batch, uint64_t seed, int num_threads,
                    int queue_depth, int drop_last) {
  auto* l = new Loader(n, h, w, batch, seed, num_threads,
                       queue_depth < 1 ? 2 : queue_depth, drop_last != 0);
  if (!l->open(imgs_path, masks_path)) {
    delete l;
    return nullptr;
  }
  return l;
}

long loader_next(void* l, uint8_t* imgs_out, uint8_t* masks_out) {
  return static_cast<Loader*>(l)->next(imgs_out, masks_out);
}

void loader_destroy(void* l) { delete static_cast<Loader*>(l); }

}  // extern "C"
