// heimdall_native — C++ host runtime for the TPU inspection framework.
//
// TPU-native equivalents of the reference's native components:
//  * lock-free SPSC frame ring buffer with latency/jitter stats
//    (replaces rust/heimdall-rt/src/sync.rs RtQueue/RtChannel and the
//     tokio mpsc FrameSet channel of rust/heimdall-gige/src/lib.rs:90-155)
//  * real-time thread setup: mlockall + CPU affinity + SCHED_FIFO with
//    graceful fallback (replaces rust/heimdall-rt/src/lib.rs:232-315)
//  * a simulated camera producer thread synthesizing bottle frames at a
//    paced rate (replaces rust/heimdall-gige/src/camera.rs:598-778)
//  * scalar CPU reference kernels: grayscale, box blur, adaptive-mean
//    threshold, 4-connected flood-fill labeling, per-blob confidence
//    0.7*intensity + 0.3*shape (replaces rust/heimdall-core/src/
//    processing.rs:188-404 and detection.rs:127-317) — used by the
//    native_bridge A/B benchmark path.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

#if defined(__linux__)
#include <pthread.h>
#include <sched.h>
#include <sys/mman.h>
#endif

namespace {

using Clock = std::chrono::steady_clock;

static double now_us() {
  return std::chrono::duration<double, std::micro>(
             Clock::now().time_since_epoch())
      .count();
}

// ---------------------------------------------------------------------------
// Lock-free single-producer single-consumer frame ring buffer
// ---------------------------------------------------------------------------

struct FrameSlot {
  double timestamp_us = 0.0;
  uint64_t frame_id = 0;
  std::vector<uint8_t> data;
};

class FrameRing {
 public:
  FrameRing(size_t capacity, size_t frame_bytes)
      : capacity_(capacity), frame_bytes_(frame_bytes), slots_(capacity) {
    for (auto& s : slots_) s.data.resize(frame_bytes);
  }

  // producer side
  bool push(const uint8_t* data, uint64_t frame_id) {
    size_t head = head_.load(std::memory_order_relaxed);
    size_t next = (head + 1) % capacity_;
    if (next == tail_.load(std::memory_order_acquire)) {
      drops_.fetch_add(1, std::memory_order_relaxed);
      return false;  // full — drop (bounded latency beats backpressure)
    }
    FrameSlot& slot = slots_[head];
    std::memcpy(slot.data.data(), data, frame_bytes_);
    slot.timestamp_us = now_us();
    slot.frame_id = frame_id;
    head_.store(next, std::memory_order_release);
    pushes_.fetch_add(1, std::memory_order_relaxed);
    return true;
  }

  // consumer side; returns latency (us) in *latency_us, or -1 if empty
  int pop(uint8_t* out, uint64_t* frame_id, double* latency_us) {
    size_t tail = tail_.load(std::memory_order_relaxed);
    if (tail == head_.load(std::memory_order_acquire)) return -1;
    FrameSlot& slot = slots_[tail];
    std::memcpy(out, slot.data.data(), frame_bytes_);
    *frame_id = slot.frame_id;
    double lat = now_us() - slot.timestamp_us;
    *latency_us = lat;
    tail_.store((tail + 1) % capacity_, std::memory_order_release);
    pops_.fetch_add(1, std::memory_order_relaxed);
    // latency stats (consumer thread only — no races)
    lat_count_ += 1;
    lat_sum_ += lat;
    lat_sum2_ += lat * lat;
    if (lat > lat_max_) lat_max_ = lat;
    return 0;
  }

  size_t size() const {
    size_t h = head_.load(std::memory_order_acquire);
    size_t t = tail_.load(std::memory_order_acquire);
    return (h + capacity_ - t) % capacity_;
  }

  size_t capacity_;
  size_t frame_bytes_;
  std::vector<FrameSlot> slots_;
  std::atomic<size_t> head_{0};
  std::atomic<size_t> tail_{0};
  std::atomic<uint64_t> pushes_{0};
  std::atomic<uint64_t> pops_{0};
  std::atomic<uint64_t> drops_{0};
  // consumer-side latency accumulators
  double lat_sum_ = 0.0, lat_sum2_ = 0.0, lat_max_ = 0.0;
  uint64_t lat_count_ = 0;
};

// ---------------------------------------------------------------------------
// Simulated camera producer (paced thread writing into a FrameRing)
// ---------------------------------------------------------------------------

struct SimCamera {
  FrameRing* ring = nullptr;
  std::thread thread;
  std::atomic<bool> running{false};
  int width = 0, height = 0;
  double fps = 30.0;
  double defect_probability = 0.1;
  uint32_t rng_state = 12345;
  uint64_t frame_counter = 0;
  // jitter stats (producer thread only)
  double last_emit_us = 0.0;
  double jitter_sum_ = 0.0, jitter_max_ = 0.0;
  uint64_t jitter_count_ = 0;

  uint32_t rng() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 17;
    rng_state ^= rng_state << 5;
    return rng_state;
  }

  void synthesize(std::vector<uint8_t>& buf) {
    // gradient background + bright bottle rectangle + optional dark defect
    // (mirrors the reference's simulated GigE frame,
    //  rust/heimdall-gige/src/camera.rs:614-753)
    const int w = width, h = height;
    for (int y = 0; y < h; ++y) {
      uint8_t base = static_cast<uint8_t>(96 + (64 * y) / h);
      std::memset(&buf[static_cast<size_t>(y) * w], base, w);
    }
    int bx0 = w / 3, bx1 = 2 * w / 3, by0 = h / 4, by1 = 3 * h / 4;
    for (int y = by0; y < by1; ++y)
      for (int x = bx0; x < bx1; ++x)
        buf[static_cast<size_t>(y) * w + x] = 210;
    if ((rng() % 1000) < static_cast<uint32_t>(defect_probability * 1000)) {
      int cx = bx0 + static_cast<int>(rng() % (bx1 - bx0));
      int cy = by0 + static_cast<int>(rng() % (by1 - by0));
      int radius = 3 + static_cast<int>(rng() % 8);
      for (int y = cy - radius; y <= cy + radius; ++y)
        for (int x = cx - radius; x <= cx + radius; ++x)
          if (y >= 0 && y < h && x >= 0 && x < w &&
              (x - cx) * (x - cx) + (y - cy) * (y - cy) <= radius * radius)
            buf[static_cast<size_t>(y) * w + x] = 30;
    }
  }

  void run() {
    std::vector<uint8_t> buf(static_cast<size_t>(width) * height);
    const double period_us = 1e6 / fps;
    double next_us = now_us();
    while (running.load(std::memory_order_relaxed)) {
      synthesize(buf);
      ring->push(buf.data(), frame_counter++);
      double emitted = now_us();
      if (last_emit_us > 0.0) {
        double jitter = std::fabs((emitted - last_emit_us) - period_us);
        jitter_sum_ += jitter;
        jitter_count_ += 1;
        if (jitter > jitter_max_) jitter_max_ = jitter;
      }
      last_emit_us = emitted;
      next_us += period_us;
      double wait = next_us - now_us();
      if (wait > 0)
        std::this_thread::sleep_for(
            std::chrono::duration<double, std::micro>(wait));
      else
        next_us = now_us();  // overrun: resync
    }
  }
};

// ---------------------------------------------------------------------------
// Scalar CPU reference kernels (native benchmark / fallback path)
// ---------------------------------------------------------------------------

void gray_bt601(const uint8_t* bgr, int h, int w, uint8_t* out) {
  for (int i = 0; i < h * w; ++i) {
    int b = bgr[3 * i], g = bgr[3 * i + 1], r = bgr[3 * i + 2];
    out[i] = static_cast<uint8_t>((b * 3735 + g * 19235 + r * 9798 + 16384)
                                  >> 15);
  }
}

void box_blur5(const uint8_t* in, int h, int w, uint8_t* out) {
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int sum = 0, cnt = 0;
      for (int dy = -2; dy <= 2; ++dy)
        for (int dx = -2; dx <= 2; ++dx) {
          int yy = y + dy, xx = x + dx;
          if (yy >= 0 && yy < h && xx >= 0 && xx < w) {
            sum += in[yy * w + xx];
            ++cnt;
          }
        }
      out[y * w + x] = static_cast<uint8_t>(sum / cnt);
    }
}

void adaptive_mean_threshold(const uint8_t* in, int h, int w, int block,
                             int c, uint8_t* out) {
  int r = block / 2;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int sum = 0, cnt = 0;
      for (int dy = -r; dy <= r; ++dy)
        for (int dx = -r; dx <= r; ++dx) {
          int yy = y + dy, xx = x + dx;
          if (yy >= 0 && yy < h && xx >= 0 && xx < w) {
            sum += in[yy * w + xx];
            ++cnt;
          }
        }
      int mean = sum / cnt;
      out[y * w + x] = (in[y * w + x] <= mean - c) ? 255 : 0;
    }
}

// 4-connected flood-fill labeling; returns blob count, fills per-blob stats
int flood_fill_blobs(const uint8_t* binary, const uint8_t* gray, int h, int w,
                     int min_size, int max_size, float* out_stats,
                     int max_blobs) {
  std::vector<int32_t> labels(static_cast<size_t>(h) * w, -1);
  int n_blobs = 0;
  std::vector<int> stack;
  for (int start = 0; start < h * w; ++start) {
    if (binary[start] == 0 || labels[start] >= 0) continue;
    stack.clear();
    stack.push_back(start);
    labels[start] = n_blobs;
    long area = 0, sum_x = 0, sum_y = 0, fg_sum = 0;
    int x0 = w, x1 = -1, y0 = h, y1 = -1;
    while (!stack.empty()) {
      int p = stack.back();
      stack.pop_back();
      int y = p / w, x = p % w;
      ++area;
      sum_x += x;
      sum_y += y;
      fg_sum += gray[p];
      if (x < x0) x0 = x;
      if (x > x1) x1 = x;
      if (y < y0) y0 = y;
      if (y > y1) y1 = y;
      const int nb[4] = {p - w, p + w, p - 1, p + 1};
      const bool ok[4] = {y > 0, y < h - 1, x > 0, x < w - 1};
      for (int i = 0; i < 4; ++i)
        if (ok[i] && binary[nb[i]] && labels[nb[i]] < 0) {
          labels[nb[i]] = n_blobs;
          stack.push_back(nb[i]);
        }
    }
    if (area < min_size || area > max_size) continue;
    if (n_blobs < max_blobs) {
      // background mean over the bbox expanded by a margin (the
      // reference native path samples around the blob, not just inside
      // its bbox — detection.rs fg/bg margin)
      const int margin = 4;
      long bg_sum = 0, bg_cnt = 0;
      for (int y = std::max(y0 - margin, 0);
           y <= std::min(y1 + margin, h - 1); ++y)
        for (int x = std::max(x0 - margin, 0);
             x <= std::min(x1 + margin, w - 1); ++x) {
          int p = y * w + x;
          if (!binary[p]) {
            bg_sum += gray[p];
            ++bg_cnt;
          }
        }
      float fg_mean = static_cast<float>(fg_sum) / area;
      float bg_mean = bg_cnt ? static_cast<float>(bg_sum) / bg_cnt : 127.f;
      float intensity = std::fmin(1.f, std::fabs(bg_mean - fg_mean) / 30.f);
      float rect = static_cast<float>(x1 - x0 + 1) * (y1 - y0 + 1);
      float shape = 1.f - static_cast<float>(area) / rect;
      // native confidence blend (reference detection.rs:294-298)
      float conf = 0.7f * intensity + 0.3f * shape;
      float* s = out_stats + static_cast<size_t>(n_blobs) * 8;
      s[0] = static_cast<float>(sum_x) / area;  // cx
      s[1] = static_cast<float>(sum_y) / area;  // cy
      s[2] = static_cast<float>(area);
      s[3] = static_cast<float>(x0);
      s[4] = static_cast<float>(y0);
      s[5] = static_cast<float>(x1 - x0 + 1);
      s[6] = static_cast<float>(y1 - y0 + 1);
      s[7] = conf;
    }
    ++n_blobs;
  }
  return n_blobs;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// --- RT environment (heimdall-rt equivalent) ------------------------------

int hn_init_rt(int cpu, int priority, int lock_memory) {
  int status = 0;
#if defined(__linux__)
  if (lock_memory) {
    if (mlockall(MCL_CURRENT | MCL_FUTURE) != 0) status |= 1;
  }
  if (cpu >= 0) {
    cpu_set_t set;
    CPU_ZERO(&set);
    CPU_SET(cpu, &set);
    if (sched_setaffinity(0, sizeof(set), &set) != 0) status |= 2;
  }
  if (priority > 0) {
    sched_param param{};
    param.sched_priority = priority;
    if (sched_setscheduler(0, SCHED_FIFO, &param) != 0) status |= 4;
  }
#else
  status = 7;
#endif
  return status;  // bitmask of failed steps; 0 = full RT setup
}

// --- frame ring ------------------------------------------------------------

void* hn_ring_create(int capacity, int frame_bytes) {
  return new FrameRing(static_cast<size_t>(capacity),
                       static_cast<size_t>(frame_bytes));
}

void hn_ring_destroy(void* ring) { delete static_cast<FrameRing*>(ring); }

int hn_ring_push(void* ring, const uint8_t* data, uint64_t frame_id) {
  return static_cast<FrameRing*>(ring)->push(data, frame_id) ? 0 : -1;
}

int hn_ring_pop(void* ring, uint8_t* out, uint64_t* frame_id,
                double* latency_us) {
  return static_cast<FrameRing*>(ring)->pop(out, frame_id, latency_us);
}

int hn_ring_size(void* ring) {
  return static_cast<int>(static_cast<FrameRing*>(ring)->size());
}

void hn_ring_stats(void* ring, double* out6) {
  auto* r = static_cast<FrameRing*>(ring);
  out6[0] = static_cast<double>(r->pushes_.load());
  out6[1] = static_cast<double>(r->pops_.load());
  out6[2] = static_cast<double>(r->drops_.load());
  uint64_t n = r->lat_count_;
  out6[3] = n ? r->lat_sum_ / n : 0.0;                       // mean us
  double var = n ? r->lat_sum2_ / n - (r->lat_sum_ / n) * (r->lat_sum_ / n)
                 : 0.0;
  out6[4] = var > 0 ? std::sqrt(var) : 0.0;                  // stddev us
  out6[5] = r->lat_max_;                                     // max us
}

// --- simulated camera producer --------------------------------------------

void* hn_camera_start(void* ring, int width, int height, double fps,
                      double defect_probability, int cpu, int rt_priority,
                      uint32_t seed) {
  auto* cam = new SimCamera();
  cam->ring = static_cast<FrameRing*>(ring);
  cam->width = width;
  cam->height = height;
  cam->fps = fps;
  cam->defect_probability = defect_probability;
  cam->rng_state = seed ? seed : 12345;
  cam->running.store(true);
  cam->thread = std::thread([cam, cpu, rt_priority] {
    if (cpu >= 0 || rt_priority > 0) hn_init_rt(cpu, rt_priority, 0);
    cam->run();
  });
  return cam;
}

void hn_camera_stop(void* camera) {
  auto* cam = static_cast<SimCamera*>(camera);
  cam->running.store(false);
  if (cam->thread.joinable()) cam->thread.join();
  delete cam;
}

void hn_camera_stats(void* camera, double* out3) {
  auto* cam = static_cast<SimCamera*>(camera);
  out3[0] = static_cast<double>(cam->frame_counter);
  out3[1] = cam->jitter_count_ ? cam->jitter_sum_ / cam->jitter_count_ : 0.0;
  out3[2] = cam->jitter_max_;
}

// --- scalar reference kernels ----------------------------------------------

void hn_process_basic(const uint8_t* bgr, int h, int w, uint8_t* out_gray,
                      uint8_t* out_binary) {
  std::vector<uint8_t> gray(static_cast<size_t>(h) * w);
  gray_bt601(bgr, h, w, gray.data());
  std::vector<uint8_t> blurred(gray.size());
  box_blur5(gray.data(), h, w, blurred.data());
  for (size_t i = 0; i < gray.size(); ++i)
    out_binary[i] = blurred[i] > 127 ? 255 : 0;
  std::memcpy(out_gray, gray.data(), gray.size());
}

// Full contamination pipeline; out_stats is float32[max_blobs * 8]:
// (cx, cy, area, x, y, w, h, confidence).  Returns blob count.
int hn_detect_contamination(const uint8_t* bgr, int h, int w, int min_size,
                            int max_size, int threshold, float* out_stats,
                            int max_blobs) {
  std::vector<uint8_t> gray(static_cast<size_t>(h) * w);
  gray_bt601(bgr, h, w, gray.data());
  std::vector<uint8_t> blurred(gray.size());
  box_blur5(gray.data(), h, w, blurred.data());
  std::vector<uint8_t> binary(gray.size());
  adaptive_mean_threshold(blurred.data(), h, w, 11, threshold, binary.data());
  return flood_fill_blobs(binary.data(), gray.data(), h, w, min_size,
                          max_size, out_stats, max_blobs);
}

double hn_benchmark_processing(const uint8_t* bgr, int h, int w,
                               int iterations) {
  std::vector<float> stats(64 * 8);
  double t0 = now_us();
  for (int i = 0; i < iterations; ++i)
    hn_detect_contamination(bgr, h, w, 10, 3000, 15, stats.data(), 64);
  return (now_us() - t0) / 1000.0 / iterations;  // ms per iteration
}

}  // extern "C"
