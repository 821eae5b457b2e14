// frame_pump — native host-side video decode + preprocess runtime.
//
// The TPU pipeline's host boundary is "fixed-size uint8 RGB frame batches"
// (funscript_flow_tpu.io.decode). The pure-Python source pays GIL + per-frame
// Python overhead; this C++ runtime runs the whole decode->resize->crop->RGB
// chain on native threads (OpenCV C++, same codecs the reference used through
// cv2 bindings: FunscriptFlow.pyw:103-291) and hands Python finished batches.
//
// Architecture: one decoder thread per pump does a single sequential pass
// (grab() skips unsampled frames; no POS_FRAMES seeking, unlike the
// reference's seek-per-frame pool, :177-178), preprocesses into pooled frame
// buffers, and feeds a bounded queue. fp_next_batch() memcpy's up to N frames
// into the caller's pinned numpy buffer. Failure semantics match the Python
// path: short container -> clean EOF; failed retrieve -> black frame.
//
// C ABI (ctypes): fp_open / fp_meta / fp_next_batch / fp_cancel / fp_close.

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int kOutSize = 256;   // analysis resolution (SURVEY.md §6)
constexpr int kVrSize = 512;    // VR: resize 512, crop bottom-left quadrant

struct FramePump {
  cv::VideoCapture cap;
  double fps = 0.0;
  long long total_frames = 0;
  int src_w = 0, src_h = 0;
  int step = 1;
  bool vr_mode = false;
  bool gray = false;            // emit 1-channel gray (production path)
  size_t queue_depth = 256;
  long long start_sample = 0;   // first sampled-grid index this pump decodes
  long long max_samples = -1;   // -1 = through end of video

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<std::vector<unsigned char>> queue;
  std::deque<std::vector<unsigned char>> pool;
  std::atomic<bool> done{false};
  std::atomic<bool> cancel{false};

  size_t frame_bytes() const {
    return static_cast<size_t>(kOutSize) * kOutSize * (gray ? 1 : 3);
  }

  void run() {
    cv::Mat bgr, resized, cropped, rgb;
    long long pos = start_sample * step;
    long long n_total = (total_frames + step - 1) / step;
    long long n_samples = n_total - start_sample;
    if (max_samples >= 0 && max_samples < n_samples) n_samples = max_samples;
    if (n_samples < 0) n_samples = 0;
    long long emitted = 0;
    while (!cancel.load() && emitted < n_samples) {
      if (!cap.grab()) break;  // container shorter than advertised: clean EOF
      if (pos % step == 0) {
        std::vector<unsigned char> buf = take_buffer();
        bool ok = cap.retrieve(bgr);
        if (ok && !bgr.empty()) {
          preprocess(bgr, buf.data());
        } else {
          std::memset(buf.data(), 0, frame_bytes());  // black frame on failure
        }
        push(std::move(buf));
        emitted++;
      }
      pos++;
    }
    done.store(true);
    cv_pop.notify_all();
  }

  void preprocess(const cv::Mat& bgr, unsigned char* out) {
    // gray output = cv2 BGR2GRAY (BT.601 fixed point), bit-identical to the
    // on-device rgb_to_gray_cv — the production path ships 1/3 the bytes
    cv::Mat dst(kOutSize, kOutSize, gray ? CV_8UC1 : CV_8UC3, out);
    const int code = gray ? cv::COLOR_BGR2GRAY : cv::COLOR_BGR2RGB;
    if (vr_mode) {
      cv::Mat r512;
      cv::resize(bgr, r512, cv::Size(kVrSize, kVrSize), 0, 0, cv::INTER_LINEAR);
      cv::Mat crop = r512(cv::Rect(0, kVrSize / 2, kVrSize / 2, kVrSize / 2));
      cv::cvtColor(crop, dst, code);
    } else {
      cv::Mat r256;
      cv::resize(bgr, r256, cv::Size(kOutSize, kOutSize), 0, 0, cv::INTER_LINEAR);
      cv::cvtColor(r256, dst, code);
    }
  }

  std::vector<unsigned char> take_buffer() {
    std::unique_lock<std::mutex> lk(mu);
    if (!pool.empty()) {
      auto b = std::move(pool.front());
      pool.pop_front();
      return b;
    }
    return std::vector<unsigned char>(frame_bytes());
  }

  void push(std::vector<unsigned char> buf) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] { return queue.size() < queue_depth || cancel.load(); });
    if (cancel.load()) return;
    queue.push_back(std::move(buf));
    cv_pop.notify_one();
  }

  // Returns frames copied (0 => EOF).
  int next_batch(unsigned char* out, int max_frames) {
    int n = 0;
    std::unique_lock<std::mutex> lk(mu);
    while (n < max_frames) {
      cv_pop.wait(lk, [&] { return !queue.empty() || done.load() || cancel.load(); });
      if (cancel.load()) return n;
      if (queue.empty()) break;  // done && drained
      auto buf = std::move(queue.front());
      queue.pop_front();
      std::memcpy(out + static_cast<size_t>(n) * frame_bytes(), buf.data(), frame_bytes());
      pool.push_back(std::move(buf));
      cv_push.notify_one();
      n++;
    }
    return n;
  }
};

}  // namespace

extern "C" {

// Range variant: decode ``max_samples`` sampled-grid frames starting at
// sampled index ``start_sample`` (one frame-accurate seek, then sequential).
// Powers host-parallel decode: N pumps over disjoint contiguous ranges.
void* fp_open_range(const char* path, int vr_mode, int step, int queue_depth,
                    long long start_sample, long long max_samples, int gray) {
  auto* p = new FramePump();
  if (!p->cap.open(path)) {
    delete p;
    return nullptr;
  }
  p->fps = p->cap.get(cv::CAP_PROP_FPS);
  p->total_frames = static_cast<long long>(p->cap.get(cv::CAP_PROP_FRAME_COUNT));
  p->src_w = static_cast<int>(p->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  p->src_h = static_cast<int>(p->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  p->step = step > 0 ? step : 1;
  p->vr_mode = vr_mode != 0;
  p->queue_depth = queue_depth > 0 ? static_cast<size_t>(queue_depth) : 256;
  p->start_sample = start_sample > 0 ? start_sample : 0;
  p->max_samples = max_samples;
  p->gray = gray != 0;
  if (p->start_sample > 0) {
    p->cap.set(cv::CAP_PROP_POS_FRAMES,
               static_cast<double>(p->start_sample * p->step));
  }
  p->worker = std::thread([p] { p->run(); });
  return p;
}

void* fp_open(const char* path, int vr_mode, int step, int queue_depth) {
  return fp_open_range(path, vr_mode, step, queue_depth, 0, -1, 0);
}

void fp_meta(void* h, double* fps, long long* total_frames, int* w, int* hgt) {
  auto* p = static_cast<FramePump*>(h);
  if (fps) *fps = p->fps;
  if (total_frames) *total_frames = p->total_frames;
  if (w) *w = p->src_w;
  if (hgt) *hgt = p->src_h;
}

int fp_next_batch(void* h, unsigned char* out, int max_frames) {
  return static_cast<FramePump*>(h)->next_batch(out, max_frames);
}

void fp_cancel(void* h) {
  auto* p = static_cast<FramePump*>(h);
  p->cancel.store(true);
  p->cv_push.notify_all();
  p->cv_pop.notify_all();
}

void fp_close(void* h) {
  auto* p = static_cast<FramePump*>(h);
  p->cancel.store(true);
  p->cv_push.notify_all();
  p->cv_pop.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
