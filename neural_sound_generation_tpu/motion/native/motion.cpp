// Motion-capture runtime: C++ core of the motion-conditioning stack.
//
// The reference vendors the Leap Motion C++ SDK (src/Leap.h: Controller /
// Listener callback model over a Frame -> Hand -> Finger -> Bone scene
// graph) plus a SWIG-generated CPython binding (src/LeapPython.cpp) so a
// Python Listener subclass receives per-frame callbacks from the device
// service thread (SURVEY.md §2 rows 20-22, §3.4).
//
// No physical device exists in a TPU environment, so this library
// re-designs that capability as:
//   * the same scene-graph feature model (hand direction pitch/yaw, palm
//     normal roll, per-finger adjacent-bone joint angles — the 18-feature
//     vector consumed by src/inference.py:100-149),
//   * two frame sources: a CSV *replay* driver (streams recordings in the
//     results/joint_angle_data.csv format at a configurable frame rate)
//     and a *synthetic hand* (full bone-direction scene graph animated by
//     smooth oscillators; joint angles are derived in C++ exactly as the
//     reference derives them from Leap bone directions),
//   * a producer thread with both pull (poll/read) and push (registered
//     callback) delivery — the Controller/Listener model without SWIG:
//     the C ABI below binds to Python via ctypes.
//
// Build: `make` in this directory produces libnsgmotion.so.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kNumFingers = 5;
constexpr int kBonesPerFinger = 4;
constexpr int kNumFeatures = 3 + kNumFingers * (kBonesPerFinger - 1);  // 18

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(double x_, double y_, double z_) : x(x_), y(y_), z(z_) {}
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  double norm() const { return std::sqrt(dot(*this)); }
  Vec3 normalized() const {
    double n = norm();
    return n > 1e-12 ? Vec3(x / n, y / n, z / n) : Vec3(0, 0, -1);
  }
  // Leap-convention angles (LeapMath.h semantics): pitch/yaw from a
  // direction vector, roll from the palm normal.
  double pitch() const { return std::atan2(y, -z); }
  double yaw() const { return std::atan2(x, -z); }
  double roll() const { return std::atan2(x, -y); }
};

struct Bone {
  Vec3 direction;  // unit vector from prev_joint to next_joint
};

struct Finger {
  Bone bones[kBonesPerFinger];  // metacarpal, proximal, intermediate, distal
};

struct Hand {
  Vec3 direction;    // palm-to-fingers direction
  Vec3 palm_normal;  // out of the palm
  Finger fingers[kNumFingers];
};

struct Frame {
  int64_t id = 0;
  int64_t timestamp_us = 0;
  bool has_hand = false;
  Hand hand;
  double features[kNumFeatures] = {0};
};

// Joint-angle feature extraction — the exact computation the reference
// performs per frame in Python (src/inference.py:100-144): [pitch, roll,
// yaw] then, per finger, the dot product of each adjacent bone-direction
// pair ((0,1), (1,2), (2,3)).
void extract_features(const Hand& hand, double out[kNumFeatures]) {
  out[0] = hand.direction.pitch();
  out[1] = hand.palm_normal.roll();
  out[2] = hand.direction.yaw();
  int k = 3;
  for (int f = 0; f < kNumFingers; ++f) {
    for (int b = 1; b < kBonesPerFinger; ++b) {
      out[k++] = hand.fingers[f].bones[b - 1].direction.dot(
          hand.fingers[f].bones[b].direction);
    }
  }
}

// ---------------------------------------------------------------------------
// Frame sources
// ---------------------------------------------------------------------------

class FrameSource {
 public:
  virtual ~FrameSource() = default;
  // Fill `frame` for step `i`; return false when the stream is exhausted.
  virtual bool next(int64_t i, Frame* frame) = 0;
  virtual int64_t length() const { return -1; }  // -1 = unbounded
};

// Replays rows of a joint-angle CSV (18 doubles per line; the checked-in
// recording format results/joint_angle_data.csv). Features are replayed
// verbatim; the scene graph is not reconstructed (a recording stores only
// the reduced features, as in the reference).
class CsvReplaySource : public FrameSource {
 public:
  explicit CsvReplaySource(const char* path, bool loop) : loop_(loop) {
    std::ifstream in(path);
    std::string line;
    while (std::getline(in, line)) {
      if (line.empty()) continue;
      std::vector<double> row;
      std::stringstream ss(line);
      std::string cell;
      while (std::getline(ss, cell, ',')) {
        try {
          row.push_back(std::stod(cell));
        } catch (...) {
          row.clear();
          break;  // header or malformed line: skip
        }
      }
      if (!row.empty()) rows_.push_back(std::move(row));
    }
  }

  bool ok() const { return !rows_.empty(); }
  int64_t length() const override {
    return loop_ ? -1 : static_cast<int64_t>(rows_.size());
  }

  bool next(int64_t i, Frame* frame) override {
    if (rows_.empty()) return false;
    if (!loop_ && i >= static_cast<int64_t>(rows_.size())) return false;
    const auto& row = rows_[static_cast<size_t>(i % rows_.size())];
    frame->has_hand = true;
    int n = static_cast<int>(row.size());
    for (int k = 0; k < kNumFeatures; ++k)
      frame->features[k] = k < n ? row[k] : 0.0;
    return true;
  }

 private:
  std::vector<std::vector<double>> rows_;
  bool loop_;
};

// Synthetic hand: animates a full bone-direction scene graph with smooth
// per-joint oscillators (deterministic per seed), then extracts features
// through the same C++ path a real device frame would take.
class SyntheticHandSource : public FrameSource {
 public:
  SyntheticHandSource(uint64_t seed, int64_t n_frames)
      : seed_(seed), n_frames_(n_frames) {}

  int64_t length() const override { return n_frames_; }

  bool next(int64_t i, Frame* frame) override {
    if (n_frames_ >= 0 && i >= n_frames_) return false;
    double t = static_cast<double>(i) / 60.0;
    Hand& h = frame->hand;
    frame->has_hand = true;

    auto osc = [&](int channel, double lo, double hi, double speed) {
      // deterministic phase from seed+channel (splitmix-style hash)
      uint64_t z = seed_ + 0x9e3779b97f4a7c15ULL * (channel + 1);
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      double phase = static_cast<double>((z ^ (z >> 31)) & 0xffff) / 65536.0;
      double s = 0.5 + 0.5 * std::sin(2 * M_PI * (speed * t + phase));
      return lo + (hi - lo) * s;
    };

    // palm orientation sweeps
    double pitch = osc(0, -0.6, 0.6, 0.11);
    double yaw = osc(1, -0.5, 0.5, 0.073);
    double roll = osc(2, -0.8, 0.8, 0.059);
    h.direction =
        Vec3(std::sin(yaw), std::sin(pitch), -std::cos(pitch) * std::cos(yaw))
            .normalized();
    h.palm_normal = Vec3(std::sin(roll), -std::cos(roll), 0).normalized();

    // fingers curl smoothly; each bone bends a little more than the last
    for (int f = 0; f < kNumFingers; ++f) {
      double curl = osc(3 + f, 0.0, 1.2, 0.17 + 0.04 * f);
      double spread = (f - 2) * 0.15;
      double bend = 0.0;
      for (int b = 0; b < kBonesPerFinger; ++b) {
        bend += curl * (0.2 + 0.15 * b);
        h.fingers[f].bones[b].direction =
            Vec3(std::sin(spread), -std::sin(bend), -std::cos(bend)).normalized();
      }
    }
    extract_features(h, frame->features);
    return true;
  }

 private:
  uint64_t seed_;
  int64_t n_frames_;
};

// ---------------------------------------------------------------------------
// Controller: producer thread + pull/push delivery
// ---------------------------------------------------------------------------

using FrameCallback = void (*)(const double* features, int n, void* user);

class Controller {
 public:
  Controller(FrameSource* source, double fps)
      : source_(source), fps_(fps > 0 ? fps : 60.0) {}

  ~Controller() {
    stop();
    delete source_;
  }

  void set_callback(FrameCallback cb, void* user) {
    std::lock_guard<std::mutex> lock(mu_);
    callback_ = cb;
    callback_user_ = user;
  }

  void start() {
    if (running_.exchange(true)) return;
    thread_ = std::thread([this] { run(); });
  }

  void stop() {
    running_ = false;
    cv_.notify_all();
    // Always join if joinable: the producer may have exited on its own
    // (stream exhausted) with running_ already false — destroying a
    // joinable std::thread terminates the process.
    if (thread_.joinable()) thread_.join();
  }

  bool running() const { return running_.load(); }

  // Latest frame, non-blocking. Returns frame id or -1 if none yet.
  int64_t poll(double* out, int n) {
    std::lock_guard<std::mutex> lock(mu_);
    if (latest_.id == 0 && !latest_.has_hand) return -1;
    for (int k = 0; k < n && k < kNumFeatures; ++k) out[k] = latest_.features[k];
    return latest_.id;
  }

  // Blocking: wait for a frame newer than `after_id`. Returns id, or -1
  // on stream end / stop.
  int64_t read(int64_t after_id, double* out, int n, double timeout_s) {
    std::unique_lock<std::mutex> lock(mu_);
    auto pred = [&] { return latest_.id > after_id || done_ || !running_; };
    if (timeout_s > 0) {
      if (!cv_.wait_for(lock, std::chrono::duration<double>(timeout_s), pred))
        return -1;
    } else {
      cv_.wait(lock, pred);
    }
    if (latest_.id <= after_id) return -1;
    for (int k = 0; k < n && k < kNumFeatures; ++k) out[k] = latest_.features[k];
    return latest_.id;
  }

  // Synchronous drain (no thread): fetch up to n_frames feature rows.
  int64_t drain(double* out, int64_t n_frames) {
    Frame frame;
    int64_t count = 0;
    while (count < n_frames && source_->next(next_index_++, &frame)) {
      frame.id = next_index_;
      std::memcpy(out + count * kNumFeatures, frame.features,
                  sizeof(double) * kNumFeatures);
      ++count;
    }
    return count;
  }

  int64_t source_length() const { return source_->length(); }
  bool done() const { return done_.load(); }

 private:
  void run() {
    const auto period =
        std::chrono::duration<double>(1.0 / fps_);
    Frame frame;
    while (running_) {
      if (!source_->next(next_index_, &frame)) {
        done_ = true;
        cv_.notify_all();
        break;
      }
      frame.id = ++next_index_;
      frame.timestamp_us =
          std::chrono::duration_cast<std::chrono::microseconds>(
              std::chrono::steady_clock::now().time_since_epoch())
              .count();
      FrameCallback cb = nullptr;
      void* user = nullptr;
      {
        std::lock_guard<std::mutex> lock(mu_);
        latest_ = frame;
        cb = callback_;
        user = callback_user_;
      }
      cv_.notify_all();
      if (cb) cb(frame.features, kNumFeatures, user);
      std::this_thread::sleep_for(period);
    }
    running_ = false;
  }

  FrameSource* source_;
  double fps_;
  std::thread thread_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::atomic<bool> running_{false};
  std::atomic<bool> done_{false};
  Frame latest_;
  int64_t next_index_ = 0;
  FrameCallback callback_ = nullptr;
  void* callback_user_ = nullptr;
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI (ctypes binding surface)
// ---------------------------------------------------------------------------

extern "C" {

int nsg_num_features() { return kNumFeatures; }

void* nsg_replay_controller_new(const char* csv_path, double fps, int loop) {
  auto* src = new CsvReplaySource(csv_path, loop != 0);
  if (!src->ok()) {
    delete src;
    return nullptr;
  }
  return new Controller(src, fps);
}

void* nsg_synthetic_controller_new(uint64_t seed, double fps,
                                   int64_t n_frames) {
  return new Controller(new SyntheticHandSource(seed, n_frames), fps);
}

void nsg_controller_free(void* ctrl) { delete static_cast<Controller*>(ctrl); }

void nsg_controller_start(void* ctrl) { static_cast<Controller*>(ctrl)->start(); }

void nsg_controller_stop(void* ctrl) { static_cast<Controller*>(ctrl)->stop(); }

int nsg_controller_running(void* ctrl) {
  return static_cast<Controller*>(ctrl)->running() ? 1 : 0;
}

int nsg_controller_done(void* ctrl) {
  return static_cast<Controller*>(ctrl)->done() ? 1 : 0;
}

int64_t nsg_controller_length(void* ctrl) {
  return static_cast<Controller*>(ctrl)->source_length();
}

int64_t nsg_controller_poll(void* ctrl, double* out, int n) {
  return static_cast<Controller*>(ctrl)->poll(out, n);
}

int64_t nsg_controller_read(void* ctrl, int64_t after_id, double* out, int n,
                            double timeout_s) {
  return static_cast<Controller*>(ctrl)->read(after_id, out, n, timeout_s);
}

int64_t nsg_controller_drain(void* ctrl, double* out, int64_t n_frames) {
  return static_cast<Controller*>(ctrl)->drain(out, n_frames);
}

typedef void (*nsg_frame_callback)(const double*, int, void*);

void nsg_controller_set_callback(void* ctrl, nsg_frame_callback cb,
                                 void* user) {
  static_cast<Controller*>(ctrl)->set_callback(cb, user);
}

// Record n_frames from a (not-yet-started) controller straight to CSV —
// the MotionDataCollection2csv.py capability (capture joint-angle rows to
// ./results/*.csv, src/MotionDataCollection2csv.py:119-121).
int64_t nsg_record_csv(void* ctrl, const char* path, int64_t n_frames) {
  auto* c = static_cast<Controller*>(ctrl);
  std::vector<double> buf(static_cast<size_t>(n_frames) * kNumFeatures);
  int64_t got = c->drain(buf.data(), n_frames);
  std::ofstream out(path);
  if (!out) return -1;
  out.precision(17);  // lossless double -> text roundtrip
  for (int64_t i = 0; i < got; ++i) {
    for (int k = 0; k < kNumFeatures; ++k) {
      out << buf[static_cast<size_t>(i) * kNumFeatures + k];
      if (k + 1 < kNumFeatures) out << ',';
    }
    out << '\n';
  }
  return got;
}

// Extract features from a raw scene-graph dump: [dir(3), normal(3),
// bones(5*4*3)] = 66 doubles. Lets Python-side tests verify the C++
// joint-angle math against an independent implementation.
void nsg_extract_features(const double* scene, double* out) {
  Hand h;
  h.direction = Vec3(scene[0], scene[1], scene[2]);
  h.palm_normal = Vec3(scene[3], scene[4], scene[5]);
  const double* p = scene + 6;
  for (int f = 0; f < kNumFingers; ++f)
    for (int b = 0; b < kBonesPerFinger; ++b) {
      h.fingers[f].bones[b].direction = Vec3(p[0], p[1], p[2]);
      p += 3;
    }
  extract_features(h, out);
}

}  // extern "C"
