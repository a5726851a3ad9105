// Native host runtime for lidar_slam_tpu: data loading + preprocessing.
//
// The reference's runtime is a C++ ROS node graph; its ingestion path is
// rosbag replay + PCL filters on the CPU (data_pretreat_*, voxel_filter.cpp).
// This library is the TPU-native equivalent of that host-side layer:
//
//  - kitti .bin scan reader (the velodyne float32 x,y,z,reflectance layout)
//  - fused NaN/range mask + voxel-grid centroid downsample into fixed-size
//    padded buffers (exactly the device-side contract of ops/pointcloud.py,
//    but run on the host so scan ingestion never burns TPU time on sorts)
//  - a multi-threaded prefetcher that keeps the next frames filtered and
//    padded while the device is busy with registration math.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

// 64-bit voxel key from 21-bit signed per-axis cells.
static inline uint64_t voxel_key(int ix, int iy, int iz) {
  const uint64_t bias = 1u << 20;
  return ((uint64_t)(uint32_t)(ix + bias) << 42) |
         ((uint64_t)(uint32_t)(iy + bias) << 21) |
         (uint64_t)(uint32_t)(iz + bias);
}

struct Accum {
  double sx = 0, sy = 0, sz = 0, sw = 0;
  uint32_t n = 0;
};

// Fused mask + voxel centroid downsample.
// in:  points [n_in, stride_floats] float32 (x, y, z, [w, ...])
// out: out_points [capacity, 3], out_weights [capacity], out_mask [capacity]
// Returns number of voxels written (<= capacity).
int64_t voxel_downsample_impl(const float* pts, int64_t n_in, int stride,
                              int weight_offset, float leaf, float min_range,
                              float max_range, float* out_pts, float* out_w,
                              uint8_t* out_mask, int64_t capacity) {
  std::unordered_map<uint64_t, Accum> grid;
  grid.reserve((size_t)(n_in / 4 + 16));
  const float inv_leaf = 1.0f / leaf;
  const float min_r2 = min_range * min_range;
  const float max_r2 = max_range * max_range;
  for (int64_t i = 0; i < n_in; ++i) {
    const float* p = pts + i * stride;
    const float x = p[0], y = p[1], z = p[2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    const float r2 = x * x + y * y + z * z;
    if (r2 < min_r2 || r2 > max_r2) continue;
    const int ix = (int)std::floor(x * inv_leaf);
    const int iy = (int)std::floor(y * inv_leaf);
    const int iz = (int)std::floor(z * inv_leaf);
    Accum& a = grid[voxel_key(ix, iy, iz)];
    a.sx += x;
    a.sy += y;
    a.sz += z;
    a.sw += (weight_offset >= 0) ? p[weight_offset] : 1.0f;
    a.n += 1;
  }
  int64_t m = 0;
  for (const auto& kv : grid) {
    if (m >= capacity) break;
    const Accum& a = kv.second;
    out_pts[m * 3 + 0] = (float)(a.sx / a.n);
    out_pts[m * 3 + 1] = (float)(a.sy / a.n);
    out_pts[m * 3 + 2] = (float)(a.sz / a.n);
    if (out_w) out_w[m] = (float)(a.sw / a.n);
    if (out_mask) out_mask[m] = 1;
    ++m;
  }
  if (out_mask) std::memset(out_mask + m, 0, (size_t)(capacity - m));
  std::memset(out_pts + m * 3, 0, sizeof(float) * 3 * (size_t)(capacity - m));
  if (out_w)
    for (int64_t i = m; i < capacity; ++i) out_w[i] = 0.0f;
  return m;
}

// ---------------- prefetcher ----------------

struct Frame {
  std::vector<float> pts;   // [capacity * 3]
  std::vector<uint8_t> mask;  // [capacity]
  int64_t n_valid = 0;
  int64_t index = -1;
  bool ok = false;
};

struct Prefetcher {
  std::vector<std::string> paths;
  float leaf, min_range, max_range;
  int64_t capacity;
  size_t next_submit = 0;
  size_t next_emit = 0;
  std::deque<Frame> ready;           // completed frames, ordered by index
  std::mutex mu;
  std::condition_variable cv_ready;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::deque<size_t> queue;  // indices to load
  std::condition_variable cv_work;

  void worker() {
    while (true) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (stop.load()) return;
        idx = queue.front();
        queue.pop_front();
      }
      Frame f;
      f.index = (int64_t)idx;
      f.pts.resize((size_t)capacity * 3);
      f.mask.resize((size_t)capacity);
      FILE* fp = std::fopen(paths[idx].c_str(), "rb");
      if (fp) {
        std::fseek(fp, 0, SEEK_END);
        long bytes = std::ftell(fp);
        std::fseek(fp, 0, SEEK_SET);
        std::vector<float> raw((size_t)bytes / 4);
        size_t got = std::fread(raw.data(), 4, raw.size(), fp);
        std::fclose(fp);
        int64_t n = (int64_t)(got / 4);
        f.n_valid = voxel_downsample_impl(raw.data(), n, 4, -1, leaf, min_range,
                                          max_range, f.pts.data(), nullptr,
                                          f.mask.data(), capacity);
        f.ok = true;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        // insert ordered by index
        auto it = ready.begin();
        while (it != ready.end() && it->index < f.index) ++it;
        ready.insert(it, std::move(f));
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int64_t lr_voxel_downsample(const float* pts, int64_t n_in, int stride,
                            int weight_offset, float leaf, float min_range,
                            float max_range, float* out_pts, float* out_w,
                            uint8_t* out_mask, int64_t capacity) {
  return voxel_downsample_impl(pts, n_in, stride, weight_offset, leaf,
                               min_range, max_range, out_pts, out_w, out_mask,
                               capacity);
}

// Read a KITTI velodyne .bin; returns point count or -1. Caller provides
// buffer for up to max_points * 4 floats.
int64_t lr_read_velodyne_bin(const char* path, float* out, int64_t max_points) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  size_t got = std::fread(out, sizeof(float) * 4, (size_t)max_points, fp);
  std::fclose(fp);
  return (int64_t)got;
}

void* lr_prefetcher_create(const char** paths, int64_t n_paths, float leaf,
                           float min_range, float max_range, int64_t capacity,
                           int n_threads, int lookahead) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n_paths);
  p->leaf = leaf;
  p->min_range = min_range;
  p->max_range = max_range;
  p->capacity = capacity;
  for (int i = 0; i < lookahead && (size_t)i < p->paths.size(); ++i)
    p->queue.push_back((size_t)i);
  p->next_submit = p->queue.size();
  for (int i = 0; i < n_threads; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  p->cv_work.notify_all();
  return p;
}

// Blocks until the next in-order frame is ready; copies into out buffers.
// Returns n_valid, or -1 when the sequence is exhausted.
int64_t lr_prefetcher_next(void* handle, float* out_pts, uint8_t* out_mask) {
  auto* p = (Prefetcher*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_emit >= p->paths.size()) return -1;
  size_t want = p->next_emit;
  p->cv_ready.wait(lk, [&] {
    for (auto& f : p->ready)
      if ((size_t)f.index == want) return true;
    return false;
  });
  for (auto it = p->ready.begin(); it != p->ready.end(); ++it) {
    if ((size_t)it->index == want) {
      std::memcpy(out_pts, it->pts.data(), sizeof(float) * 3 * (size_t)p->capacity);
      std::memcpy(out_mask, it->mask.data(), (size_t)p->capacity);
      int64_t n = it->n_valid;
      p->ready.erase(it);
      if (p->next_submit < p->paths.size()) {
        p->queue.push_back(p->next_submit++);
        p->cv_work.notify_one();
      }
      p->next_emit++;
      return n;
    }
  }
  return -1;  // unreachable
}

void lr_prefetcher_destroy(void* handle) {
  auto* p = (Prefetcher*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop.store(true);
  }
  p->cv_work.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
