// pmf_tpu native data-loader core.
//
// Hot host-side path of the training pipeline: read KITTI-format
// .bin point clouds + .label files, decode (semantic = low 16 bits),
// map raw labels through a LUT, and pad into fixed-size buckets —
// for a whole batch in parallel (one thread per sample, file IO and
// memcpy release the GIL on the Python side via ctypes).
//
// The reference framework has no native code (its DataLoader workers do
// this in per-process numpy); this library removes the Python overhead
// and fork cost from the host loop that feeds the TPU.
//
// C ABI only — consumed with ctypes (no pybind11 in the image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Read one scan into padded buffers. Returns number of points read
// (clamped to n_max), or -1 on error.
int64_t read_one(const char* pcd_path, const char* label_path,
                 const int32_t* label_lut, int64_t lut_size,
                 int64_t n_max, int64_t point_dim,
                 float* points_out,      // [n_max, point_dim] zeroed
                 int32_t* labels_out,    // [n_max] zeroed
                 uint8_t* valid_out) {   // [n_max] zeroed
  std::memset(points_out, 0, sizeof(float) * n_max * point_dim);
  std::memset(labels_out, 0, sizeof(int32_t) * n_max);
  std::memset(valid_out, 0, n_max);

  FILE* f = std::fopen(pcd_path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  int64_t n = bytes / (sizeof(float) * point_dim);
  if (n > n_max) n = n_max;
  const size_t got =
      std::fread(points_out, sizeof(float) * point_dim, n, f);
  std::fclose(f);
  if (static_cast<int64_t>(got) != n) return -1;

  if (label_path && label_path[0]) {
    FILE* lf = std::fopen(label_path, "rb");
    if (!lf) return -1;
    std::vector<int32_t> raw(n);
    const size_t lgot = std::fread(raw.data(), sizeof(int32_t), n, lf);
    std::fclose(lf);
    if (static_cast<int64_t>(lgot) != n) return -1;
    for (int64_t i = 0; i < n; ++i) {
      const int32_t sem = raw[i] & 0xFFFF;  // parser.py:170-174
      labels_out[i] = (sem >= 0 && sem < lut_size) ? label_lut[sem] : 0;
    }
  }
  std::memset(valid_out, 1, n);
  return n;
}

}  // namespace

extern "C" {

// Parallel batch read. paths are arrays of B C-strings; outputs are
// contiguous [B, ...] buffers. Returns 0 on success, else the number of
// failed samples. counts_out[b] = points read for sample b (-1 error).
int read_scan_batch(const char** pcd_paths, const char** label_paths,
                    int64_t batch, const int32_t* label_lut,
                    int64_t lut_size, int64_t n_max, int64_t point_dim,
                    float* points_out, int32_t* labels_out,
                    uint8_t* valid_out, int64_t* counts_out) {
  std::atomic<int> failures{0};
  std::vector<std::thread> threads;
  threads.reserve(batch);
  for (int64_t b = 0; b < batch; ++b) {
    threads.emplace_back([&, b] {
      const int64_t n = read_one(
          pcd_paths[b], label_paths ? label_paths[b] : nullptr, label_lut,
          lut_size, n_max, point_dim, points_out + b * n_max * point_dim,
          labels_out + b * n_max, valid_out + b * n_max);
      counts_out[b] = n;
      if (n < 0) failures.fetch_add(1);
    });
  }
  for (auto& t : threads) t.join();
  return failures.load();
}

// Single-scan variant.
int64_t read_scan(const char* pcd_path, const char* label_path,
                  const int32_t* label_lut, int64_t lut_size, int64_t n_max,
                  int64_t point_dim, float* points_out, int32_t* labels_out,
                  uint8_t* valid_out) {
  return read_one(pcd_path, label_path, label_lut, lut_size, n_max,
                  point_dim, points_out, labels_out, valid_out);
}

}  // extern "C"
