// Threaded gather + uint8→float32 cast for host-resident datasets.
//
// Role: the host side of the input pipeline for datasets too large to keep
// device-resident (the device-resident path gathers on-device instead; see
// loaders.py). Python's equivalent `x[idx].astype(np.float32)` is
// single-threaded and materialises an intermediate uint8 gather; this does
// one fused parallel pass. Exposed via ctypes (no pybind11 in the image —
// plain C ABI).
//
// The reference framework has no native components at all (SURVEY.md §2:
// pure PyTorch, full-tensor `.to(device)` datasets, num_workers=0); this is
// part of the TPU-native runtime around the XLA compute path.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// dst: [n_idx, row_elems] float32 (preallocated)
// src: [n_rows, row_elems] uint8
// idx: [n_idx] int64 row indices
// scale/shift: y = x * scale + shift (e.g. dequant-to-[0,1): 1/256, 0)
void gather_cast_u8_f32(float* dst, const uint8_t* src, const int64_t* idx,
                        int64_t n_idx, int64_t row_elems,
                        float scale, float shift, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  num_threads = std::min<int64_t>(num_threads, n_idx > 0 ? n_idx : 1);

  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const uint8_t* s = src + idx[i] * row_elems;
      float* d = dst + i * row_elems;
      for (int64_t j = 0; j < row_elems; ++j) {
        d[j] = static_cast<float>(s[j]) * scale + shift;
      }
    }
  };

  std::vector<std::thread> threads;
  int64_t chunk = (n_idx + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min(n_idx, begin + chunk);
    if (begin >= end) break;
    threads.emplace_back(worker, begin, end);
  }
  for (auto& th : threads) th.join();
}

// float32 rows variant (tabular): parallel gather without cast.
void gather_f32(float* dst, const float* src, const int64_t* idx,
                int64_t n_idx, int64_t row_elems, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  num_threads = std::min<int64_t>(num_threads, n_idx > 0 ? n_idx : 1);

  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                  sizeof(float) * row_elems);
    }
  };

  std::vector<std::thread> threads;
  int64_t chunk = (n_idx + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min(n_idx, begin + chunk);
    if (begin >= end) break;
    threads.emplace_back(worker, begin, end);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
