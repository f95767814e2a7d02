// Native host-side point-cloud ops for the data pipeline.
//
// Capability parity with the reference's C++ extensions
// (utils/extensions/cpu/{grid_subsampling,radius_neighbors} — see SURVEY.md
// §2.1), written independently and TPU-framework-shaped:
//   * grid_subsample: voxel-barycenter downsample (hash map over voxel ids)
//   * radius_neighbors: uniform cell-list search (no KD-tree dependency) —
//     returns fixed-width nearest-first neighbor tables with an explicit
//     valid count, matching the device kernels' static layout instead of the
//     reference's ragged sentinel matrix
//   * load_kitti_bin: raw velodyne .bin -> xyz
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Voxel-barycenter subsample. points: (n,3) float32. Returns number of
// voxels written to out (capped at capacity). Output order: voxel-id sorted.
int64_t grid_subsample(const float* points, int64_t n, float voxel_size,
                       float* out, int64_t capacity) {
  if (n == 0) return 0;
  float mn[3] = {points[0], points[1], points[2]};
  float mx[3] = {points[0], points[1], points[2]};
  for (int64_t i = 1; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      mn[d] = std::min(mn[d], points[3 * i + d]);
      mx[d] = std::max(mx[d], points[3 * i + d]);
    }
  }
  double origin[3];
  int64_t dims[3];
  for (int d = 0; d < 3; ++d) {
    origin[d] = std::floor(mn[d] / voxel_size) * voxel_size;
    dims[d] = (int64_t)std::floor((mx[d] - origin[d]) / voxel_size) + 1;
  }
  struct Acc {
    double x = 0, y = 0, z = 0;
    int64_t count = 0;
  };
  std::unordered_map<int64_t, Acc> cells;
  cells.reserve((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t ix = (int64_t)std::floor((points[3 * i] - origin[0]) / voxel_size);
    int64_t iy = (int64_t)std::floor((points[3 * i + 1] - origin[1]) / voxel_size);
    int64_t iz = (int64_t)std::floor((points[3 * i + 2] - origin[2]) / voxel_size);
    int64_t id = ix + dims[0] * iy + dims[0] * dims[1] * iz;
    Acc& a = cells[id];
    a.x += points[3 * i];
    a.y += points[3 * i + 1];
    a.z += points[3 * i + 2];
    a.count += 1;
  }
  std::vector<std::pair<int64_t, Acc>> sorted(cells.begin(), cells.end());
  std::sort(sorted.begin(), sorted.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  int64_t m = std::min((int64_t)sorted.size(), capacity);
  for (int64_t i = 0; i < m; ++i) {
    const Acc& a = sorted[i].second;
    out[3 * i] = (float)(a.x / a.count);
    out[3 * i + 1] = (float)(a.y / a.count);
    out[3 * i + 2] = (float)(a.z / a.count);
  }
  return m;
}

// Cell-list radius neighbors: for each of nq queries, up to `limit` support
// indices within `radius`, nearest first.  out_idx: (nq, limit) int32 (-1
// padding); out_count: (nq,) int32.
void radius_neighbors(const float* q, int64_t nq, const float* s, int64_t ns,
                      float radius, int32_t limit, int32_t* out_idx,
                      int32_t* out_count) {
  if (ns == 0) {
    std::fill(out_idx, out_idx + nq * limit, -1);
    std::fill(out_count, out_count + nq, 0);
    return;
  }
  float mn[3] = {s[0], s[1], s[2]};
  float mx[3] = {s[0], s[1], s[2]};
  for (int64_t i = 1; i < ns; ++i)
    for (int d = 0; d < 3; ++d) {
      mn[d] = std::min(mn[d], s[3 * i + d]);
      mx[d] = std::max(mx[d], s[3 * i + d]);
    }
  const double cell = radius;
  int64_t dims[3];
  for (int d = 0; d < 3; ++d)
    dims[d] = std::max<int64_t>(1, (int64_t)std::floor((mx[d] - mn[d]) / cell) + 1);

  auto cell_of = [&](const float* p, int64_t* c) {
    for (int d = 0; d < 3; ++d) {
      int64_t v = (int64_t)std::floor((p[d] - mn[d]) / cell);
      c[d] = std::min(std::max<int64_t>(v, 0), dims[d] - 1);
    }
  };
  // bucket supports by cell
  std::unordered_map<int64_t, std::vector<int32_t>> buckets;
  buckets.reserve((size_t)ns);
  for (int64_t i = 0; i < ns; ++i) {
    int64_t c[3];
    cell_of(s + 3 * i, c);
    buckets[c[0] + dims[0] * (c[1] + dims[1] * c[2])].push_back((int32_t)i);
  }

  const float r2 = radius * radius;
  std::vector<std::pair<float, int32_t>> cand;
  for (int64_t i = 0; i < nq; ++i) {
    cand.clear();
    const float* p = q + 3 * i;
    int64_t c[3];
    cell_of(p, c);
    for (int64_t dz = -1; dz <= 1; ++dz)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dx = -1; dx <= 1; ++dx) {
          int64_t cx = c[0] + dx, cy = c[1] + dy, cz = c[2] + dz;
          if (cx < 0 || cy < 0 || cz < 0 || cx >= dims[0] || cy >= dims[1] || cz >= dims[2])
            continue;
          auto it = buckets.find(cx + dims[0] * (cy + dims[1] * cz));
          if (it == buckets.end()) continue;
          for (int32_t j : it->second) {
            float ddx = p[0] - s[3 * j], ddy = p[1] - s[3 * j + 1], ddz = p[2] - s[3 * j + 2];
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2) cand.emplace_back(d2, j);
          }
        }
    int32_t take = (int32_t)std::min<size_t>(cand.size(), (size_t)limit);
    std::partial_sort(cand.begin(), cand.begin() + take, cand.end());
    for (int32_t k = 0; k < take; ++k) out_idx[i * limit + k] = cand[k].second;
    for (int32_t k = take; k < limit; ++k) out_idx[i * limit + k] = -1;
    out_count[i] = take;
  }
}

// Read a KITTI velodyne .bin (x,y,z,intensity float32) into out (n,3).
// Returns point count, or -1 on IO error. If out == nullptr, only counts.
int64_t load_kitti_bin(const char* path, float* out, int64_t capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  int64_t bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  int64_t n = bytes / (4 * sizeof(float));
  if (out != nullptr) {
    int64_t m = std::min(n, capacity);
    std::vector<float> buf(4 * (size_t)m);
    size_t got = std::fread(buf.data(), sizeof(float), 4 * (size_t)m, f);
    m = (int64_t)(got / 4);
    for (int64_t i = 0; i < m; ++i) {
      out[3 * i] = buf[4 * i];
      out[3 * i + 1] = buf[4 * i + 1];
      out[3 * i + 2] = buf[4 * i + 2];
    }
    n = m;
  }
  std::fclose(f);
  return n;
}

}  // extern "C"
