#include <cmath>
// Fast host-side point-cloud voxelizer (C++17, no deps).
//
// Native counterpart of multimodal_gar_tpu/data/voxelizer.py — the hot host
// path of the input pipeline (35k points/frame). Same semantics as the numpy
// reference implementation (first-come voxel ordering, per-voxel point cap,
// max-voxel cap, zyx coords); the Python side dispatches here via ctypes when
// the shared library is built (make -C native) and falls back to numpy
// otherwise. Replaces the role of the external spconv Point2VoxelCPU3d used
// by the reference's data processor.
//
// Build: g++ -O3 -march=native -shared -fPIC voxelizer.cpp -o libmgar_native.so

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Returns the number of voxels written (<= max_voxels).
int mgar_voxelize(const float* points, int n_points, int n_features,
                  const float* voxel_size,   // (3,) xyz
                  const float* range_min,    // (3,) xyz
                  const float* range_max,    // (3,) xyz
                  int max_points_per_voxel, int max_voxels,
                  float* out_voxels,         // (max_voxels, P, C) zeroed by caller
                  int32_t* out_coords,       // (max_voxels, 3) zyx
                  int32_t* out_num_points) { // (max_voxels,)
  int64_t grid[3];
  for (int d = 0; d < 3; ++d) {
    grid[d] = (int64_t)((range_max[d] - range_min[d]) / voxel_size[d] + 0.5);
  }
  std::unordered_map<int64_t, int32_t> voxel_of_key;
  voxel_of_key.reserve((size_t)max_voxels * 2);

  int32_t n_voxels = 0;
  for (int i = 0; i < n_points; ++i) {
    const float* p = points + (size_t)i * n_features;
    int64_t c[3];
    bool ok = true;
    for (int d = 0; d < 3; ++d) {
      c[d] = (int64_t)std::floor((p[d] - range_min[d]) / voxel_size[d]);
      if (c[d] < 0 || c[d] >= grid[d]) { ok = false; break; }
    }
    if (!ok) continue;
    int64_t key = (c[2] * grid[1] + c[1]) * grid[0] + c[0];
    auto it = voxel_of_key.find(key);
    int32_t v;
    if (it == voxel_of_key.end()) {
      if (n_voxels >= max_voxels) continue;  // drop points of overflow voxels
      v = n_voxels++;
      voxel_of_key.emplace(key, v);
      out_coords[(size_t)v * 3 + 0] = (int32_t)c[2];  // z
      out_coords[(size_t)v * 3 + 1] = (int32_t)c[1];  // y
      out_coords[(size_t)v * 3 + 2] = (int32_t)c[0];  // x
      out_num_points[v] = 0;
    } else {
      v = it->second;
    }
    int32_t k = out_num_points[v];
    if (k < max_points_per_voxel) {
      std::memcpy(out_voxels +
                      ((size_t)v * max_points_per_voxel + k) * n_features,
                  p, sizeof(float) * n_features);
      out_num_points[v] = k + 1;
    }
  }
  return n_voxels;
}

// Fused base-frame transform: rotate about z by yaw, translate, in place.
void mgar_transform_points(float* points, int n_points, int n_features,
                           float yaw, const float* translation) {
  const float c = std::cos(yaw), s = std::sin(yaw);
  for (int i = 0; i < n_points; ++i) {
    float* p = points + (size_t)i * n_features;
    const float x = p[0], y = p[1];
    p[0] = c * x - s * y + translation[0];
    p[1] = s * x + c * y + translation[1];
    p[2] += translation[2];
  }
}

}  // extern "C"
