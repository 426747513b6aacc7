#include <algorithm>
// Host-side sparse-conv rulebook builder (C++17, no deps).
//
// Native fast path for multimodal_gar_tpu/data/rulebook.py: builds the
// submanifold neighbor maps, strided downsample active sets and gather maps
// for the 4-stage VoxelBackbone8x from one sample's voxel coords. The numpy
// fallback does the same with vectorized searchsorted; this version uses one
// hash map per stage and runs in ~1 ms at 16k voxels, keeping the single-core
// data pipeline ahead of the TPU.
//
// Build: part of libmgar_native.so (see Makefile).

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kKernel = 3;
constexpr int kTaps = 27;

struct Stage {
  int64_t shape[3];
};

inline int64_t key_of(const int32_t* c, const int64_t* shape) {
  return ((int64_t)c[0] * shape[1] + c[1]) * shape[2] + c[2];
}

inline bool in_range(const int64_t* c, const int64_t* shape) {
  return c[0] >= 0 && c[0] < shape[0] && c[1] >= 0 && c[1] < shape[1] &&
         c[2] >= 0 && c[2] < shape[2];
}

void subm_neighbors(const int32_t* coords, int n_valid, const int64_t* shape,
                    const std::unordered_map<int64_t, int32_t>& index,
                    int32_t* nbr /* (cap, 27) pre-filled -1 */) {
  for (int i = 0; i < n_valid; ++i) {
    const int32_t* c = coords + 3 * i;
    int tap = 0;
    for (int dz = -1; dz <= 1; ++dz)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx, ++tap) {
          int64_t n[3] = {c[0] + dz, c[1] + dy, c[2] + dx};
          if (!in_range(n, shape)) continue;
          int64_t k = (n[0] * shape[1] + n[1]) * shape[2] + n[2];
          auto it = index.find(k);
          if (it != index.end()) nbr[(size_t)i * kTaps + tap] = it->second;
        }
  }
}

}  // namespace

extern "C" {

// Builds the full 4-stage rulebook. All output buffers are caller-allocated:
//   nbr[k]    (caps[k], 27) int32, pre-zeroed or not (fully overwritten)
//   coords[k] (caps[k], 3)  int32 (k >= 1)
//   down[k]   (caps[k], 27) int32 (k >= 1)
//   counts    (4,) int32 — active voxels per stage (counts[0] echoed back)
// Stage schedule fixed to VoxelBackBone8x: strides (1,2,2,2), paddings
// ((1,1,1),(1,1,1),(1,1,1),(0,1,1)).
void mgar_build_rulebook(const int32_t* coords0, int n_valid0,
                         int64_t z, int64_t y, int64_t x,
                         const int32_t* caps /* (4,) */,
                         int32_t* nbr0, int32_t* coords1, int32_t* down1,
                         int32_t* nbr1, int32_t* coords2, int32_t* down2,
                         int32_t* nbr2, int32_t* coords3, int32_t* down3,
                         int32_t* nbr3, int32_t* counts) {
  const int strides[4] = {1, 2, 2, 2};
  const int pads[4][3] = {{1, 1, 1}, {1, 1, 1}, {1, 1, 1}, {0, 1, 1}};
  int32_t* nbrs[4] = {nbr0, nbr1, nbr2, nbr3};
  int32_t* outc[4] = {nullptr, coords1, coords2, coords3};
  int32_t* downs[4] = {nullptr, down1, down2, down3};

  std::vector<int32_t> cur(coords0, coords0 + (size_t)3 * n_valid0);
  int n_cur = std::min(n_valid0, caps[0]);
  int64_t shape[3] = {z, y, x};

  for (int k = 0; k < 4; ++k) {
    const int cap = caps[k];
    if (k > 0) {
      // ---- downsample: derive output active set ----
      int64_t out_shape[3];
      for (int d = 0; d < 3; ++d)
        out_shape[d] =
            (shape[d] + 2 * pads[k][d] - kKernel) / strides[k] + 1;

      // candidate output keys from every (input, tap) pair
      std::vector<int64_t> cand;
      cand.reserve((size_t)n_cur * kTaps);
      for (int i = 0; i < n_cur; ++i) {
        const int32_t* c = cur.data() + 3 * i;
        for (int tz = 0; tz < kKernel; ++tz)
          for (int ty = 0; ty < kKernel; ++ty)
            for (int tx = 0; tx < kKernel; ++tx) {
              int64_t num[3] = {c[0] + pads[k][0] - tz, c[1] + pads[k][1] - ty,
                               c[2] + pads[k][2] - tx};
              bool ok = true;
              int64_t o[3];
              for (int d = 0; d < 3; ++d) {
                if (num[d] % strides[k] != 0) { ok = false; break; }
                o[d] = num[d] / strides[k];
                if (o[d] < 0 || o[d] >= out_shape[d]) { ok = false; break; }
              }
              if (ok)
                cand.push_back((o[0] * out_shape[1] + o[1]) * out_shape[2] +
                               o[2]);
            }
      }
      std::sort(cand.begin(), cand.end());
      cand.erase(std::unique(cand.begin(), cand.end()), cand.end());
      int n_out = std::min((int)cand.size(), cap);

      // fill output coords (+ -1 padding)
      for (int i = 0; i < cap; ++i) {
        int32_t* oc = outc[k] + 3 * i;
        if (i < n_out) {
          int64_t kk = cand[i];
          oc[0] = (int32_t)(kk / (out_shape[1] * out_shape[2]));
          oc[1] = (int32_t)((kk / out_shape[2]) % out_shape[1]);
          oc[2] = (int32_t)(kk % out_shape[2]);
        } else {
          oc[0] = oc[1] = oc[2] = -1;
        }
      }

      // gather map: input row feeding each (output, tap)
      std::unordered_map<int64_t, int32_t> in_index;
      in_index.reserve((size_t)n_cur * 2);
      for (int i = 0; i < n_cur; ++i)
        in_index.emplace(key_of(cur.data() + 3 * i, shape), i);
      std::fill(downs[k], downs[k] + (size_t)cap * kTaps, -1);
      for (int i = 0; i < n_out; ++i) {
        const int32_t* oc = outc[k] + 3 * i;
        int tap = 0;
        for (int tz = 0; tz < kKernel; ++tz)
          for (int ty = 0; ty < kKernel; ++ty)
            for (int tx = 0; tx < kKernel; ++tx, ++tap) {
              int64_t src[3] = {
                  (int64_t)oc[0] * strides[k] - pads[k][0] + tz,
                  (int64_t)oc[1] * strides[k] - pads[k][1] + ty,
                  (int64_t)oc[2] * strides[k] - pads[k][2] + tx};
              if (!in_range(src, shape)) continue;
              auto it = in_index.find(
                  (src[0] * shape[1] + src[1]) * shape[2] + src[2]);
              if (it != in_index.end())
                downs[k][(size_t)i * kTaps + tap] = it->second;
            }
      }

      cur.assign(outc[k], outc[k] + (size_t)3 * n_out);
      n_cur = n_out;
      for (int d = 0; d < 3; ++d) shape[d] = out_shape[d];
    }
    counts[k] = n_cur;

    // ---- submanifold neighbor map for this stage ----
    std::unordered_map<int64_t, int32_t> index;
    index.reserve((size_t)n_cur * 2);
    for (int i = 0; i < n_cur; ++i)
      index.emplace(key_of(cur.data() + 3 * i, shape), i);
    std::fill(nbrs[k], nbrs[k] + (size_t)cap * kTaps, -1);
    subm_neighbors(cur.data(), n_cur, shape, index, nbrs[k]);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// x-window maps (see multimodal_gar_tpu/data/rulebook.py docstring): for
// each query and (dz, dy) tap pair, one packed int32 carries the window
// position j = lower_bound(sorted keys, center-tap key) in its low 20 bits
// and, in bits 20..25, the window slot (0..2 of rows j-1, j, j+1; 3 =
// absent) holding each dx in {-1, 0, +1} tap.

namespace {

constexpr int kPosBits = 20;

void window_map(const int32_t* qc, int nq, int cap, const int64_t* in_shape,
                const std::vector<int64_t>& skeys, int stride,
                const int* pad, bool centered, int32_t* out) {
  const int32_t none = (int32_t)((3 | (3 << 2) | (3 << 4)) << kPosBits);
  std::fill(out, out + (size_t)cap * 9, none);
  const int n_in = (int)skeys.size();
  if (n_in == 0) return;
  for (int i = 0; i < nq; ++i) {
    const int32_t* c = qc + 3 * i;
    int p = 0;
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b, ++p) {
        int64_t zs, ys, xs;
        if (centered) {
          zs = c[0] + a - 1; ys = c[1] + b - 1; xs = c[2];
        } else {
          zs = (int64_t)c[0] * stride - pad[0] + a;
          ys = (int64_t)c[1] * stride - pad[1] + b;
          xs = (int64_t)c[2] * stride - pad[2] + 1;
        }
        if (zs < 0 || zs >= in_shape[0] || ys < 0 || ys >= in_shape[1])
          continue;                                   // keeps sel = none
        const int64_t ck = (zs * in_shape[1] + ys) * in_shape[2] + xs;
        int j = (int)(std::lower_bound(skeys.begin(), skeys.end(), ck) -
                      skeys.begin());
        const int pos = std::min(std::max(j, 0), n_in - 1);
        int sel = 0;
        for (int dxi = 0; dxi < 3; ++dxi) {
          const int64_t xt = xs + dxi - 1;
          int slot = 3;
          if (xt >= 0 && xt < in_shape[2]) {
            const int64_t t = ck + dxi - 1;
            for (int w = 0; w < 3; ++w) {
              const int row = pos - 1 + w;
              if (row >= 0 && row < n_in && skeys[row] == t) {
                slot = w;
                break;
              }
            }
          }
          sel |= slot << (2 * dxi);
        }
        out[(size_t)i * 9 + p] = pos | (sel << kPosBits);
      }
  }
}

}  // namespace

extern "C" {

// Appends the x-window maps given the already-built stage active sets.
//   coords0 (caps[0], 3) UNSORTED stage-0 coords (first n0 valid);
//   coords{1..3} the (key-sorted) downsampled sets from mgar_build_rulebook.
// Outputs: order0 (caps[0],) int32; win{0..3} (caps[k], 9); dwin{1..3}.
void mgar_build_xwindow(const int32_t* coords0, int n0,
                        int64_t z, int64_t y, int64_t x,
                        const int32_t* caps,
                        const int32_t* coords1, int n1,
                        const int32_t* coords2, int n2,
                        const int32_t* coords3, int n3,
                        int32_t* order0, int32_t* win0, int32_t* win1,
                        int32_t* win2, int32_t* win3, int32_t* dwin1,
                        int32_t* dwin2, int32_t* dwin3) {
  const int strides[4] = {1, 2, 2, 2};
  const int pads[4][3] = {{1, 1, 1}, {1, 1, 1}, {1, 1, 1}, {0, 1, 1}};
  int64_t shape[3] = {z, y, x};
  n0 = std::min(n0, caps[0]);

  // stage-0: stable key sort -> order0 + sorted coords/keys
  std::vector<std::pair<int64_t, int32_t>> keyed((size_t)caps[0]);
  for (int i = 0; i < caps[0]; ++i) {
    int64_t k = INT64_MAX;
    const int32_t* c = coords0 + 3 * i;
    if (i < n0 && c[0] >= 0 && c[0] < z && c[1] >= 0 && c[1] < y &&
        c[2] >= 0 && c[2] < x)
      k = ((int64_t)c[0] * y + c[1]) * x + c[2];
    keyed[i] = {k, (int32_t)i};
  }
  std::stable_sort(keyed.begin(), keyed.end());
  std::vector<int32_t> sc0((size_t)3 * caps[0]);
  std::vector<int64_t> skeys0;
  skeys0.reserve(n0);
  for (int i = 0; i < caps[0]; ++i) {
    order0[i] = keyed[i].second;
    const int32_t* c = coords0 + 3 * keyed[i].second;
    sc0[3 * i] = c[0]; sc0[3 * i + 1] = c[1]; sc0[3 * i + 2] = c[2];
    if (keyed[i].first != INT64_MAX) skeys0.push_back(keyed[i].first);
  }

  const int32_t* cs[4] = {sc0.data(), coords1, coords2, coords3};
  const int ns[4] = {(int)skeys0.size(), n1, n2, n3};
  int32_t* wins[4] = {win0, win1, win2, win3};
  int32_t* dwins[4] = {nullptr, dwin1, dwin2, dwin3};

  std::vector<int64_t> skeys = skeys0;
  for (int k = 0; k < 4; ++k) {
    if (k > 0) {
      int64_t out_shape[3];
      for (int d = 0; d < 3; ++d)
        out_shape[d] = (shape[d] + 2 * pads[k][d] - kKernel) / strides[k] + 1;
      // dwin: stage-k (sorted) outputs against stage k-1 sorted keys
      window_map(cs[k], ns[k], caps[k], shape, skeys, strides[k], pads[k],
                 /*centered=*/false, dwins[k]);
      for (int d = 0; d < 3; ++d) shape[d] = out_shape[d];
      skeys.clear();
      skeys.reserve(ns[k]);
      for (int i = 0; i < ns[k]; ++i) {
        const int32_t* c = cs[k] + 3 * i;
        skeys.push_back(((int64_t)c[0] * shape[1] + c[1]) * shape[2] + c[2]);
      }
    }
    window_map(cs[k], ns[k], caps[k], shape, skeys, 1, pads[k],
               /*centered=*/true, wins[k]);
  }
}

}  // extern "C"
