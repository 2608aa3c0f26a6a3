// Native BVH builder for orion_tpu.
//
// The TPU-native framework keeps its *compute* path in JAX/Pallas; the
// host-side runtime around it is native, like the reference's C++ build
// pipeline (SBVH construction, /root/reference/orion/avx/sbvh.cpp:115-235).
// This builder mirrors orion_tpu/accel/bvh.py's algorithm exactly — same
// split strategies (median / middle / SAH-12-bucket), same leaf rules
// (every leaf fits one bundle), same DFS skip-pointer flattening — so the
// Python and native builders are interchangeable behind build_bvh(). For
// large scenes the native builder is ~30-100x faster than NumPy recursion.
//
// C ABI (ctypes-friendly), two-phase:
//   orion_bvh_build(...)  -> handle + output sizes
//   orion_bvh_export(...) -> fill caller-allocated arrays
//   orion_bvh_free(...)
//
// Build: make -C native  (produces orion_tpu/_orion_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kSahBuckets = 12;  // reference default (avx/sbvh.hpp:141)

enum Strategy { kMedian = 0, kMiddle = 1, kSah = 2 };

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Node {
  Vec3 lo, hi;
  int32_t left = -1;   // index into node pool
  int32_t right = -1;
  int64_t leaf_begin = -1;  // into the ids array
  int64_t leaf_count = 0;
  int axis = 0;  // split axis (internal nodes)
};

struct Builder {
  // inputs
  const float *v0, *e1, *e2;
  std::vector<Vec3> lo, hi, cen;
  std::vector<int64_t> ids;  // permuted in place; leaves reference ranges
  int strategy;
  int leaf_size;
  int leaf_width;

  // outputs
  std::vector<Node> nodes;
  int max_depth = 0;
  int64_t leaves = 0;

  float axis_of(const Vec3& v, int ax) const {
    return ax == 0 ? v.x : (ax == 1 ? v.y : v.z);
  }

  int32_t build(int64_t begin, int64_t end, int depth);
};

static double surface_area(const Vec3& lo, const Vec3& hi) {
  double dx = std::max(0.f, hi.x - lo.x);
  double dy = std::max(0.f, hi.y - lo.y);
  double dz = std::max(0.f, hi.z - lo.z);
  return 2.0 * (dx * dy + dy * dz + dz * dx);
}

int32_t Builder::build(int64_t begin, int64_t end, int depth) {
  int32_t me = static_cast<int32_t>(nodes.size());
  nodes.emplace_back();
  max_depth = std::max(max_depth, depth);

  Vec3 blo{std::numeric_limits<float>::infinity(),
           std::numeric_limits<float>::infinity(),
           std::numeric_limits<float>::infinity()};
  Vec3 bhi{-blo.x, -blo.y, -blo.z};
  for (int64_t i = begin; i < end; ++i) {
    blo = vmin(blo, lo[ids[i]]);
    bhi = vmax(bhi, hi[ids[i]]);
  }
  nodes[me].lo = blo;
  nodes[me].hi = bhi;

  int64_t n = end - begin;
  auto make_leaf = [&]() {
    nodes[me].leaf_begin = begin;
    nodes[me].leaf_count = n;
    ++leaves;
    return me;
  };
  if (n <= leaf_size) return make_leaf();

  Vec3 clo = cen[ids[begin]], chi = cen[ids[begin]];
  for (int64_t i = begin; i < end; ++i) {
    clo = vmin(clo, cen[ids[i]]);
    chi = vmax(chi, cen[ids[i]]);
  }
  float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
  int axis = 0;
  if (ext[1] > ext[axis]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;

  nodes[me].axis = axis;
  int64_t mid = begin + n / 2;
  auto median_split = [&]() {
    std::nth_element(ids.begin() + begin, ids.begin() + mid,
                     ids.begin() + end, [&](int64_t a, int64_t b) {
                       return axis_of(cen[a], axis) < axis_of(cen[b], axis);
                     });
  };

  if (ext[axis] <= 0.0f) {
    // all centroids coincide: arbitrary even split keeps leaves bundled
    // (mirrors bvh.py's degenerate-extent branch)
  } else if (strategy == kMedian) {
    median_split();
  } else if (strategy == kMiddle) {
    float pivot = 0.5f * (axis_of(clo, axis) + axis_of(chi, axis));
    auto it = std::partition(ids.begin() + begin, ids.begin() + end,
                             [&](int64_t a) {
                               return axis_of(cen[a], axis) < pivot;
                             });
    int64_t cut = it - ids.begin();
    if (cut == begin || cut == end) {
      median_split();
    } else {
      mid = cut;
    }
  } else {  // SAH
    float cmin = axis_of(clo, axis), crange = ext[axis];
    auto bucket_of = [&](int64_t a) {
      float t = (axis_of(cen[a], axis) - cmin) / crange;
      int b = static_cast<int>(t * kSahBuckets);
      return std::min(b, kSahBuckets - 1);
    };

    int64_t counts[kSahBuckets] = {0};
    Vec3 b_lo[kSahBuckets], b_hi[kSahBuckets];
    for (int b = 0; b < kSahBuckets; ++b) {
      b_lo[b] = blo;  // placeholder; re-init below
      b_hi[b] = bhi;
    }
    bool seen[kSahBuckets] = {false};
    for (int64_t i = begin; i < end; ++i) {
      int b = bucket_of(ids[i]);
      ++counts[b];
      if (!seen[b]) {
        b_lo[b] = lo[ids[i]];
        b_hi[b] = hi[ids[i]];
        seen[b] = true;
      } else {
        b_lo[b] = vmin(b_lo[b], lo[ids[i]]);
        b_hi[b] = vmax(b_hi[b], hi[ids[i]]);
      }
    }
    double best_cost = std::numeric_limits<double>::infinity();
    int best_split = -1;
    double total_sa = std::max(surface_area(blo, bhi), 1e-30);
    for (int split = 1; split < kSahBuckets; ++split) {
      int64_t nl = 0, nr = 0;
      Vec3 llo, lhi, rlo, rhi;
      bool l_any = false, r_any = false;
      for (int b = 0; b < split; ++b) {
        if (!seen[b]) continue;
        nl += counts[b];
        if (!l_any) { llo = b_lo[b]; lhi = b_hi[b]; l_any = true; }
        else { llo = vmin(llo, b_lo[b]); lhi = vmax(lhi, b_hi[b]); }
      }
      for (int b = split; b < kSahBuckets; ++b) {
        if (!seen[b]) continue;
        nr += counts[b];
        if (!r_any) { rlo = b_lo[b]; rhi = b_hi[b]; r_any = true; }
        else { rlo = vmin(rlo, b_lo[b]); rhi = vmax(rhi, b_hi[b]); }
      }
      if (nl == 0 || nr == 0) continue;
      double cost = 1.0 + (nl * surface_area(llo, lhi) +
                           nr * surface_area(rlo, rhi)) / total_sa;
      if (cost < best_cost) {
        best_cost = cost;
        best_split = split;
      }
    }
    bool fall_back = best_split < 0 || (best_cost >= double(n) &&
                                        n <= int64_t(leaf_size));
    if (fall_back) {
      if (n <= leaf_size) return make_leaf();
      median_split();
    } else {
      auto it = std::partition(ids.begin() + begin, ids.begin() + end,
                               [&](int64_t a) {
                                 return bucket_of(a) < best_split;
                               });
      int64_t cut = it - ids.begin();
      if (cut == begin || cut == end) {
        median_split();
      } else {
        mid = cut;
      }
    }
  }

  int32_t l = build(begin, mid, depth + 1);
  int32_t r = build(mid, end, depth + 1);
  nodes[me].left = l;
  nodes[me].right = r;
  return me;
}

struct Flat {
  std::vector<float> node_lo, node_hi;
  std::vector<int32_t> node_skip, node_start, node_count;
  std::vector<int64_t> order;  // bundled triangle rows; -1 = padding
  int max_depth = 0;
  int64_t leaves = 0;
};

static void flatten(const Builder& b, int32_t ni, Flat* f, int leaf_width,
                    const float* order_signs) {
  size_t i = f->node_skip.size();
  const Node& node = b.nodes[ni];
  f->node_lo.insert(f->node_lo.end(), {node.lo.x, node.lo.y, node.lo.z});
  f->node_hi.insert(f->node_hi.end(), {node.hi.x, node.hi.y, node.hi.z});
  f->node_skip.push_back(-1);
  if (node.leaf_begin >= 0) {
    int64_t n = node.leaf_count;
    int64_t pad = (leaf_width - (n % leaf_width)) % leaf_width;
    f->node_start.push_back(static_cast<int32_t>(f->order.size()));
    f->node_count.push_back(static_cast<int32_t>(n + pad));
    for (int64_t k = 0; k < n; ++k)
      f->order.push_back(b.ids[node.leaf_begin + k]);
    for (int64_t k = 0; k < pad; ++k) f->order.push_back(-1);
  } else {
    f->node_start.push_back(-1);
    f->node_count.push_back(0);
    // near-first child order for the dominant ray-direction octant
    if (order_signs[node.axis] >= 0.0f) {
      flatten(b, node.left, f, leaf_width, order_signs);
      flatten(b, node.right, f, leaf_width, order_signs);
    } else {
      flatten(b, node.right, f, leaf_width, order_signs);
      flatten(b, node.left, f, leaf_width, order_signs);
    }
  }
  f->node_skip[i] = static_cast<int32_t>(f->node_skip.size());
}

struct Handle {
  Flat flat;
};

}  // namespace

extern "C" {

// Returns an opaque handle (nullptr on error). Outputs sizes for export.
void* orion_bvh_build(const float* v0, const float* e1, const float* e2,
                      const uint8_t* valid, int64_t T, int strategy,
                      int leaf_size, int leaf_width,
                      const float* order_signs,
                      int64_t* out_num_nodes, int64_t* out_num_bundled,
                      int32_t* out_max_depth, int64_t* out_leaves) {
  if (leaf_size > leaf_width || T <= 0) return nullptr;
  Builder b;
  b.v0 = v0;
  b.e1 = e1;
  b.e2 = e2;
  b.strategy = strategy;
  b.leaf_size = leaf_size;
  b.leaf_width = leaf_width;

  b.lo.resize(T);
  b.hi.resize(T);
  b.cen.resize(T);
  b.ids.reserve(T);
  for (int64_t i = 0; i < T; ++i) {
    if (valid && !valid[i]) continue;
    Vec3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
    Vec3 p1{a.x + e1[3 * i], a.y + e1[3 * i + 1], a.z + e1[3 * i + 2]};
    Vec3 p2{a.x + e2[3 * i], a.y + e2[3 * i + 1], a.z + e2[3 * i + 2]};
    b.lo[i] = vmin(vmin(a, p1), p2);
    b.hi[i] = vmax(vmax(a, p1), p2);
    b.cen[i] = {0.5f * (b.lo[i].x + b.hi[i].x),
                0.5f * (b.lo[i].y + b.hi[i].y),
                0.5f * (b.lo[i].z + b.hi[i].z)};
    b.ids.push_back(i);
  }
  if (b.ids.empty()) return nullptr;

  int32_t root = b.build(0, static_cast<int64_t>(b.ids.size()), 0);

  auto* h = new Handle();
  h->flat.max_depth = b.max_depth;
  h->flat.leaves = b.leaves;
  flatten(b, root, &h->flat, leaf_width, order_signs);

  *out_num_nodes = static_cast<int64_t>(h->flat.node_skip.size());
  *out_num_bundled = static_cast<int64_t>(h->flat.order.size());
  *out_max_depth = h->flat.max_depth;
  *out_leaves = h->flat.leaves;
  return h;
}

void orion_bvh_export(void* handle, float* node_lo, float* node_hi,
                      int32_t* node_skip, int32_t* node_start,
                      int32_t* node_count, int64_t* order) {
  auto* h = static_cast<Handle*>(handle);
  const Flat& f = h->flat;
  std::memcpy(node_lo, f.node_lo.data(), f.node_lo.size() * sizeof(float));
  std::memcpy(node_hi, f.node_hi.data(), f.node_hi.size() * sizeof(float));
  std::memcpy(node_skip, f.node_skip.data(),
              f.node_skip.size() * sizeof(int32_t));
  std::memcpy(node_start, f.node_start.data(),
              f.node_start.size() * sizeof(int32_t));
  std::memcpy(node_count, f.node_count.data(),
              f.node_count.size() * sizeof(int32_t));
  std::memcpy(order, f.order.data(), f.order.size() * sizeof(int64_t));
}

void orion_bvh_free(void* handle) { delete static_cast<Handle*>(handle); }

}  // extern "C"
