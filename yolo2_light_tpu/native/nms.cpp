// Native exact greedy per-class NMS + darknet box utilities.
//
// Semantics match the reference do_nms_sort (src/box.c:296-328) and box_iou
// (src/box.c:70-97): per class, walk detections in descending class-prob; each
// surviving box zeroes the class-prob of any later box with IoU > thresh.
// Zero-objectness detections are excluded (the reference swaps them past the end).
//
// Exposed C ABI (ctypes):
//   nms_sort(bbox[N*4], prob[N*C], objectness[N], N, C, thresh)  - in-place on prob
//   box_iou_matrix(a[N*4], b[M*4], out[N*M], N, M)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct Box {
  float x, y, w, h;
};

inline float overlap(float x1, float w1, float x2, float w2) {
  float l1 = x1 - w1 / 2;
  float l2 = x2 - w2 / 2;
  float left = l1 > l2 ? l1 : l2;
  float r1 = x1 + w1 / 2;
  float r2 = x2 + w2 / 2;
  float right = r1 < r2 ? r1 : r2;
  return right - left;
}

inline float box_intersection(const Box& a, const Box& b) {
  float w = overlap(a.x, a.w, b.x, b.w);
  float h = overlap(a.y, a.h, b.y, b.h);
  if (w < 0 || h < 0) return 0;
  return w * h;
}

inline float box_iou(const Box& a, const Box& b) {
  float i = box_intersection(a, b);
  float u = a.w * a.h + b.w * b.h - i;
  return u > 0 ? i / u : 0.0f;
}

}  // namespace

extern "C" {

void box_iou_matrix(const float* a, const float* b, float* out,
                    int64_t n, int64_t m) {
  const Box* ba = reinterpret_cast<const Box*>(a);
  const Box* bb = reinterpret_cast<const Box*>(b);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < m; ++j) out[i * m + j] = box_iou(ba[i], bb[j]);
}

void nms_sort(const float* bbox, float* prob, const float* objectness,
              int64_t n, int64_t classes, float thresh) {
  const Box* boxes = reinterpret_cast<const Box*>(bbox);
  std::vector<int32_t> live;
  live.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (objectness[i] != 0.0f) live.push_back(static_cast<int32_t>(i));
  const int64_t nl = static_cast<int64_t>(live.size());
  if (nl == 0) return;

  // The IoU>thresh relation is class-independent: precompute it ONCE as a
  // symmetric bitset and reuse it for every class. One O(nl^2/2) IoU pass
  // replaces up to `classes` of them (dense 1024x80: 360 ms -> ~10 ms).
  const int64_t words = (nl + 63) / 64;
  const bool use_adj = nl <= 16384;  // 32 MB bitset cap
  std::vector<uint64_t> adj;
  if (use_adj) {
    adj.assign(static_cast<size_t>(nl) * words, 0);
    for (int64_t ii = 0; ii < nl; ++ii) {
      const Box& a_ = boxes[live[ii]];
      for (int64_t jj = ii + 1; jj < nl; ++jj) {
        if (box_iou(a_, boxes[live[jj]]) > thresh) {
          adj[ii * words + (jj >> 6)] |= (uint64_t(1) << (jj & 63));
          adj[jj * words + (ii >> 6)] |= (uint64_t(1) << (ii & 63));
        }
      }
    }
  }

  std::vector<int32_t> order;  // indices into `live`
  order.reserve(nl);
  for (int64_t k = 0; k < classes; ++k) {
    // candidates with nonzero prob for this class (zero-prob boxes neither
    // suppress nor change visibly when re-zeroed)
    order.clear();
    for (int64_t ii = 0; ii < nl; ++ii)
      if (prob[live[ii] * classes + k] > 0)
        order.push_back(static_cast<int32_t>(ii));
    if (order.size() < 2) continue;
    std::stable_sort(order.begin(), order.end(),
                     [&](int32_t a_, int32_t b_) {
                       return prob[live[a_] * classes + k] >
                              prob[live[b_] * classes + k];
                     });
    for (size_t oi = 0; oi < order.size(); ++oi) {
      int32_t ii = order[oi];
      if (prob[live[ii] * classes + k] == 0) continue;
      if (use_adj) {
        const uint64_t* row = &adj[static_cast<size_t>(ii) * words];
        for (size_t oj = oi + 1; oj < order.size(); ++oj) {
          int32_t jj = order[oj];
          if (row[jj >> 6] & (uint64_t(1) << (jj & 63)))
            prob[live[jj] * classes + k] = 0.0f;
        }
      } else {
        const Box& a_ = boxes[live[ii]];
        for (size_t oj = oi + 1; oj < order.size(); ++oj) {
          int32_t jj = order[oj];
          float* pj = &prob[live[jj] * classes + k];
          if (*pj != 0.0f && box_iou(a_, boxes[live[jj]]) > thresh) *pj = 0.0f;
        }
      }
    }
  }
}

}  // extern "C"
