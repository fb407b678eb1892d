// COCO bbox evaluation inner loop, C++.
//
// The reference's metrics come from pycocotools' C extension
// (dino_detector/utils.py:243-276). That library is not available in this
// environment, so the framework ships its own evaluator: the protocol
// logic lives in Python (evaluation/coco_metrics.py) and this translation
// unit provides the O(n_thr * n_dt * n_gt) greedy matching + IoU kernel,
// loaded via ctypes (see evaluation/native.py). The numpy implementation
// remains as reference/fallback; both paths are cross-checked in
// tests/test_native_eval.py.
//
// Build: make -C native     (produces libcocoeval.so)

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

// IoU of xywh boxes; crowd GT uses the detection area as the union
// (pycocotools maskUtils.iou semantics).
inline double iou_xywh(const double* d, const double* g, bool crowd) {
  const double dx1 = d[0], dy1 = d[1], dx2 = d[0] + d[2], dy2 = d[1] + d[3];
  const double gx1 = g[0], gy1 = g[1], gx2 = g[0] + g[2], gy2 = g[1] + g[3];
  const double iw = std::max(0.0, std::min(dx2, gx2) - std::max(dx1, gx1));
  const double ih = std::max(0.0, std::min(dy2, gy2) - std::max(dy1, gy1));
  const double inter = iw * ih;
  const double d_area = d[2] * d[3];
  const double g_area = g[2] * g[3];
  const double uni = crowd ? d_area : d_area + g_area - inter;
  if (uni <= 0.0) return 0.0;
  return inter / uni;
}

}  // namespace

extern "C" {

// Greedy per-detection matching for one (image, category) cell.
//
// Inputs (detections MUST already be sorted by descending score and
// truncated to max_det; GT MUST already be sorted non-ignored-first —
// the Python wrapper does both):
//   dt_boxes   [n_dt, 4] xywh
//   gt_boxes   [n_gt, 4] xywh
//   gt_ignore  [n_gt]    0/1
//   gt_crowd   [n_gt]    0/1
//   iou_thrs   [n_thr]
//   area_lo, area_hi     detection area range for the unmatched-ignore rule
// Outputs (caller-allocated):
//   dtm        [n_thr, n_dt]  matched gt index + 1 (0 = unmatched)
//   dt_ignore  [n_thr, n_dt]  0/1
void cocoeval_match_cell(const double* dt_boxes, int64_t n_dt,
                         const double* gt_boxes, const int32_t* gt_ignore,
                         const int32_t* gt_crowd, int64_t n_gt,
                         const double* iou_thrs, int64_t n_thr,
                         double area_lo, double area_hi,
                         int64_t* dtm, uint8_t* dt_ignore_out) {
  // Precompute the IoU table once per cell.
  std::vector<double> ious(static_cast<size_t>(n_dt * n_gt));
  for (int64_t di = 0; di < n_dt; ++di) {
    for (int64_t gi = 0; gi < n_gt; ++gi) {
      ious[di * n_gt + gi] =
          iou_xywh(dt_boxes + 4 * di, gt_boxes + 4 * gi, gt_crowd[gi] != 0);
    }
  }

  std::vector<int64_t> gtm(static_cast<size_t>(n_gt));
  for (int64_t ti = 0; ti < n_thr; ++ti) {
    std::fill(gtm.begin(), gtm.end(), 0);
    int64_t* dtm_t = dtm + ti * n_dt;
    uint8_t* dtig_t = dt_ignore_out + ti * n_dt;
    for (int64_t di = 0; di < n_dt; ++di) {
      double best = std::min(iou_thrs[ti], 1.0 - 1e-10);
      int64_t m = -1;
      for (int64_t gi = 0; gi < n_gt; ++gi) {
        if (gtm[gi] > 0 && !gt_crowd[gi]) continue;
        // Once holding a non-ignored match, ignored GT (sorted last)
        // cannot improve it.
        if (m > -1 && gt_ignore[m] == 0 && gt_ignore[gi] == 1) break;
        const double iou = ious[di * n_gt + gi];
        if (iou < best) continue;
        best = iou;
        m = gi;
      }
      if (m == -1) {
        dtm_t[di] = 0;
        dtig_t[di] = 0;
        continue;
      }
      dtig_t[di] = static_cast<uint8_t>(gt_ignore[m]);
      dtm_t[di] = m + 1;
      gtm[m] = di + 1;
    }
    // Unmatched detections outside the area range are ignored.
    for (int64_t di = 0; di < n_dt; ++di) {
      if (dtm_t[di] == 0) {
        const double area = dt_boxes[4 * di + 2] * dt_boxes[4 * di + 3];
        if (area < area_lo || area > area_hi) dtig_t[di] = 1;
      }
    }
  }
}

}  // extern "C"
