// gdmae_native: host-side C++ kernels for the TPU-native GD-MAE framework.
//
// Native counterpart of the reference's CPU/CUDA helpers that stay on the
// host in the TPU design:
//   * rotated 2D box overlap (reference
//     pcdet/ops/iou3d_nms/src/iou3d_cpu.cpp and the numba rotate_iou used by
//     pcdet/datasets/kitti/kitti_object_eval_python/rotate_iou.py)
//   * axis-aligned image box overlap (kitti_object_eval_python/eval.py:90)
//   * the greedy KITTI eval matching statistics
//     (kitti_object_eval_python/eval.py:161-341), evaluated for a whole
//     threshold list per call.
//
// Exposed with a plain C ABI for ctypes; no Python headers needed.
//
// Build: g++ -O3 -march=native -shared -fPIC gdmae_native.cpp -o libgdmae_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

// Sutherland–Hodgman clip of convex polygon `poly` (n verts) against the
// half-plane sign*coord[axis] <= bound.  Writes into `out`, returns count.
int clip_halfplane(const Pt* poly, int n, int axis, double sign, double bound,
                   Pt* out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& v = poly[i];
    const Pt& w = poly[(i + 1) % n];
    double fv = sign * (axis == 0 ? v.x : v.y) - bound;
    double fw = sign * (axis == 0 ? w.x : w.y) - bound;
    bool in_v = fv <= 0, in_w = fw <= 0;
    if (in_v) out[m++] = v;
    if (in_v != in_w) {
      double t = fv / (fv - fw);
      out[m++] = {v.x + t * (w.x - v.x), v.y + t * (w.y - v.y)};
    }
  }
  return m;
}

// Overlap area of two rotated rectangles [cx, cy, dx, dy, angle].
double rotated_overlap_area(const double* a, const double* b) {
  double cosb = std::cos(-b[4]), sinb = std::sin(-b[4]);
  double rx = a[0] - b[0], ry = a[1] - b[1];
  double cx = cosb * rx - sinb * ry;
  double cy = sinb * rx + cosb * ry;
  double ar = a[4] - b[4];
  double ca = std::cos(ar), sa = std::sin(ar);
  double hx = a[2] / 2, hy = a[3] / 2;
  Pt loc[4] = {{hx, hy}, {-hx, hy}, {-hx, -hy}, {hx, -hy}};
  Pt poly[10], buf[10];
  for (int i = 0; i < 4; ++i) {
    poly[i] = {ca * loc[i].x - sa * loc[i].y + cx,
               sa * loc[i].x + ca * loc[i].y + cy};
  }
  int n = 4;
  double bx = b[2] / 2, by = b[3] / 2;
  n = clip_halfplane(poly, n, 0, 1.0, bx, buf);
  n = clip_halfplane(buf, n, 0, -1.0, bx, poly);
  n = clip_halfplane(poly, n, 1, 1.0, by, buf);
  n = clip_halfplane(buf, n, 1, -1.0, by, poly);
  if (n < 3) return 0.0;
  double area = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt& p = poly[i];
    const Pt& q = poly[(i + 1) % n];
    area += p.x * q.y - q.x * p.y;
  }
  return std::abs(area) / 2.0;
}

}  // namespace

extern "C" {

// boxes: (N, 5) [cx, cy, dx, dy, angle]; qboxes: (K, 5).
// criterion: -1 IoU, 0 overlap/area_a, 1 overlap/area_b, 2 raw overlap area.
void rotate_overlap(const double* boxes, int64_t n, const double* qboxes,
                    int64_t k, int criterion, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    double area_a = boxes[i * 5 + 2] * boxes[i * 5 + 3];
    for (int64_t j = 0; j < k; ++j) {
      double inter = rotated_overlap_area(boxes + i * 5, qboxes + j * 5);
      double area_b = qboxes[j * 5 + 2] * qboxes[j * 5 + 3];
      double val;
      if (criterion == -1)
        val = inter / std::max(area_a + area_b - inter, 1e-9);
      else if (criterion == 0)
        val = inter / std::max(area_a, 1e-9);
      else if (criterion == 1)
        val = inter / std::max(area_b, 1e-9);
      else
        val = inter;
      out[i * k + j] = val;
    }
  }
}

// camera-frame 3D IoU finishing pass: rinc holds the rotated BEV overlap
// area (criterion 2); boxes/qboxes (N, 7) camera [x, y, z, l, h, w, ry]
// packed as in the eval (bbox3d columns [0..6]); matches
// eval.py d3_box_overlap_kernel (:125-151).
void d3_overlap_from_bev(const double* boxes, int64_t n, const double* qboxes,
                         int64_t k, double* rinc, int criterion) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < k; ++j) {
      double& r = rinc[i * k + j];
      if (r <= 0) {
        r = 0.0;
        continue;
      }
      double iw = std::min(boxes[i * 7 + 1], qboxes[j * 7 + 1]) -
                  std::max(boxes[i * 7 + 1] - boxes[i * 7 + 4],
                           qboxes[j * 7 + 1] - qboxes[j * 7 + 4]);
      if (iw <= 0) {
        r = 0.0;
        continue;
      }
      double area1 = boxes[i * 7 + 3] * boxes[i * 7 + 4] * boxes[i * 7 + 5];
      double area2 = qboxes[j * 7 + 3] * qboxes[j * 7 + 4] * qboxes[j * 7 + 5];
      double inc = iw * r;
      double ua;
      if (criterion == -1)
        ua = area1 + area2 - inc;
      else if (criterion == 0)
        ua = area1;
      else if (criterion == 1)
        ua = area2;
      else
        ua = inc;
      r = inc / std::max(ua, 1e-9);
    }
  }
}

// axis-aligned image bbox overlap (eval.py image_box_overlap).
void image_overlap(const double* boxes, int64_t n, const double* qboxes,
                   int64_t k, int criterion, double* out) {
  for (int64_t j = 0; j < k; ++j) {
    double qarea = (qboxes[j * 4 + 2] - qboxes[j * 4 + 0]) *
                   (qboxes[j * 4 + 3] - qboxes[j * 4 + 1]);
    for (int64_t i = 0; i < n; ++i) {
      double iw = std::min(boxes[i * 4 + 2], qboxes[j * 4 + 2]) -
                  std::max(boxes[i * 4 + 0], qboxes[j * 4 + 0]);
      double val = 0.0;
      if (iw > 0) {
        double ih = std::min(boxes[i * 4 + 3], qboxes[j * 4 + 3]) -
                    std::max(boxes[i * 4 + 1], qboxes[j * 4 + 1]);
        if (ih > 0) {
          double ua;
          double barea = (boxes[i * 4 + 2] - boxes[i * 4 + 0]) *
                         (boxes[i * 4 + 3] - boxes[i * 4 + 1]);
          if (criterion == -1)
            ua = barea + qarea - iw * ih;
          else if (criterion == 0)
            ua = barea;
          else
            ua = qarea;
          val = iw * ih / ua;
        }
      }
      out[i * k + j] = val;
    }
  }
}

// One-image greedy matching (eval.py compute_statistics_jit :161-278),
// evaluated for every threshold in `thresholds`.
// overlaps: (dt, gt) row-major. gt_datas: (gt, 5) bbox+alpha.
// dt_datas: (dt, 6) bbox+alpha+score.  pr accumulates (num_thresh, 4):
// tp, fp, fn, similarity.  When num_thresh == 0 and out_scores != nullptr,
// runs the compute_fp=False pass and writes matched scores, returning count.
int64_t compute_statistics(const double* overlaps, const double* gt_datas,
                           int64_t gt_size, const double* dt_datas,
                           int64_t dt_size, const int64_t* ignored_gt,
                           const int64_t* ignored_det, const double* dc_bboxes,
                           int64_t dc_num, int metric, double min_overlap,
                           const double* thresholds, int64_t num_thresh,
                           int compute_aos, double* pr, double* out_scores) {
  const double NO_DETECTION = -1e7;
  std::vector<char> assigned(dt_size);
  std::vector<char> ignored_threshold(dt_size);
  std::vector<double> delta(gt_size);

  if (num_thresh == 0) {
    // first pass: collect matched detection scores (compute_fp = False)
    int64_t cnt = 0;
    std::fill(assigned.begin(), assigned.end(), 0);
    for (int64_t i = 0; i < gt_size; ++i) {
      if (ignored_gt[i] == -1) continue;
      int64_t det_idx = -1;
      double valid_detection = NO_DETECTION;
      for (int64_t j = 0; j < dt_size; ++j) {
        if (ignored_det[j] == -1 || assigned[j]) continue;
        double overlap = overlaps[j * gt_size + i];
        double score = dt_datas[j * 6 + 5];
        if (overlap > min_overlap && score > valid_detection) {
          det_idx = j;
          valid_detection = score;
        }
      }
      if (valid_detection == NO_DETECTION) continue;
      if (ignored_gt[i] == 1 || ignored_det[det_idx] == 1) {
        assigned[det_idx] = 1;
      } else {
        if (out_scores != nullptr) out_scores[cnt] = dt_datas[det_idx * 6 + 5];
        ++cnt;
        assigned[det_idx] = 1;
      }
    }
    return cnt;
  }

  for (int64_t t = 0; t < num_thresh; ++t) {
    double thresh = thresholds[t];
    std::fill(assigned.begin(), assigned.end(), 0);
    for (int64_t j = 0; j < dt_size; ++j)
      ignored_threshold[j] = dt_datas[j * 6 + 5] < thresh;
    int64_t tp = 0, fp = 0, fn = 0;
    int64_t delta_idx = 0;
    for (int64_t i = 0; i < gt_size; ++i) {
      if (ignored_gt[i] == -1) continue;
      int64_t det_idx = -1;
      double valid_detection = NO_DETECTION;
      double max_overlap = 0;
      bool assigned_ignored_det = false;
      for (int64_t j = 0; j < dt_size; ++j) {
        if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
          continue;
        double overlap = overlaps[j * gt_size + i];
        if (overlap > min_overlap &&
            (overlap > max_overlap || assigned_ignored_det) &&
            ignored_det[j] == 0) {
          max_overlap = overlap;
          det_idx = j;
          valid_detection = 1;
          assigned_ignored_det = false;
        } else if (overlap > min_overlap && valid_detection == NO_DETECTION &&
                   ignored_det[j] == 1) {
          det_idx = j;
          valid_detection = 1;
          assigned_ignored_det = true;
        }
      }
      if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
        ++fn;
      } else if (valid_detection != NO_DETECTION &&
                 (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
        assigned[det_idx] = 1;
      } else if (valid_detection != NO_DETECTION) {
        ++tp;
        if (compute_aos)
          delta[delta_idx++] = gt_datas[i * 5 + 4] - dt_datas[det_idx * 6 + 4];
        assigned[det_idx] = 1;
      }
    }
    for (int64_t j = 0; j < dt_size; ++j) {
      if (!(assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j]))
        ++fp;
    }
    int64_t nstuff = 0;
    if (metric == 0 && dc_num > 0) {
      for (int64_t i = 0; i < dc_num; ++i) {
        for (int64_t j = 0; j < dt_size; ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
              ignored_threshold[j])
            continue;
          // overlap criterion 0: intersection / det area
          double iw = std::min(dt_datas[j * 6 + 2], dc_bboxes[i * 4 + 2]) -
                      std::max(dt_datas[j * 6 + 0], dc_bboxes[i * 4 + 0]);
          double ih = std::min(dt_datas[j * 6 + 3], dc_bboxes[i * 4 + 3]) -
                      std::max(dt_datas[j * 6 + 1], dc_bboxes[i * 4 + 1]);
          if (iw > 0 && ih > 0) {
            double barea = (dt_datas[j * 6 + 2] - dt_datas[j * 6 + 0]) *
                           (dt_datas[j * 6 + 3] - dt_datas[j * 6 + 1]);
            if (iw * ih / barea > min_overlap) {
              assigned[j] = 1;
              ++nstuff;
            }
          }
        }
      }
    }
    fp -= nstuff;
    double similarity = 0;
    if (compute_aos) {
      if (tp > 0 || fp > 0) {
        for (int64_t i = 0; i < delta_idx; ++i)
          similarity += (1.0 + std::cos(delta[i])) / 2.0;
      } else {
        similarity = -1;
      }
    }
    pr[t * 4 + 0] += tp;
    pr[t * 4 + 1] += fp;
    pr[t * 4 + 2] += fn;
    if (similarity != -1) pr[t * 4 + 3] += similarity;
  }
  return 0;
}

}  // extern "C"
