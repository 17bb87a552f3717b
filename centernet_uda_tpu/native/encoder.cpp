// Native host-side CenterNet target encoder.
//
// The reference encodes training targets object-by-object in Python inside
// DataLoader workers (datasets/coco.py:191-233): per-object CornerNet
// gaussian radius, gaussian splat with max-composition, wh/reg/ind/mask
// fills. At production input rates the Python loop (and numpy temporaries)
// dominates worker CPU; this translation unit implements the same math in
// C++ for the framework's data pipeline — the host-side analog of the
// reference's native DCNv2 extension, exposed through a plain C ABI and
// loaded with ctypes (no pybind11 dependency in the image).
//
// Semantics mirror ops/gaussian.py exactly (which mirrors
// utils/image.py:8-57): radius = CornerNet 3-case min-overlap quadratic,
// patch sigma = diameter/6, values below DBL_EPSILON * peak zeroed,
// max-composited, clipped at the map border.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// CornerNet minimum-overlap gaussian radius (utils/image.py:8-28).
double gaussian_radius(double height, double width, double min_overlap) {
    double a1 = 1.0;
    double b1 = height + width;
    double c1 = width * height * (1 - min_overlap) / (1 + min_overlap);
    double sq1 = std::sqrt(std::max(b1 * b1 - 4 * a1 * c1, 0.0));
    double r1 = (b1 + sq1) / 2.0;

    double a2 = 4.0;
    double b2 = 2.0 * (height + width);
    double c2 = (1 - min_overlap) * width * height;
    double sq2 = std::sqrt(std::max(b2 * b2 - 4 * a2 * c2, 0.0));
    double r2 = (b2 + sq2) / 2.0;

    double a3 = 4.0 * min_overlap;
    double b3 = -2.0 * min_overlap * (height + width);
    double c3 = (min_overlap - 1) * width * height;
    double sq3 = std::sqrt(std::max(b3 * b3 - 4 * a3 * c3, 0.0));
    double r3 = (b3 + sq3) / 2.0;
    return std::min(r1, std::min(r2, r3));
}

// Max-composite a truncated gaussian at integer center (cx, cy) into a
// single-class (H, W) plane stored row-major with stride `stride` floats.
static void draw_gaussian_plane(float* plane, int height, int width,
                                int stride, int cx, int cy, int radius) {
    if (radius < 0) radius = 0;
    int diameter = 2 * radius + 1;
    double sigma = diameter / 6.0;
    double denom = 2.0 * sigma * sigma;

    int left = std::min(cx, radius);
    int right = std::min(width - cx, radius + 1);
    int top = std::min(cy, radius);
    int bottom = std::min(height - cy, radius + 1);
    if (left + right <= 0 || top + bottom <= 0) return;

    const double eps_floor = DBL_EPSILON;  // patch peak is exactly 1
    for (int dy = -top; dy < bottom; ++dy) {
        float* row = plane + (size_t)(cy + dy) * stride;
        for (int dx = -left; dx < right; ++dx) {
            double g = std::exp(-((double)dx * dx + (double)dy * dy) / denom);
            if (g < eps_floor) g = 0.0;
            float& cell = row[cx + dx];
            if ((float)g > cell) cell = (float)g;
        }
    }
}

// Encode one image's axis-aligned targets.
//
// boxes:    (num_objs, 4) float32 x1,y1,x2,y2 in OUTPUT-map coordinates
// classes:  (num_objs,) int32 contiguous class ids
// areas_in: (num_objs,) float32 annotation areas (<0 => derive from box)
// outputs (caller-zeroed, shapes as in datasets/coco.py:168-174 but HWC):
//   hm (H, W, C) f32, wh (K, 2) f32, reg (K, 2) f32, ind (K,) i64,
//   reg_mask (K,) u8, gt_dets (K, 6) f32, gt_areas (K,) f32
void encode_targets(
    const float* boxes, const int32_t* classes, const float* areas_in,
    int num_objs, int out_h, int out_w, int num_classes, int max_dets,
    float min_overlap,
    float* hm, float* wh, float* reg, int64_t* ind, uint8_t* reg_mask,
    float* gt_dets, float* gt_areas) {
    if (num_objs > max_dets) num_objs = max_dets;

    for (int k = 0; k < num_objs; ++k) {
        float x1 = std::min(std::max(boxes[k * 4 + 0], 0.f), (float)(out_w - 1));
        float y1 = std::min(std::max(boxes[k * 4 + 1], 0.f), (float)(out_h - 1));
        float x2 = std::min(std::max(boxes[k * 4 + 2], 0.f), (float)(out_w - 1));
        float y2 = std::min(std::max(boxes[k * 4 + 3], 0.f), (float)(out_h - 1));
        float h = y2 - y1;
        float w = x2 - x1;
        if (h <= 0.f || w <= 0.f) continue;

        int radius = (int)gaussian_radius(std::ceil(h), std::ceil(w),
                                          min_overlap);
        if (radius < 0) radius = 0;
        float ctx = (x1 + x2) / 2.f;
        float cty = (y1 + y2) / 2.f;
        int cxi = (int)ctx;
        int cyi = (int)cty;
        int cls = classes[k];
        if (cls < 0 || cls >= num_classes) continue;

        // hm is HWC: plane for class c has stride num_classes over W
        // -> splat with a strided view by drawing into a (H, W) walk
        {
            int diameter = 2 * radius + 1;
            double sigma = diameter / 6.0;
            double denom = 2.0 * sigma * sigma;
            int left = std::min(cxi, radius);
            int right = std::min(out_w - cxi, radius + 1);
            int top = std::min(cyi, radius);
            int bottom = std::min(out_h - cyi, radius + 1);
            if (left + right > 0 && top + bottom > 0) {
                for (int dy = -top; dy < bottom; ++dy) {
                    float* row = hm + ((size_t)(cyi + dy) * out_w) * num_classes;
                    for (int dx = -left; dx < right; ++dx) {
                        double g = std::exp(
                            -((double)dx * dx + (double)dy * dy) / denom);
                        if (g < DBL_EPSILON) g = 0.0;
                        float& cell = row[(size_t)(cxi + dx) * num_classes + cls];
                        if ((float)g > cell) cell = (float)g;
                    }
                }
            }
        }

        wh[k * 2 + 0] = w;
        wh[k * 2 + 1] = h;
        ind[k] = (int64_t)cyi * out_w + cxi;
        reg[k * 2 + 0] = ctx - (float)cxi;
        reg[k * 2 + 1] = cty - (float)cyi;
        reg_mask[k] = 1;
        gt_dets[k * 6 + 0] = ctx - w / 2.f;
        gt_dets[k * 6 + 1] = cty - h / 2.f;
        gt_dets[k * 6 + 2] = ctx + w / 2.f;
        gt_dets[k * 6 + 3] = cty + h / 2.f;
        gt_dets[k * 6 + 4] = 1.f;
        gt_dets[k * 6 + 5] = (float)cls;
        gt_areas[k] = areas_in[k] >= 0.f ? areas_in[k] : w * h;
    }
}

// Standalone splat for the CHW-planar layout (used by tests and the
// rotated path, matching draw_umich_gaussian on a single plane).
void draw_gaussian(float* plane, int height, int width, int cx, int cy,
                   int radius) {
    draw_gaussian_plane(plane, height, width, width, cx, cy, radius);
}

// Normalize an HWC uint8 image into float32: (x/255 - mean) / std.
void normalize_image(const uint8_t* src, float* dst, int num_pixels,
                     const float* mean, const float* stdv) {
    float inv_std[3] = {1.f / stdv[0], 1.f / stdv[1], 1.f / stdv[2]};
    const float inv255 = 1.f / 255.f;
    for (int i = 0; i < num_pixels; ++i) {
        const uint8_t* p = src + (size_t)i * 3;
        float* q = dst + (size_t)i * 3;
        q[0] = ((float)p[0] * inv255 - mean[0]) * inv_std[0];
        q[1] = ((float)p[1] * inv255 - mean[1]) * inv_std[1];
        q[2] = ((float)p[2] * inv255 - mean[2]) * inv_std[2];
    }
}

}  // extern "C"

extern "C" {

// COCO greedy detection<->gt matching for one (image, category) cell over
// all IoU thresholds (the pycocotools evaluateImg inner loops,
// cocoeval.py) — the Python-side numpy evaluator calls this per cell so
// large validation sets do not bottleneck on interpreter loops.
//
// ious:      (D, G) row-major detection x gt IoU
// gt_ignore: (G,) 0/1 (already sorted non-ignored-first by the caller)
// gt_crowd:  (G,) 0/1
// thrs:      (T,) IoU thresholds
// outputs (caller-allocated): dtm (T, D) 0/1 matched flag,
//   dt_ignore (T, D) 0/1, gtm_scratch (G,) workspace
void coco_greedy_match(
    const double* ious, int num_dt, int num_gt,
    const uint8_t* gt_ignore, const uint8_t* gt_crowd,
    const double* thrs, int num_thrs,
    const uint8_t* dt_out_of_range,
    uint8_t* dtm, uint8_t* dt_ig, int32_t* gtm_scratch) {
    for (int ti = 0; ti < num_thrs; ++ti) {
        for (int g = 0; g < num_gt; ++g) gtm_scratch[g] = 0;
        for (int d = 0; d < num_dt; ++d) {
            double best = thrs[ti] < 1.0 - 1e-10 ? thrs[ti] : 1.0 - 1e-10;
            int match = -1;
            for (int g = 0; g < num_gt; ++g) {
                if (gtm_scratch[g] && !gt_crowd[g]) continue;
                if (match > -1 && !gt_ignore[match] && gt_ignore[g]) break;
                double iou = ious[(size_t)d * num_gt + g];
                if (iou < best) continue;
                best = iou;
                match = g;
            }
            size_t idx = (size_t)ti * num_dt + d;
            if (match == -1) {
                dtm[idx] = 0;
                dt_ig[idx] = dt_out_of_range[d];
            } else {
                dtm[idx] = 1;
                dt_ig[idx] = gt_ignore[match];
                gtm_scratch[match] = 1;
            }
        }
    }
}

}  // extern "C"
