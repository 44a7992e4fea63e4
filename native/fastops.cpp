// fastops — native host-side data-pipeline kernels for desenet_tpu.
//
// The reference's data path leans on PyTorch's C++ DataLoader workers and
// PIL/cv2 native code. Here the Python loader threads call these C routines
// through ctypes; they release the GIL (pure C ABI) and parallelize with
// OpenMP, covering the two host hot spots at 2000+ img/s:
//
//   assemble_batch      pack N HWC uint8 samples into one contiguous batch
//                       (the np.stack memcpy wall in collate)
//   rasterize_polygons  scanline polygon -> class-id mask fill (the per-
//                       sample PIL ImageDraw.polygon cost,
//                       reference general.py:490-510)
//
// Build: make -C native   (produces libfastops.so; loaded by
// desenet_tpu/native.py with a pure-Python fallback when absent).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// dst: (n, h*w*c) contiguous; srcs: array of n pointers to h*w*c blocks.
void assemble_batch(uint8_t* dst, const uint8_t** srcs, int64_t n,
                    int64_t bytes_per_sample) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(dst + i * bytes_per_sample, srcs[i], bytes_per_sample);
  }
}

// Scanline even-odd fill of one polygon into an int32 mask, writing
// `cls_id` (later polygons overwrite earlier ones, like the reference's
// sequential PIL fills). Outline pixels are included (PIL polygon
// outline=1/fill=1 semantics approximated by half-open scanline fill plus
// vertex-edge rounding; see tests for the agreement bound).
static void fill_polygon(int32_t* mask, int64_t h, int64_t w,
                         const float* pts, int64_t npts, int32_t cls_id) {
  if (npts < 3) return;
  float ymin = pts[1], ymax = pts[1];
  for (int64_t i = 1; i < npts; ++i) {
    ymin = std::min(ymin, pts[2 * i + 1]);
    ymax = std::max(ymax, pts[2 * i + 1]);
  }
  int64_t y0 = std::max<int64_t>(0, (int64_t)std::floor(ymin));
  int64_t y1 = std::min<int64_t>(h - 1, (int64_t)std::ceil(ymax));

  std::vector<float> xs;
  for (int64_t y = y0; y <= y1; ++y) {
    const float fy = (float)y;
    xs.clear();
    for (int64_t i = 0; i < npts; ++i) {
      const int64_t j = (i + 1) % npts;
      float x1 = pts[2 * i], ya = pts[2 * i + 1];
      float x2 = pts[2 * j], yb = pts[2 * j + 1];
      if (ya == yb) continue;
      if ((fy >= std::min(ya, yb)) && (fy < std::max(ya, yb))) {
        xs.push_back(x1 + (fy - ya) / (yb - ya) * (x2 - x1));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int64_t xa = std::max<int64_t>(0, (int64_t)std::ceil(xs[k] - 0.5f));
      int64_t xb = std::min<int64_t>(w - 1, (int64_t)std::floor(xs[k + 1] + 0.5f));
      for (int64_t x = xa; x <= xb; ++x) mask[y * w + x] = cls_id;
    }
  }

  // outline (Bresenham over edges) — PIL draws it explicitly
  for (int64_t i = 0; i < npts; ++i) {
    const int64_t j = (i + 1) % npts;
    int64_t xa = (int64_t)std::lround(pts[2 * i]);
    int64_t ya = (int64_t)std::lround(pts[2 * i + 1]);
    int64_t xb = (int64_t)std::lround(pts[2 * j]);
    int64_t yb = (int64_t)std::lround(pts[2 * j + 1]);
    int64_t dx = std::abs(xb - xa), dy = -std::abs(yb - ya);
    int64_t sx = xa < xb ? 1 : -1, sy = ya < yb ? 1 : -1, err = dx + dy;
    while (true) {
      if (xa >= 0 && xa < w && ya >= 0 && ya < h) mask[ya * w + xa] = cls_id;
      if (xa == xb && ya == yb) break;
      int64_t e2 = 2 * err;
      if (e2 >= dy) { err += dy; xa += sx; }
      if (e2 <= dx) { err += dx; ya += sy; }
    }
  }
}

// polys: concatenated (x, y) float32 pairs; counts[i] = #points of poly i;
// cls_ids[i] = class id. Mask must be zero-initialized by the caller.
void rasterize_polygons(int32_t* mask, int64_t h, int64_t w,
                        const float* polys, const int64_t* counts,
                        const int32_t* cls_ids, int64_t n_polys) {
  int64_t off = 0;
  for (int64_t p = 0; p < n_polys; ++p) {
    fill_polygon(mask, h, w, polys + 2 * off, counts[p], cls_ids[p]);
    off += counts[p];
  }
}

// Batched variant: one mask per (h, w) plane, polygons grouped per image.
void rasterize_batch(int32_t* masks, int64_t b, int64_t h, int64_t w,
                     const float* polys, const int64_t* counts,
                     const int32_t* cls_ids, const int64_t* polys_per_img) {
  std::vector<int64_t> poly_start(b + 1, 0), pt_start(b + 1, 0);
  for (int64_t i = 0; i < b; ++i) {
    poly_start[i + 1] = poly_start[i] + polys_per_img[i];
  }
  for (int64_t i = 0; i < b; ++i) {
    int64_t pts = 0;
    for (int64_t p = poly_start[i]; p < poly_start[i + 1]; ++p) {
      pts += counts[p];
    }
    pt_start[i + 1] = pt_start[i] + pts;
  }
#pragma omp parallel for schedule(dynamic)
  for (int64_t i = 0; i < b; ++i) {
    int64_t off = pt_start[i];
    for (int64_t p = poly_start[i]; p < poly_start[i + 1]; ++p) {
      fill_polygon(masks + i * h * w, h, w, polys + 2 * off, counts[p],
                   cls_ids[p]);
      off += counts[p];
    }
  }
}

int fastops_version() { return 1; }

}  // extern "C"
