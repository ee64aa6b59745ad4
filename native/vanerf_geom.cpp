// vanerf_geom — native CPU geometry kernels for the offline pipeline.
//
// The TPU compute path runs the Pallas/XLA kernels in vanerf_tpu/ops; this
// library serves the HOST side: the offline dataset preprocessor
// (data_process/dataset_process.py rasterizes every source view of every
// frame) and CPU-bound tests, where a tight C++ loop beats dispatching
// XLA-CPU programs.  Exposed via ctypes (no pybind11 dependency).
//
// Functional parity targets (same math as the device kernels):
//   point_mesh_query: exact point-triangle distance + argmin + winding
//     (signed ray crossings) — kaolin point_to_mesh_distance/check_sign
//     equivalents (reference mesh_util.py:498-524).
//   rasterize: z-buffer triangle rasterization with barycentrics —
//     pytorch3d rasterize_meshes equivalent (render_utils.py:158-211).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

static inline double dot3(const double* a, const double* b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}

static inline void sub3(const double* a, const double* b, double* o) {
  o[0] = a[0] - b[0];
  o[1] = a[1] - b[1];
  o[2] = a[2] - b[2];
}

static inline void cross3(const double* a, const double* b, double* o) {
  o[0] = a[1] * b[2] - a[2] * b[1];
  o[1] = a[2] * b[0] - a[0] * b[2];
  o[2] = a[0] * b[1] - a[1] * b[0];
}

// Exact squared distance point -> triangle (Ericson 5.1.5).
static double point_tri_d2(const double* p, const double* a, const double* b,
                           const double* c) {
  double ab[3], ac[3], ap[3], bp[3], cp[3];
  sub3(b, a, ab);
  sub3(c, a, ac);
  sub3(p, a, ap);
  double d1 = dot3(ab, ap), d2 = dot3(ac, ap);
  if (d1 <= 0 && d2 <= 0) {
    double d[3];
    sub3(p, a, d);
    return dot3(d, d);
  }
  sub3(p, b, bp);
  double d3 = dot3(ab, bp), d4 = dot3(ac, bp);
  if (d3 >= 0 && d4 <= d3) {
    double d[3];
    sub3(p, b, d);
    return dot3(d, d);
  }
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double t = d1 / (d1 - d3);
    double q[3] = {a[0] + t * ab[0], a[1] + t * ab[1], a[2] + t * ab[2]};
    double d[3];
    sub3(p, q, d);
    return dot3(d, d);
  }
  sub3(p, c, cp);
  double d5 = dot3(ab, cp), d6 = dot3(ac, cp);
  if (d6 >= 0 && d5 <= d6) {
    double d[3];
    sub3(p, c, d);
    return dot3(d, d);
  }
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double t = d2 / (d2 - d6);
    double q[3] = {a[0] + t * ac[0], a[1] + t * ac[1], a[2] + t * ac[2]};
    double d[3];
    sub3(p, q, d);
    return dot3(d, d);
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double t = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    double q[3] = {b[0] + t * (c[0] - b[0]), b[1] + t * (c[1] - b[1]),
                   b[2] + t * (c[2] - b[2])};
    double d[3];
    sub3(p, q, d);
    return dot3(d, d);
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  double q[3] = {a[0] + v * ab[0] + w * ac[0], a[1] + v * ab[1] + w * ac[1],
                 a[2] + v * ab[2] + w * ac[2]};
  double d[3];
  sub3(p, q, d);
  return dot3(d, d);
}

// Fused query: for each point, min squared distance + argmin face +
// winding number via signed crossings of a fixed generic ray.
void point_mesh_query(const float* points, int64_t n_points,
                      const float* tris, int64_t n_faces, float* out_d2,
                      int32_t* out_idx, float* out_wind) {
  const double rd[3] = {0.5773502691896258, 0.7071067811865476,
                        0.40824829046386296};
  for (int64_t i = 0; i < n_points; ++i) {
    const double p[3] = {points[i * 3], points[i * 3 + 1], points[i * 3 + 2]};
    double best = std::numeric_limits<double>::infinity();
    int32_t best_f = 0;
    double wind = 0.0;
    for (int64_t f = 0; f < n_faces; ++f) {
      const float* t = tris + f * 9;
      const double a[3] = {t[0], t[1], t[2]};
      const double b[3] = {t[3], t[4], t[5]};
      const double c[3] = {t[6], t[7], t[8]};
      double d2 = point_tri_d2(p, a, b, c);
      if (d2 < best) {
        best = d2;
        best_f = (int32_t)f;
      }
      // Moller-Trumbore signed crossing
      double e1[3], e2[3], pv[3], q[3], qv[3];
      sub3(b, a, e1);
      sub3(c, a, e2);
      cross3(rd, e2, pv);
      double det = dot3(e1, pv);
      if (det == 0.0) continue;
      sub3(p, a, q);
      double u = dot3(q, pv) / det;
      if (u < 0.0 || u > 1.0) continue;
      cross3(q, e1, qv);
      double v = dot3(rd, qv) / det;
      if (v < 0.0 || u + v > 1.0) continue;
      double tt = dot3(e2, qv) / det;
      if (tt <= 0.0) continue;
      wind += (det > 0.0) ? -1.0 : 1.0;
    }
    out_d2[i] = (float)best;
    out_idx[i] = best_f;
    out_wind[i] = (float)wind;
  }
}

// Z-buffer rasterization with barycentrics; face = -1 on background.
void rasterize(const float* verts_xy, const float* verts_z,
               int64_t n_verts, const int32_t* faces, int64_t n_faces,
               int32_t height, int32_t width, int32_t* out_face,
               float* out_z, float* out_bary) {
  const int64_t n_pix = (int64_t)height * width;
  for (int64_t i = 0; i < n_pix; ++i) {
    out_face[i] = -1;
    out_z[i] = std::numeric_limits<float>::infinity();
    out_bary[i * 3] = out_bary[i * 3 + 1] = out_bary[i * 3 + 2] = 0.0f;
  }
  for (int64_t f = 0; f < n_faces; ++f) {
    const int32_t i0 = faces[f * 3], i1 = faces[f * 3 + 1],
                  i2 = faces[f * 3 + 2];
    const double ax = verts_xy[i0 * 2], ay = verts_xy[i0 * 2 + 1];
    const double bx = verts_xy[i1 * 2], by = verts_xy[i1 * 2 + 1];
    const double cx = verts_xy[i2 * 2], cy = verts_xy[i2 * 2 + 1];
    const double z0 = verts_z[i0], z1 = verts_z[i1], z2 = verts_z[i2];
    double area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
    if (std::abs(area) < 1e-12) continue;
    int x_min = (int)std::floor(std::fmin(ax, std::fmin(bx, cx)));
    int x_max = (int)std::ceil(std::fmax(ax, std::fmax(bx, cx)));
    int y_min = (int)std::floor(std::fmin(ay, std::fmin(by, cy)));
    int y_max = (int)std::ceil(std::fmax(ay, std::fmax(by, cy)));
    x_min = x_min < 0 ? 0 : x_min;
    y_min = y_min < 0 ? 0 : y_min;
    x_max = x_max >= width ? width - 1 : x_max;
    y_max = y_max >= height ? height - 1 : y_max;
    const double inv = 1.0 / area;
    for (int y = y_min; y <= y_max; ++y) {
      for (int x = x_min; x <= x_max; ++x) {
        double w0 = ((cx - bx) * (y - by) - (cy - by) * (x - bx)) * inv;
        double w1 = ((ax - cx) * (y - cy) - (ay - cy) * (x - cx)) * inv;
        double w2 = ((bx - ax) * (y - ay) - (by - ay) * (x - ax)) * inv;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        double z = w0 * z0 + w1 * z1 + w2 * z2;
        int64_t pix = (int64_t)y * width + x;
        if (z < out_z[pix]) {
          out_z[pix] = (float)z;
          out_face[pix] = (int32_t)f;
          out_bary[pix * 3] = (float)w0;
          out_bary[pix * 3 + 1] = (float)w1;
          out_bary[pix * 3 + 2] = (float)w2;
        }
      }
    }
  }
}

}  // extern "C"
