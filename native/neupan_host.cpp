// neupan_host — native host-side kernels for the neupan_tpu runtime.
//
// The TPU owns the planner math (JAX/XLA/Pallas); these are the per-tick
// *host* hot loops that sit between the sensor and the device in a
// closed-loop deployment, mirroring the work the reference does in Python
// per lidar beam (reference: neupan/neupan.py:173-281 scan conversion;
// example/run_exp.py loop driving IR-SIM):
//
//   * scan_to_points      — polar ranges -> world-frame point cloud with
//                           range/angle filtering, sensor offset, robot pose
//                           transform and decimation
//   * raycast             — lidar simulation: beams x polygon segments
//   * closest_point_index — sliding-window path tracking
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).
// Build: see native/build.sh (g++ -O3 -shared).

#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// Convert a lidar scan to world-frame points.
//
// ranges:       [n_beams]
// velocity:     [2 * n_beams] (vx row-major then vy) or nullptr
// offset:       [3] sensor pose in the robot frame
// state:        [3] robot pose in the world frame
// out_points:   [2 * n_beams] capacity; filled compactly column-major (x,y)
// out_vels:     [2 * n_beams] capacity (may be nullptr)
// Returns the number of accepted points after filtering + decimation.
int scan_to_points(const double* ranges, int n_beams, double angle_min,
                   double angle_max, double range_min, double range_max,
                   double angle_lo, double angle_hi, int down_sample,
                   int offset_inverse, int min_inclusive,
                   const double* velocity, const double* offset,
                   const double* state, double* out_points,
                   double* out_vels) {
  if (n_beams <= 0) return 0;
  const double astep =
      n_beams > 1 ? (angle_max - angle_min) / (n_beams - 1) : 0.0;

  const double co = std::cos(offset[2]), so = std::sin(offset[2]);
  const double cs = std::cos(state[2]), ss = std::sin(state[2]);

  int kept = 0;
  int accepted = 0;  // pre-decimation index
  for (int i = 0; i < n_beams; ++i) {
    const double r = ranges[i];
    const double a = angle_min + astep * i;
    const bool above =
        min_inclusive ? (r >= range_min) : (r > range_min);
    if (!(r < range_max - 0.02) || !above) continue;
    if (!(a > angle_lo && a < angle_hi)) continue;
    if (accepted++ % down_sample != 0) continue;

    double px = r * std::cos(a);
    double py = r * std::sin(a);
    double tx, ty;
    if (offset_inverse) {
      // sensor -> robot frame: R_off' (p - t_off)
      const double dx = px - offset[0], dy = py - offset[1];
      tx = co * dx + so * dy;
      ty = -so * dx + co * dy;
    } else {
      tx = co * px - so * py + offset[0];
      ty = so * px + co * py + offset[1];
    }
    // robot -> world frame
    out_points[2 * kept] = cs * tx - ss * ty + state[0];
    out_points[2 * kept + 1] = ss * tx + cs * ty + state[1];
    if (out_vels != nullptr) {
      if (velocity != nullptr) {
        out_vels[2 * kept] = velocity[i];
        out_vels[2 * kept + 1] = velocity[n_beams + i];
      } else {
        out_vels[2 * kept] = 0.0;
        out_vels[2 * kept + 1] = 0.0;
      }
    }
    ++kept;
  }
  return kept;
}

// Ray-cast n_beams against n_segs segments.
//
// segs:      [n_segs * 4]  (x1, y1, x2, y2)
// out_range: [n_beams]  (range_max when no hit)
// out_seg:   [n_beams]  hit segment index or -1
void raycast(const double* origin, double heading, double angle_min,
             double angle_max, int n_beams, double range_min,
             double range_max, const double* segs, int n_segs,
             double* out_range, int32_t* out_seg) {
  const double astep =
      n_beams > 1 ? (angle_max - angle_min) / (n_beams - 1) : 0.0;
  for (int b = 0; b < n_beams; ++b) {
    const double a = heading + angle_min + astep * b;
    const double dx = std::cos(a), dy = std::sin(a);
    double best = range_max;
    int32_t hit = -1;
    for (int s = 0; s < n_segs; ++s) {
      const double px = segs[4 * s], py = segs[4 * s + 1];
      const double rx = segs[4 * s + 2] - px, ry = segs[4 * s + 3] - py;
      const double denom = dx * (-ry) - dy * (-rx);
      if (std::fabs(denom) < 1e-12) continue;
      const double ox = px - origin[0], oy = py - origin[1];
      const double t = (ox * (-ry) - oy * (-rx)) / denom;
      const double u = (dx * oy - dy * ox) / denom;
      if (t > range_min && t < best && u >= 0.0 && u <= 1.0) {
        best = t;
        hit = s;
      }
    }
    out_range[b] = best;
    out_seg[b] = hit;
  }
}

// Sliding-window closest point on a polyline (reference
// initial_path.py:166-183 semantics incl. the early break).
int closest_point_index(const double* px, const double* py, int n_points,
                        double sx, double sy, int start, int ind_range,
                        double threshold) {
  double min_d2 = std::numeric_limits<double>::infinity();
  int best = start;
  const int lo = start < 0 ? 0 : start;
  int hi = start + ind_range;
  if (hi > n_points) hi = n_points;
  const double thr2 = threshold * threshold;
  for (int i = lo; i < hi; ++i) {
    const double dx = px[i] - sx, dy = py[i] - sy;
    const double d2 = dx * dx + dy * dy;
    if (d2 < min_d2) {
      min_d2 = d2;
      best = i;
      if (d2 < thr2) break;
    }
  }
  return best;
}

}  // extern "C"
