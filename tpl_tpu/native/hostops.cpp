// Host-side sequential kernels for tpl_tpu.
//
// These are the marching/recursive loops that are inherently sequential and
// live on the host orchestration path (the device path is JAX/XLA):
//  - equidistant polyline resampling via circle-segment intersection
//    (behavioral twin of library/src/utils.cpp:410-560 in the reference)
//  - jerk/acc-limited velocity profile integration
//    (library/tpl/planning/utils.py:6-65)
//  - slope-limited evasive corridor ramp profiles
//    (library/tpl/planning/path_vel_decomp/path_optim.py:11-55)
//
// Built as a plain C ABI shared object, loaded via ctypes (no pybind11).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Returns number of samples written, or -1 on failure.
// out must hold steps * 5 doubles: x, y, alpha, prev_idx, next_idx.
int64_t tpl_resample(const double* pts_in, int64_t n_in,
                     double sampling_dist, int64_t steps,
                     int64_t start_index, int32_t closed,
                     double* out) {
    if (n_in == 0 || steps == 0) return 0;

    // drop consecutive duplicates
    std::vector<double> px(n_in), py(n_in);
    int64_t n = 0;
    for (int64_t i = 0; i < n_in; ++i) {
        double x = pts_in[2 * i], y = pts_in[2 * i + 1];
        if (n == 0 || x != px[n - 1] || y != py[n - 1]) {
            px[n] = x; py[n] = y; ++n;
        }
    }

    if (n == 1) {
        out[0] = px[0]; out[1] = py[0];
        out[2] = 0.0; out[3] = 0.0; out[4] = 0.0;
        return 1;
    }

    if (closed) {
        start_index = ((start_index % n) + n) % n;
    } else {
        start_index = std::max<int64_t>(0, std::min(start_index, n - 1));
    }

    out[0] = px[start_index];
    out[1] = py[start_index];
    out[2] = 0.0;
    out[3] = (double)start_index;
    out[4] = closed ? (double)((start_index + 1) % n)
                    : (double)std::min(start_index + 1, n - 1);

    const double r2 = sampling_dist * sampling_dist;
    int64_t i = start_index;
    int64_t count = 1;

    while (count < steps) {
        bool progressed = false;
        for (int64_t k = 0; k < n; ++k) {
            int64_t prev_idx = i + k;
            int64_t next_idx = i + k + 1;
            if (closed) {
                prev_idx = ((prev_idx % n) + n) % n;
                next_idx = ((next_idx % n) + n) % n;
            } else {
                prev_idx = std::max<int64_t>(0, std::min(prev_idx, n - 2));
                next_idx = std::max<int64_t>(0, std::min(next_idx, n - 1));
            }

            const double p0x = px[prev_idx], p0y = py[prev_idx];
            const double p1x = px[next_idx], p1y = py[next_idx];
            const double vx = p1x - p0x, vy = p1y - p0y;
            const double ls = vx * vx + vy * vy;
            const double l = std::sqrt(ls);

            const double cx = out[(count - 1) * 5];
            const double cy = out[(count - 1) * 5 + 1];

            const double D = (p0x - cx) * (p1y - cy) - (p1x - cx) * (p0y - cy);
            const double disc = r2 * ls - D * D;
            if (disc < 0) return -1;

            const double sq = std::sqrt(disc);
            const double sign_y = (vy < 0.0) ? -1.0 : 1.0;
            const double x_part0 = D * vy;
            const double y_part0 = -D * vx;
            const double x_part1 = sign_y * vx * sq;
            const double y_part1 = std::fabs(vy) * sq;

            double pax = (x_part0 + x_part1) / ls + cx;
            double pay = (y_part0 + y_part1) / ls + cy;
            const double pbx = (x_part0 - x_part1) / ls + cx;
            const double pby = (y_part0 - y_part1) / ls + cy;

            double qa = ((vx / l) * (pax - p0x) + (vy / l) * (pay - p0y)) / l;
            const double qb =
                ((vx / l) * (pbx - p0x) + (vy / l) * (pby - p0y)) / l;
            if (qa < qb) { qa = qb; pax = pbx; pay = pby; }

            const double tol = 1e-8;
            if ((!closed && next_idx == n - 1)
                    || (qa > -tol && qa - 1.0 < tol)) {
                i = prev_idx;
                out[count * 5] = pax;
                out[count * 5 + 1] = pay;
                out[count * 5 + 2] = qa;
                out[count * 5 + 3] = (double)prev_idx;
                out[count * 5 + 4] = (double)next_idx;
                ++count;
                progressed = true;
                break;
            }
        }
        if (!progressed) return -1;
    }
    return count;
}

// Jerk/acc-limited velocity profile over space.
// lim_v_in: n entries; out: n*2 doubles (v, a). has_v0/has_a0 gate v0/a0.
void tpl_rampify_profile(double v0, double a0, int32_t has_v0,
                         int32_t has_a0, const double* lim_v_in, int64_t n,
                         double a_min, double a_max, double j_min,
                         double j_max, double v_min, double step,
                         double* out) {
    std::vector<double> lim_v(n);
    for (int64_t i = 0; i < n; ++i)
        lim_v[i] = std::max(lim_v_in[i], v_min);

    std::memset(out, 0, sizeof(double) * n * 2);

    // backward pass
    double current_v = lim_v[n - 1];
    double current_a = 0.0;
    for (int64_t t = n - 1; t > 0; --t) {
        out[t * 2] = current_v;
        out[t * 2 + 1] = current_a;
        double lim_a = std::max(
            a_min, (current_v - lim_v[t - 1]) / step * current_v);
        if (lim_a < 0.0) {
            current_a = std::max(current_a + j_min / current_v * step, lim_a);
        } else {
            current_a = 0.0;
            current_v = lim_v[t];
        }
        current_v += std::min(-current_a / current_v * step,
                              lim_v[t - 1] - current_v);
    }

    // forward pass
    if (has_v0) {
        current_v = std::max(v0, v_min);
        out[0] = current_v;
    } else {
        out[0] = current_v;
    }
    if (has_a0) {
        current_a = a0;
        out[1] = a0;
    } else {
        current_a = -current_a;
        out[1] = current_a;
    }

    double lim_a = 0.0;
    for (int64_t t = 0; t < n; ++t) {
        if (t < n - 1) {
            lim_a = std::min(a_max,
                             (out[(t + 1) * 2] - current_v) / step * current_v);
        }
        if (lim_a > 0.0) {
            current_a = std::min(current_a + j_max / current_v * step, lim_a);
        } else {
            current_a = 0.0;
            current_v = out[t * 2];
        }
        double next_v = current_v + std::min(current_a / current_v * step,
                                             lim_v[t] - current_v);
        current_v = std::min(out[t * 2], next_v);
        out[t * 2] = current_v;
        out[t * 2 + 1] = current_a;
    }
}

// Slope-limited evasive corridor ramp (forward + backward pass max).
// path_v: target velocities path[:, 5], n entries; lower/upper: n entries.
void tpl_rampify_corridor(double step, int64_t horizon, double sharpness,
                          double proj_distance, const double* path_v,
                          int64_t n, double gap, const double* lower,
                          const double* upper, double* out) {
    std::vector<double> fwd(n, -10.0), bwd(n, -10.0);

    for (int pass_nr = 0; pass_nr < 2; ++pass_nr) {
        double* pd = pass_nr == 0 ? fwd.data() : bwd.data();
        double d = pass_nr == 0 ? lower[0] : lower[horizon - 1];

        const int64_t begin = pass_nr == 0 ? 0 : horizon - 1;
        const int64_t end = pass_nr == 0 ? horizon : -1;
        const int64_t stepi = pass_nr == 0 ? 1 : -1;

        for (int64_t i = begin; i != end; i += stepi) {
            d = std::max(lower[i], d);
            pd[i] = d;

            double v = std::max(path_v[i], 1e-8);
            double slope = -(sharpness / (v * v));

            if (pass_nr == 0) {
                for (int64_t k = i; k < horizon; ++k) {
                    double denom = (double)std::max<int64_t>(
                        1, std::llabs(k - i)) * step;
                    slope = std::min(slope, (upper[k] - gap - d) / denom);
                }
            } else {
                for (int64_t k = i; k >= 0; --k) {
                    double denom = (double)std::max<int64_t>(
                        1, std::llabs(k - i)) * step;
                    slope = std::min(slope, (upper[k] - gap - d) / denom);
                }
                slope = std::min(slope, (proj_distance - d)
                                 / std::max<double>(1, (double)i * step));
            }

            d += step * slope;
        }
    }

    for (int64_t i = 0; i < n; ++i)
        out[i] = std::max(fwd[i], bwd[i]);
}

}  // extern "C"
