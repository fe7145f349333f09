// Native (C++20, dependency-free) ground-truth oracle + CPU baseline harness.
//
// Independent third implementation of the spectral rod-kinematics algorithm
// of /root/reference/main.cpp — same mathematics, deliberately different
// engineering: no Eigen (hand-rolled dense linear algebra), LU with partial
// pivoting instead of an explicit inverse, flat row-major buffers, a C ABI
// for ctypes, and an OpenMP-batched driver that realizes the reference's
// never-committed google-benchmark intent (CMakeLists.txt:40-43) so the TPU
// numbers have an honest CPU baseline.
//
// Semantics mirrored exactly (see SURVEY.md §2):
//   * descending CGL grid x_j = (L/2)(1 + cos(pi j/(N-1)))     [h:19-30]
//   * c-weights (+-, 2 at endpoints)                           [h:37-52]
//   * Dn with negative-row-sum diagonal                        [h:59-108]
//   * Legendre modes P_0..P_{ne-1} on x = 2X-1                 [utilities.h:49-67]
//   * A_NN = I4 (x) Dn_NN - 1/2 A_hat, component-major         [main.cpp:55-88]
//   * q solve with IC at the last grid point                   [main.cpp:91-118]
//   * unnormalized quaternion -> rotation, b = R e1            [main.cpp:121-140]
//   * position quadrature Dn_NN r = b - ivp                    [main.cpp:145-176]

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr double kPi = 3.14159265358979323846264338327950288;

void cgl_points(int n, double length, double* x) {
  for (int j = 0; j < n; ++j) {
    x[j] = 0.5 * length * (1.0 + std::cos(kPi * j / (n - 1)));
  }
}

void diff_matrix(int n, double length, double* d) {
  std::vector<double> x(n), c(n);
  cgl_points(n, length, x.data());
  for (int i = 0; i < n; ++i) {
    const double gain = (i == 0 || i == n - 1) ? 2.0 : 1.0;
    c[i] = ((i % 2) ? -1.0 : 1.0) * gain;
  }
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      const double dx = x[i] - x[j] + (i == j ? 1.0 : 0.0);
      d[i * n + j] = (c[i] / c[j]) / dx;
    }
  }
  // Negative-row-sum diagonal trick.
  for (int i = 0; i < n; ++i) {
    double row = 0.0;
    for (int j = 0; j < n; ++j) row += d[i * n + j];
    d[i * n + i] -= row;
  }
}

double legendre(int order, double t) {
  double p0 = 1.0, p1 = t;
  if (order == 0) return p0;
  for (int k = 1; k < order; ++k) {
    const double p2 = ((2.0 * k + 1.0) * t * p1 - k * p0) / (k + 1.0);
    p0 = p1;
    p1 = p2;
  }
  return p1;
}

// In-place LU with partial pivoting; solves a (m x m) system for one RHS.
bool lu_solve(std::vector<double>& a, double* b, int m) {
  std::vector<int> piv(m);
  for (int i = 0; i < m; ++i) piv[i] = i;
  for (int k = 0; k < m; ++k) {
    int p = k;
    double best = std::fabs(a[k * m + k]);
    for (int i = k + 1; i < m; ++i) {
      const double v = std::fabs(a[i * m + k]);
      if (v > best) { best = v; p = i; }
    }
    if (best == 0.0) return false;
    if (p != k) {
      for (int j = 0; j < m; ++j) std::swap(a[k * m + j], a[p * m + j]);
      std::swap(b[k], b[p]);
    }
    const double inv = 1.0 / a[k * m + k];
    for (int i = k + 1; i < m; ++i) {
      const double f = a[i * m + k] * inv;
      a[i * m + k] = f;
      for (int j = k + 1; j < m; ++j) a[i * m + j] -= f * a[k * m + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = m - 1; i >= 0; --i) {
    double s = b[i];
    for (int j = i + 1; j < m; ++j) s -= a[i * m + j] * b[j];
    b[i] = s / a[i * m + i];
  }
  return true;
}

// Multi-RHS variant (rhs is m x k, row-major), factorizing once.
bool lu_solve_multi(std::vector<double>& a, double* rhs, int m, int k) {
  std::vector<int> piv(m);
  for (int col = 0; col < m; ++col) piv[col] = col;
  for (int kk = 0; kk < m; ++kk) {
    int p = kk;
    double best = std::fabs(a[kk * m + kk]);
    for (int i = kk + 1; i < m; ++i) {
      const double v = std::fabs(a[i * m + kk]);
      if (v > best) { best = v; p = i; }
    }
    if (best == 0.0) return false;
    if (p != kk) {
      for (int j = 0; j < m; ++j) std::swap(a[kk * m + j], a[p * m + j]);
      for (int j = 0; j < k; ++j) std::swap(rhs[kk * k + j], rhs[p * k + j]);
    }
    const double inv = 1.0 / a[kk * m + kk];
    for (int i = kk + 1; i < m; ++i) {
      const double f = a[i * m + kk] * inv;
      a[i * m + kk] = f;
      for (int j = kk + 1; j < m; ++j) a[i * m + j] -= f * a[kk * m + j];
      for (int j = 0; j < k; ++j) rhs[i * k + j] -= f * rhs[kk * k + j];
    }
  }
  for (int i = m - 1; i >= 0; --i) {
    for (int j = 0; j < k; ++j) {
      double s = rhs[i * k + j];
      for (int c = i + 1; c < m; ++c) s -= a[i * m + c] * rhs[c * k + j];
      rhs[i * k + j] = s / a[i * m + i];
    }
  }
  return true;
}

struct Workspace {
  int n, na, ne;
  double length;
  std::vector<double> dn;        // n*n
  std::vector<double> dn_nn;     // (n-1)*(n-1)
  std::vector<double> dn_in;     // (n-1)
  std::vector<double> ptab;      // (n-1)*ne Legendre table at unknown points
};

Workspace make_workspace(int n, int na, int ne, double length) {
  Workspace w;
  w.n = n; w.na = na; w.ne = ne; w.length = length;
  const int m = n - 1;
  w.dn.resize(n * n);
  diff_matrix(n, length, w.dn.data());
  w.dn_nn.resize(m * m);
  w.dn_in.resize(m);
  for (int i = 0; i < m; ++i) {
    for (int j = 0; j < m; ++j) w.dn_nn[i * m + j] = w.dn[i * n + j];
    w.dn_in[i] = w.dn[i * n + (n - 1)];
  }
  std::vector<double> x(n);
  cgl_points(n, length, x.data());
  w.ptab.resize(m * ne);
  for (int i = 0; i < m; ++i) {
    const double t = 2.0 * (x[i] / length) - 1.0;
    for (int e = 0; e < ne; ++e) w.ptab[i * ne + e] = legendre(e, t);
  }
  return w;
}

// Solve one rod given a prepared workspace. q_out: (n-1)*4 component-major
// flat stack (reference layout); r_out: (n-1)*3 row-major points.
bool solve_rod_ws(const Workspace& w, const double* qe, const double* q_init,
                  const double* r_init, double* q_out, double* r_out) {
  const int m = w.n - 1;
  const int dim = 4 * m;
  // Assemble A = I4 (x) Dn_NN - 1/2 A_hat (component-major scatter).
  std::vector<double> a(dim * dim, 0.0);
  for (int c = 0; c < 4; ++c)
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < m; ++j)
        a[(c * m + i) * dim + (c * m + j)] = w.dn_nn[i * m + j];
  for (int i = 0; i < m; ++i) {
    double k[3] = {0.0, 0.0, 0.0};
    for (int comp = 0; comp < w.na && comp < 3; ++comp)
      for (int e = 0; e < w.ne; ++e)
        k[comp] += w.ptab[i * w.ne + e] * qe[comp * w.ne + e];
    const double k0 = k[0], k1 = k[1], k2 = k[2];
    const double blk[4][4] = {
        {0.0, -k0, -k1, -k2},
        {k0, 0.0, k2, -k1},
        {k1, -k2, 0.0, k0},
        {k2, k1, -k0, 0.0},
    };
    for (int r = 0; r < 4; ++r)
      for (int c = 0; c < 4; ++c)
        a[(r * m + i) * dim + (c * m + i)] -= 0.5 * blk[r][c];
  }
  // RHS: -(I4 (x) Dn_IN) q_init.
  for (int c = 0; c < 4; ++c)
    for (int i = 0; i < m; ++i)
      q_out[c * m + i] = -w.dn_in[i] * q_init[c];
  if (!lu_solve(a, q_out, dim)) return false;

  // Position: b_i = (unnormalized R(q_i)) e1; solve Dn_NN r = b - ivp.
  std::vector<double> rhs(m * 3);
  for (int i = 0; i < m; ++i) {
    const double qw = q_out[i], qx = q_out[m + i], qy = q_out[2 * m + i],
                 qz = q_out[3 * m + i];
    rhs[i * 3 + 0] = 1.0 - 2.0 * (qy * qy + qz * qz) - w.dn_in[i] * r_init[0];
    rhs[i * 3 + 1] = 2.0 * (qx * qy + qw * qz) - w.dn_in[i] * r_init[1];
    rhs[i * 3 + 2] = 2.0 * (qx * qz - qw * qy) - w.dn_in[i] * r_init[2];
  }
  std::vector<double> dnn = w.dn_nn;  // copy; LU destroys it
  if (!lu_solve_multi(dnn, rhs.data(), m, 3)) return false;
  std::memcpy(r_out, rhs.data(), sizeof(double) * m * 3);
  return true;
}

}  // namespace

extern "C" {

// Grid / operator exports for unit tests.
void oracle_cgl_points(int n, double length, double* out) {
  cgl_points(n, length, out);
}

void oracle_diff_matrix(int n, double length, double* out) {
  diff_matrix(n, length, out);
}

double oracle_legendre(int order, double t) { return legendre(order, t); }

// Single-rod solve; returns 0 on success.
int oracle_solve_rod(int n, int na, int ne, double length, const double* qe,
                     const double* q_init, const double* r_init,
                     double* q_stack_out, double* r_stack_out) {
  Workspace w = make_workspace(n, na, ne, length);
  return solve_rod_ws(w, qe, q_init, r_init, q_stack_out, r_stack_out) ? 0 : 1;
}

// Batched solve (OpenMP when available). qe: B x (na*ne); outputs stacked.
int oracle_solve_rod_batch(int n, int na, int ne, double length, int batch,
                           const double* qe, const double* q_init,
                           const double* r_init, double* q_stack_out,
                           double* r_stack_out) {
  const int m = n - 1;
  const Workspace w = make_workspace(n, na, ne, length);
  int failures = 0;
#if defined(_OPENMP)
#pragma omp parallel for reduction(+ : failures) schedule(static)
#endif
  for (int b = 0; b < batch; ++b) {
    if (!solve_rod_ws(w, qe + b * na * ne, q_init, r_init,
                      q_stack_out + b * 4 * m, r_stack_out + b * 3 * m)) {
      ++failures;
    }
  }
  return failures;
}

int oracle_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"

#ifdef ORACLE_MAIN
// CPU baseline harness: batched solves/sec with the reference algorithm.
int main(int argc, char** argv) {
  const int batch = argc > 1 ? std::atoi(argv[1]) : 65536;
  const int n = argc > 2 ? std::atoi(argv[2]) : 16;
  const int reps = argc > 3 ? std::atoi(argv[3]) : 5;
  const int m = n - 1;
  std::vector<double> qe(batch * 9);
  std::srand(0);
  for (auto& v : qe) v = 2.0 * (std::rand() / double(RAND_MAX)) - 1.0;
  const double q0[4] = {1, 0, 0, 0};
  const double r0[3] = {0, 0, 0};
  std::vector<double> qs(batch * 4 * m), rs(batch * 3 * m);
#if defined(_OPENMP)
  const double t0 = omp_get_wtime();
#else
  const double t0 = double(clock()) / CLOCKS_PER_SEC;
#endif
  for (int r = 0; r < reps; ++r) {
    oracle_solve_rod_batch(n, 3, 3, 1.0, batch, qe.data(), q0, r0, qs.data(),
                           rs.data());
  }
#if defined(_OPENMP)
  const double dt = (omp_get_wtime() - t0) / reps;
#else
  const double dt = (double(clock()) / CLOCKS_PER_SEC - t0) / reps;
#endif
  std::printf(
      "{\"metric\": \"cpu_baseline_solves_per_sec\", \"value\": %.1f, "
      "\"batch\": %d, \"n\": %d, \"threads\": %d}\n",
      batch / dt, batch, n, oracle_num_threads());
  return 0;
}
#endif
