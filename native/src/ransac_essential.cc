// Native LO-RANSAC essential-matrix pose solver.
//
// Replaces the reference's dependency on OpenCV's C++ findEssentialMat /
// recoverPose (/root/reference/src/utils/metrics.py:83-93) with an in-tree
// implementation: 8-point minimal solves, Sampson scoring, Cauchy-IRLS local
// optimization with threshold annealing (same algorithm as the JAX solver in
// loftr_tpu/eval/ransac.py - the two implementations cross-check each other),
// essential-manifold projection, and cheirality-voted pose recovery.
//
// Self-contained: Jacobi eigenvalue decomposition for the 9x9 normal matrix
// and 3x3 SVD; no external linear-algebra dependency.
//
// C API at the bottom; Python binding via ctypes in loftr_tpu/native/.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

// ---------------------------------------------------------------- linalg

// Jacobi eigenvalue decomposition of a symmetric n x n matrix (n <= 9).
// A is destroyed; V receives eigenvectors (columns); d the eigenvalues.
void jacobi_eigen(double* A, int n, double* V, double* d) {
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) V[i * n + j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 64; ++sweep) {
    double off = 0;
    for (int p = 0; p < n; ++p)
      for (int q = p + 1; q < n; ++q) off += A[p * n + q] * A[p * n + q];
    if (off < 1e-24) break;
    for (int p = 0; p < n; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = A[p * n + q];
        if (std::fabs(apq) < 1e-30) continue;
        double app = A[p * n + p], aqq = A[q * n + q];
        double theta = 0.5 * (aqq - app) / apq;
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0);
        double s = t * c;
        for (int k = 0; k < n; ++k) {
          double akp = A[k * n + p], akq = A[k * n + q];
          A[k * n + p] = c * akp - s * akq;
          A[k * n + q] = s * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = A[p * n + k], aqk = A[q * n + k];
          A[p * n + k] = c * apk - s * aqk;
          A[q * n + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = V[k * n + p], vkq = V[k * n + q];
          V[k * n + p] = c * vkp - s * vkq;
          V[k * n + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < n; ++i) d[i] = A[i * n + i];
}

struct Mat3 {
  double m[9];
  double& operator()(int r, int c) { return m[r * 3 + c]; }
  double operator()(int r, int c) const { return m[r * 3 + c]; }
};

Mat3 matmul(const Mat3& a, const Mat3& b) {
  Mat3 out{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a(i, k) * b(k, j);
      out(i, j) = s;
    }
  return out;
}

Mat3 transpose(const Mat3& a) {
  Mat3 out{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) out(i, j) = a(j, i);
  return out;
}

double det3(const Mat3& a) {
  return a(0, 0) * (a(1, 1) * a(2, 2) - a(1, 2) * a(2, 1)) -
         a(0, 1) * (a(1, 0) * a(2, 2) - a(1, 2) * a(2, 0)) +
         a(0, 2) * (a(1, 0) * a(2, 1) - a(1, 1) * a(2, 0));
}

// SVD of a 3x3 matrix via eigen-decomposition of A^T A (adequate
// conditioning for essential matrices).  A = U diag(s) V^T.
void svd3(const Mat3& A, Mat3& U, double s[3], Mat3& V) {
  double ata[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += A(k, i) * A(k, j);
      ata[i * 3 + j] = acc;
    }
  double vecs[9], vals[3];
  jacobi_eigen(ata, 3, vecs, vals);
  // sort descending
  int idx[3] = {0, 1, 2};
  std::sort(idx, idx + 3, [&](int a, int b) { return vals[a] > vals[b]; });
  for (int c = 0; c < 3; ++c) {
    s[c] = std::sqrt(std::max(vals[idx[c]], 0.0));
    for (int r = 0; r < 3; ++r) V(r, c) = vecs[r * 3 + idx[c]];
  }
  // U = A V / s (orthonormalize the small-singular-value column)
  for (int c = 0; c < 3; ++c) {
    double col[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int k = 0; k < 3; ++k) col[r] += A(r, k) * V(k, c);
    double nrm = std::sqrt(col[0] * col[0] + col[1] * col[1] +
                           col[2] * col[2]);
    if (nrm > 1e-12) {
      for (int r = 0; r < 3; ++r) U(r, c) = col[r] / nrm;
    } else {
      // cross product of the first two columns
      U(0, c) = U(1, 0) * U(2, 1) - U(2, 0) * U(1, 1);
      U(1, c) = U(2, 0) * U(0, 1) - U(0, 0) * U(2, 1);
      U(2, c) = U(0, 0) * U(1, 1) - U(1, 0) * U(0, 1);
    }
  }
}

// ------------------------------------------------------------- 8-point

// Weighted 8-point: E = argmin ||W A e||, e the smallest eigenvector of
// (WA)^T (WA); then projected to the essential manifold (sv -> 1,1,0).
bool eight_point(const double* p0, const double* p1, const double* w, int n,
                 Mat3& E) {
  double AtA[81];
  std::memset(AtA, 0, sizeof(AtA));
  for (int m = 0; m < n; ++m) {
    if (w[m] <= 0) continue;
    double x0 = p0[2 * m], y0 = p0[2 * m + 1];
    double x1 = p1[2 * m], y1 = p1[2 * m + 1];
    double row[9] = {x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0,
                     y1,      x0,      y0, 1.0};
    for (int i = 0; i < 9; ++i)
      for (int j = 0; j < 9; ++j)
        AtA[i * 9 + j] += w[m] * w[m] * row[i] * row[j];
  }
  double vecs[81], vals[9];
  jacobi_eigen(AtA, 9, vecs, vals);
  int best = 0;
  for (int i = 1; i < 9; ++i)
    if (vals[i] < vals[best]) best = i;
  for (int i = 0; i < 9; ++i) E.m[i] = vecs[i * 9 + best];
  // essential-manifold projection
  Mat3 U, V;
  double s[3];
  svd3(E, U, s, V);
  Mat3 D{};
  D(0, 0) = 1;
  D(1, 1) = 1;
  E = matmul(matmul(U, D), transpose(V));
  return true;
}

double sampson_sq(const Mat3& E, double x0, double y0, double x1, double y1) {
  double Ep0[3] = {E(0, 0) * x0 + E(0, 1) * y0 + E(0, 2),
                   E(1, 0) * x0 + E(1, 1) * y0 + E(1, 2),
                   E(2, 0) * x0 + E(2, 1) * y0 + E(2, 2)};
  double Etp1[3] = {E(0, 0) * x1 + E(1, 0) * y1 + E(2, 0),
                    E(0, 1) * x1 + E(1, 1) * y1 + E(2, 1),
                    E(0, 2) * x1 + E(1, 2) * y1 + E(2, 2)};
  double num = x1 * Ep0[0] + y1 * Ep0[1] + Ep0[2];
  num *= num;
  double den = Ep0[0] * Ep0[0] + Ep0[1] * Ep0[1] + Etp1[0] * Etp1[0] +
               Etp1[1] * Etp1[1];
  return num / std::max(den, 1e-12);
}

// triangulated depths for cheirality
void triangulate(const Mat3& R, const double t[3], double x0, double y0,
                 double x1, double y1, double& z0, double& z1) {
  double X0[3] = {x0, y0, 1.0};
  double X1[3] = {x1, y1, 1.0};
  double RX0[3];
  for (int r = 0; r < 3; ++r)
    RX0[r] = R(r, 0) * X0[0] + R(r, 1) * X0[1] + R(r, 2) * X0[2];
  double a11 = RX0[0] * RX0[0] + RX0[1] * RX0[1] + RX0[2] * RX0[2];
  double a12 = -(RX0[0] * X1[0] + RX0[1] * X1[1] + RX0[2] * X1[2]);
  double a22 = X1[0] * X1[0] + X1[1] * X1[1] + X1[2] * X1[2];
  double b1 = -(RX0[0] * t[0] + RX0[1] * t[1] + RX0[2] * t[2]);
  double b2 = X1[0] * t[0] + X1[1] * t[1] + X1[2] * t[2];
  double det = a11 * a22 - a12 * a12;
  if (std::fabs(det) < 1e-12) det = 1e-12;
  z0 = (b1 * a22 - b2 * a12) / det;
  z1 = (a11 * b2 - a12 * b1) / det;
}

void decompose_and_vote(const Mat3& E, const double* p0, const double* p1,
                        const unsigned char* inliers, int n, Mat3& R_best,
                        double t_best[3]) {
  Mat3 U, V;
  double s[3];
  svd3(E, U, s, V);
  if (det3(U) < 0)
    for (int i = 0; i < 9; ++i) U.m[i] = -U.m[i];
  if (det3(V) < 0)
    for (int i = 0; i < 9; ++i) V.m[i] = -V.m[i];
  Mat3 W{};
  W(0, 1) = -1;
  W(1, 0) = 1;
  W(2, 2) = 1;
  Mat3 R1 = matmul(matmul(U, W), transpose(V));
  Mat3 R2 = matmul(matmul(U, transpose(W)), transpose(V));
  double tv[3] = {U(0, 2), U(1, 2), U(2, 2)};

  int best_votes = -1;
  for (int cand = 0; cand < 4; ++cand) {
    const Mat3& R = (cand < 2) ? R1 : R2;
    double t[3] = {tv[0], tv[1], tv[2]};
    if (cand % 2 == 1)
      for (double& v : t) v = -v;
    int votes = 0;
    for (int m = 0; m < n; ++m) {
      if (!inliers[m]) continue;
      double z0, z1;
      triangulate(R, t, p0[2 * m], p0[2 * m + 1], p1[2 * m], p1[2 * m + 1],
                  z0, z1);
      if (z0 > 0 && z1 > 0) ++votes;
    }
    if (votes > best_votes) {
      best_votes = votes;
      R_best = R;
      std::memcpy(t_best, t, sizeof(double) * 3);
    }
  }
}

}  // namespace

extern "C" {

// Returns the number of inliers (0 => failure / too few matches).
// p0_px/p1_px: [n, 2] float pixel coords; K0/K1: row-major 3x3 intrinsics;
// R_out row-major 3x3; inlier_mask: n bytes.
int estimate_pose_essential(const float* p0_px, const float* p1_px, int n,
                            const double* K0, const double* K1,
                            double pixel_thr, int num_hypotheses,
                            uint64_t seed, double* R_out, double* t_out,
                            unsigned char* inlier_mask) {
  if (n < 8) return 0;
  std::vector<double> p0(2 * n), p1(2 * n), w(n, 1.0), err(n);
  for (int m = 0; m < n; ++m) {
    p0[2 * m] = (p0_px[2 * m] - K0[2]) / K0[0];
    p0[2 * m + 1] = (p0_px[2 * m + 1] - K0[5]) / K0[4];
    p1[2 * m] = (p1_px[2 * m] - K1[2]) / K1[0];
    p1[2 * m + 1] = (p1_px[2 * m + 1] - K1[5]) / K1[4];
  }
  double thr = pixel_thr / ((K0[0] + K0[4] + K1[0] + K1[4]) / 4.0);
  double thr_sq = thr * thr;

  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> pick(0, n - 1);

  Mat3 E_best{};
  int best_inl = -1;
  std::vector<double> sp0(16), sp1(16), sw(8, 1.0);
  for (int h = 0; h < num_hypotheses; ++h) {
    int idx[8];
    for (int k = 0; k < 8; ++k) {
      bool dup;
      do {
        idx[k] = pick(rng);
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (idx[j] == idx[k]);
      } while (dup);
    }
    for (int k = 0; k < 8; ++k) {
      sp0[2 * k] = p0[2 * idx[k]];
      sp0[2 * k + 1] = p0[2 * idx[k] + 1];
      sp1[2 * k] = p1[2 * idx[k]];
      sp1[2 * k + 1] = p1[2 * idx[k] + 1];
    }
    Mat3 E;
    eight_point(sp0.data(), sp1.data(), sw.data(), 8, E);
    int inl = 0;
    for (int m = 0; m < n; ++m)
      if (sampson_sq(E, p0[2 * m], p0[2 * m + 1], p1[2 * m],
                     p1[2 * m + 1]) < thr_sq)
        ++inl;
    if (inl > best_inl) {
      best_inl = inl;
      E_best = E;
    }
  }
  if (best_inl < 8) return 0;

  // Cauchy-IRLS local optimization with threshold annealing (same schedule
  // as the JAX solver)
  const double mults[6] = {16, 8, 4, 2, 1, 1};
  Mat3 E_cur = E_best, E_fin = E_best;
  auto count_inl = [&](const Mat3& E) {
    int c = 0;
    for (int m = 0; m < n; ++m)
      if (sampson_sq(E, p0[2 * m], p0[2 * m + 1], p1[2 * m],
                     p1[2 * m + 1]) < thr_sq)
        ++c;
    return c;
  };
  int n_fin = count_inl(E_fin);
  for (double mult : mults) {
    for (int m = 0; m < n; ++m) {
      double e = sampson_sq(E_cur, p0[2 * m], p0[2 * m + 1], p1[2 * m],
                            p1[2 * m + 1]);
      w[m] = 1.0 / (1.0 + e / (thr_sq * mult));
    }
    eight_point(p0.data(), p1.data(), w.data(), n, E_cur);
    int n_new = count_inl(E_cur);
    if (n_new >= n_fin) {
      n_fin = n_new;
      E_fin = E_cur;
    }
  }

  int n_inl = 0;
  for (int m = 0; m < n; ++m) {
    bool ok = sampson_sq(E_fin, p0[2 * m], p0[2 * m + 1], p1[2 * m],
                         p1[2 * m + 1]) < thr_sq;
    inlier_mask[m] = ok ? 1 : 0;
    n_inl += ok;
  }
  Mat3 R;
  double t[3];
  decompose_and_vote(E_fin, p0.data(), p1.data(), inlier_mask, n, R, t);
  std::memcpy(R_out, R.m, sizeof(double) * 9);
  std::memcpy(t_out, t, sizeof(double) * 3);
  return n_inl;
}

}  // extern "C"
