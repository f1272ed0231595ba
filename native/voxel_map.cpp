// Native voxel hash map + plane-ICP residual construction.
//
// C++ twin of the latency-critical CPU structures of the reference
// (include/liw/cloudMap.h voxelHashMap, src/liw/optimize.cpp
// searchNeighbors:353-418, buildPlaneResiduals:18-134,
// computeNeighborhoodDistribution:308-343, lioOptimization.cpp
// addPointToMap:556-598) — the pieces the reference keeps in C++ because
// they run per-keypoint inside the IEKF loop at sweep rate. Exposed as a
// plain C ABI for ctypes (no pybind11 in this toolchain).
//
// Build: g++ -O3 -march=native -shared -fPIC voxel_map.cpp -o libgslivm_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

static inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double norm(const Vec3& a) { return std::sqrt(dot(a, a)); }

// voxel key: trunc(p / size) per axis packed into 64 bits (21 bits/axis)
static inline int64_t pack_key(double x, double y, double z, double inv_size) {
  const int64_t kx = (int64_t)std::trunc(x * inv_size);
  const int64_t ky = (int64_t)std::trunc(y * inv_size);
  const int64_t kz = (int64_t)std::trunc(z * inv_size);
  return ((kx & 0x1FFFFF) << 42) | ((ky & 0x1FFFFF) << 21) | (kz & 0x1FFFFF);
}
static inline int64_t pack_ikey(int64_t kx, int64_t ky, int64_t kz) {
  return ((kx & 0x1FFFFF) << 42) | ((ky & 0x1FFFFF) << 21) | (kz & 0x1FFFFF);
}

struct VoxelMap {
  double size;
  double inv_size;
  int max_points;
  double min_distance2;
  std::unordered_map<int64_t, std::vector<Vec3>> voxels;
};

// Symmetric 3x3 eigen-decomposition (analytic, ascending eigenvalues).
// Returns eigenvalues w[3] and eigenvectors as columns of V (row-major).
static void eigh3(const double A[6], double w[3], double V[9]) {
  // A packed: xx, xy, xz, yy, yz, zz
  const double a = A[0], b = A[3], c = A[5], d = A[1], e = A[4], f = A[2];
  const double p1 = d * d + f * f + e * e;
  if (p1 < 1e-30) {  // diagonal
    double vals[3] = {a, b, c};
    int order[3] = {0, 1, 2};
    std::sort(order, order + 3, [&](int i, int j) { return vals[i] < vals[j]; });
    for (int k = 0; k < 3; k++) {
      w[k] = vals[order[k]];
      for (int r = 0; r < 3; r++) V[r * 3 + k] = (r == order[k]) ? 1.0 : 0.0;
    }
    return;
  }
  const double q = (a + b + c) / 3.0;
  const double p2 =
      (a - q) * (a - q) + (b - q) * (b - q) + (c - q) * (c - q) + 2.0 * p1;
  const double p = std::sqrt(p2 / 6.0);
  // B = (A - q I) / p
  const double B[6] = {(a - q) / p, d / p, f / p, (b - q) / p, e / p, (c - q) / p};
  const double detB =
      B[0] * (B[3] * B[5] - B[4] * B[4]) - B[1] * (B[1] * B[5] - B[4] * B[2]) +
      B[2] * (B[1] * B[4] - B[3] * B[2]);
  double r = detB / 2.0;
  r = std::max(-1.0, std::min(1.0, r));
  const double phi = std::acos(r) / 3.0;
  w[2] = q + 2.0 * p * std::cos(phi);
  w[0] = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);
  w[1] = 3.0 * q - w[0] - w[2];

  // eigenvectors: for each eigenvalue, v = cross of two rows of (A - w I)
  for (int k = 0; k < 3; k++) {
    const double M[3][3] = {
        {a - w[k], d, f}, {d, b - w[k], e}, {f, e, c - w[k]}};
    Vec3 r0{M[0][0], M[0][1], M[0][2]};
    Vec3 r1{M[1][0], M[1][1], M[1][2]};
    Vec3 r2{M[2][0], M[2][1], M[2][2]};
    Vec3 c0 = cross(r0, r1), c1 = cross(r0, r2), c2 = cross(r1, r2);
    double n0 = dot(c0, c0), n1 = dot(c1, c1), n2 = dot(c2, c2);
    Vec3 v = c0;
    double nmax = n0;
    if (n1 > nmax) { v = c1; nmax = n1; }
    if (n2 > nmax) { v = c2; nmax = n2; }
    double nv = std::sqrt(dot(v, v));
    if (nv < 1e-20) {  // degenerate: fall back to any unit vector orthogonal
      v = {1, 0, 0};
      nv = 1;
    }
    V[0 * 3 + k] = v.x / nv;
    V[1 * 3 + k] = v.y / nv;
    V[2 * 3 + k] = v.z / nv;
  }
}

}  // namespace

extern "C" {

void* vmap_create(double voxel_size, int max_points, double min_distance) {
  auto* m = new VoxelMap();
  m->size = voxel_size;
  m->inv_size = 1.0 / voxel_size;
  m->max_points = max_points;
  m->min_distance2 = min_distance * min_distance;
  return m;
}

void vmap_destroy(void* h) { delete (VoxelMap*)h; }

long vmap_size(void* h) {
  auto* m = (VoxelMap*)h;
  long n = 0;
  for (auto& kv : m->voxels) n += (long)kv.second.size();
  return n;
}

// addPointToMap rules (lioOptimization.cpp:556-598)
void vmap_add_points(void* h, const double* pts, long n, int min_num_points) {
  auto* m = (VoxelMap*)h;
  for (long i = 0; i < n; i++) {
    const Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    const int64_t key = pack_key(p.x, p.y, p.z, m->inv_size);
    auto it = m->voxels.find(key);
    if (it == m->voxels.end()) {
      if (min_num_points <= 0) m->voxels[key].push_back(p);
      continue;
    }
    auto& block = it->second;
    if ((int)block.size() >= m->max_points) continue;
    double best = 1e30;
    for (const auto& q : block) {
      const Vec3 d = sub(q, p);
      best = std::min(best, dot(d, d));
    }
    if (best > m->min_distance2) {
      if (min_num_points <= 0 || (int)block.size() >= min_num_points)
        block.push_back(p);
    }
  }
}

void vmap_remove_far(void* h, const double* center, double max_distance) {
  auto* m = (VoxelMap*)h;
  const Vec3 c{center[0], center[1], center[2]};
  const double md2 = max_distance * max_distance;
  for (auto it = m->voxels.begin(); it != m->voxels.end();) {
    const Vec3 d = sub(it->second.front(), c);
    if (dot(d, d) > md2)
      it = m->voxels.erase(it);
    else
      ++it;
  }
}

// searchNeighbors (optimize.cpp:353-418) batched over queries.
// out_pts: [nq * max_nb * 3], out_counts: [nq]; neighbors sorted ascending.
void vmap_knn(void* h, const double* queries, long nq, int nb_voxels,
              int max_nb, int threshold_capacity, double* out_pts,
              long* out_counts) {
  auto* m = (VoxelMap*)h;
  std::vector<std::pair<double, Vec3>> cand;
  for (long qi = 0; qi < nq; qi++) {
    const Vec3 q{queries[3 * qi], queries[3 * qi + 1], queries[3 * qi + 2]};
    const int64_t kx = (int64_t)std::trunc(q.x * m->inv_size);
    const int64_t ky = (int64_t)std::trunc(q.y * m->inv_size);
    const int64_t kz = (int64_t)std::trunc(q.z * m->inv_size);
    cand.clear();
    for (int64_t dx = -nb_voxels; dx <= nb_voxels; dx++)
      for (int64_t dy = -nb_voxels; dy <= nb_voxels; dy++)
        for (int64_t dz = -nb_voxels; dz <= nb_voxels; dz++) {
          auto it = m->voxels.find(pack_ikey(kx + dx, ky + dy, kz + dz));
          if (it == m->voxels.end()) continue;
          if ((int)it->second.size() < threshold_capacity) continue;
          for (const auto& p : it->second) {
            const Vec3 d = sub(p, q);
            cand.emplace_back(dot(d, d), p);
          }
        }
    const long k = std::min((long)cand.size(), (long)max_nb);
    std::partial_sort(cand.begin(), cand.begin() + k, cand.end(),
                      [](const auto& a, const auto& b) { return a.first < b.first; });
    out_counts[qi] = k;
    for (long j = 0; j < k; j++) {
      out_pts[(qi * max_nb + j) * 3 + 0] = cand[j].second.x;
      out_pts[(qi * max_nb + j) * 3 + 1] = cand[j].second.y;
      out_pts[(qi * max_nb + j) * 3 + 2] = cand[j].second.z;
    }
  }
}

// buildPlaneResiduals (optimize.cpp:18-134): the whole IEKF measurement
// construction in one native call. Returns the residual count; fills
// H_out [max_residuals * 6] and h_out [max_residuals].
long vmap_build_plane_residuals(
    void* h, const double* keypoints_loc, long nk, const double* R_rowmajor,
    const double* t, const double* last_t, int nb_voxels,
    int threshold_capacity, int max_neighbors, int min_neighbors,
    double power_planarity, double max_dist, double w_alpha, double w_neigh,
    long max_residuals, double* H_out, double* h_out) {
  auto* m = (VoxelMap*)h;
  const double lsum = std::fabs(w_alpha) + std::fabs(w_neigh);
  const double lam_w = std::fabs(w_alpha) / lsum;
  const double lam_n = std::fabs(w_neigh) / lsum;

  const double* R = R_rowmajor;
  std::vector<std::pair<double, Vec3>> cand;
  long out = 0;

  for (long i = 0; i < nk && out < max_residuals; i++) {
    const Vec3 loc{keypoints_loc[3 * i], keypoints_loc[3 * i + 1],
                   keypoints_loc[3 * i + 2]};
    const Vec3 wp{R[0] * loc.x + R[1] * loc.y + R[2] * loc.z + t[0],
                  R[3] * loc.x + R[4] * loc.y + R[5] * loc.z + t[1],
                  R[6] * loc.x + R[7] * loc.y + R[8] * loc.z + t[2]};

    // kNN
    const int64_t kx = (int64_t)std::trunc(wp.x * m->inv_size);
    const int64_t ky = (int64_t)std::trunc(wp.y * m->inv_size);
    const int64_t kz = (int64_t)std::trunc(wp.z * m->inv_size);
    cand.clear();
    for (int64_t dx = -nb_voxels; dx <= nb_voxels; dx++)
      for (int64_t dy = -nb_voxels; dy <= nb_voxels; dy++)
        for (int64_t dz = -nb_voxels; dz <= nb_voxels; dz++) {
          auto it = m->voxels.find(pack_ikey(kx + dx, ky + dy, kz + dz));
          if (it == m->voxels.end()) continue;
          if ((int)it->second.size() < threshold_capacity) continue;
          for (const auto& p : it->second) {
            const Vec3 d = sub(p, wp);
            cand.emplace_back(dot(d, d), p);
          }
        }
    if ((long)cand.size() < min_neighbors) continue;
    const long k = std::min((long)cand.size(), (long)max_neighbors);
    std::partial_sort(cand.begin(), cand.begin() + k, cand.end(),
                      [](const auto& a, const auto& b) { return a.first < b.first; });

    // PCA plane (computeNeighborhoodDistribution)
    Vec3 bary{0, 0, 0};
    for (long j = 0; j < k; j++) {
      bary.x += cand[j].second.x;
      bary.y += cand[j].second.y;
      bary.z += cand[j].second.z;
    }
    bary.x /= k; bary.y /= k; bary.z /= k;
    double C[6] = {0, 0, 0, 0, 0, 0};  // xx, xy, xz, yy, yz, zz
    for (long j = 0; j < k; j++) {
      const Vec3 d = sub(cand[j].second, bary);
      C[0] += d.x * d.x; C[1] += d.x * d.y; C[2] += d.x * d.z;
      C[3] += d.y * d.y; C[4] += d.y * d.z; C[5] += d.z * d.z;
    }
    double w[3], V[9];
    eigh3(C, w, V);
    Vec3 normal{V[0], V[3], V[6]};  // eigenvector of smallest eigenvalue
    const double s1 = std::sqrt(std::fabs(w[2]));
    const double s2 = std::sqrt(std::fabs(w[1]));
    const double s3 = std::sqrt(std::fabs(w[0]));
    const double a2d = (s2 - s3) / std::max(s1, 1e-12);

    // flip toward the last position (buildPlaneResiduals:49-52)
    const Vec3 to_last = sub({last_t[0], last_t[1], last_t[2]}, loc);
    if (dot(normal, to_last) < 0) normal = {-normal.x, -normal.y, -normal.z};

    const double planarity = std::pow(a2d, power_planarity);
    const Vec3 d0 = sub(cand[0].second, wp);
    const double weight =
        lam_w * planarity +
        lam_n * std::exp(-std::sqrt(dot(d0, d0)) / (max_dist * min_neighbors));

    const double offset = -dot(normal, cand[0].second);
    const double dist = dot(normal, wp) + offset;
    if (dist < max_dist) {
      // jacobian [n^T, -n^T R [loc]_x] * weight
      H_out[out * 6 + 0] = normal.x * weight;
      H_out[out * 6 + 1] = normal.y * weight;
      H_out[out * 6 + 2] = normal.z * weight;
      // nR = n^T R
      const double nR0 = normal.x * R[0] + normal.y * R[3] + normal.z * R[6];
      const double nR1 = normal.x * R[1] + normal.y * R[4] + normal.z * R[7];
      const double nR2 = normal.x * R[2] + normal.y * R[5] + normal.z * R[8];
      // -(nR x loc-skew): -(nR)^T [loc]_x = cross(loc, nR)... expand:
      // [loc]_x = [[0,-z,y],[z,0,-x],[-y,x,0]]; row vector nR times it:
      H_out[out * 6 + 3] = -(nR1 * loc.z - nR2 * loc.y) * weight;
      H_out[out * 6 + 4] = -(nR2 * loc.x - nR0 * loc.z) * weight;
      H_out[out * 6 + 5] = -(nR0 * loc.y - nR1 * loc.x) * weight;
      h_out[out] = dist * weight;
      out++;
    }
  }
  return out;
}

}  // extern "C"
