// Host-side point-cloud preprocessing: kNN-PCA normal estimation and
// voxel-grid downsampling.
//
// Native replacement for the reference's open3d preprocessing
// (/root/reference/script/create_hdf5.py:130-165: estimate_normals with
// radius 0.6 / 30-NN oriented toward the sensor, and voxel_down_sample).
// Uses a spatial grid hash (cell = radius) instead of a KD-tree: O(1)
// neighbor candidate lookup, multi-threaded over points.
//
// Build: make -C native   (produces libprep.so; loaded via ctypes from
// rslo_tpu/data/normals.py)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
  int32_t x, y, z;
  bool operator==(const CellKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct CellHash {
  size_t operator()(const CellKey& k) const {
    // large-prime mix; grids are a few hundred cells per axis
    return static_cast<size_t>(k.x) * 73856093u ^
           static_cast<size_t>(k.y) * 19349663u ^
           static_cast<size_t>(k.z) * 83492791u;
  }
};

using Grid = std::unordered_map<CellKey, std::vector<int>, CellHash>;

Grid build_grid(const float* xyz, int n, float cell) {
  Grid grid;
  grid.reserve(n / 4 + 1);
  for (int i = 0; i < n; ++i) {
    CellKey k{static_cast<int32_t>(std::floor(xyz[3 * i + 0] / cell)),
              static_cast<int32_t>(std::floor(xyz[3 * i + 1] / cell)),
              static_cast<int32_t>(std::floor(xyz[3 * i + 2] / cell))};
    grid[k].push_back(i);
  }
  return grid;
}

// Smallest eigenvector of a symmetric 3x3 matrix via one sweep of
// inverse-power-free analytic computation: compute eigenvalues with the
// trigonometric formula, then the eigenvector by cross products.
void smallest_eigenvector(const double C[6], float out[3]) {
  // C packs [xx, xy, xz, yy, yz, zz]
  const double a = C[0], b = C[3], c = C[5];
  const double d = C[1], e = C[4], f = C[2];
  const double p1 = d * d + f * f + e * e;
  double nx, ny, nz;
  if (p1 < 1e-18) {  // already diagonal: pick axis of min diagonal
    nx = (a <= b && a <= c) ? 1.0 : 0.0;
    ny = (b < a && b <= c) ? 1.0 : 0.0;
    nz = (nx == 0.0 && ny == 0.0) ? 1.0 : 0.0;
  } else {
    const double q = (a + b + c) / 3.0;
    const double p2 = (a - q) * (a - q) + (b - q) * (b - q) +
                      (c - q) * (c - q) + 2.0 * p1;
    const double p = std::sqrt(p2 / 6.0);
    // B = (C - q I) / p ; r = det(B)/2 clamped to [-1, 1]
    const double b00 = (a - q) / p, b11 = (b - q) / p, b22 = (c - q) / p;
    const double b01 = d / p, b02 = f / p, b12 = e / p;
    double r = b00 * (b11 * b22 - b12 * b12) -
               b01 * (b01 * b22 - b12 * b02) +
               b02 * (b01 * b12 - b11 * b02);
    r *= 0.5;
    r = std::max(-1.0, std::min(1.0, r));
    const double phi = std::acos(r) / 3.0;
    // smallest eigenvalue
    const double eig = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);
    // eigenvector: cross of two rows of (C - eig I)
    const double r0[3] = {a - eig, d, f};
    const double r1[3] = {d, b - eig, e};
    const double r2[3] = {f, e, c - eig};
    double v0[3] = {r0[1] * r1[2] - r0[2] * r1[1],
                    r0[2] * r1[0] - r0[0] * r1[2],
                    r0[0] * r1[1] - r0[1] * r1[0]};
    double v1[3] = {r0[1] * r2[2] - r0[2] * r2[1],
                    r0[2] * r2[0] - r0[0] * r2[2],
                    r0[0] * r2[1] - r0[1] * r2[0]};
    double v2[3] = {r1[1] * r2[2] - r1[2] * r2[1],
                    r1[2] * r2[0] - r1[0] * r2[2],
                    r1[0] * r2[1] - r1[1] * r2[0]};
    const double n0 = v0[0] * v0[0] + v0[1] * v0[1] + v0[2] * v0[2];
    const double n1 = v1[0] * v1[0] + v1[1] * v1[1] + v1[2] * v1[2];
    const double n2 = v2[0] * v2[0] + v2[1] * v2[1] + v2[2] * v2[2];
    const double* best = v0;
    double bn = n0;
    if (n1 > bn) { best = v1; bn = n1; }
    if (n2 > bn) { best = v2; bn = n2; }
    nx = best[0]; ny = best[1]; nz = best[2];
  }
  const double norm = std::sqrt(nx * nx + ny * ny + nz * nz);
  if (norm > 1e-12) {
    out[0] = static_cast<float>(nx / norm);
    out[1] = static_cast<float>(ny / norm);
    out[2] = static_cast<float>(nz / norm);
  } else {
    out[0] = 0.f; out[1] = 0.f; out[2] = 1.f;
  }
}

}  // namespace

extern "C" {

// xyz: (n, 3) float32; out: (n, 3) float32 unit normals oriented toward
// the origin (sensor).
void estimate_normals(const float* xyz, int n, float radius, int k,
                      float* out) {
  const float cell = radius;
  const float r2 = radius * radius;
  Grid grid = build_grid(xyz, n, cell);

  int n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> threads;
  auto worker = [&](int t0, int t1) {
    std::vector<std::pair<float, int>> cand;
    for (int i = t0; i < t1; ++i) {
      const float px = xyz[3 * i], py = xyz[3 * i + 1],
                  pz = xyz[3 * i + 2];
      const int32_t cx = static_cast<int32_t>(std::floor(px / cell));
      const int32_t cy = static_cast<int32_t>(std::floor(py / cell));
      const int32_t cz = static_cast<int32_t>(std::floor(pz / cell));
      cand.clear();
      for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
          for (int dz = -1; dz <= 1; ++dz) {
            auto it = grid.find(CellKey{cx + dx, cy + dy, cz + dz});
            if (it == grid.end()) continue;
            for (int j : it->second) {
              const float ddx = xyz[3 * j] - px;
              const float ddy = xyz[3 * j + 1] - py;
              const float ddz = xyz[3 * j + 2] - pz;
              const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
              if (d2 <= r2) cand.emplace_back(d2, j);
            }
          }
      int kk = std::min<int>(k, cand.size());
      if (kk > 0 && static_cast<int>(cand.size()) > kk)
        std::nth_element(cand.begin(), cand.begin() + kk, cand.end());
      // covariance of the kk nearest
      double mx = 0, my = 0, mz = 0;
      for (int c = 0; c < kk; ++c) {
        const int j = cand[c].second;
        mx += xyz[3 * j]; my += xyz[3 * j + 1]; mz += xyz[3 * j + 2];
      }
      float nrm[3] = {0.f, 0.f, 1.f};
      if (kk >= 3) {
        mx /= kk; my /= kk; mz /= kk;
        double C[6] = {0, 0, 0, 0, 0, 0};  // xx, xy, xz, yy, yz, zz
        for (int c = 0; c < kk; ++c) {
          const int j = cand[c].second;
          const double ex = xyz[3 * j] - mx;
          const double ey = xyz[3 * j + 1] - my;
          const double ez = xyz[3 * j + 2] - mz;
          C[0] += ex * ex; C[1] += ex * ey; C[2] += ex * ez;
          C[3] += ey * ey; C[4] += ey * ez; C[5] += ez * ez;
        }
        smallest_eigenvector(C, nrm);
      }
      // orient toward sensor at origin
      if (nrm[0] * px + nrm[1] * py + nrm[2] * pz > 0) {
        nrm[0] = -nrm[0]; nrm[1] = -nrm[1]; nrm[2] = -nrm[2];
      }
      out[3 * i] = nrm[0]; out[3 * i + 1] = nrm[1];
      out[3 * i + 2] = nrm[2];
    }
  };
  const int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo < hi) threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// points: (n, f) float32 with xyz in cols 0:3 -> averaged per voxel of
// size `voxel`.  out must hold n*f floats; returns the number of output
// rows.
int voxel_downsample(const float* points, int n, int f, float voxel,
                     float* out) {
  Grid grid;
  grid.reserve(n / 4 + 1);
  for (int i = 0; i < n; ++i) {
    CellKey k{static_cast<int32_t>(std::floor(points[f * i] / voxel)),
              static_cast<int32_t>(std::floor(points[f * i + 1] / voxel)),
              static_cast<int32_t>(std::floor(points[f * i + 2] / voxel))};
    grid[k].push_back(i);
  }
  int row = 0;
  std::vector<double> acc(f);
  for (auto& kv : grid) {
    std::fill(acc.begin(), acc.end(), 0.0);
    for (int j : kv.second)
      for (int c = 0; c < f; ++c) acc[c] += points[f * j + c];
    for (int c = 0; c < f; ++c)
      out[f * row + c] = static_cast<float>(acc[c] / kv.second.size());
    ++row;
  }
  return row;
}

}  // extern "C"
