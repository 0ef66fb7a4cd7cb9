// Isosurface extraction core for density-grid → mesh export.
//
// TPU-native replacement for the reference's CUDA mesh path
// (instant-ngp src/marching_cubes.cu: density grid → triangles, default
// 256^3 @ threshold 2.5): the density grid is produced on the TPU
// (NGPEngine.density_grid); this host-side core turns it into a triangle
// mesh. Uses marching tetrahedra (6-tet cube decomposition) — same
// watertight isosurface as marching cubes without the 256-case tables —
// with per-edge vertex interpolation. OpenMP-parallel over Z-slabs.
//
// C ABI (ctypes): mesh_extract() fills caller-inspectable buffers the
// library allocates; mesh_free() releases them.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Mesh {
  std::vector<float> verts;  // xyz triples
  std::vector<int32_t> tris; // index triples
};

// The 6 tetrahedra of a cube, as corner ids (0..7, x + 2*y + 4*z order).
constexpr int kTets[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

constexpr int kCornerOff[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

inline void edge_vertex(const float *p0, const float *p1, float v0, float v1,
                        float iso, float *out) {
  float t = (iso - v0) / (v1 - v0 + 1e-30f);
  if (t < 0.f) t = 0.f;
  if (t > 1.f) t = 1.f;
  for (int k = 0; k < 3; ++k) out[k] = p0[k] + t * (p1[k] - p0[k]);
}

// Emit triangles for one tetrahedron. corners: 4x(pos3+val).
void do_tet(const float pos[4][3], const float val[4], float iso, Mesh &m) {
  int code = 0;
  for (int i = 0; i < 4; ++i)
    if (val[i] > iso) code |= (1 << i);
  if (code == 0 || code == 15) return;

  // Edges of a tet: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
  static const int E[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
  // For each sign code, the cut edges forming 1 or 2 triangles (fan order).
  static const int kTris[16][7] = {
      {-1},                    // 0000
      {0, 2, 1, -1},           // 0001: v0 inside-ish
      {0, 3, 4, -1},           // 0010
      {1, 2, 3, 3, 2, 4, -1},  // 0011
      {1, 3, 5, -1},           // 0100
      {0, 2, 3, 3, 2, 5, -1},  // 0101
      {0, 1, 5, 0, 5, 4, -1},  // 0110
      {2, 4, 5, -1},           // 0111
      {2, 5, 4, -1},           // 1000 (complement of 0111)
      {0, 5, 1, 0, 4, 5, -1},  // 1001
      {0, 3, 2, 3, 5, 2, -1},  // 1010
      {1, 5, 3, -1},           // 1011
      {1, 4, 2, 2, 4, 3, -1},  // 1100 -> complement of 0011
      {0, 4, 3, -1},           // 1101
      {0, 1, 2, -1},           // 1110
      {-1},                    // 1111
  };

  float ev[6][3];
  bool have[6] = {false, false, false, false, false, false};
  const int *seq = kTris[code];
  int32_t base_ids[6];
  for (int i = 0; seq[i] >= 0; i += 3) {
    int32_t ids[3];
    for (int k = 0; k < 3; ++k) {
      int e = seq[i + k];
      if (!have[e]) {
        edge_vertex(pos[E[e][0]], pos[E[e][1]], val[E[e][0]], val[E[e][1]],
                    iso, ev[e]);
        have[e] = true;
        base_ids[e] = (int32_t)(m.verts.size() / 3);
        m.verts.insert(m.verts.end(), ev[e], ev[e] + 3);
      }
      ids[k] = base_ids[e];
    }
    m.tris.insert(m.tris.end(), ids, ids + 3);
  }
}

} // namespace

extern "C" {

// grid: nx*ny*nz floats, C order (z fastest? -> we treat index = (x*ny + y)*nz + z).
// bounds: xyz min then xyz max (vertex coordinates mapped into this box).
// Returns 0 on success. Caller must mesh_free() the two buffers.
int mesh_extract(const float *grid, int nx, int ny, int nz, float iso,
                 const float *bounds, float **out_verts, int64_t *n_verts,
                 int32_t **out_tris, int64_t *n_tris) {
  if (nx < 2 || ny < 2 || nz < 2) return 1;
  const float *lo = bounds, *hi = bounds + 3;
  float scale[3] = {(hi[0] - lo[0]) / (nx - 1), (hi[1] - lo[1]) / (ny - 1),
                    (hi[2] - lo[2]) / (nz - 1)};

  int nthreads = 1;
#ifdef _OPENMP
#pragma omp parallel
  {
#pragma omp single
    nthreads = omp_get_num_threads();
  }
#endif
  std::vector<Mesh> parts((size_t)(nx - 1));

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int x = 0; x < nx - 1; ++x) {
    Mesh &m = parts[(size_t)x];
    for (int y = 0; y < ny - 1; ++y) {
      for (int z = 0; z < nz - 1; ++z) {
        float cpos[8][3];
        float cval[8];
        bool above = false, below = false;
        for (int c = 0; c < 8; ++c) {
          int cx = x + kCornerOff[c][0];
          int cy = y + kCornerOff[c][1];
          int cz = z + kCornerOff[c][2];
          cval[c] = grid[((size_t)cx * ny + cy) * nz + cz];
          cpos[c][0] = lo[0] + cx * scale[0];
          cpos[c][1] = lo[1] + cy * scale[1];
          cpos[c][2] = lo[2] + cz * scale[2];
          (cval[c] > iso ? above : below) = true;
        }
        if (!above || !below) continue;
        for (const auto &tet : kTets) {
          float tpos[4][3];
          float tval[4];
          for (int i = 0; i < 4; ++i) {
            std::memcpy(tpos[i], cpos[tet[i]], sizeof(float) * 3);
            tval[i] = cval[tet[i]];
          }
          do_tet(tpos, tval, iso, m);
        }
      }
    }
  }

  size_t tot_v = 0, tot_t = 0;
  for (auto &m : parts) {
    tot_v += m.verts.size();
    tot_t += m.tris.size();
  }
  float *verts = (float *)std::malloc(tot_v * sizeof(float));
  int32_t *tris = (int32_t *)std::malloc(tot_t * sizeof(int32_t));
  if (!verts || !tris) {
    std::free(verts);
    std::free(tris);
    return 2;
  }
  size_t vo = 0, to = 0;
  for (auto &m : parts) {
    std::memcpy(verts + vo, m.verts.data(), m.verts.size() * sizeof(float));
    int32_t off = (int32_t)(vo / 3);
    for (size_t i = 0; i < m.tris.size(); ++i)
      tris[to + i] = m.tris[i] + off;
    vo += m.verts.size();
    to += m.tris.size();
  }
  *out_verts = verts;
  *n_verts = (int64_t)(tot_v / 3);
  *out_tris = tris;
  *n_tris = (int64_t)(tot_t / 3);
  (void)nthreads;
  return 0;
}

void mesh_free(void *p) { std::free(p); }

} // extern "C"
