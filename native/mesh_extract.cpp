// Isosurface extraction core for density-grid → mesh export.
//
// TPU-native replacement for the reference's CUDA mesh path
// (instant-ngp src/marching_cubes.cu: density grid → triangles, default
// 256^3 @ threshold 2.5): the density grid is produced on the TPU
// (NGPEngine.density_grid); this host-side core turns it into a triangle
// mesh. Uses marching tetrahedra (6-tet cube decomposition) — same
// watertight isosurface as marching cubes without the 256-case tables;
// NOTE the tessellation differs from the reference's marching cubes (MT
// emits up to 12 tris/cell vs MC's ~4, so tri counts are not comparable
// across the two for the same surface).
//
// Vertices are WELDED GLOBALLY, like the reference's marching_cubes.cu
// output (cell 28: 2.70M verts / 5.17M tris ≈ V=T/2, the Euler ratio of
// an indexed closed mesh): every emitted vertex lies on a unique lattice
// edge (a pair of global grid corners), so vertices are deduplicated by
// the canonical (lo_corner, hi_corner) key. The uniform 6-tet split is
// face-consistent across neighboring cubes (the shared-face diagonals
// coincide), so welding by corner-pair key produces a crack-free indexed
// mesh with V ≈ T/2 and no duplicate vertices.
//
// Parallel layout: phase A marches x-slabs independently (OpenMP), each
// welding within its own hash map; phase B stitches slabs sequentially,
// remapping each slab's low-plane vertices onto the previous slab's
// high-plane vertices by edge key (only plane-resident edges can be
// shared across slabs). O(V) merge, no global lock.
//
// C ABI (ctypes): mesh_extract() fills caller-inspectable buffers the
// library allocates; mesh_free() releases them.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// The 6 tetrahedra of a cube, as corner ids (0..7).
constexpr int kTets[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

constexpr int kCornerOff[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

// Edges of a tet: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
constexpr int kTetEdges[6][2] = {{0, 1}, {0, 2}, {0, 3},
                                 {1, 2}, {1, 3}, {2, 3}};

// For each sign code, the cut edges forming 1 or 2 triangles (fan order).
constexpr int kTriTable[16][7] = {
    {-1},                    // 0000
    {0, 2, 1, -1},           // 0001
    {0, 3, 4, -1},           // 0010
    {1, 2, 3, 3, 2, 4, -1},  // 0011
    {1, 3, 5, -1},           // 0100
    {0, 2, 3, 3, 2, 5, -1},  // 0101
    {0, 1, 5, 0, 5, 4, -1},  // 0110
    {2, 4, 5, -1},           // 0111
    {2, 5, 4, -1},           // 1000
    {0, 5, 1, 0, 4, 5, -1},  // 1001
    {0, 3, 2, 3, 5, 2, -1},  // 1010
    {1, 5, 3, -1},           // 1011
    {1, 3, 2, 3, 4, 2, -1},  // 1100 (complement of 0011; the old
                             // {1,4,2, 2,4,3} entry double-covered
                             // perimeter edge e4-e2 and left e1-e3 open)
    {0, 4, 3, -1},           // 1101
    {0, 1, 2, -1},           // 1110
    {-1},                    // 1111
};

struct SlabMesh {
  std::vector<float> verts;     // xyz triples, slab-welded
  std::vector<uint64_t> keys;   // canonical lattice-edge key per vertex
  std::vector<uint8_t> plane;   // 0 interior, 1 low plane (x), 2 high (x+1)
  std::vector<int32_t> tris;    // slab-local index triples
};

} // namespace

extern "C" {

// grid: nx*ny*nz floats, index = (x*ny + y)*nz + z.
// bounds: xyz min then xyz max (vertex coordinates mapped into this box).
// Output mesh is indexed with globally welded (shared) vertices.
// Returns 0 on success. Caller must mesh_free() the two buffers.
int mesh_extract(const float *grid, int nx, int ny, int nz, float iso,
                 const float *bounds, float **out_verts, int64_t *n_verts,
                 int32_t **out_tris, int64_t *n_tris) {
  if (nx < 2 || ny < 2 || nz < 2) return 1;
  const float *lo = bounds, *hi = bounds + 3;
  const float scale[3] = {(hi[0] - lo[0]) / (nx - 1),
                          (hi[1] - lo[1]) / (ny - 1),
                          (hi[2] - lo[2]) / (nz - 1)};

  std::vector<SlabMesh> parts((size_t)(nx - 1));

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int x = 0; x < nx - 1; ++x) {
    SlabMesh &m = parts[(size_t)x];
    std::unordered_map<uint64_t, int32_t> edge2loc;
    edge2loc.reserve(4096);

    for (int y = 0; y < ny - 1; ++y) {
      for (int z = 0; z < nz - 1; ++z) {
        float cval[8];
        uint32_t cgid[8];
        int cgx[8];
        bool above = false, below = false;
        for (int c = 0; c < 8; ++c) {
          const int cx = x + kCornerOff[c][0];
          const int cy = y + kCornerOff[c][1];
          const int cz = z + kCornerOff[c][2];
          cval[c] = grid[((size_t)cx * ny + cy) * nz + cz];
          cgid[c] = (uint32_t)(((size_t)cx * ny + cy) * nz + cz);
          cgx[c] = cx;
          (cval[c] > iso ? above : below) = true;
        }
        if (!above || !below) continue;

        for (const auto &tet : kTets) {
          int code = 0;
          for (int i = 0; i < 4; ++i)
            if (cval[tet[i]] > iso) code |= (1 << i);
          const int *seq = kTriTable[code];
          if (seq[0] < 0) continue;

          int32_t eid[6];
          bool have[6] = {false, false, false, false, false, false};
          for (int i = 0; seq[i] >= 0; i += 3) {
            int32_t ids[3];
            for (int k = 0; k < 3; ++k) {
              const int e = seq[i + k];
              if (!have[e]) {
                // Canonical endpoints: lower global id first, so every
                // cell/tet touching this lattice edge computes the same
                // key AND the same interpolated position.
                int ca = tet[kTetEdges[e][0]], cb = tet[kTetEdges[e][1]];
                if (cgid[ca] > cgid[cb]) { const int t = ca; ca = cb; cb = t; }
                const uint64_t key =
                    ((uint64_t)cgid[ca] << 32) | (uint64_t)cgid[cb];
                auto it = edge2loc.find(key);
                if (it != edge2loc.end()) {
                  eid[e] = it->second;
                } else {
                  const float va = cval[ca], vb = cval[cb];
                  float t = (iso - va) / (vb - va + 1e-30f);
                  if (t < 0.f) t = 0.f;
                  if (t > 1.f) t = 1.f;
                  // Decode endpoint lattice coords from the global id.
                  const uint32_t ga = cgid[ca], gb = cgid[cb];
                  const int ax = (int)(ga / ((uint32_t)ny * nz));
                  const int ay = (int)((ga / (uint32_t)nz) % (uint32_t)ny);
                  const int az = (int)(ga % (uint32_t)nz);
                  const int bx = (int)(gb / ((uint32_t)ny * nz));
                  const int by = (int)((gb / (uint32_t)nz) % (uint32_t)ny);
                  const int bz = (int)(gb % (uint32_t)nz);
                  const float px = lo[0] + (ax + t * (bx - ax)) * scale[0];
                  const float py = lo[1] + (ay + t * (by - ay)) * scale[1];
                  const float pz = lo[2] + (az + t * (bz - az)) * scale[2];
                  const int32_t idx = (int32_t)(m.keys.size());
                  m.verts.push_back(px);
                  m.verts.push_back(py);
                  m.verts.push_back(pz);
                  m.keys.push_back(key);
                  uint8_t pl = 0;
                  if (cgx[ca] == x && cgx[cb] == x) pl = 1;
                  else if (cgx[ca] == x + 1 && cgx[cb] == x + 1) pl = 2;
                  m.plane.push_back(pl);
                  edge2loc.emplace(key, idx);
                  eid[e] = idx;
                }
                have[e] = true;
              }
              ids[k] = eid[e];
            }
            m.tris.insert(m.tris.end(), ids, ids + 3);
          }
        }
      }
    }
  }

  // Phase B: stitch slabs. A vertex can be shared across slabs only if its
  // lattice edge lies entirely in the boundary plane; slab x's high-plane
  // (x+1) edges are exactly slab x+1's low-plane edges.
  size_t cap_v = 0, cap_t = 0;
  for (auto &m : parts) {
    cap_v += m.keys.size();
    cap_t += m.tris.size();
  }
  float *verts = (float *)std::malloc(cap_v * 3 * sizeof(float));
  int32_t *tris = (int32_t *)std::malloc(cap_t * sizeof(int32_t));
  if ((cap_v && !verts) || (cap_t && !tris)) {
    std::free(verts);
    std::free(tris);
    return 2;
  }

  std::unordered_map<uint64_t, int32_t> carry, carry_next;
  std::vector<int32_t> remap;
  size_t nv = 0, nt = 0;
  for (auto &m : parts) {
    const size_t lv = m.keys.size();
    remap.assign(lv, -1);
    carry_next.clear();
    for (size_t i = 0; i < lv; ++i) {
      int32_t gid = -1;
      if (m.plane[i] == 1) {
        auto it = carry.find(m.keys[i]);
        if (it != carry.end()) gid = it->second;
      }
      if (gid < 0) {
        gid = (int32_t)nv;
        std::memcpy(verts + nv * 3, m.verts.data() + i * 3,
                    3 * sizeof(float));
        ++nv;
      }
      if (m.plane[i] == 2) carry_next.emplace(m.keys[i], gid);
      remap[i] = gid;
    }
    for (size_t i = 0; i < m.tris.size(); ++i)
      tris[nt + i] = remap[(size_t)m.tris[i]];
    nt += m.tris.size();
    carry.swap(carry_next);
    // Free slab memory as we go — peak RSS stays ~one slab + output.
    std::vector<float>().swap(m.verts);
    std::vector<uint64_t>().swap(m.keys);
    std::vector<uint8_t>().swap(m.plane);
    std::vector<int32_t>().swap(m.tris);
  }

  *out_verts = verts;
  *n_verts = (int64_t)nv;
  *out_tris = tris;
  *n_tris = (int64_t)(nt / 3);
  return 0;
}

void mesh_free(void *p) { std::free(p); }

} // extern "C"
