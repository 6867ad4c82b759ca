// Fast Wavefront OBJ ingestion for the TPU path tracer.
//
// Native replacement for the reference's vendored tiny_obj_loader.h parse
// path (apps/src/scene.cpp:38-131): parses v/vt/vn/f records, fan-triangulates
// polygons, resolves negative indices, and emits flat SoA triangle arrays
// ready for the device scene (v0/e1/e2 + per-vertex uv). Optionally reorders
// triangles along a Morton curve of their centroids so the renderer's
// chunk-streamed intersector sees spatially coherent chunks (the host-side
// half of the BVH story; the wide-BVH traversal lands on top of this order).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct V3 { float x, y, z; };
struct V2 { float u, v; };

struct Mesh {
  std::vector<float> tri_pos;   // 9 floats per tri (v0, v1, v2)
  std::vector<float> tri_uv;    // 6 floats per tri
  float aabb_min[3];
  float aabb_max[3];
};

inline int resolve(long idx, size_t count) {
  return idx > 0 ? static_cast<int>(idx - 1) : static_cast<int>(count + idx);
}

// Parse one face vertex token "v", "v/vt", "v//vn", "v/vt/vn".
inline void parse_face_token(const char* tok, long* v, long* vt, long* vn) {
  *v = strtol(tok, nullptr, 10);
  *vt = 0;
  *vn = 0;
  const char* s1 = strchr(tok, '/');
  if (!s1) return;
  if (s1[1] != '/') *vt = strtol(s1 + 1, nullptr, 10);
  const char* s2 = strchr(s1 + 1, '/');
  if (s2) *vn = strtol(s2 + 1, nullptr, 10);
}

uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

uint32_t morton3(float x, float y, float z) {
  // x,y,z normalized to [0,1]
  auto q = [](float f) {
    f = std::min(std::max(f * 1024.0f, 0.0f), 1023.0f);
    return expand_bits(static_cast<uint32_t>(f));
  };
  return (q(x) << 2) | (q(y) << 1) | q(z);
}

}  // namespace

extern "C" {

// Parses an OBJ file. Returns the triangle count (>= 0) or -1 on error.
// Output arrays are malloc'd; the caller frees them with obj_free_buffers.
// If morton_order != 0, triangles are sorted along a Morton curve of their
// centroids (spatially coherent chunk order for the streamed intersector).
long obj_parse(const char* path,
               int morton_order,
               float** out_tri_pos,   // [n, 3, 3]
               float** out_tri_uv,    // [n, 3, 2]
               float* out_aabb_min,   // [3]
               float* out_aabb_max) { // [3]
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  std::vector<V3> positions;
  std::vector<V2> texcoords;
  std::vector<long> face_v;   // flattened triangle vertex indices
  std::vector<long> face_vt;  // 0 = none (1-based otherwise)

  char line[8192];
  while (fgets(line, sizeof line, f)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == 'v' && s[1] == ' ') {
      V3 p;
      if (sscanf(s + 2, "%f %f %f", &p.x, &p.y, &p.z) == 3) positions.push_back(p);
    } else if (s[0] == 'v' && s[1] == 't' && s[2] == ' ') {
      V2 t;
      if (sscanf(s + 3, "%f %f", &t.u, &t.v) == 2) texcoords.push_back(t);
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      // tokenize face vertices
      long v[64], vt[64], vn[64];
      int nv = 0;
      char* tok = strtok(s + 2, " \t\r\n");
      while (tok && nv < 64) {
        parse_face_token(tok, &v[nv], &vt[nv], &vn[nv]);
        ++nv;
        tok = strtok(nullptr, " \t\r\n");
      }
      for (int i = 1; i + 1 < nv; ++i) {  // fan triangulation
        face_v.push_back(v[0]);
        face_v.push_back(v[i]);
        face_v.push_back(v[i + 1]);
        face_vt.push_back(vt[0]);
        face_vt.push_back(vt[i]);
        face_vt.push_back(vt[i + 1]);
      }
    }
  }
  fclose(f);

  const size_t n_tris = face_v.size() / 3;
  Mesh mesh;
  mesh.tri_pos.resize(n_tris * 9);
  mesh.tri_uv.assign(n_tris * 6, 0.0f);
  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};

  for (size_t t = 0; t < n_tris; ++t) {
    for (int k = 0; k < 3; ++k) {
      long vi = face_v[t * 3 + k];
      if (vi == 0) continue;
      const V3& p = positions[resolve(vi, positions.size())];
      mesh.tri_pos[t * 9 + k * 3 + 0] = p.x;
      mesh.tri_pos[t * 9 + k * 3 + 1] = p.y;
      mesh.tri_pos[t * 9 + k * 3 + 2] = p.z;
      mn[0] = std::min(mn[0], p.x); mx[0] = std::max(mx[0], p.x);
      mn[1] = std::min(mn[1], p.y); mx[1] = std::max(mx[1], p.y);
      mn[2] = std::min(mn[2], p.z); mx[2] = std::max(mx[2], p.z);
      long ti = face_vt[t * 3 + k];
      if (ti != 0 && !texcoords.empty()) {
        const V2& uv = texcoords[resolve(ti, texcoords.size())];
        mesh.tri_uv[t * 6 + k * 2 + 0] = uv.u;
        mesh.tri_uv[t * 6 + k * 2 + 1] = uv.v;
      }
    }
  }

  std::vector<size_t> order(n_tris);
  for (size_t i = 0; i < n_tris; ++i) order[i] = i;
  if (morton_order && n_tris > 1) {
    float ext[3] = {std::max(mx[0] - mn[0], 1e-20f),
                    std::max(mx[1] - mn[1], 1e-20f),
                    std::max(mx[2] - mn[2], 1e-20f)};
    std::vector<uint32_t> codes(n_tris);
    for (size_t t = 0; t < n_tris; ++t) {
      float cx = 0, cy = 0, cz = 0;
      for (int k = 0; k < 3; ++k) {
        cx += mesh.tri_pos[t * 9 + k * 3 + 0];
        cy += mesh.tri_pos[t * 9 + k * 3 + 1];
        cz += mesh.tri_pos[t * 9 + k * 3 + 2];
      }
      codes[t] = morton3((cx / 3 - mn[0]) / ext[0],
                         (cy / 3 - mn[1]) / ext[1],
                         (cz / 3 - mn[2]) / ext[2]);
    }
    std::sort(order.begin(), order.end(),
              [&](size_t a, size_t b) { return codes[a] < codes[b]; });
  }

  float* tri_pos = static_cast<float*>(malloc(n_tris * 9 * sizeof(float)));
  float* tri_uv = static_cast<float*>(malloc(n_tris * 6 * sizeof(float)));
  if ((!tri_pos || !tri_uv) && n_tris > 0) {
    free(tri_pos); free(tri_uv);
    return -1;
  }
  for (size_t i = 0; i < n_tris; ++i) {
    memcpy(tri_pos + i * 9, &mesh.tri_pos[order[i] * 9], 9 * sizeof(float));
    memcpy(tri_uv + i * 6, &mesh.tri_uv[order[i] * 6], 6 * sizeof(float));
  }
  *out_tri_pos = tri_pos;
  *out_tri_uv = tri_uv;
  memcpy(out_aabb_min, mn, sizeof mn);
  memcpy(out_aabb_max, mx, sizeof mx);
  return static_cast<long>(n_tris);
}

void obj_free_buffers(float* tri_pos, float* tri_uv) {
  free(tri_pos);
  free(tri_uv);
}

}  // extern "C"
