// Native Wavefront OBJ loader for orion_tpu.
//
// Mirrors orion_tpu/io/obj.py's semantics exactly (which in turn mirror
// the reference's Assimp import flags, /root/reference/orion/model.cpp:
// 23-29): fan triangulation, flat GenNormals when `vn` is absent, FlipUVs
// (v -> 1-v), meshes split at g/o statements and material changes,
// negative OBJ indices. MTL files are parsed on the Python side (cheap);
// this loader surfaces material *names* per mesh plus the mtllib list.
//
// The hot path of scene loading is tokenizing hundreds of thousands of
// `v`/`f` lines (nanosuit2.obj is 51k lines; production scenes are far
// bigger) — that's host runtime, so it's native, like the reference's
// C++ Assimp pipeline.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

struct Corner {
  int64_t v, t, n;  // resolved 0-based; -1 = absent
};

struct Mesh {
  std::string name;
  std::string material;
  std::vector<Corner> corners;  // 3 per triangle
};

struct ObjFile {
  std::vector<float> positions;  // xyz
  std::vector<float> texcoords;  // uv
  std::vector<float> normals;    // xyz
  std::vector<Mesh> meshes;
  std::vector<std::string> mtllibs;
  std::string error;
};

static int64_t resolve(int64_t idx, int64_t n) {
  return idx > 0 ? idx - 1 : n + idx;
}

// parse one whitespace-separated float triple/pair after the keyword
static int parse_floats(const char* p, float* out, int max_n) {
  int n = 0;
  char* end;
  while (n < max_n) {
    while (*p == ' ' || *p == '\t') ++p;
    float v = std::strtof(p, &end);
    if (end == p) break;
    out[n++] = v;
    p = end;
  }
  return n;
}

static const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t') ++p;
  return p;
}

static std::string rest_of_line(const char* p) {
  p = skip_ws(p);
  std::string s(p);
  while (!s.empty() && (s.back() == '\n' || s.back() == '\r' ||
                        s.back() == ' ' || s.back() == '\t'))
    s.pop_back();
  return s;
}

struct Parser {
  ObjFile* obj = nullptr;
  Mesh current;
  std::string cur_group = "default";
  std::string cur_mat;  // empty = default material

  void flush() {
    if (!current.corners.empty()) {
      current.name = cur_group;
      current.material = cur_mat;
      obj->meshes.push_back(std::move(current));
      current = Mesh();
    }
  }

  void face(const char* p) {
    Corner corners[64];
    int nc = 0;
    int64_t nv = obj->positions.size() / 3;
    int64_t nt = obj->texcoords.size() / 2;
    int64_t nn = obj->normals.size() / 3;
    while (nc < 64) {
      p = skip_ws(p);
      if (*p == '\0' || *p == '\n' || *p == '\r' || *p == '#') break;
      char* end;
      int64_t vi = std::strtoll(p, &end, 10);
      if (end == p) break;
      p = end;
      int64_t ti = 0, ni = 0;
      bool has_t = false, has_n = false;
      if (*p == '/') {
        ++p;
        if (*p != '/') {
          ti = std::strtoll(p, &end, 10);
          has_t = end != p;
          p = end;
        }
        if (*p == '/') {
          ++p;
          ni = std::strtoll(p, &end, 10);
          has_n = end != p;
          p = end;
        }
      }
      corners[nc++] = {resolve(vi, nv),
                       has_t ? resolve(ti, nt) : -1,
                       has_n ? resolve(ni, nn) : -1};
    }
    // fan triangulation (Triangulate, model.cpp:27)
    for (int i = 1; i + 1 < nc; ++i) {
      current.corners.push_back(corners[0]);
      current.corners.push_back(corners[i]);
      current.corners.push_back(corners[i + 1]);
    }
  }

  void line(const char* p) {
    p = skip_ws(p);
    if (*p == '\0' || *p == '#' || *p == '\n' || *p == '\r') return;
    if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      float xyz[3] = {0, 0, 0};
      parse_floats(p + 1, xyz, 3);
      obj->positions.insert(obj->positions.end(), xyz, xyz + 3);
    } else if (p[0] == 'v' && p[1] == 't') {
      float uv[2] = {0, 0};
      parse_floats(p + 2, uv, 2);
      obj->texcoords.insert(obj->texcoords.end(), uv, uv + 2);
    } else if (p[0] == 'v' && p[1] == 'n') {
      float xyz[3] = {0, 0, 0};
      parse_floats(p + 2, xyz, 3);
      obj->normals.insert(obj->normals.end(), xyz, xyz + 3);
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      face(p + 1);
    } else if ((p[0] == 'g' || p[0] == 'o') &&
               (p[1] == ' ' || p[1] == '\t' || p[1] == '\0' ||
                p[1] == '\n' || p[1] == '\r')) {
      flush();
      std::string g = rest_of_line(p + 1);
      cur_group = g.empty() ? "default" : g;
    } else if (!std::strncmp(p, "usemtl", 6)) {
      std::string m = rest_of_line(p + 6);
      if (m != cur_mat) {
        flush();
        cur_mat = m;
      }
    } else if (!std::strncmp(p, "mtllib", 6)) {
      // may list several libraries
      const char* q = skip_ws(p + 6);
      while (*q && *q != '\n' && *q != '\r') {
        const char* s = q;
        while (*q && !std::isspace(static_cast<unsigned char>(*q))) ++q;
        if (q > s) obj->mtllibs.emplace_back(s, q - s);
        q = skip_ws(q);
      }
    }
    // s / l / p and others: ignored
  }
};

}  // namespace

extern "C" {

void* orion_obj_load(const char* path, int64_t* out_num_meshes,
                     int64_t* out_num_mtllibs) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* obj = new ObjFile();
  Parser parser;
  parser.obj = obj;

  std::vector<char> buf(1 << 20);
  std::string carry;
  while (true) {
    size_t got = std::fread(buf.data(), 1, buf.size() - 1, f);
    if (got == 0) break;
    buf[got] = '\0';
    const char* p = buf.data();
    const char* chunk_end = buf.data() + got;
    while (p < chunk_end) {
      const char* nl = static_cast<const char*>(
          std::memchr(p, '\n', chunk_end - p));
      if (!nl) {
        carry.append(p, chunk_end - p);
        break;
      }
      if (!carry.empty()) {
        carry.append(p, nl - p);
        parser.line(carry.c_str());
        carry.clear();
      } else {
        // NUL-terminate in place for the line parser
        const_cast<char*>(nl)[0] = '\0';
        parser.line(p);
      }
      p = nl + 1;
    }
    if (got < buf.size() - 1) break;
  }
  if (!carry.empty()) parser.line(carry.c_str());
  parser.flush();
  std::fclose(f);

  // drop empty meshes (parity with io/obj.py)
  std::vector<Mesh> kept;
  for (auto& m : obj->meshes)
    if (!m.corners.empty()) kept.push_back(std::move(m));
  obj->meshes = std::move(kept);

  *out_num_meshes = static_cast<int64_t>(obj->meshes.size());
  *out_num_mtllibs = static_cast<int64_t>(obj->mtllibs.size());
  return obj;
}

int64_t orion_obj_mesh_tris(void* h, int64_t mesh) {
  auto* obj = static_cast<ObjFile*>(h);
  return static_cast<int64_t>(obj->meshes[mesh].corners.size() / 3);
}

const char* orion_obj_mesh_name(void* h, int64_t mesh) {
  return static_cast<ObjFile*>(h)->meshes[mesh].name.c_str();
}

const char* orion_obj_mesh_material(void* h, int64_t mesh) {
  return static_cast<ObjFile*>(h)->meshes[mesh].material.c_str();
}

const char* orion_obj_mtllib(void* h, int64_t i) {
  return static_cast<ObjFile*>(h)->mtllibs[i].c_str();
}

// Fill [F,3,3] positions, [F,3,3] normals (flat GenNormals when absent),
// [F,3,2] uvs (FlipUVs applied). Caller allocates.
void orion_obj_mesh_data(void* h, int64_t mesh, float* pos, float* nrm,
                         float* uv) {
  auto* obj = static_cast<ObjFile*>(h);
  const Mesh& m = obj->meshes[mesh];
  int64_t F = m.corners.size() / 3;
  for (int64_t fi = 0; fi < F; ++fi) {
    const Corner* tri = &m.corners[3 * fi];
    bool has_n = tri[0].n >= 0 && tri[1].n >= 0 && tri[2].n >= 0;
    for (int ci = 0; ci < 3; ++ci) {
      const Corner& c = tri[ci];
      const float* P = &obj->positions[3 * c.v];
      float* po = pos + 9 * fi + 3 * ci;
      po[0] = P[0];
      po[1] = P[1];
      po[2] = P[2];
      float* uo = uv + 6 * fi + 2 * ci;
      if (c.t >= 0) {
        uo[0] = obj->texcoords[2 * c.t];
        uo[1] = 1.0f - obj->texcoords[2 * c.t + 1];  // FlipUVs
      } else {
        uo[0] = uo[1] = 0.0f;
      }
      float* no = nrm + 9 * fi + 3 * ci;
      if (has_n) {
        const float* N = &obj->normals[3 * c.n];
        no[0] = N[0];
        no[1] = N[1];
        no[2] = N[2];
      }
    }
    if (!has_n) {
      // GenNormals: flat geometric normal (model.cpp:28)
      const float* a = pos + 9 * fi;
      const float* b = pos + 9 * fi + 3;
      const float* c3 = pos + 9 * fi + 6;
      float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
      float e2[3] = {c3[0] - a[0], c3[1] - a[1], c3[2] - a[2]};
      float n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                    e1[2] * e2[0] - e1[0] * e2[2],
                    e1[0] * e2[1] - e1[1] * e2[0]};
      float ln = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
      if (ln > 0) {
        n[0] /= ln;
        n[1] /= ln;
        n[2] /= ln;
      }
      for (int ci = 0; ci < 3; ++ci) {
        float* no = nrm + 9 * fi + 3 * ci;
        no[0] = n[0];
        no[1] = n[1];
        no[2] = n[2];
      }
    }
  }
}

void orion_obj_free(void* h) { delete static_cast<ObjFile*>(h); }

}  // extern "C"
