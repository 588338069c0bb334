// Native host-side ops for psdr_jit_tpu.
//
// TPU-native counterpart of the reference's native runtime pieces that are
// NOT device compute: EXR image IO (vendored tinyexr+miniz in the reference,
// include/misc + src/core/bitmap_loader.cpp), OBJ parsing (vendored
// tiny_obj_loader, mesh.cpp:165-314), CPU edge-map construction
// (mesh.cpp:112-149) and the Morton ordering used to make the triangle
// stream cluster-coherent for the Pallas intersector.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O3 -shared -fPIC hostops.cpp -o libhostops.so -lz
//
// EXR support: scanline images, compression NONE / ZIPS / ZIP, pixel types
// HALF / FLOAT / UINT — the subset tinyexr handles for the reference's
// assets.  Tiled/deep/multipart files are rejected.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Morton ordering (for triangle clustering)
// ---------------------------------------------------------------------------

static inline uint32_t expand_bits_10(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

// centroids: (n, 3) float32.  Writes a permutation of [0, n) sorted by the
// 30-bit Morton code of each centroid inside the overall bounding box.
void morton_order(const float* centroids, int64_t n, int32_t* order_out) {
  if (n <= 0) return;
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], centroids[3 * i + k]);
      hi[k] = std::max(hi[k], centroids[3 * i + k]);
    }
  float inv[3];
  for (int k = 0; k < 3; ++k) {
    float ext = hi[k] - lo[k];
    inv[k] = ext > 0 ? 1023.0f / ext : 0.0f;
  }
  std::vector<std::pair<uint32_t, int32_t>> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    uint32_t code = 0;
    for (int k = 0; k < 3; ++k) {
      float f = (centroids[3 * i + k] - lo[k]) * inv[k];
      uint32_t q = (uint32_t)std::min(std::max(f, 0.0f), 1023.0f);
      code |= expand_bits_10(q) << (2 - k);
    }
    keys[i] = {code, (int32_t)i};
  }
  std::stable_sort(keys.begin(), keys.end());
  for (int64_t i = 0; i < n; ++i) order_out[i] = keys[i].second;
}

// ---------------------------------------------------------------------------
// Edge-map construction (mesh.cpp:112-149 semantics)
// ---------------------------------------------------------------------------

// faces: (nf, 3) int32.  out: capacity 3*nf rows of 5 int32
// [v_lo, v_hi, face0, face1|-1, third_vertex_of_face0]; face0 is the
// lowest-index face containing the edge.  Returns the number of edges.
int64_t build_edge_list(const int32_t* faces, int64_t nf, int32_t* out) {
  struct DirEdge {
    int32_t lo, hi, face, third;
  };
  std::vector<DirEdge> edges;
  edges.reserve(3 * nf);
  for (int64_t f = 0; f < nf; ++f) {
    const int32_t* v = faces + 3 * f;
    const int32_t pairs[3][3] = {
        {v[0], v[1], v[2]}, {v[1], v[2], v[0]}, {v[2], v[0], v[1]}};
    for (int e = 0; e < 3; ++e) {
      DirEdge de;
      de.lo = std::min(pairs[e][0], pairs[e][1]);
      de.hi = std::max(pairs[e][0], pairs[e][1]);
      de.face = (int32_t)f;
      de.third = pairs[e][2];
      edges.push_back(de);
    }
  }
  std::stable_sort(edges.begin(), edges.end(),
                   [](const DirEdge& a, const DirEdge& b) {
                     if (a.lo != b.lo) return a.lo < b.lo;
                     if (a.hi != b.hi) return a.hi < b.hi;
                     return a.face < b.face;
                   });
  int64_t ne = 0;
  for (size_t i = 0; i < edges.size();) {
    size_t j = i + 1;
    while (j < edges.size() && edges[j].lo == edges[i].lo &&
           edges[j].hi == edges[i].hi)
      ++j;
    int32_t* row = out + 5 * ne;
    row[0] = edges[i].lo;
    row[1] = edges[i].hi;
    row[2] = edges[i].face;
    row[3] = (j - i >= 2) ? edges[i + 1].face : -1;
    row[4] = edges[i].third;
    ++ne;
    i = j;
  }
  return ne;
}

// ---------------------------------------------------------------------------
// OBJ parsing (tinyobjloader-equivalent subset: v / vt / f with fan
// triangulation and negative indices)
// ---------------------------------------------------------------------------

struct ObjData {
  std::vector<float> vertices;  // 3 per vertex
  std::vector<float> uvs;       // 2 per uv
  std::vector<int32_t> faces;     // 3 per face
  std::vector<int32_t> face_uvs;  // 3 per face (-1 = none)
  bool any_uv = false;
};

ObjData* obj_parse(const char* text, int64_t len) {
  ObjData* d = new ObjData();
  const char* p = text;
  const char* end = text + len;
  std::vector<std::pair<int32_t, int32_t>> corners;
  while (p < end) {
    // find line end
    const char* eol = (const char*)memchr(p, '\n', end - p);
    if (!eol) eol = end;
    // skip leading spaces
    const char* q = p;
    while (q < eol && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
    if (q + 1 < eol && q[0] == 'v' && (q[1] == ' ' || q[1] == '\t')) {
      char* rest = nullptr;
      double x = strtod(q + 2, &rest);
      double y = strtod(rest, &rest);
      double z = strtod(rest, &rest);
      d->vertices.push_back((float)x);
      d->vertices.push_back((float)y);
      d->vertices.push_back((float)z);
    } else if (q + 2 < eol && q[0] == 'v' && q[1] == 't' &&
               (q[2] == ' ' || q[2] == '\t')) {
      char* rest = nullptr;
      double u = strtod(q + 3, &rest);
      double v = strtod(rest, &rest);
      d->uvs.push_back((float)u);
      d->uvs.push_back((float)v);
    } else if (q + 1 < eol && q[0] == 'f' && (q[1] == ' ' || q[1] == '\t')) {
      corners.clear();
      const char* t = q + 2;
      int64_t nv = (int64_t)d->vertices.size() / 3;
      int64_t nt = (int64_t)d->uvs.size() / 2;
      while (t < eol) {
        while (t < eol && (*t == ' ' || *t == '\t' || *t == '\r')) ++t;
        if (t >= eol) break;
        char* rest = nullptr;
        long vi = strtol(t, &rest, 10);
        long ti = 0;
        bool has_t = false;
        if (rest < eol && *rest == '/') {
          ++rest;
          if (rest < eol && *rest != '/') {
            ti = strtol(rest, &rest, 10);
            has_t = true;
          }
          if (rest < eol && *rest == '/') {  // normal index — skipped
            ++rest;
            strtol(rest, &rest, 10);
          }
        }
        int32_t v_idx = vi > 0 ? (int32_t)(vi - 1) : (int32_t)(nv + vi);
        int32_t t_idx = -1;
        if (has_t) {
          t_idx = ti > 0 ? (int32_t)(ti - 1) : (int32_t)(nt + ti);
          d->any_uv = true;
        }
        corners.push_back({v_idx, t_idx});
        t = rest;
      }
      for (size_t k = 1; k + 1 < corners.size(); ++k) {
        d->faces.push_back(corners[0].first);
        d->faces.push_back(corners[k].first);
        d->faces.push_back(corners[k + 1].first);
        d->face_uvs.push_back(corners[0].second);
        d->face_uvs.push_back(corners[k].second);
        d->face_uvs.push_back(corners[k + 1].second);
      }
    }
    p = eol + 1;
  }
  return d;
}

int64_t obj_num_vertices(ObjData* d) { return (int64_t)d->vertices.size() / 3; }
int64_t obj_num_uvs(ObjData* d) { return (int64_t)d->uvs.size() / 2; }
int64_t obj_num_faces(ObjData* d) { return (int64_t)d->faces.size() / 3; }
int32_t obj_has_uv(ObjData* d) { return d->any_uv ? 1 : 0; }
void obj_copy(ObjData* d, float* verts, float* uvs, int32_t* faces,
              int32_t* face_uvs) {
  if (verts && !d->vertices.empty())
    memcpy(verts, d->vertices.data(), d->vertices.size() * sizeof(float));
  if (uvs && !d->uvs.empty())
    memcpy(uvs, d->uvs.data(), d->uvs.size() * sizeof(float));
  if (faces && !d->faces.empty())
    memcpy(faces, d->faces.data(), d->faces.size() * sizeof(int32_t));
  if (face_uvs && !d->face_uvs.empty())
    memcpy(face_uvs, d->face_uvs.data(), d->face_uvs.size() * sizeof(int32_t));
}
void obj_free(ObjData* d) { delete d; }

// ---------------------------------------------------------------------------
// EXR (scanline; NONE / ZIPS / ZIP; HALF / FLOAT / UINT)
// ---------------------------------------------------------------------------

static inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t f;
  if (exp == 0) {
    if (man == 0) {
      f = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) {
        man <<= 1;
        --exp;
      }
      man &= 0x3FF;
      f = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    f = sign | 0x7F800000u | (man << 13);
  } else {
    f = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  memcpy(&out, &f, 4);
  return out;
}

static inline uint16_t float_to_half(float x) {
  uint32_t f;
  memcpy(&f, &x, 4);
  uint32_t sign = (f >> 31) << 15;
  int32_t exp = (int32_t)((f >> 23) & 0xFF) - 127 + 15;
  uint32_t man = f & 0x7FFFFF;
  if (exp <= 0) return (uint16_t)sign;  // flush to zero
  if (exp >= 31) return (uint16_t)(sign | 0x7C00);
  return (uint16_t)(sign | ((uint32_t)exp << 10) | (man >> 13));
}

// EXR "reorder" decode: inflate output -> delta reconstruct -> deinterleave.
static void exr_postdecompress(std::vector<uint8_t>& buf) {
  size_t n = buf.size();
  for (size_t i = 1; i < n; ++i)
    buf[i] = (uint8_t)((int)buf[i] + (int)buf[i - 1] - 128);
  std::vector<uint8_t> out(n);
  size_t half = (n + 1) / 2;
  const uint8_t* s1 = buf.data();
  const uint8_t* s2 = buf.data() + half;
  for (size_t i = 0; i < n; ++i)
    out[i] = (i & 1) ? s2[i / 2] : s1[i / 2];
  buf.swap(out);
}

static void exr_precompress(std::vector<uint8_t>& buf) {
  size_t n = buf.size();
  std::vector<uint8_t> tmp(n);
  size_t half = (n + 1) / 2;
  for (size_t i = 0; i < n; ++i) {
    if (i & 1)
      tmp[half + i / 2] = buf[i];
    else
      tmp[i / 2] = buf[i];
  }
  for (size_t i = n; i-- > 1;)
    tmp[i] = (uint8_t)((int)tmp[i] - (int)tmp[i - 1] + 128);
  buf.swap(tmp);
}

struct ExrChannel {
  std::string name;
  int32_t pixel_type;  // 0 UINT, 1 HALF, 2 FLOAT
};

struct ExrImage {
  int width = 0, height = 0;
  std::vector<ExrChannel> channels;
  std::vector<float> data;  // HWC, header channel order
  std::string error;
};

static bool read_bytes(FILE* f, void* dst, size_t n) {
  return fread(dst, 1, n, f) == n;
}

static bool read_cstr(FILE* f, std::string& s, size_t maxlen = 256) {
  s.clear();
  for (size_t i = 0; i < maxlen; ++i) {
    int c = fgetc(f);
    if (c == EOF) return false;
    if (c == 0) return true;
    s.push_back((char)c);
  }
  return false;
}

ExrImage* exr_load(const char* path) {
  ExrImage* img = new ExrImage();
  FILE* f = fopen(path, "rb");
  if (!f) {
    img->error = "cannot open file";
    return img;
  }
  uint32_t magic = 0, version = 0;
  if (!read_bytes(f, &magic, 4) || magic != 20000630u) {
    img->error = "not an EXR file";
    fclose(f);
    return img;
  }
  read_bytes(f, &version, 4);
  if (version & 0x600) {  // tiled-only bit 9 / deep bit 11 handled below
  }
  if ((version & 0x200) || (version & 0x800) || (version & 0x1000)) {
    img->error = "tiled/deep/multipart EXR not supported";
    fclose(f);
    return img;
  }

  int32_t dw[4] = {0, 0, 0, 0};
  uint8_t compression = 0;
  bool have_dw = false, have_ch = false;

  for (;;) {
    std::string name;
    if (!read_cstr(f, name)) {
      img->error = "truncated header";
      fclose(f);
      return img;
    }
    if (name.empty()) break;  // end of header
    std::string type;
    read_cstr(f, type);
    int32_t size = 0;
    read_bytes(f, &size, 4);
    long next = ftell(f) + size;
    if (name == "dataWindow" && type == "box2i") {
      read_bytes(f, dw, 16);
      have_dw = true;
    } else if (name == "compression" && type == "compression") {
      read_bytes(f, &compression, 1);
    } else if (name == "channels" && type == "chlist") {
      for (;;) {
        std::string cname;
        if (!read_cstr(f, cname)) break;
        if (cname.empty()) break;
        int32_t ptype = 0, plin = 0, xs = 0, ys = 0;
        read_bytes(f, &ptype, 4);
        read_bytes(f, &plin, 4);
        read_bytes(f, &xs, 4);
        read_bytes(f, &ys, 4);
        img->channels.push_back({cname, ptype});
      }
      have_ch = true;
    }
    fseek(f, next, SEEK_SET);
  }
  if (!have_dw || !have_ch) {
    img->error = "missing dataWindow/channels";
    fclose(f);
    return img;
  }
  if (compression != 0 && compression != 2 && compression != 3) {
    img->error = "unsupported compression (only NONE/ZIPS/ZIP)";
    fclose(f);
    return img;
  }
  // Validate header-supplied sizes before trusting them: a corrupt file
  // must produce an error string, not a crash or OOM.
  long long wll = (long long)dw[2] - dw[0] + 1;
  long long hll = (long long)dw[3] - dw[1] + 1;
  int nc = (int)img->channels.size();
  if (wll <= 0 || hll <= 0 || wll > (1 << 20) || hll > (1 << 20) ||
      nc <= 0 || nc > 64 || wll * hll * nc > (1ll << 31)) {
    img->error = "implausible dataWindow/channel count";
    fclose(f);
    return img;
  }
  int w = (int)wll, h = (int)hll;
  img->width = w;
  img->height = h;
  img->data.assign((size_t)w * h * nc, 0.0f);

  int lines_per_block = (compression == 3) ? 16 : 1;
  int n_blocks = (h + lines_per_block - 1) / lines_per_block;
  std::vector<uint64_t> offsets(n_blocks);
  if (!read_bytes(f, offsets.data(), 8 * (size_t)n_blocks)) {
    img->error = "truncated offset table";
    fclose(f);
    return img;
  }

  size_t pix_bytes = 0;
  for (auto& c : img->channels) pix_bytes += (c.pixel_type == 1) ? 2 : 4;
  size_t max_block = (size_t)w * pix_bytes * lines_per_block;

  std::vector<uint8_t> packed, raw;
  for (int b = 0; b < n_blocks; ++b) {
    fseek(f, (long)offsets[b], SEEK_SET);
    int32_t y0 = 0, psize = 0;
    if (!read_bytes(f, &y0, 4) || !read_bytes(f, &psize, 4)) {
      img->error = "truncated block header";
      fclose(f);
      return img;
    }
    int y_start = y0 - dw[1];
    if (y_start < 0 || y_start >= h) {
      img->error = "block scanline out of range";
      fclose(f);
      return img;
    }
    int block_lines = std::min(lines_per_block, h - y_start);
    size_t unpacked = (size_t)w * pix_bytes * block_lines;
    // zlib can expand by ~0.1% + header; anything past that is corrupt
    if (psize < 0 || (size_t)psize > max_block + max_block / 64 + 256) {
      img->error = "implausible block size";
      fclose(f);
      return img;
    }
    packed.resize(psize);
    if (!read_bytes(f, packed.data(), psize)) {
      img->error = "truncated block data";
      fclose(f);
      return img;
    }
    if (compression == 0 || (size_t)psize >= unpacked) {
      if ((size_t)psize < unpacked) {
        img->error = "uncompressed block smaller than scanline";
        fclose(f);
        return img;
      }
      raw.assign(packed.begin(), packed.begin() + unpacked);
    } else {
      raw.resize(unpacked);
      uLongf dlen = (uLongf)unpacked;
      if (uncompress(raw.data(), &dlen, packed.data(), psize) != Z_OK ||
          dlen != unpacked) {
        img->error = "zlib inflate failed";
        fclose(f);
        return img;
      }
      exr_postdecompress(raw);
    }
    // layout: per scanline, per channel (header order), w samples
    const uint8_t* src = raw.data();
    for (int line = 0; line < block_lines; ++line) {
      int y = y_start + line;
      for (int c = 0; c < nc; ++c) {
        int pt = img->channels[c].pixel_type;
        for (int x = 0; x < w; ++x) {
          float v;
          if (pt == 1) {
            uint16_t hv;
            memcpy(&hv, src, 2);
            src += 2;
            v = half_to_float(hv);
          } else if (pt == 2) {
            memcpy(&v, src, 4);
            src += 4;
          } else {
            uint32_t uv;
            memcpy(&uv, src, 4);
            src += 4;
            v = (float)uv;
          }
          img->data[((size_t)y * w + x) * nc + c] = v;
        }
      }
    }
  }
  fclose(f);
  return img;
}

int32_t exr_width(ExrImage* i) { return i->width; }
int32_t exr_height(ExrImage* i) { return i->height; }
int32_t exr_num_channels(ExrImage* i) { return (int32_t)i->channels.size(); }
const char* exr_error(ExrImage* i) { return i->error.c_str(); }
const char* exr_channel_name(ExrImage* i, int32_t c) {
  return i->channels[c].name.c_str();
}
void exr_copy(ExrImage* i, float* out) {
  memcpy(out, i->data.data(), i->data.size() * sizeof(float));
}
void exr_free(ExrImage* i) { delete i; }

// Write a scanline ZIP FLOAT EXR.  data: HWC float32; channels named
// Y (c=1), BGR order on disk for c=3, ABGR for c=4 (alphabetical, as the
// format requires).
int32_t exr_save(const char* path, const float* data, int32_t w, int32_t h,
                 int32_t c) {
  static const char* names1[] = {"Y"};
  static const char* names3[] = {"B", "G", "R"};
  static const char* names4[] = {"A", "B", "G", "R"};
  // map disk channel -> data channel index
  std::vector<const char*> names;
  std::vector<int> src_idx;
  if (c == 1) {
    names = {names1[0]};
    src_idx = {0};
  } else if (c == 3) {
    names = {names3[0], names3[1], names3[2]};
    src_idx = {2, 1, 0};
  } else if (c == 4) {
    names = {names4[0], names4[1], names4[2], names4[3]};
    src_idx = {3, 2, 1, 0};
  } else {
    return -1;
  }
  FILE* f = fopen(path, "wb");
  if (!f) return -2;
  uint32_t magic = 20000630u, version = 2;
  fwrite(&magic, 4, 1, f);
  fwrite(&version, 4, 1, f);

  auto attr = [&](const char* name, const char* type,
                  const void* payload, int32_t size) {
    fwrite(name, 1, strlen(name) + 1, f);
    fwrite(type, 1, strlen(type) + 1, f);
    fwrite(&size, 4, 1, f);
    fwrite(payload, 1, size, f);
  };

  // channels
  {
    std::vector<uint8_t> ch;
    for (size_t i = 0; i < names.size(); ++i) {
      const char* n = names[i];
      ch.insert(ch.end(), (const uint8_t*)n, (const uint8_t*)n + strlen(n) + 1);
      int32_t vals[4] = {2 /*FLOAT*/, 0, 1, 1};
      const uint8_t* vb = (const uint8_t*)vals;
      ch.insert(ch.end(), vb, vb + 16);
    }
    ch.push_back(0);
    attr("channels", "chlist", ch.data(), (int32_t)ch.size());
  }
  uint8_t comp = 3;  // ZIP
  attr("compression", "compression", &comp, 1);
  int32_t dw[4] = {0, 0, w - 1, h - 1};
  attr("dataWindow", "box2i", dw, 16);
  attr("displayWindow", "box2i", dw, 16);
  uint8_t lo = 0;  // increasing Y
  attr("lineOrder", "lineOrder", &lo, 1);
  float par = 1.0f;
  attr("pixelAspectRatio", "float", &par, 4);
  float swc[2] = {0.0f, 0.0f};
  attr("screenWindowCenter", "v2f", swc, 8);
  float sww = 1.0f;
  attr("screenWindowWidth", "float", &sww, 4);
  fputc(0, f);  // end of header

  int lines_per_block = 16;
  int n_blocks = (h + lines_per_block - 1) / lines_per_block;
  long offset_table_pos = ftell(f);
  std::vector<uint64_t> offsets(n_blocks, 0);
  fwrite(offsets.data(), 8, n_blocks, f);  // placeholder

  std::vector<uint8_t> raw, packed;
  for (int b = 0; b < n_blocks; ++b) {
    offsets[b] = (uint64_t)ftell(f);
    int y_start = b * lines_per_block;
    int block_lines = std::min(lines_per_block, h - y_start);
    raw.resize((size_t)w * 4 * names.size() * block_lines);
    uint8_t* dst = raw.data();
    for (int line = 0; line < block_lines; ++line) {
      int y = y_start + line;
      for (size_t ci = 0; ci < names.size(); ++ci) {
        int sc = src_idx[ci];
        for (int x = 0; x < w; ++x) {
          float v = data[((size_t)y * w + x) * c + sc];
          memcpy(dst, &v, 4);
          dst += 4;
        }
      }
    }
    std::vector<uint8_t> enc(raw);
    exr_precompress(enc);
    uLongf clen = compressBound((uLong)enc.size());
    packed.resize(clen);
    compress2(packed.data(), &clen, enc.data(), (uLong)enc.size(), 6);
    int32_t y0 = y_start, psize;
    const uint8_t* payload;
    if (clen < raw.size()) {
      psize = (int32_t)clen;
      payload = packed.data();
    } else {
      psize = (int32_t)raw.size();
      payload = raw.data();
    }
    fwrite(&y0, 4, 1, f);
    fwrite(&psize, 4, 1, f);
    fwrite(payload, 1, psize, f);
  }
  fseek(f, offset_table_pos, SEEK_SET);
  fwrite(offsets.data(), 8, n_blocks, f);
  fclose(f);
  return 0;
}

}  // extern "C"
