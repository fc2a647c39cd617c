// fr_native — native (C++) runtime components of f_renderer_tpu.
//
// The reference implementation (vmskisme/f_renderer) is 100% native Rust;
// this library is the C++ analogue of its host-side runtime:
//
//  * a single-threaded scalar render pipeline with the exact semantics of
//    the reference's geometry stage (renderer.rs:96-267) and rasterizer
//    (renderer.rs:269-384), including the documented quirks (SURVEY.md
//    §7.3).  It serves two purposes: an honest single-core CPU baseline
//    for BENCH vs_baseline (comparable to the Rust reference, unlike a
//    Python loop), and a fast golden-image oracle for tests.
//  * a Wavefront OBJ parser (obj_loader.rs:15-74).
//  * TGA decode with the BGRA swizzle (renderer.rs:427-471) and PNG
//    encode/decode via libpng (the `image` crate analogue).
//
// C ABI throughout; Python binds with ctypes (f_renderer_tpu/native).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <png.h>

#define FR_API extern "C" __attribute__((visibility("default")))

namespace {

// ---------------------------------------------------------------------------
// f32 vector helpers (glam analogue, f32 math only)
// ---------------------------------------------------------------------------

struct V2 { float x, y; };
struct V3 { float x, y, z; };
struct V4 { float x, y, z, w; };

static inline V3 v3(float x, float y, float z) { return {x, y, z}; }
static inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 normalize(V3 a) {
  float n = std::sqrt(dot(a, a));
  return {a.x / n, a.y / n, a.z / n};
}
static inline V4 add4(V4 a, V4 b) { return {a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w}; }
static inline V4 sub4(V4 a, V4 b) { return {a.x - b.x, a.y - b.y, a.z - b.z, a.w - b.w}; }
static inline V4 mul4(V4 a, float s) { return {a.x * s, a.y * s, a.z * s, a.w * s}; }

// reflect(L, N) = normalize(2(L·N)N − L)  (vector_util.rs:5)
static inline V3 reflect(V3 l, V3 n) {
  return normalize(sub(mul(n, 2.0f * dot(l, n)), l));
}

// row-major 4x4 · vec4
static inline V4 mat4_mul_v4(const float* m, V4 v) {
  V4 r;
  r.x = m[0] * v.x + m[1] * v.y + m[2] * v.z + m[3] * v.w;
  r.y = m[4] * v.x + m[5] * v.y + m[6] * v.z + m[7] * v.w;
  r.z = m[8] * v.x + m[9] * v.y + m[10] * v.z + m[11] * v.w;
  r.w = m[12] * v.x + m[13] * v.y + m[14] * v.z + m[15] * v.w;
  return r;
}

static inline void mat4_mul(const float* a, const float* b, float* out) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      float s = 0.0f;
      for (int k = 0; k < 4; ++k) s += a[i * 4 + k] * b[k * 4 + j];
      out[i * 4 + j] = s;
    }
}

// Rust `f32 as i32`: truncate toward zero, saturate, NaN → 0.
static inline int32_t f32_as_i32(float x) {
  if (std::isnan(x)) return 0;
  if (x >= 2147483647.0f) return INT32_MAX;
  if (x <= -2147483648.0f) return INT32_MIN;
  return (int32_t)x;
}

// Two's-complement wrapping i32 arithmetic (Rust release overflow semantics).
static inline int32_t wrap_mul(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a * (uint32_t)b);
}
static inline int32_t wrap_add(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a + (uint32_t)b);
}
static inline int32_t wrap_sub(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a - (uint32_t)b);
}

// ---------------------------------------------------------------------------
// Pipeline vertex (renderer.rs:387-409). Varyings are a flat f32 vector of
// up to MAX_CTX channels (the Add/Sub/Mul<f32> trait bound collapses to
// vector arithmetic — shaders/api.py).
// ---------------------------------------------------------------------------

constexpr int MAX_CTX = 16;

struct Vtx {
  float ctx[MAX_CTX];
  float rhw;
  V4 pos;       // clip space, then NDC
  V2 spf;       // float screen pos
  int32_t spi[2];  // integer screen pos
};

enum Plane { X_LEFT, X_RIGHT, Y_UP, Y_DOWN, Z_NEAR, Z_FAR };

// renderer.rs:46-58 (Z_NEAR quirk: z >= 0, not w-relative)
static inline bool inside(int plane, const V4& p) {
  switch (plane) {
    case X_LEFT:  return p.x >= -p.w;
    case X_RIGHT: return p.x <= p.w;
    case Y_UP:    return p.y <= p.w;
    case Y_DOWN:  return p.y >= -p.w;
    case Z_FAR:   return p.z <= p.w;
    case Z_NEAR:  return p.z >= 0.0f;
  }
  return true;
}

// renderer.rs:60-73 — formulas preserved term-for-term (f32 evaluation order)
static inline float intersect_ratio(int plane, const V4& a, const V4& b) {
  switch (plane) {
    case X_LEFT:  return -(a.x + a.w) / (b.w + b.x - a.x - a.w);
    case X_RIGHT: return (a.w - a.x) / (a.w - b.w - a.x + b.x);
    case Y_UP:    return (a.w - a.y) / (a.w - b.w - a.y + b.y);
    case Y_DOWN:  return -(a.y + a.w) / (b.w + b.y - a.w - a.y);
    case Z_FAR:   return (a.w - a.z) / (a.w - b.w - a.z + b.z);
    case Z_NEAR:  return a.w / (a.w - b.w);
  }
  return 0.0f;
}

// renderer.rs:26-29 on integer screen coords
static inline bool is_top_left(const int32_t* a, const int32_t* b) {
  return (a[1] == b[1] && a[0] < b[0]) || (a[1] > b[1]);
}

// ---------------------------------------------------------------------------
// Shaders (examples/src/bin/phong.rs:114-154 constants; builtin.py mirror)
// ---------------------------------------------------------------------------

enum ShaderKind { SH_FLAT = 0, SH_GOURAUD = 1, SH_TEXTURED = 2, SH_PHONG = 3 };

struct Texture {
  const float* data;  // (h, w, 4) f32 in [0,1]
  int h, w;
};

struct Uniforms {
  float model[16], view[16], proj[16], mvp[16];
  V3 view_pos;
  V3 light_pos;
  V3 light_color;
  std::vector<Texture> textures;
};

// FrameBuffer::sample_2d (renderer.rs:516-538) incl. the width-clamp quirk
// on y (SURVEY.md §7.3.7) and fract() = x - trunc(x).
static inline V4 sample_2d(const Texture& t, float u, float v) {
  float x = u * (float)t.w;
  float y = v * (float)t.h;
  float a = x - std::trunc(x);
  float b = y - std::trunc(y);
  if (std::isnan(x)) x = 0.0f;
  if (std::isnan(y)) y = 0.0f;
  int y_hi = t.w - 1;  // quirk: width, not height (renderer.rs:523-525)
  auto clampi = [](float f, int lo, int hi) {
    int i = f32_as_i32(std::trunc(f));
    return std::max(lo, std::min(hi, i));
  };
  int x1 = clampi(x, 0, t.w - 1);
  int y1 = clampi(y, 0, y_hi);
  int x2 = std::min(x1 + 1, t.w - 1);
  int y2 = std::min(y1 + 1, y_hi);
  const float* c11 = t.data + (size_t)(y1 * t.w + x1) * 4;
  const float* c12 = t.data + (size_t)(y2 * t.w + x1) * 4;
  const float* c21 = t.data + (size_t)(y1 * t.w + x2) * 4;
  const float* c22 = t.data + (size_t)(y2 * t.w + x2) * 4;
  V4 out;
  float w11 = (1.0f - a) * (1.0f - b), w12 = (1.0f - a) * b;
  float w21 = a * (1.0f - b), w22 = a * b;
  out.x = c11[0] * w11 + c12[0] * w12 + c21[0] * w21 + c22[0] * w22;
  out.y = c11[1] * w11 + c12[1] * w12 + c21[1] * w21 + c22[1] * w22;
  out.z = c11[2] * w11 + c12[2] * w12 + c21[2] * w21 + c22[2] * w22;
  out.w = c11[3] * w11 + c12[3] * w12 + c21[3] * w21 + c22[3] * w22;
  return out;
}

// phong.rs:133-144 — ambient 0.1, lambert, specular 0.5·(V·R)^32
static inline V3 phong_lighting(const Uniforms& u, V3 normal, V3 world_pos) {
  V3 ambient = mul(u.light_color, 0.1f);
  V3 n = normalize(normal);
  V3 light_dir = normalize(sub(u.light_pos, world_pos));
  float diff = std::max(dot(n, light_dir), 0.0f);
  V3 diffuse = mul(u.light_color, diff);
  V3 view_dir = normalize(sub(u.view_pos, world_pos));
  V3 reflect_dir = reflect(mul(light_dir, -1.0f), n);
  float spec = std::pow(std::max(dot(view_dir, reflect_dir), 0.0f), 32.0f);
  V3 specular = mul(u.light_color, 0.5f * spec);
  return add(add(ambient, diffuse), specular);
}

// context channel layouts (must match the builtin.py pytrees flattened in
// key order by shaders/api.py ContextCodec):
//   FLAT:     color[4]
//   GOURAUD:  color[3]
//   TEXTURED: uv[2]
//   PHONG:    normal[3], pos[3], uv[2]   (dict keys sorted)
static int ctx_channels(int kind) {
  switch (kind) {
    case SH_FLAT: return 4;
    case SH_GOURAUD: return 3;
    case SH_TEXTURED: return 2;
    case SH_PHONG: return 8;
  }
  return 0;
}

struct VSInput {
  V3 pos;
  V2 uv;
  V3 normal;
  V4 color;
};

static void vertex_shader(int kind, const Uniforms& u, const VSInput& in,
                          V4* clip, float* ctx) {
  V4 p = {in.pos.x, in.pos.y, in.pos.z, 1.0f};
  *clip = mat4_mul_v4(u.mvp, p);
  switch (kind) {
    case SH_FLAT:
      ctx[0] = in.color.x; ctx[1] = in.color.y;
      ctx[2] = in.color.z; ctx[3] = in.color.w;
      break;
    case SH_GOURAUD: {
      V4 world = mat4_mul_v4(u.model, p);
      V3 light = phong_lighting(u, in.normal, v3(world.x, world.y, world.z));
      ctx[0] = in.color.x * light.x;
      ctx[1] = in.color.y * light.y;
      ctx[2] = in.color.z * light.z;
      break;
    }
    case SH_TEXTURED:
      ctx[0] = in.uv.x; ctx[1] = in.uv.y;
      break;
    case SH_PHONG: {
      V4 world = mat4_mul_v4(u.model, p);
      ctx[0] = in.normal.x; ctx[1] = in.normal.y; ctx[2] = in.normal.z;
      ctx[3] = world.x; ctx[4] = world.y; ctx[5] = world.z;
      ctx[6] = in.uv.x; ctx[7] = in.uv.y;
      break;
    }
  }
}

static V4 pixel_shader(int kind, const Uniforms& u, const float* ctx,
                       int ps_index) {
  switch (kind) {
    case SH_FLAT:
      return {ctx[0], ctx[1], ctx[2], ctx[3]};
    case SH_GOURAUD:
      return {ctx[0], ctx[1], ctx[2], 1.0f};
    case SH_TEXTURED:
      return sample_2d(u.textures[ps_index], ctx[0], ctx[1]);
    case SH_PHONG: {
      V3 light = phong_lighting(u, v3(ctx[0], ctx[1], ctx[2]),
                                v3(ctx[3], ctx[4], ctx[5]));
      V4 color = sample_2d(u.textures[ps_index], ctx[6], ctx[7]);
      return {color.x * light.x, color.y * light.y, color.z * light.z,
              color.w * 1.0f};
    }
  }
  return {0, 0, 0, 1};
}

// ---------------------------------------------------------------------------
// Geometry stage (renderer.rs:96-267)
// ---------------------------------------------------------------------------

constexpr float EPSILON = 1.0e-5f;

// Returns number of output triangles written to `out` (each 3 Vtx); 0 if
// the input triangle is dropped. `out` must hold >= 7 triangles.
static int geometry_processing(int width, int height, const VSInput in[3],
                               int kind, const Uniforms& u, int nc,
                               Vtx out[][3]) {
  Vtx verts[3];
  for (int i = 0; i < 3; ++i) {
    vertex_shader(kind, u, in[i], &verts[i].pos, verts[i].ctx);
    if (verts[i].pos.w == 0.0f) return 0;  // renderer.rs:117-119
    verts[i].rhw = 0.0f;
  }

  bool ins[3][6];
  bool all_inside = true;
  for (int i = 0; i < 3; ++i)
    for (int p = 0; p < 6; ++p) {
      ins[i][p] = inside(p, verts[i].pos);
      all_inside &= ins[i][p];
    }

  // ≤ 3 pairs × 6 planes + 3 originals = ≤ 21 candidates
  Vtx valid[21];
  int n = 0;
  if (!all_inside) {
    for (int i = 0; i < 3; ++i)
      for (int j = i + 1; j < 3; ++j)
        for (int p = 0; p < 6; ++p)
          if (ins[i][p] != ins[j][p]) {
            float ratio = intersect_ratio(p, verts[i].pos, verts[j].pos);
            V4 np = add4(verts[i].pos, mul4(sub4(verts[j].pos, verts[i].pos), ratio));
            if (std::fabs(np.w) > EPSILON) {
              Vtx& v = valid[n++];
              for (int c = 0; c < nc; ++c)
                v.ctx[c] = verts[i].ctx[c] + (verts[j].ctx[c] - verts[i].ctx[c]) * ratio;
              v.rhw = 0.0f;
              v.pos = np;
            }
          }
    // all originals kept regardless (renderer.rs:171)
    for (int i = 0; i < 3; ++i) valid[n++] = verts[i];
  } else {
    for (int i = 0; i < 3; ++i) valid[n++] = verts[i];
  }
  if (n < 3) return 0;

  // centroid-angle sort (renderer.rs:180-218); stable like Rust sort_by
  float cx = 0.0f, cy = 0.0f;
  for (int i = 0; i < n; ++i) { cx += valid[i].pos.x; cy += valid[i].pos.y; }
  float inv_n = 1.0f / (float)n;
  cx *= inv_n; cy *= inv_n;
  auto angle = [&](const Vtx& v) {
    float a = std::atan2(v.pos.y - cy, v.pos.x - cx);
    if (a < 0.0f) a += 2.0f * (float)M_PI;
    return a;
  };
  std::stable_sort(valid, valid + n,
                   [&](const Vtx& a, const Vtx& b) { return angle(a) < angle(b); });

  // NDC + viewport transform (renderer.rs:220-235)
  for (int i = 0; i < n; ++i) {
    Vtx& v = valid[i];
    float w = v.pos.w;
    v.rhw = 1.0f / w;
    v.pos = mul4(v.pos, v.rhw);
    v.spf.x = (v.pos.x + 1.0f) * (float)width * 0.5f;
    v.spf.y = (1.0f - v.pos.y) * (float)height * 0.5f;
    v.spi[0] = f32_as_i32(v.spf.x + 0.5f);
    v.spi[1] = f32_as_i32(v.spf.y + 0.5f);
  }

  // fan triangulation with the reference's exact ordering (renderer.rs:237-266)
  if (n == 3) {
    out[0][0] = valid[0]; out[0][1] = valid[1]; out[0][2] = valid[2];
    return 1;
  }
  int t = 0;
  for (int last = n - 1; last > 3; --last) {
    out[t][0] = valid[0]; out[t][1] = valid[last - 1]; out[t][2] = valid[last];
    ++t;
  }
  out[t][0] = valid[0]; out[t][1] = valid[2]; out[t][2] = valid[3]; ++t;
  out[t][0] = valid[0]; out[t][1] = valid[1]; out[t][2] = valid[2]; ++t;
  return t;
}

// ---------------------------------------------------------------------------
// Raster stage (renderer.rs:269-384)
// ---------------------------------------------------------------------------

static void rasterization(int width, int height, const Vtx tri_in[3], int kind,
                          const Uniforms& u, int nc, int ps_index,
                          uint8_t* frame, float* depth) {
  auto clampx = [&](int64_t v) { return (int)std::max<int64_t>(0, std::min<int64_t>(width, v)); };
  auto clampy = [&](int64_t v) { return (int)std::max<int64_t>(0, std::min<int64_t>(height, v)); };

  int min_x = clampx(tri_in[0].spi[0]), max_x = min_x;
  int min_y = clampy(tri_in[0].spi[1]), max_y = min_y;
  for (int k = 1; k < 3; ++k) {
    min_x = clampx(std::min<int64_t>(min_x, tri_in[k].spi[0]));
    max_x = clampx(std::max<int64_t>(max_x, tri_in[k].spi[0]));
    min_y = clampy(std::min<int64_t>(min_y, tri_in[k].spi[1]));
    max_y = clampy(std::max<int64_t>(max_y, tri_in[k].spi[1]));
  }

  // winding repair, not culling (renderer.rs:300-312)
  Vtx vtx[3] = {tri_in[0], tri_in[1], tri_in[2]};
  V4 v01 = sub4(tri_in[1].pos, tri_in[0].pos);
  V4 v02 = sub4(tri_in[2].pos, tri_in[0].pos);
  float normal_z = v01.x * v02.y - v01.y * v02.x;
  if (normal_z > 0.0f) std::swap(vtx[1], vtx[2]);

  const int32_t* p0 = vtx[0].spi;
  const int32_t* p1 = vtx[1].spi;
  const int32_t* p2 = vtx[2].spi;
  int th01 = is_top_left(p0, p1) ? 0 : 1;
  int th12 = is_top_left(p1, p2) ? 0 : 1;
  int th20 = is_top_left(p2, p0) ? 0 : 1;

  for (int cy = min_y; cy < max_y; ++cy) {
    for (int cx = min_x; cx < max_x; ++cx) {
      int32_t e01 = wrap_add(wrap_mul(-(wrap_sub(cx, p0[0])), wrap_sub(p1[1], p0[1])),
                             wrap_mul(wrap_sub(cy, p0[1]), wrap_sub(p1[0], p0[0])));
      if (e01 < th01) continue;
      int32_t e12 = wrap_add(wrap_mul(-(wrap_sub(cx, p1[0])), wrap_sub(p2[1], p1[1])),
                             wrap_mul(wrap_sub(cy, p1[1]), wrap_sub(p2[0], p1[0])));
      if (e12 < th12) continue;
      int32_t e20 = wrap_add(wrap_mul(-(wrap_sub(cx, p2[0])), wrap_sub(p0[1], p2[1])),
                             wrap_mul(wrap_sub(cy, p2[1]), wrap_sub(p0[0], p2[0])));
      if (e20 < th20) continue;

      float pxx = (float)cx + 0.5f, pxy = (float)cy + 0.5f;
      float s0x = vtx[0].spf.x - pxx, s0y = vtx[0].spf.y - pxy;
      float s1x = vtx[1].spf.x - pxx, s1y = vtx[1].spf.y - pxy;
      float s2x = vtx[2].spf.x - pxx, s2y = vtx[2].spf.y - pxy;
      float a = std::fabs(s1x * s2y - s1y * s2x);
      float b = std::fabs(s2x * s0y - s2y * s0x);
      float c = std::fabs(s0x * s1y - s0y * s1x);
      float s = a + b + c;
      if (s == 0.0f) continue;
      float inv_s = 1.0f / s;
      a *= inv_s; b *= inv_s; c *= inv_s;

      float rhw = vtx[0].rhw * a + vtx[1].rhw * b + vtx[2].rhw * c;
      size_t idx = (size_t)cy * (size_t)width + (size_t)cx;
      if (rhw < depth[idx]) continue;  // reversed-z; ties overwrite
      depth[idx] = rhw;

      float w = 1.0f / (rhw != 0.0f ? rhw : 1.0f);
      float c0 = vtx[0].rhw * a * w;
      float c1 = vtx[1].rhw * b * w;
      float c2 = vtx[2].rhw * c * w;
      float ctx[MAX_CTX];
      for (int ch = 0; ch < nc; ++ch)
        ctx[ch] = vtx[0].ctx[ch] * c0 + vtx[1].ctx[ch] * c1 + vtx[2].ctx[ch] * c2;

      V4 color = pixel_shader(kind, u, ctx, ps_index);
      uint8_t* px = frame + idx * 4;
      auto to_u8 = [](float f) {
        float v = f * 255.0f;
        if (!(v > 0.0f)) v = 0.0f;
        if (v > 255.0f) v = 255.0f;
        return (uint8_t)v;
      };
      px[0] = to_u8(color.x); px[1] = to_u8(color.y);
      px[2] = to_u8(color.z); px[3] = to_u8(color.w);
    }
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI: full-frame render (the phong.rs:314-387 frame loop)
// ---------------------------------------------------------------------------

// draws are concatenated per-face-corner SoA arrays:
//   pos (F,3,3) f32; uv (F,3,2) f32 or null; normal (F,3,3) f32 or null;
//   color (F,3,4) f32 or null.  draw_faces[d] = face count of draw d; the
//   ps_index of draw d is d (texture selection), with the inclusive `<=`
//   boundary quirk of phong.rs:364-370 applied to the flattened triangle
//   list.  Textures: tex_data = concatenated (h,w,4) f32 blocks, tex_dims =
//   (T,2) i32 (h,w), offsets implied.  Matrices row-major f32.
// Returns the number of rasterized triangles.
FR_API int64_t fr_render_scene(
    int width, int height, int shader_kind,
    int num_draws, const int64_t* draw_faces,
    const float* pos, const float* uv, const float* normal, const float* color,
    const float* model, const float* view, const float* proj,
    const float* view_pos, const float* light_pos, const float* light_color,
    const float* tex_data, const int32_t* tex_dims, int num_tex,
    const uint8_t* background,
    uint8_t* out_frame, float* out_depth) {
  Uniforms u;
  std::memcpy(u.model, model, sizeof u.model);
  std::memcpy(u.view, view, sizeof u.view);
  std::memcpy(u.proj, proj, sizeof u.proj);
  float vm[16];
  mat4_mul(view, model, vm);
  mat4_mul(proj, vm, u.mvp);
  u.view_pos = {view_pos[0], view_pos[1], view_pos[2]};
  u.light_pos = light_pos ? v3(light_pos[0], light_pos[1], light_pos[2])
                          : v3(1.2f, 1.0f, 2.0f);
  u.light_color = light_color ? v3(light_color[0], light_color[1], light_color[2])
                              : v3(1.0f, 1.0f, 1.0f);
  const float* td = tex_data;
  for (int t = 0; t < num_tex; ++t) {
    Texture tex{td, tex_dims[t * 2], tex_dims[t * 2 + 1]};
    u.textures.push_back(tex);
    td += (size_t)tex.h * tex.w * 4;
  }

  size_t npx = (size_t)width * height;
  for (size_t i = 0; i < npx; ++i) {
    out_frame[i * 4 + 0] = background[0];
    out_frame[i * 4 + 1] = background[1];
    out_frame[i * 4 + 2] = background[2];
    out_frame[i * 4 + 3] = background[3];
    out_depth[i] = 0.0f;
  }

  int nc = ctx_channels(shader_kind);

  // geometry over all draws → one submission-ordered triangle list
  std::vector<Vtx> tris;          // 3 Vtx per triangle
  std::vector<int64_t> offsets;   // cumulative triangle count per draw
  int64_t face_base = 0;
  Vtx fan[7][3];
  for (int d = 0; d < num_draws; ++d) {
    for (int64_t f = 0; f < draw_faces[d]; ++f) {
      VSInput in[3];
      for (int k = 0; k < 3; ++k) {
        size_t ci = (size_t)(face_base + f) * 3 + k;
        in[k].pos = {pos[ci * 3], pos[ci * 3 + 1], pos[ci * 3 + 2]};
        in[k].uv = uv ? V2{uv[ci * 2], uv[ci * 2 + 1]} : V2{0, 0};
        in[k].normal = normal
            ? v3(normal[ci * 3], normal[ci * 3 + 1], normal[ci * 3 + 2])
            : v3(0, 0, 1);
        in[k].color = color ? V4{color[ci * 4], color[ci * 4 + 1],
                                 color[ci * 4 + 2], color[ci * 4 + 3]}
                            : V4{1, 1, 1, 1};
      }
      int nt = geometry_processing(width, height, in, shader_kind, u, nc, fan);
      for (int t = 0; t < nt; ++t)
        for (int k = 0; k < 3; ++k) tris.push_back(fan[t][k]);
    }
    face_base += draw_faces[d];
    offsets.push_back((int64_t)tris.size() / 3);
  }

  int64_t ntris = (int64_t)tris.size() / 3;
  for (int64_t i = 0; i < ntris; ++i) {
    // inclusive `<=` boundary quirk (phong.rs:364-369)
    int draw_idx = num_draws - 1;
    int64_t prev = 0;
    for (int d = 0; d < num_draws; ++d) {
      if ((prev < i && i <= offsets[d]) || (d == 0 && i <= offsets[d])) {
        draw_idx = d;
        break;
      }
      prev = offsets[d];
    }
    int ps_index = u.textures.empty() ? 0 : std::min(draw_idx, num_tex - 1);
    rasterization(width, height, &tris[(size_t)i * 3], shader_kind, u, nc,
                  ps_index, out_frame, out_depth);
  }
  return ntris;
}

// ---------------------------------------------------------------------------
// C ABI: OBJ parser (obj_loader.rs:15-74)
// ---------------------------------------------------------------------------

struct FrObj {
  std::vector<float> verts, norms, uvs;
  std::vector<int32_t> faces;  // (F, 3, 3): pos/uv/norm indices, 0-based
};

FR_API void* fr_obj_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::string text;
  {
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    text.resize((size_t)n);
    if (n > 0 && std::fread(&text[0], 1, (size_t)n, f) != (size_t)n) {
      std::fclose(f);
      return nullptr;
    }
    std::fclose(f);
  }
  auto* obj = new FrObj();
  size_t start = 0;
  std::vector<std::string> parts;
  while (start <= text.size()) {
    size_t end = text.find('\n', start);
    if (end == std::string::npos) end = text.size();
    std::string line = text.substr(start, end - start);
    start = end + 1;
    if (!line.empty() && line.back() == '\r') line.pop_back();
    parts.clear();
    size_t p = 0;
    while (p <= line.size()) {
      size_t q = line.find(' ', p);
      if (q == std::string::npos) q = line.size();
      parts.push_back(line.substr(p, q - p));
      p = q + 1;
    }
    const std::string& tag = parts[0];
    auto fat = [&](size_t i) { return std::strtof(parts[i].c_str(), nullptr); };
    if (tag == "v" && parts.size() >= 4) {
      obj->verts.push_back(fat(1));
      obj->verts.push_back(fat(2));
      obj->verts.push_back(fat(3));
    } else if (tag == "vn" && parts.size() >= 4) {
      obj->norms.push_back(fat(1));
      obj->norms.push_back(fat(2));
      obj->norms.push_back(fat(3));
    } else if (tag == "vt" && parts.size() >= 3) {
      obj->uvs.push_back(fat(1));
      obj->uvs.push_back(fat(2));
    } else if (tag == "f" && parts.size() >= 4) {
      // triangles only: exactly indices 1..4 (obj_loader.rs:58)
      for (int i = 1; i <= 3; ++i) {
        int32_t tri[3] = {0, 0, 0};
        const std::string& tok = parts[i];
        size_t a = 0;
        for (int k = 0; k < 3 && a <= tok.size(); ++k) {
          size_t b = tok.find('/', a);
          if (b == std::string::npos) b = tok.size();
          tri[k] = (int32_t)std::strtol(tok.substr(a, b - a).c_str(), nullptr, 10) - 1;
          a = b + 1;
        }
        obj->faces.push_back(tri[0]);
        obj->faces.push_back(tri[1]);
        obj->faces.push_back(tri[2]);
      }
    }
  }
  return obj;
}

FR_API void fr_obj_counts(void* h, int64_t* nv, int64_t* nn, int64_t* nt,
                          int64_t* nf) {
  auto* o = (FrObj*)h;
  *nv = (int64_t)o->verts.size() / 3;
  *nn = (int64_t)o->norms.size() / 3;
  *nt = (int64_t)o->uvs.size() / 2;
  *nf = (int64_t)o->faces.size() / 9;
}

FR_API void fr_obj_copy(void* h, float* verts, float* norms, float* uvs,
                        int32_t* faces) {
  auto* o = (FrObj*)h;
  std::memcpy(verts, o->verts.data(), o->verts.size() * sizeof(float));
  std::memcpy(norms, o->norms.data(), o->norms.size() * sizeof(float));
  std::memcpy(uvs, o->uvs.data(), o->uvs.size() * sizeof(float));
  std::memcpy(faces, o->faces.data(), o->faces.size() * sizeof(int32_t));
}

FR_API void fr_obj_free(void* h) { delete (FrObj*)h; }

// ---------------------------------------------------------------------------
// C ABI: TGA decode (FrameBuffer::load_file analogue, renderer.rs:427-471)
// Supports uncompressed (type 2) and RLE (type 10) 24/32-bit true-color.
// Output is BGRA by default (the reference's load swizzle) — TGA stores
// pixels as BGR(A) natively, so "bgra" output is a straight copy and "rgba"
// swaps channels.
// ---------------------------------------------------------------------------

FR_API int fr_tga_decode(const uint8_t* buf, int64_t len, int want_bgra,
                         int32_t* out_w, int32_t* out_h, uint8_t* out /*or null*/) {
  if (len < 18) return -1;
  uint8_t id_len = buf[0];
  uint8_t img_type = buf[2];
  int16_t w = (int16_t)(buf[12] | (buf[13] << 8));
  int16_t h = (int16_t)(buf[14] | (buf[15] << 8));
  uint8_t bpp = buf[16];
  uint8_t descr = buf[17];
  if ((img_type != 2 && img_type != 10) || (bpp != 24 && bpp != 32) || w <= 0 ||
      h <= 0)
    return -2;
  *out_w = w;
  *out_h = h;
  if (!out) return 0;
  int bypp = bpp / 8;
  size_t n = (size_t)w * h;
  std::vector<uint8_t> px(n * bypp);
  const uint8_t* src = buf + 18 + id_len;
  const uint8_t* end = buf + len;
  if (img_type == 2) {
    if (src + n * bypp > end) return -3;
    std::memcpy(px.data(), src, n * bypp);
  } else {  // RLE
    size_t o = 0;
    while (o < n * (size_t)bypp && src < end) {
      uint8_t hdr = *src++;
      int count = (hdr & 0x7f) + 1;
      if (hdr & 0x80) {
        if (src + bypp > end) return -3;
        for (int i = 0; i < count && o < n * (size_t)bypp; ++i) {
          std::memcpy(&px[o], src, bypp);
          o += bypp;
        }
        src += bypp;
      } else {
        if (src + (size_t)count * bypp > end) return -3;
        size_t bytes = std::min((size_t)count * bypp, n * (size_t)bypp - o);
        std::memcpy(&px[o], src, bytes);
        o += bytes;
        src += (size_t)count * bypp;
      }
    }
  }
  // TGA rows are bottom-up unless descriptor bit 5 set
  bool top_down = (descr & 0x20) != 0;
  for (int y = 0; y < h; ++y) {
    int sy = top_down ? y : (h - 1 - y);
    for (int x = 0; x < w; ++x) {
      const uint8_t* s = &px[((size_t)sy * w + x) * bypp];
      uint8_t* d = out + ((size_t)y * w + x) * 4;
      uint8_t bch = s[0], gch = s[1], rch = s[2];
      uint8_t ach = bypp == 4 ? s[3] : 255;
      if (want_bgra) {
        d[0] = bch; d[1] = gch; d[2] = rch; d[3] = ach;
      } else {
        d[0] = rch; d[1] = gch; d[2] = bch; d[3] = ach;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// C ABI: PNG encode/decode via libpng (the `image` crate analogue)
// ---------------------------------------------------------------------------

FR_API int fr_png_write(const char* path, const uint8_t* rgba, int w, int h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGBA, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = (png_bytep)(rgba + (size_t)y * w * 4);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return 0;
}

FR_API int fr_png_read(const char* path, int want_bgra, int32_t* out_w,
                       int32_t* out_h, uint8_t* out /*or null*/) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_gray_to_rgb(png);
  png_set_add_alpha(png, 0xFF, PNG_FILLER_AFTER);
  if (want_bgra) png_set_bgr(png);
  png_read_update_info(png, info);
  int w = (int)png_get_image_width(png, info);
  int h = (int)png_get_image_height(png, info);
  *out_w = w;
  *out_h = h;
  if (!out) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return 0;
  }
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + (size_t)y * w * 4;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// C ABI: SVO raycaster baseline (voxel.rs:21-416)
//
// Single-threaded scalar implementation of the reference voxel demo's hot
// loop, semantics-faithful: per pixel NDC -> unprojected ray dir
// (voxel.rs:141-150), cube entry/exit by per-axis plane intersection with
// the quirky sort/"dedupe" (VoxelCube::intersect, voxel.rs:239-334), then a
// fixed-step march (step = length/2^level * 0.01, voxel.rs:340) doing a
// recursive octree point query per step (find_leaf, voxel.rs:357-394,
// octant bit layout voxel.rs:396-411).  The octree arrives as the flat
// node-table form (octree.flatten): valid/leaf masks, child ids (N,8),
// leaf colors (N,8,4 BGRA).  Used by baselines/measure_cpu.py to produce
// the voxel540 vs_baseline entry.
// ---------------------------------------------------------------------------

namespace {

struct Svo {
  const int32_t* valid;
  const int32_t* leafm;
  const int32_t* child;      // (N, 8)
  const uint8_t* leaf_color; // (N, 8, 4)
};

// find_leaf (voxel.rs:357-394): half-open inside test per octant, recursive
// descent.  Returns pointer to BGRA color or null.
static const uint8_t* svo_find_leaf(const Svo& s, int32_t node,
                                    float rx, float ry, float rz, float len,
                                    float px, float py, float pz) {
  for (int i = 0; i < 8; ++i) {
    int bit = 1 << i;
    if (!(s.valid[node] & bit)) continue;
    float half = len * 0.5f;
    // get_sub_cube_range bit layout (voxel.rs:396-411)
    float sx = rx + (float)(i & 1) * half;
    float sy = ry + (float)((i >> 2) & 1) * half;
    float sz = rz + (float)((i >> 1) & 1) * half;
    if (px >= sx && px < sx + half && py >= sy && py < sy + half &&
        pz >= sz && pz < sz + half) {
      if (s.leafm[node] & bit) return s.leaf_color + ((size_t)node * 8 + i) * 4;
      int32_t c = s.child[(size_t)node * 8 + i];
      if (c < 0) return nullptr;
      return svo_find_leaf(s, c, sx, sy, sz, half, px, py, pz);
    }
  }
  return nullptr;
}

// VoxelCube::intersect (voxel.rs:239-334).  Returns the number of collected
// points after the sort/"dedupe"; start/end written when >= 1.
static int voxel_cube_intersect(const float* eye, const float* dir, float length,
                                float* start, float* end) {
  float pts[8][3];
  int cnt = 0;
  auto push = [&](float x, float y, float z) {
    if (cnt < 8) { pts[cnt][0] = x; pts[cnt][1] = y; pts[cnt][2] = z; }
    ++cnt;
  };
  bool handled_parallel = false;
  for (int axis = 0; axis < 3; ++axis) {
    float n[3] = {0, 0, 0};
    n[axis] = 1.0f;
    // dir x n == 0  -> ray parallel to this axis
    float cr[3] = {dir[1] * n[2] - dir[2] * n[1],
                   dir[2] * n[0] - dir[0] * n[2],
                   dir[0] * n[1] - dir[1] * n[0]};
    bool is_parallel = cr[0] == 0.0f && cr[1] == 0.0f && cr[2] == 0.0f;
    if (is_parallel && !handled_parallel) {
      float p[3];
      bool inside = true;
      for (int a = 0; a < 3; ++a) {
        p[a] = (1.0f - n[a]) * eye[a];
        if (!(p[a] >= 0.0f && p[a] <= length)) inside = false;
      }
      if (inside) {
        push(p[0], p[1], p[2]);
        push(p[0] + length * (1.0f - n[0]), p[1] + length * (1.0f - n[1]),
             p[2] + length * (1.0f - n[2]));
        handled_parallel = true;
      }
      continue;
    }
    float dir_dot_n = dir[axis];
    if (dir_dot_n == 0.0f) continue;
    for (int a_scale = 0; a_scale < 2; ++a_scale) {
      float a[3] = {n[0] * length * a_scale, n[1] * length * a_scale,
                    n[2] * length * a_scale};
      float ap[3] = {a[0] - eye[0], a[1] - eye[1], a[2] - eye[2]};
      float apc[3] = {ap[1] * dir[2] - ap[2] * dir[1],
                      ap[2] * dir[0] - ap[0] * dir[2],
                      ap[0] * dir[1] - ap[1] * dir[0]};
      if (apc[0] == 0.0f && apc[1] == 0.0f && apc[2] == 0.0f) {
        push(a[0], a[1], a[2]);  // plane anchor lies on the ray line
        continue;
      }
      float t = ap[axis] / dir_dot_n;
      if (t < 0.0f) continue;
      float b[3] = {eye[0] + dir[0] * t, eye[1] + dir[1] * t,
                    eye[2] + dir[2] * t};
      if (b[0] >= 0.0f && b[0] <= length && b[1] >= 0.0f && b[1] <= length &&
          b[2] >= 0.0f && b[2] <= length)
        push(b[0], b[1], b[2]);
    }
  }
  if (cnt == 0) return 0;
  int m = cnt < 8 ? cnt : 8;
  // stable sort by distance to eye (voxel.rs:321)
  float d[8];
  for (int k = 0; k < m; ++k) {
    float dx = pts[k][0] - eye[0], dy = pts[k][1] - eye[1],
          dz = pts[k][2] - eye[2];
    d[k] = std::sqrt(dx * dx + dy * dy + dz * dz);
  }
  int idx[8];
  for (int k = 0; k < m; ++k) idx[k] = k;
  for (int i2 = 1; i2 < m; ++i2) {  // insertion sort = stable
    int ky = idx[i2];
    float dy2 = d[ky];
    int j = i2 - 1;
    while (j >= 0 && d[idx[j]] > dy2) { idx[j + 1] = idx[j]; --j; }
    idx[j + 1] = ky;
  }
  float sorted[8][3];
  for (int k = 0; k < m; ++k)
    for (int a = 0; a < 3; ++a) sorted[k][a] = pts[idx[k]][a];
  if (cnt > 2) {
    // the reference's scrambling "dedupe" (voxel.rs:323-331), literal:
    //   i = 1; for j in 0..len { if pts[i] != pts[j] { pts[i] = pts[j]; i = j } }
    int i2 = 1;
    for (int j = 0; j < m; ++j) {
      if (sorted[i2][0] != sorted[j][0] || sorted[i2][1] != sorted[j][1] ||
          sorted[i2][2] != sorted[j][2]) {
        sorted[i2][0] = sorted[j][0];
        sorted[i2][1] = sorted[j][1];
        sorted[i2][2] = sorted[j][2];
        i2 = j;
      }
    }
  }
  for (int a = 0; a < 3; ++a) {
    start[a] = sorted[0][a];
    end[a] = (m == 1) ? sorted[0][a] : sorted[1][a];
  }
  return m;
}

}  // namespace

// Renders one frame; out = (H, W, 4) u8 BGRA (Rgba byte order,
// wgpu_base.rs:13-20; miss = opaque black, Rgba::new()).
FR_API void fr_voxel_render(
    int width, int height,
    const int32_t* valid_mask, const int32_t* leaf_mask,
    const int32_t* child_index, const uint8_t* leaf_color,
    float length, int level,
    const float* eye, const float* inv_mvp,
    uint8_t* out) {
  Svo svo{valid_mask, leaf_mask, child_index, leaf_color};
  float per_t = length / (float)(1 << level) * 0.01f;
  for (int y = 0; y < height; ++y) {
    for (int x = 0; x < width; ++x) {
      uint8_t* px = out + ((size_t)y * width + x) * 4;
      px[0] = 0; px[1] = 0; px[2] = 0; px[3] = 255;
      // screen -> NDC -> world ray dir (voxel.rs:141-150)
      float ndc_x = (float)x * 2.0f / (float)width - 1.0f;
      float ndc_y = 1.0f - (float)y * 2.0f / (float)height;
      float dir[3];
      for (int i = 0; i < 3; ++i)
        dir[i] = ((inv_mvp[i * 4 + 0] * ndc_x + inv_mvp[i * 4 + 1] * ndc_y) +
                  inv_mvp[i * 4 + 2]) + inv_mvp[i * 4 + 3];
      float nrm = std::sqrt(dir[0] * dir[0] + dir[1] * dir[1] + dir[2] * dir[2]);
      dir[0] /= nrm; dir[1] /= nrm; dir[2] /= nrm;
      float start[3], endp[3];
      if (voxel_cube_intersect(eye, dir, length, start, endp) == 0) continue;
      // Rust f32::min ignores NaN (axis-parallel 0/0 components)
      float t_max = std::fmin(
          std::fmin((endp[0] - start[0]) / dir[0], (endp[1] - start[1]) / dir[1]),
          (endp[2] - start[2]) / dir[2]);
      if (!(t_max >= 0.0f)) continue;
      float t = 0.0f;
      while (true) {  // `while t <= t_max` with post-query advance
        float p[3] = {start[0] + t * dir[0], start[1] + t * dir[1],
                      start[2] + t * dir[2]};
        const uint8_t* c = nullptr;
        if (p[0] >= 0.0f && p[0] < length && p[1] >= 0.0f && p[1] < length &&
            p[2] >= 0.0f && p[2] < length)
          c = svo_find_leaf(svo, 0, 0.0f, 0.0f, 0.0f, length, p[0], p[1], p[2]);
        if (c) { px[0] = c[0]; px[1] = c[1]; px[2] = c[2]; px[3] = 255; break; }
        if (t >= t_max) break;
        t = std::fmin(t + per_t, t_max);
      }
    }
  }
}
