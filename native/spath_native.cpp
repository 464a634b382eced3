// spath_tpu native runtime — CPU reference renderer + worker pool.
//
// A from-scratch C++17 implementation of the conformance semantics
// (matching the behavior documented in SURVEY.md for
// /root/reference/src/{geom.h,view.h,cpu_renderer.cpp,frand.h}, written
// independently — scalar recursion, per-pixel LCG streams seeded by
// pixel index as in render.cl:233). It serves three purposes:
//
//   1. an independent golden for the NumPy/JAX conformance tests
//      (three-way agreement: C++ scalar recursion, NumPy backward
//      accumulation, JAX forward throughput);
//   2. the honest CPU baseline for bench.py's vs_baseline ratio
//      (the fastest CPU implementation of the reference algorithm we
//      can produce: -O3, multithreaded);
//   3. the native-runtime component of the framework (worker pool,
//      C ABI consumed from Python via ctypes).
//
// Exposed C ABI: sp_render_flat, sp_render_pt, sp_version.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

constexpr float kEpsilon = 1e-14f;     // geom.h:198 semantics
constexpr float kMaxDist = 1e12f;      // cpu_renderer.cpp:27 semantics
const double kPi = std::acos(-1.0);

struct Vec3 {
  float x = 0, y = 0, z = 0;
  Vec3 operator+(Vec3 o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(Vec3 o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
  Vec3 mul(Vec3 o) const { return {x * o.x, y * o.y, z * o.z}; }
  float dot(Vec3 o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(Vec3 o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  Vec3 unit() const {
    float l = std::sqrt(dot(*this));
    return {x / l, y / l, z / l};
  }
};

struct Tri {
  Vec3 v0, e1, e2, n;  // edges precomputed; n = unit(e1 x e2)
};

struct Ray {
  Vec3 pos, dir;
};

// Stateless-per-stream LCG (frand.h:59-62 semantics).
inline double lcg_next(uint32_t& seed) {
  seed = 214013u * seed + 2531011u;
  return double((seed >> 16) & 0x7fffu) / 32767.0;
}

// Möller–Trumbore with the reference's bounds; returns distance or -1.
inline float intersect(const Ray& r, const Tri& t) {
  Vec3 h = r.dir.cross(t.e2);
  float a = t.e1.dot(h);
  if (a > -kEpsilon && a < kEpsilon) return -1.0f;
  float f = float(1.0 / double(a));  // double divide, float store
  Vec3 s = r.pos - t.v0;
  float u = f * s.dot(h);
  if (u < 0.0f || u > 1.0f) return -1.0f;
  Vec3 q = s.cross(t.e1);
  float v = f * r.dir.dot(q);
  if (v < 0.0f || (u + v) > 1.0f) return -1.0f;
  float d = f * t.e2.dot(q);
  if (d > kEpsilon && double(d) < 1.0 / double(kEpsilon)) return d;
  return -1.0f;
}

// Nearest hit over the whole triangle list, skipping src (the
// reference's source-index self-hit exclusion); lowest index wins ties
// via strict '<'.
inline int nearest(const Ray& r, const std::vector<Tri>& tris, int src,
                   float& best_d) {
  best_d = kMaxDist;
  int best = -1;
  for (int i = 0; i < int(tris.size()); ++i) {
    if (i == src) continue;
    float d = intersect(r, tris[i]);
    if (d > 0.0f && d < best_d) {
      best_d = d;
      best = i;
    }
  }
  return best;
}

// RNG functors (frand.h semantics): the stateless-per-stream LCG the
// GPU kernels use, and the global-state std::rand wrapper of the
// single-threaded debug path (frand.h:26-30).
struct LcgRng {
  uint32_t seed;
  double operator()() { return lcg_next(seed); }
};
struct BasicRng {
  double operator()() { return 1.0 * std::rand() / RAND_MAX; }
};

// Angle-uniform hemisphere sample (geom.h:164-177 semantics): azimuth
// u1*2pi, elevation u2*pi/2, flipped into the normal's hemisphere.
template <class R>
inline Vec3 sample_hemisphere(Vec3 n, R& rng) {
  float az = float(rng() * kPi * 2.0);
  float el = float(rng() * kPi * 0.5);
  float fx = std::cos(el);
  Vec3 out{std::cos(az) * fx, std::sin(el), std::sin(az) * fx};
  if (n.dot(out) < 0.0f) return out * -1.0f;
  return out;
}

struct Scene {
  std::vector<Tri> tris;
  std::vector<Vec3> albedo;
  std::vector<Vec3> emission;
};

// Scalar recursive radiance (cpu_renderer.cpp:30-68 semantics): depth
// cap returns black; p = 1/(2pi); BRDF = albedo/pi; L = emit +
// BRDF * L_next * cos_theta / p.
template <class R>
Vec3 radiance(const Scene& sc, const Ray& r, int src, int depth,
              int max_depth, R& rng) {
  if (depth >= max_depth) return {};
  float d;
  int idx = nearest(r, sc.tris, src, d);
  if (idx < 0) return {};
  Vec3 n = sc.tris[idx].n;
  if (n.dot(r.dir) > 0.0f) n = n * -1.0f;
  Ray next{r.pos + r.dir * d, sample_hemisphere(n, rng)};
  float cos_theta = next.dir.dot(n);
  Vec3 brdf = sc.albedo[idx] * float(1.0 / kPi);
  Vec3 rec = radiance(sc, next, idx, depth + 1, max_depth, rng);
  float inv_p = float(kPi * 2.0);
  return sc.emission[idx] + brdf.mul(rec) * (cos_theta * inv_p);
}

// Camera ray for pixel (i, j) — view.h:94-132 semantics (x decreases
// with i, y with j; rX then rY rotation; float32 plane arithmetic).
struct Camera {
  Vec3 pos, angle;
  float focal;
  int w, h;
  float x_max, x_step, hx, y_max, y_step, hy;
  float cx, sx, cy, sy;

  Camera(const float* cam, int w_, int h_) : w(w_), h(h_) {
    pos = {cam[0], cam[1], cam[2]};
    angle = {cam[3], cam[4], cam[5]};
    focal = cam[6];
    float x_size = float(double(w) / double(h));
    x_max = float(double(x_size) / 2.0);
    x_step = float(double(x_size) / w);
    hx = float(double(x_step) / 2.0);
    y_max = 0.5f;
    y_step = float(1.0 / double(h));
    hy = float(double(y_step) / 2.0);
    cx = std::cos(angle.x);
    sx = std::sin(angle.x);
    cy = std::cos(angle.y);
    sy = std::sin(angle.y);
  }

  Vec3 rotate(Vec3 v) const {
    float y2 = v.y * cx - v.z * sx, z2 = v.y * sx + v.z * cx;  // rX
    float x3 = v.x * cy + z2 * sy, z3 = -v.x * sy + z2 * cy;   // rY
    return {x3, y2, z3};
  }

  Ray ray(int i, int j) const {
    Vec3 p{x_max - x_step * float(i) - hx, y_max - y_step * float(j) - hy,
           0.0f};
    Vec3 dir = (p + Vec3{0.0f, 0.0f, focal}).unit();
    return {rotate(p) + pos, rotate(dir)};
  }
};

Scene build_scene(const float* verts, const float* albedo,
                  const float* emission, int n_tris) {
  Scene sc;
  sc.tris.resize(n_tris);
  sc.albedo.resize(n_tris);
  sc.emission.resize(n_tris);
  for (int t = 0; t < n_tris; ++t) {
    const float* v = verts + t * 9;
    Vec3 v0{v[0], v[1], v[2]}, v1{v[3], v[4], v[5]}, v2{v[6], v[7], v[8]};
    Tri& tr = sc.tris[t];
    tr.v0 = v0;
    tr.e1 = v1 - v0;
    tr.e2 = v2 - v0;
    tr.n = tr.e1.cross(tr.e2).unit();
    sc.albedo[t] = {albedo[t * 3], albedo[t * 3 + 1], albedo[t * 3 + 2]};
    if (emission)
      sc.emission[t] = {emission[t * 3], emission[t * 3 + 1],
                        emission[t * 3 + 2]};
  }
  return sc;
}

// Worker pool: splits [0, n) into dynamically-claimed chunks. Unlike a
// static per-thread split, stealing via an atomic cursor keeps threads
// busy when per-pixel cost varies (deep paths vs background misses).
template <typename F>
void parallel_for(int n, int chunk, F&& body) {
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = int(hw ? hw : 4);
  std::atomic<int> cursor{0};
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int begin = cursor.fetch_add(chunk);
        if (begin >= n) return;
        int end = begin + chunk < n ? begin + chunk : n;
        for (int i = begin; i < end; ++i) body(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

const char* sp_version() { return "spath_tpu-native 0.1.0"; }

// Flat-shaded debug render (cpu_renderer.cpp:81-101 semantics):
// nearest triangle's raw reflectance, black on miss. out: w*h*3 float.
void sp_render_flat(int w, int h, const float* verts, const float* albedo,
                    int n_tris, const float* cam, float* out) {
  Scene sc = build_scene(verts, albedo, nullptr, n_tris);
  Camera c(cam, w, h);
  parallel_for(w * h, 256, [&](int px) {
    Ray r = c.ray(px % w, px / w);
    float d;
    int idx = nearest(r, sc.tris, -1, d);
    Vec3 col = idx >= 0 ? sc.albedo[idx] : Vec3{};
    out[px * 3] = col.x;
    out[px * 3 + 1] = col.y;
    out[px * 3 + 2] = col.z;
  });
}

// Path-traced render, per-pixel LCG streams seeded with pixel index +
// seed_offset (render.cl:233 semantics — scheduling-independent).
// out: w*h*3 float radiance, clamped to [0,1] after averaging
// (cpu_renderer.cpp:77-78).
void sp_render_pt(int w, int h, const float* verts, const float* albedo,
                  const float* emission, int n_tris, int spp,
                  int max_bounces, uint32_t seed_offset, const float* cam,
                  float* out) {
  Scene sc = build_scene(verts, albedo, emission, n_tris);
  Camera c(cam, w, h);
  parallel_for(w * h, 64, [&](int px) {
    Ray r = c.ray(px % w, px / w);
    LcgRng rng{uint32_t(px) + seed_offset};
    Vec3 acc;
    for (int s = 0; s < spp; ++s)
      acc = acc + radiance(sc, r, -1, 0, max_bounces, rng);
    acc = acc * float(1.0 / double(spp));
    auto clamp01 = [](float v) {
      return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
    };
    out[px * 3] = clamp01(acc.x);
    out[px * 3 + 1] = clamp01(acc.y);
    out[px * 3 + 2] = clamp01(acc.z);
  });
}

// Sequential single-thread path trace with the basic_dist RNG
// (frand.h:26-30 + cpu_renderer.cpp:105-116 semantics): ONE shared
// glibc std::rand() stream consumed in pixel-major, sample-major walk
// order — the reference's render_pt debug path, which never calls
// srand (process default = srand(1)). srand_seed=1 reproduces that.
void sp_render_pt_basic(int w, int h, const float* verts,
                        const float* albedo, const float* emission,
                        int n_tris, int spp, int max_bounces,
                        uint32_t srand_seed, const float* cam, float* out) {
  Scene sc = build_scene(verts, albedo, emission, n_tris);
  Camera c(cam, w, h);
  std::srand(srand_seed);
  BasicRng rng;
  auto clamp01 = [](float v) {
    return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
  };
  for (int px = 0; px < w * h; ++px) {
    Ray r = c.ray(px % w, px / w);
    Vec3 acc;
    for (int s = 0; s < spp; ++s)
      acc = acc + radiance(sc, r, -1, 0, max_bounces, rng);
    acc = acc * float(1.0 / double(spp));
    out[px * 3] = clamp01(acc.x);
    out[px * 3 + 1] = clamp01(acc.y);
    out[px * 3 + 2] = clamp01(acc.z);
  }
}

}  // extern "C"
