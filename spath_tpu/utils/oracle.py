"""NumPy conformance oracle — the golden reference semantics.

The reference ships zero automated tests; its stable, machine-independent
semantics are the GPU kernels' per-pixel-seeded LCG path tracer
(``src/render.comp:160-227``, seed = pixel id at ``src/render.comp:219``)
whose radiance recursion equals the CPU renderer's
(``src/cpu_renderer.cpp:30-68``). This module re-implements those
semantics in NumPy float32 with the same operation order (including the
reference's double-precision subexpressions that are truncated back to
float32 on assignment), so JAX renders can be compared against it.

Deliberately formulated differently from the JAX renderer: per-triangle
Python loop for intersection (like the reference's scan), and the
*backward accumulation* radiance form of ``src/render.comp:199-212``
(sans its ``idxs[5]`` OOB bug — the CPU recursion's depth-5 → black
semantics are ground truth, ``src/cpu_renderer.cpp:33-34``), rather than
the forward-throughput form the JAX path tracer uses. A bug in one
formulation will not hide in the other.

Everything here is host-side test/golden infrastructure — never on the
TPU hot path.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32
F64 = np.float64

EPSILON = F32(1e-14)           # src/geom.h:198 (real = float)
MAX_DIST = F32(1e12)           # src/cpu_renderer.cpp:27
PI = np.arccos(-1.0)           # double, src/geom.h:160


def viewport(width, height, pos=(0.0, 0.0, -3.0), angle=(0.0, 0.0, 0.0),
             focal=2.0):
    """Per-pixel rays, mirroring ``view::camera::get_viewport``
    (``src/view.h:94-132``) including its float32/double mix.

    Returns (origins, dirs) float32 arrays of shape (H*W, 3), row-major
    ``i + j*res_x``, row 0 = top.
    """
    x_size = F32(1.0 * width / height)           # double expr → float
    y_size = F32(1.0)
    x_max = F32(F64(x_size) / 2.0)
    x_step = F32(F64(x_size) / width)
    h_x_step = F32(F64(x_step) / 2.0)
    y_max = F32(F64(y_size) / 2.0)
    y_step = F32(F64(y_size) / height)
    h_y_step = F32(F64(y_step) / 2.0)

    i = np.arange(width, dtype=F32)
    j = np.arange(height, dtype=F32)
    px = x_max - x_step * i - h_x_step           # float32 ops (view.h:111)
    py = y_max - y_step * j - h_y_step
    px = np.broadcast_to(px[None, :], (height, width))
    py = np.broadcast_to(py[:, None], (height, width))
    plane = np.stack([px, py, np.zeros_like(px)], axis=-1).astype(F32)

    d = plane.copy()
    d[..., 2] += F32(focal)
    norm = np.sqrt((d * d).sum(-1, dtype=F32)).astype(F32)
    d = (d / norm[..., None]).astype(F32)

    o = plane.reshape(-1, 3)
    d = d.reshape(-1, 3)
    ax, ay = F32(angle[0]), F32(angle[1])
    cx, sx = F32(np.cos(ax)), F32(np.sin(ax))
    cy, sy = F32(np.cos(ay)), F32(np.sin(ay))

    def rel_move(v):
        # rX then rY (src/view.h:83-85, 54-68), float32
        x, y, z = v[:, 0], v[:, 1], v[:, 2]
        y, z = y * cx - z * sx, y * sx + z * cx
        x, z = x * cy + z * sy, -x * sy + z * cy
        return np.stack([x, y, z], axis=-1).astype(F32)

    o = rel_move(o) + np.asarray(pos, F32)
    d = rel_move(d)
    return o.astype(F32), d.astype(F32)


def flat_normals(vertices):
    """``geom::flat_normal`` (``src/geom.h:192-195``) in float32."""
    v = np.asarray(vertices, F32)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2).astype(F32)
    ln = np.sqrt((n * n).sum(-1, dtype=F32)).astype(F32)
    return (n / ln[:, None]).astype(F32)


def ray_intersect_one(o, d, v0, v1, v2):
    """Möller–Trumbore of N rays vs ONE triangle (``src/geom.h:197-222``).

    Returns float32 distances, -1 where no hit — exactly the reference's
    early-out conditions, vectorized over rays.
    """
    e1 = (v1 - v0).astype(F32)
    e2 = (v2 - v0).astype(F32)
    h = np.cross(d, e2).astype(F32)
    a = (e1 * h).sum(-1, dtype=F32).astype(F32)
    miss = (a > -EPSILON) & (a < EPSILON)
    a_safe = np.where(miss, F32(1.0), a)
    f = (1.0 / a_safe.astype(F64)).astype(F32)   # double divide → float
    s = (o - v0).astype(F32)
    u = (f * (s * h).sum(-1, dtype=F32)).astype(F32)
    miss |= (u < 0.0) | (u > 1.0)
    q = np.cross(s, e1).astype(F32)
    v = (f * (d * q).sum(-1, dtype=F32)).astype(F32)
    miss |= (v < 0.0) | ((u + v) > 1.0)
    dist = (f * (e2 * q).sum(-1, dtype=F32)).astype(F32)
    # d in (EPSILON, 1/EPSILON) — the upper bound compares in double
    # (src/geom.h:217: `d < 1.0/EPSILON` promotes to double).
    miss |= ~((dist > EPSILON) & (dist.astype(F64) < 1.0 / F64(EPSILON)))
    return np.where(miss, F32(-1.0), dist)


def nearest_hit(o, d, vertices, src_idx=None):
    """Linear nearest-hit scan (``src/cpu_renderer.cpp:39-49``).

    Returns (dist, idx): idx = -1 on miss; strict `<` keeps the earliest
    triangle on ties, distances start at MAX_VALUE_DIST.
    """
    n = o.shape[0]
    best_d = np.full(n, MAX_DIST, F32)
    best_i = np.full(n, -1, np.int32)
    for t in range(vertices.shape[0]):
        cur = ray_intersect_one(o, d, *[np.asarray(vertices[t, k], F32)
                                        for k in range(3)])
        take = (cur > 0.0) & (cur < best_d)
        if src_idx is not None:
            take &= src_idx != t
        best_d = np.where(take, cur, best_d)
        best_i = np.where(take, t, best_i)
    return best_d, best_i


def lcg_draw(seed):
    """Advance the LCG (``src/frand.h:59-62``); returns (seed, u_float64)."""
    seed = (np.uint32(214013) * seed + np.uint32(2531011)).astype(np.uint32)
    u = ((seed >> np.uint32(16)) & np.uint32(0x7FFF)).astype(F64) / 32767.0
    return seed, u


def rand_unit_vec(adj_n, seed):
    """``geom::rand_unit_vec`` (``src/geom.h:164-177``) with LCG draws.

    Draw order: u1 → azimuth, u2 → elevation; double subexpressions
    truncated to float32 as in the reference. Returns (dirs, seed).
    """
    seed, u1 = lcg_draw(seed)
    seed, u2 = lcg_draw(seed)
    rv_xz = (u1 * PI * 2.0).astype(F32)
    rv_y = (u2 * PI * 0.5).astype(F32)
    f_x = np.cos(rv_y, dtype=F32)
    f_y = np.sin(rv_y, dtype=F32)
    out = np.stack(
        [np.cos(rv_xz, dtype=F32) * f_x, f_y, np.sin(rv_xz, dtype=F32) * f_x],
        axis=-1,
    ).astype(F32)
    flip = (adj_n * out).sum(-1, dtype=F32) < 0.0
    return np.where(flip[:, None], -out, out).astype(F32), seed


def render_flat(width, height, vertices, albedo, camera_kw=None):
    """Flat-shaded debug render (``src/cpu_renderer.cpp:81-101``):
    nearest triangle's raw reflectance color, black on miss.

    Returns float32 (H, W, 3)."""
    o, d = viewport(width, height, **(camera_kw or {}))
    _, idx = nearest_hit(o, d, np.asarray(vertices, F32))
    alb = np.asarray(albedo, F32)
    img = np.where(idx[:, None] >= 0, alb[np.maximum(idx, 0)], F32(0.0))
    return img.reshape(height, width, 3).astype(F32)


def render_pt(width, height, vertices, albedo, emission, spp,
              max_bounces=5, camera_kw=None, seed_offset=0):
    """Path-traced render with the conformance semantics.

    Per-pixel LCG stream seeded with the pixel index
    (``src/render.comp:219``); radiance via forward walk + backward
    accumulation (``src/render.comp:160-215``), depth-``max_bounces`` cut
    to black (``src/cpu_renderer.cpp:33-34``). Returns float32 (H, W, 3)
    of per-pixel radiance averaged over ``spp`` (pre-tonemap).
    """
    verts = np.asarray(vertices, F32)
    alb = np.asarray(albedo, F32)
    emi = np.asarray(emission, F32)
    normals = flat_normals(verts)
    o0, d0 = viewport(width, height, **(camera_kw or {}))
    n = o0.shape[0]
    seed = (np.arange(n, dtype=np.uint32) + np.uint32(seed_offset))

    p = F32(1.0 / (PI * 2.0))           # src/cpu_renderer.cpp:60
    inv_p = F32(1.0 / F64(p))           # `* (1.0/p)` → double → float op
    inv_pi = F32(1.0 / PI)              # BRDF scale, src/cpu_renderer.cpp:63

    accum = np.zeros((n, 3), F32)
    for _ in range(spp):
        o, d = o0.copy(), d0.copy()
        src = np.full(n, -1, np.int32)
        alive = np.ones(n, bool)
        idx_stack = []
        cos_stack = []
        for _b in range(max_bounces):
            dist, idx = nearest_hit(o, d, verts, src)
            hit = alive & (idx >= 0)
            safe = np.maximum(idx, 0)
            nrm = normals[safe]
            flip = (nrm * d).sum(-1, dtype=F32) > 0.0   # cpu_renderer.cpp:56
            adj_n = np.where(flip[:, None], -nrm, nrm).astype(F32)
            # RNG advances ONLY where the path is alive and hit
            # (rand_unit_vec is only reached after a hit,
            # src/cpu_renderer.cpp:51-58).
            nd, new_seed = rand_unit_vec(adj_n, seed)
            seed = np.where(hit, new_seed, seed)
            cos_t = (nd * adj_n).sum(-1, dtype=F32).astype(F32)
            point = (o + dist[:, None] * d).astype(F32)  # geom.h:218
            o = np.where(hit[:, None], point, o)
            d = np.where(hit[:, None], nd, d)
            src = np.where(hit, idx, src)
            idx_stack.append(np.where(hit, idx, -1))
            cos_stack.append(cos_t)
            alive = hit
        # Backward accumulation (render.comp:199-212), float32 op order:
        # rv = (BRDF * rv) * (cosθ * inv_p) + emittance.
        rv = np.zeros((n, 3), F32)
        for b in reversed(range(max_bounces)):
            idx = idx_stack[b]
            live = idx >= 0
            safe = np.maximum(idx, 0)
            brdf = (alb[safe] * inv_pi).astype(F32)
            term = ((brdf * rv) * (cos_stack[b] * inv_p)[:, None]).astype(F32)
            rv = np.where(live[:, None], (term + emi[safe]).astype(F32), rv)
        accum = (accum + rv).astype(F32)
    accum = (accum * F32(1.0 / F64(spp))).astype(F32)   # cpu_renderer.cpp:77
    return np.clip(accum, 0.0, 1.0).reshape(height, width, 3).astype(F32)


def render_pt_basic(width, height, vertices, albedo, emission, spp,
                    rng, max_bounces=5, camera_kw=None):
    """Sequential path trace with a SHARED scalar RNG — the reference's
    single-threaded ``render_pt`` debug path
    (``src/cpu_renderer.cpp:105-116``): one global stream consumed in
    pixel-major, sample-major, recursion order. Pass
    ``ops.rng.GlibcRand(1)`` for the ``basic_dist`` process-default
    stream, or a ``TableRng`` for ``vec_dist``.

    Recursion and float32 op order mirror the reference recursion
    (``src/cpu_renderer.cpp:30-68``); output is averaged then clamped to
    [0, 1] like the native golden. Returns float32 (H, W, 3). Slow
    (pure Python per ray) — use tiny frames.
    """
    verts = np.asarray(vertices, F32)
    alb = np.asarray(albedo, F32)
    emi = np.asarray(emission, F32)
    normals = flat_normals(verts)
    o0, d0 = viewport(width, height, **(camera_kw or {}))
    inv_pi = F32(1.0 / PI)
    inv_p = F32(PI * 2.0)

    def sample_dir(adj_n):
        az = F32(rng() * PI * 2.0)
        el = F32(rng() * PI * 0.5)
        fx = np.cos(el, dtype=F32)
        out = np.array([np.cos(az, dtype=F32) * fx,
                        np.sin(el, dtype=F32),
                        np.sin(az, dtype=F32) * fx], F32)
        if F32((adj_n * out).sum(dtype=F32)) < 0.0:
            out = -out
        return out.astype(F32)

    def rad(o, d, src, depth):
        if depth >= max_bounces:
            return np.zeros(3, F32)
        dist, idx = nearest_hit(o[None], d[None], verts,
                                np.array([src], np.int32))
        i = int(idx[0])
        if i < 0:
            return np.zeros(3, F32)
        nrm = normals[i]
        adj_n = (-nrm if F32((nrm * d).sum(dtype=F32)) > 0.0
                 else nrm).astype(F32)
        nd = sample_dir(adj_n)
        cos_t = F32((nd * adj_n).sum(dtype=F32))
        point = (o + F32(dist[0]) * d).astype(F32)
        brdf = (alb[i] * inv_pi).astype(F32)
        rec = rad(point, nd, i, depth + 1)
        return (emi[i] + (brdf * rec) * F32(cos_t * inv_p)).astype(F32)

    out = np.zeros((height * width, 3), F32)
    for px in range(height * width):
        acc = np.zeros(3, F32)
        for _ in range(spp):
            acc = (acc + rad(o0[px], d0[px], -1, 0)).astype(F32)
        out[px] = np.clip((acc * F32(1.0 / F64(spp))).astype(F32), 0.0, 1.0)
    return out.reshape(height, width, 3).astype(F32)
