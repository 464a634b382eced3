"""Brute-force rays × triangles nearest-hit intersection.

The reference's hottest code: Möller–Trumbore (``src/geom.h:197-222``,
hand-duplicated at ``src/render.cl:88-112`` and ``src/render.comp:61-85``)
inside a linear scan over ALL triangles keeping the nearest hit and
skipping the ray's source triangle by index
(``src/cpu_renderer.cpp:39-49``, ``src/render.comp:104-121``). No BVH —
brute force is the specified semantics.

Two TPU-native formulations:

  * ``intersect_mt`` — Möller–Trumbore vectorized over (rays, triangles)
    on the VPU, component-wise so intermediates stay ``(N, B)`` rather
    than ``(N, B, 3)``. Follows the reference's float32 op order → the
    conformance path.

  * ``intersect_pluecker`` — the same quantities expressed as ONE matmul
    on the MXU. Using scalar-triple-product identities, every
    Möller–Trumbore numerator/denominator is bilinear in per-ray features
    ``[dir, pos×dir, pos, 1]`` and per-triangle features, so the whole
    rays×triangles sweep becomes ``(N, 10) @ (10, 4·T)``:

        a      = -dir·ñ                      ñ  = e1×e2
        u_num  =  m·e2 - dir·c0              c0 = e2×v0,  m = pos×dir
        v_num  = -m·e1 - dir·c1              c1 = v0×e1
        d_num  =  pos·ñ - k                  k  = v0·ñ

    with u = u_num/a, v = v_num/a, d = d_num/a. The validity epilogue is
    done sign-aware (multiply through by |a|) so only one division per
    pair survives. This is the "intersection becomes a tiled
    rays-by-triangles matmul-style kernel" design from the survey ledger
    (SURVEY.md §2), and keeps the MXU — not the VPU — as the unit doing
    the O(N·T) work.

Both are blocked over triangles with ``lax.scan`` carrying the running
``(min_d, argmin)`` so large scenes never materialize an ``(N, T)``
buffer. Tie-breaking matches the reference's strict ``cur_d < d`` scan:
the lowest triangle index wins (``src/cpu_renderer.cpp:44``).

Differentiability: the returned distance ``d`` is smooth in vertices and
ray; the discrete ``idx``/hit mask acts as a straight-through selector
(gradients flow through the selected triangle's geometry, not through the
argmin itself).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from spath_tpu.config import EPSILON, MAX_DIST, RenderConfig

# numpy scalars, NOT jnp: a module-level jnp scalar is a committed
# device buffer, and executables that close over one run ~400x slower
# on the remote-TPU (axon) path than ones with inlined literals.
_EPS = np.float32(EPSILON)
_INV_EPS = np.float32(1.0 / EPSILON)
_BIG = np.float32(MAX_DIST)


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _mt_block(o, d, v0, v1, v2, src_idx, tri_base):
    """Möller–Trumbore for one triangle block.

    o, d: (N, 3) ray origins/directions. v0/v1/v2: (B, 3). src_idx: (N,)
    source-triangle exclusion (``src/cpu_renderer.cpp:40-41``). tri_base:
    global index of the block's first triangle.

    Returns (dist, valid): (N, B) float32 distances (masked to _BIG) and
    the hit mask.
    """
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]          # (N, 1)
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    e1 = v1 - v0
    e2 = v2 - v0
    e1x, e1y, e1z = e1[None, :, 0], e1[None, :, 1], e1[None, :, 2]  # (1, B)
    e2x, e2y, e2z = e2[None, :, 0], e2[None, :, 1], e2[None, :, 2]

    # h = dir × e2 (src/geom.h:202)
    hx, hy, hz = _cross(dx, dy, dz, e2x, e2y, e2z)        # (N, B)
    a = _dot(e1x, e1y, e1z, hx, hy, hz)                   # (N, B)
    nondegenerate = jnp.abs(a) >= _EPS                    # src/geom.h:204
    # Safe reciprocal: avoid inf/NaN pollution of gradients on the masked
    # branch (double-where trick).
    f = jnp.float32(1.0) / jnp.where(nondegenerate, a, jnp.float32(1.0))

    sx, sy, sz = ox - v0[None, :, 0], oy - v0[None, :, 1], oz - v0[None, :, 2]
    u = f * _dot(sx, sy, sz, hx, hy, hz)                  # src/geom.h:208
    qx, qy, qz = _cross(sx, sy, sz, e1x, e1y, e1z)
    v = f * _dot(dx, dy, dz, qx, qy, qz)                  # src/geom.h:212
    dist = f * _dot(e2x, e2y, e2z, qx, qy, qz)            # src/geom.h:216

    valid = (
        nondegenerate
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (dist > _EPS) & (dist < _INV_EPS)               # src/geom.h:217
    )
    # Source-triangle exclusion by global index.
    tri_ids = tri_base + jnp.arange(v0.shape[0], dtype=jnp.int32)[None, :]
    valid &= tri_ids != src_idx[:, None]
    return jnp.where(valid, dist, _BIG), valid


def _pluecker_block(o, d, m, feats, src_idx, tri_base):
    """Plücker/matmul Möller–Trumbore for one triangle block.

    o, d, m: (N, 3) origins, directions, moments (pos×dir).
    feats: (10, 4B) packed per-triangle feature matrix from
    ``pluecker_features``. Returns (dist, valid): (N, B).
    """
    n = o.shape[0]
    b = feats.shape[1] // 4
    rays = jnp.concatenate(
        [d, m, o, jnp.ones((n, 1), jnp.float32)], axis=1
    )  # (N, 10)
    quads = jnp.dot(
        rays, feats, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ).reshape(n, b, 4)
    a, u_num, v_num, d_num = (
        quads[..., 0], quads[..., 1], quads[..., 2], quads[..., 3]
    )

    abs_a = jnp.abs(a)
    sign_a = jnp.sign(a)
    us = u_num * sign_a          # = u · |a|
    vs = v_num * sign_a
    ds = d_num * sign_a
    nondegenerate = abs_a >= _EPS
    valid = (
        nondegenerate
        & (us >= 0.0) & (us <= abs_a)
        & (vs >= 0.0) & (us + vs <= abs_a)
        & (ds > _EPS * abs_a) & (ds < _INV_EPS * abs_a)
    )
    dist = ds / jnp.where(nondegenerate, abs_a, jnp.float32(1.0))
    tri_ids = tri_base + jnp.arange(b, dtype=jnp.int32)[None, :]
    valid &= tri_ids != src_idx[:, None]
    return jnp.where(valid, dist, _BIG), valid


def pluecker_features(v0, v1, v2):
    """Pack per-triangle Plücker features into a ``(10, 4T)`` matrix.

    Column layout per triangle t: [a, u_num, v_num, d_num] against per-ray
    features [dir, pos×dir, pos, 1]. Differentiable in vertices.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    nrm = jnp.cross(e1, e2)                  # ñ (unnormalized)
    c0 = jnp.cross(e2, v0)
    c1 = jnp.cross(v0, e1)
    k = jnp.sum(v0 * nrm, axis=-1)           # (T,)
    t = v0.shape[0]
    z3 = jnp.zeros_like(v0)
    zcol = jnp.zeros((t, 1), v0.dtype)
    # rows: dir(3), m(3), pos(3), const(1)
    col_a = jnp.concatenate([-nrm, z3, z3, zcol], axis=1)          # (T, 10)
    col_u = jnp.concatenate([-c0, e2, z3, zcol], axis=1)
    col_v = jnp.concatenate([-c1, -e1, z3, zcol], axis=1)
    col_d = jnp.concatenate([z3, z3, nrm, -k[:, None]], axis=1)
    cols = jnp.stack([col_a, col_u, col_v, col_d], axis=1)         # (T, 4, 10)
    return cols.reshape(t * 4, 10).T                               # (10, 4T)


def _pad_tris(arrs, block: int):
    """Pad (T, ...) arrays with degenerate (all-zero → always-miss) tris."""
    t = arrs[0].shape[0]
    pad = (-t) % block
    if pad == 0:
        return arrs, t
    return [
        jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in arrs
    ], t


def nearest_hit(
    o: jax.Array,
    d: jax.Array,
    v0: jax.Array,
    v1: jax.Array,
    v2: jax.Array,
    src_idx: jax.Array,
    cfg: RenderConfig | None = None,
    method: str | None = None,
    tri_block: int | None = None,
):
    """Nearest hit of N rays against all T triangles (brute force).

    Args:
      o, d: ``(N, 3)`` ray origins and directions.
      v0, v1, v2: ``(T, 3)`` triangle vertices.
      src_idx: ``(N,)`` int32 source-triangle index to exclude (-1 = none),
        the reference's self-hit avoidance (``src/cpu_renderer.cpp:40-41``).
      cfg: optional RenderConfig supplying method/tri_block defaults.
      method: "reference" | "pluecker" | "pallas" | "pallas_fast".
      tri_block: triangle chunk size for the scan.

    Returns:
      ``(dist, idx)``: ``(N,)`` float32 hit distances (``MAX_DIST`` on
      miss) and ``(N,)`` int32 triangle indices (``-1`` on miss). The hit
      point is ``o + dist[:, None] * d`` (``src/geom.h:218``).

    Gradients: a custom VJP shared by every method. The argmin is a
    detached (straight-through) selector, and the backward pass is the
    O(N) analytic derivative of the SELECTED triangle's distance — the
    autodiff transpose of the O(N·T) sweep computes exactly the same
    cotangents (``min`` routes the cotangent to the argmin element) at
    ~T× the cost.
    """
    method = method or (cfg.intersect if cfg else "reference")
    block = tri_block or (cfg.tri_block if cfg else 512)
    src_idx = src_idx.astype(jnp.int32)
    return _nearest_hit_vjp(o, d, v0, v1, v2, src_idx, method, block)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _nearest_hit_vjp(o, d, v0, v1, v2, src_idx, method, block):
    return _nearest_hit_fwd_impl(o, d, v0, v1, v2, src_idx, method, block)


def _dist_selected(o, d, v0, v1, v2, idx):
    """Differentiable Möller–Trumbore distance of each ray to its
    selected triangle — the O(N) backward path."""
    safe = jnp.maximum(idx, 0)
    a0 = v0[safe]
    e1 = v1[safe] - a0
    e2 = v2[safe] - a0
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = jnp.float32(1.0) / jnp.where(jnp.abs(a) > 0.0, a, jnp.float32(1.0))
    s = o - a0
    q = jnp.cross(s, e1)
    dist = f * jnp.sum(e2 * q, axis=-1)
    return jnp.where(idx >= 0, dist, _BIG)


def _vjp_fwd(o, d, v0, v1, v2, src_idx, method, block):
    dist, idx = _nearest_hit_fwd_impl(o, d, v0, v1, v2, src_idx, method,
                                      block)
    return (dist, idx), (o, d, v0, v1, v2, idx)


def _vjp_bwd(method, block, res, cotangents):
    o, d, v0, v1, v2, idx = res
    d_bar, _ = cotangents
    _, vjp = jax.vjp(
        lambda o_, d_, a_, b_, c_: _dist_selected(o_, d_, a_, b_, c_, idx),
        o, d, v0, v1, v2,
    )
    go, gd, g0, g1, g2 = vjp(d_bar)
    return go, gd, g0, g1, g2, None


_nearest_hit_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def _nearest_hit_fwd_impl(o, d, v0, v1, v2, src_idx, method, block):
    t = v0.shape[0]

    if method in ("pallas", "pallas_fast"):
        from spath_tpu.ops.pallas.intersect_pallas import nearest_hit_pallas

        return nearest_hit_pallas(
            o, d, v0, v1, v2, src_idx, fast=(method == "pallas_fast")
        )

    if t <= block:
        # Single block — no scan.
        if method == "pluecker":
            m = jnp.cross(o, d)
            feats = pluecker_features(v0, v1, v2)
            dist, _ = _pluecker_block(o, d, m, feats, src_idx, 0)
        else:
            dist, _ = _mt_block(o, d, v0, v1, v2, src_idx, 0)
        best = jnp.min(dist, axis=1)
        idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
        idx = jnp.where(best >= _BIG, -1, idx)
        return best, idx

    # Blocked scan over triangles: carry the running (min_d, argmin).
    if method == "pluecker":
        m = jnp.cross(o, d)
        (v0p, v1p, v2p), _ = _pad_tris([v0, v1, v2], block)
        feats = pluecker_features(v0p, v1p, v2p)        # (10, 4T')
        nblk = v0p.shape[0] // block
        feats = feats.reshape(10, nblk, 4 * block).transpose(1, 0, 2)

        def body(carry, inp):
            best_d, best_i = carry
            blk_feats, base = inp
            dist, _ = _pluecker_block(o, d, m, blk_feats, src_idx, base)
            blk_best = jnp.min(dist, axis=1)
            blk_idx = base + jnp.argmin(dist, axis=1).astype(jnp.int32)
            better = blk_best < best_d       # strict: earlier block wins ties
            return (
                jnp.where(better, blk_best, best_d),
                jnp.where(better, blk_idx, best_i),
            ), None

        bases = (jnp.arange(nblk) * block).astype(jnp.int32)
        init = (jnp.full(o.shape[0], _BIG), jnp.full(o.shape[0], -1, jnp.int32))
        (best, idx), _ = lax.scan(body, init, (feats, bases))
    else:
        (v0p, v1p, v2p), _ = _pad_tris([v0, v1, v2], block)
        nblk = v0p.shape[0] // block
        v0b = v0p.reshape(nblk, block, 3)
        v1b = v1p.reshape(nblk, block, 3)
        v2b = v2p.reshape(nblk, block, 3)

        def body(carry, inp):
            best_d, best_i = carry
            b0, b1, b2, base = inp
            dist, _ = _mt_block(o, d, b0, b1, b2, src_idx, base)
            blk_best = jnp.min(dist, axis=1)
            blk_idx = base + jnp.argmin(dist, axis=1).astype(jnp.int32)
            better = blk_best < best_d
            return (
                jnp.where(better, blk_best, best_d),
                jnp.where(better, blk_idx, best_i),
            ), None

        bases = (jnp.arange(nblk) * block).astype(jnp.int32)
        init = (jnp.full(o.shape[0], _BIG), jnp.full(o.shape[0], -1, jnp.int32))
        (best, idx), _ = lax.scan(body, init, (v0b, v1b, v2b, bases))

    idx = jnp.where(best >= _BIG, -1, idx)
    return best, idx
