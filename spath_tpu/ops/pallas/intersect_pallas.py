"""Tiled rays × triangles nearest-hit as a Pallas TPU kernel.

The XLA Plücker path (``ops/intersect.py``) materializes each
``(N, 4·tri_block)`` matmul result in HBM before the epilogue and argmin
read it back — at 100k triangles that is ~N·T·16 bytes of HBM traffic
per bounce. This kernel keeps everything on-chip (SURVEY.md §7 step 4's
"tiled rays×triangles Pallas kernel ... matmul-style blocking"):

  * grid = (ray tiles, triangle blocks), triangle block innermost;
  * per step: four MXU matmuls ``(TILE_N, 16) @ (16, TILE_T)`` produce
    the Möller–Trumbore quantities a, u·a, v·a, d·a for every pair in
    VMEM (the Plücker feature factorization of ``ops/intersect.py``,
    K padded 10→16);
  * the sign-aware validity epilogue, the reference's ε bounds and
    source-triangle exclusion, and the (min-distance, lowest-index)
    reduction all happen in VMEM; only the per-ray running best
    ``(dist, index)`` — revisited across triangle blocks — ever reaches
    the output.

Gradients: a ``jax.custom_vjp``. The argmin is detached (straight-
through, same policy as the XLA path); the backward pass recomputes the
selected triangle's distance differentiably — an O(N) formula — and
lets ``jax.vjp`` of that carry cotangents to rays and vertices, so no
O(N·T) work or residuals appear in the backward pass at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.config import EPSILON, MAX_DIST, RenderConfig

_EPS = np.float32(EPSILON)
_INV_EPS = np.float32(1.0 / EPSILON)
_BIG = np.float32(MAX_DIST)

# Tile sizes: 4 live (TILE_N, TILE_T) f32 buffers = 4 MB of VMEM at
# 256×1024, well under the ~16 MB budget with inputs and accumulators.
TILE_N = 256
TILE_T = 1024
_K = 16  # Plücker feature dim 10, padded to a lane-friendly 16


def _ray_features(o, d):
    """(N, 16) per-ray features [dir, pos×dir, pos, 1, 0...]."""
    n = o.shape[0]
    m = jnp.cross(o, d)
    ones = jnp.ones((n, 1), jnp.float32)
    zeros = jnp.zeros((n, _K - 10), jnp.float32)
    return jnp.concatenate([d, m, o, ones, zeros], axis=1)


def _tri_features(v0, v1, v2):
    """Four (16, T) matrices giving a, u_num, v_num, d_num per triangle."""
    e1 = v1 - v0
    e2 = v2 - v0
    nrm = jnp.cross(e1, e2)
    c0 = jnp.cross(e2, v0)
    c1 = jnp.cross(v0, e1)
    k = jnp.sum(v0 * nrm, axis=-1)
    t = v0.shape[0]
    z3 = jnp.zeros_like(v0)
    zc = jnp.zeros((t, 1), jnp.float32)
    zpad = jnp.zeros((t, _K - 10), jnp.float32)

    def col(dir_part, m_part, pos_part, const_part):
        return jnp.concatenate(
            [dir_part, m_part, pos_part, const_part, zpad], axis=1
        ).T  # (16, T)

    g_a = col(-nrm, z3, z3, zc)
    g_u = col(-c0, e2, z3, zc)
    g_v = col(-c1, -e1, z3, zc)
    g_d = col(z3, z3, nrm, -k[:, None])
    return g_a, g_u, g_v, g_d


def _dot_f32(x, w):
    """Full-fp32 MXU matmul (6 bf16 passes). Exact agreement with the
    XLA path; the default single-pass bf16 loses ~8 bits of mantissa,
    enough to flip nearest-hit indices on ~10% of rays."""
    return jnp.dot(x, w, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)


def _dot_split(x, w):
    """hi/lo bf16 split (3 bf16 passes, ~fp16-accurate): 1.5x faster
    than fp32; flips ~0.03% of nearest indices on near-ties — the
    "pallas_fast" mode."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(xh, wh, preferred_element_type=jnp.float32)
    acc += jnp.dot(xh, wl, preferred_element_type=jnp.float32)
    acc += jnp.dot(xl, wh, preferred_element_type=jnp.float32)
    return acc


def _kernel(rfeat, src, ga, gu, gv, gd, best_d, best_i, *, dot):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, _BIG)
        best_i[:] = jnp.full_like(best_i, -1)

    r = rfeat[:]                                   # (TILE_N, 16)
    a = dot(r, ga[:])
    u = dot(r, gu[:])
    v = dot(r, gv[:])
    dd = dot(r, gd[:])

    abs_a = jnp.abs(a)
    sgn = jnp.sign(a)
    us = u * sgn
    vs = v * sgn
    ds = dd * sgn
    valid = (
        (abs_a >= _EPS)
        & (us >= 0.0) & (us <= abs_a)
        & (vs >= 0.0) & (us + vs <= abs_a)
        & (ds > _EPS * abs_a) & (ds < _INV_EPS * abs_a)
    )
    tri_ids = j * TILE_T + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_N, TILE_T), 1
    )
    valid &= tri_ids != src[:]                     # src: (TILE_N, 1)
    dist = ds / jnp.where(abs_a > 0.0, abs_a, jnp.float32(1.0))
    dist = jnp.where(valid, dist, _BIG)

    blk_d = jnp.min(dist, axis=1, keepdims=True)   # (TILE_N, 1)
    blk_local = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]
    blk_i = jnp.where(blk_d >= _BIG, -1, blk_local + j * TILE_T)

    better = blk_d < best_d[:]   # strict: earlier (lower-index) block wins
    best_d[:] = jnp.where(better, blk_d, best_d[:])
    best_i[:] = jnp.where(better, blk_i, best_i[:])


def _pad0(x, m, fill=0):
    pad = (-x.shape[0]) % m
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
    )


def _forward(o, d, v0, v1, v2, src_idx, fast=False):
    n = o.shape[0]
    rfeat = _pad0(_ray_features(o, d), TILE_N)
    src = _pad0(src_idx.astype(jnp.int32), TILE_N, -1)[:, None]
    v0p = _pad0(v0, TILE_T)
    v1p = _pad0(v1, TILE_T)
    v2p = _pad0(v2, TILE_T)
    ga, gu, gv, gd = _tri_features(v0p, v1p, v2p)
    np_, tp = rfeat.shape[0], ga.shape[1]
    grid = (np_ // TILE_N, tp // TILE_T)

    kernel = functools.partial(
        _kernel, dot=_dot_split if fast else _dot_f32
    )
    best_d, best_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, _K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, TILE_T), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, TILE_T), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, TILE_T), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, TILE_T), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ],
    )(rfeat, src, ga, gu, gv, gd)
    return best_d[:n, 0], best_i[:n, 0]


def _dist_selected(o, d, v0, v1, v2, idx):
    """Differentiable distance of each ray to its selected triangle —
    O(N); the backward path of the kernel."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def nearest_hit_pallas_core(o, d, v0, v1, v2, src_idx, fast=False):
    return _forward(o, d, v0, v1, v2, src_idx, fast)


def _fwd(o, d, v0, v1, v2, src_idx, fast):
    dist, idx = _forward(o, d, v0, v1, v2, src_idx, fast)
    return (dist, idx), (o, d, v0, v1, v2, idx)


def _bwd(fast, res, cotangents):
    o, d, v0, v1, v2, idx = res
    d_bar, _ = cotangents  # idx is integer — no cotangent
    _, vjp = jax.vjp(
        lambda o_, d_, a_, b_, c_: _dist_selected(o_, d_, a_, b_, c_, idx),
        o, d, v0, v1, v2,
    )
    go, gd, g0, g1, g2 = vjp(d_bar)
    return go, gd, g0, g1, g2, None


nearest_hit_pallas_core.defvjp(_fwd, _bwd)


def nearest_hit_pallas(o, d, v0, v1, v2, src_idx,
                       cfg: RenderConfig | None = None,
                       fast: bool = False):
    """Drop-in ``nearest_hit`` with the fused Pallas kernel."""
    return nearest_hit_pallas_core(o, d, v0, v1, v2, src_idx, fast)
