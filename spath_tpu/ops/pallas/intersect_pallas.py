"""Tiled rays × triangles nearest-hit as a Pallas TPU kernel.

The XLA Plücker path (``ops/intersect.py``) materializes each
``(N, 4·tri_block)`` matmul result in HBM before the epilogue and argmin
read it back — at 100k triangles that is ~N·T·16 bytes of HBM traffic
per bounce. This kernel keeps everything on-chip (SURVEY.md §7 step 4's
"tiled rays×triangles Pallas kernel ... matmul-style blocking"):

  * grid = (ray tiles, triangle blocks), triangle block innermost;
  * per step: ONE MXU matmul ``(4·TILE_T, 128) @ (128, TILE_N)``
    produces the Möller–Trumbore quantities a, u·a, v·a, d·a for every
    pair in VMEM (the Plücker feature factorization of
    ``ops/intersect.py``). The K=128 dimension is NOT padding:
    fp32-accurate products are built by packing the 6 cross terms of
    the bf16 three-way split (hh, hm, mh, hl, mm, lh — exactly the
    product set of XLA's ``Precision.HIGHEST`` 6-pass algorithm) into
    K groups, so one single-pass bf16 matmul replaces six K-padded
    passes — the MXU's mandatory K=128 lane padding becomes the fp32
    emulation for free;
  * orientation is triangles-on-sublanes × rays-on-lanes (the same
    layout as the streamed megakernel sweep): the min/argmin reduce
    along SUBLANES, so per-ray results are lane-native (1, N) rows and
    nothing is ever transposed;
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.config import EPSILON, MAX_DIST, RenderConfig

_EPS = np.float32(EPSILON)
_INV_EPS = np.float32(1.0 / EPSILON)
_BIG = np.float32(MAX_DIST)

# Tile sizes: rays on lanes, triangles on sublanes; the (4·TILE_T,
# TILE_N) f32 quad buffer is 4 MB of VMEM, well under budget.
TILE_N = 1024
TILE_T = 256
#: triangle sub-blocks per grid step — amortizes per-step pipeline
#: overhead (kernel re-entry, output revisit) over 4 matmul+epilogue
#: rounds while temporaries stay one sub-block (~4 MB) at a time.
_NBLK = 4
_K = 16    # Plücker feature dim 10, padded to a lane-friendly 16
_KP = 128  # packed K: 6 split-term groups of 16 + 2 zero groups


def _ray_rows(o, d):
    """(16, N) per-ray feature rows [dir, pos×dir, pos, 1, 0...]."""
    n = o.shape[0]
    m = jnp.cross(o, d)
    ones = jnp.ones((1, n), jnp.float32)
    zeros = jnp.zeros((_K - 10, n), jnp.float32)
    return jnp.concatenate([d.T, m.T, o.T, ones, zeros], axis=0)


def _split3(x):
    """Exact 3-way bf16 split: x == hi + mid + lo in float32.

    fp32 has a 24-bit mantissa and bf16 an 8-bit one; each residual
    subtraction is exact (Sterbenz), so three bf16 terms reconstruct the
    fp32 value exactly.
    """
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def pack_lhs(x, fast: bool, axis: int = 1):
    """Pack ray-side features for the K-packed fp32-emulating matmul.

    Term groups along K (each a 16-wide slot): exact mode multiplies
    [xh, xh, xm, xh, xm, xl] against the rhs groups [wh, wm, wh, wl,
    wm, wh] — products hh+hm+mh+hl+mm+lh, the 6-term set of XLA's
    HIGHEST precision (dropped terms are < 2^-32 relative). Fast mode
    zeroes the mid groups, keeping hh+hl+lh (the old 3-pass hi/lo
    split); with packing both modes cost the SAME single MXU pass, so
    fast survives only for config compatibility.
    """
    h, m, l = _split3(x)
    z = jnp.zeros_like(h)
    groups = [h, z, z, h, z, l] if fast else [h, h, m, h, m, l]
    return jnp.concatenate(groups + [z, z], axis=axis)


def pack_rhs(w, axis: int = 0):
    """Pack triangle-side features: groups [wh, wm, wh, wl, wm, wh]
    (mode-independent — see ``pack_lhs``)."""
    h, m, l = _split3(w)
    z = jnp.zeros_like(h)
    return jnp.concatenate([h, m, h, l, m, h, z, z], axis=axis)


def pack_tri_blocks(v0, v1, v2, tile_t: int):
    """Streamed triangle table ``(4·Tp, 128)`` bf16 (Tp pre-padded to a
    multiple of ``tile_t``): block ``j`` occupies rows ``[4·tile_t·j,
    4·tile_t·(j+1))`` as [a | u_num | v_num | d_num] row groups of
    ``tile_t`` triangles each; the K=128 columns are the packed rhs
    split-term groups of ``pack_rhs``. Shared between this kernel's
    BlockSpec-pipelined grid and the HBM-streaming megakernel DMAs."""
    tp = v0.shape[0]
    quads = jnp.stack(_tri_features(v0, v1, v2))      # (4, 16, Tp) f32
    packed = pack_rhs(quads, axis=1)                  # (4, 128, Tp) bf16
    return (
        packed.reshape(4, _KP, tp // tile_t, tile_t)
        .transpose(2, 0, 3, 1)
        .reshape(4 * tp, _KP)
    )


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


def _dot1(x, w):
    """ONE bf16 MXU pass over K-packed operands — fp32-accurate by
    construction of ``pack_lhs``/``pack_rhs`` (bf16 products are exact
    in the fp32 accumulator; only the summation association differs
    from XLA's HIGHEST 6-pass within ~1 ulp)."""
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _kernel(gfeat, rfeat, src, best_d, best_i):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, _BIG)
        best_i[:] = jnp.full_like(best_i, -1)

    r = rfeat[:]                                     # (128, TILE_N) bf16
    src_row = src[:]                                 # (1, TILE_N) int32
    bd = best_d[:]
    bi = best_i[:]
    loc_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_T, TILE_N), 0)

    for s in range(_NBLK):
        blk = j * _NBLK + s                  # global triangle block id
        quads = _dot1(gfeat[s * 4 * TILE_T:(s + 1) * 4 * TILE_T], r)
        a = quads[0:TILE_T]                  # (TILE_T, TILE_N) f32
        u = quads[TILE_T:2 * TILE_T]
        v = quads[2 * TILE_T:3 * TILE_T]
        dd = quads[3 * TILE_T:4 * TILE_T]

        abs_a = jnp.abs(a)
        sgn = jnp.sign(a)
        us = u * sgn
        vs = v * sgn
        ds = dd * sgn
        # min3 form of the bounds: us>=0 & vs>=0 & us+vs<=abs_a
        inner = jnp.minimum(jnp.minimum(us, vs), abs_a - (us + vs))
        valid = (
            (abs_a >= _EPS)
            & (inner >= 0.0)
            & (ds > _EPS * abs_a) & (ds < _INV_EPS * abs_a)
        )
        # Local iota vs block-shifted source index (saves a (T, N) add).
        valid &= loc_iota != src_row - blk * TILE_T
        dist = ds / jnp.where(abs_a > 0.0, abs_a, jnp.float32(1.0))
        dist = jnp.where(valid, dist, _BIG)

        blk_d = jnp.min(dist, axis=0, keepdims=True)  # (1, TILE_N)
        # lowest tied local index — the XLA path's argmin tie-break
        loc = jnp.min(
            jnp.where(dist == blk_d, loc_iota, TILE_T),
            axis=0, keepdims=True,
        )
        blk_i = jnp.where(blk_d >= _BIG, -1, loc + blk * TILE_T)

        better = blk_d < bd  # strict: earlier (lower-index) block wins
        bd = jnp.where(better, blk_d, bd)
        bi = jnp.where(better, blk_i, bi)

    best_d[:] = bd
    best_i[:] = bi


def _pad0(x, m, fill=0):
    pad = (-x.shape[0]) % m
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
    )


def _forward(o, d, v0, v1, v2, src_idx, fast=False):
    n = o.shape[0]
    o_p = _pad0(o, TILE_N)
    d_p = _pad0(d, TILE_N)
    rfeat = pack_lhs(_ray_rows(o_p, d_p), fast, axis=0)  # (128, Np) bf16
    src = _pad0(src_idx.astype(jnp.int32), TILE_N, -1)[None, :]
    v0p = _pad0(v0, TILE_T * _NBLK)
    v1p = _pad0(v1, TILE_T * _NBLK)
    v2p = _pad0(v2, TILE_T * _NBLK)
    gfeat = pack_tri_blocks(v0p, v1p, v2p, TILE_T)     # (4·Tp, 128) bf16
    np_, tp = o_p.shape[0], v0p.shape[0]
    grid = (np_ // TILE_N, tp // (TILE_T * _NBLK))

    best_d, best_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4 * TILE_T * _NBLK, _KP), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KP, TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
        ],
    )(gfeat, rfeat, src)
    return best_d[0, :n], best_i[0, :n]


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
