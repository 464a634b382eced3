"""Whole-frame QUALITY path tracer in ONE Pallas launch.

The conformance megakernel (``megakernel.py``) fuses the reference
estimator; this kernel fuses the production one — cosine-weighted
hemisphere sampling, next-event estimation with area-reparameterized
light sampling, and the power-heuristic MIS combination
(``ops/nee.py``/``ops/sampling.py`` semantics) — using the counter-based
hash RNG (``ops/rng.py::hash_uniform``), which costs ~10 integer VPU ops
per draw and draws the SAME randoms as the XLA wavefront in
``cfg.rng='hash'`` mode, so kernel-vs-wavefront conformance is testable
the same way as the LCG mode.

Per bounce the kernel runs THREE O(T) sweeps over the SMEM scene table
(nearest hit, light selection+gather, shadow ray) — all unrolled for
small scenes and fori-loop'd above ``UNROLL_TRIS``. Light selection is a
categorical draw over the full table (prob 0 for dark triangles), which
keeps the table static under jit; the cdf/prob/area columns are
precomputed outside.

Forward/serving path only: ``jax.grad`` flows through the wavefront
renderer (``render_radiance``) instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from spath_tpu.config import RenderConfig
from spath_tpu.ops.pallas.megakernel import (
    _BIG as _MEGA_BIG,
)
from spath_tpu.ops.pallas.megakernel import (
    _EPS as _MEGA_EPS,
)
from spath_tpu.ops.pallas.megakernel import (
    _INV_EPS as _MEGA_INV_EPS,
)
from spath_tpu.ops.pallas.megakernel import (
    DEAD_TILE_SKIP,
    MAX_TRIS,
    UNROLL_TRIS,
    _gather_cols,
    _nearest,
)

_PI = np.float64(np.arccos(-1.0))
_INV_PI = np.float32(1.0 / _PI)
_GOLD = np.uint32(0x9E3779B9)
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_C1 = np.uint32(0x27D4EB2F)
_C2 = np.uint32(0x165667B1)
_C3 = np.uint32(0xD3A2646C)

#: quality table columns (T, 24):
#: v0(0:3) e1(3:6) e2(6:9) n(9:12) albedo(12:15) emission(15:18)
#: prob(18) area(19) cdf(20) pad(21:24)
_COL_PROB, _COL_AREA, _COL_CDF = 18, 19, 20


def _detach(x):
    """``stop_gradient`` — a no-op for the forward kernel, but it makes
    ``jax.grad`` of the (eagerly run) kernel body implement exactly the
    wavefront's detached-sampling policy, which is how the hand-written
    backward kernel is verified (see megakernel_grad.py)."""
    return lax.stop_gradient(x)


def _fmix(h):
    h = h ^ (h >> np.uint32(16))
    h = h * _M1
    h = h ^ (h >> np.uint32(13))
    h = h * _M2
    return h ^ (h >> np.uint32(16))


def _hash_draws(h0, sample, bounce: int, n_draws: int):
    """float32 uniforms for (sample, bounce); bit-identical to
    ``ops/rng.py::hash_uniform`` given ``h0 = seed*GOLD + pixel``."""
    h1 = _fmix(h0)
    s = sample.astype(jnp.uint32) * _C1
    us = []
    for d in range(n_draws):
        const = np.uint32((int(_C2) * bounce + int(_C3) * d) & 0xFFFFFFFF)
        h = h1 + (s + const)
        h = _fmix(h)
        bits = h >> np.uint32(8)
        us.append(bits.astype(jnp.int32).astype(jnp.float32)
                  * np.float32(2.0 ** -24))
    return us


def _select_gather_light(tri, u_sel, cols, n_tris):
    """Categorical draw over the cdf column FUSED with the column gather.

    Equivalent to ``li = min(count(cdf <= u), T-1)`` (``searchsorted``,
    side='right') followed by ``_gather_cols(tri, li, cols)`` — but in a
    single O(T) pass.  Because the cdf column is nondecreasing (a cumsum
    of non-negative probs), ``count == t`` exactly when
    ``cdf[t-1] <= u < cdf[t]`` (with ``cdf[-1] = -inf`` and the last row
    catching the clipped ``count == T`` case), so a one-hot crossing mask
    reproduces the counting semantics bit-for-bit — including ties from
    zero-probability (dark) triangles, whose repeated cdf values make the
    crossing land on the last of the run, same as the count.

    Returns ``(li, outs)``.
    """
    cols = tuple(cols)
    li = jnp.zeros_like(u_sel, dtype=jnp.int32)
    outs = [jnp.zeros_like(u_sel) for _ in cols]
    # NOTE: the crossing flag is carried as int32, not bool — Mosaic
    # cannot legalize an i1 vector as an scf.for loop carry, so a bool
    # carry compiles in interpret mode but fails on real TPU.
    prev_le = jnp.ones_like(li)                       # cdf[-1] = -inf

    def step(t, li, outs, prev_le, last: bool):
        le = (tri[t, _COL_CDF] <= u_sel).astype(jnp.int32)
        m = (prev_le if last else prev_le * (1 - le)) != 0
        li = jnp.where(m, t, li)
        outs = [jnp.where(m, tri[t, c], o) for c, o in zip(cols, outs)]
        return li, outs, le

    if n_tris <= UNROLL_TRIS:
        for t in range(n_tris):
            li, outs, prev_le = step(t, li, outs, prev_le,
                                     t == n_tris - 1)
        return li, outs

    def body(t, carry):
        li, outs, prev_le = carry
        li, outs, le = step(t, li, outs, prev_le, False)
        return li, tuple(outs), le

    li, outs, prev_le = lax.fori_loop(
        0, n_tris - 1, body, (li, tuple(outs), prev_le))
    li, outs, _ = step(n_tris - 1, li, list(outs), prev_le, True)
    return li, outs


def _select_gather_light_static(tri, u_sel, cols, light_rows, n_tris):
    """``_select_gather_light`` walking ONLY the (static) emissive rows.

    Zero-probability rows repeat the previous cdf value exactly (the
    cumsum adds 0.0), so the crossing can only land on a light row — or
    on the clipped last row ``T-1`` when ``u >= cdf[-1]`` (possible when
    the float cumsum tops out below u). Walking the static light list
    plus one clip step therefore reproduces the full O(T) walk's
    ``li``/columns BIT-FOR-BIT at O(L) cost — the dominant NEE overhead
    at few-light scenes (each step selects 18 columns).
    """
    cols = tuple(cols)
    li = jnp.zeros_like(u_sel, dtype=jnp.int32)
    outs = [jnp.zeros_like(u_sel) for _ in cols]
    prev_le = jnp.ones_like(u_sel, dtype=jnp.bool_)   # cdf[-1] = -inf

    def take(t, m, li, outs):
        li = jnp.where(m, t, li)
        return li, [jnp.where(m, tri[t, c], o)
                    for c, o in zip(cols, outs)]

    for t in light_rows:
        le = tri[t, _COL_CDF] <= u_sel
        li, outs = take(t, prev_le & jnp.logical_not(le), li, outs)
        prev_le = le
    # the clipped count == T case lands on the last row (same row the
    # full walk picks; dark rows carry prob 0, so it never contributes)
    li, outs = take(n_tris - 1, prev_le, li, outs)
    return li, outs


def _mt2_step(t, ox, oy, oz, d1, d2, src, tri, b1, b2):
    """Möller–Trumbore of TWO rays sharing an origin against triangle
    ``t`` in one pass over the table row.

    The origin-only quantities — ``s = o - v0``, ``q = s × e1`` and
    ``e2·q`` — are computed once and shared (the identical float
    expressions of ``megakernel._mt_step``, so each ray's result is
    bit-equal to two separate sweeps). ``b1``/``b2`` are the running
    ``(best_d, best_i)`` pairs.
    """
    v0x, v0y, v0z = tri[t, 0], tri[t, 1], tri[t, 2]
    e1x, e1y, e1z = tri[t, 3], tri[t, 4], tri[t, 5]
    e2x, e2y, e2z = tri[t, 6], tri[t, 7], tri[t, 8]
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    e2q = e2x * qx + e2y * qy + e2z * qz

    def one(d, best):
        dx, dy, dz = d
        best_d, best_i = best
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        nondeg = jnp.abs(a) >= _MEGA_EPS
        f = jnp.float32(1.0) / jnp.where(nondeg, a, jnp.float32(1.0))
        u = f * (sx * hx + sy * hy + sz * hz)
        v = f * (dx * qx + dy * qy + dz * qz)
        dist = f * e2q
        ok = (
            nondeg
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (dist > _MEGA_EPS) & (dist < _MEGA_INV_EPS)
            & (src != t)
            & (dist < best_d)
        )
        return jnp.where(ok, dist, best_d), jnp.where(ok, t, best_i)

    return one(d1, b1), one(d2, b2)


def _nearest2(o, d1, d2, src, tri, n_tris):
    """Two nearest-hit sweeps sharing one walk of the SMEM table.

    Returns ``((best_d1, best_i1), (best_d2, best_i2))`` — bit-equal to
    two independent ``_nearest`` calls with the same origin (the shadow
    ray and the next bounce ray both start at the hit point)."""
    ox, oy, oz = o
    big = jnp.full_like(ox, _MEGA_BIG)
    none = jnp.full_like(src, -1)
    b1 = (big, none)
    b2 = (big, none)
    if n_tris <= UNROLL_TRIS:
        for t in range(n_tris):
            b1, b2 = _mt2_step(t, ox, oy, oz, d1, d2, src, tri, b1, b2)
        return b1, b2

    def body(t, carry):
        b1, b2 = carry
        return _mt2_step(t, ox, oy, oz, d1, d2, src, tri, b1, b2)

    return lax.fori_loop(0, n_tris, body, (b1, b2))


def _make_ctx(rays, keys, tri, cfg: RenderConfig, n_tris: int,
              light_rows=None):
    """Per-tile trace context shared by the forward and backward kernels.

    The estimator body (``_sample_walk``) is intersection-backend
    agnostic: every O(T) operation goes through the hook functions built
    here. This SMEM backend walks the scalar triangle table
    (``_nearest``/``_nearest2``/``_gather_cols``); the HBM-streamed
    backend (``megakernel_bigscene_quality``) builds the same hooks from
    MXU sweeps, so both kernels run the IDENTICAL shading/sampling/NEE
    float ops by construction.

    Hook contract (all rays/values are ``(1, N)`` rows):

      * ``nearest1(o3, d3, src) -> (dist, idx, attr)`` — nearest hit;
        ``attr`` is backend-private payload (None here).
      * ``nearest2(o3, d_sh, d_nx, src) -> ((_, occ), (dist, idx, attr))``
        — fused shadow-occlusion + next-bounce sweep (shared origin).
      * ``hit_shading(idx, attr) -> 11 rows`` n(3) alb(3) emi(3) prob area.
      * ``hit_geo(idx, attr) -> 9 rows`` v0(3) e1(3) e2(3).
      * ``select_light(u) -> (li, 17 rows)`` — categorical cdf draw;
        ``li`` is the GLOBAL triangle index; rows are v0(3) e1(3) e2(3)
        n(3) em(3) prob area.
    """
    ox0, oy0, oz0 = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx0, dy0, dz0 = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    src0 = jnp.full_like(ox0, -1.0).astype(jnp.int32)

    def nearest1(o, d, src):
        dist, idx = _nearest(*o, *d, src, tri, n_tris)
        return dist, idx, None

    def nearest2(o, d_sh, d_nx, src):
        (occ_d, occ_i), (dist, idx) = _nearest2(o, d_sh, d_nx, src, tri,
                                                n_tris)
        return (occ_d, occ_i), (dist, idx, None)

    def hit_shading(idx, attr):
        return _gather_cols(
            tri, idx,
            (9, 10, 11, 12, 13, 14, 15, 16, 17, _COL_PROB, _COL_AREA),
            n_tris,
        )

    def hit_geo(idx, attr):
        return _gather_cols(tri, idx, tuple(range(9)), n_tris)

    _lsel_cols = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
                  15, 16, 17, _COL_PROB, _COL_AREA)

    def select_light(u):
        if light_rows is not None:
            return _select_gather_light_static(
                tri, u, _lsel_cols, light_rows, n_tris)
        return _select_gather_light(tri, u, _lsel_cols, n_tris)

    fh = nearest1((ox0, oy0, oz0), (dx0, dy0, dz0), src0)
    return dict(
        o0=(ox0, oy0, oz0), d0=(dx0, dy0, dz0), src0=src0, fh=fh,
        h0=keys[0:1, :], cfg=cfg,
        nearest1=nearest1, nearest2=nearest2, hit_shading=hit_shading,
        hit_geo=hit_geo, select_light=select_light,
    )


def _sample_walk(s, ctx):
    """One sample's full bounce walk for every lane of the tile.

    Returns ``(rad_r, rad_g, rad_b, saved)`` where ``saved`` is a list of
    per-bounce dicts holding everything the reverse sweep needs. The
    forward kernel discards ``saved`` (XLA dead-code-eliminates it); the
    backward kernel replays this exact function, so forward and replay
    are the same traced computation by construction.
    """
    cfg = ctx["cfg"]
    (ox0, oy0, oz0), (dx0, dy0, dz0) = ctx["o0"], ctx["d0"]
    src0, (fh_d, fh_i, fh_a), h0 = ctx["src0"], ctx["fh"], ctx["h0"]
    use_mis = cfg.nee and cfg.mis
    n_draws = (5 if cfg.nee else 2) + (1 if cfg.rr_start else 0)
    saved = []

    if True:  # keep the historical indentation of the bounce walk
        ox, oy, oz = ox0, oy0, oz0
        dx, dy, dz = dx0, dy0, dz0
        src = src0
        alive = jnp.ones_like(ox, dtype=jnp.bool_)
        tr_r = jnp.ones_like(ox)
        tr_g = jnp.ones_like(ox)
        tr_b = jnp.ones_like(ox)
        rad_r = jnp.zeros_like(ox)
        rad_g = jnp.zeros_like(ox)
        rad_b = jnp.zeros_like(ox)
        prev_pdf = jnp.zeros_like(ox)
        # NEE mode pipelines the walk: bounce b's fused sweep
        # (``nearest2``) produces BOTH b's shadow occlusion and b+1's
        # nearest hit from their shared origin, so (dist, idx) is carried
        # across iterations instead of recomputed at the top.
        dist, idx, attr = fh_d, fh_i, fh_a

        for bounce in range(cfg.max_bounces):
            last = bounce == cfg.max_bounces - 1
            if bounce > 0 and not cfg.nee:
                dist, idx, attr = ctx["nearest1"](
                    (ox, oy, oz), (dx, dy, dz), src)
            hit = alive & (idx >= 0)
            (nx, ny, nz, ar, ag, ab_, er, eg, eb_,
             hprob, harea) = ctx["hit_shading"](idx, attr)
            # hit point
            px = ox + dist * dx
            py = oy + dist * dy
            pz = oz + dist * dz
            flip = nx * dx + ny * dy + nz * dz > 0.0
            anx = jnp.where(flip, -nx, nx)
            any_ = jnp.where(flip, -ny, ny)
            anz = jnp.where(flip, -nz, nz)

            us = _hash_draws(h0, s, bounce, n_draws)

            # --- emitter-hit term (BSDF strategy) ---
            if cfg.nee:
                if bounce == 0:
                    w_b = jnp.ones_like(ox)
                elif use_mis:
                    # nee pdf this hit would have had (ops/nee.py
                    # ::nee_pdf_of_hit), vs the recorded bsdf pdf
                    cos_l_hit = jnp.abs(nx * dx + ny * dy + nz * dz)
                    dmin = jnp.minimum(dist, np.float32(1e6))
                    p_nee_here = (
                        hprob / jnp.maximum(harea, np.float32(1e-20))
                    ) * dmin * dmin / jnp.maximum(cos_l_hit,
                                                  np.float32(1e-6))
                    w_b = _detach(prev_pdf * prev_pdf / jnp.maximum(
                        prev_pdf * prev_pdf + p_nee_here * p_nee_here,
                        np.float32(1e-30),
                    ))
                else:
                    w_b = jnp.zeros_like(ox)   # pure NEE drops them
                rad_r = rad_r + jnp.where(hit, tr_r * er * w_b, 0.0)
                rad_g = rad_g + jnp.where(hit, tr_g * eg * w_b, 0.0)
                rad_b = rad_b + jnp.where(hit, tr_b * eb_ * w_b, 0.0)
            else:
                rad_r = rad_r + jnp.where(hit, tr_r * er, 0.0)
                rad_g = rad_g + jnp.where(hit, tr_g * eg, 0.0)
                rad_b = rad_b + jnp.where(hit, tr_b * eb_, 0.0)

            # --- cosine-weighted bounce direction (ops/sampling.py) ---
            u0 = us[0]
            if cfg.stratify and bounce == 0:
                # First-bounce azimuth stratified across the spp samples:
                # substream s draws from [s/spp, (s+1)/spp) — same
                # transform (and float ops) as the wavefront's.
                u0 = (s.astype(jnp.float32) + u0) * np.float32(
                    1.0 / cfg.spp)
            phi = u0 * np.float32(2.0 * _PI)
            r_ = jnp.sqrt(jnp.maximum(1.0 - us[1], 0.0))
            z_ = jnp.sqrt(us[1])
            sgn = jnp.where(anz >= 0.0, 1.0, -1.0).astype(jnp.float32)
            a_ = jnp.float32(-1.0) / (sgn + anz)
            b_ = anx * any_ * a_
            tx = 1.0 + sgn * anx * anx * a_
            ty = sgn * b_
            tz = -sgn * anx
            btx = b_
            bty = sgn + any_ * any_ * a_
            btz = -any_
            cp = jnp.cos(phi) * r_
            sp = jnp.sin(phi) * r_
            # detached sampling: the bounce direction is a constant of
            # the backward pass (models/pathtracer.py policy)
            ndx = _detach(tx * cp + btx * sp + anx * z_)
            ndy = _detach(ty * cp + bty * sp + any_ * z_)
            ndz = _detach(tz * cp + btz * sp + anz * z_)

            # Next-ray state (the advance), hoisted above the NEE sweep:
            # the shadow ray and the next bounce ray share their origin,
            # so ONE fused table walk (``_nearest2``) produces both this
            # bounce's occlusion and the next bounce's nearest hit.
            onx = jnp.where(hit, px, ox)
            ony = jnp.where(hit, py, oy)
            onz = jnp.where(hit, pz, oz)
            dnx = jnp.where(hit, ndx, dx)
            dny = jnp.where(hit, ndy, dy)
            dnz = jnp.where(hit, ndz, dz)
            srcn = jnp.where(hit, idx, src)

            # --- NEE direct light (ops/nee.py::direct_light) ---
            if cfg.nee:
                li, (lv0x, lv0y, lv0z, le1x, le1y, le1z,
                     le2x, le2y, le2z, lnx, lny, lnz,
                     lemr, lemg, lemb, lprob, larea) = \
                    ctx["select_light"](us[2])
                su1 = jnp.sqrt(us[3])
                b1 = 1.0 - su1
                b2 = us[4] * su1
                yx = lv0x + b1 * le1x + b2 * le2x
                yy = lv0y + b1 * le1y + b2 * le2y
                yz = lv0z + b1 * le1z + b2 * le2z
                delx, dely, delz = yx - px, yy - py, yz - pz
                r2 = delx * delx + dely * dely + delz * delz
                rl = jnp.sqrt(jnp.maximum(r2, np.float32(1e-20)))
                omx, omy, omz = delx / rl, dely / rl, delz / rl
                cos_s = anx * omx + any_ * omy + anz * omz
                cos_l = jnp.abs(lnx * omx + lny * omy + lnz * omz)
                safe_src = jnp.maximum(idx, 0)
                # Occlusion (and, pipelined, the next nearest hit). On
                # hit lanes the shared origin/src equal the wavefront's
                # (px == onx, idx == srcn); dead lanes are masked below.
                if last:
                    _, occ, _ = ctx["nearest1"](
                        (onx, ony, onz), (omx, omy, omz), srcn)
                    nxt = (dist, idx, attr)
                else:
                    (_, occ), nxt = ctx["nearest2"](
                        (onx, ony, onz), (omx, omy, omz),
                        (dnx, dny, dnz), srcn)
                valid = (
                    (occ == li) & (lprob > 0.0) & (cos_s > 0.0)
                    & (li != safe_src)
                )
                g = cos_s * cos_l / jnp.maximum(r2, np.float32(1e-12))
                # selection probability is detached (light_cdf policy)
                wgt = larea / jnp.maximum(_detach(lprob),
                                          np.float32(1e-20))
                scale = g * wgt * _INV_PI
                if use_mis:
                    p_nee = (
                        lprob / jnp.maximum(larea, np.float32(1e-20))
                    ) * jnp.minimum(r2, np.float32(1e12)) / jnp.maximum(
                        cos_l, np.float32(1e-6))
                    p_bsdf = jnp.maximum(cos_s, 0.0) * _INV_PI
                    misw = _detach(p_nee * p_nee / jnp.maximum(
                        p_nee * p_nee + p_bsdf * p_bsdf,
                        np.float32(1e-30)))
                else:
                    misw = jnp.ones_like(ox)
                scale = scale * misw
                ok = hit & valid
                rad_r = rad_r + jnp.where(ok, tr_r * ar * lemr * scale, 0.0)
                rad_g = rad_g + jnp.where(ok, tr_g * ag * lemg * scale, 0.0)
                rad_b = rad_b + jnp.where(
                    ok, tr_b * ab_ * lemb * scale, 0.0)

            # Reverse-sweep state. The surface-triangle geometry gather
            # exists ONLY here, so the forward kernel (which discards
            # `saved`) never pays for it.
            sv = dict(
                o=(ox, oy, oz), d=(dx, dy, dz), dist=dist, idx=idx,
                hit=hit, tr=(tr_r, tr_g, tr_b), alb=(ar, ag, ab_),
                emi=(er, eg, eb_), an=(anx, any_, anz),
                fs=jnp.where(flip, -1.0, 1.0).astype(jnp.float32),
                geo=ctx["hit_geo"](idx, attr),
            )
            if cfg.nee:
                sv.update(
                    w_b=w_b, ok=ok,
                    lv0=(lv0x, lv0y, lv0z), le1=(le1x, le1y, le1z),
                    le2=(le2x, le2y, le2z), ln=(lnx, lny, lnz),
                    lem=(lemr, lemg, lemb), lprob=lprob, larea=larea,
                    li=li, b1=b1, b2=b2, misw=misw,
                )
            saved.append(sv)

            # --- advance (cosine weight = 1: pdf cancels BRDF·cosθ) ---
            tr_r = jnp.where(hit, tr_r * ar, tr_r)
            tr_g = jnp.where(hit, tr_g * ag, tr_g)
            tr_b = jnp.where(hit, tr_b * ab_, tr_b)
            ox, oy, oz = onx, ony, onz
            dx, dy, dz = dnx, dny, dnz
            src = srcn
            alive = hit
            if cfg.rr_start and bounce >= cfg.rr_start and not last:
                # Russian roulette on the continuation: survive with
                # probability q = max throughput component, reweight by
                # 1/q. Decision detached; the reweight keeps gradients
                # (models/pathtracer.py policy, same float ops).
                q = _detach(jnp.clip(
                    jnp.maximum(jnp.maximum(tr_r, tr_g), tr_b),
                    0.05, 1.0))
                rrs = hit & (us[-1] < q)
                tr_r = jnp.where(rrs, tr_r / q, tr_r)
                tr_g = jnp.where(rrs, tr_g / q, tr_g)
                tr_b = jnp.where(rrs, tr_b / q, tr_b)
                alive = rrs
                sv.update(rrs=rrs, rrq=q)
            if use_mis:
                cos_next = ndx * anx + ndy * any_ + ndz * anz
                prev_pdf = _detach(jnp.maximum(cos_next, 0.0) * _INV_PI)
            if cfg.nee and not last:
                dist, idx, attr = nxt

    return rad_r, rad_g, rad_b, saved


def _quality_kernel(rays, keys, tri, out, *, cfg: RenderConfig,
                    n_tris: int, light_rows=None):
    ctx = _make_ctx(rays, keys, tri, cfg, n_tris, light_rows)

    def sample_body(s, carry):
        acc_r, acc_g, acc_b = carry
        rad_r, rad_g, rad_b, _ = _sample_walk(s, ctx)
        return (acc_r + rad_r, acc_g + rad_g, acc_b + rad_b)

    zeros = jnp.zeros_like(ctx["o0"][0])
    inv = np.float32(1.0) / np.float32(cfg.spp)

    def run_loop():
        acc_r, acc_g, acc_b = lax.fori_loop(
            0, cfg.spp, sample_body, (zeros, zeros, zeros)
        )
        out[0:1, :] = acc_r * inv
        out[1:2, :] = acc_g * inv
        out[2:3, :] = acc_b * inv
        out[3:4, :] = zeros

    if not DEAD_TILE_SKIP:
        run_loop()
        return

    # Dead-tile skip (see megakernel.py): all-camera-miss tiles produce
    # exact zeros for every sample and bounce, so skip the sample loop.
    # Structured as result-free pl.when branches that each write `out`
    # directly (a lax.cond RETURNING the (1, N) accumulators makes
    # Mosaic materialize branch-result layouts — measured slower).
    live = jnp.any(ctx["fh"][1] >= 0)
    pl.when(live)(run_loop)

    @pl.when(jnp.logical_not(live))
    def _():
        out[0:4, :] = jnp.zeros((4, zeros.shape[1]), jnp.float32)


def quality_table(scene):
    """(T, 24) table: conformance cols 0..17 + prob/area/cdf (18..20)."""
    from spath_tpu.ops.nee import light_cdf, triangle_areas
    from spath_tpu.ops.pallas.megakernel import _scene_table

    base = _scene_table(scene)[:, :18]
    cdf, prob = light_cdf(scene)
    area = triangle_areas(scene)
    pad = jnp.zeros((scene.n_tris, 3), jnp.float32)
    return jnp.concatenate(
        [base, prob[:, None], area[:, None], cdf[:, None], pad], axis=1
    )


def supported(scene, cfg: RenderConfig) -> bool:
    return (
        scene.n_tris <= MAX_TRIS
        and cfg.rng == "hash"
        and cfg.sampler == "cosine"
    )


def render_radiance_quality_megakernel(scene, camera, cfg: RenderConfig,
                                       seed=0):
    """Unclamped mean radiance ``(H, W, 3)`` via the fused quality kernel.

    Forward-only; hash-RNG cosine(+NEE/MIS) estimator — see ``supported``.
    """
    from spath_tpu.ops.pallas.megakernel import pack_rays

    if not supported(scene, cfg):
        raise ValueError(
            "quality megakernel needs rng='hash', sampler='cosine', "
            "T <= MAX_TRIS")
    rays, pix, n = pack_rays(camera, cfg, 0)
    keys = jnp.asarray(seed).astype(jnp.uint32) * _GOLD + pix
    tri = quality_table(scene)
    from spath_tpu.ops.pallas.megakernel import (
        TILE_N,
        order_rays_live_first,
        unpermute_rows,
    )
    from spath_tpu.ops.pallas.megakernel_quality_grad import quality_call

    if DEAD_TILE_SKIP and rays.shape[1] > TILE_N:
        # live-first ordering: bit-exact, coalesces miss lanes into
        # whole dead tiles the kernel's pl.when skips (megakernel.py)
        rays, keys, order, _ = order_rays_live_first(scene, rays, keys, cfg)
        out = unpermute_rows(
            quality_call(rays, keys, tri, cfg, scene.n_tris,
                         scene.light_idx), order)
    else:
        out = quality_call(rays, keys, tri, cfg, scene.n_tris,
                           scene.light_idx)
    return out[:3, :n].T.reshape(cfg.height, cfg.width, 3)
