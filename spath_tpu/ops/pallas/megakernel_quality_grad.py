"""Hand-written backward pass for the fused QUALITY megakernel.

Extends the conformance reverse sweep (``megakernel_grad.py``) with the
NEE adjoint — where, unlike the pure-BSDF estimator, the POSITION chain
is live: the direct-light term depends on the hit point p through
``omega = (y - p)/r``, ``r^2``, and both cosines, so gradients flow to
light vertices (via the area reparameterization y = v0 + b1 e1 + b2 e2),
to surface/blocker geometry (via the Moller-Trumbore distance VJP), to
light normals and areas (table columns), and to the camera ray.

Detachment policy matches ``models/pathtracer.py`` / ``ops/nee.py``
exactly — and is ENCODED IN THE FORWARD BODY itself via stop_gradient
(``megakernel_quality._sample_walk``), so ``jax.grad`` of the eagerly
run forward body is the ground truth the hand-written sweep is verified
against (bit-comparable: the replay IS the same traced function).

Adjoint accumulator layout per triangle (19 columns):
v0(0:3) e1(3:6) e2(6:9) n(9:12) albedo(12:15) emission(15:18) area(18)
— scattered at the surface index (idx) for the distance/shading chains
and at the light index (li) for the NEE chain, lane-parallel, reduced
over lanes once in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.config import RenderConfig
from spath_tpu.ops.pallas.megakernel import (
    DEAD_TILE_SKIP,
    _nearest,
    pack_rays,
    tile_for,
)
from spath_tpu.ops.pallas.megakernel_grad import (
    GRAD_MAX_TRIS,
    GRAD_UNROLL_TRIS,
    _SROWS,
    _acc_tp,
    _scatter_rows,
)
from spath_tpu.ops.pallas.megakernel_quality import (
    _GOLD,
    _INV_PI,
    _make_ctx,
    _sample_walk,
    quality_table,
)
from spath_tpu.ops.pallas.megakernel_quality import (
    supported as _fwd_supported,
)

#: adjoint columns per triangle (see module docstring)
_QCOLS = 19


def supported_grad(scene, cfg: RenderConfig) -> bool:
    # vis_grad's warped/boundary adjoints live only in the wavefront
    return (_fwd_supported(scene, cfg) and scene.n_tris <= GRAD_MAX_TRIS
            and not cfg.vis_grad)


def _qaccr(n_tris: int) -> int:
    return max(8, -((-n_tris * _QCOLS) // 8) * 8)


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _reverse_bounce(sv, tb, ob, g3, cfg: RenderConfig, zrow):
    """One bounce of the quality reverse sweep — pure row math on the
    forward replay's saved state, no O(T) operations. Shared by the
    SMEM-table backward kernel (here) and the HBM-streamed one
    (``megakernel_bigscene_quality``), which differ only in how the
    returned per-lane contribution rows are scattered to triangles.

    Inputs: ``tb``/``ob`` are thr-bar_{b+1} / o-bar_{b+1} (3 rows each).
    Returns a dict:
      * ``tb``   — thr-bar_b (3 rows)
      * ``onew`` — o-bar_b (3 rows; camera-origin adjoint at bounce 0)
      * ``gry_d``— camera-direction adjoint rows (only used at bounce 0)
      * ``surf`` — 18 contribution rows at the HIT index
        (v0,e1,e2,n,albedo,emission bars; zero on non-hit lanes)
      * ``light``— 19 contribution rows at the LIGHT index or None
        (v0,e1,e2,n bars, 3 pad rows, emission bars, area bar; zero on
        non-ok lanes)
    """
    hit = sv["hit"]
    dist = sv["dist"]
    o, d = sv["o"], sv["d"]
    tr, alb, emi = sv["tr"], sv["alb"], sv["emi"]
    an, fs = sv["an"], sv["fs"]

    # Russian roulette: the continuation throughput carries a detached
    # 1/q reweight on surviving lanes, so the incoming throughput
    # adjoint picks up the same factor before the albedo chain
    # (megakernel_quality._sample_walk rr block).
    if "rrs" in sv:
        tb = [jnp.where(sv["rrs"], tb[c] / sv["rrq"], tb[c])
              for c in range(3)]

    # --- emitter-hit term ---
    ew = sv["w_b"] if cfg.nee else jnp.ones_like(zrow)
    ebar = [jnp.where(hit, g3[c] * tr[c] * ew, 0.0) for c in range(3)]
    tb_new = [
        jnp.where(hit, tb[c] * alb[c], tb[c])
        + jnp.where(hit, g3[c] * emi[c] * ew, 0.0)
        for c in range(3)
    ]
    # continuation albedo adjoint (uses INCOMING tb)
    albbar = [jnp.where(hit, tb[c] * tr[c], 0.0) for c in range(3)]
    nrawbar = [zrow, zrow, zrow]
    pbar = [jnp.where(hit, ob[c], 0.0) for c in range(3)]

    light = None
    if cfg.nee:
        ok = sv["ok"]
        lv0, le1, le2 = sv["lv0"], sv["le1"], sv["le2"]
        ln, lem = sv["ln"], sv["lem"]
        lprob, larea = sv["lprob"], sv["larea"]
        b1, b2, misw = sv["b1"], sv["b2"], sv["misw"]
        # recompute NEE geometry (cheap, no O(T) sweeps)
        p = [o[c] + dist * d[c] for c in range(3)]
        y = [lv0[c] + b1 * le1[c] + b2 * le2[c] for c in range(3)]
        dl = [y[c] - p[c] for c in range(3)]
        r2 = _dot(dl, dl)
        rl = jnp.sqrt(jnp.maximum(r2, np.float32(1e-20)))
        om = [dl[c] / rl for c in range(3)]
        cos_s = _dot(an, om)
        q = _dot(ln, om)
        cos_l = jnp.abs(q)
        r2m = jnp.maximum(r2, np.float32(1e-12))
        g = cos_s * cos_l / r2m
        wden = jnp.maximum(lprob, np.float32(1e-20))
        wgt = larea / wden
        scale = g * wgt * _INV_PI * misw

        # rad_c += ok * tr_c*alb_c*lem_c*scale
        sbar = zrow
        lembar = []
        for c in range(3):
            gc = jnp.where(ok, g3[c], 0.0)
            tb_new[c] = tb_new[c] + jnp.where(
                ok, g3[c] * alb[c] * lem[c] * scale, 0.0)
            albbar[c] = albbar[c] + jnp.where(
                ok, g3[c] * tr[c] * lem[c] * scale, 0.0)
            lembar.append(jnp.where(
                ok, g3[c] * tr[c] * alb[c] * scale, 0.0))
            sbar = sbar + gc * tr[c] * alb[c] * lem[c]
        gbar_g = sbar * wgt * _INV_PI * misw
        wgtbar = sbar * g * _INV_PI * misw
        areabar = wgtbar / wden
        cosbar_s = gbar_g * cos_l / r2m
        cosbar_l = gbar_g * cos_s / r2m
        r2bar = jnp.where(
            r2 >= np.float32(1e-12),
            -gbar_g * cos_s * cos_l / (r2m * r2m), 0.0)
        qbar = jnp.sign(q) * cosbar_l
        lnbar = [qbar * om[c] for c in range(3)]
        for c in range(3):
            nrawbar[c] = nrawbar[c] + fs * (cosbar_s * om[c])
        ombar = [cosbar_s * an[c] + qbar * ln[c] for c in range(3)]
        dlbar = [ombar[c] / rl for c in range(3)]
        rlbar = -_dot(ombar, dl) / (rl * rl)
        r2bar = r2bar + jnp.where(
            r2 >= np.float32(1e-20), rlbar / (rl + rl), 0.0)
        two = jnp.float32(2.0)
        dlbar = [dlbar[c] + two * r2bar * dl[c] for c in range(3)]
        lv0bar = dlbar
        le1bar = [b1 * dlbar[c] for c in range(3)]
        le2bar = [b2 * dlbar[c] for c in range(3)]
        for c in range(3):
            pbar[c] = pbar[c] - dlbar[c]
        light = (tuple(lv0bar) + tuple(le1bar)
                 + tuple(le2bar) + tuple(lnbar)   # cols 0..11
                 + (zrow, zrow, zrow)             # 12..14 (no albedo)
                 + tuple(lembar)                  # 15..17
                 + (areabar,))                    # 18

    # --- Moller-Trumbore distance chain (live when pbar != 0) ---
    distbar = _dot(pbar, d)
    v0 = tuple(sv["geo"][0:3])
    e1 = tuple(sv["geo"][3:6])
    e2 = tuple(sv["geo"][6:9])
    s_ = tuple(o[c] - v0[c] for c in range(3))
    h = _cross(d, e2)
    a = _dot(e1, h)
    fa = jnp.float32(1.0) / jnp.where(hit, a, jnp.float32(1.0))
    g1 = jnp.where(hit, distbar * fa, 0.0)
    tn = _cross(e1, e2)
    c1 = _cross(e2, s_)
    c2 = _cross(s_, e1)
    c3 = _cross(e1, d)
    v0bar = tuple(-g1 * tn[c] for c in range(3))
    e1bar = tuple(g1 * (c1[c] - dist * h[c]) for c in range(3))
    e2bar = tuple(g1 * (c2[c] - dist * c3[c]) for c in range(3))
    surf = (v0bar + e1bar + e2bar + tuple(nrawbar)
            + tuple(albbar) + tuple(ebar))          # cols 0..17

    onew = [
        jnp.where(hit, 0.0, ob[c]) + pbar[c] + g1 * tn[c]
        for c in range(3)
    ]
    gry_d = [jnp.where(hit, dist * pbar[c] + g1 * dist * tn[c], 0.0)
             for c in range(3)]
    return dict(tb=tb_new, onew=onew, gry_d=gry_d, surf=surf,
                light=light)


def _bwd_tile_quality(rays, keys, tri, gbar, *, cfg: RenderConfig,
                      n_tris: int, unroll_samples: bool = False,
                      light_rows=None):
    """Pure per-tile adjoint of the quality estimator.

    Returns ``(gtab_rows (ACCR, N), gray_rows (8, N))``.

    ``unroll_samples``: run the sample loop at the Python level instead
    of ``lax.fori_loop``. Needed ONLY by the eager exactness tests: an
    eager ``fori_loop`` body is compiled, and compiled trig rounds
    differently from eager trig, flipping a few chaotic paths between
    the replay and the autodiff ground truth's eager primal.
    """
    ctx = _make_ctx(rays, keys, tri, cfg, n_tris, light_rows)
    ox0 = ctx["o0"][0]
    zrow = jnp.zeros_like(ox0)
    inv = np.float32(1.0 / cfg.spp)
    g3 = (gbar[0:1, :] * inv, gbar[1:2, :] * inv, gbar[2:3, :] * inv)
    nb = cfg.max_bounces
    nacc = n_tris * _QCOLS

    def sample_body(s, carry):
        acc, gry = carry
        acc = list(acc)
        gry = list(gry)
        _, _, _, saved = _sample_walk(s, ctx)

        tb = [zrow, zrow, zrow]          # thr-bar_{b+1}
        ob = [zrow, zrow, zrow]          # o-bar_{b+1}
        for bounce in reversed(range(nb)):
            sv = saved[bounce]
            rb = _reverse_bounce(sv, tb, ob, g3, cfg, zrow)
            hit, idx = sv["hit"], sv["idx"]
            surf, light = rb["surf"], rb["light"]

            # --- scatter into per-triangle accumulators ---
            if scatter:
                # surface chain at idx: every surf row is zero on
                # non-hit lanes (each bar is hit/ok-masked above)
                acc[0] = _scatter_rows(
                    acc[0], surf, jnp.where(hit, idx, -1), tp)
                if light is not None:
                    # NEE chain at li: all rows are ok-masked (every
                    # bar is proportional to the ok-masked sbar/g3)
                    acc[0] = _scatter_rows(
                        acc[0], light,
                        jnp.where(sv["ok"], sv["li"], -1), tp)
            else:
                for t in range(n_tris):
                    base = t * _QCOLS
                    ms = hit & (idx == t)
                    for c, val in enumerate(surf):
                        acc[base + c] = acc[base + c] + jnp.where(
                            ms, val, 0.0)
                    if light is not None:
                        ml = sv["ok"] & (sv["li"] == t)
                        for c, val in enumerate(light):
                            if c in (12, 13, 14):   # pad cols (no alb)
                                continue
                            acc[base + c] = acc[base + c] + \
                                jnp.where(ml, val, 0.0)

            # --- position adjoint propagation ---
            if bounce == 0:
                for c in range(3):
                    gry[c] = gry[c] + rb["onew"][c]
                    gry[3 + c] = gry[3 + c] + rb["gry_d"][c]
            else:
                ob = rb["onew"]
            tb = rb["tb"]
        return tuple(acc), tuple(gry)

    scatter = n_tris > GRAD_UNROLL_TRIS
    tp = _acc_tp(n_tris)
    if scatter:
        acc0 = (jnp.zeros((_SROWS, tp), jnp.float32),)
    else:
        acc0 = tuple(zrow for _ in range(nacc))
    gry0 = tuple(zrow for _ in range(6))
    if unroll_samples:
        carry = (acc0, gry0)
        for s in range(cfg.spp):
            carry = sample_body(jnp.int32(s), carry)
        acc, gry = carry
    else:
        acc, gry = lax.fori_loop(0, cfg.spp, sample_body, (acc0, gry0))
    n_lanes = ox0.shape[1]
    if scatter:
        gtab_rows = acc[0]                 # (_SROWS, tp) triangle-major
    else:
        accr = _qaccr(n_tris)
        pad = jnp.zeros((accr - nacc, n_lanes), jnp.float32)
        gtab_rows = jnp.concatenate(list(acc) + [pad], axis=0)
    gray_rows = jnp.concatenate(
        list(gry) + [jnp.zeros((2, n_lanes), jnp.float32)], axis=0)
    return gtab_rows, gray_rows


def _qbwd_kernel(rays, keys, tri, gbar, gtab, grays, *, cfg, n_tris,
                 light_rows=None):
    def run_tile():
        gtab_rows, gray_rows = _bwd_tile_quality(
            rays, keys, tri, gbar, cfg=cfg, n_tris=n_tris,
            light_rows=light_rows)
        grays[...] = gray_rows

        @pl.when(pl.program_id(0) == 0)
        def _first():
            gtab[...] = gtab_rows

        @pl.when(pl.program_id(0) != 0)
        def _rest():
            gtab[...] += gtab_rows

    if not DEAD_TILE_SKIP:
        run_tile()
        return

    # Dead-tile skip (see megakernel.py): all adjoint terms are
    # hit/ok-masked, so an all-camera-miss tile contributes exact zeros
    # — skip the whole replay + reverse sweep. One extra first-hit walk
    # here (vs the replay's own) is negligible against the spp loop.
    ox0, oy0, oz0 = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx0, dy0, dz0 = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    src0 = jnp.full_like(ox0, -1.0).astype(jnp.int32)
    _, fh_i = _nearest(ox0, oy0, oz0, dx0, dy0, dz0, src0, tri, n_tris)
    live = jnp.any(fh_i >= 0)
    pl.when(live)(run_tile)

    @pl.when(jnp.logical_not(live))
    def _():
        grays[...] = jnp.zeros(grays.shape, grays.dtype)

        @pl.when(pl.program_id(0) == 0)
        def _first():
            gtab[...] = jnp.zeros(gtab.shape, gtab.dtype)


def quality_call(rays, keys, tri, cfg: RenderConfig, n_tris: int,
                 light_rows=None):
    """Raw forward quality pallas_call on packed rows → (4, Np).

    ``light_rows``: static tuple of emissive row indices
    (``Scene.light_idx``) — enables the O(L) light-selection walk
    (bit-equal to the full O(T) walk; see
    ``megakernel_quality._select_gather_light_static``)."""
    from spath_tpu.ops.pallas.megakernel_quality import _quality_kernel

    np_ = rays.shape[1]
    tile = tile_for(np_)
    kernel = functools.partial(_quality_kernel, cfg=cfg, n_tris=n_tris,
                               light_rows=light_rows)
    return pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, np_), jnp.float32),
    )(rays, keys, tri)


def quality_bwd_call(rays, keys, tri, gbar, cfg: RenderConfig,
                     n_tris: int, light_rows=None):
    """Raw backward pallas_call → ``(gtab19 (T, 19), grays (8, Np))``
    for this wavefront; the shard_map path psums ``gtab19`` over the
    mesh axis (see ``megakernel_grad.mega_bwd_call``)."""
    np_ = rays.shape[1]
    tile = tile_for(np_)
    scatter = n_tris > GRAD_UNROLL_TRIS
    if scatter:
        gshape = (_SROWS, _acc_tp(n_tris))    # triangle-major
    else:
        gshape = (_qaccr(n_tris), tile)       # lane-parallel rows
    kernel = functools.partial(_qbwd_kernel, cfg=cfg, n_tris=n_tris,
                               light_rows=light_rows)
    gtab_rows, grays = pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(gshape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(gshape, jnp.float32),
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
        ],
    )(rays, keys, tri, gbar)
    if scatter:
        return gtab_rows[:_QCOLS, :n_tris].T, grays
    per = jnp.sum(gtab_rows, axis=1)[: n_tris * _QCOLS]
    return per.reshape(n_tris, _QCOLS), grays


def grad_table_from_gtab19(gtab19, n_tris: int):
    """(T, 19) adjoint → (T, 24) quality-table cotangent.

    Adjoint cols 0..17 -> table cols 0..17; adjoint area(18) -> table
    col 19; prob(18) and cdf(20) are detached by construction."""
    zero1 = jnp.zeros((n_tris, 1), jnp.float32)
    return jnp.concatenate(
        [gtab19[:, :18], zero1, gtab19[:, 18:19],
         jnp.zeros((n_tris, 4), jnp.float32)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def quality_rows(tri, rays, keys, cfg: RenderConfig, n_tris: int,
                 light_rows=None):
    """Forward quality megakernel on packed rows, hand-written VJP."""
    return quality_call(rays, keys, tri, cfg, n_tris, light_rows)


def _q_fwd(tri, rays, keys, cfg, n_tris, light_rows):
    return (quality_rows(tri, rays, keys, cfg, n_tris, light_rows),
            (tri, rays, keys))


def _q_bwd(cfg, n_tris, light_rows, res, gbar):
    tri, rays, keys = res
    gtab19, grays = quality_bwd_call(rays, keys, tri, gbar, cfg, n_tris,
                                     light_rows)
    gtri = grad_table_from_gtab19(gtab19, n_tris)
    gkeys = np.zeros(keys.shape, dtype=jax.dtypes.float0)
    return gtri, grays, gkeys


quality_rows.defvjp(_q_fwd, _q_bwd)


def render_radiance_quality_grad(scene, camera, cfg: RenderConfig, seed=0):
    """Differentiable fused quality render: unclamped mean radiance
    ``(H, W, 3)`` with gradients to scene vertices/albedo/emission (via
    the quality table) and the camera (via packed rays)."""
    if not supported_grad(scene, cfg):
        raise ValueError(
            "quality megakernel VJP needs rng='hash', sampler='cosine', "
            "T <= GRAD_MAX_TRIS")
    rays, pix, n = pack_rays(camera, cfg, 0)
    keys = jnp.asarray(seed).astype(jnp.uint32) * _GOLD + pix
    tri = quality_table(scene)
    if DEAD_TILE_SKIP and rays.shape[1] > tile_for(rays.shape[1]):
        # live-first ordering (bit-exact, see megakernel.py) — the
        # permutation is detached, so the gather/scatter pair transposes
        # cleanly around the custom VJP
        from spath_tpu.ops.pallas.megakernel import (
            order_rays_live_first,
            unpermute_rows,
        )

        rays, keys, order, _ = order_rays_live_first(scene, rays, keys, cfg)
        out = unpermute_rows(
            quality_rows(tri, rays, keys, cfg, scene.n_tris,
                         scene.light_idx), order)
    else:
        out = quality_rows(tri, rays, keys, cfg, scene.n_tris,
                           scene.light_idx)
    return out[:3, :n].T.reshape(cfg.height, cfg.width, 3)
