"""HBM-streamed QUALITY path tracer: the production estimator at large T.

Round 2 left the quality estimator (hash counter RNG + cosine-weighted
sampling + NEE with power-heuristic MIS, the semantics of
``ops/nee.py``/``ops/sampling.py``) capped at the SMEM triangle table:
a 10k-triangle scene with NEE fell to the XLA wavefront. This module is
the large-T design, composing the two proven pieces:

  * the ESTIMATOR BODY is ``megakernel_quality._sample_walk`` — the
    exact same traced float ops as the SMEM kernel and the XLA
    wavefront, by construction (the walk is intersection-backend
    agnostic; see ``_make_ctx``'s hook contract);
  * the O(T) work is ``megakernel_bigscene._sweep`` — triangle feature
    blocks double-buffer-DMA'd HBM→VMEM through the K-packed
    fp32-emulating MXU matmul (brute force, the semantics of
    ``src/cpu_renderer.cpp:39-49`` / ``src/render.comp:104-121``).

NEE specifics of the streamed design:

  * the shadow ray and the next bounce ray share their origin, so ONE
    sweep over 2R concatenated lanes produces both — triangle blocks are
    DMA'd once per bounce, the attribute gather runs only on the
    next-ray half (``_sweep(gather_from=R)``);
  * light selection is a categorical cdf draw over a compact VMEM
    light table holding ONLY the (statically known) emissive rows of
    the quality table plus their global indices. Selection is bit-equal
    to the wavefront's full-table ``searchsorted``: the cdf is a step
    function stepping only at emissive rows, so the k-th compact
    crossing is the k-th light for the same uniform (zero-probability
    rows can never be selected by either). The light set must be STATIC
    (``Scene.light_idx``, or derived from concrete emission at
    table-build time) while emission/geometry VALUES stay traced and
    differentiable. Round 5 scaled the set with the scene: the round-4
    SMEM table (O(L) scalar walk, 2048-row SMEM cap) became a
    VMEM-resident sublane-chunked table with a chunked
    count-searchsorted + exact one-hot MXU row fetch
    (``_select_light_vmem``) — ``LIGHT_MAX`` 2048 → 65536, covering the
    1M-triangle/1%-emissive scene's ~10k lights with 6× headroom.

Backward: one Pallas launch replays the walk per sample and runs the
shared analytic reverse sweep (``megakernel_quality_grad._reverse_bounce``
— the NEE position chain is LIVE: gradients to hit/light geometry,
normals, areas, and camera rays). Per-triangle adjoints scatter through
the MXU (exact 3-way bf16 split one-hots, ``megakernel_grad._split3``)
into a ``(32, Tp)`` triangle-major accumulator in the ATTRS-table row
layout; both the surface chain (at the hit index) and the light chain
(at the sampled light's global index) land there, so scene cotangents
flow through the single differentiable attrs table. The
geometry-feature table keeps an exactly-zero cotangent — the same
geometry enters the attrs table differentiably, which is where the
analytic distance/light VJPs are anchored (same policy as
``megakernel_bigscene_grad``).

The accumulator is STREAMED through HBM (round 4): a VMEM-resident
``(32, Tp)`` block would cap T at 32k (16 MB at 128k — the whole VMEM
budget), so instead the reverse sweep collects each sample's ≤2·bounces
contribution matrices (surface + light chains, hi/mid/lo-split) and
then runs ONE double-buffered read-modify-write pass over the adjoint's
``(32, TILE_T)`` HBM blocks — all events scatter into a block while it
is VMEM-resident, exactly mirroring how the forward streams the
triangle features. Nothing in VMEM scales with T any more, so the VJP
cap equals the forward cap (``BIG_MAX_TRIS``); the rmw traffic is
2·32·T·4 B per (sample, ray-tile) — a few percent of the sweeps' own
feature DMAs and far below the O(R·T) MXU time that dominates.
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
from spath_tpu.ops.pallas.intersect_pallas import pack_tri_blocks
from spath_tpu.ops.pallas.megakernel import pack_rays, tile_for
from spath_tpu.ops.pallas.megakernel_bigscene import (
    _QK,
    BIG_MAX_TRIS,
    TILE_T,
    _sweep,
)
from spath_tpu.ops.pallas.megakernel_grad import _split3
from spath_tpu.ops.pallas.megakernel_quality import (
    _GOLD,
    _sample_walk,
    quality_table,
)

#: rays per grid step. Was 512 while the backward kept a (32, Tp)
#: adjoint block VMEM-resident; with the adjoint streamed through HBM
#: (round 4) nothing scales with T and 1024 fits the budget again —
#: measured +7-8% on fwd+bwd at 10k/100k, neutral on forward.
TILE_RQ = 1024
#: attribute-table rows: n(0:3) albedo(3:6) emission(6:9) prob(9)
#: area(10) v0(11:14) e1(14:17) e2(17:20) pad(20:32). Geometry columns
#: exist so the backward replay can anchor the analytic distance VJP
#: without a second table; 32 = whole bf16 sublane tiles.
_AQCOLS = 32
#: compact light-table cap. Round 5 moved the table SMEM → VMEM
#: ((24-col × Lp) f32 = 6.3 MB at 64k — the SMEM walk capped at 2048
#: rows / 196 KB) and replaced the O(L) scalar selection walk with a
#: chunked count-searchsorted + exact one-hot MXU row fetch
#: (``_select_light_vmem``), so the light set scales with the scene:
#: a 1M-triangle scene at the bench's own 1% emissive fraction (~10k
#: lights) stays on the fused path. Beyond the cap the registry falls
#: to the wavefront (tests/test_bigscene_quality.py::test_bigq_light_cap).
LIGHT_MAX = 65536
#: lights per selection chunk: the (512, R) compare/one-hot transients
#: are 2 MB at TILE_RQ lanes, and 512 sublanes = 4 MXU passes per
#: gather matmul step.
_LCHUNK = 512
#: backward cap == forward cap: the (32, Tp) adjoint streams through
#: HBM blocks (see module docstring), so no VMEM buffer scales with T.
#: BASELINE config 4's 100k point runs the fused VJP with headroom.
BIGQ_GRAD_MAX_TRIS = BIG_MAX_TRIS

#: light-table gather columns for ``_select_gather_light``: quality-table
#: layout v0(0:3) e1(3:6) e2(6:9) n(9:12) em(15:18) prob(18) area(19),
#: plus the global triangle index stashed at pad column 21.
_COL_GIDX = 21
_LCOLS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 15, 16, 17, 18, 19,
          _COL_GIDX)


def static_light_idx(scene) -> tuple[int, ...] | None:
    """The static light set: ``scene.light_idx`` if set, else derived
    from concrete emission (None when emission is a tracer — pass
    ``Scene.light_idx`` to use this kernel under transformations)."""
    if scene.light_idx is not None:
        return tuple(int(i) for i in scene.light_idx)
    try:
        em = np.asarray(scene.emission)
    except Exception:  # noqa: BLE001 — tracer: caller must provide
        return None
    return tuple(np.flatnonzero(em.sum(-1) > 0).tolist())


def supported(scene, cfg: RenderConfig) -> bool:
    lights = static_light_idx(scene)
    return (
        scene.n_tris <= BIG_MAX_TRIS
        and cfg.rng == "hash"
        and cfg.sampler == "cosine"
        and (not cfg.nee or (lights is not None
                             and len(lights) <= LIGHT_MAX))
    )


def supported_grad(scene, cfg: RenderConfig) -> bool:
    # vis_grad's warped/boundary adjoints live only in the wavefront
    return (supported(scene, cfg)
            and scene.n_tris <= BIGQ_GRAD_MAX_TRIS
            and not cfg.vis_grad)


def bigscene_quality_tables(scene):
    """Streamed tables + compact light table (all differentiable in the
    scene values; the light SET is static).

    Returns ``(gfeat (4·Tp, 128) bf16, attrs (32, Tp) f32,
    ltab (24·nchunk, 512) f32, cdf_t (512, nchunk) f32, n_blocks,
    n_lights)``. The light table is SUBLANE-CHUNKED for the VMEM
    selection (``_select_light_vmem``): chunk ``c``'s 512 rows live
    transposed at sublanes ``[24c, 24c+24)`` so the gather matmul
    slices them with an (8-aligned) dynamic sublane window — never a
    dynamic lane slice, which Mosaic restricts. ``cdf_t`` holds the
    compact cdf column-oriented (chunk c's values along sublanes of
    column c) so the count compare broadcasts with no transposes.
    """
    from spath_tpu.ops.nee import light_cdf, triangle_areas

    v0, v1, v2 = scene.v0, scene.v1, scene.v2
    t = v0.shape[0]
    pad = (-t) % TILE_T
    if pad:
        z = jnp.zeros((pad, 3), jnp.float32)
        v0p, v1p, v2p = (jnp.concatenate([x, z]) for x in (v0, v1, v2))
    else:
        v0p, v1p, v2p = v0, v1, v2
    gfeat = pack_tri_blocks(v0p, v1p, v2p, TILE_T)   # (4·Tp, 128) bf16

    n = scene.normals()
    _, prob = light_cdf(scene)
    area = triangle_areas(scene)
    acols = jnp.concatenate(
        [n, scene.albedo, scene.emission, prob[:, None], area[:, None],
         v0, v1 - v0, v2 - v0,
         jnp.zeros((t, _AQCOLS - 20), jnp.float32)], axis=1,
    )
    if pad:
        acols = jnp.concatenate(
            [acols, jnp.zeros((pad, _AQCOLS), jnp.float32)])

    lights = static_light_idx(scene)
    if lights is None:
        raise ValueError(
            "bigscene quality kernel needs a static light set: emission "
            "is traced and Scene.light_idx is not set")
    if len(lights) > LIGHT_MAX:
        raise ValueError(f"too many lights: {len(lights)} > {LIGHT_MAX}")
    if lights:
        li = jnp.asarray(lights, jnp.int32)
        ltab = quality_table(scene)[li]
        ltab = ltab.at[:, _COL_GIDX].set(li.astype(jnp.float32))
    else:
        # degenerate all-dark scene: one dummy row that can never
        # validate (prob 0) but keeps the cdf crossing well-defined
        ltab = jnp.zeros((1, 24), jnp.float32)
        ltab = ltab.at[0, 20].set(1.0)               # cdf
        ltab = ltab.at[0, _COL_GIDX].set(-1.0)       # global index
    n_lights = ltab.shape[0]
    lpad = (-n_lights) % _LCHUNK
    if lpad:
        fill = jnp.zeros((lpad, 24), jnp.float32)
        # padded cdf 2.0: above every uniform, never counted/selected
        fill = fill.at[:, 20].set(2.0)
        ltab = jnp.concatenate([ltab, fill], axis=0)
    nchunk = ltab.shape[0] // _LCHUNK
    cdf_t = ltab[:, 20].reshape(nchunk, _LCHUNK).T       # (512, nchunk)
    ltab_sb = ltab.reshape(nchunk, _LCHUNK, 24).transpose(0, 2, 1)
    ltab_sb = ltab_sb.reshape(nchunk * 24, _LCHUNK)      # (24·nc, 512)
    return (gfeat, acols.T, ltab_sb, cdf_t, (t + pad) // TILE_T,
            n_lights)


def _select_light_vmem(ltab, cdf_t, u, n_lights: int):
    """Categorical light draw + 24-column row fetch from the
    VMEM-resident light table, O(L/512)-chunked — the scaling
    replacement for the O(L) SMEM scalar walk (round-5 item 2).

    Count-formulation searchsorted, bit-equal to the walk it replaces
    (``megakernel_quality._select_gather_light``'s own docstring proves
    walk == ``min(count(cdf <= u), L-1)``): the compare against each
    512-light chunk broadcasts ``(512, 1) vs (1, R)`` with zero
    transposes thanks to the column-oriented ``cdf_t``. The row fetch
    is an exact one-hot MXU matmul per chunk — ``precision=HIGHEST``'s
    3-way bf16 split reconstructs each f32 exactly and every output has
    a single nonzero product, so the gathered rows are bit-equal to a
    scalar row read (the ``ops/gather.py`` trick in-kernel).

    ``u``: (1, R). Returns ``(slot (1, R) int32, rows (24, R) f32)``.
    """
    r = u.shape[1]
    nchunk = cdf_t.shape[1]
    chunk = cdf_t.shape[0]
    cdf_all = cdf_t[:]                                # (512, nchunk)
    iota_c = lax.broadcasted_iota(jnp.int32, (nchunk, 1), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def count_body(c, cnt):
        # column c of cdf_t via an exact one-hot matmul — no dynamic
        # LANE slicing (Mosaic-restricted); the (512, nchunk)×(nchunk,
        # 1) product is trivial
        ohc = (iota_c == c).astype(jnp.float32)
        cdf_c = jnp.dot(cdf_all, ohc,
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)  # (512, 1)
        le = (cdf_c <= u).astype(jnp.int32)               # (512, R)
        return cnt + jnp.sum(le, axis=0, keepdims=True)

    cnt = lax.fori_loop(0, nchunk, count_body,
                        jnp.zeros((1, r), jnp.int32))
    slot = jnp.minimum(cnt, n_lights - 1)

    def gather_body(c, acc):
        blk = ltab[pl.ds(c * 24, 24), :]
        oht = (iota_s + c * chunk == slot).astype(jnp.float32)
        return acc + jnp.dot(blk, oht,
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)

    rows = lax.fori_loop(0, nchunk, gather_body,
                         jnp.zeros((24, r), jnp.float32))
    return slot, rows


def _make_ctx_big(rays, keys, ltab, cdf_t, gfeat_hbm, attrs_hbm, gbuf,
                  abuf, sems, *, cfg: RenderConfig, n_blocks: int,
                  n_lights: int, fast: bool):
    """Streamed-backend hook set for ``_sample_walk`` (same contract as
    ``megakernel_quality._make_ctx``; ``attr`` is the gathered
    ``(32, R)`` attribute rows)."""
    ox0, oy0, oz0 = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx0, dy0, dz0 = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    src0 = jnp.full_like(ox0, -1.0).astype(jnp.int32)
    r = ox0.shape[1]
    sweep = functools.partial(
        _sweep, gfeat_hbm=gfeat_hbm, attrs_hbm=attrs_hbm,
        gbuf=gbuf, abuf=abuf, sems=sems, n_blocks=n_blocks, fast=fast,
    )

    def nearest1(o, d, src):
        return sweep(*o, *d, src)

    def nearest2(o, d_sh, d_nx, src):
        # Two sweeps sharing the origin: the shadow-occlusion sweep
        # skips the attribute gather and the attrs DMA. (The sweep is
        # MXU-bound, so fusing both into one 2R-lane pass buys nothing
        # — and the mid-loop lane slices it needs crash Mosaic.)
        occ_d, occ_i, _ = sweep(*o, *d_sh, src, with_attrs=False)
        return (occ_d, occ_i), sweep(*o, *d_nx, src)

    def hit_shading(idx, attr):
        return [attr[c:c + 1, :] for c in range(11)]

    def hit_geo(idx, attr):
        return [attr[c:c + 1, :] for c in range(11, 20)]

    def select_light(u):
        _slot, rows = _select_light_vmem(ltab, cdf_t, u, n_lights)
        outs = [rows[c:c + 1, :] for c in _LCOLS]
        li_global = outs[-1].astype(jnp.int32)
        return li_global, outs[:-1]

    fh = nearest1((ox0, oy0, oz0), (dx0, dy0, dz0), src0)
    return dict(
        o0=(ox0, oy0, oz0), d0=(dx0, dy0, dz0), src0=src0, fh=fh,
        h0=keys[0:1, :], cfg=cfg,
        nearest1=nearest1, nearest2=nearest2, hit_shading=hit_shading,
        hit_geo=hit_geo, select_light=select_light,
    )


def _bigq_kernel(rays, keys, ltab, cdf_t, gfeat_hbm, attrs_hbm, out,
                 gbuf, abuf, sems, *, cfg: RenderConfig, n_blocks: int,
                 n_lights: int, fast: bool):
    ctx = _make_ctx_big(
        rays, keys, ltab, cdf_t, gfeat_hbm, attrs_hbm, gbuf, abuf, sems,
        cfg=cfg, n_blocks=n_blocks, n_lights=n_lights, fast=fast,
    )

    def sample_body(s, carry):
        acc_r, acc_g, acc_b = carry
        rad_r, rad_g, rad_b, _ = _sample_walk(s, ctx)
        return (acc_r + rad_r, acc_g + rad_g, acc_b + rad_b)

    zeros = jnp.zeros_like(ctx["o0"][0])
    acc_r, acc_g, acc_b = lax.fori_loop(
        0, cfg.spp, sample_body, (zeros, zeros, zeros))
    inv = np.float32(1.0) / np.float32(cfg.spp)
    out[0:1, :] = acc_r * inv
    out[1:2, :] = acc_g * inv
    out[2:3, :] = acc_b * inv
    out[3:4, :] = jnp.zeros_like(acc_r)


def bigq_call(rays, keys, ltab, cdf_t, gfeat, attrs, cfg: RenderConfig,
              n_blocks: int, n_lights: int, fast: bool = False):
    """Raw forward pallas_call on packed rows → ``(4, Np)`` rows."""
    np_ = rays.shape[1]
    tile = tile_for(np_, TILE_RQ)
    kernel = functools.partial(
        _bigq_kernel, cfg=cfg, n_blocks=n_blocks, n_lights=n_lights,
        fast=fast)
    return pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # light table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # light cdf (col)
            pl.BlockSpec(memory_space=pltpu.HBM),    # gfeat streamed
            pl.BlockSpec(memory_space=pltpu.HBM),    # attrs streamed
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * TILE_T, _QK), jnp.bfloat16),
            pltpu.VMEM((2, _AQCOLS, TILE_T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(rays, keys, ltab, cdf_t, gfeat, attrs)


def _hits_rows(spp: int, bounces: int) -> int:
    """Sublane count of the hits-export buffer: 2 rows (dist, idx) per
    (sample, bounce), padded to whole f32 sublane tiles."""
    return -(-2 * spp * bounces // 8) * 8


def _bigq_hits_kernel(rays, keys, ltab, cdf_t, gfeat_hbm, attrs_hbm,
                      out, hits, gbuf, abuf, sems, *, cfg: RenderConfig,
                      n_blocks: int, n_lights: int, fast: bool):
    """Forward kernel that ALSO exports every (sample, bounce) nearest
    hit — (dist, idx) rows — for the vis-residual replay (round-5 item
    4: the residual differentiates O(1)-per-lane chains off the KNOWN
    hit, so exporting the hits the forward already computes removes its
    O(N·T) detached re-sweeps). The sample loop is UNROLLED (static row
    indices; caller gates spp ≤ 8), and `saved` is consumed instead of
    dead-code-eliminated — same traced walk as ``_bigq_kernel``."""
    ctx = _make_ctx_big(
        rays, keys, ltab, cdf_t, gfeat_hbm, attrs_hbm, gbuf, abuf, sems,
        cfg=cfg, n_blocks=n_blocks, n_lights=n_lights, fast=fast,
    )
    zeros = jnp.zeros_like(ctx["o0"][0])
    acc_r, acc_g, acc_b = zeros, zeros, zeros
    nb = cfg.max_bounces
    for s in range(cfg.spp):
        rad_r, rad_g, rad_b, saved = _sample_walk(jnp.uint32(s), ctx)
        acc_r = acc_r + rad_r
        acc_g = acc_g + rad_g
        acc_b = acc_b + rad_b
        for b in range(nb):
            r0 = 2 * (s * nb + b)
            hits[r0:r0 + 1, :] = saved[b]["dist"]
            hits[r0 + 1:r0 + 2, :] = saved[b]["idx"].astype(jnp.float32)
    pad0 = 2 * cfg.spp * nb
    for r in range(pad0, _hits_rows(cfg.spp, nb)):
        hits[r:r + 1, :] = zeros
    inv = np.float32(1.0) / np.float32(cfg.spp)
    out[0:1, :] = acc_r * inv
    out[1:2, :] = acc_g * inv
    out[2:3, :] = acc_b * inv
    out[3:4, :] = jnp.zeros_like(acc_r)


def bigq_hits_call(rays, keys, ltab, cdf_t, gfeat, attrs,
                   cfg: RenderConfig, n_blocks: int, n_lights: int,
                   fast: bool = False):
    """Forward + hit export → ``(rows (4, Np), hits (HR, Np))``."""
    assert cfg.spp <= 8, "hits export unrolls the sample loop"
    np_ = rays.shape[1]
    tile = tile_for(np_, TILE_RQ)
    hr = _hits_rows(cfg.spp, cfg.max_bounces)
    kernel = functools.partial(
        _bigq_hits_kernel, cfg=cfg, n_blocks=n_blocks,
        n_lights=n_lights, fast=fast)
    return pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hr, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, np_), jnp.float32),
            jax.ShapeDtypeStruct((hr, np_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4 * TILE_T, _QK), jnp.bfloat16),
            pltpu.VMEM((2, _AQCOLS, TILE_T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(rays, keys, ltab, cdf_t, gfeat, attrs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def bigq_rows_hits(gfeat, attrs, ltab, cdf_t, rays, keys,
                   cfg: RenderConfig, n_blocks: int, n_lights: int,
                   fast: bool):
    """``bigq_rows`` that also returns the (detached) per-(sample,
    bounce) hit export — the interior forward IS the hits forward, so
    the vis-residual replay costs no extra kernel pass. The hits output
    is non-differentiable (the residual consumes it detached); the
    backward is the shared streamed-adjoint kernel, identical to
    ``bigq_rows``'s."""
    return bigq_hits_call(rays, keys, ltab, cdf_t, gfeat, attrs, cfg,
                          n_blocks, n_lights, fast)


def _bigq_hits_fwd(gfeat, attrs, ltab, cdf_t, rays, keys, cfg, n_blocks,
                   n_lights, fast):
    out = bigq_rows_hits(gfeat, attrs, ltab, cdf_t, rays, keys, cfg,
                         n_blocks, n_lights, fast)
    return out, (gfeat, attrs, ltab, cdf_t, rays, keys)


def _bigq_hits_bwd(cfg, n_blocks, n_lights, fast, res, cots):
    gbar, _g_hits = cots          # hits are detached: cotangent unused
    return _bigq_bwd(cfg, n_blocks, n_lights, fast, res, gbar)


bigq_rows_hits.defvjp(_bigq_hits_fwd, _bigq_hits_bwd)


def render_bigscene_quality_with_hits(scene, camera, cfg: RenderConfig,
                                      seed=0, fast: bool = False):
    """Differentiable streamed-quality radiance PLUS the detached hit
    export: ``(img (H, W, 3), (dist (spp, B, N), idx (spp, B, N)
    int32))`` in pixel order — the inputs ``render_vis_residual`` needs
    to skip its O(N·T) detached re-sweeps."""
    from jax import lax

    if not supported(scene, cfg):
        raise ValueError(
            "bigscene quality kernel needs rng='hash', sampler='cosine', "
            "T <= BIG_MAX_TRIS, static light set <= LIGHT_MAX")
    rays, pix, n = pack_rays(camera, cfg, 0, lane_multiple=TILE_RQ)
    keys = jnp.asarray(seed).astype(jnp.uint32) * _GOLD + pix
    gfeat, attrs, ltab, cdf_t, n_blocks, n_lights = \
        bigscene_quality_tables(scene)
    out, hits = bigq_rows_hits(gfeat, attrs, ltab, cdf_t, rays, keys,
                               cfg, n_blocks, n_lights, fast)
    img = out[:3, :n].T.reshape(cfg.height, cfg.width, 3)
    hits = lax.stop_gradient(hits)
    nb = cfg.max_bounces
    hb = hits[:2 * cfg.spp * nb, :n].reshape(cfg.spp, nb, 2, n)
    dist = hb[:, :, 0, :]
    idx = hb[:, :, 1, :].astype(jnp.int32)
    return img, (dist, idx)


def _attrs_rows_surf(surf, zrow):
    """Reorder the reverse sweep's quality-layout surface rows
    (v0,e1,e2,n,alb,emi — cols 0..17) into the attrs-table row layout."""
    v0, e1, e2 = surf[0:3], surf[3:6], surf[6:9]
    n, alb, emi = surf[9:12], surf[12:15], surf[15:18]
    return (tuple(n) + tuple(alb) + tuple(emi) + (zrow, zrow)
            + tuple(v0) + tuple(e1) + tuple(e2))     # rows 0..19


def _attrs_rows_light(light, zrow):
    """Light-chain rows (v0,e1,e2,n bars, pad, emi bars, area bar) into
    the attrs-table row layout (albedo/prob rows stay zero)."""
    v0, e1, e2 = light[0:3], light[3:6], light[6:9]
    n, emi, area = light[9:12], light[15:18], light[18]
    return (tuple(n) + (zrow, zrow, zrow) + tuple(emi) + (zrow, area)
            + tuple(v0) + tuple(e1) + tuple(e2))     # rows 0..19


def _bigq_bwd_kernel(rays, keys, ltab, cdf_t, gfeat_hbm, attrs_hbm,
                     gbar, gtab, grays, gbuf, abuf, sems, rwbuf, rwsems,
                     *, cfg: RenderConfig, n_blocks: int, n_lights: int,
                     fast: bool):
    from spath_tpu.ops.pallas.megakernel_quality_grad import (
        _reverse_bounce,
    )

    ctx = _make_ctx_big(
        rays, keys, ltab, cdf_t, gfeat_hbm, attrs_hbm, gbuf, abuf, sems,
        cfg=cfg, n_blocks=n_blocks, n_lights=n_lights, fast=fast,
    )
    zrow = jnp.zeros_like(ctx["o0"][0])
    r = zrow.shape[1]
    inv = np.float32(1.0 / cfg.spp)
    g3 = (gbar[0:1, :] * inv, gbar[1:2, :] * inv, gbar[2:3, :] * inv)
    nb = cfg.max_bounces

    # The (32, Tp) adjoint lives in HBM (module docstring): per-sample,
    # all contribution events scatter into each (32, TILE_T) block
    # while it is VMEM-resident in a double-buffered rmw pass
    # (``megakernel_bigscene.stream_scatter_rmw``).
    from spath_tpu.ops.pallas.megakernel_bigscene import (
        stream_scatter_rmw,
        zero_hbm_blocks,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        zero_hbm_blocks(gtab, rwbuf, rwsems, n_blocks, TILE_T)

    def contrib(rows, sentinel):
        """One scatter event: hi/mid/lo-split (32, R) contribution rows
        (attrs layout) + the (R, 1) target-index sentinel column."""
        cmat = jnp.concatenate(
            list(rows) + [zrow] * (_AQCOLS - len(rows)), axis=0)
        return _split3(cmat), sentinel.T

    def sample_body(s, gry):
        gry = list(gry)
        _, _, _, saved = _sample_walk(s, ctx)
        tb = [zrow, zrow, zrow]
        ob = [zrow, zrow, zrow]
        events = []
        for bounce in reversed(range(nb)):
            sv = saved[bounce]
            rb = _reverse_bounce(sv, tb, ob, g3, cfg, zrow)
            events.append(contrib(
                _attrs_rows_surf(rb["surf"], zrow),
                jnp.where(sv["hit"], sv["idx"], -1)))
            if rb["light"] is not None:
                events.append(contrib(
                    _attrs_rows_light(rb["light"], zrow),
                    jnp.where(sv["ok"], sv["li"], -1)))
            if bounce == 0:
                for c in range(3):
                    gry[c] = gry[c] + rb["onew"][c]
                    gry[3 + c] = gry[3 + c] + rb["gry_d"][c]
            else:
                ob = rb["onew"]
            tb = rb["tb"]

        # --- streamed rmw scatter pass over the adjoint blocks ---
        stream_scatter_rmw(gtab, rwbuf, rwsems, events, n_blocks,
                           TILE_T, r)
        return tuple(gry)

    gry = lax.fori_loop(0, cfg.spp, sample_body, (zrow,) * 6)
    grays[...] = jnp.concatenate(
        list(gry) + [jnp.zeros((2, r), jnp.float32)], axis=0)


def bigq_bwd_call(rays, keys, ltab, cdf_t, gfeat, attrs, gbar,
                  cfg: RenderConfig, n_blocks: int, n_lights: int,
                  fast: bool = False):
    """Raw backward pallas_call → ``(gattrs (32, Tp), grays (8, Np))``."""
    np_ = rays.shape[1]
    tile = tile_for(np_, TILE_RQ)
    tp = attrs.shape[1]
    kernel = functools.partial(
        _bigq_bwd_kernel, cfg=cfg, n_blocks=n_blocks, n_lights=n_lights,
        fast=fast)
    return pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # whole-buffer HBM adjoint, rmw-streamed by the kernel
            # (zeroed at grid step 0, accumulated across the grid)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_AQCOLS, tp), jnp.float32),
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4 * TILE_T, _QK), jnp.bfloat16),
            pltpu.VMEM((2, _AQCOLS, TILE_T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, _AQCOLS, TILE_T), jnp.float32),   # rmw bufs
            pltpu.SemaphoreType.DMA((2, 2)),                 # rmw sems
        ],
    )(rays, keys, ltab, cdf_t, gfeat, attrs, gbar)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def bigq_rows(gfeat, attrs, ltab, cdf_t, rays, keys, cfg: RenderConfig,
              n_blocks: int, n_lights: int, fast: bool):
    """Forward streamed quality kernel on packed rows, hand-written VJP."""
    return bigq_call(rays, keys, ltab, cdf_t, gfeat, attrs, cfg,
                     n_blocks, n_lights, fast)


def _bigq_fwd(gfeat, attrs, ltab, cdf_t, rays, keys, cfg, n_blocks,
              n_lights, fast):
    out = bigq_rows(gfeat, attrs, ltab, cdf_t, rays, keys, cfg,
                    n_blocks, n_lights, fast)
    return out, (gfeat, attrs, ltab, cdf_t, rays, keys)


def _bigq_bwd(cfg, n_blocks, n_lights, fast, res, gbar):
    gfeat, attrs, ltab, cdf_t, rays, keys = res
    gattrs, grays = bigq_bwd_call(
        rays, keys, ltab, cdf_t, gfeat, attrs, gbar, cfg, n_blocks,
        n_lights, fast)
    # Geometry features and the light table carry exactly-zero
    # cotangents: the same quantities enter the differentiable attrs
    # table, where both the surface and light chains are scattered (see
    # module docstring) — scene cotangents flow through attrs alone.
    ggfeat = jnp.zeros_like(gfeat)
    gltab = jnp.zeros_like(ltab)
    gcdf = jnp.zeros_like(cdf_t)
    gkeys = np.zeros(keys.shape, dtype=jax.dtypes.float0)
    return ggfeat, gattrs, gltab, gcdf, grays, gkeys


bigq_rows.defvjp(_bigq_fwd, _bigq_bwd)


def render_radiance_bigscene_quality(scene, camera, cfg: RenderConfig,
                                     seed=0, fast: bool = False):
    """Unclamped mean radiance ``(H, W, 3)`` via the streamed quality
    kernel; differentiable (fused VJP) up to ``BIGQ_GRAD_MAX_TRIS``."""
    if not supported(scene, cfg):
        raise ValueError(
            "bigscene quality kernel needs rng='hash', sampler='cosine', "
            "T <= BIG_MAX_TRIS, static light set <= LIGHT_MAX")
    rays, pix, n = pack_rays(camera, cfg, 0, lane_multiple=TILE_RQ)
    keys = jnp.asarray(seed).astype(jnp.uint32) * _GOLD + pix
    gfeat, attrs, ltab, cdf_t, n_blocks, n_lights = \
        bigscene_quality_tables(scene)
    out = bigq_rows(gfeat, attrs, ltab, cdf_t, rays, keys, cfg,
                    n_blocks, n_lights, fast)
    return out[:3, :n].T.reshape(cfg.height, cfg.width, 3)
