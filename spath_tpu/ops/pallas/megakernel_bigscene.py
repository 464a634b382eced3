"""Large-scene fused path tracer: whole frame in ONE Pallas launch with
the triangle list STREAMED from HBM through the MXU.

The small-scene megakernel (``megakernel.py``) walks a ≤1024-triangle
SMEM table with a scalar loop — O(T) VPU work per ray per bounce, which
is the right shape at 7 triangles and hopeless at 10k+. This kernel is
the large-T design (BASELINE config 4: 10k–100k triangles, brute force
— the semantics of ``src/cpu_renderer.cpp:39-49``):

  * rays live on lanes, exactly like the small kernel — all shading,
    RNG, and sampling code is (1, TILE_R) row work on the VPU;
  * per bounce, the nearest-hit sweep transposes the ray state into a
    ``(TILE_R, 16)`` Plücker feature matrix and runs the SAME
    matmul-formulated Möller–Trumbore as ``intersect_pallas.py`` over
    ``(16, TILE_T)`` triangle feature blocks, double-buffer-DMA'd
    HBM→VMEM — the MXU does the O(N·T) work, and triangles never touch
    SMEM, so T is bounded by HBM, not by on-chip memory;
  * the per-triangle shading attributes (normal/albedo/emission) are
    gathered IN the sweep: each block's argmin one-hot is matmul'd with
    the block's attribute rows (exact: one nonzero per row), so no
    O(T) gather loop exists anywhere.

Estimator: the conformance one (per-pixel LCG streams, angle-uniform
sampler, forward-throughput radiance) — bit-compatible with the XLA
wavefront at ``intersect='pallas'`` (identical K-packed single-pass
fp32-accurate dots and sign-aware epilogue; see
``intersect_pallas.pack_lhs`` — ``fast=True`` keeps only the hi/lo
cross terms).
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
from spath_tpu.ops.pallas.intersect_pallas import pack_lhs, pack_tri_blocks
from spath_tpu.ops.pallas.megakernel import _lcg

_EPS = np.float32(EPSILON)
_INV_EPS = np.float32(1.0 / EPSILON)
_BIG = np.float32(MAX_DIST)
_PI = np.float64(np.arccos(-1.0))

#: rays per grid step (lanes of every (1, TILE_R) row)
TILE_R = 1024
#: triangles per streamed block; (TILE_R, TILE_T) f32 intermediates are
#: 1 MB each — the VMEM budget is ~4 live quads + dist + one-hot.
TILE_T = 256
_K = 16
#: packed feature-block rows per streamed block: 4 quantities
#: (a, u_num, v_num, d_num) × TILE_T triangles; K = 128 holds the
#: 6 bf16 split-term groups of the fp32-emulating single-pass matmul
#: (intersect_pallas.pack_lhs/pack_rhs), 16-wide each + 2 zero groups
_QK = 128
#: attribute columns: n(0:3) albedo(3:6) emission(6:9) pad(9:16)
_ACOLS = 16

#: forward cap — HBM-bound only; kept finite for padding sanity.
BIG_MAX_TRIS = 1 << 20
#: backward cap == forward cap (round 4): the (16, Tp) adjoint streams
#: through HBM blocks (``stream_scatter_rmw``), so nothing in VMEM
#: scales with T — the round-3 131072 VMEM-residency cap is gone.
BIG_GRAD_MAX_TRIS = BIG_MAX_TRIS


def _hilo(x):
    """Exact hi/lo split: x == hi + lo with hi = bf16(x)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_dot(attr_rows, onehot):
    """Exact one-hot gather as two bf16 matmuls:
    ``(ACOLS, TILE_T) @ (TILE_T, R) -> (ACOLS, R)`` attribute rows.

    Each output element has exactly ONE nonzero product (the argmin
    column), so the hi + lo split reconstructs the float32 attribute
    bit-exactly with no accumulation rounding.
    """
    hi, lo = _hilo(attr_rows)
    oh = onehot.astype(jnp.bfloat16)
    return (
        jnp.dot(hi, oh, preferred_element_type=jnp.float32)
        + jnp.dot(lo, oh, preferred_element_type=jnp.float32)
    )


def _sweep(ox, oy, oz, dx, dy, dz, src, gfeat_hbm, attrs_hbm, gbuf, abuf,
           sems, *, n_blocks: int, fast: bool, with_attrs: bool = True):
    """Nearest hit + attribute gather of every lane against ALL streamed
    triangle blocks.

    Row (1, R) ray state in; returns (best_d row, best_i row, attr rows
    (acols, R)) with ``acols = abuf.shape[1]`` (16 for the conformance
    table, 32 for the quality table). The block loop double-buffers the
    feature/attribute DMAs against the matmuls.

    ``with_attrs=False`` skips the per-block attribute gather (returns
    ``None`` attrs) — shadow-occlusion sweeps need only the nearest
    index. (An earlier design fused the shadow and next-bounce rays into
    one 2R-lane sweep to share the block DMAs, but the mid-loop lane
    slices it needs crash Mosaic's scf.for layout pass — and the sweep
    is MXU-bound, not DMA-bound, so two sweeps cost the same.)

    Layout: the whole sweep lives in "triangles on sublanes × rays on
    lanes" orientation so that NOTHING is ever transposed — Mosaic
    relayouts of (R, TILE_T) blocks cost more than the matmuls, and
    transposes of narrow reductions drag i1 masks through illegal
    transposes. Each streamed block is ONE packed single-pass bf16
    ``(4·TILE_T, 128) @ (128, R)`` MXU matmul whose K=128 carries the
    6 bf16 split-term groups that emulate fp32 products
    (``intersect_pallas.pack_lhs``) — the lane padding the MXU forces
    on K<128 matmuls IS the fp32 emulation, so exact mode costs one
    pass, not six. The min/argmin reduce along SUBLANES so results are
    lane-native (1, R) rows, with the argmin as a min-over-tied-indices
    (the XLA path's lowest-index tie-break).
    """
    # (16, R) ray feature rows [dir, pos x dir, pos, 1, 0...] — the
    # Pluecker factorization of ops/intersect.py::pluecker_features —
    # K-packed to (128, R) bf16 split-term groups.
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    ones = jnp.ones_like(ox)
    zeros = jnp.zeros_like(ox)
    feat = jnp.concatenate(
        [dx, dy, dz, mx, my, mz, ox, oy, oz, ones]
        + [zeros] * (_K - 10),
        axis=0,
    )                                        # (16, R)
    feat_t = pack_lhs(feat, fast, axis=0)    # (128, R) bf16

    r = ox.shape[1]
    acols = abuf.shape[1]
    best_d0 = jnp.full((1, r), _BIG, jnp.float32)
    best_i0 = jnp.full((1, r), -1, jnp.int32)
    best_a0 = jnp.zeros((acols, r), jnp.float32)

    def dma(slot, j):
        copies = (
            pltpu.make_async_copy(
                gfeat_hbm.at[pl.ds(j * 4 * TILE_T, 4 * TILE_T), :],
                gbuf.at[slot],
                sems.at[slot, 0],
            ),
        )
        if with_attrs:
            copies += (
                pltpu.make_async_copy(
                    attrs_hbm.at[:, pl.ds(j * TILE_T, TILE_T)],
                    abuf.at[slot],
                    sems.at[slot, 1],
                ),
            )
        return copies

    for d_ in dma(0, 0):
        d_.start()

    # Loop-invariant: local triangle index rows (block shift is applied
    # to the scalar side of each compare instead).
    loc_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_T, r), 0)

    def body(j, carry):
        if with_attrs:
            best_d, best_i, best_a = carry
        else:
            best_d, best_i = carry
            best_a = None
        slot = lax.rem(j, 2)
        nxt = lax.rem(j + 1, 2)

        @pl.when(j + 1 < n_blocks)
        def _prefetch():
            for d_ in dma(nxt, j + 1):
                d_.start()

        for d_ in dma(slot, j):
            d_.wait()

        quads = jnp.dot(gbuf[slot], feat_t,
                        preferred_element_type=jnp.float32)  # (4T, R)
        a = quads[0:TILE_T]
        u = quads[TILE_T:2 * TILE_T]
        v = quads[2 * TILE_T:3 * TILE_T]
        dd = quads[3 * TILE_T:4 * TILE_T]

        abs_a = jnp.abs(a)
        sgn = jnp.sign(a)
        us = u * sgn
        vs = v * sgn
        ds = dd * sgn
        # min3 form of us>=0 & vs>=0 & us+vs<=abs_a (u,v bounds).
        inner = jnp.minimum(jnp.minimum(us, vs), abs_a - (us + vs))
        valid = (
            (abs_a >= _EPS)
            & (inner >= 0.0)
            & (ds > _EPS * abs_a) & (ds < _INV_EPS * abs_a)
        )
        valid &= loc_iota != src - j * TILE_T
        dist = ds / jnp.where(abs_a > 0.0, abs_a, jnp.float32(1.0))
        dist = jnp.where(valid, dist, _BIG)

        blk_d = jnp.min(dist, axis=0, keepdims=True)          # (1, R)
        loc = jnp.min(
            jnp.where(dist == blk_d, loc_iota, TILE_T),
            axis=0, keepdims=True,
        )                                                     # (1, R)
        loc = jnp.where(blk_d < _BIG, loc, -1)
        better = blk_d < best_d      # strict: earlier block wins ties
        out = (
            jnp.where(better, blk_d, best_d),
            jnp.where(better, loc + j * TILE_T, best_i),
        )
        if not with_attrs:
            return out
        onehot = loc_iota == loc                      # (TILE_T, R)
        blk_a = _gather_dot(abuf[slot], onehot.astype(jnp.float32))
        return out + (jnp.where(better, blk_a, best_a),)

    carry0 = (best_d0, best_i0) + ((best_a0,) if with_attrs else ())
    res = lax.fori_loop(0, n_blocks, body, carry0)
    if not with_attrs:
        return res[0], res[1], None
    return res                         # rows: (1,R) (1,R) (ACOLS,R)


def _shade_rows(attr_rows):
    """Split gathered attribute rows into per-quantity (1, R) rows."""
    return [attr_rows[c:c + 1, :] for c in range(9)]


def zero_hbm_blocks(gtab, rwbuf, rwsems, n_blocks: int, tile_t: int):
    """Zero an ``(rows, n_blocks·tile_t)`` HBM accumulator by writing a
    zeroed VMEM tile over every block (call once, at grid step 0)."""
    rwbuf[0] = jnp.zeros_like(rwbuf[0])

    def zbody(j, _):
        w = pltpu.make_async_copy(
            rwbuf.at[0], gtab.at[:, pl.ds(j * tile_t, tile_t)],
            rwsems.at[0, 1])
        w.start()
        w.wait()
        return 0

    lax.fori_loop(0, n_blocks, zbody, 0)


def stream_scatter_rmw(gtab, rwbuf, rwsems, events, n_blocks: int,
                       tile_t: int, r: int):
    """One double-buffered read-modify-write pass over the HBM adjoint
    blocks, scattering every event while each block is VMEM-resident.

    ``events``: list of ``(terms, idx_col)`` with ``terms`` a tuple of
    bf16 split matrices ``(rows, R)`` (2-way or 3-way exact splits) and
    ``idx_col`` the ``(R, 1)`` int32 target index (-1 = no scatter).
    Per block ``j`` the accumulated piece is
    ``Σ_events Σ_terms term @ onehot_j`` — the MXU is the scatter
    engine; the read/compute/write of consecutive blocks overlap.
    Shared by the conformance and quality streamed backward kernels
    (``megakernel_bigscene_grad`` / ``megakernel_bigscene_quality``).
    """
    def rd(slot, j):
        return pltpu.make_async_copy(
            gtab.at[:, pl.ds(j * tile_t, tile_t)], rwbuf.at[slot],
            rwsems.at[slot, 0])

    def wr(slot, j):
        return pltpu.make_async_copy(
            rwbuf.at[slot], gtab.at[:, pl.ds(j * tile_t, tile_t)],
            rwsems.at[slot, 1])

    def piece_for(j):
        acc = None
        for terms, idx_col in events:
            onehot = (
                (jax.lax.broadcasted_iota(jnp.int32, (r, tile_t), 1)
                 + j * tile_t) == idx_col
            ).astype(jnp.bfloat16)
            for term in terms:
                p = jnp.dot(term, onehot,
                            preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        return acc

    rd(0, 0).start()

    def body(j, _):
        slot = lax.rem(j, 2)
        nxt = lax.rem(j + 1, 2)

        @pl.when(j + 1 < n_blocks)
        def _pref():
            # slot `nxt` was written back at step j-1; its write must
            # land before the next read overwrites the buffer
            @pl.when(j >= 1)
            def _():
                wr(nxt, j - 1).wait()

            rd(nxt, j + 1).start()

        piece = piece_for(j)
        rd(slot, j).wait()
        rwbuf[slot] = rwbuf[slot] + piece
        wr(slot, j).start()
        return 0

    lax.fori_loop(0, n_blocks, body, 0)
    # drain: in-loop waits covered writes 0..n_blocks-3
    if n_blocks >= 2:
        wr((n_blocks - 2) % 2, n_blocks - 2).wait()
    wr((n_blocks - 1) % 2, n_blocks - 1).wait()


def _bigscene_walk(rays, seeds, gfeat_hbm, attrs_hbm, gbuf, abuf, sems,
                   *, cfg: RenderConfig, n_blocks: int, fast: bool):
    """Shared forward walk: (acc_r, acc_g, acc_b) rows after the spp
    loop. The backward kernel replays the same per-sample walk (see
    megakernel_bigscene_grad)."""
    sweep = functools.partial(
        _sweep, gfeat_hbm=gfeat_hbm, attrs_hbm=attrs_hbm,
        gbuf=gbuf, abuf=abuf, sems=sems, n_blocks=n_blocks, fast=fast,
    )

    ox0, oy0, oz0 = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx0, dy0, dz0 = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    src0 = jnp.full_like(ox0, -1.0).astype(jnp.int32)

    # Camera rays are identical for every sample: hoist their sweep.
    fh_d, fh_i, fh_a = sweep(ox0, oy0, oz0, dx0, dy0, dz0, src0)

    def sample_body(_, carry):
        seed, acc_r, acc_g, acc_b = carry
        ox, oy, oz = ox0, oy0, oz0
        dx, dy, dz = dx0, dy0, dz0
        src = src0
        alive = jnp.ones_like(ox, dtype=jnp.bool_)
        thr_r = jnp.ones_like(ox)
        thr_g = jnp.ones_like(ox)
        thr_b = jnp.ones_like(ox)
        rad_r = jnp.zeros_like(ox)
        rad_g = jnp.zeros_like(ox)
        rad_b = jnp.zeros_like(ox)

        for bounce in range(cfg.max_bounces):
            if bounce == 0:
                dist, idx, attr = fh_d, fh_i, fh_a
            else:
                dist, idx, attr = sweep(ox, oy, oz, dx, dy, dz, src)
            hit = alive & (idx >= 0)
            nx, ny, nz, ar, ag, ab, er, eg, eb = _shade_rows(attr)

            flip = nx * dx + ny * dy + nz * dz > 0.0
            nx = jnp.where(flip, -nx, nx)
            ny = jnp.where(flip, -ny, ny)
            nz = jnp.where(flip, -nz, nz)

            # LCG draws; state advances only on hits (conformance).
            s1, u1 = _lcg(seed)
            s2, u2 = _lcg(s1)
            seed = jnp.where(hit, s2, seed)

            # angle-uniform sampler (src/geom.h:164-177)
            az = u1 * np.float32(2.0 * _PI)
            el = u2 * np.float32(0.5 * _PI)
            fx = jnp.cos(el)
            sx_ = jnp.cos(az) * fx
            sy_ = jnp.sin(el)
            sz_ = jnp.sin(az) * fx
            aligned = nx * sx_ + ny * sy_ + nz * sz_ >= 0.0
            sgn = jnp.where(aligned, 1.0, -1.0).astype(jnp.float32)
            ndx, ndy, ndz = sx_ * sgn, sy_ * sgn, sz_ * sgn
            cos_t = ndx * nx + ndy * ny + ndz * nz
            w = jnp.float32(2.0) * cos_t

            rad_r = rad_r + jnp.where(hit, thr_r * er, 0.0)
            rad_g = rad_g + jnp.where(hit, thr_g * eg, 0.0)
            rad_b = rad_b + jnp.where(hit, thr_b * eb, 0.0)
            thr_r = jnp.where(hit, thr_r * ar * w, thr_r)
            thr_g = jnp.where(hit, thr_g * ag * w, thr_g)
            thr_b = jnp.where(hit, thr_b * ab * w, thr_b)

            ox = jnp.where(hit, ox + dist * dx, ox)
            oy = jnp.where(hit, oy + dist * dy, oy)
            oz = jnp.where(hit, oz + dist * dz, oz)
            dx = jnp.where(hit, ndx, dx)
            dy = jnp.where(hit, ndy, dy)
            dz = jnp.where(hit, ndz, dz)
            src = jnp.where(hit, idx, src)
            alive = hit

        return (seed, acc_r + rad_r, acc_g + rad_g, acc_b + rad_b)

    seed0 = seeds[0:1, :]
    zeros = jnp.zeros_like(ox0)
    _, acc_r, acc_g, acc_b = lax.fori_loop(
        0, cfg.spp, sample_body, (seed0, zeros, zeros, zeros)
    )
    return acc_r, acc_g, acc_b


def _bigscene_kernel(rays, seeds, gfeat_hbm, attrs_hbm, out, gbuf, abuf,
                     sems, *, cfg: RenderConfig, n_blocks: int,
                     fast: bool):
    acc_r, acc_g, acc_b = _bigscene_walk(
        rays, seeds, gfeat_hbm, attrs_hbm, gbuf, abuf, sems,
        cfg=cfg, n_blocks=n_blocks, fast=fast,
    )
    inv = np.float32(1.0) / np.float32(cfg.spp)
    out[0:1, :] = acc_r * inv
    out[1:2, :] = acc_g * inv
    out[2:3, :] = acc_b * inv
    out[3:4, :] = jnp.zeros_like(acc_r)


def bigscene_tables(scene):
    """Build the streamed tables from a scene (differentiable).

    Returns ``(gfeat (4·Tp, 128) bf16, attrs (ACOLS, Tp), n_blocks)``
    with Tp padded to TILE_T by degenerate always-miss triangles.
    Feature block ``j`` occupies gfeat rows ``[4·TILE_T·j,
    4·TILE_T·(j+1))`` as [a | u_num | v_num | d_num] row groups of
    TILE_T triangles each; the K=128 columns hold the 6 bf16 split-term
    groups of the fp32-emulating single-pass matmul (see
    ``intersect_pallas.pack_rhs``), so every DMA slice is lane-tile
    aligned and half the bytes of an f32 table. Attributes are stored
    as ROWS for the same reason.
    """
    v0, v1, v2 = scene.v0, scene.v1, scene.v2
    t = v0.shape[0]
    pad = (-t) % TILE_T
    if pad:
        z = jnp.zeros((pad, 3), jnp.float32)
        v0, v1, v2 = (jnp.concatenate([x, z]) for x in (v0, v1, v2))
    gfeat = pack_tri_blocks(v0, v1, v2, TILE_T)      # (4·Tp, 128) bf16

    n = scene.normals()
    acols = jnp.concatenate(
        [n, scene.albedo, scene.emission,
         jnp.zeros((t, _ACOLS - 9), jnp.float32)], axis=1,
    )
    if pad:
        acols = jnp.concatenate(
            [acols, jnp.zeros((pad, _ACOLS), jnp.float32)])
    return gfeat, acols.T, (t + pad) // TILE_T


def supported(scene, cfg: RenderConfig) -> bool:
    return (
        scene.n_tris <= BIG_MAX_TRIS
        and cfg.rng == "lcg"
        and cfg.sampler == "angle"
        and not cfg.nee
        and cfg.rr_start == 0
        and not cfg.stratify
    )


def bigscene_call(rays, seeds, gfeat, attrs, cfg: RenderConfig,
                  n_blocks: int, fast: bool = False):
    """Raw forward pallas_call on packed rows → ``(4, Np)`` rows."""
    from spath_tpu.ops.pallas.megakernel import tile_for

    np_ = rays.shape[1]
    tile = tile_for(np_, TILE_R)
    kernel = functools.partial(
        _bigscene_kernel, cfg=cfg, n_blocks=n_blocks, fast=fast)
    return pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),    # gfeat stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),    # attrs stays in HBM
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * TILE_T, _QK), jnp.bfloat16),
            pltpu.VMEM((2, _ACOLS, TILE_T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(rays, seeds, gfeat, attrs)


def render_radiance_bigscene(scene, camera, cfg: RenderConfig, seed=0,
                             fast: bool = False):
    """Unclamped mean radiance ``(H, W, 3)`` via the streamed fused
    kernel. Forward-only; the differentiable entry point is
    ``megakernel_bigscene_grad.render_radiance_bigscene_grad``.
    """
    from spath_tpu.ops.pallas.megakernel import pack_rays

    if not supported(scene, cfg):
        raise ValueError(
            "bigscene megakernel supports lcg+angle, T <= BIG_MAX_TRIS")
    rays, seeds, n = pack_rays(camera, cfg, seed, lane_multiple=TILE_R)
    gfeat, attrs, n_blocks = bigscene_tables(scene)
    out = bigscene_call(rays, seeds, gfeat, attrs, cfg, n_blocks, fast)
    return out[:3, :n].T.reshape(cfg.height, cfg.width, 3)
