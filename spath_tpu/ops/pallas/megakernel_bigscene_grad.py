"""Hand-written backward pass for the STREAMED large-scene megakernel.

Same reverse-sweep design as ``megakernel_grad.py`` — one Pallas launch
replays the forward walk per sample (tile-resident) and runs the
analytic adjoint of the conformance estimator — re-engineered for large
T where per-triangle VMEM accumulator ROWS are impossible (T×18 rows of
lanes at 16k triangles would be gigabytes):

  * the per-bounce adjoints (normal/albedo/emission — the only LIVE
    chains: under detached sampling the pure-BSDF estimator's position
    chain is identically zero, see ``megakernel_grad._bwd_tile``) are
    assembled into a ``(TILE_R, 16)`` contribution matrix and
    SCATTER-ADDED to the hit triangles by a transposed one-hot matmul
    per streamed block: ``gacc[j] += onehotᵀ(TILE_T, R) @ contribs`` —
    the MXU is the scatter engine, mirroring how the forward uses it as
    the gather engine;
  * the ``(16, Tp)`` adjoint accumulator is STREAMED through HBM
    (round 4, same design as ``megakernel_bigscene_quality``): each
    sample's per-bounce contribution events are collected, then one
    double-buffered read-modify-write pass over the adjoint's
    ``(16, TILE_T)`` HBM blocks scatters all of them while each block
    is VMEM-resident (``megakernel_bigscene.stream_scatter_rmw``).
    Nothing in VMEM scales with T, so the VJP cap equals the forward
    cap; across devices the table adjoint is still reduced by the
    shard_map psum when sharded.

The geometry-feature table gets a ZERO cotangent by the same argument
that makes ``megakernel_grad``'s v0/e1/e2 adjoints exact zeros (verified
there against autodiff); vertex gradients flow through the NORMAL
columns of the attribute table, which ``bigscene_tables`` builds
differentiably in XLA.
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
from spath_tpu.ops.pallas.megakernel import _lcg, pack_rays
from spath_tpu.ops.pallas.megakernel_bigscene import (
    _ACOLS,
    _QK,
    _hilo,
    _shade_rows,
    _sweep,
    BIG_GRAD_MAX_TRIS,
    TILE_R,
    TILE_T,
    bigscene_tables,
    supported,
)

_PI = np.float64(np.arccos(-1.0))


def supported_grad(scene, cfg: RenderConfig) -> bool:
    # vis_grad's warped/boundary adjoints live only in the wavefront
    return (supported(scene, cfg) and scene.n_tris <= BIG_GRAD_MAX_TRIS
            and not cfg.vis_grad)


def _bigscene_bwd_kernel(rays, seeds, gfeat_hbm, attrs_hbm, gbar, gtab,
                         grays, gbuf, abuf, sems, rwbuf, rwsems, *,
                         cfg: RenderConfig, n_blocks: int, fast: bool):
    from spath_tpu.ops.pallas.megakernel_bigscene import (
        stream_scatter_rmw,
        zero_hbm_blocks,
    )

    sweep = functools.partial(
        _sweep, gfeat_hbm=gfeat_hbm, attrs_hbm=attrs_hbm,
        gbuf=gbuf, abuf=abuf, sems=sems, n_blocks=n_blocks, fast=fast,
    )

    ox0, oy0, oz0 = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx0, dy0, dz0 = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    src0 = jnp.full_like(ox0, -1.0).astype(jnp.int32)
    fh = sweep(ox0, oy0, oz0, dx0, dy0, dz0, src0)

    r = ox0.shape[1]
    inv = np.float32(1.0 / cfg.spp)
    g_r = gbar[0:1, :] * inv
    g_g = gbar[1:2, :] * inv
    g_b = gbar[2:3, :] * inv
    nb = cfg.max_bounces
    zrow = jnp.zeros_like(ox0)

    # The (16, Tp) adjoint lives in HBM, rmw-streamed per sample
    # (module docstring); zeroed once at grid step 0.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        zero_hbm_blocks(gtab, rwbuf, rwsems, n_blocks, TILE_T)

    def sample_body(_, seed):
        # ---- forward replay (bit-identical to the forward kernel) ----
        ox, oy, oz = ox0, oy0, oz0
        dx, dy, dz = dx0, dy0, dz0
        src = src0
        alive = jnp.ones_like(ox, dtype=jnp.bool_)
        tr_r = jnp.ones_like(ox)
        tr_g = jnp.ones_like(ox)
        tr_b = jnp.ones_like(ox)
        saved = []
        for bounce in range(nb):
            if bounce == 0:
                dist, idx, attr = fh
            else:
                dist, idx, attr = sweep(ox, oy, oz, dx, dy, dz, src)
            hit = alive & (idx >= 0)
            nx, ny, nz, ar, ag, ab_, er, eg, eb_ = _shade_rows(attr)
            flip = nx * dx + ny * dy + nz * dz > 0.0
            fs = jnp.where(flip, -1.0, 1.0).astype(jnp.float32)
            nx, ny, nz = fs * nx, fs * ny, fs * nz

            s1, u1 = _lcg(seed)
            s2, u2 = _lcg(s1)
            seed = jnp.where(hit, s2, seed)
            az = u1 * np.float32(2.0 * _PI)
            el = u2 * np.float32(0.5 * _PI)
            fx = jnp.cos(el)
            sx_ = jnp.cos(az) * fx
            sy_ = jnp.sin(el)
            sz_ = jnp.sin(az) * fx
            aligned = nx * sx_ + ny * sy_ + nz * sz_ >= 0.0
            sgn = jnp.where(aligned, 1.0, -1.0).astype(jnp.float32)
            omx, omy, omz = sx_ * sgn, sy_ * sgn, sz_ * sgn
            w = jnp.float32(2.0) * (omx * nx + omy * ny + omz * nz)

            saved.append((idx, hit, tr_r, tr_g, tr_b,
                          ar, ag, ab_, er, eg, eb_, fs, omx, omy, omz, w))

            tr_r = jnp.where(hit, tr_r * ar * w, tr_r)
            tr_g = jnp.where(hit, tr_g * ag * w, tr_g)
            tr_b = jnp.where(hit, tr_b * ab_ * w, tr_b)
            ox = jnp.where(hit, ox + dist * dx, ox)
            oy = jnp.where(hit, oy + dist * dy, oy)
            oz = jnp.where(hit, oz + dist * dz, oz)
            dx = jnp.where(hit, omx, dx)
            dy = jnp.where(hit, omy, dy)
            dz = jnp.where(hit, omz, dz)
            src = jnp.where(hit, idx, src)
            alive = hit

        # ---- reverse sweep (thr-bar recursion; position chain is
        # identically zero — megakernel_grad._bwd_tile docstring) ----
        events = []
        tb_r, tb_g, tb_b = zrow, zrow, zrow
        for bounce in reversed(range(nb)):
            (idx, hit, tr_r, tr_g, tr_b,
             ar, ag, ab_, er, eg, eb_, fs, omx, omy, omz, w) = saved[bounce]
            abar_r = jnp.where(hit, tb_r * tr_r * w, 0.0)
            abar_g = jnp.where(hit, tb_g * tr_g * w, 0.0)
            abar_b = jnp.where(hit, tb_b * tr_b * w, 0.0)
            wbar = jnp.where(
                hit,
                tb_r * tr_r * ar + tb_g * tr_g * ag + tb_b * tr_b * ab_,
                0.0,
            )
            ebar_r = jnp.where(hit, g_r * tr_r, 0.0)
            ebar_g = jnp.where(hit, g_g * tr_g, 0.0)
            ebar_b = jnp.where(hit, g_b * tr_b, 0.0)
            two = jnp.float32(2.0)
            nbar_x = two * wbar * fs * omx
            nbar_y = two * wbar * fs * omy
            nbar_z = two * wbar * fs * omz
            tb_r = jnp.where(hit, g_r * er + tb_r * ar * w, tb_r)
            tb_g = jnp.where(hit, g_g * eg + tb_g * ag * w, tb_g)
            tb_b = jnp.where(hit, g_b * eb_ + tb_b * ab_ * w, tb_b)

            # (ACOLS, R) contribution ROWS in attrs row order.
            contribs = jnp.concatenate(
                [nbar_x, nbar_y, nbar_z, abar_r, abar_g, abar_b,
                 ebar_r, ebar_g, ebar_b]
                + [zrow] * (_ACOLS - 9),
                axis=0,
            )

            # MXU scatter-add event: per block,
            # gacc[:, j] += contribs (ACOLS, R) @ onehot (R, TILE_T).
            # Misses are masked by a -1 index sentinel (int32 transpose;
            # Mosaic cannot transpose i1 vectors). hi/lo-split contribs
            # against an exactly-representable bf16 one-hot: each
            # scattered value keeps ~16 mantissa bits (vs 8 single-pass)
            # at 1/3 the HIGHEST-precision matmul cost — far below the
            # Monte-Carlo noise floor of the gradient estimate itself.
            events.append((_hilo(contribs),
                           jnp.where(hit, idx, -1).T))   # (R, 1)

        stream_scatter_rmw(gtab, rwbuf, rwsems, events, n_blocks,
                           TILE_T, r)
        return seed

    lax.fori_loop(0, cfg.spp, sample_body, seeds[0:1, :])

    grays[...] = jnp.zeros_like(grays)   # position chain dead -> exact 0


def bigscene_bwd_call(rays, seeds, gfeat, attrs, gbar, cfg: RenderConfig,
                      n_blocks: int, fast: bool = False):
    """Raw backward pallas_call → ``(gattrs (ACOLS, Tp), grays (8, Np))``
    — the attribute-table adjoint in the same row layout as ``attrs``."""
    from spath_tpu.ops.pallas.megakernel import tile_for

    np_ = rays.shape[1]
    tile = tile_for(np_, TILE_R)
    tp = attrs.shape[1]
    kernel = functools.partial(
        _bigscene_bwd_kernel, cfg=cfg, n_blocks=n_blocks, fast=fast)
    return pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # whole-buffer HBM adjoint, rmw-streamed by the kernel
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_ACOLS, tp), jnp.float32),
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4 * TILE_T, _QK), jnp.bfloat16),
            pltpu.VMEM((2, _ACOLS, TILE_T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, _ACOLS, TILE_T), jnp.float32),   # rmw bufs
            pltpu.SemaphoreType.DMA((2, 2)),                # rmw sems
        ],
    )(rays, seeds, gfeat, attrs, gbar)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bigscene_rows(gfeat, attrs, rays, seeds, cfg: RenderConfig,
                  n_blocks: int, fast: bool):
    """Forward streamed megakernel on packed rows, hand-written VJP."""
    from spath_tpu.ops.pallas.megakernel_bigscene import bigscene_call

    return bigscene_call(rays, seeds, gfeat, attrs, cfg, n_blocks, fast)


def _big_fwd(gfeat, attrs, rays, seeds, cfg, n_blocks, fast):
    out = bigscene_rows(gfeat, attrs, rays, seeds, cfg, n_blocks, fast)
    return out, (gfeat, attrs, rays, seeds)


def _big_bwd(cfg, n_blocks, fast, res, gbar):
    gfeat, attrs, rays, seeds = res
    gattrs, grays = bigscene_bwd_call(
        rays, seeds, gfeat, attrs, gbar, cfg, n_blocks, fast)
    # Geometry features carry an exactly-zero cotangent under detached
    # sampling (the position chain of the pure-BSDF estimator is dead);
    # vertex gradients flow through the normal columns of `attrs`.
    ggfeat = jnp.zeros_like(gfeat)
    gseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return ggfeat, gattrs, grays, gseeds


bigscene_rows.defvjp(_big_fwd, _big_bwd)


def render_radiance_bigscene_grad(scene, camera, cfg: RenderConfig,
                                  seed=0, fast: bool = False):
    """Differentiable streamed fused render: unclamped mean radiance
    ``(H, W, 3)`` with gradients to scene normals→vertices, albedo and
    emission (via the differentiable attribute table) for scenes up to
    ``BIG_GRAD_MAX_TRIS`` triangles."""
    if not supported_grad(scene, cfg):
        raise ValueError(
            "bigscene VJP supports lcg+angle, T <= BIG_GRAD_MAX_TRIS")
    rays, seeds, n = pack_rays(camera, cfg, seed, lane_multiple=TILE_R)
    gfeat, attrs, n_blocks = bigscene_tables(scene)
    out = bigscene_rows(gfeat, attrs, rays, seeds, cfg, n_blocks, fast)
    return out[:3, :n].T.reshape(cfg.height, cfg.width, 3)
