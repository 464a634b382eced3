"""Sharded FUSED megakernels: the fast path × the ``rays`` mesh axis.

Round-1 left the fused whole-frame kernels (``ops/pallas/megakernel*``)
single-device: the multi-chip path routed through the ~5× slower XLA
wavefront. This module runs the fused kernels — forward AND the
hand-written VJP — inside ``shard_map``, the analog of the reference
running its best kernel on every device with the scene buffers
replicated (``src/cl_renderer.cpp:211-214``, ``src/vk_renderer.cpp:357-364``):

  * ray/seed rows are sharded on lanes over the ``rays`` axis
    (``P(None, "rays")``) — each device launches the same Pallas kernel
    on its own whole tiles;
  * the scene table is replicated (``P()``);
  * forward needs NO collectives beyond the output's implicit
    all-gather; backward psums the scene-table adjoint over the mesh
    axis (one small ``(T, 18/19)`` reduction riding ICI), exactly the
    collective transpose ``shard_map`` would insert for a replicated
    input.

Bit-exactness: per-lane seeds/keys are derived from GLOBAL pixel ids
before sharding and the kernels are launch-grid-invariant, so the
sharded image and gradients are bitwise identical to the single-device
ones (tested on the fake 8-device CPU mesh in interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from spath_tpu.config import RenderConfig
from spath_tpu.ops.pallas import (
    megakernel,
    megakernel_grad,
    megakernel_quality,
    megakernel_quality_grad,
)

_ROW_IN = (P(None, "rays"), P(None, "rays"), P())
_ROW_OUT = P(None, "rays")


def fused_available() -> bool:
    """True when Pallas kernels can actually execute here: a real
    accelerator backend, or TPU interpret mode forced (CPU tests /
    dryrun). On plain CPU the sharded wavefront is used instead."""
    if jax.default_backend() != "cpu":
        return True
    try:  # private flag behind pltpu.force_tpu_interpret_mode
        from jax._src import config as _jconf

        return (
            _jconf.pallas_tpu_interpret_mode_context_manager.value
            is not None
        )
    except Exception:  # noqa: BLE001 — conservative fallback
        return False


def _pack_conformance(scene, camera, cfg, seed, mesh):
    lanes = megakernel.shard_lane_multiple(
        cfg.n_pixels, mesh.devices.size)
    rays, seeds, n = megakernel.pack_rays(
        camera, cfg, seed, lane_multiple=lanes)
    return rays, seeds, megakernel._scene_table(scene), n


def _pack_quality(scene, camera, cfg, seed, mesh):
    lanes = megakernel.shard_lane_multiple(
        cfg.n_pixels, mesh.devices.size)
    rays, pix, n = megakernel.pack_rays(camera, cfg, 0, lane_multiple=lanes)
    keys = (
        jnp.asarray(seed).astype(jnp.uint32) * megakernel_quality._GOLD
        + pix
    )
    return rays, keys, megakernel_quality.quality_table(scene), n


@partial(jax.jit, static_argnames=("cfg", "n_tris", "mesh", "quality",
                                   "light_rows"))
def _fwd_sharded(rays, seeds, tri, cfg: RenderConfig, n_tris: int, mesh,
                 quality: bool, light_rows=None):
    if quality:
        def call(r, s, t):
            return megakernel_quality_grad.quality_call(
                r, s, t, cfg, n_tris, light_rows)
    else:
        def call(r, s, t):
            return megakernel.mega_call(r, s, t, cfg, n_tris)
    fn = jax.shard_map(
        lambda r, s, t: call(r, s, t),
        mesh=mesh,
        in_specs=_ROW_IN,
        out_specs=_ROW_OUT,
        # pallas_call out_shapes carry no varying-mesh-axes annotation;
        # replication is by construction here (see module docstring).
        check_vma=False,
    )
    return fn(rays, seeds, tri)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _rows_sharded(tri, rays, seeds, cfg: RenderConfig, n_tris: int, mesh,
                  quality: bool, light_rows=None):
    """Sharded fused forward on packed rows with a hand-written VJP
    (each shard runs the reverse-sweep kernel; table adjoints psum)."""
    return _fwd_sharded(rays, seeds, tri, cfg, n_tris, mesh, quality,
                        light_rows)


def _rows_fwd(tri, rays, seeds, cfg, n_tris, mesh, quality,
              light_rows=None):
    out = _fwd_sharded(rays, seeds, tri, cfg, n_tris, mesh, quality,
                       light_rows)
    return out, (tri, rays, seeds)


def _rows_bwd(cfg, n_tris, mesh, quality, light_rows, res, gbar):
    tri, rays, seeds = res
    if quality:
        def bwd_call(r, s, t, g, c, n):
            return megakernel_quality_grad.quality_bwd_call(
                r, s, t, g, c, n, light_rows)
        to_table = megakernel_quality_grad.grad_table_from_gtab19
    else:
        bwd_call = megakernel_grad.mega_bwd_call
        to_table = megakernel_grad.grad_table_from_gtab18

    def shard_bwd(rays_s, seeds_s, tri_r, gbar_s):
        gtab, grays = bwd_call(rays_s, seeds_s, tri_r, gbar_s, cfg, n_tris)
        # The scene table is replicated; its adjoint is the sum of every
        # shard's partial — one small (T, 18/19) psum over ICI.
        return jax.lax.psum(gtab, "rays"), grays

    gtab, grays = jax.shard_map(
        shard_bwd,
        mesh=mesh,
        in_specs=(P(None, "rays"), P(None, "rays"), P(), P(None, "rays")),
        out_specs=(P(), P(None, "rays")),
        check_vma=False,  # gtab is replicated by the explicit psum
    )(rays, seeds, tri, gbar)
    gtri = to_table(gtab, n_tris)
    gseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return gtri, grays, gseeds


_rows_sharded.defvjp(_rows_fwd, _rows_bwd)


# ---- large scenes: the HBM-streamed kernels under shard_map ----
# Same replication contract: the (gfeat, attrs[, light]) tables live
# once per device in HBM/SMEM, ray rows shard on lanes, the
# attribute-table adjoint psums; the geometry-feature (and light) table
# cotangents are exactly zero (megakernel_bigscene_grad /
# megakernel_bigscene_quality docstrings).


def _pack_bigq(scene, camera, cfg, seed, mesh):
    from spath_tpu.ops.pallas import megakernel_bigscene_quality as bq

    lanes = megakernel.shard_lane_multiple(
        cfg.n_pixels, mesh.devices.size, bq.TILE_RQ)
    rays, pix, n = megakernel.pack_rays(camera, cfg, 0,
                                        lane_multiple=lanes)
    keys = (
        jnp.asarray(seed).astype(jnp.uint32) * megakernel_quality._GOLD
        + pix
    )
    gfeat, attrs, ltab, cdf_t, n_blocks, n_lights = \
        bq.bigscene_quality_tables(scene)
    return rays, keys, gfeat, attrs, ltab, cdf_t, n_blocks, n_lights, n


_BIGQ_IN = (P(None, "rays"), P(None, "rays"), P(), P(), P(), P())


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_lights", "mesh",
                                   "fast"))
def _bigq_fwd_sharded(rays, keys, gfeat, attrs, ltab, cdf_t,
                      cfg: RenderConfig, n_blocks: int, n_lights: int,
                      mesh, fast: bool):
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import bigq_call

    fn = jax.shard_map(
        lambda r, k, g, a, lt, ct: bigq_call(r, k, lt, ct, g, a, cfg,
                                             n_blocks, n_lights, fast),
        mesh=mesh,
        in_specs=_BIGQ_IN,
        out_specs=_ROW_OUT,
        check_vma=False,
    )
    return fn(rays, keys, gfeat, attrs, ltab, cdf_t)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _bigq_rows_sharded(gfeat, attrs, ltab, cdf_t, rays, keys,
                       cfg: RenderConfig, n_blocks: int, n_lights: int,
                       mesh, fast: bool):
    return _bigq_fwd_sharded(rays, keys, gfeat, attrs, ltab, cdf_t, cfg,
                             n_blocks, n_lights, mesh, fast)


def _bigq_rows_fwd(gfeat, attrs, ltab, cdf_t, rays, keys, cfg, n_blocks,
                   n_lights, mesh, fast):
    out = _bigq_fwd_sharded(rays, keys, gfeat, attrs, ltab, cdf_t, cfg,
                            n_blocks, n_lights, mesh, fast)
    return out, (gfeat, attrs, ltab, cdf_t, rays, keys)


def _bigq_rows_bwd(cfg, n_blocks, n_lights, mesh, fast, res, gbar):
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        bigq_bwd_call,
    )

    gfeat, attrs, ltab, cdf_t, rays, keys = res

    def shard_bwd(rays_s, keys_s, gfeat_r, attrs_r, ltab_r, cdf_r,
                  gbar_s):
        gattrs, grays = bigq_bwd_call(
            rays_s, keys_s, ltab_r, cdf_r, gfeat_r, attrs_r, gbar_s,
            cfg, n_blocks, n_lights, fast)
        return jax.lax.psum(gattrs, "rays"), grays

    gattrs, grays = jax.shard_map(
        shard_bwd,
        mesh=mesh,
        in_specs=_BIGQ_IN + (P(None, "rays"),),
        out_specs=(P(), P(None, "rays")),
        check_vma=False,
    )(rays, keys, gfeat, attrs, ltab, cdf_t, gbar)
    ggfeat = jnp.zeros_like(gfeat)
    gltab = jnp.zeros_like(ltab)
    gcdf = jnp.zeros_like(cdf_t)
    gkeys = np.zeros(keys.shape, dtype=jax.dtypes.float0)
    return ggfeat, gattrs, gltab, gcdf, grays, gkeys


_bigq_rows_sharded.defvjp(_bigq_rows_fwd, _bigq_rows_bwd)

def _pack_bigscene(scene, camera, cfg, seed, mesh):
    from spath_tpu.ops.pallas import megakernel_bigscene as big

    lanes = megakernel.shard_lane_multiple(
        cfg.n_pixels, mesh.devices.size, big.TILE_R)
    rays, seeds, n = megakernel.pack_rays(
        camera, cfg, seed, lane_multiple=lanes)
    gfeat, attrs, n_blocks = big.bigscene_tables(scene)
    return rays, seeds, gfeat, attrs, n_blocks, n


_BIG_IN = (P(None, "rays"), P(None, "rays"), P(), P())


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "mesh", "fast"))
def _big_fwd_sharded(rays, seeds, gfeat, attrs, cfg: RenderConfig,
                     n_blocks: int, mesh, fast: bool):
    from spath_tpu.ops.pallas.megakernel_bigscene import bigscene_call

    fn = jax.shard_map(
        lambda r, s, g, a: bigscene_call(r, s, g, a, cfg, n_blocks, fast),
        mesh=mesh,
        in_specs=_BIG_IN,
        out_specs=_ROW_OUT,
        check_vma=False,
    )
    return fn(rays, seeds, gfeat, attrs)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _big_rows_sharded(gfeat, attrs, rays, seeds, cfg: RenderConfig,
                      n_blocks: int, mesh, fast: bool):
    return _big_fwd_sharded(rays, seeds, gfeat, attrs, cfg, n_blocks,
                            mesh, fast)


def _big_rows_fwd(gfeat, attrs, rays, seeds, cfg, n_blocks, mesh, fast):
    out = _big_fwd_sharded(rays, seeds, gfeat, attrs, cfg, n_blocks,
                           mesh, fast)
    return out, (gfeat, attrs, rays, seeds)


def _big_rows_bwd(cfg, n_blocks, mesh, fast, res, gbar):
    from spath_tpu.ops.pallas.megakernel_bigscene_grad import (
        bigscene_bwd_call,
    )

    gfeat, attrs, rays, seeds = res

    def shard_bwd(rays_s, seeds_s, gfeat_r, attrs_r, gbar_s):
        gattrs, grays = bigscene_bwd_call(
            rays_s, seeds_s, gfeat_r, attrs_r, gbar_s, cfg, n_blocks,
            fast)
        return jax.lax.psum(gattrs, "rays"), grays

    gattrs, grays = jax.shard_map(
        shard_bwd,
        mesh=mesh,
        in_specs=_BIG_IN + (P(None, "rays"),),
        out_specs=(P(), P(None, "rays")),
        check_vma=False,
    )(rays, seeds, gfeat, attrs, gbar)
    ggfeat = jnp.zeros_like(gfeat)
    gseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return ggfeat, gattrs, grays, gseeds


_big_rows_sharded.defvjp(_big_rows_fwd, _big_rows_bwd)


def _to_image(out, n, cfg):
    return out[:3, :n].T.reshape(cfg.height, cfg.width, 3)


def render_radiance_fast_sharded(scene, camera, cfg: RenderConfig, seed=0,
                                 mesh=None):
    """Sharded forward-only fast render (serving path).

    Dispatch mirrors ``models.pathtracer.render_pt_fast``: the fused
    conformance or quality megakernel when the config fits (each device
    runs the whole-frame kernel on its ray shard), else the sharded XLA
    wavefront (``parallel.shard``). Output is bit-identical to the
    single-device fast path.
    """
    if mesh is None:
        from spath_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
    if fused_available():
        from spath_tpu.models.renderer import SMEM_ROUTE_MAX_TRIS
        from spath_tpu.ops.pallas import megakernel_bigscene_quality as bq

        small = scene.n_tris <= SMEM_ROUTE_MAX_TRIS
        if megakernel.supported(scene, cfg) and small:
            rays, seeds, tri, n = _pack_conformance(
                scene, camera, cfg, seed, mesh)
            out = _fwd_sharded(rays, seeds, tri, cfg, scene.n_tris, mesh,
                               False)
            return _to_image(out, n, cfg)
        if megakernel_quality.supported(scene, cfg) and (
                small or not bq.supported(scene, cfg)):
            rays, keys, tri, n = _pack_quality(
                scene, camera, cfg, seed, mesh)
            out = _fwd_sharded(rays, keys, tri, cfg, scene.n_tris, mesh,
                               True, scene.light_idx)
            return _to_image(out, n, cfg)
        if bq.supported(scene, cfg):
            (rays, keys, gfeat, attrs, ltab, cdf_t, n_blocks, n_lights,
             n) = _pack_bigq(scene, camera, cfg, seed, mesh)
            out = _bigq_fwd_sharded(
                rays, keys, gfeat, attrs, ltab, cdf_t, cfg, n_blocks,
                n_lights, mesh, cfg.intersect == "pallas_fast")
            return _to_image(out, n, cfg)
        from spath_tpu.ops.pallas import megakernel_bigscene

        if megakernel_bigscene.supported(scene, cfg):
            rays, seeds_p, gfeat, attrs, n_blocks, n = _pack_bigscene(
                scene, camera, cfg, seed, mesh)
            out = _big_fwd_sharded(
                rays, seeds_p, gfeat, attrs, cfg, n_blocks, mesh,
                cfg.intersect == "pallas_fast")
            return _to_image(out, n, cfg)
    from spath_tpu.parallel.shard import render_radiance_sharded

    return render_radiance_sharded(scene, camera, cfg, seed, mesh)


def render_pt_fast_sharded(scene, camera, cfg: RenderConfig, seed=0,
                           mesh=None):
    """Sharded fast frame with the reference clamp."""
    return jnp.clip(
        render_radiance_fast_sharded(scene, camera, cfg, seed, mesh),
        0.0, 1.0,
    )


def render_radiance_fastgrad_sharded(scene, camera, cfg: RenderConfig,
                                     seed=0, mesh=None):
    """Sharded differentiable radiance, fused-kernel VJP when supported.

    Same values and detached-sampling gradient semantics as the
    single-device ``render_radiance_fastgrad``; gradients flow to scene
    vertices/albedo/emission (via the replicated, psum-adjointed table)
    and the camera (via the sharded packed rays). Falls back to the
    sharded XLA wavefront otherwise.
    """
    if mesh is None:
        from spath_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
    if fused_available():
        from spath_tpu.models.renderer import SMEM_ROUTE_MAX_TRIS
        from spath_tpu.ops.pallas import megakernel_bigscene_quality as bq

        small = scene.n_tris <= SMEM_ROUTE_MAX_TRIS
        if megakernel_grad.supported_grad(scene, cfg):
            rays, seeds, tri, n = _pack_conformance(
                scene, camera, cfg, seed, mesh)
            out = _rows_sharded(tri, rays, seeds, cfg, scene.n_tris, mesh,
                                False, None)
            return _to_image(out, n, cfg)
        if megakernel_quality_grad.supported_grad(scene, cfg) and (
                small or not bq.supported_grad(scene, cfg)):
            rays, keys, tri, n = _pack_quality(
                scene, camera, cfg, seed, mesh)
            out = _rows_sharded(tri, rays, keys, cfg, scene.n_tris, mesh,
                                True, scene.light_idx)
            return _to_image(out, n, cfg)
        if bq.supported_grad(scene, cfg):
            (rays, keys, gfeat, attrs, ltab, cdf_t, n_blocks, n_lights,
             n) = _pack_bigq(scene, camera, cfg, seed, mesh)
            out = _bigq_rows_sharded(
                gfeat, attrs, ltab, cdf_t, rays, keys, cfg, n_blocks,
                n_lights, mesh, cfg.intersect == "pallas_fast")
            return _to_image(out, n, cfg)
        from spath_tpu.ops.pallas import megakernel_bigscene_grad

        if megakernel_bigscene_grad.supported_grad(scene, cfg):
            rays, seeds_p, gfeat, attrs, n_blocks, n = _pack_bigscene(
                scene, camera, cfg, seed, mesh)
            out = _big_rows_sharded(
                gfeat, attrs, rays, seeds_p, cfg, n_blocks, mesh,
                cfg.intersect == "pallas_fast")
            return _to_image(out, n, cfg)
    from spath_tpu.parallel.shard import render_radiance_sharded

    return render_radiance_sharded(scene, camera, cfg, seed, mesh)
