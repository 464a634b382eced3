"""Bucket-compacted fused forward renders — the fastest serving path.

Camera rays that miss the whole scene contribute exactly zero for every
sample and bounce, so the frame's background fraction (~43% of the
default 1080p view) is pure wasted kernel time. Skipping it INSIDE the
Pallas kernels was measured and rejected (any per-tile conditional
region stalls Mosaic's cross-tile pipeline — docs/PERFORMANCE.md); the
profitable form is HOST-side: classify once, pack the live lanes first,
and launch the fused megakernel on a bucket-padded live PREFIX — the
grid itself shrinks, no in-kernel branch.

Exactness: live lanes carry their original (ray, per-pixel RNG key)
pairs, so the kernel computes bit-identical radiance for them; dropped
lanes are certified camera-misses whose radiance is exactly the zero
they read back (asserted bit-exact vs the full fused launch in
``tests/test_compact_fused.py``). Padding slots past the live count get
zero-direction rays — guaranteed-miss, the same convention as
``pack_rays`` padding lanes.

The classification is SEED-INDEPENDENT (camera rays are deterministic),
so it is built once per (scene, camera, cfg) as a ``CompactPlan`` and
reused across frames — a static-viewpoint server re-renders with new
seeds paying exactly one kernel dispatch per frame, same as the full
fused path. The plan itself costs one extra dispatch + one host-scalar
fetch (the live count — the only dynamic shape, bucketed to
``PAD_MULTIPLE`` so camera motion rarely recompiles the kernel).
TPU-shaped choices throughout: the live-first permutation comes from
two ``cumsum`` scans and one ``nonzero`` gather (no sort), and the
frame is reassembled with a ``take`` gather (XLA scatters are slow on
TPU).

Forward/serving only — the training paths keep the jittable full-frame
custom-VJP kernels. The reference has no analog (it always traces every
pixel, ``src/cpu_renderer.cpp:30-68``); this is a beyond-parity
optimization in the spirit of its persistent frame buffers
(``src/cl_renderer.cpp``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spath_tpu.config import RenderConfig

#: live-count bucket: ≤1.5% average over-launch at 1080p, ~64 distinct
#: kernel programs worst-case over a full sweep of live fractions
PAD_MULTIPLE = 32768


class CompactPlan(NamedTuple):
    """Seed-independent per-(scene, camera, cfg) launch plan."""

    rays_p: jax.Array      # (8, Np) live-first rays; tail zero-direction
    pix_p: jax.Array       # (1, Np) permuted per-pixel RNG ids
    inv: jax.Array         # (Np,) lane -> packed slot (gather map)
    n_live: int            # host-side live count
    padded: int            # bucketed kernel lane count


@partial(jax.jit, static_argnames=("cfg", "lane_multiple"))
def _classify(scene, camera, cfg: RenderConfig, lane_multiple: int):
    """Pack + classify + live-first permute (no sort, no scatter).

    Classification uses the XLA ``nearest_hit`` with the config's own
    ε semantics. The fused kernels re-derive hits with their own
    formulations (SMEM scalar MT walk / streamed K-packed Plücker), so
    a grazing ray a few ulps from an ε bound could in principle
    classify differently — the conformance suites (u8-exact at
    640×480, bit-exact compact-vs-full in test_compact_fused.py) pin
    that the hit SETS agree on every tested view, and a flipped lane
    costs one pixel of background, the same flip budget the kernels
    already accept against the wavefront."""
    from spath_tpu.ops.intersect import nearest_hit
    from spath_tpu.ops.pallas.megakernel import pack_rays

    rays, pix, _ = pack_rays(camera, cfg, 0, lane_multiple=lane_multiple)
    o = rays[0:3, :].T
    d = rays[3:6, :].T
    src = jnp.full(o.shape[0], -1, jnp.int32)
    _, idx = nearest_hit(o, d, scene.v0, scene.v1, scene.v2, src, cfg)
    live = idx >= 0
    total = rays.shape[1]
    n_live = jnp.sum(live).astype(jnp.int32)
    livei = live.astype(jnp.int32)
    # packed slot of every lane: live lanes keep order in the prefix,
    # miss lanes keep order in the tail
    inv = jnp.where(
        live, jnp.cumsum(livei) - 1,
        n_live + jnp.cumsum(1 - livei) - 1,
    ).astype(jnp.int32)
    (sel,) = jnp.nonzero(live, size=total, fill_value=0)
    in_prefix = jnp.arange(total, dtype=jnp.int32) < n_live
    rays_p = jnp.where(in_prefix[None, :], rays[:, sel], 0.0)
    pix_p = jnp.where(in_prefix[None, :], pix[:, sel], 0)
    return rays_p, pix_p, inv, n_live


def _lane_multiple(kernel: str) -> int:
    if kernel == "bigscene":
        from spath_tpu.ops.pallas.megakernel_bigscene import TILE_R

        return TILE_R
    if kernel == "bigscene_quality":
        from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
            TILE_RQ,
        )

        return TILE_RQ
    from spath_tpu.ops.pallas.megakernel import TILE_N

    return TILE_N


def make_compact_plan(scene, camera, cfg: RenderConfig,
                      pad_multiple: int = PAD_MULTIPLE,
                      kernel: str | None = None) -> CompactPlan:
    if kernel is None:
        kernel = _select_kernel(scene, cfg)
    if kernel is None:
        raise ValueError("no fused megakernel covers this (scene, cfg)")
    lanes = _lane_multiple(kernel)
    rays_p, pix_p, inv, n_live = _classify(scene, camera, cfg, lanes)
    n_live = int(n_live)                  # the one host scalar
    total = rays_p.shape[1]
    bucket = max(min(pad_multiple, total), lanes)
    bucket = -(-bucket // lanes) * lanes  # whole kernel tiles
    padded = min(-(-max(n_live, 1) // bucket) * bucket, total)
    return CompactPlan(rays_p, pix_p, inv, n_live, padded)


@partial(jax.jit, static_argnames=("cfg", "padded", "kernel"))
def _run(scene, rays_p, pix_p, inv, seed, cfg: RenderConfig,
         padded: int, kernel: str):
    """One fused launch on the live prefix + gather back to pixels."""
    rays_c = rays_p[:, :padded]
    fast = cfg.intersect == "pallas_fast"
    if kernel == "quality":
        from spath_tpu.ops.pallas.megakernel_quality import (
            _GOLD,
            quality_table,
        )
        from spath_tpu.ops.pallas.megakernel_quality_grad import (
            quality_call,
        )

        keys_c = (jnp.asarray(seed).astype(jnp.uint32) * _GOLD
                  + pix_p[:, :padded])
        rows = quality_call(rays_c, keys_c, quality_table(scene), cfg,
                            scene.n_tris, scene.light_idx)
    elif kernel == "bigscene_quality":
        from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
            bigq_rows,
            bigscene_quality_tables,
        )
        from spath_tpu.ops.pallas.megakernel_quality import _GOLD

        keys_c = (jnp.asarray(seed).astype(jnp.uint32) * _GOLD
                  + pix_p[:, :padded])
        gfeat, attrs, ltab, n_blocks, n_lights = \
            bigscene_quality_tables(scene)
        rows = bigq_rows(gfeat, attrs, ltab, rays_c, keys_c, cfg,
                         n_blocks, n_lights, fast)
    elif kernel == "bigscene":
        from spath_tpu.ops.pallas.megakernel_bigscene import (
            bigscene_call,
            bigscene_tables,
        )

        keys_c = pix_p[:, :padded] + jnp.asarray(seed).astype(jnp.uint32)
        gfeat, attrs, n_blocks = bigscene_tables(scene)
        rows = bigscene_call(rays_c, keys_c, gfeat, attrs, cfg,
                             n_blocks, fast)
    else:
        from spath_tpu.ops.pallas.megakernel import _scene_table, mega_call

        keys_c = pix_p[:, :padded] + jnp.asarray(seed).astype(jnp.uint32)
        rows = mega_call(rays_c, keys_c, _scene_table(scene), cfg,
                         scene.n_tris)
    # reassemble with a gather (scatters are slow on TPU): lanes whose
    # packed slot fell past `padded` are certified misses -> the zero
    # column appended at index `padded`
    rows_ext = jnp.concatenate(
        [rows, jnp.zeros((4, 1), jnp.float32)], axis=1)
    full = jnp.take(rows_ext, jnp.minimum(inv, padded), axis=1)
    n = cfg.width * cfg.height
    return full[:3, :n].T.reshape(cfg.height, cfg.width, 3)


def _select_kernel(scene, cfg: RenderConfig) -> str | None:
    from spath_tpu.models.renderer import SMEM_ROUTE_MAX_TRIS
    from spath_tpu.ops.pallas import (
        megakernel,
        megakernel_bigscene,
        megakernel_bigscene_quality,
        megakernel_quality,
    )

    if scene.n_tris <= SMEM_ROUTE_MAX_TRIS:
        if megakernel.supported(scene, cfg):
            return "conformance"
        if megakernel_quality.supported(scene, cfg):
            return "quality"
    # large scenes: the HBM-streamed kernels (registry routing order)
    if megakernel_bigscene_quality.supported(scene, cfg):
        return "bigscene_quality"
    if megakernel_bigscene.supported(scene, cfg):
        return "bigscene"
    return None


def supported(scene, cfg: RenderConfig) -> bool:
    """True when a fused megakernel (SMEM or HBM-streamed) covers
    (scene, cfg) and the frame spans multiple tiles (else compaction
    can't drop anything)."""
    kernel = _select_kernel(scene, cfg)
    return (kernel is not None
            and cfg.width * cfg.height > _lane_multiple(kernel))


#: tiny plan cache keyed by pytree object identity — Scene/Camera are
#: immutable frozen pytrees, so identity implies value. Bounded FIFO.
_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 8


def _cached_plan(scene, camera, cfg, pad_multiple) -> CompactPlan:
    key = (id(scene), id(camera), cfg, pad_multiple)
    plan = _PLAN_CACHE.get(key)
    if plan is None or plan[0] is not scene or plan[1] is not camera:
        if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        # hold scene/camera refs so ids stay valid while cached
        plan = (scene, camera,
                make_compact_plan(scene, camera, cfg, pad_multiple))
        _PLAN_CACHE[key] = plan
    return plan[2]


def render_radiance_compact_fused(scene, camera, cfg: RenderConfig,
                                  seed=0,
                                  pad_multiple: int = PAD_MULTIPLE,
                                  plan: CompactPlan | None = None):
    """Compacted fused forward render → unclamped ``(H, W, 3)`` radiance.

    Value-identical to the full fused launch; NOT jittable (the plan's
    live count crosses to the host) — it manages its own jitted pieces.
    Pass ``plan`` (or rely on the identity-keyed cache) to amortize the
    classification across frames at a fixed viewpoint.
    """
    kernel = _select_kernel(scene, cfg)
    if kernel is None:
        raise ValueError("no fused SMEM kernel covers this (scene, cfg)")
    if plan is None:
        plan = _cached_plan(scene, camera, cfg, pad_multiple)
    if plan.n_live == 0:
        return jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    return _run(scene, plan.rays_p, plan.pix_p, plan.inv, seed, cfg,
                plan.padded, kernel)
