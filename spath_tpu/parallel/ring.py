"""Ring-sharded triangle intersection — long-context mode.

The reference replicates the whole triangle list on every device
(``src/cl_renderer.cpp:211-214``, ``src/vk_renderer.cpp:357-364``); fine
for ≤100k triangles (~5 MB) but not for scenes that outgrow HBM. The
brute-force intersection is a rays×triangles reduction — structurally
attention's queries×keys — so the ring-attention decomposition applies
exactly (SURVEY.md §5 "long-context"):

  * shard BOTH rays and triangles over the same 1-D mesh axis — each
    device keeps its ray tile resident (the "queries");
  * ``lax.ppermute`` the triangle shards around the ring (the "keys");
  * carry the running ``(min_distance, argmin_index)`` — an associative
    reduction, so the blockwise decomposition is exact, including the
    reference's lowest-index tie-break.

After ``n_devices`` steps every device holds the full-scene nearest hit
for its rays while only ever storing ``T/n_devices`` triangles.

``nearest_hit_ring`` must be called INSIDE ``shard_map`` (it uses
``axis_index``/``ppermute``); ``render_flat_ring`` is the packaged
end-to-end entry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from spath_tpu.config import MAX_DIST, RenderConfig
from spath_tpu.ops.intersect import nearest_hit

# numpy scalars, NOT jnp: a module-level jnp scalar is a committed
# device buffer, and executables that close over one run ~400x slower
# on the remote-TPU (axon) path than ones with inlined literals.
_BIG = np.float32(MAX_DIST)


def _combine(best_d, best_i, new_d, new_i):
    """Associative (min-distance, lowest-index-tie-break) combine."""
    take = (new_d < best_d) | (
        (new_d == best_d) & (new_i >= 0) & ((new_i < best_i) | (best_i < 0))
    )
    return (
        jnp.where(take, new_d, best_d),
        jnp.where(take, new_i, best_i),
    )


def nearest_hit_ring(
    o: jax.Array,
    d: jax.Array,
    v0: jax.Array,
    v1: jax.Array,
    v2: jax.Array,
    src_idx: jax.Array,
    cfg: RenderConfig | None = None,
    axis_name: str = "shard",
):
    """Nearest hit with triangle shards rotated around the mesh ring.

    Args are this device's shards: ``o, d, src_idx`` the local ray tile,
    ``v0..v2`` the local triangle shard (equal size on every device —
    pad with degenerate triangles). Triangle indices returned are GLOBAL
    (shard index × shard size + local), so source-exclusion semantics
    match the replicated path exactly.
    """
    n_shards = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    shard_size = v0.shape[0]

    best_d = jnp.full(o.shape[0], _BIG)
    best_i = jnp.full(o.shape[0], -1, jnp.int32)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    blk = (v0, v1, v2)
    for step in range(n_shards):
        # After `step` rotations we hold the shard originally on device
        # (me - step) mod n_shards.
        owner = (me - step) % n_shards
        base = (owner * shard_size).astype(jnp.int32)
        # Local-index intersection, then lift to global indices. The
        # source triangle is excluded by its global index: shift src
        # into this block's local frame.
        local_src = jnp.where(
            (src_idx >= base) & (src_idx < base + shard_size),
            src_idx - base,
            jnp.int32(-1) - 1,  # -2: matches no local triangle
        )
        d_blk, i_blk = nearest_hit(
            o, d, *blk, local_src,
            cfg=cfg, method=(cfg.intersect if cfg else "reference"),
        )
        i_blk = jnp.where(i_blk >= 0, i_blk + base, i_blk)
        best_d, best_i = _combine(best_d, best_i, d_blk, i_blk)
        if step + 1 < n_shards:
            blk = tuple(lax.ppermute(b, axis_name, perm) for b in blk)

    return best_d, best_i


def ring_gather_rows(table_shard: jax.Array, global_idx: jax.Array,
                     axis_name: str) -> jax.Array:
    """Gather rows by GLOBAL index from a table sharded around the ring.

    ``table_shard``: this device's ``(T/S, k)`` rows; ``global_idx``:
    ``(N,)`` int32 (negative → zero row). Rotates the shard S-1 times
    with ppermute; each ray picks its row when the owning shard passes
    by. This is how per-hit attributes (vertices, albedo, emission) are
    fetched without ever materializing the full table on one device.
    """
    n_shards = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    size = table_shard.shape[0]
    out = jnp.zeros((global_idx.shape[0], table_shard.shape[1]),
                    table_shard.dtype)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    blk = table_shard
    for step in range(n_shards):
        owner = (me - step) % n_shards
        base = (owner * size).astype(jnp.int32)
        local = jnp.clip(global_idx - base, 0, size - 1)
        rows = blk[local]
        mine = (global_idx >= base) & (global_idx < base + size)
        out = jnp.where(mine[:, None], rows, out)
        if step + 1 < n_shards:
            blk = lax.ppermute(blk, axis_name, perm)
    return out


def _pad_axis0(x, m):
    pad = (-x.shape[0]) % m
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x


def render_flat_ring(scene, camera, cfg: RenderConfig, mesh: Mesh):
    """Flat render with rays AND triangles sharded over one mesh axis —
    the memory-scalable path for scenes that outgrow replicated HBM."""
    from spath_tpu.camera import generate_rays

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    o, d = generate_rays(camera, cfg.width, cfg.height)
    n = o.shape[0]
    o = _pad_axis0(o, n_dev)
    d = _pad_axis0(d, n_dev)
    v0 = _pad_axis0(scene.v0, n_dev)
    v1 = _pad_axis0(scene.v1, n_dev)
    v2 = _pad_axis0(scene.v2, n_dev)
    albedo = _pad_axis0(scene.albedo, n_dev)
    src = jnp.full(o.shape[0], -1, jnp.int32)

    @jax.jit  # shard_map must run under jit; eager dispatch is pathological
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def go(o, d, v0, v1, v2, src, alb):
        _, idx = nearest_hit_ring(o, d, v0, v1, v2, src, cfg, axis)
        color = jnp.where(idx[:, None] >= 0, alb[jnp.maximum(idx, 0)], 0.0)
        return color

    img = go(o, d, v0, v1, v2, src, albedo)
    return img[:n].reshape(cfg.height, cfg.width, 3)


def _trace_ring(tri_table, o, d, pixel_ids, cfg, seed, axis_name):
    """Full path trace with triangle data resident only as ring shards.

    ``tri_table``: this device's (T/S, 15) rows [v0, v1, v2, albedo,
    emission]. The bounce loop mirrors models.pathtracer.trace_radiance
    (forward throughput, detached sampling, masked LCG advance) with
    the two sharded primitives substituted: nearest_hit_ring for the
    intersection and ring_gather_rows for per-hit attributes (the
    shading normal is derived from the gathered vertices, matching
    geom::flat_normal).
    """
    import numpy as _np

    from spath_tpu.ops.rng import lcg_next, per_pixel_uniforms
    from spath_tpu.ops.sampling import hemisphere_sample

    n = o.shape[0]
    v0s = tri_table[:, 0:3]
    v1s = tri_table[:, 3:6]
    v2s = tri_table[:, 6:9]

    if cfg.rng == "lcg":
        state = pixel_ids.astype(jnp.uint32) + seed.astype(jnp.uint32)
    else:
        state = jax.random.key(seed)

    def one_sample(state, s):
        oo, dd = o, d
        throughput = jnp.ones((n, 3), jnp.float32)
        radiance = jnp.zeros((n, 3), jnp.float32)
        alive = jnp.ones(n, bool)
        src = jnp.full(n, -1, jnp.int32)
        for bounce in range(cfg.max_bounces):
            dist, idx = nearest_hit_ring(
                oo, dd, v0s, v1s, v2s, src, cfg, axis_name
            )
            hit = alive & (idx >= 0)
            hit3 = hit[:, None]
            safe = jnp.maximum(idx, 0)
            rows = ring_gather_rows(tri_table, safe, axis_name)
            gv0, gv1, gv2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
            alb, emi = rows[:, 9:12], rows[:, 12:15]
            nrm = jnp.cross(gv1 - gv0, gv2 - gv0)
            nrm = nrm / jnp.maximum(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20
            )
            flip = jnp.sum(nrm * dd, axis=-1) > 0.0
            adj_n = jnp.where(flip[:, None], -nrm, nrm)

            if cfg.rng == "lcg":
                s1, u1 = lcg_next(state)
                s2, u2 = lcg_next(s1)
                state = jnp.where(hit, s2, state)
            else:
                k = jax.random.fold_in(jax.random.fold_in(state, s), bounce)
                us = per_pixel_uniforms(k, pixel_ids, 2)
                u1, u2 = us[0], us[1]
            nd, w = hemisphere_sample(cfg.sampler, adj_n, u1, u2)
            nd = lax.stop_gradient(nd)
            if cfg.sampler in ("angle", "uniform"):
                w = _np.float32(2.0) * jnp.sum(nd * adj_n, axis=-1)

            radiance = radiance + jnp.where(hit3, throughput * emi, 0.0)
            throughput = jnp.where(
                hit3, throughput * alb * w[:, None], throughput
            )
            point = oo + dist[:, None] * dd
            oo = jnp.where(hit3, point, oo)
            dd = jnp.where(hit3, nd, dd)
            src = jnp.where(hit, idx, src)
            alive = hit
        return radiance, state

    def body(carry, s):
        state, acc = carry
        rad, state = one_sample(state, s)
        return (state, acc + rad), None

    init = (state, jnp.zeros((n, 3), jnp.float32))
    if cfg.spp <= 8:
        carry = init
        for s in range(cfg.spp):
            carry, _ = body(carry, s)
        acc = carry[1]
    else:
        sbody = jax.checkpoint(body) if cfg.remat else body
        (_, acc), _ = lax.scan(sbody, init, jnp.arange(cfg.spp))
    return acc * (np.float32(1.0) / np.float32(cfg.spp))


def render_pt_ring(scene, camera, cfg: RenderConfig, mesh: Mesh, seed=0):
    """Path-traced frame with rays AND triangle data sharded over one
    mesh axis — the full long-context mode (SURVEY §5): per-device
    memory for scene data is T/S rows; triangle shards ride the ring
    for both intersection and attribute fetch. NEE is not yet supported
    in ring mode."""
    from spath_tpu.camera import generate_rays

    if cfg.nee:
        raise ValueError("ring mode does not support NEE yet")
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    o, d = generate_rays(camera, cfg.width, cfg.height)
    n = o.shape[0]
    o = _pad_axis0(o, n_dev)
    d = _pad_axis0(d, n_dev)
    pixel_ids = _pad_axis0(
        jnp.arange(n, dtype=jnp.uint32)[:, None], n_dev
    )[:, 0]
    table = jnp.concatenate(
        [scene.v0, scene.v1, scene.v2, scene.albedo, scene.emission],
        axis=1,
    )
    table = _pad_axis0(table, n_dev)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def go(o, d, pids, table, seed):
        return _trace_ring(table, o, d, pids, cfg, seed, axis)

    img = go(o, d, pixel_ids, table, jnp.asarray(seed))
    return jnp.clip(img[:n], 0.0, 1.0).reshape(cfg.height, cfg.width, 3)
