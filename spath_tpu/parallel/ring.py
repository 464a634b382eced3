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
