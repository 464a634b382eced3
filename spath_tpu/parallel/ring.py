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


def _dist_from_rows(o, d, rows9, idx):
    """Differentiable Möller–Trumbore distance of each ray to its WINNER
    triangle, taken from the carried row (``rows9`` = the winner's
    ``[v0, v1, v2]`` columns) instead of a table gather.

    Same float expressions as ``ops.intersect._dist_selected`` (the
    replicated path's O(N) backward), so ring grads match replicated
    grads term-for-term; only the cross-device accumulation order
    differs."""
    a0, b0, c0 = rows9[:, 0:3], rows9[:, 3:6], rows9[:, 6:9]
    e1 = b0 - a0
    e2 = c0 - a0
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = jnp.float32(1.0) / jnp.where(jnp.abs(a) > 0.0, a, jnp.float32(1.0))
    s = o - a0
    q = jnp.cross(s, e1)
    dist = f * jnp.sum(e2 * q, axis=-1)
    return jnp.where(idx >= 0, dist, _BIG)


def ring_scatter_rows(pairs, size: int, axis_name: str) -> jax.Array:
    """Transpose of the ring row gathers: accumulate per-ray row
    cotangents into the RING-SHARDED table's adjoint.

    ``pairs``: list of ``(g (N, k), global_idx (N,))`` contributions
    (cotangents and the global row each ray touched). Returns the
    ``(size, k)`` adjoint of THIS device's original table shard.

    This is the triangle-sharded backward the forward's decomposition
    implies: the adjoint of the table is an associative sum of per-ray
    scatter contributions, so a ``(size, k)`` accumulator rides the ring
    once — at each step every device adds its local scatter for the
    accumulator's owner, and after S rotations each accumulator lands
    back on its owner holding the full cross-device sum. Collective
    traffic equals ONE forward table rotation; per-device memory stays
    O(T/S). Reference point: the rays×triangles reduction of
    ``src/render.comp:104-121`` under the SURVEY.md §5 ring
    decomposition, now for the backward pass."""
    n_shards = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    k = pairs[0][0].shape[1]
    acc = jnp.zeros((size, k), jnp.float32)
    for step in range(n_shards):
        # the accumulator resident here at step t started on device
        # me - t and is labeled with owner (start - 1) mod S, so after
        # the final step the owner-me accumulator sits on device me
        owner = (me - step - 1) % n_shards
        base = (owner * size).astype(jnp.int32)
        for g, gi in pairs:
            local = gi - base
            mine = (local >= 0) & (local < size)
            lc = jnp.clip(local, 0, size - 1)
            acc = acc.at[lc].add(jnp.where(mine[:, None], g, 0.0))
        if step + 1 < n_shards:
            acc = lax.ppermute(acc, axis_name, perm)
    return acc


def _take_mask(best_d, best_i, new_d, new_i):
    """Associative (min-distance, lowest-index-tie-break) take mask."""
    return (new_d < best_d) | (
        (new_d == best_d) & (new_i >= 0) & ((new_i < best_i) | (best_i < 0))
    )


def _combine(best_d, best_i, new_d, new_i):
    """Associative (min-distance, lowest-index-tie-break) combine."""
    take = _take_mask(best_d, best_i, new_d, new_i)
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
        # Double-buffered rotation: issue the ppermute BEFORE the sweep
        # consumes the resident shard, so XLA's async collective-permute
        # (start/done pair) rides the ICI under the sweep compute
        # instead of serializing after it. Both only READ ``blk``; the
        # permuted copy is not consumed until the next step.
        nxt = (tuple(lax.ppermute(b, axis_name, perm) for b in blk)
               if step + 1 < n_shards else None)
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
        if nxt is not None:
            blk = nxt

    return best_d, best_i


def _sweep_step(blk, owner, base, o, d, src_idx, cfg, carry):
    """One ring step of the fused sweep + winner-row carry.

    SHARED body of ``nearest_hit_ring_rows`` and
    ``nearest_and_select_ring`` — their bit-equality is by construction,
    not by mirrored copies. ``carry`` = (best_d, best_i, best_rows,
    row0); ``row0`` captures global row 0 (the miss-lane row) as its
    owner shard passes by.
    """
    best_d, best_i, best_rows, row0 = carry
    size = blk.shape[0]
    local_src = jnp.where(
        (src_idx >= base) & (src_idx < base + size),
        src_idx - base,
        jnp.int32(-1) - 1,  # -2: matches no local triangle
    )
    d_blk, i_blk = nearest_hit(
        o, d, blk[:, 0:3], blk[:, 3:6], blk[:, 6:9], local_src,
        cfg=cfg, method=(cfg.intersect if cfg else "reference"),
    )
    rows_blk = blk[jnp.clip(i_blk, 0, size - 1)]
    gi_blk = jnp.where(i_blk >= 0, i_blk + base, i_blk)
    take = _take_mask(best_d, best_i, d_blk, gi_blk)
    best_d = jnp.where(take, d_blk, best_d)
    best_i = jnp.where(take, gi_blk, best_i)
    best_rows = jnp.where(take[:, None], rows_blk, best_rows)
    row0 = jnp.where(owner == 0, blk[0], row0)
    return best_d, best_i, best_rows, row0


def _select_step(blk, owner, base, u_sel, n_tris, prob_col, cdf_col,
                 last_owner, last_local, carry):
    """One ring step of the fused categorical selection + row carry.

    SHARED body of ``ring_light_select_rows`` and
    ``nearest_and_select_ring`` (see ``_sweep_step``). ``carry`` =
    (found, g, rows, fb_row); ``fb_row`` captures global row
    ``n_tris - 1`` (the clip-semantics fallback) as its owner passes.
    """
    found, g, rows, fb_row = carry
    size = blk.shape[0]
    cdf = blk[:, cdf_col]
    j = jnp.searchsorted(cdf, u_sel, side="right").astype(jnp.int32)
    prev0 = cdf[0] - blk[0, prob_col]
    jc = jnp.clip(j, 0, size - 1)
    gidx = base + jc
    in_shard = (j < size) & ((j > 0) | (u_sel >= prev0)) \
        & (gidx < jnp.int32(n_tris))
    newly = in_shard & ~found
    g = jnp.where(newly, gidx, g)
    rows = jnp.where(newly[:, None], blk[jc], rows)
    found = found | in_shard
    fb_row = jnp.where(owner == last_owner, blk[last_local], fb_row)
    return found, g, rows, fb_row


def nearest_hit_ring_rows(
    o: jax.Array,
    d: jax.Array,
    tri_table: jax.Array,
    src_idx: jax.Array,
    cfg: RenderConfig | None = None,
    axis_name: str = "shard",
):
    """Fused ring sweep + winner-attribute carry: ONE rotation of the
    ``(T/S, k)`` table serves both the nearest-hit reduction and the
    per-hit attribute fetch.

    Equivalent to ``nearest_hit_ring`` followed by
    ``ring_gather_rows(tri_table, max(idx, 0))`` — bit-identical,
    including the lowest-index tie-break (the row rides the same take
    mask as the (distance, index) carry) and the miss-lane convention
    (global row 0, matching the replicated path's ``max(idx, 0)``
    gather) — but with one ring cycle instead of two: each step gathers
    the resident shard's candidate row locally and keeps it only where
    that shard wins the reduction. Vertex columns are ``tri_table[:,
    0:9]``. Returns ``(dist, global_idx, rows)``.

    DIFFERENTIABLE with a custom VJP whose residuals are O(N) (the
    winner rows — never the rotated shards, which plain autodiff of the
    unrolled loop would save, costing O(T) per device and defeating the
    sharding): the distance adjoint is the replicated path's O(N)
    selected-triangle chain evaluated on the carried row, and row
    cotangents ring-reduce back to the sharded table via
    ``ring_scatter_rows``.
    """
    return _ring_rows_p(o, d, tri_table, src_idx, cfg, axis_name,
                        tri_table.shape[0])


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring_rows_p(o, d, tri_table, src_idx, cfg, axis_name, size):
    return _ring_rows_impl(o, d, tri_table, src_idx, cfg, axis_name)


def _ring_rows_fwd(o, d, tri_table, src_idx, cfg, axis_name, size):
    out = _ring_rows_impl(o, d, tri_table, src_idx, cfg, axis_name)
    dist, idx, rows = out
    return out, (o, d, idx, rows)


def _ring_rows_bwd(cfg, axis_name, size, res, cots):
    o, d, idx, rows = res
    g_dist, _g_idx, g_rows = cots
    _, vjp = jax.vjp(
        lambda o_, d_, r_: _dist_from_rows(o_, d_, r_, idx),
        o, d, rows[:, 0:9])
    go, gd, gr9 = vjp(g_dist)
    g_rows = g_rows.at[:, 0:9].add(gr9)
    g_table = ring_scatter_rows(
        [(g_rows, jnp.maximum(idx, 0))], size, axis_name)
    return go, gd, g_table, None


_ring_rows_p.defvjp(_ring_rows_fwd, _ring_rows_bwd)


def _ring_rows_impl(o, d, tri_table, src_idx, cfg, axis_name):
    n_shards = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    shard_size = tri_table.shape[0]
    n = o.shape[0]

    carry = (
        jnp.full(n, _BIG),
        jnp.full(n, -1, jnp.int32),
        jnp.zeros((n, tri_table.shape[1]), tri_table.dtype),
        jnp.zeros((tri_table.shape[1],), tri_table.dtype),
    )
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    blk = tri_table
    for step in range(n_shards):
        owner = (me - step) % n_shards
        base = (owner * shard_size).astype(jnp.int32)
        # issue the rotation before the sweep consumes blk (see
        # nearest_hit_ring: overlap-friendly double buffering)
        nxt = (lax.ppermute(blk, axis_name, perm)
               if step + 1 < n_shards else None)
        carry = _sweep_step(blk, owner, base, o, d, src_idx, cfg, carry)
        if nxt is not None:
            blk = nxt

    best_d, best_i, best_rows, row0 = carry
    best_rows = jnp.where((best_i < 0)[:, None], row0[None, :], best_rows)
    return best_d, best_i, best_rows


def ring_light_select_rows(tri_table, u_sel, n_tris: int, axis_name: str,
                           prob_col: int = 15, cdf_col: int = 16):
    """Fused categorical light selection + light-row gather in ONE
    rotation — equivalent to ``ring_light_select`` followed by
    ``ring_gather_rows(tri_table, li)``, bit-identical, one ring cycle
    instead of two.

    Selection semantics (matching the replicated
    ``ops/nee.py::sample_light_points``): the global
    ``searchsorted(cdf, u, side='right')`` index, clipped to
    ``n_tris - 1``. Because the stored cdf column is the exact global
    cumsum, the crossing lives in exactly ONE shard and is locally
    detectable: shard-local ``searchsorted`` gives position ``j``, and
    the cdf value just before this shard is ``cdf[0] - prob[0]`` (both
    resident columns), so ``j == 0`` crossings at the shard boundary
    are decided without remote data. If no REAL row crosses (u beyond
    the last real cdf — only possible through cumsum rounding — the
    crossing then lands on a padding row, cdf 2.0), the clip semantics
    select global row ``n_tris - 1``, whose row is captured as it
    passes by (its owner shard is static).

    DIFFERENTIABLE with a custom VJP (see ``nearest_hit_ring_rows``):
    selection is detached (matching ``ops/nee.py``'s stop-gradient on
    the categorical draw), row cotangents ring-reduce to the sharded
    table at the selected global index.
    """
    return _ring_select_p(tri_table, u_sel, n_tris, axis_name,
                          prob_col, cdf_col, tri_table.shape[0])


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _ring_select_p(tri_table, u_sel, n_tris, axis_name, prob_col,
                   cdf_col, size):
    return _ring_select_impl(tri_table, u_sel, n_tris, axis_name,
                             prob_col, cdf_col)


def _ring_select_fwd(tri_table, u_sel, n_tris, axis_name, prob_col,
                     cdf_col, size):
    li, rows = _ring_select_impl(tri_table, u_sel, n_tris, axis_name,
                                 prob_col, cdf_col)
    return (li, rows), (li,)


def _ring_select_bwd(n_tris, axis_name, prob_col, cdf_col, size, res,
                     cots):
    (li,) = res
    _g_li, g_rows = cots
    g_table = ring_scatter_rows([(g_rows, li)], size, axis_name)
    return g_table, jnp.zeros(li.shape, jnp.float32)


_ring_select_p.defvjp(_ring_select_fwd, _ring_select_bwd)


def _ring_select_impl(tri_table, u_sel, n_tris: int, axis_name: str,
                      prob_col: int, cdf_col: int):
    n_shards = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    size = tri_table.shape[0]
    n = u_sel.shape[0]
    last_local = (n_tris - 1) % size      # static: owner of row n_tris-1
    last_owner = (n_tris - 1) // size
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    carry = (
        jnp.zeros(n, bool),
        jnp.zeros(n, jnp.int32),
        jnp.zeros((n, tri_table.shape[1]), tri_table.dtype),
        jnp.zeros((tri_table.shape[1],), tri_table.dtype),
    )

    blk = tri_table
    for step in range(n_shards):
        owner = (me - step) % n_shards
        base = (owner * size).astype(jnp.int32)
        nxt = (lax.ppermute(blk, axis_name, perm)
               if step + 1 < n_shards else None)
        carry = _select_step(blk, owner, base, u_sel, n_tris, prob_col,
                             cdf_col, last_owner, last_local, carry)
        if nxt is not None:
            blk = nxt

    found, g, rows, fb_row = carry
    li = jnp.where(found, g, jnp.int32(n_tris - 1))
    rows = jnp.where(found[:, None], rows, fb_row[None, :])
    return lax.stop_gradient(li), rows


def nearest_and_select_ring(
    o: jax.Array,
    d: jax.Array,
    tri_table: jax.Array,
    src_idx: jax.Array,
    u_sel: jax.Array,
    n_tris: int,
    cfg: RenderConfig | None = None,
    axis_name: str = "shard",
    prob_col: int = 15,
    cdf_col: int = 16,
):
    """Nearest-hit sweep AND categorical light selection in ONE ring
    rotation — equivalent to ``nearest_hit_ring_rows`` followed by
    ``ring_light_select_rows``, bit-identical, one table cycle instead
    of two.

    Legal whenever the selection uniform ``u_sel`` is available BEFORE
    the sweep, i.e. whenever the RNG draws are hit-independent
    (counter-based threefry/hash — which NEE mode requires;
    ``render_pt_ring`` rejects lcg/table with NEE). Both reductions are
    per-step functions of the same resident shard, so they share one
    ``ppermute`` of the 17-column table: per NEE bounce the ring moves
    17 (this) + 9 (shadow sweep) = 26 column-rotations instead of
    17 + 17 + 9 = 43, and one ring-cycle latency disappears.

    Both per-step bodies are the SHARED ``_sweep_step``/``_select_step``
    helpers used by the pairwise primitives, so bit-equality with
    ``nearest_hit_ring_rows`` + ``ring_light_select_rows`` holds by
    construction.

    Returns ``(dist, global_idx, winner_rows, light_idx, light_rows)``.

    DIFFERENTIABLE with a custom VJP (see ``nearest_hit_ring_rows``):
    both row cotangents (winner + light) share ONE adjoint ring cycle,
    mirroring the forward's shared rotation.
    """
    return _ring_sweepsel_p(o, d, tri_table, src_idx, u_sel, n_tris,
                            cfg, axis_name, prob_col, cdf_col,
                            tri_table.shape[0])


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _ring_sweepsel_p(o, d, tri_table, src_idx, u_sel, n_tris, cfg,
                     axis_name, prob_col, cdf_col, size):
    return _ring_sweepsel_impl(o, d, tri_table, src_idx, u_sel, n_tris,
                               cfg, axis_name, prob_col, cdf_col)


def _ring_sweepsel_fwd(o, d, tri_table, src_idx, u_sel, n_tris, cfg,
                       axis_name, prob_col, cdf_col, size):
    out = _ring_sweepsel_impl(o, d, tri_table, src_idx, u_sel, n_tris,
                              cfg, axis_name, prob_col, cdf_col)
    dist, idx, rows, li, lrows = out
    return out, (o, d, idx, rows, li)


def _ring_sweepsel_bwd(n_tris, cfg, axis_name, prob_col, cdf_col, size,
                       res, cots):
    o, d, idx, rows, li = res
    g_dist, _g_idx, g_rows, _g_li, g_lrows = cots
    _, vjp = jax.vjp(
        lambda o_, d_, r_: _dist_from_rows(o_, d_, r_, idx),
        o, d, rows[:, 0:9])
    go, gd, gr9 = vjp(g_dist)
    g_rows = g_rows.at[:, 0:9].add(gr9)
    g_table = ring_scatter_rows(
        [(g_rows, jnp.maximum(idx, 0)), (g_lrows, li)], size, axis_name)
    return go, gd, g_table, None, jnp.zeros(li.shape, jnp.float32)


_ring_sweepsel_p.defvjp(_ring_sweepsel_fwd, _ring_sweepsel_bwd)


def _ring_sweepsel_impl(o, d, tri_table, src_idx, u_sel, n_tris, cfg,
                        axis_name, prob_col, cdf_col):
    n_shards = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    size = tri_table.shape[0]
    n = o.shape[0]
    k = tri_table.shape[1]
    last_local = (n_tris - 1) % size
    last_owner = (n_tris - 1) // size
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    sweep_carry = (
        jnp.full(n, _BIG),
        jnp.full(n, -1, jnp.int32),
        jnp.zeros((n, k), tri_table.dtype),
        jnp.zeros((k,), tri_table.dtype),
    )
    sel_carry = (
        jnp.zeros(n, bool),
        jnp.zeros(n, jnp.int32),
        jnp.zeros((n, k), tri_table.dtype),
        jnp.zeros((k,), tri_table.dtype),
    )

    blk = tri_table
    for step in range(n_shards):
        owner = (me - step) % n_shards
        base = (owner * size).astype(jnp.int32)
        nxt = (lax.ppermute(blk, axis_name, perm)
               if step + 1 < n_shards else None)
        sweep_carry = _sweep_step(blk, owner, base, o, d, src_idx, cfg,
                                  sweep_carry)
        sel_carry = _select_step(blk, owner, base, u_sel, n_tris,
                                 prob_col, cdf_col, last_owner,
                                 last_local, sel_carry)
        if nxt is not None:
            blk = nxt

    best_d, best_i, best_rows, row0 = sweep_carry
    found, g, sel_rows, fb_row = sel_carry
    best_rows = jnp.where((best_i < 0)[:, None], row0[None, :], best_rows)
    li = jnp.where(found, g, jnp.int32(n_tris - 1))
    sel_rows = jnp.where(found[:, None], sel_rows, fb_row[None, :])
    return best_d, best_i, best_rows, lax.stop_gradient(li), sel_rows


def ring_gather_rows(table_shard: jax.Array, global_idx: jax.Array,
                     axis_name: str) -> jax.Array:
    """Gather rows by GLOBAL index from a table sharded around the ring.

    ``table_shard``: this device's ``(T/S, k)`` rows; ``global_idx``:
    ``(N,)`` int32 (negative → zero row). Rotates the shard S-1 times
    with ppermute; each ray picks its row when the owning shard passes
    by. This is how per-hit attributes (vertices, albedo, emission) are
    fetched without ever materializing the full table on one device.

    DIFFERENTIABLE with a custom VJP: the transpose of a ring gather is
    the ring scatter of the row cotangents back to the sharded table
    (``ring_scatter_rows``) — O(N) residuals, one adjoint rotation.
    """
    return _ring_gather_p(table_shard, global_idx, axis_name,
                          table_shard.shape[0])


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ring_gather_p(table_shard, global_idx, axis_name, size):
    return _ring_gather_impl(table_shard, global_idx, axis_name)


def _ring_gather_fwd(table_shard, global_idx, axis_name, size):
    return _ring_gather_impl(table_shard, global_idx, axis_name), \
        (global_idx,)


def _ring_gather_bwd(axis_name, size, res, cots):
    (global_idx,) = res
    # negative (miss) indices fall outside every shard's [base, base+S)
    # window inside ring_scatter_rows and contribute nowhere — matching
    # the forward's zero row for them
    return ring_scatter_rows([(cots, global_idx)], size, axis_name), None


_ring_gather_p.defvjp(_ring_gather_fwd, _ring_gather_bwd)


def _ring_gather_impl(table_shard, global_idx, axis_name):
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
        nxt = (lax.ppermute(blk, axis_name, perm)
               if step + 1 < n_shards else None)
        local = jnp.clip(global_idx - base, 0, size - 1)
        rows = blk[local]
        mine = (global_idx >= base) & (global_idx < base + size)
        out = jnp.where(mine[:, None], rows, out)
        if nxt is not None:
            blk = nxt
    return out


def ring_light_select(cdf_shard, u_sel, n_tris: int, axis_name: str):
    """Categorical light selection with the cdf column ring-sharded.

    The stored cdf is the exact GLOBAL cumsum (built before sharding),
    so each shard's slice is sorted and the global
    ``searchsorted(side='right')`` count decomposes exactly into the sum
    of per-shard counts: the selection is bit-identical to the
    replicated ``ops/nee.py::sample_light_points``. Padding rows carry
    cdf = 2.0 (> any uniform) and are never counted.
    """
    n_shards = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    cnt = jnp.zeros(u_sel.shape, jnp.int32)
    blk = cdf_shard
    for step in range(n_shards):
        nxt = (lax.ppermute(blk, axis_name, perm)
               if step + 1 < n_shards else None)
        cnt = cnt + jnp.searchsorted(
            blk, u_sel, side="right").astype(jnp.int32)
        if nxt is not None:
            blk = nxt
    return lax.stop_gradient(jnp.clip(cnt, 0, n_tris - 1))


def _pad_axis0(x, m, fill=0.0):
    pad = (-x.shape[0]) % m
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                    constant_values=fill)
    return x


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _render_flat_ring_jit(scene, camera, cfg: RenderConfig, mesh: Mesh):
    # ONE jitted program end-to-end: ray gen, padding, the sharded ring
    # sweep, and the frame reassembly. Anything left outside (round 3
    # left ray gen + table build + clip eager) dominates wall-clock on
    # the remote-TPU path — ~21 s/frame of per-op dispatch vs <1 s of
    # actual ring compute, measured round 4 (tools/ring_profile.py).
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

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        # pallas_call out_shapes carry no varying-mesh-axes annotation,
        # so vma checking must be off for cfg.intersect='pallas*' (the
        # per-shard sweep through the MXU kernel); the specs above are
        # replication-correct by construction.
        check_vma=False,
    )
    def go(o, d, v0, v1, v2, src, alb):
        _, idx = nearest_hit_ring(o, d, v0, v1, v2, src, cfg, axis)
        color = jnp.where(idx[:, None] >= 0, alb[jnp.maximum(idx, 0)], 0.0)
        return color

    img = go(o, d, v0, v1, v2, src, albedo)
    return img[:n].reshape(cfg.height, cfg.width, 3)


def render_flat_ring(scene, camera, cfg: RenderConfig, mesh: Mesh):
    """Flat render with rays AND triangles sharded over one mesh axis —
    the memory-scalable path for scenes that outgrow replicated HBM."""
    return _render_flat_ring_jit(scene, camera, cfg=cfg, mesh=mesh)


def _trace_ring(tri_table, o, d, pixel_ids, cfg, seed, axis_name,
                n_tris: int):
    """Full path trace with triangle data resident only as ring shards.

    ``tri_table``: this device's (T/S, 15|17) rows [v0, v1, v2, albedo,
    emission (, prob, cdf)]. The bounce loop mirrors
    models.pathtracer.trace_radiance — forward throughput, detached
    sampling, masked LCG advance, NEE/MIS, Russian roulette,
    stratification — with the sharded primitives substituted:
    ``nearest_and_select_ring`` for the bounce intersection (one fused
    ring cycle carries the nearest hit, its attribute row, AND the
    categorical light draw + light row — legal because NEE's
    counter-based draws are hit-independent) and ``nearest_hit_ring``
    for the shadow occlusion sweep (index-only) — 2 ring cycles per
    NEE bounce total, down from the 5 of the unfused
    sweep/gather/select/gather/sweep chain. Normals/areas are derived from gathered
    vertices with the same float expressions as the replicated path, so
    ring and replicated renders agree draw-for-draw.
    """
    import numpy as _np

    from spath_tpu.models.pathtracer import _bounce_uniforms
    from spath_tpu.ops.nee import INV_PI, bsdf_pdf, nee_pdf_of_hit
    from spath_tpu.ops.rng import lcg_next
    from spath_tpu.ops.sampling import hemisphere_sample

    n = o.shape[0]
    v0s = tri_table[:, 0:3]
    v1s = tri_table[:, 3:6]
    v2s = tri_table[:, 6:9]
    use_mis = cfg.nee and cfg.mis and cfg.sampler != "angle"

    if cfg.rng == "lcg":
        state0 = pixel_ids.astype(jnp.uint32) + seed.astype(jnp.uint32)
    elif cfg.rng in ("hash", "table"):
        state0 = seed.astype(jnp.uint32)
    else:
        state0 = jax.random.key(seed)

    def one_sample(state, s, o0=None, d0=None, pids=None, nl=None):
        # ``s`` may be a VECTOR of per-lane sample indices (the
        # spp-batched path below); all draws are broadcast-compatible.
        oo = o if o0 is None else o0
        dd = d if d0 is None else d0
        pids = pixel_ids if pids is None else pids
        nl = oo.shape[0] if nl is None else nl
        throughput = jnp.ones((nl, 3), jnp.float32)
        radiance = jnp.zeros((nl, 3), jnp.float32)
        alive = jnp.ones(nl, bool)
        src = jnp.full(nl, -1, jnp.int32)
        prev_pdf = jnp.zeros(nl, jnp.float32)
        if cfg.rng == "threefry":
            rng_state = jax.random.fold_in(state, s)
            sample_idx = s if cfg.stratify else None
        else:
            rng_state = state
            sample_idx = s
        import os as _os
        _unfused = bool(int(_os.environ.get("SPATH_RING_UNFUSED", "0")))
        # Counter-based draws (threefry/hash — which NEE mode requires)
        # are hit-independent, so the light-selection uniform exists
        # BEFORE the sweep and the selection can ride the sweep's own
        # table rotation: 2 ring cycles per NEE bounce instead of 3.
        # SPATH_RING_PAIRWISE=1 re-selects the 3-cycle round-3 path so
        # the cycle-count win stays measurable.
        _pairwise = bool(int(_os.environ.get("SPATH_RING_PAIRWISE",
                                             "0")))
        # Local guard (not just the render_pt_ring entry check): the
        # fused path consumes us[2] before the sweep, which only exists
        # for the counter-based RNGs (lcg draws lazily; table draws 2).
        fuse_select = (cfg.nee and not _unfused and not _pairwise
                       and cfg.rng in ("threefry", "hash"))
        # Merged shadow sweep (round 5): bounce b's shadow-occlusion
        # ray rides bounce b+1's fused sweep+select call — the two
        # sweeps share ONE table rotation (concatenated ray lanes), so
        # an NEE bounce costs ~1 ring cycle instead of 2 (B+1 table
        # rotations per sample instead of 2B — the unmerged bounce
        # rotates 17 + 9 = 26 columns, merged rotates 17). Legal
        # because after bounce b's shading BOTH the shadow ray and the
        # next primary ray are known; bounce b's direct-light term is
        # carried PENDING (its throughput-weighted value is a pure
        # per-lane product, unchanged by deferral) and accumulated as
        # soon as its occlusion index returns — before bounce b+1's
        # own radiance terms, so the per-lane accumulation order is
        # bit-identical to the unmerged path.
        #
        # DEFAULT: on only when the ring is real (n_shards > 1, where
        # rotations ride ICI). On ONE device the merge is a measured
        # LOSS (v5e, 640×360 spp4 NEE+MIS: 5.42→3.82×10⁶ rays/s at 4k,
        # 7.57→7.03×10⁵ at 65k — the shadow lanes pay the heavy
        # primitive's per-lane row-gather + selection instead of the
        # lean 9-column index sweep), so mesh(1) serving keeps the
        # 2-cycle path. SPATH_RING_MERGE=1/0 forces either way.
        _mf = _os.environ.get("SPATH_RING_MERGE", "")
        merge_shadow = fuse_select and (
            _mf == "1" if _mf in ("0", "1")
            else lax.axis_size(axis_name) > 1)
        if cfg.nee:
            assert cfg.rng not in ("lcg", "table"), \
                "NEE ring tracing needs a counter-based RNG"
        # pending = (shadow_o, shadow_d, shadow_src, gate, li, direct)
        # — bounce b-1's unresolved shadow ray and its direct-light
        # contribution, accumulated once the merged sweep returns occ.
        pending = None

        def _resolve_pending(pending, occ, radiance):
            _, _, _, p_gate, p_li, p_direct = pending
            ok = p_gate & (occ == p_li)
            return radiance + jnp.where(ok[:, None], p_direct, 0.0)

        for bounce in range(cfg.max_bounces):
            # Fused sweep + attribute carry: one ring cycle instead of
            # sweep-then-gather (two). Bit-identical (see
            # nearest_hit_ring_rows). SPATH_RING_UNFUSED=1 re-selects
            # the 5-cycle path so the fusion win stays measurable.
            li = lrows = None
            if fuse_select:
                rng_state, us = _bounce_uniforms(
                    cfg, rng_state, jnp.zeros(nl, bool), bounce,
                    pids, nl, sample_idx)
                if pending is not None:
                    p_o, p_d, p_src = pending[0], pending[1], pending[2]
                    o2 = jnp.concatenate([oo, p_o], axis=0)
                    d2 = jnp.concatenate([dd, p_d], axis=0)
                    s2 = jnp.concatenate([src, p_src], axis=0)
                    u2 = jnp.concatenate(
                        [us[2], jnp.zeros(nl, jnp.float32)], axis=0)
                    dist2, idx2, rows2, li2, lrows2 = \
                        nearest_and_select_ring(
                            o2, d2, tri_table, s2, u2, n_tris, cfg,
                            axis_name)
                    dist, idx, rows = dist2[:nl], idx2[:nl], rows2[:nl]
                    li, lrows = li2[:nl], lrows2[:nl]
                    radiance = _resolve_pending(
                        pending, idx2[nl:], radiance)
                    pending = None
                else:
                    dist, idx, rows, li, lrows = nearest_and_select_ring(
                        oo, dd, tri_table, src, us[2], n_tris, cfg,
                        axis_name)
            elif _unfused:
                dist, idx = nearest_hit_ring(
                    oo, dd, v0s, v1s, v2s, src, cfg, axis_name)
                rows = ring_gather_rows(
                    tri_table, jnp.maximum(idx, 0), axis_name)
            else:
                dist, idx, rows = nearest_hit_ring_rows(
                    oo, dd, tri_table, src, cfg, axis_name
                )
            hit = alive & (idx >= 0)
            hit3 = hit[:, None]
            safe = jnp.maximum(idx, 0)
            gv0, gv1, gv2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
            alb, emi = rows[:, 9:12], rows[:, 12:15]
            nrm = jnp.cross(gv1 - gv0, gv2 - gv0)
            nrm = nrm / jnp.maximum(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20
            )
            flip = jnp.sum(nrm * dd, axis=-1) > 0.0
            adj_n = jnp.where(flip[:, None], -nrm, nrm)

            if not fuse_select:
                rng_state, us = _bounce_uniforms(
                    cfg, rng_state, hit, bounce, pids, nl,
                    sample_idx
                )
            u_az = us[0]
            if cfg.stratify and bounce == 0 and sample_idx is not None:
                # asarray: sample_idx may be a per-lane VECTOR on the
                # spp-batched path; same float32 value as the scalar form
                u_az = (jnp.asarray(sample_idx, jnp.float32) + u_az) \
                    * jnp.float32(1.0 / cfg.spp)
            nd, w = hemisphere_sample(cfg.sampler, adj_n, u_az, us[1])
            nd = lax.stop_gradient(nd)
            if cfg.sampler in ("angle", "uniform"):
                w = _np.float32(2.0) * jnp.sum(nd * adj_n, axis=-1)
            point = oo + dist[:, None] * dd

            if cfg.nee:
                # emitter hits: full at bounce 0, MIS-weighted (or
                # dropped) deeper — models/pathtracer.py semantics.
                if bounce == 0:
                    radiance = radiance + jnp.where(
                        hit3, throughput * emi, 0.0)
                elif use_mis:
                    hit_prob = rows[:, 15]
                    hit_area = lax.stop_gradient(
                        0.5 * jnp.linalg.norm(
                            jnp.cross(gv1 - gv0, gv2 - gv0), axis=-1))
                    cos_l_hit = jnp.abs(jnp.sum(nrm * dd, axis=-1))
                    p_nee_here = nee_pdf_of_hit(
                        hit_prob, hit_area, dist, cos_l_hit)
                    w_b = prev_pdf * prev_pdf / jnp.maximum(
                        prev_pdf * prev_pdf + p_nee_here * p_nee_here,
                        1e-30)
                    w_b = lax.stop_gradient(w_b)
                    radiance = radiance + jnp.where(
                        hit3, throughput * emi * w_b[:, None], 0.0)

                # direct light: selection over the ring-sharded cdf,
                # light rows via ring gather, shadow via the ring sweep
                # (ops/nee.py::direct_light formulas verbatim).
                # Fused selection + light-row gather (one ring cycle).
                if _unfused:
                    li = ring_light_select(
                        tri_table[:, 16], us[2], n_tris, axis_name)
                    lrows = ring_gather_rows(tri_table, li, axis_name)
                elif li is None:   # nee without fuse_select (lcg —
                    li, lrows = ring_light_select_rows(  # rejected
                        tri_table, us[2], n_tris, axis_name)  # upstream
                lv0, lv1, lv2 = (lrows[:, 0:3], lrows[:, 3:6],
                                 lrows[:, 6:9])
                lemi, lprob = lrows[:, 12:15], lrows[:, 15]
                su1 = jnp.sqrt(us[3])
                b1 = 1.0 - su1
                b2 = us[4] * su1
                y = lv0 + b1[:, None] * (lv1 - lv0) + \
                    b2[:, None] * (lv2 - lv0)
                ln = jnp.cross(lv1 - lv0, lv2 - lv0)
                lnorm = jnp.linalg.norm(ln, axis=-1, keepdims=True)
                larea = 0.5 * lnorm[:, 0]
                lunit = ln / jnp.maximum(lnorm, 1e-20)
                delta = y - point
                r2 = jnp.sum(delta * delta, axis=-1)
                r = jnp.sqrt(jnp.maximum(r2, 1e-20))
                omega = delta / r[:, None]
                cos_s = jnp.sum(adj_n * omega, axis=-1)
                cos_l = jnp.abs(jnp.sum(lunit * omega, axis=-1))
                # the occlusion sweep contributes only the discrete
                # `occ` index (its distance is discarded), so in the
                # replicated path its gradient contribution is exactly
                # zero (nearest_hit's VJP with a zero distance
                # cotangent). Detach its inputs here so reverse-mode
                # never unrolls residuals through the S rotated shards
                # — same gradients, O(T/S) memory.
                _sg = lax.stop_gradient
                # occlusion-independent gate + contribution (per-lane
                # products — identical whether resolved now or deferred
                # into the next bounce's merged sweep)
                gate = lax.stop_gradient(
                    (lprob > 0) & (cos_s > 0) & (li != safe)) & hit
                g = cos_s * cos_l / jnp.maximum(r2, 1e-12)
                weight = larea / jnp.maximum(lprob, 1e-20)
                direct = alb * INV_PI * lemi * (g * weight)[:, None]
                if use_mis:
                    p_nee = (
                        lprob / jnp.maximum(larea, 1e-20)
                    ) * jnp.minimum(r2, 1e12) / jnp.maximum(cos_l, 1e-6)
                    p_b = bsdf_pdf(cfg.sampler, cos_s)
                    mw = p_nee * p_nee / jnp.maximum(
                        p_nee * p_nee + p_b * p_b, 1e-30)
                    direct = direct * lax.stop_gradient(mw)[:, None]
                contrib = throughput * direct
                if merge_shadow and bounce + 1 < cfg.max_bounces:
                    # defer: the shadow ray rides the next bounce's
                    # merged sweep; contribution lands the moment its
                    # occlusion index returns (before bounce b+1's own
                    # radiance terms — accumulation order preserved)
                    pending = (_sg(point), _sg(omega), safe, gate, li,
                               contrib)
                else:
                    _, occ = nearest_hit_ring(
                        _sg(point), _sg(omega), _sg(v0s), _sg(v1s),
                        _sg(v2s), safe, cfg, axis_name)
                    ok = gate & (occ == li)
                    radiance = radiance + jnp.where(
                        ok[:, None], contrib, 0.0)
            else:
                radiance = radiance + jnp.where(
                    hit3, throughput * emi, 0.0)
            throughput = jnp.where(
                hit3, throughput * alb * w[:, None], throughput
            )
            oo = jnp.where(hit3, point, oo)
            dd = jnp.where(hit3, nd, dd)
            src = jnp.where(hit, idx, src)
            alive = hit
            if cfg.rr_start and bounce >= cfg.rr_start \
                    and bounce < cfg.max_bounces - 1:
                q = lax.stop_gradient(jnp.clip(
                    jnp.max(throughput, axis=-1), 0.05, 1.0))
                survive = us[5 if cfg.nee else 2] < q
                throughput = jnp.where(
                    (hit & survive)[:, None], throughput / q[:, None],
                    throughput,
                )
                alive = hit & survive
            if use_mis:
                cos_next = jnp.sum(nd * adj_n, axis=-1)
                prev_pdf = lax.stop_gradient(
                    bsdf_pdf(cfg.sampler, cos_next))
        if cfg.rng == "lcg":
            state = rng_state
        return radiance, state

    def body(carry, s):
        state, acc = carry
        rad, state = one_sample(state, s)
        return (state, acc + rad), None

    # spp-BATCHED lanes (round 5): with a counter-based stateless RNG
    # ("hash" — draws are pure functions of (pixel, sample, bounce)),
    # the per-sample traces are independent, so all spp samples run as
    # ONE trace over spp·N lanes: ONE table rotation per bounce serves
    # every sample — spp× fewer ring cycles (with the merged shadow
    # sweep, a frame costs B+1 rotations instead of 2·B·spp: 8× less
    # ICI traffic at spp 4). Bit-exact vs the sample loop: identical
    # per-lane draws (vector sample counter) and the same sequential
    # accumulation order (sample blocks summed in order, matching the
    # scan).
    #
    # DEFAULT: on only when the ring is real (n_shards > 1); on ONE
    # device batching is a small measured loss (v5e: −2% at 4k tris,
    # −7% at 65k — per-lane XLA work dominates per-launch overhead,
    # so fewer-but-bigger launches buy nothing and cost layout
    # pressure). SPATH_RING_SPP_BATCH=1/0 forces either way.
    import os as _os
    _bf = _os.environ.get("SPATH_RING_SPP_BATCH", "")
    batch = (
        cfg.rng == "hash" and cfg.spp > 1
        and (_bf == "1" if _bf in ("0", "1")
             else lax.axis_size(axis_name) > 1)
    )
    if batch:
        spp = cfg.spp
        ob = jnp.tile(o, (spp, 1))
        db = jnp.tile(d, (spp, 1))
        pb = jnp.tile(pixel_ids, spp)
        sv = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), n)
        rad, _ = one_sample(state0, sv, ob, db, pb, spp * n)
        r = rad.reshape(spp, n, 3)
        acc = r[0]
        for s in range(1, spp):
            acc = acc + r[s]
        return acc * (np.float32(1.0) / np.float32(cfg.spp))

    init = (state0, jnp.zeros((n, 3), jnp.float32))
    if cfg.spp <= 8:
        carry = init
        for s in range(cfg.spp):
            carry, _ = body(carry, s)
        acc = carry[1]
    else:
        sbody = jax.checkpoint(body) if cfg.remat else body
        (_, acc), _ = lax.scan(sbody, init, jnp.arange(cfg.spp))
    return acc * (np.float32(1.0) / np.float32(cfg.spp))


def _ring_table(scene, cfg: RenderConfig, n_dev: int) -> jax.Array:
    """The ring-resident per-triangle table ``(Tp, 15|17)``:
    [v0, v1, v2, albedo, emission (, prob, cdf)], padded to a shard
    multiple. Differentiable in the scene values (prob/cdf come from
    ``light_cdf`` already detached — the replicated path's policy)."""
    cols = [scene.v0, scene.v1, scene.v2, scene.albedo, scene.emission]
    if cfg.nee:
        from spath_tpu.ops.nee import light_cdf

        cdf, prob = light_cdf(scene)
        cols += [prob[:, None], cdf[:, None]]
    table = jnp.concatenate(cols, axis=1)
    pad = (-table.shape[0]) % n_dev
    if pad:
        fill = jnp.zeros((pad, table.shape[1]), table.dtype)
        if cfg.nee:
            # padded rows: prob 0, cdf 2.0 — never selected, never counted
            fill = fill.at[:, 16].set(2.0)
        table = jnp.concatenate([table, fill], axis=0)
    return table


def ring_radiance_from_rays(scene, o, d, pixel_ids, seed,
                            cfg: RenderConfig, mesh: Mesh, n_tris: int):
    """Ring-sharded mean radiance on EXPLICIT rays → ``(N, 3)`` rows —
    the rays-level core (the analog of ``trace_mean_radiance``), used
    by the frame entries below and by conformance tests that must feed
    bit-identical rays to ring and replicated paths. Differentiable."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = o.shape[0]
    o = _pad_axis0(o, n_dev)
    d = _pad_axis0(d, n_dev)
    pixel_ids = _pad_axis0(pixel_ids[:, None], n_dev)[:, 0]
    table = _ring_table(scene, cfg, n_dev)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,   # pallas sweeps (see _render_flat_ring_jit)
    )
    def go(o, d, pids, table, seed):
        return _trace_ring(table, o, d, pids, cfg, seed, axis, n_tris)

    return go(o, d, pixel_ids, table, jnp.asarray(seed))[:n]


def _ring_radiance(scene, camera, seed, cfg: RenderConfig,
                   mesh: Mesh, n_tris: int):
    # Whole frame in ONE jitted program (see _render_flat_ring_jit:
    # eager prep outside jit cost ~21 s/frame over the axon tunnel and
    # was round 3's entire "ring is gather-bound" artifact).
    from spath_tpu.camera import generate_rays

    o, d = generate_rays(camera, cfg.width, cfg.height)
    pixel_ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    rad = ring_radiance_from_rays(scene, o, d, pixel_ids, seed, cfg,
                                  mesh, n_tris)
    return rad.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg", "mesh", "n_tris"))
def _render_pt_ring_jit(scene, camera, seed, cfg: RenderConfig,
                        mesh: Mesh, n_tris: int):
    return jnp.clip(
        _ring_radiance(scene, camera, seed, cfg, mesh, n_tris), 0.0, 1.0)


@partial(jax.jit, static_argnames=("cfg", "mesh", "n_tris"))
def _render_radiance_ring_jit(scene, camera, seed, cfg: RenderConfig,
                              mesh: Mesh, n_tris: int):
    return _ring_radiance(scene, camera, seed, cfg, mesh, n_tris)


def render_radiance_ring(scene, camera, cfg: RenderConfig, mesh: Mesh,
                         seed=0):
    """Unclamped ring-sharded radiance — the DIFFERENTIABLE long-context
    entry: ``jax.grad`` flows to scene (vertices/albedo/emission) and
    camera while triangle data exists only as ring shards, forward AND
    backward (custom-VJP ring primitives; the adjoint table ring-reduces
    with the same collective traffic as a forward rotation). Same
    detached-sampling gradient semantics as the replicated
    ``render_radiance``; grads match it to cross-device accumulation-
    order ulps (``tests/test_ring_grad.py``)."""
    if cfg.nee and cfg.rng in ("lcg", "table"):
        raise ValueError("cfg.nee requires rng='threefry' or 'hash'")
    return _render_radiance_ring_jit(scene, camera, jnp.asarray(seed),
                                     cfg=cfg, mesh=mesh,
                                     n_tris=scene.n_tris)


def ring_train_step(scene, camera, cfg: RenderConfig, mesh: Mesh,
                    target, seed=0, lr=1e-2):
    """One SGD step on ``mean((render - target)²)`` with the scene's
    differentiable leaves updated — the ring-sharded training loop's
    inner step (scenes that outgrow replicated HBM can now be OPTIMIZED,
    not just rendered). Returns ``(loss, new_scene)``."""

    def loss_fn(s):
        img = render_radiance_ring(s, camera, cfg, mesh, seed)
        return jnp.mean((img - target) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(scene)
    new_scene = jax.tree_util.tree_map(
        lambda p, gp: p - lr * gp, scene, g)
    return loss, new_scene


def render_pt_ring(scene, camera, cfg: RenderConfig, mesh: Mesh, seed=0):
    """Path-traced frame with rays AND triangle data sharded over one
    mesh axis — the full long-context mode (SURVEY §5): per-device
    memory for scene data is T/S rows; triangle shards ride the ring
    for both intersection and attribute fetch. The full quality
    estimator is supported: NEE/MIS light tables (prob + exact global
    cdf columns ride the ring with the triangle shards; shadow rays use
    the ring sweep), Russian roulette, and stratification — matching the
    replicated wavefront draw-for-draw."""
    if cfg.nee and cfg.rng in ("lcg", "table"):
        raise ValueError("cfg.nee requires rng='threefry' or 'hash'")
    return _render_pt_ring_jit(scene, camera, jnp.asarray(seed),
                               cfg=cfg, mesh=mesh, n_tris=scene.n_tris)
