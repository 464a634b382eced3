"""Fused ring primitives == their unfused two-cycle equivalents, bit
for bit — the invariants that let _trace_ring run 2 ring cycles per
NEE bounce (sweep+rows+select fused into one table rotation, plus the
shadow sweep) instead of the 5 of the unfused chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial
from jax.sharding import PartitionSpec as P

from spath_tpu.config import RenderConfig
from spath_tpu.parallel.mesh import make_mesh
from spath_tpu.parallel import ring as R

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 fake devices"
)


def _table(n_tris, n_lights, rng):
    """Random (T, 17) table with a valid global light cdf."""
    t = rng.standard_normal((n_tris, 17)).astype(np.float32)
    prob = np.zeros(n_tris, np.float32)
    prob[rng.choice(n_tris, n_lights, replace=False)] = 1.0 / n_lights
    t[:, 15] = prob
    t[:, 16] = np.cumsum(prob).astype(np.float32)
    return t


def _pad(x, m, nee=False):
    pad = (-x.shape[0]) % m
    if pad:
        fill = np.zeros((pad, x.shape[1]), x.dtype)
        if nee:
            fill[:, 16] = 2.0
        x = np.concatenate([x, fill], 0)
    return x


def test_fused_sweep_rows_equals_sweep_then_gather(rng=None):
    rng = np.random.default_rng(0)
    mesh = make_mesh(4, axis="shard")
    n_tris, n_rays = 37, 64
    cfg = RenderConfig(intersect="pluecker")
    table = _pad(_table(n_tris, 3, rng), 4)
    # rays toward a cloud of triangles near the origin
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 2] = -3.0
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    src = np.full(n_rays, -1, np.int32)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
             out_specs=(P("shard"),) * 6, check_vma=False)
    def go(o, d, src, tbl):
        d1, i1, rows1 = R.nearest_hit_ring_rows(o, d, tbl, src, cfg,
                                                "shard")
        d2, i2 = R.nearest_hit_ring(o, d, tbl[:, 0:3], tbl[:, 3:6],
                                    tbl[:, 6:9], src, cfg, "shard")
        rows2 = R.ring_gather_rows(tbl, jnp.maximum(i2, 0), "shard")
        return d1, i1, rows1, d2, i2, rows2

    d1, i1, rows1, d2, i2, rows2 = map(np.asarray, go(o, d, src, table))
    assert np.array_equal(i1, i2)
    assert np.array_equal(d1, d2)
    assert np.array_equal(rows1, rows2)
    assert (i1 >= 0).any() and (i1 < 0).any()   # both paths exercised


@pytest.mark.parametrize("n_tris,n_lights", [(37, 3), (64, 64), (9, 1)])
def test_fused_light_select_equals_select_then_gather(n_tris, n_lights):
    rng = np.random.default_rng(1)
    mesh = make_mesh(4, axis="shard")
    table = _pad(_table(n_tris, n_lights, rng), 4, nee=True)
    u = rng.random(64).astype(np.float32)
    # include boundary-ish values
    u[:4] = [0.0, 0.25, 0.5, np.nextafter(np.float32(1.0), np.float32(0))]

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("shard"), P("shard")),
             out_specs=(P("shard"),) * 3, check_vma=False)
    def go(u, tbl):
        li1, rows1 = R.ring_light_select_rows(tbl, u, n_tris, "shard")
        li2 = R.ring_light_select(tbl[:, 16], u, n_tris, "shard")
        rows2 = R.ring_gather_rows(tbl, li2, "shard")
        return li1, rows1, (li2 == li1) & jnp.all(rows1 == rows2, axis=1)

    li1, rows1, agree = map(np.asarray, go(u, table))
    assert agree.all()
    assert (li1 >= 0).all() and (li1 < n_tris).all()


def test_fused_light_select_fallback_beyond_last_cdf():
    """cumsum rounding can leave the last real cdf below every u in
    [cdf_last, 1): the crossing then lands on a padding row and the
    clip semantics must select (and gather) global row n_tris - 1."""
    rng = np.random.default_rng(2)
    mesh = make_mesh(4, axis="shard")
    n_tris = 10
    table = _table(n_tris, 2, rng)
    table[:, 16] = np.minimum(table[:, 16], 0.9)    # cdf tops out at 0.9
    table = _pad(table, 4, nee=True)
    u = np.full(8, 0.95, np.float32)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("shard"), P("shard")),
             out_specs=(P("shard"),) * 2, check_vma=False)
    def go(u, tbl):
        return R.ring_light_select_rows(tbl, u, n_tris, "shard")

    li, rows = map(np.asarray, go(u, table))
    assert (li == n_tris - 1).all()
    assert np.array_equal(rows, np.tile(table[n_tris - 1], (8, 1)))


def test_trifused_equals_pair_of_fused():
    """nearest_and_select_ring == nearest_hit_ring_rows +
    ring_light_select_rows, bit for bit — the invariant behind the
    2-cycle NEE bounce (sweep+rows+select in ONE table rotation)."""
    rng = np.random.default_rng(3)
    mesh = make_mesh(4, axis="shard")
    n_tris, n_rays = 37, 64
    cfg = RenderConfig(intersect="pluecker")
    table = _pad(_table(n_tris, 3, rng), 4, nee=True)
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 2] = -3.0
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    src = np.full(n_rays, -1, np.int32)
    u = rng.random(n_rays).astype(np.float32)
    u[:4] = [0.0, 0.25, 0.5, np.nextafter(np.float32(1.0), np.float32(0))]

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("shard"),) * 5,
             out_specs=(P("shard"),) * 10, check_vma=False)
    def go(o, d, src, u, tbl):
        d1, i1, r1, li1, lr1 = R.nearest_and_select_ring(
            o, d, tbl, src, u, n_tris, cfg, "shard")
        d2, i2, r2 = R.nearest_hit_ring_rows(o, d, tbl, src, cfg,
                                             "shard")
        li2, lr2 = R.ring_light_select_rows(tbl, u, n_tris, "shard")
        return d1, i1, r1, li1, lr1, d2, i2, r2, li2, lr2

    d1, i1, r1, li1, lr1, d2, i2, r2, li2, lr2 = map(
        np.asarray, go(o, d, src, u, table))
    assert np.array_equal(d1, d2)
    assert np.array_equal(i1, i2)
    assert np.array_equal(r1, r2)
    assert np.array_equal(li1, li2)
    assert np.array_equal(lr1, lr2)
    assert (i1 >= 0).any() and (i1 < 0).any()
