"""Intersection: Möller–Trumbore semantics, hand cases, oracle and
Plücker/matmul cross-checks. Reference: ``src/geom.h:197-222`` +
nearest-hit scan ``src/cpu_renderer.cpp:39-49``.
"""

import numpy as np
import jax.numpy as jnp

from spath_tpu.config import RenderConfig
from spath_tpu.ops.intersect import nearest_hit
from spath_tpu.utils import oracle


def _hit(o, d, v0, v1, v2, src=-1, **kw):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    verts = [jnp.asarray([v], jnp.float32) for v in (v0, v1, v2)]
    dist, idx = nearest_hit(
        o, d, *verts, jnp.asarray([src], jnp.int32), **kw
    )
    return float(dist[0]), int(idx[0])


def test_simple_hit():
    # Unit triangle in z=1 plane, ray down +z from origin.
    d, i = _hit([0.1, 0.1, 0.0], [0.0, 0.0, 1.0],
                [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0])
    assert i == 0
    np.testing.assert_allclose(d, 1.0, rtol=1e-6)


def test_miss_outside():
    _, i = _hit([2.0, 2.0, 0.0], [0.0, 0.0, 1.0],
                [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0])
    assert i == -1


def test_behind_ray_misses():
    _, i = _hit([0.1, 0.1, 2.0], [0.0, 0.0, 1.0],
                [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0])
    assert i == -1


def test_parallel_ray_misses():
    _, i = _hit([0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0])
    assert i == -1


def test_source_exclusion():
    """Self-hit avoidance by triangle index (``src/cpu_renderer.cpp:40``)."""
    _, i = _hit([0.1, 0.1, 0.0], [0.0, 0.0, 1.0],
                [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0], src=0)
    assert i == -1


def test_nearest_of_two_and_tie_break():
    o = jnp.asarray([[0.1, 0.1, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    tri = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    # tri 0 at z=2, tri 1 at z=1 (nearer), tri 2 duplicate of tri 1 (tie).
    v = np.stack([tri + [0, 0, 2.0], tri + [0, 0, 1.0], tri + [0, 0, 1.0]])
    dist, idx = nearest_hit(
        o, d,
        jnp.asarray(v[:, 0], jnp.float32),
        jnp.asarray(v[:, 1], jnp.float32),
        jnp.asarray(v[:, 2], jnp.float32),
        jnp.asarray([-1], jnp.int32),
    )
    assert int(idx[0]) == 1  # nearest wins; earliest index wins the tie
    np.testing.assert_allclose(float(dist[0]), 1.0, rtol=1e-6)


def _random_rays_and_scene(n_rays=256, n_tris=33, seed=0):
    rng = np.random.Generator(np.random.Philox(seed))
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    verts = rng.uniform(-2, 2, (n_tris, 3, 3)).astype(np.float32)
    src = rng.integers(-1, n_tris, size=n_rays).astype(np.int32)
    return o, d, verts, src


def test_matches_oracle_random():
    o, d, verts, src = _random_rays_and_scene()
    want_d, want_i = oracle.nearest_hit(o, d, verts, src)
    got_d, got_i = nearest_hit(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(verts[:, 0]), jnp.asarray(verts[:, 1]),
        jnp.asarray(verts[:, 2]), jnp.asarray(src),
    )
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    hit = want_i >= 0
    np.testing.assert_allclose(
        np.asarray(got_d)[hit], want_d[hit], rtol=1e-5
    )


def test_pluecker_matches_reference():
    o, d, verts, src = _random_rays_and_scene(n_rays=512, n_tris=47, seed=3)
    args = (
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(verts[:, 0]), jnp.asarray(verts[:, 1]),
        jnp.asarray(verts[:, 2]), jnp.asarray(src),
    )
    ref_d, ref_i = nearest_hit(*args, method="reference")
    plk_d, plk_i = nearest_hit(*args, method="pluecker")
    same = np.asarray(ref_i) == np.asarray(plk_i)
    # Plücker computes the same quantities in a different floating-point
    # order; borderline hits may flip. Require near-total agreement.
    assert same.mean() > 0.99, f"only {same.mean():.3f} indices agree"
    hit = (np.asarray(ref_i) >= 0) & same
    np.testing.assert_allclose(
        np.asarray(plk_d)[hit], np.asarray(ref_d)[hit], rtol=1e-3
    )


def test_blocked_scan_matches_single_block():
    """tri_block smaller than T exercises the lax.scan carry path."""
    o, d, verts, src = _random_rays_and_scene(n_rays=128, n_tris=70, seed=9)
    args = (
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(verts[:, 0]), jnp.asarray(verts[:, 1]),
        jnp.asarray(verts[:, 2]), jnp.asarray(src),
    )
    big_d, big_i = nearest_hit(*args, method="reference", tri_block=128)
    blk_d, blk_i = nearest_hit(*args, method="reference", tri_block=16)
    np.testing.assert_array_equal(np.asarray(big_i), np.asarray(blk_i))
    # XLA may contract fma differently inside vs outside the scan body;
    # allow a few ulps.
    np.testing.assert_allclose(np.asarray(big_d), np.asarray(blk_d), rtol=1e-5)

    plk_d, plk_i = nearest_hit(*args, method="pluecker", tri_block=16)
    plk1_d, plk1_i = nearest_hit(*args, method="pluecker", tri_block=128)
    np.testing.assert_array_equal(np.asarray(plk_i), np.asarray(plk1_i))
