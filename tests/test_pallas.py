"""Pallas intersection kernel: interpret-mode conformance on CPU.

The compiled kernel runs on real TPU (exercised by bench.py and the
TPU-side integration run); here the interpreter validates semantics
against the XLA reference path — including padding, source exclusion,
tie-breaks, and the custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.ops.intersect import nearest_hit
from spath_tpu.ops.pallas.intersect_pallas import nearest_hit_pallas


def _random(n_rays, n_tris, seed=0):
    rng = np.random.Generator(np.random.Philox(seed))
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    verts = rng.uniform(-2, 2, (n_tris, 3, 3)).astype(np.float32)
    src = rng.integers(-1, n_tris, size=n_rays).astype(np.int32)
    return (
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(verts[:, 0]), jnp.asarray(verts[:, 1]),
        jnp.asarray(verts[:, 2]), jnp.asarray(src),
    )


@pytest.mark.parametrize("n_rays,n_tris", [
    (64, 16),          # single tile, heavy padding both dims
    (300, 40),         # ragged rays
    (512, 1500),       # multiple triangle blocks
])
def test_pallas_matches_reference(n_rays, n_tris):
    args = _random(n_rays, n_tris, seed=n_rays + n_tris)
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = nearest_hit_pallas(*args)
    want_d, want_i = nearest_hit(*args, method="pluecker")
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    hit = np.asarray(want_i) >= 0
    # Indices are exact; distances carry reordered-fp32-summation error:
    # the kernel's K-packed single-pass dot computes the same 6 split
    # products as XLA's HIGHEST but accumulates them in K order, so a
    # near-grazing hit (cancellation in the determinant) can differ by
    # a few ulp relative to the CPU fp32 dot (measured max rel ~1.1e-5
    # away from zero; the atol floor covers hits at distance ≈ 0 where
    # a ~4e-8 absolute ulp difference is a large ratio).
    np.testing.assert_allclose(
        np.asarray(got_d)[hit], np.asarray(want_d)[hit],
        rtol=1e-4, atol=1e-6,
    )


def test_pallas_source_exclusion():
    # A single triangle; rays starting on it, directed away — with src
    # exclusion they must miss.
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (8, 1))
    v0 = jnp.asarray([[-1.0, -1.0, 1.0]], jnp.float32)
    v1 = jnp.asarray([[1.0, -1.0, 1.0]], jnp.float32)
    v2 = jnp.asarray([[0.0, 2.0, 1.0]], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        _, i_hit = nearest_hit_pallas(
            o, d, v0, v1, v2, jnp.full(8, -1, jnp.int32))
        _, i_excl = nearest_hit_pallas(
            o, d, v0, v1, v2, jnp.zeros(8, jnp.int32))
    assert (np.asarray(i_hit) == 0).all()
    assert (np.asarray(i_excl) == -1).all()


def test_pallas_custom_vjp_matches_xla_grad():
    args = _random(128, 24, seed=5)
    o, d, v0, v1, v2, src = args

    def loss_pallas(v0, v1, v2):
        with pltpu.force_tpu_interpret_mode():
            dist, idx = nearest_hit_pallas(o, d, v0, v1, v2, src)
        return jnp.sum(jnp.where(idx >= 0, dist, 0.0))

    def loss_xla(v0, v1, v2):
        dist, idx = nearest_hit(o, d, v0, v1, v2, src, method="reference")
        return jnp.sum(jnp.where(idx >= 0, dist, 0.0))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(v0, v1, v2)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(v0, v1, v2)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_pallas_in_render(scene7):
    """End-to-end: cfg.intersect='pallas' renders the same flat image as
    the reference path (interpret mode)."""
    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.models.flat import render_flat

    cfg = RenderConfig(width=48, height=32, spp=1)
    want = np.asarray(render_flat(scene7, Camera.default(), cfg))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            render_flat(scene7, Camera.default(),
                        cfg.replace(intersect="pallas"))
        )
    mismatch = (got != want).any(-1).mean()
    assert mismatch < 0.01, f"{mismatch:.3%} pixels differ"


def test_megakernel_matches_wavefront(scene7):
    """Whole-frame fused kernel (interpret mode) vs the XLA wavefront:
    same LCG streams, same estimator."""
    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.models.pathtracer import render_radiance
    from spath_tpu.ops.pallas.megakernel import render_radiance_megakernel

    cfg = RenderConfig(width=48, height=32, spp=3, rng="lcg",
                       sampler="angle")
    cam = Camera.default()
    want = np.asarray(render_radiance(scene7, cam, cfg, seed=0))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(render_radiance_megakernel(scene7, cam, cfg, 0))
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.01, f"{flipped.mean():.4f} flipped"
    # A few trig-ulp path flips at tiny spp shift the raw mean a couple
    # of percent; the per-pixel bound above is the real check.
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=5e-2)


def test_megakernel_guardrails(scene7):
    from spath_tpu.config import RenderConfig
    from spath_tpu.ops.pallas.megakernel import MAX_TRIS, supported
    from spath_tpu.ops.pallas.megakernel_grad import supported_grad
    from spath_tpu.scene import procedural_scene

    assert supported(scene7, RenderConfig(rng="lcg", sampler="angle"))
    assert not supported(scene7, RenderConfig(rng="threefry"))
    # fori-loop triangle walk extends the forward kernel to MAX_TRIS...
    assert supported(procedural_scene(100), RenderConfig())
    assert not supported(procedural_scene(MAX_TRIS + 8), RenderConfig())
    # ...but the backward kernel's VMEM accumulator caps lower.
    assert supported_grad(scene7, RenderConfig())
    assert not supported_grad(procedural_scene(100), RenderConfig())


def test_megakernel_fori_walk_matches_wavefront(scene7):
    """T > UNROLL_TRIS takes the fori_loop/dynamic-SMEM walk; conformance
    vs the XLA wavefront on a procedural scene."""
    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.models.pathtracer import render_radiance
    from spath_tpu.ops.pallas.megakernel import (
        UNROLL_TRIS, render_radiance_megakernel, supported,
    )
    from spath_tpu.scene import procedural_scene

    scene = procedural_scene(UNROLL_TRIS + 9, seed=2)
    cfg = RenderConfig(width=32, height=24, spp=2, rng="lcg",
                       sampler="angle")
    assert supported(scene, cfg)
    cam = Camera.default()
    want = np.asarray(render_radiance(scene, cam, cfg, seed=0))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(render_radiance_megakernel(scene, cam, cfg, 0))
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.01, f"{flipped.mean():.4f} flipped"
