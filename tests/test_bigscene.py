"""Large-scene streamed megakernel (ops/pallas/megakernel_bigscene*):
interpret-mode conformance at T > 1024 and adjoint correctness.

The kernel's intersection uses the SAME Plücker matmul formulation and
K-packed single-pass fp32-emulating dots as the XLA wavefront at
``intersect='pallas'`` (intersect_pallas.pack_lhs/pack_rhs), so
distances/indices agree to reordered-fp32-summation ulps; shading/trig
are separately compiled programs, so image comparisons carry the usual
small path-flip budget (see tests/test_pallas.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.ops.pallas.megakernel_bigscene import (
    BIG_GRAD_MAX_TRIS,
    render_radiance_bigscene,
)
from spath_tpu.ops.pallas.megakernel_bigscene_grad import (
    render_radiance_bigscene_grad,
)
from spath_tpu.scene import Scene, default_scene, make_scene, \
    procedural_scene

CFG = RenderConfig(width=32, height=16, spp=2, max_bounces=3,
                   rng="lcg", sampler="angle", intersect="pallas")


def _combined_scene(n_extra: int, emissive_fraction: float = 0.05):
    """Default 7-tri scene (big light + floor + wall => real multi-bounce
    transport) + procedural clutter => n_extra + 7 triangles."""
    base = default_scene()
    proc = procedural_scene(n_extra, seed=0,
                            emissive_fraction=emissive_fraction)
    return make_scene(
        np.concatenate([np.asarray(base.vertices),
                        np.asarray(proc.vertices)]),
        np.concatenate([np.asarray(base.albedo), np.asarray(proc.albedo)]),
        np.concatenate([np.asarray(base.emission),
                        np.asarray(proc.emission)]),
    )


def test_bigscene_matches_wavefront_above_1024():
    """Conformance at T > 1024 — beyond the SMEM megakernel's cap."""
    scene = _combined_scene(1143)          # 1150 tris, 5 streamed blocks
    assert scene.n_tris > 1024
    cam = Camera.default()
    cfg = CFG.replace(spp=1, max_bounces=2)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.jit(
            render_radiance_bigscene, static_argnames=("cfg", "fast"))(
                scene, cam, cfg, 0))
        want = np.asarray(jax.jit(
            render_radiance, static_argnames=("cfg",))(scene, cam, cfg, 0))
    assert want.mean() > 1e-3, "vacuous scene: no radiance"
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.02, f"{flipped.mean():.4f} flipped"
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=2e-2)


def test_bigscene_fast_mode_close():
    """hi/lo-bf16 3-pass mode: near-tie index flips only."""
    scene = _combined_scene(505)
    cam = Camera.default()
    cfg = CFG.replace(spp=1, max_bounces=2)
    with pltpu.force_tpu_interpret_mode():
        exact = np.asarray(jax.jit(
            render_radiance_bigscene, static_argnames=("cfg", "fast"))(
                scene, cam, cfg, 0))
        fast = np.asarray(jax.jit(
            render_radiance_bigscene, static_argnames=("cfg", "fast"))(
                scene, cam, cfg, 0, fast=True))
    flipped = (np.abs(fast - exact) > 1e-3).any(-1)
    assert flipped.mean() < 0.02, f"{flipped.mean():.4f} flipped"


def _grads(render_fn, scene, cam, cfg, wts):
    def loss(vertices, albedo, emission):
        s = Scene(vertices, albedo, emission)
        return jnp.sum(render_fn(s, cam, cfg, 0) * wts)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        scene.vertices, scene.albedo, scene.emission)


def test_bigscene_grad_tracks_wavefront():
    scene = _combined_scene(293)
    cam = Camera.default()
    rng = np.random.Generator(np.random.Philox(7))
    wts = jnp.asarray(rng.uniform(
        0.1, 1.0, (CFG.height, CFG.width, 3)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = _grads(render_radiance_bigscene_grad, scene, cam, CFG, wts)
        want = _grads(render_radiance, scene, cam, CFG, wts)
    for name, g_got, g_want in zip(["vertices", "albedo", "emission"],
                                   got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max()
        assert scale > 1e-6, f"vacuous gradient test: {name}"
        np.testing.assert_allclose(
            g_got, g_want, atol=1e-4 * scale,
            err_msg=f"bigscene adjoint mismatch: {name}")


def test_bigscene_emission_grad_exact():
    """Radiance is exactly linear in emission — FD of the same program
    equals <grad, dir> to float32 rounding."""
    scene = _combined_scene(250)
    cam = Camera.default()
    cfg = CFG.replace(spp=1, max_bounces=2)

    def loss(emission):
        s = Scene(scene.vertices, scene.albedo, emission)
        return jnp.mean(render_radiance_bigscene_grad(s, cam, cfg, 0))

    rng = np.random.Generator(np.random.Philox(11))
    direction = jnp.asarray(
        rng.normal(size=scene.emission.shape).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        g = jax.jit(jax.grad(loss))(scene.emission)
        jloss = jax.jit(loss)
        f0 = float(jloss(scene.emission))
        f1 = float(jloss(scene.emission + direction))
    want = f1 - f0
    got = float(jnp.sum(g * direction))
    assert abs(got - want) <= 1e-4 * max(abs(want), 1e-6), (got, want)


def test_bigscene_guardrails():
    scene = _combined_scene(64)
    cam = Camera.default()
    with pytest.raises(ValueError):
        render_radiance_bigscene(scene, cam, CFG.replace(rng="hash"), 0)
    big = procedural_scene(BIG_GRAD_MAX_TRIS + 512, seed=0)
    with pytest.raises(ValueError):
        render_radiance_bigscene_grad(big, cam, CFG, 0)
