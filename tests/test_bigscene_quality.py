"""HBM-streamed QUALITY megakernel (ops/pallas/megakernel_bigscene_quality):
the production estimator (hash + cosine + NEE/MIS) at T beyond the SMEM
table, forward and backward.

Ground truth is the XLA wavefront in the identical config: the
estimator body is literally the same traced function
(``megakernel_quality._sample_walk``) over the same K-packed Plücker
intersection the wavefront uses at ``intersect='pallas'``, so both
values and gradients agree to float noise (no cross-formulation path
flips in these configs; a small flip budget is still allowed).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
    render_radiance_bigscene_quality,
    static_light_idx,
    supported,
    supported_grad,
)
from spath_tpu.scene import Scene, default_scene, make_scene, \
    procedural_scene

CFG = RenderConfig(width=32, height=16, spp=2, max_bounces=3,
                   rng="hash", sampler="cosine", nee=True, mis=True,
                   intersect="pallas")


def _combined_scene(n_extra: int):
    base = default_scene()
    proc = procedural_scene(n_extra, seed=0, emissive_fraction=0.05)
    return make_scene(
        np.concatenate([np.asarray(base.vertices),
                        np.asarray(proc.vertices)]),
        np.concatenate([np.asarray(base.albedo), np.asarray(proc.albedo)]),
        np.concatenate([np.asarray(base.emission),
                        np.asarray(proc.emission)]),
    )


def test_bigq_matches_wavefront_above_smem_cap():
    """NEE+MIS conformance at T > 1024 (beyond every SMEM kernel)."""
    scene = _combined_scene(1143)          # 1150 tris, 5 streamed blocks
    assert scene.n_tris > 1024
    cam = Camera.default()
    cfg = CFG.replace(spp=1, max_bounces=2)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.jit(
            render_radiance_bigscene_quality,
            static_argnames=("cfg", "fast"))(scene, cam, cfg, 0))
        want = np.asarray(jax.jit(
            render_radiance, static_argnames=("cfg",))(scene, cam, cfg, 0))
    assert want.mean() > 1e-3, "vacuous scene: no radiance"
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.02, f"{flipped.mean():.4f} flipped"
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=2e-2)


@pytest.mark.parametrize("nee,mis,rr,strat", [
    (False, False, 0, False),
    (True, False, 0, False),
    (True, True, 1, True),
])
def test_bigq_config_matrix(nee, mis, rr, strat):
    scene = _combined_scene(249)           # 256 tris, 1 block
    cam = Camera.default()
    cfg = CFG.replace(spp=2, max_bounces=3, nee=nee, mis=mis,
                      rr_start=rr, stratify=strat)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.jit(
            render_radiance_bigscene_quality,
            static_argnames=("cfg", "fast"))(scene, cam, cfg, 0))
        want = np.asarray(jax.jit(
            render_radiance, static_argnames=("cfg",))(scene, cam, cfg, 0))
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.02, f"{flipped.mean():.4f} flipped"


def test_bigq_grad_tracks_wavefront():
    """Fused streamed VJP vs wavefront autodiff: vertices (live NEE
    position chain), albedo, emission."""
    scene = _combined_scene(249)
    li = scene.light_idx
    cam = Camera.default()
    cfg = CFG.replace(width=24, height=16)

    def make_loss(fn):
        def loss(v, a, e):
            s = Scene(v, a, e, light_idx=li)
            return jnp.mean(fn(s, cam, cfg, 0))
        return loss

    with pltpu.force_tpu_interpret_mode():
        want = jax.jit(jax.grad(make_loss(render_radiance),
                                argnums=(0, 1, 2)))(
            scene.vertices, scene.albedo, scene.emission)
        got = jax.jit(jax.grad(
            make_loss(render_radiance_bigscene_quality),
            argnums=(0, 1, 2)))(
            scene.vertices, scene.albedo, scene.emission)
    for name, g_got, g_want in zip(["vertices", "albedo", "emission"],
                                   got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        assert scale > 0.0
        np.testing.assert_allclose(
            g_got, g_want, atol=0.03 * scale,
            err_msg=f"beyond path-flip noise: {name}")


def test_bigq_grad_above_32k():
    """The streamed HBM adjoint (round 4) lifts the fused quality VJP
    past the old 32k VMEM-resident cap: values and gradients at
    T > 32768 still track the wavefront. (Tiny frame/spp: interpret
    mode pays real host FLOPs per streamed block.)"""
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        BIGQ_GRAD_MAX_TRIS,
    )

    scene = procedural_scene(33_000, seed=0, emissive_fraction=0.01)
    assert scene.n_tris > 32768
    assert BIGQ_GRAD_MAX_TRIS >= 131072
    assert supported_grad(scene, CFG)
    li = scene.light_idx
    cam = Camera.default()
    cfg = CFG.replace(width=16, height=8, spp=1, max_bounces=2)

    def make_loss(fn):
        def loss(a, e):
            s = Scene(scene.vertices, a, e, light_idx=li)
            return jnp.mean(fn(s, cam, cfg, 0))
        return loss

    with pltpu.force_tpu_interpret_mode():
        want = jax.jit(jax.grad(make_loss(render_radiance),
                                argnums=(0, 1)))(
            scene.albedo, scene.emission)
        got = jax.jit(jax.grad(
            make_loss(render_radiance_bigscene_quality),
            argnums=(0, 1)))(scene.albedo, scene.emission)
    for name, g_got, g_want in zip(["albedo", "emission"], got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        assert np.abs(g_want).max() > 0.0
        np.testing.assert_allclose(
            g_got, g_want, atol=0.03 * scale,
            err_msg=f"beyond path-flip noise: {name}")


def test_bigq_grad_131k():
    """Grad conformance at T = 131,072 — the round-4 verdict's item-3
    bar (previous max: 33k). A 4× extrapolation in streamed blocks is
    where fp32-accumulation and block-addressing surprises would live;
    tiny frame/spp bounds the interpret-mode cost (every streamed block
    costs real host FLOPs)."""
    # 5% emissive: at this triangle density (131k in the same box the
    # 10k scene uses) shadow rays are almost always occluded, so
    # albedo-dependent light paths need a fair chance of a
    # second-bounce emitter hit or the reference gradient is exactly
    # zero at a 128-ray frame (observed at 1% emissive)
    scene = procedural_scene(131_072, seed=0, emissive_fraction=0.05)
    assert scene.n_tris >= 131072
    assert supported_grad(scene, CFG)
    li = scene.light_idx
    cam = Camera.default()
    cfg = CFG.replace(width=16, height=8, spp=1, max_bounces=2)

    def make_loss(fn):
        def loss(a, e):
            s = Scene(scene.vertices, a, e, light_idx=li)
            return jnp.mean(fn(s, cam, cfg, 0))
        return loss

    with pltpu.force_tpu_interpret_mode():
        want = jax.jit(jax.grad(make_loss(render_radiance),
                                argnums=(0, 1)))(
            scene.albedo, scene.emission)
        got = jax.jit(jax.grad(
            make_loss(render_radiance_bigscene_quality),
            argnums=(0, 1)))(scene.albedo, scene.emission)
    for name, g_got, g_want in zip(["albedo", "emission"], got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        assert np.abs(g_want).max() > 0.0
        np.testing.assert_allclose(
            g_got, g_want, atol=0.03 * scale,
            err_msg=f"beyond path-flip noise: {name}")


def test_bigq_camera_grad_lives():
    """The NEE position chain reaches the camera through packed rays."""
    scene = _combined_scene(249)
    li = scene.light_idx
    cfg = CFG.replace(width=16, height=8, spp=1)

    def loss(pos):
        cam = dataclasses.replace(Camera.default(), pos=pos)
        s = Scene(scene.vertices, scene.albedo, scene.emission,
                  light_idx=li)
        return jnp.mean(render_radiance_bigscene_quality(s, cam, cfg, 0))

    with pltpu.force_tpu_interpret_mode():
        g = jax.jit(jax.grad(loss))(Camera.default().pos)
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0.0


def test_bigq_static_light_set():
    scene = _combined_scene(57)
    assert static_light_idx(scene) == scene.light_idx
    assert supported(scene, CFG) and supported_grad(scene, CFG)
    # tracer emission without light_idx -> unsupported, no crash
    traced = Scene(scene.vertices, scene.albedo, scene.emission,
                   light_idx=None)

    def check(s):
        return supported(dataclasses.replace(
            s, light_idx=None), CFG)

    got = jax.jit(lambda v, a, e: jnp.float32(
        supported(Scene(v, a, e), CFG)))(
        scene.vertices, scene.albedo, scene.emission)
    assert float(got) == 0.0
    # guardrail message
    with pytest.raises(ValueError):
        render_radiance_bigscene_quality(
            traced, Camera.default(), CFG.replace(rng="lcg"), 0)


def test_bigq_light_cap(monkeypatch):
    """Over-cap light sets fall OFF the fused path loudly and route to
    the wavefront. Round 5 raised LIGHT_MAX to 65536 (VMEM table +
    chunked selection), so the 1M/1%-emissive scene's ~10k lights fit
    with 6× headroom; the over-cap routing is exercised by shrinking
    the cap (building a >65k-light scene in a CPU test is pointless
    burn)."""
    import spath_tpu.ops.pallas.megakernel_bigscene_quality as bq
    from spath_tpu.models.renderer import grad_renderer
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        LIGHT_MAX,
        render_radiance_bigscene_quality,
    )

    # 1M tris at the bench's own 1% emissive fraction ≈ 10k lights —
    # the fused path must cover the scenes its 1M triangle cap
    # advertises (round-4 verdict item 2)
    assert LIGHT_MAX >= 20000
    over = procedural_scene(8192, seed=0, emissive_fraction=0.05)
    assert len(over.light_idx) > 256
    monkeypatch.setattr(bq, "LIGHT_MAX", 256)
    assert not supported(over, CFG) and not supported_grad(over, CFG)
    assert grad_renderer(over, CFG).name == "wavefront"
    with pytest.raises(ValueError):
        render_radiance_bigscene_quality(over, Camera.default(), CFG, 0)
    monkeypatch.setattr(bq, "LIGHT_MAX", LIGHT_MAX)
    under = procedural_scene(8192, seed=0, emissive_fraction=0.01)
    assert supported(under, CFG) and supported_grad(under, CFG)


def test_bigq_all_dark_scene():
    """No emissive triangles: valid NEE config, black image, no NaNs."""
    proc = procedural_scene(128, seed=1, emissive_fraction=0.0)
    assert len(proc.light_idx) == 0
    cfg = CFG.replace(width=16, height=8, spp=1, max_bounces=2)
    with pltpu.force_tpu_interpret_mode():
        img = np.asarray(jax.jit(
            render_radiance_bigscene_quality,
            static_argnames=("cfg", "fast"))(
                proc, Camera.default(), cfg, 0))
    assert np.all(np.isfinite(img)) and img.max() == 0.0
