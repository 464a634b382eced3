"""Quality megakernel backward pass correctness.

Ground truth: ``jax.grad`` of the EAGERLY-run forward body
(``_sample_walk``), whose stop_gradients encode the detached-sampling /
detached-MIS policy. The hand-written sweep replays that exact traced
function, so eager comparison is bit-comparable and any difference is
pure adjoint-math error.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.ops.pallas.megakernel import pack_rays
from spath_tpu.ops.pallas.megakernel_quality import (
    _GOLD, _make_ctx, _sample_walk, quality_table,
)
from spath_tpu.ops.pallas.megakernel_quality_grad import (
    _QCOLS,
    _bwd_tile_quality,
    render_radiance_quality_grad,
    supported_grad,
)
from spath_tpu.ops.pallas.megakernel_grad import GRAD_UNROLL_TRIS
from spath_tpu.scene import Scene, default_scene, procedural_scene


def _cfg(**kw):
    base = dict(width=16, height=12, spp=3, max_bounces=4,
                rng="hash", sampler="cosine", intersect="pluecker")
    base.update(kw)
    return RenderConfig(**base)


GROUPS = [("v0", 0), ("e1", 3), ("e2", 6), ("n", 9), ("alb", 12),
          ("emi", 15), ("area", 18)]


@pytest.mark.parametrize("nee,mis,rr,strat", [
    (False, False, 0, False), (True, False, 0, False),
    (True, True, 0, False),
    # in-kernel Russian roulette (1/q reweight adjoint) + stratification
    (True, True, 1, False), (True, True, 2, True),
])
def test_quality_adjoint_matches_autodiff(scene7, nee, mis, rr, strat):
    cfg = _cfg(nee=nee, mis=mis, rr_start=rr, stratify=strat)
    cam = Camera.default()
    rays, pix, n = pack_rays(cam, cfg, 0)
    rays, pix = rays[:, :256], pix[:, :256]
    keys = jnp.uint32(5) * _GOLD + pix
    tri = quality_table(scene7)
    n_lanes = rays.shape[1]
    rng = np.random.Generator(np.random.Philox(9))
    wts = jnp.asarray(
        rng.uniform(0.1, 1.0, (3, n_lanes)).astype(np.float32))
    inv = np.float32(1.0 / cfg.spp)

    def loss(tri, rays):
        ctx = _make_ctx(rays, keys, tri, cfg, scene7.n_tris)
        acc = jnp.zeros((3, n_lanes), jnp.float32)
        for s in range(cfg.spp):
            rr, rg, rb = _sample_walk(jnp.int32(s), ctx)[:3]
            acc = acc + jnp.concatenate([rr, rg, rb], axis=0)
        return jnp.sum(acc * inv * wts)

    gt_auto, gr_auto = jax.grad(loss, argnums=(0, 1))(tri, rays)

    gbar = jnp.concatenate(
        [wts, jnp.zeros((1, n_lanes), jnp.float32)], axis=0)
    gtab_rows, gray_rows = _bwd_tile_quality(
        rays, keys, tri, gbar, cfg=cfg, n_tris=scene7.n_tris,
        unroll_samples=True,   # bit-exact vs the eager autodiff primal
    )
    t = scene7.n_tris
    mine = np.asarray(jnp.sum(gtab_rows, axis=1))[: t * _QCOLS]
    mine = mine.reshape(t, _QCOLS)
    auto = np.asarray(gt_auto)

    for name, col in GROUPS:
        w = 1 if name == "area" else 3
        acol = 19 if name == "area" else col   # table layout: area at 19
        a = auto[:, acol:acol + w]
        m = mine[:, col:col + w]
        scale = np.abs(auto).max() + 1e-12
        np.testing.assert_allclose(
            m, a, atol=2e-6 * scale,
            err_msg=f"nee={nee} mis={mis} rr={rr} strat={strat}: "
                    f"adjoint mismatch in {name}")
    # prob/cdf columns are detached by construction
    assert np.abs(auto[:, 18]).max() == 0.0     # prob
    assert np.abs(auto[:, 20]).max() == 0.0     # cdf
    # camera-ray adjoint
    a = np.asarray(gr_auto)
    m = np.asarray(gray_rows)
    scale = np.abs(a).max() + 1e-12
    np.testing.assert_allclose(
        m, a, atol=2e-6 * scale,
        err_msg=f"nee={nee} mis={mis}: camera-ray adjoint mismatch")
    if nee:
        # NEE makes the position chain live: geometry and camera
        # adjoints must actually be nonzero.
        assert np.abs(auto[:, 0:9]).max() > 0.0
        assert scale > 0.0


def test_quality_scatter_adjoint_matches_autodiff():
    """T > GRAD_UNROLL_TRIS: per-triangle accumulation via the MXU
    one-hot scatter (surface chain at idx, NEE chain at li) — exact
    3-way bf16 split, so only the accumulator's summation order differs
    from the unrolled masked adds."""
    scene = procedural_scene(GRAD_UNROLL_TRIS + 16, seed=2)
    cfg = _cfg(nee=True, mis=True, spp=2, max_bounces=3)
    cam = Camera.default()
    rays, pix, n = pack_rays(cam, cfg, 0)
    rays, pix = rays[:, :256], pix[:, :256]
    keys = jnp.uint32(5) * _GOLD + pix
    tri = quality_table(scene)
    n_lanes = rays.shape[1]
    rng = np.random.Generator(np.random.Philox(9))
    wts = jnp.asarray(
        rng.uniform(0.1, 1.0, (3, n_lanes)).astype(np.float32))
    inv = np.float32(1.0 / cfg.spp)

    def loss(tri, rays):
        ctx = _make_ctx(rays, keys, tri, cfg, scene.n_tris)
        acc = jnp.zeros((3, n_lanes), jnp.float32)
        for s in range(cfg.spp):
            rr, rg, rb = _sample_walk(jnp.int32(s), ctx)[:3]
            acc = acc + jnp.concatenate([rr, rg, rb], axis=0)
        return jnp.sum(acc * inv * wts)

    gt_auto, gr_auto = jax.grad(loss, argnums=(0, 1))(tri, rays)
    gbar = jnp.concatenate(
        [wts, jnp.zeros((1, n_lanes), jnp.float32)], axis=0)
    gtab_rows, gray_rows = _bwd_tile_quality(
        rays, keys, tri, gbar, cfg=cfg, n_tris=scene.n_tris,
        unroll_samples=True,
    )
    mine = np.asarray(gtab_rows)[:_QCOLS, : scene.n_tris].T
    auto = np.asarray(gt_auto)
    for name, col in GROUPS:
        w = 1 if name == "area" else 3
        acol = 19 if name == "area" else col
        a = auto[:, acol:acol + w]
        m = mine[:, col:col + w]
        scale = np.abs(auto).max() + 1e-12
        np.testing.assert_allclose(
            m, a, atol=1e-5 * scale,
            err_msg=f"scatter adjoint mismatch in {name}")
    a = np.asarray(gr_auto)
    m = np.asarray(gray_rows)
    scale = np.abs(a).max() + 1e-12
    np.testing.assert_allclose(
        m, a, atol=2e-6 * scale,
        err_msg="scatter camera-ray adjoint mismatch")


def test_quality_scatter_grad_tracks_wavefront():
    """Full custom-VJP entry at T > GRAD_UNROLL_TRIS vs the wavefront
    autodiff (cross-program statistical tolerance)."""
    scene = procedural_scene(GRAD_UNROLL_TRIS + 16, seed=2)
    cfg = _cfg(nee=True, mis=True, width=24, height=16, spp=2,
               max_bounces=3)
    cam = Camera.default()

    def make_loss(fn):
        def loss(v, a, e):
            return jnp.mean(fn(Scene(v, a, e), cam, cfg, 0))
        return loss

    want = jax.jit(jax.grad(make_loss(render_radiance), argnums=(0, 1, 2)))(
        scene.vertices, scene.albedo, scene.emission)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.grad(make_loss(render_radiance_quality_grad),
                               argnums=(0, 1, 2)))(
            scene.vertices, scene.albedo, scene.emission)
    for name, g_got, g_want in zip(["vertices", "albedo", "emission"],
                                   got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        np.testing.assert_allclose(
            g_got, g_want, atol=0.05 * scale,
            err_msg=f"beyond path-flip noise: {name}")


def test_quality_grad_entry_point_runs(scene7):
    # Interpret-mode XLA-CPU compile of the fused backward is minutes at
    # any size — keep the shapes minimal; correctness is carried by the
    # eager exactness test above.
    cfg = _cfg(nee=True, mis=True, width=16, height=8, spp=1,
               max_bounces=3)
    cam = Camera.default()

    def loss(v, a, e):
        img = render_radiance_quality_grad(Scene(v, a, e), cam, cfg, 0)
        return jnp.mean(img)

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            scene7.vertices, scene7.albedo, scene7.emission)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(grads[0])).max() > 0.0   # vertex grads live


def test_quality_grad_tracks_wavefront(scene7):
    # Cross-program comparison (path-flip tolerance): the wavefront's
    # autodiff in hash mode implements the same estimator + policy.
    cfg = _cfg(nee=True, mis=True, width=24, height=16, spp=2,
               max_bounces=3)
    cam = Camera.default()

    def make_loss(fn):
        def loss(v, a, e):
            return jnp.mean(fn(Scene(v, a, e), cam, cfg, 0))
        return loss

    want = jax.jit(jax.grad(make_loss(render_radiance), argnums=(0, 1, 2)))(
        scene7.vertices, scene7.albedo, scene7.emission)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.grad(make_loss(render_radiance_quality_grad),
                               argnums=(0, 1, 2)))(
            scene7.vertices, scene7.albedo, scene7.emission)
    for name, g_got, g_want in zip(["vertices", "albedo", "emission"],
                                   got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        np.testing.assert_allclose(
            g_got, g_want, atol=0.05 * scale,
            err_msg=f"beyond path-flip noise: {name}")


def test_quality_grad_guardrail(scene7):
    assert supported_grad(scene7, _cfg())
    with pytest.raises(ValueError):
        render_radiance_quality_grad(
            scene7, Camera.default(), _cfg(rng="threefry"), 0)
