"""Backward megakernel (hand-written Pallas VJP) correctness.

Three layers of evidence:

1. **Exact**: the pure per-tile adjoint ``_bwd_tile`` vs ``jax.grad`` of
   the forward kernel body run EAGERLY — eager execution makes the
   backward's forward-replay bit-identical to the primal, so any
   difference is pure adjoint-math error. Tolerance is float32
   sum-order noise (~1e-7 relative).
2. **Exact**: emission gradients (linear path) via the full custom-VJP
   entry point in interpret mode.
3. **Statistical**: full-frame grads vs ``jax.grad`` of the XLA
   wavefront renderer. These are DIFFERENTLY COMPILED programs: XLA
   rounds fused trig differently per program, which flips a small
   fraction of chaotic Monte-Carlo paths, so per-element tolerance is a
   few percent of scale (the same reason the forward conformance tests
   use per-pixel flip budgets, tests/test_pallas.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.ops.pallas.megakernel import _megakernel, _scene_table, \
    pack_rays
from spath_tpu.ops.pallas.megakernel_grad import (
    _GCOLS,
    GRAD_UNROLL_TRIS,
    _bwd_tile,
    render_radiance_mega,
)
from spath_tpu.scene import Scene, default_scene, procedural_scene

CFG = RenderConfig(width=64, height=48, spp=4, max_bounces=5,
                   rng="lcg", sampler="angle", intersect="reference")


class _OutRows:
    """Fake output ref capturing the kernel body's row writes."""

    def __init__(self):
        self.rows = {}

    def __setitem__(self, key, value):
        self.rows[key[0].start] = value


@pytest.mark.parametrize("position_chain", [False, True])
def test_adjoint_matches_autodiff_exactly(scene7, position_chain):
    cfg = CFG.replace(width=16, height=12, spp=3)
    cam = Camera.default()
    rays, seeds, n = pack_rays(cam, cfg, 0)
    rays, seeds = rays[:, :256], seeds[:, :256]
    tri = _scene_table(scene7)
    n_lanes = rays.shape[1]
    rng = np.random.Generator(np.random.Philox(3))
    wts = jnp.asarray(rng.uniform(0.1, 1.0, (3, n_lanes)).astype(np.float32))

    def loss(tri, rays):
        r = _OutRows()
        _megakernel(rays, seeds, tri, r, cfg=cfg, n_tris=scene7.n_tris)
        out = jnp.concatenate([r.rows[0], r.rows[1], r.rows[2]], axis=0)
        return jnp.sum(out * wts)

    gt_auto, gr_auto = jax.grad(loss, argnums=(0, 1))(tri, rays)
    gbar = jnp.concatenate(
        [wts, jnp.zeros((1, n_lanes), jnp.float32)], axis=0)
    gtab_rows, gray_rows = _bwd_tile(
        rays, seeds, tri, gbar, cfg=cfg, n_tris=scene7.n_tris,
        position_chain=position_chain,
    )
    t = scene7.n_tris
    mine = np.asarray(jnp.sum(gtab_rows, axis=1))[: t * _GCOLS]
    mine = mine.reshape(t, _GCOLS)
    auto = np.asarray(gt_auto)[:, :_GCOLS]
    scale = np.abs(auto).max()
    np.testing.assert_allclose(mine, auto, atol=1e-6 * scale)
    # Positions never enter the estimator continuously -> camera-ray
    # cotangents are exact zeros in both.
    assert np.asarray(gr_auto).max() == 0.0
    np.testing.assert_array_equal(np.asarray(gray_rows), 0.0)


def test_scatter_adjoint_matches_autodiff():
    """T > GRAD_UNROLL_TRIS routes the per-triangle accumulation through
    the MXU one-hot scatter (exact 3-way bf16 split — every scattered
    term is the exact fp32 product; only the accumulator's summation
    order differs from the unrolled masked adds), verified against
    ``jax.grad`` of the eagerly-run forward body exactly like the
    unrolled path above."""
    scene = procedural_scene(GRAD_UNROLL_TRIS + 16, seed=2)
    cfg = CFG.replace(width=16, height=12, spp=2, max_bounces=3)
    cam = Camera.default()
    rays, seeds, n = pack_rays(cam, cfg, 0)
    rays, seeds = rays[:, :256], seeds[:, :256]
    tri = _scene_table(scene)
    n_lanes = rays.shape[1]
    rng = np.random.Generator(np.random.Philox(3))
    wts = jnp.asarray(rng.uniform(0.1, 1.0, (3, n_lanes)).astype(np.float32))

    def loss(tri, rays):
        r = _OutRows()
        _megakernel(rays, seeds, tri, r, cfg=cfg, n_tris=scene.n_tris)
        out = jnp.concatenate([r.rows[0], r.rows[1], r.rows[2]], axis=0)
        return jnp.sum(out * wts)

    gt_auto, gr_auto = jax.grad(loss, argnums=(0, 1))(tri, rays)
    gbar = jnp.concatenate(
        [wts, jnp.zeros((1, n_lanes), jnp.float32)], axis=0)
    gtab_rows, gray_rows = _bwd_tile(
        rays, seeds, tri, gbar, cfg=cfg, n_tris=scene.n_tris)
    # scatter mode returns the triangle-major (_SROWS, Tp) accumulator
    mine = np.asarray(gtab_rows)[:_GCOLS, : scene.n_tris].T
    auto = np.asarray(gt_auto)[:, :_GCOLS]
    scale = np.abs(auto).max()
    np.testing.assert_allclose(mine, auto, atol=1e-5 * scale)
    assert np.asarray(gr_auto).max() == 0.0
    np.testing.assert_array_equal(np.asarray(gray_rows), 0.0)


def test_scatter_grad_tracks_xla_wavefront():
    """Full custom-VJP path at T > GRAD_UNROLL_TRIS vs the XLA
    wavefront's autodiff (cross-program statistical tolerance)."""
    scene = procedural_scene(GRAD_UNROLL_TRIS + 16, seed=2)
    cfg = CFG.replace(width=32, height=24, spp=2, max_bounces=3)
    cam = Camera.default()
    wts = _weights(cfg)
    want = _grads(render_radiance, scene, cam, cfg, wts)
    with pltpu.force_tpu_interpret_mode():
        got = _grads(render_radiance_mega, scene, cam, cfg, wts)
    for name, g_got, g_want in zip(["vertices", "albedo", "emission"],
                                   got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        np.testing.assert_allclose(
            g_got, g_want, atol=0.03 * scale,
            err_msg=f"grad mismatch beyond path-flip noise: {name}",
        )


def _weights(cfg):
    rng = np.random.Generator(np.random.Philox(7))
    return jnp.asarray(
        rng.uniform(0.1, 1.0, (cfg.height, cfg.width, 3)).astype(np.float32)
    )


def _grads(render_fn, scene, cam, cfg, wts):
    def loss(vertices, albedo, emission):
        s = Scene(vertices, albedo, emission)
        img = render_fn(s, cam, cfg, 0)
        return jnp.sum(img * wts)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        scene.vertices, scene.albedo, scene.emission
    )


def test_megakernel_grad_tracks_xla_wavefront(scene7):
    cam = Camera.default()
    wts = _weights(CFG)
    want = _grads(render_radiance, scene7, cam, CFG, wts)
    with pltpu.force_tpu_interpret_mode():
        got = _grads(render_radiance_mega, scene7, cam, CFG, wts)
    for name, g_got, g_want in zip(["vertices", "albedo", "emission"],
                                   got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        np.testing.assert_allclose(
            g_got, g_want, atol=0.03 * scale,
            err_msg=f"grad mismatch beyond path-flip noise: {name}",
        )


def test_megakernel_grad_value_matches_forward(scene7):
    # Same program-level path-flip caveat as the forward conformance
    # tests: jitted pallas_call and jitted wavefront are separate XLA
    # programs, so a small per-pixel flip budget applies.
    cam = Camera.default()
    jw = jax.jit(render_radiance, static_argnames=("cfg",))
    want = np.asarray(jw(scene7, cam, CFG, 0))
    with pltpu.force_tpu_interpret_mode():
        jg = jax.jit(render_radiance_mega, static_argnames=("cfg",))
        got = np.asarray(jg(scene7, cam, CFG, 0))
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.01, f"{flipped.mean():.4f} flipped"
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=2e-2)


def test_megakernel_grad_emission_is_exact(scene7):
    # Radiance is exactly LINEAR in emission (throughputs and all path
    # decisions are emission-independent), so a finite difference of the
    # SAME compiled program equals <grad, direction> for ANY step size,
    # up to float32 rounding — a within-program exactness check immune
    # to cross-program path flips.
    cam = Camera.default()
    cfg = CFG.replace(spp=2)

    def loss(emission):
        s = Scene(scene7.vertices, scene7.albedo, emission)
        return jnp.mean(render_radiance_mega(s, cam, cfg, 0))

    rng = np.random.Generator(np.random.Philox(11))
    direction = jnp.asarray(
        rng.normal(size=scene7.emission.shape).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        g = jax.jit(jax.grad(loss))(scene7.emission)
        jloss = jax.jit(loss)
        f0 = float(jloss(scene7.emission))
        f1 = float(jloss(scene7.emission + direction))
    want = f1 - f0
    got = float(jnp.sum(g * direction))
    assert abs(got - want) <= 1e-4 * max(abs(want), 1e-6), (got, want)


def test_megakernel_grad_guardrail(scene7):
    cam = Camera.default()
    cfg = CFG.replace(rng="threefry")
    with pytest.raises(ValueError):
        render_radiance_mega(scene7, cam, cfg, 0)
