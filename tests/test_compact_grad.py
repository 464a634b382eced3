"""Differentiable bucket-compacted fused launch == full-frame custom-VJP
kernels, values AND gradients (``models/compact_fast.py`` round 4).

Dropped lanes are certified camera-misses: zero radiance and zero
adjoint contributions (every chain in the reverse sweeps is hit/ok
masked), so both the image and every scene/camera cotangent must match
the full fused launch — values bit-exactly, scene-table adjoints up to
the f32 accumulation-order change of dropping exact-zero dead-tile
additions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.compact_fast import (
    make_compact_plan,
    render_radiance_compact_grad,
    supported_grad,
)
from spath_tpu.scene import Scene

PAD = 1024  # small bucket so the 48x32 frame really drops dead tiles


def _cfg(**kw):
    base = dict(width=48, height=32, spp=2, max_bounces=3,
                rng="lcg", sampler="angle", intersect="pluecker")
    base.update(kw)
    return RenderConfig(**base)


def _full_grad_fn(cfg):
    if cfg.rng == "hash":
        from spath_tpu.ops.pallas.megakernel_quality_grad import (
            render_radiance_quality_grad,
        )

        return render_radiance_quality_grad
    from spath_tpu.ops.pallas.megakernel_grad import render_radiance_mega

    return render_radiance_mega


@pytest.mark.parametrize("quality", [False, True])
def test_compact_grad_matches_full(scene7, quality):
    cfg = _cfg(rng="hash", sampler="cosine", nee=True,
               mis=True) if quality else _cfg()
    cam = Camera.default()
    assert supported_grad(scene7, cfg)
    li = scene7.light_idx
    full = _full_grad_fn(cfg)

    with pltpu.force_tpu_interpret_mode():
        plan = make_compact_plan(scene7, cam, cfg, pad_multiple=PAD)
        assert plan.padded < plan.rays_p.shape[1], "nothing compacted"

        def make_loss(fn, **kw):
            def loss(v, a, e, pos):
                import dataclasses

                s = Scene(v, a, e, light_idx=li)
                c = dataclasses.replace(cam, pos=pos)
                return jnp.mean(fn(s, c, cfg, 3, **kw))
            return loss

        want_v = np.asarray(full(scene7, cam, cfg, 3))
        got_v = np.asarray(render_radiance_compact_grad(
            scene7, cam, cfg, 3, pad_multiple=PAD, plan=plan))
        assert (got_v == want_v).all(), np.abs(got_v - want_v).max()

        args = (scene7.vertices, scene7.albedo, scene7.emission, cam.pos)
        want = jax.grad(make_loss(full), argnums=(0, 1, 2, 3))(*args)
        got = jax.grad(make_loss(render_radiance_compact_grad,
                                 plan=plan, pad_multiple=PAD),
                       argnums=(0, 1, 2, 3))(*args)
    for name, g_got, g_want in zip(
            ["vertices", "albedo", "emission", "campos"], got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max()
        if name == "campos" and not quality:
            # conformance estimator: position chain identically zero
            # under detached sampling (megakernel_grad policy)
            assert scale == 0.0 and np.abs(g_got).max() == 0.0
            continue
        assert scale > 0.0, f"vacuous gradient: {name}"
        np.testing.assert_allclose(
            g_got, g_want, atol=1e-6 * scale, rtol=1e-6,
            err_msg=f"compact-vs-full gradient drift: {name}")


def test_compact_grad_jittable_with_plan(scene7):
    """With an explicit plan the compacted VJP lives under jax.jit —
    scene traced, launch static — and matches the eager call."""
    cfg = _cfg()
    cam = Camera.default()
    with pltpu.force_tpu_interpret_mode():
        plan = make_compact_plan(scene7, cam, cfg, pad_multiple=PAD)

        @jax.jit
        def loss_grad(albedo):
            s = Scene(scene7.vertices, albedo, scene7.emission,
                      light_idx=scene7.light_idx)
            return jax.grad(lambda a: jnp.mean(
                render_radiance_compact_grad(
                    Scene(scene7.vertices, a, scene7.emission,
                          light_idx=scene7.light_idx),
                    cam, cfg, 0, plan=plan)))(albedo)

        g_jit = np.asarray(loss_grad(scene7.albedo))
        g_eager = np.asarray(jax.grad(lambda a: jnp.mean(
            render_radiance_compact_grad(
                Scene(scene7.vertices, a, scene7.emission,
                      light_idx=scene7.light_idx),
                cam, cfg, 0, plan=plan)))(scene7.albedo))
    np.testing.assert_allclose(g_jit, g_eager, rtol=1e-6)
    assert np.abs(g_eager).max() > 0.0


def test_plan_survives_appearance_change(scene7):
    """The documented contract: appearance-only training (albedo or
    emission values move, geometry fixed) never stales a plan — the
    compacted render stays bit-equal to full-frame under the ORIGINAL
    plan with modified materials."""
    cfg = _cfg()
    cam = Camera.default()
    full = _full_grad_fn(cfg)
    with pltpu.force_tpu_interpret_mode():
        plan = make_compact_plan(scene7, cam, cfg, pad_multiple=PAD)
        mod = Scene(scene7.vertices, scene7.albedo * 0.5,
                    scene7.emission * 2.0, light_idx=scene7.light_idx)
        want = np.asarray(full(mod, cam, cfg, 7))
        got = np.asarray(render_radiance_compact_grad(
            mod, cam, cfg, 7, plan=plan))
    assert (got == want).all(), np.abs(got - want).max()


def test_fastgrad_routes_compact_when_eager(scene7, monkeypatch):
    """render_radiance_fastgrad: eager concrete inputs route to the
    compacted VJP; traced inputs route around it (plan host sync)."""
    from spath_tpu.models import renderer as R

    monkeypatch.setattr(R, "_on_accel", lambda: True)
    cfg = _cfg()
    assert R.grad_renderer(scene7, cfg).name == "compact_fused"
    assert R.grad_renderer(scene7, cfg,
                           require_jittable=True).name == "megakernel"
