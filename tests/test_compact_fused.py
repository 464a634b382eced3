"""Bucket-compacted fused forward == the full fused launch, exactly.

The compacted path drops only certified camera-miss lanes (whose
radiance is exactly the zero background it reads back) and permutes the
rest with their per-pixel RNG ids, so its output must be bit-identical
to the full fused render — not merely close (``models/compact_fast.py``).
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
    render_radiance_compact_fused,
    supported,
)


def _cfg(**kw):
    base = dict(width=48, height=32, spp=2, max_bounces=3,
                rng="lcg", sampler="angle", intersect="pluecker")
    base.update(kw)
    return RenderConfig(**base)


def _full(scene, cam, cfg, seed):
    if cfg.rng == "hash":
        from spath_tpu.ops.pallas.megakernel_quality import (
            render_radiance_quality_megakernel,
        )

        return render_radiance_quality_megakernel(scene, cam, cfg, seed)
    from spath_tpu.ops.pallas.megakernel import render_radiance_megakernel

    return render_radiance_megakernel(scene, cam, cfg, seed)


@pytest.mark.parametrize("quality", [False, True])
@pytest.mark.parametrize("pad_multiple", [1024, 4096])
def test_compact_matches_full_fused(scene7, quality, pad_multiple):
    cfg = _cfg(rng="hash", sampler="cosine", nee=True,
               mis=True) if quality else _cfg()
    cam = Camera.default()
    assert supported(scene7, cfg)
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(_full(scene7, cam, cfg, 5))
        got = np.asarray(render_radiance_compact_fused(
            scene7, cam, cfg, 5, pad_multiple=pad_multiple))
    assert (got == want).all(), np.abs(got - want).max()


def _streamed_scene():
    import numpy as np

    from spath_tpu.scene import default_scene, make_scene, procedural_scene

    base = default_scene()
    proc = procedural_scene(250, seed=0, emissive_fraction=0.05)
    return make_scene(
        np.concatenate([np.asarray(base.vertices),
                        np.asarray(proc.vertices)]),
        np.concatenate([np.asarray(base.albedo), np.asarray(proc.albedo)]),
        np.concatenate([np.asarray(base.emission),
                        np.asarray(proc.emission)]),
    )


@pytest.mark.parametrize("quality", [False, True])
def test_compact_matches_streamed_fused(quality):
    """Above the SMEM route the compact path launches the HBM-streamed
    kernels on the live prefix — still bit-exact vs the full launch."""
    from spath_tpu.models.compact_fast import _select_kernel
    from spath_tpu.ops.pallas.megakernel_bigscene import (
        render_radiance_bigscene,
    )
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        render_radiance_bigscene_quality,
    )

    scene = _streamed_scene()
    cfg = _cfg(width=32, height=32, rng="hash", sampler="cosine",
               nee=True, mis=True) if quality else _cfg(width=32,
                                                        height=32)
    kernel = _select_kernel(scene, cfg)
    assert kernel == ("bigscene_quality" if quality else "bigscene")
    full = (render_radiance_bigscene_quality if quality
            else render_radiance_bigscene)
    cam = Camera.default()
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(full(scene, cam, cfg, 3))
        got = np.asarray(render_radiance_compact_fused(
            scene, cam, cfg, 3, pad_multiple=512))
    assert (got == want).all(), np.abs(got - want).max()


def test_compact_exact_under_randomized_cameras(scene7):
    """Property test (round 4): zero compact-vs-full mismatches over a
    sweep of randomized camera poses. The conservative margin
    classifier (``_any_hit_relaxed``) guarantees dead-classified lanes
    are kernel-dead under ANY formulation, so bit-exactness must hold
    for every pose, not just the pinned default views."""
    rng = np.random.default_rng(7)
    cfg = _cfg()
    with pltpu.force_tpu_interpret_mode():
        for k in range(8):
            cam = Camera.default()
            cam = cam.move_relative(jnp.asarray(
                rng.uniform(-0.8, 0.8, 3).astype(np.float32)))
            cam = cam.rotate_by(jnp.asarray(
                rng.uniform(-0.5, 0.5, 3).astype(np.float32)))
            want = np.asarray(_full(scene7, cam, cfg, k))
            got = np.asarray(render_radiance_compact_fused(
                scene7, cam, cfg, k, pad_multiple=1024))
            assert (got == want).all(), \
                f"pose {k}: {np.abs(got - want).max()}"


def test_margin_classifier_superset(scene7):
    """The relaxed classifier's live set contains every strict hit —
    the conservative invariant, checked directly on random rays."""
    from spath_tpu.models.compact_fast import _any_hit_relaxed
    from spath_tpu.ops.intersect import nearest_hit

    rng = np.random.default_rng(3)
    n = 4096
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    src = jnp.full(n, -1, jnp.int32)
    for method in ("reference", "pluecker"):
        _, idx = nearest_hit(o, d, scene7.v0, scene7.v1, scene7.v2,
                             src, method=method)
        strict = np.asarray(idx >= 0)
        relaxed = np.asarray(_any_hit_relaxed(
            o, d, scene7.v0, scene7.v1, scene7.v2))
        assert not (strict & ~relaxed).any(), method


def test_compact_plan_reused_across_seeds(scene7):
    """The plan is seed-independent: one plan, different frame seeds,
    each bit-equal to its full fused render."""
    cfg = _cfg()
    cam = Camera.default()
    plan = make_compact_plan(scene7, cam, cfg, pad_multiple=1024)
    with pltpu.force_tpu_interpret_mode():
        for seed in (1, 9):
            want = np.asarray(_full(scene7, cam, cfg, seed))
            got = np.asarray(render_radiance_compact_fused(
                scene7, cam, cfg, seed, plan=plan))
            assert (got == want).all(), seed


def test_plan_cache_value_keyed(scene7):
    """A caller that rebuilds an EQUAL Scene/Camera every frame reuses
    the cached plan via the value fingerprint instead of silently
    rebuilding (round-3 review item on the identity-keyed cache)."""
    from spath_tpu.models import compact_fast as cf
    from spath_tpu.scene import make_scene

    cfg = _cfg()
    cam = Camera.default()
    with pltpu.force_tpu_interpret_mode():
        p1 = cf._cached_plan(scene7, cam, cfg, 1024)
        assert cf._cached_plan(scene7, cam, cfg, 1024) is p1
        rebuilt = make_scene(
            jnp.asarray(np.asarray(scene7.vertices)),
            jnp.asarray(np.asarray(scene7.albedo)),
            jnp.asarray(np.asarray(scene7.emission)))
        assert cf._cached_plan(rebuilt, Camera.default(), cfg,
                               1024) is p1
        moved = cam.move_relative(jnp.asarray([0.3, 0.0, 0.0]))
        assert cf._cached_plan(scene7, moved, cfg, 1024) is not p1


def test_compact_all_dead_view(scene7):
    """Camera turned away: every lane misses → exact zeros, no launch."""
    cfg = _cfg()
    cam = Camera.default().rotate_by(
        jnp.array([0.0, np.float32(np.pi), 0.0], jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(render_radiance_compact_fused(scene7, cam, cfg, 1))
    assert got.shape == (cfg.height, cfg.width, 3)
    assert (got == 0.0).all()


def test_compact_actually_compacts(scene7):
    """The default view has dead lanes to drop (sanity of the premise)
    and the bucketing launches fewer lanes than the frame."""
    cfg = _cfg()
    plan = make_compact_plan(scene7, Camera.default(), cfg,
                             pad_multiple=1024)
    total = plan.rays_p.shape[1]
    assert 0 < plan.n_live < total
    assert plan.padded < total
    assert plan.padded % 1024 == 0


def test_registry_routing(scene7):
    """compact_fused is first for unjitted forward selection, skipped
    when the caller requires a jittable backend."""
    from spath_tpu.models.renderer import forward_renderer, get_renderer

    r = get_renderer("compact_fused")
    assert not r.jittable and r.auto
    cfg = _cfg()
    jit_r = forward_renderer(scene7, cfg, require_jittable=True)
    assert jit_r.jittable
