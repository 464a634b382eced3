"""Sharded fused megakernels (parallel/shard_fast) on the fake 8-device
CPU mesh, Pallas in interpret mode.

The fused kernels are launch-grid-invariant and their seeds/keys are
derived from global pixel ids before sharding, so the sharded image must
be BIT-IDENTICAL to the single-device fused render. Scene-table
gradients cross a psum (a different but deterministic reduction order
than the single-device lane sum), so they are compared at float32
sum-order tolerance instead.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance_fastgrad
from spath_tpu.ops.pallas.megakernel import render_radiance_megakernel
from spath_tpu.ops.pallas.megakernel_grad import render_radiance_mega
from spath_tpu.ops.pallas.megakernel_quality import (
    render_radiance_quality_megakernel,
)
from spath_tpu.ops.pallas.megakernel_quality_grad import (
    render_radiance_quality_grad,
)
from spath_tpu.parallel.mesh import make_mesh
from spath_tpu.parallel.shard import render_radiance_sharded
from spath_tpu.parallel.shard_fast import (
    render_radiance_fast_sharded,
    render_radiance_fastgrad_sharded,
)
from spath_tpu.scene import Scene

# Sizes are deliberately small: interpret-mode Pallas under an 8-virtual
# -device shard_map runs on ~2 host cores. (Since round 3 small frames
# pad only to whole 128-lane vregs per device — shard_lane_multiple —
# not to n_dev x TILE_N.)
CONF = RenderConfig(width=64, height=32, spp=1, max_bounces=2,
                    rng="lcg", sampler="angle", intersect="reference")
QUAL = RenderConfig(width=64, height=32, spp=1, max_bounces=2,
                    rng="hash", sampler="cosine", nee=True,
                    intersect="reference")


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(4)


def test_fast_sharded_conformance_bitexact(scene7, mesh8):
    cam = Camera.default()
    with pltpu.force_tpu_interpret_mode():
        single = np.asarray(
            jax.jit(render_radiance_megakernel, static_argnames=("cfg",))(
                scene7, cam, CONF, 0))
        sharded = np.asarray(
            render_radiance_fast_sharded(scene7, cam, CONF, 0, mesh8))
    np.testing.assert_array_equal(sharded, single)


def test_fast_sharded_quality_bitexact(scene7, mesh8):
    cam = Camera.default()
    with pltpu.force_tpu_interpret_mode():
        single = np.asarray(
            jax.jit(render_radiance_quality_megakernel,
                    static_argnames=("cfg",))(scene7, cam, QUAL, 0))
        sharded = np.asarray(
            render_radiance_fast_sharded(scene7, cam, QUAL, 0, mesh8))
    np.testing.assert_array_equal(sharded, single)


def test_fast_sharded_falls_back_to_wavefront(scene7, mesh8):
    # threefry+cosine doesn't fit any fused kernel -> sharded wavefront.
    cfg = QUAL.replace(rng="threefry")
    cam = Camera.default()
    want = np.asarray(render_radiance_sharded(scene7, cam, cfg, 0, mesh8))
    got = np.asarray(
        render_radiance_fast_sharded(scene7, cam, cfg, 0, mesh8))
    np.testing.assert_array_equal(got, want)


def _weights(cfg):
    rng = np.random.Generator(np.random.Philox(7))
    return jnp.asarray(
        rng.uniform(0.1, 1.0, (cfg.height, cfg.width, 3)).astype(np.float32)
    )


def _grads(render_fn, scene, cfg, wts, **kw):
    def loss(vertices, albedo, emission, pos, angle, focal):
        s = Scene(vertices, albedo, emission)
        cam = Camera(pos=pos, angle=angle, focal=focal)
        img = render_fn(s, cam, cfg, 0, **kw)
        return jnp.sum(img * wts)

    cam = Camera.default()
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(
        scene.vertices, scene.albedo, scene.emission,
        cam.pos, cam.angle, jnp.asarray(cam.focal),
    )


NAMES = ["vertices", "albedo", "emission", "cam_pos", "cam_angle", "focal"]


@pytest.mark.parametrize(
    "cfg,single_fn",
    [
        (CONF, render_radiance_mega),
        (QUAL, render_radiance_quality_grad),
    ],
    ids=["conformance", "quality"],
)
def test_fastgrad_sharded_matches_single(scene7, mesh4, cfg, single_fn):
    wts = _weights(cfg)
    with pltpu.force_tpu_interpret_mode():
        want = _grads(single_fn, scene7, cfg, wts)
        got = _grads(render_radiance_fastgrad_sharded, scene7, cfg, wts,
                     mesh=mesh4)
    for name, g_got, g_want in zip(NAMES, got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        # psum vs lane-sum reduction order: float32 sum-order noise only.
        np.testing.assert_allclose(
            g_got, g_want, atol=1e-5 * scale,
            err_msg=f"sharded fused grad mismatch: {name}")


def test_bigscene_sharded_bitexact(mesh4):
    """The streamed large-scene kernel under shard_map: forward is
    bit-identical to single-device; attrs-table grads match to psum
    reduction-order tolerance."""
    from spath_tpu.ops.pallas.megakernel_bigscene import (
        render_radiance_bigscene,
    )
    from spath_tpu.ops.pallas.megakernel_bigscene_grad import (
        render_radiance_bigscene_grad,
    )
    from spath_tpu.scene import procedural_scene

    from spath_tpu.parallel.shard_fast import (
        _big_fwd_sharded, _pack_bigscene,
    )

    scene = procedural_scene(300, seed=0, emissive_fraction=0.3)
    cam = Camera.default()
    cfg = CONF.replace(width=32, height=16)
    with pltpu.force_tpu_interpret_mode():
        single = np.asarray(jax.jit(
            render_radiance_bigscene, static_argnames=("cfg", "fast"))(
                scene, cam, cfg, 0))
        # direct (the public dispatcher prefers the SMEM kernel at
        # T <= 1024; large-T dispatch is covered by unit dispatch tests)
        rays, seeds, gfeat, attrs, n_blocks, n = _pack_bigscene(
            scene, cam, cfg, 0, mesh4)
        out = _big_fwd_sharded(rays, seeds, gfeat, attrs, cfg, n_blocks,
                               mesh4, False)
        sharded = np.asarray(out[:3, :n].T.reshape(cfg.height, cfg.width, 3))
    np.testing.assert_array_equal(sharded, single)

    wts = _weights(cfg)
    with pltpu.force_tpu_interpret_mode():
        want = _grads(render_radiance_bigscene_grad, scene, cfg, wts)
        got = _grads(render_radiance_fastgrad_sharded, scene, cfg, wts,
                     mesh=mesh4)
    for name, g_got, g_want in zip(NAMES, got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        np.testing.assert_allclose(
            g_got, g_want, atol=1e-5 * scale,
            err_msg=f"sharded bigscene grad mismatch: {name}")


def test_bigscene_quality_sharded_matches(mesh4):
    """The streamed QUALITY kernel (NEE/MIS) under shard_map vs
    single-device. NOT asserted bit-exact: with the round-3 small-frame
    tile shrink the sharded kernel runs 128-lane tiles while the
    single-device one runs 512 — differently-shaped programs round trig
    at ulp level (the documented cross-program phenomenon), so the
    comparison allows ulp-scale noise; keys stay global so there is no
    sharding-dependent randomness."""
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        render_radiance_bigscene_quality,
    )
    from spath_tpu.scene import procedural_scene

    scene = procedural_scene(300, seed=0, emissive_fraction=0.1)
    li = scene.light_idx
    cam = Camera.default()
    cfg = QUAL.replace(width=32, height=16)
    with pltpu.force_tpu_interpret_mode():
        single = np.asarray(jax.jit(
            render_radiance_bigscene_quality,
            static_argnames=("cfg", "fast"))(scene, cam, cfg, 0))
        sharded = np.asarray(
            render_radiance_fast_sharded(scene, cam, cfg, 0, mesh4))
    np.testing.assert_allclose(sharded, single, atol=1e-7)

    wts = _weights(cfg)

    def grads(render_fn, **kw):
        def loss(vertices, albedo, emission):
            s = Scene(vertices, albedo, emission, light_idx=li)
            img = render_fn(s, cam, cfg, 0, **kw)
            return jnp.sum(img * wts)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
            scene.vertices, scene.albedo, scene.emission)

    with pltpu.force_tpu_interpret_mode():
        want = grads(render_radiance_bigscene_quality)
        got = grads(render_radiance_fastgrad_sharded, mesh=mesh4)
    for name, g_got, g_want in zip(NAMES, got, want):
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        scale = np.abs(g_want).max() + 1e-12
        np.testing.assert_allclose(
            g_got, g_want, atol=1e-5 * scale,
            err_msg=f"sharded bigq grad mismatch: {name}")


def test_fastgrad_dispatcher_routes_mesh(scene7, mesh4):
    """models.pathtracer.render_radiance_fastgrad(mesh=...) returns the
    sharded fused values."""
    cam = Camera.default()
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(jax.jit(
            render_radiance_mega, static_argnames=("cfg",))(
                scene7, cam, CONF, 0))
        got = np.asarray(render_radiance_fastgrad(
            scene7, cam, CONF, 0, mesh=mesh4))
    np.testing.assert_array_equal(got, want)


def test_train_step_with_mesh_fused(scene7, mesh4):
    """Full sharded train step through the fused VJP: loss decreases and
    matches the single-device fused train step."""
    import optax

    from spath_tpu.models.inverse import (
        InverseParams, init_state, make_train_step,
    )

    cfg = CONF.replace(width=32, height=16)
    cam = Camera.default()
    with pltpu.force_tpu_interpret_mode():
        target = jax.jit(render_radiance_mega, static_argnames=("cfg",))(
            scene7, cam, cfg, 0)
        import dataclasses

        params = dataclasses.replace(
            InverseParams.init(scene7, cam),
            albedo=jnp.clip(scene7.albedo + 0.2, 0.0, 1.0),
        )
        opt = optax.adam(5e-2)

        losses = {}
        for label, mesh in [("sharded", mesh4), ("single", None)]:
            state = init_state(opt, params)
            step = make_train_step(opt, scene7, cfg, mesh=mesh,
                                   fixed_seed=0)
            ls = []
            for _ in range(2):
                state, aux = step(state, target)
                ls.append(float(aux["loss"]))
            losses[label] = ls
    assert losses["sharded"][1] < losses["sharded"][0]
    np.testing.assert_allclose(
        losses["sharded"], losses["single"], rtol=1e-4)
