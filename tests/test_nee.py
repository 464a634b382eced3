"""Next-event estimation: unbiasedness vs BSDF sampling, variance
reduction, and the smooth camera/vertex gradients it unlocks."""

import numpy as np
import jax
import jax.numpy as jnp

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.ops.nee import light_cdf, sample_light_points, triangle_areas
from spath_tpu.scene import default_scene

BASE = RenderConfig(width=32, height=24, rng="threefry", sampler="cosine")


def test_light_cdf_selects_emissive(scene7):
    cdf, prob = light_cdf(scene7)
    p = np.asarray(prob)
    # only triangles 3,4 (the area light) are emissive; equal areas
    np.testing.assert_allclose(p[[3, 4]], 0.5, atol=1e-6)
    assert (p[[0, 1, 2, 5, 6]] == 0).all()
    assert abs(float(cdf[-1]) - 1.0) < 1e-6


def test_sample_points_on_light(scene7):
    n = 256
    k = jax.random.key(0)
    u = jax.random.uniform(k, (3, n))
    s = sample_light_points(scene7, u[0], u[1], u[2])
    y = np.asarray(s["y"])
    idx = np.asarray(s["idx"])
    assert set(np.unique(idx)) <= {3, 4}
    # all points on the light plane y=0.75, inside its extent
    np.testing.assert_allclose(y[:, 1], 0.75, atol=1e-5)
    assert (np.abs(y[:, [0, 2]]) <= 0.75 + 1e-5).all()
    np.testing.assert_allclose(
        np.asarray(triangle_areas(scene7))[3], 0.5 * 1.5 * 1.5, rtol=1e-5
    )


def test_nee_matches_bsdf_sampling_in_expectation(scene7):
    """Pure-NEE and pure-BSDF estimators target the same integral."""
    cam = Camera.default()
    a = np.asarray(render_radiance(
        scene7, cam, BASE.replace(spp=64, nee=True), seed=0))
    b = np.asarray(render_radiance(
        scene7, cam, BASE.replace(spp=256, nee=False), seed=1))
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.06)


def test_nee_reduces_variance(scene7):
    """At equal spp, per-pixel variance across seeds must drop with NEE."""
    cam = Camera.default()

    def var(cfg):
        imgs = [
            np.asarray(render_radiance(scene7, cam, cfg, seed=s))
            for s in range(4)
        ]
        return np.var(np.stack(imgs), axis=0).mean()

    v_nee = var(BASE.replace(spp=4, nee=True))
    v_bsdf = var(BASE.replace(spp=4, nee=False))
    assert v_nee < 0.5 * v_bsdf, (v_nee, v_bsdf)


def _wall_and_light_scene():
    """A silhouette-free scene: a wall far larger than the view frustum
    and a big off-screen area light behind the camera. Every camera ray
    hits the wall; nothing occludes the shadow rays — the render is a
    smooth function of camera pose, so FD is well-defined."""
    from spath_tpu.scene import make_scene

    verts = np.array(
        [
            [[-500.0, -500.0, 1.0], [500.0, -500.0, 1.0], [0.0, 800.0, 1.0]],
            [[-3.0, -3.0, -8.0], [3.0, -3.0, -8.0], [0.0, 4.0, -8.0]],
        ],
        np.float32,
    )
    albedo = np.array([[0.6, 0.5, 0.4], [0.0, 0.0, 0.0]], np.float32)
    emission = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]], np.float32)
    return make_scene(verts, albedo, emission)


def test_nee_camera_translation_grad_matches_fd():
    """The point of NEE for inverse rendering: camera-translation
    gradients are smooth (hit points slide, r² and cosines change) and
    must match finite differences — in a scene with no on-screen
    silhouettes (any visibility edge makes FD itself ill-defined)."""
    scene = _wall_and_light_scene()
    cfg = BASE.replace(spp=8, nee=True, width=24, height=16, max_bounces=2)

    def f(z):
        cam = Camera(
            pos=jnp.asarray([0.0, 0.0, z], jnp.float32),
            angle=jnp.zeros(3, jnp.float32),
            focal=jnp.float32(2.0),
        )
        return jnp.sum(render_radiance(scene, cam, cfg, seed=3))

    g = float(jax.grad(f)(jnp.float32(-3.0)))
    eps = 1e-3
    fd1 = (float(f(jnp.float32(-3 + eps))) - float(f(jnp.float32(-3 - eps)))) / (2 * eps)
    fd2 = (float(f(jnp.float32(-3 + 2 * eps))) - float(f(jnp.float32(-3 - 2 * eps)))) / (4 * eps)
    assert abs(fd1 - fd2) < 0.05 * max(abs(fd1), 1e-3), "FD unstable"
    assert abs(g) > 0
    np.testing.assert_allclose(g, fd1, rtol=0.1)


def test_nee_light_vertex_grad_matches_fd():
    """Light-geometry gradients flow through the reparameterized area
    sample (y, area, cosθ_ℓ, r²) — the term hemisphere sampling can't
    see. Move the (off-screen) light toward the wall and FD-check the
    directional derivative; also scale one light edge so the area
    gradient is exercised."""
    scene = _wall_and_light_scene()
    cfg = BASE.replace(spp=8, nee=True, width=24, height=16, max_bounces=2)
    cam = Camera.default()
    verts0 = jnp.asarray(scene.vertices)
    direction = np.zeros((2, 3, 3), np.float32)
    direction[1, :, 2] = 1.0       # translate light along +z
    direction[1, 0, 0] = -0.5      # and stretch one vertex (area term)
    dir_j = jnp.asarray(direction)

    def f(t):
        s = scene.__class__(verts0 + t * dir_j, scene.albedo, scene.emission)
        return jnp.sum(render_radiance(s, cam, cfg, seed=5))

    g = float(jax.grad(f)(jnp.float32(0.0)))
    eps = 2e-3
    fd1 = (float(f(jnp.float32(eps))) - float(f(jnp.float32(-eps)))) / (2 * eps)
    fd2 = (float(f(jnp.float32(2 * eps))) - float(f(jnp.float32(-2 * eps)))) / (4 * eps)
    assert abs(fd1 - fd2) < 0.08 * max(abs(fd1), 1e-3), "FD unstable"
    assert abs(g) > 0
    np.testing.assert_allclose(g, fd1, rtol=0.12)


def test_nee_requires_threefry(scene7):
    import pytest

    with pytest.raises(ValueError):
        render_radiance(
            scene7, Camera.default(),
            RenderConfig(width=8, height=8, spp=1, rng="lcg", nee=True),
        )


def test_mis_unbiased_vs_pure_strategies(scene7):
    """MIS combines the two unbiased strategies — all three estimators
    must agree in expectation."""
    cam = Camera.default()
    base = RenderConfig(width=32, height=24, spp=128, rng="threefry",
                        sampler="cosine")
    mis = np.asarray(render_radiance(
        scene7, cam, base.replace(nee=True, mis=True), seed=3))
    pure_nee = np.asarray(render_radiance(
        scene7, cam, base.replace(nee=True, mis=False), seed=4))
    bsdf = np.asarray(render_radiance(
        scene7, cam, base.replace(nee=False), seed=5))
    np.testing.assert_allclose(mis.mean(), pure_nee.mean(), rtol=0.06)
    np.testing.assert_allclose(mis.mean(), bsdf.mean(), rtol=0.08)


def test_mis_beats_bsdf_variance_with_close_light(scene7):
    """Large/close lights are where BSDF sampling shines and pure NEE's
    r² term explodes; MIS must track the better strategy. Move the
    camera right under the ceiling light."""
    import jax.numpy as jnp

    cam = Camera.default().move_relative(
        jnp.asarray([0.0, 0.5, 2.5], jnp.float32))
    base = RenderConfig(width=24, height=18, spp=4, rng="threefry",
                        sampler="cosine")

    def var(cfg):
        imgs = [np.asarray(render_radiance(scene7, cam, cfg, seed=s))
                for s in range(6)]
        return np.var(np.stack(imgs), axis=0).mean()

    v_mis = var(base.replace(nee=True, mis=True))
    v_nee = var(base.replace(nee=True, mis=False))
    v_bsdf = var(base.replace(nee=False))
    # MIS should not be much worse than the best pure strategy.
    assert v_mis < 1.5 * min(v_nee, v_bsdf), (v_mis, v_nee, v_bsdf)
