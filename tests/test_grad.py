"""Differentiability: gradients w.r.t. scene and camera parameters.

BASELINE config 3: "gradients w.r.t. triangle vertices and per-triangle
albedo ... grad max-err vs finite differences". The reference has no
gradients at all — this is the capability the TPU-native framework adds
(north star). Policy: detached sampling (fixed RNG stream ⇒ the render
is a deterministic function of parameters; sampled directions are
stop-gradient constants), so finite differences of the *same-seed*
render are the ground truth for the smooth part of the gradient.

Visibility edges are genuinely discontinuous (argmin over triangles);
tests use configurations where the FD step does not flip any hit, which
is what makes FD well-defined.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.scene import default_scene

CFG = RenderConfig(width=24, height=16, spp=4, rng="lcg", sampler="angle")


def _loss_scene(scene, cam, cfg):
    return jnp.sum(render_radiance(scene, cam, cfg))


def _fd_grad(f, x, eps):
    """Central finite differences of scalar f at flat array x."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = g.reshape(-1)
    xf = x.reshape(-1)
    for i in range(xf.size):
        xp = xf.copy()
        xm = xf.copy()
        xp[i] += eps
        xm[i] -= eps
        flat[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (2 * eps)
    return g


def test_grad_albedo_matches_fd():
    scene = default_scene()
    cam = Camera.default()

    def f_np(albedo):
        s = scene.__class__(
            vertices=scene.vertices,
            albedo=jnp.asarray(albedo, jnp.float32),
            emission=scene.emission,
        )
        return float(_loss_scene(s, cam, CFG))

    g = jax.grad(
        lambda a: _loss_scene(
            scene.__class__(scene.vertices, a, scene.emission), cam, CFG
        )
    )(scene.albedo)
    g = np.asarray(g)
    fd = _fd_grad(f_np, np.asarray(scene.albedo), eps=1e-2)
    scale = np.abs(fd).max()
    assert scale > 0
    np.testing.assert_allclose(g, fd, atol=3e-2 * scale, rtol=0)


def test_grad_emission_matches_fd():
    """Radiance is LINEAR in emission under detached sampling — FD must
    match to float precision."""
    scene = default_scene()
    cam = Camera.default()

    def f_np(emission):
        s = scene.__class__(scene.vertices, scene.albedo,
                            jnp.asarray(emission, jnp.float32))
        return float(_loss_scene(s, cam, CFG))

    g = np.asarray(
        jax.grad(
            lambda e: _loss_scene(
                scene.__class__(scene.vertices, scene.albedo, e), cam, CFG
            )
        )(scene.emission)
    )
    fd = _fd_grad(f_np, np.asarray(scene.emission), eps=1e-2)
    np.testing.assert_allclose(g, fd, atol=1e-3 * max(np.abs(fd).max(), 1), rtol=0)


def test_grad_vertices_finite_and_nonzero():
    scene = default_scene()
    cam = Camera.default()
    g = np.asarray(
        jax.grad(
            lambda v: _loss_scene(
                scene.__class__(v, scene.albedo, scene.emission), cam, CFG
            )
        )(scene.vertices)
    )
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_grad_hit_distance_matches_fd():
    """The geometric core of vertex gradients: the nearest-hit distance
    is smooth in triangle vertices; its VJP must match FD exactly."""
    from spath_tpu.ops.intersect import nearest_hit

    o = jnp.asarray([[0.1, 0.2, -1.0], [0.0, -0.1, -2.0]], jnp.float32)
    d = jnp.asarray([[0.05, -0.02, 1.0], [0.0, 0.1, 1.0]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    verts0 = np.array(
        [[[-2.0, -2.0, 1.0], [2.0, -2.0, 1.0], [0.0, 2.5, 1.0]]], np.float64
    )
    src = jnp.asarray([-1, -1], jnp.int32)

    def dist_sum(v):
        dist, _ = nearest_hit(
            o, d, v[:, 0], v[:, 1], v[:, 2], src, method="reference"
        )
        return jnp.sum(dist)

    g = np.asarray(
        jax.grad(lambda v: dist_sum(jnp.asarray(v, jnp.float32)))(
            jnp.asarray(verts0, jnp.float32)
        )
    )
    fd = _fd_grad(lambda v: float(dist_sum(jnp.asarray(v, jnp.float32))),
                  verts0, eps=1e-3)
    np.testing.assert_allclose(g, fd, rtol=0, atol=2e-3 * np.abs(fd).max())


def test_grad_vertices_normal_tilt_matches_fd():
    """Tilting a surface changes its shading normal → the cosθ chain in
    the estimator changes smoothly. This is the vertex-gradient component
    detached sampling *does* capture. The scene is built so that NO
    silhouette exists anywhere (a wall filling the whole view + a
    quasi-infinite emissive plane catching every bounce), making the
    render a genuinely smooth function of the tilt and FD well-defined."""
    from spath_tpu.scene import make_scene

    verts = np.array(
        [
            # wall at z=1, far larger than the view frustum
            [[-500.0, -500.0, 1.0], [500.0, -500.0, 1.0], [0.0, 800.0, 1.0]],
            # huge emissive plane behind the camera at z=-50
            [[-1e6, -1e6, -50.0], [1e6, -1e6, -50.0], [0.0, 1.5e6, -50.0]],
        ],
        np.float64,
    )
    albedo = np.array([[0.6, 0.5, 0.4], [0.0, 0.0, 0.0]], np.float32)
    emission = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    cam = Camera.default()
    cfg = CFG.replace(max_bounces=3)

    def f(t):
        v = jnp.asarray(verts, jnp.float32)
        v = v.at[0, 0, 2].add(t)  # tilt the wall by moving one vertex in z
        s = make_scene(v, albedo, emission)
        return _loss_scene(s, cam, cfg)

    g = float(jax.grad(lambda t: f(t))(jnp.float32(0.0)))
    eps = 1e-2
    fd1 = (float(f(eps)) - float(f(-eps))) / (2 * eps)
    fd2 = (float(f(2 * eps)) - float(f(-2 * eps))) / (4 * eps)
    # FD must be stable across eps (no visibility flip in the bracket).
    assert abs(fd1 - fd2) < 0.05 * max(abs(fd1), 1e-3), "FD unstable"
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd1, rtol=0.1, atol=1e-4)


def test_grad_light_translation_is_visibility_only():
    """Pin the DEFAULT detached-sampling policy: translating the area
    light only changes *which* fixed-direction rays hit it (a step
    function), so the detached gradient along that direction is ~0 even
    though FD is not. ``cfg.vis_grad`` opts into the warped-area
    reparameterization that recovers this term — see
    test_vis_grad_light_translation_matches_nee below."""
    scene = default_scene()
    cam = Camera.default()
    verts = np.asarray(scene.vertices, np.float64)
    direction = np.zeros_like(verts)
    direction[3, :, 1] = direction[4, :, 1] = 1.0

    def f(t):
        v = jnp.asarray(verts + t * direction, jnp.float32)
        return _loss_scene(
            scene.__class__(v, scene.albedo, scene.emission), cam, CFG
        )

    g = float(jax.grad(lambda t: f(t))(jnp.float32(0.0)))
    assert abs(g) < 1e-3


def _floor_light_scene():
    """Floor + overhead area light, nothing else: every radiance path is
    camera→floor→light, so ALL parameter sensitivity of the BSDF-sampled
    estimator is the light's silhouette term."""
    from spath_tpu.scene import make_scene

    verts = np.array([
        [[-20, -1, -20], [20, -1, -20], [0, -1, 40]],
        [[-20, -1, 20], [20, -1, -20], [20, -1, 20]],
        [[-0.5, 0.75, -0.5], [0.5, 0.75, -0.5], [-0.5, 0.75, 0.5]],
        [[0.5, 0.75, 0.5], [0.5, 0.75, -0.5], [-0.5, 0.75, 0.5]],
    ], np.float64)
    albedo = np.array([[0.7] * 3, [0.7] * 3, [0] * 3, [0] * 3], np.float32)
    emission = np.array([[0] * 3, [0] * 3, [2] * 3, [2] * 3], np.float32)
    direction = np.zeros_like(verts)
    direction[2, :, 1] = direction[3, :, 1] = 1.0   # raise the light
    return verts, albedo, emission, direction


def test_vis_grad_light_translation_matches_nee():
    """Warped-area reparameterization (cfg.vis_grad): the BSDF-sampled
    estimator's light-translation gradient — ZERO under detached
    sampling — must match the independently FD-validated NEE gradient
    of the same integral (both are Monte-Carlo estimates of the true
    d(mean image)/dθ; on the TPU run the three-way agreement
    BSDF+reparam ↔ NEE-grad ↔ NEE-FD was ~1%)."""
    from spath_tpu.scene import make_scene

    verts, albedo, emission, direction = _floor_light_scene()
    cam = Camera.default()

    def make_f(cfg):
        def f(t, seed):
            v = (jnp.asarray(verts, jnp.float32)
                 + t * jnp.asarray(direction, jnp.float32))
            return jnp.mean(render_radiance(
                make_scene(v, albedo, emission), cam, cfg, seed))
        return f

    base = dict(width=64, height=48, max_bounces=2, rng="hash",
                sampler="cosine", intersect="pluecker")
    f_b = make_f(RenderConfig(**base, spp=96, vis_grad=True))
    g_b = np.mean([
        float(jax.jit(jax.grad(f_b))(jnp.float32(0.0), s))
        for s in range(3)
    ])
    f_n = make_f(RenderConfig(**base, spp=16, nee=True, mis=False))
    g_n = float(jax.jit(jax.grad(f_n))(jnp.float32(0.0), 0))

    assert g_n < -1e-3, "NEE ground-truth gradient should be clearly <0"
    np.testing.assert_allclose(g_b, g_n, rtol=0.15)

    # default policy control: detached gradient is ~0 for the same move
    f_0 = make_f(RenderConfig(**base, spp=16))
    g_0 = float(jax.jit(jax.grad(f_0))(jnp.float32(0.0), 0))
    assert abs(g_0) < 0.05 * abs(g_n)


def test_vis_grad_blocker_translation_matches_fd():
    """Edge-sampled shadow-boundary term (ops/warp.py::
    nee_boundary_term): translating a BLOCKER between light and floor
    has an exactly-zero detached gradient; with cfg.vis_grad the
    line-integral estimator must match finite differences of the same
    estimator (TPU run: -0.00361 vs FD -0.00349, seed-stable to 3%)."""
    from spath_tpu.scene import make_scene

    verts = np.array([
        [[-20, -1, -20], [20, -1, -20], [0, -1, 40]],
        [[-20, -1, 20], [20, -1, -20], [20, -1, 20]],
        [[-0.5, 0.75, -0.5], [0.5, 0.75, -0.5], [-0.5, 0.75, 0.5]],
        [[0.5, 0.75, 0.5], [0.5, 0.75, -0.5], [-0.5, 0.75, 0.5]],
        [[-0.35, 0.0, -0.25], [0.35, 0.0, -0.25], [0.0, 0.0, 0.45]],
    ], np.float64)
    albedo = np.array(
        [[0.7] * 3, [0.7] * 3, [0] * 3, [0] * 3, [0.3] * 3], np.float32)
    emission = np.array(
        [[0] * 3, [0] * 3, [2] * 3, [2] * 3, [0] * 3], np.float32)
    direction = np.zeros_like(verts)
    direction[4, :, 1] = 1.0           # raise the blocker
    cam = Camera.default()

    def make_f(cfg):
        def f(t, seed):
            v = (jnp.asarray(verts, jnp.float32)
                 + t * jnp.asarray(direction, jnp.float32))
            return jnp.mean(render_radiance(
                make_scene(v, albedo, emission), cam, cfg, seed))
        return f

    base = dict(width=64, height=48, spp=64, max_bounces=2, rng="hash",
                sampler="cosine", nee=True, mis=False,
                intersect="pluecker")
    f0 = make_f(RenderConfig(**base))
    assert float(jax.jit(jax.grad(f0))(jnp.float32(0.0), 0)) == 0.0

    fv = make_f(RenderConfig(**base, vis_grad=True))
    g = np.mean([float(jax.jit(jax.grad(fv))(jnp.float32(0.0), s))
                 for s in range(2)])
    fj = jax.jit(fv)
    eps = 0.03
    fd = np.mean([
        (float(fj(jnp.float32(eps), s)) - float(fj(jnp.float32(-eps), s)))
        / (2 * eps) for s in range(4)
    ])
    assert fd < -1e-3, "FD should show a clear shadow-size signal"
    np.testing.assert_allclose(g, fd, rtol=0.3)


def test_vis_grad_forward_value_unchanged():
    """The reparameterization factor is x/stop_grad(x) — exactly 1.0 —
    and the boundary term is (y - stop_grad(y))·m̂ — exactly 0.0 — in
    the forward pass, so enabling vis_grad cannot change any image
    (including NEE mode, whose extra edge draws sit after every
    existing stream index)."""
    scene = default_scene()
    cam = Camera.default()
    for cfg in (CFG.replace(spp=2),
                RenderConfig(width=24, height=16, spp=2, rng="hash",
                             sampler="cosine", nee=True, mis=True,
                             rr_start=2)):
        a = np.asarray(render_radiance(scene, cam, cfg, 0))
        b = np.asarray(render_radiance(
            scene, cam, cfg.replace(vis_grad=True), 0))
        np.testing.assert_array_equal(a, b)


def test_grad_camera_finite():
    """Camera gradients must be finite and well-defined. In a purely
    Lambertian, untextured scene the *detached hemisphere* estimator's
    camera-translation gradient is ≈0 (outgoing radiance is
    view-independent; all pose sensitivity is visibility). The NEE
    estimator (ops/nee) is the one that carries smooth pose gradients —
    see test_grad_nee.py."""
    scene = default_scene()

    def f(pos_z, focal):
        cam = Camera(
            pos=jnp.asarray([0.0, 0.0, pos_z], jnp.float32),
            angle=jnp.zeros(3, jnp.float32),
            focal=focal,
        )
        return _loss_scene(scene, cam, CFG)

    gz, gf = jax.grad(f, argnums=(0, 1))(jnp.float32(-3.0), jnp.float32(2.0))
    assert np.isfinite(float(gz)) and np.isfinite(float(gf))


def test_grad_pluecker_path_consistent():
    """Gradients through the MXU intersection agree with the reference
    intersection's gradients (same math, different fp order)."""
    scene = default_scene()
    cam = Camera.default()

    def loss(a, cfg):
        return _loss_scene(
            scene.__class__(scene.vertices, a, scene.emission), cam, cfg
        )

    g_ref = np.asarray(jax.grad(loss)(scene.albedo, CFG))
    g_plk = np.asarray(
        jax.grad(loss)(scene.albedo, CFG.replace(intersect="pluecker"))
    )
    np.testing.assert_allclose(
        g_plk, g_ref, atol=1e-3 * max(np.abs(g_ref).max(), 1e-6)
    )


def test_no_nan_grads_procedural():
    from spath_tpu.scene import procedural_scene

    scene = procedural_scene(200, seed=5)
    cam = Camera.default()
    cfg = CFG.replace(tri_block=64)
    g = jax.grad(
        lambda v: _loss_scene(
            scene.__class__(v, scene.albedo, scene.emission), cam, cfg
        )
    )(scene.vertices)
    assert np.isfinite(np.asarray(g)).all()
