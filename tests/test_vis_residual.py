"""Visibility-gradient residual: exactness of the additive decomposition.

``render_vis_residual`` claims (models/pathtracer.py):

  * forward value EXACTLY zero for any (scene, camera, cfg);
  * grad(interior) + grad(residual) == grad(wavefront with vis_grad)
    — which lets the interior run on the fused custom-VJP megakernels
    (``VisGradFusedRenderer``) instead of the wavefront autodiff.

The scene is the blocker arrangement from test_grad (floor + area light
+ a blocker between them) so both vis terms are live: the warped-area
emitter factor AND the edge-sampled shadow-boundary term.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import (
    render_radiance,
    render_vis_residual,
)
from spath_tpu.scene import Scene, make_scene


def _blocker_scene():
    verts = np.array([
        [[-20, -1, -20], [20, -1, -20], [0, -1, 40]],
        [[-20, -1, 20], [20, -1, -20], [20, -1, 20]],
        [[-0.5, 0.75, -0.5], [0.5, 0.75, -0.5], [-0.5, 0.75, 0.5]],
        [[0.5, 0.75, 0.5], [0.5, 0.75, -0.5], [-0.5, 0.75, 0.5]],
        [[-0.35, 0.0, -0.25], [0.35, 0.0, -0.25], [0.0, 0.0, 0.45]],
    ], np.float32)
    albedo = np.array(
        [[0.7] * 3, [0.7] * 3, [0] * 3, [0] * 3, [0.3] * 3], np.float32)
    emission = np.array(
        [[0] * 3, [0] * 3, [2] * 3, [2] * 3, [0] * 3], np.float32)
    return make_scene(jnp.asarray(verts), jnp.asarray(albedo),
                      jnp.asarray(emission))


def _cfg(**kw):
    base = dict(width=48, height=32, spp=2, max_bounces=3, rng="hash",
                sampler="cosine", intersect="pluecker", vis_grad=True)
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.parametrize("nee", [True, False])
def test_residual_forward_exactly_zero(nee):
    scene = _blocker_scene()
    cfg = _cfg(nee=nee, mis=nee)
    img = np.asarray(jax.jit(
        render_vis_residual, static_argnames=("cfg",)
    )(scene, Camera.default(), cfg, 1))
    assert img.shape == (cfg.height, cfg.width, 3)
    assert (img == 0.0).all()


def _grads(render_fn, scene, cfg, seed=1):
    cam = Camera.default()

    def loss(v, a):
        s = make_scene(v, a, scene.emission)
        return jnp.mean(render_fn(s, cam, cfg, seed))

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    gv, ga = g(scene.vertices, scene.albedo)
    return np.asarray(gv), np.asarray(ga)


@pytest.mark.parametrize("nee", [True, False])
def test_wavefront_decomposition_exact(nee):
    """interior-grad + residual-grad == total vis_grad wavefront grad.

    All three are wavefront programs over the SAME paths (vis_grad's
    extra draws sit after every existing draw slot, so interior and
    total replay identically); the only fp divergence is the residual's
    O(1) per-hit-triangle distance formula vs the sweep's VJP — ulps."""
    scene = _blocker_scene()
    cfg = _cfg(nee=nee, mis=nee)
    gv_t, ga_t = _grads(render_radiance, scene, cfg)
    gv_i, ga_i = _grads(render_radiance, scene,
                        cfg.replace(vis_grad=False))
    gv_r, ga_r = _grads(render_vis_residual, scene, cfg)
    sv = np.abs(gv_t).max()
    sa = max(np.abs(ga_t).max(), 1e-8)
    assert sv > 0.0
    np.testing.assert_allclose(gv_i + gv_r, gv_t, atol=1e-4 * sv)
    np.testing.assert_allclose(ga_i + ga_r, ga_t, atol=1e-4 * sa)
    # the residual itself must be non-trivial (vis terms are live)
    assert np.abs(gv_r).max() > 1e-3 * sv


def test_fused_composition_matches_wavefront_vis():
    """Quality fused interior VJP + residual == wavefront vis_grad —
    the VisGradFusedRenderer path, kernel run in interpret mode.

    Tolerance is flip-budget style: the fused interior and the
    wavefront interior are different compiled programs whose trig-ulp
    differences can flip a grazing path (measured 7.7e-5 on this scene
    at vertex-grad scale 6.6e-3, 1.9e-4 at albedo scale 5.4e-3, with
    the residual contributing ZERO extra error — the same numbers
    separate the two interiors alone, and the residual's albedo grad is
    exactly 0 by design, hit_albedo being detached inside both vis
    terms). The 5e-2·scale budget still falsifies a wrong decomposition:
    the
    residual itself is ~4e-1 of scale here (asserted non-trivial in
    test_wavefront_decomposition_exact, which pins the decomposition to
    1e-4·scale between SAME-program wavefront pieces)."""
    from spath_tpu.ops.pallas.megakernel_quality_grad import (
        render_radiance_quality_grad,
        supported_grad,
    )

    scene = _blocker_scene()
    cfg = _cfg(nee=True, mis=True, spp=2, max_bounces=2)
    assert supported_grad(scene, cfg.replace(vis_grad=False))

    def fused_total(s, cam, c, seed):
        interior = render_radiance_quality_grad(
            s, cam, c.replace(vis_grad=False), seed)
        return interior + render_vis_residual(s, cam, c, seed)

    gv_t, ga_t = _grads(render_radiance, scene, cfg)
    with pltpu.force_tpu_interpret_mode():
        gv_f, ga_f = _grads(fused_total, scene, cfg)
    sv = np.abs(gv_t).max()
    sa = max(np.abs(ga_t).max(), 1e-8)
    np.testing.assert_allclose(gv_f, gv_t, atol=5e-2 * sv)
    np.testing.assert_allclose(ga_f, ga_t, atol=5e-2 * sa)


def test_fused_composition_large_T():
    """The decomposition at T > 1024: STREAMED quality VJP interior
    (``megakernel_bigscene_quality``) + residual == wavefront vis_grad.
    This is the path ``VisGradFusedRenderer`` routes above the SMEM
    caps (round-4 item: large scene + silhouette gradients). Flip-style
    tolerance as in test_fused_composition_matches_wavefront_vis."""
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        render_radiance_bigscene_quality,
        supported_grad,
    )
    from spath_tpu.scene import procedural_scene

    blocker = _blocker_scene()
    proc = procedural_scene(1152 - 5, seed=3, emissive_fraction=0.01)
    scene = make_scene(
        jnp.concatenate([blocker.vertices, proc.vertices]),
        jnp.concatenate([blocker.albedo, proc.albedo]),
        jnp.concatenate([blocker.emission, proc.emission]),
    )
    assert scene.n_tris > 1024
    cfg = _cfg(nee=True, mis=True, spp=1, max_bounces=2,
               intersect="pallas")
    assert supported_grad(scene, cfg.replace(vis_grad=False))

    def fused_total(s, cam, c, seed):
        interior = render_radiance_bigscene_quality(
            s, cam, c.replace(vis_grad=False), seed)
        return interior + render_vis_residual(s, cam, c, seed)

    with pltpu.force_tpu_interpret_mode():
        gv_t, ga_t = _grads(render_radiance, scene, cfg)
        gv_f, ga_f = _grads(fused_total, scene, cfg)
    sv = np.abs(gv_t).max()
    sa = max(np.abs(ga_t).max(), 1e-8)
    assert sv > 0.0
    np.testing.assert_allclose(gv_f, gv_t, atol=5e-2 * sv)
    np.testing.assert_allclose(ga_f, ga_t, atol=5e-2 * sa)


def test_registry_routes_visgrad(monkeypatch):
    from spath_tpu.models import renderer as R

    monkeypatch.setattr(R, "_on_accel", lambda: True)
    scene = _blocker_scene()
    r = R.grad_renderer(scene, _cfg(nee=True, mis=True))
    assert r.name == "visgrad_fused"
    # without vis_grad a fused custom-VJP path is selected directly:
    # the compacted launch for eager callers, the quality kernel when
    # the caller is being traced (plan build syncs a host scalar)
    r2 = R.grad_renderer(scene, _cfg(nee=True, mis=True,
                                     vis_grad=False))
    assert r2.name == "compact_fused"
    r3 = R.grad_renderer(scene, _cfg(nee=True, mis=True,
                                     vis_grad=False),
                         require_jittable=True)
    assert r3.name == "quality"


def test_hit_replay_composition_above_32k():
    """Round-5 item 4: the hit-replay decomposition at T > 32k — the
    interior forward EXPORTS every (sample, bounce) nearest hit
    (``bigq_rows_hits``) and the residual replays them instead of
    re-running its O(N·T) detached sweeps. Gradients must still equal
    the wavefront's vis_grad (flip-budget tolerance as in the other
    composition tests: the replayed hits come from the K-packed MXU
    sweep, whose reassociation-ulp distances shift only the gradient
    evaluation point — the residual's forward stays exactly zero)."""
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        render_bigscene_quality_with_hits,
        supported_grad,
    )
    from spath_tpu.scene import procedural_scene

    blocker = _blocker_scene()
    proc = procedural_scene(33_000 - 5, seed=3, emissive_fraction=0.002)
    scene = make_scene(
        jnp.concatenate([blocker.vertices, proc.vertices]),
        jnp.concatenate([blocker.albedo, proc.albedo]),
        jnp.concatenate([blocker.emission, proc.emission]),
    )
    assert scene.n_tris > 32768
    cfg = _cfg(nee=True, mis=True, spp=1, max_bounces=2,
               intersect="pallas", width=12, height=8)
    assert supported_grad(scene, cfg.replace(vis_grad=False))

    def fused_total(s, cam, c, seed):
        interior, hits = render_bigscene_quality_with_hits(
            s, cam, c.replace(vis_grad=False), seed)
        return interior + render_vis_residual(s, cam, c, seed,
                                              hits=hits)

    with pltpu.force_tpu_interpret_mode():
        gv_t, ga_t = _grads(render_radiance, scene, cfg)
        gv_f, ga_f = _grads(fused_total, scene, cfg)
    sv = np.abs(gv_t).max()
    sa = max(np.abs(ga_t).max(), 1e-8)
    assert sv > 0.0
    np.testing.assert_allclose(gv_f, gv_t, atol=5e-2 * sv)
    np.testing.assert_allclose(ga_f, ga_t, atol=5e-2 * sa)


def test_hit_replay_residual_forward_zero_and_grads_match():
    """Hit replay == self-computed sweeps at small T: the residual's
    forward is exactly zero and its grads match the no-replay residual
    to the ulp-shift budget (the replayed distances are the K-packed
    sweep's)."""
    from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
        render_bigscene_quality_with_hits,
    )

    scene = _blocker_scene()
    cfg = _cfg(nee=True, mis=True, spp=2, max_bounces=2,
               intersect="pallas")
    cam = Camera.default()
    icfg = cfg.replace(vis_grad=False)

    with pltpu.force_tpu_interpret_mode():
        # seed 1 everywhere: the replayed hits must come from the same
        # streams as the residual walk (_grads renders with seed=1)
        _, hits = render_bigscene_quality_with_hits(scene, cam, icfg, 1)
        img = render_vis_residual(scene, cam, cfg, 1, hits=hits)
        assert float(jnp.abs(img).max()) == 0.0

        def res_replay(s, cam_, c, seed):
            return render_vis_residual(s, cam_, c, seed, hits=hits)

        gv_r, ga_r = _grads(res_replay, scene, cfg)
        gv_n, ga_n = _grads(render_vis_residual, scene, cfg)
    sv = max(np.abs(gv_n).max(), 1e-8)
    assert np.abs(gv_n).max() > 0.0
    np.testing.assert_allclose(gv_r, gv_n, atol=5e-2 * sv)
    # residual albedo grads are exactly zero by design (hit_albedo
    # detached inside both vis terms)
    np.testing.assert_allclose(ga_r, ga_n, atol=1e-6)
