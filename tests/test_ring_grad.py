"""Ring-sharded rendering is DIFFERENTIABLE — round-5 item 1.

``jax.grad`` through ``render_radiance_ring`` (triangles resident only
as ring shards, adjoints ring-reduced back to their owner shards) must
match the replicated wavefront's grads. The forward values are
bit-equal (test_parallel.py), and every per-ray adjoint contribution
uses the same float expressions as the replicated path
(``_dist_from_rows`` mirrors ``intersect._dist_selected``); only the
CROSS-DEVICE accumulation order of the table adjoint differs, so grads
agree to reordered-fp32-summation tolerance, not bit-exactly.

Reference point being extended: the rays×triangles reduction of
``src/render.comp:104-121`` under the SURVEY.md §5 ring decomposition —
now for the backward pass.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.parallel import ring as R
from spath_tpu.parallel.mesh import make_mesh
from spath_tpu.scene import default_scene, procedural_scene

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 fake devices"
)

# small frames + 3 bounces: every test compiles 8-device shard_map
# programs with the ring loop UNROLLED per bounce (plus the adjoint
# ring in the backward) — compile time, not run time, is the budget
CONF_CFG = RenderConfig(width=48, height=32, spp=2, max_bounces=3,
                        rng="lcg", sampler="angle",
                        intersect="reference")
QUAL_CFG = RenderConfig(width=32, height=24, spp=2, max_bounces=3,
                        rng="hash", sampler="cosine",
                        intersect="pluecker", nee=True, mis=True)


def _weight(cfg):
    """Fixed non-uniform weight image so the scalar loss exercises every
    pixel's adjoint differently."""
    n = cfg.width * cfg.height
    w = jnp.cos(jnp.arange(n, dtype=jnp.float32) * 0.37)
    return w.reshape(cfg.height, cfg.width)[..., None]


def _grads(render_fn, scene, cam, cfg, w):
    def loss(s, c):
        return jnp.sum(render_fn(s, c, cfg) * w)

    return jax.grad(loss, argnums=(0, 1))(scene, cam)


def _assert_tree_close(ga, gb, rtol, atol_scale=1e-6):
    la = jax.tree_util.tree_leaves(ga)
    lb = jax.tree_util.tree_leaves(gb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a, b, rtol=rtol,
                                   atol=atol_scale * scale)


def _rays(cam, cfg):
    """Concrete camera rays computed ONCE so ring and replicated paths
    consume bit-identical inputs (each path's own jitted ray generation
    rounds trig a few ulps apart, silently flipping ~0.1% of grazing
    paths — a forward-invisible but gradient-visible divergence)."""
    from spath_tpu.camera import generate_rays

    o, d = jax.jit(generate_rays, static_argnums=(1, 2))(
        cam, cfg.width, cfg.height)
    n = cfg.width * cfg.height
    return jax.device_get(o), jax.device_get(d), jnp.arange(
        n, dtype=jnp.uint32)


@pytest.mark.parametrize("cfg", [CONF_CFG, QUAL_CFG],
                         ids=["conformance", "quality_nee_mis"])
def test_ring_grads_match_replicated(scene7, cfg):
    """Same concrete rays in, grads out: ring-sharded adjoints ==
    replicated wavefront adjoints to summation-order tolerance."""
    from spath_tpu.models.pathtracer import trace_mean_radiance

    mesh = make_mesh(8, axis="shard")
    cam = Camera.default()
    o, d, pids = _rays(cam, cfg)
    w = _weight(cfg).reshape(-1, 1)

    def ring_loss(s):
        rad = R.ring_radiance_from_rays(s, jnp.asarray(o), jnp.asarray(d),
                                        pids, 0, cfg, mesh, s.n_tris)
        return jnp.sum(rad * w)

    def rep_loss(s):
        rad = trace_mean_radiance(s, jnp.asarray(o), jnp.asarray(d), cfg,
                                  seed=0, pixel_ids=pids)
        return jnp.sum(rad * w)

    vr, gs_r = jax.value_and_grad(ring_loss)(scene7)
    vp, gs_p = jax.value_and_grad(rep_loss)(scene7)
    np.testing.assert_allclose(float(vr), float(vp), rtol=1e-5)
    _assert_tree_close(gs_r, gs_p, rtol=3e-4)
    assert float(jnp.abs(gs_r.albedo).max()) > 0
    assert float(jnp.abs(gs_r.vertices).max()) > 0


def test_ring_grads_lean_mode(scene7, monkeypatch):
    """Gradients agree with the replicated path on the LEAN ring
    gearing (merge=batch=0 — the mesh(1) serving default; forced here
    because the 8-device mesh auto-selects the ICI gearing, which
    ``test_ring_grads_match_replicated`` already covers). The merged
    sweep's pending direct-light deferral and the batched lanes'
    concatenated residuals must not be load-bearing for the custom-VJP
    ring adjoints. ``ring_radiance_from_rays`` traces per call, so the
    env flags take effect without cache clearing."""
    from spath_tpu.models.pathtracer import trace_mean_radiance

    monkeypatch.setenv("SPATH_RING_MERGE", "0")
    monkeypatch.setenv("SPATH_RING_SPP_BATCH", "0")
    cfg = QUAL_CFG
    mesh = make_mesh(8, axis="shard")
    cam = Camera.default()
    o, d, pids = _rays(cam, cfg)
    w = _weight(cfg).reshape(-1, 1)

    def ring_loss(s):
        rad = R.ring_radiance_from_rays(s, jnp.asarray(o), jnp.asarray(d),
                                        pids, 0, cfg, mesh, s.n_tris)
        return jnp.sum(rad * w)

    def rep_loss(s):
        rad = trace_mean_radiance(s, jnp.asarray(o), jnp.asarray(d), cfg,
                                  seed=0, pixel_ids=pids)
        return jnp.sum(rad * w)

    vr, gs_r = jax.value_and_grad(ring_loss)(scene7)
    vp, gs_p = jax.value_and_grad(rep_loss)(scene7)
    np.testing.assert_allclose(float(vr), float(vp), rtol=1e-5)
    _assert_tree_close(gs_r, gs_p, rtol=3e-4)
    assert float(jnp.abs(gs_r.albedo).max()) > 0
    assert float(jnp.abs(gs_r.vertices).max()) > 0


def test_ring_grads_match_replicated_procedural():
    """Many-triangle scene: every device owns a real shard (96 tris / 8
    devices), adjoints cross shard boundaries."""
    from spath_tpu.models.pathtracer import trace_mean_radiance

    scene = procedural_scene(96, seed=3)
    mesh = make_mesh(8, axis="shard")
    cam = Camera.default()
    cfg = QUAL_CFG
    o, d, pids = _rays(cam, cfg)
    w = _weight(cfg).reshape(-1, 1)

    def ring_loss(s):
        rad = R.ring_radiance_from_rays(s, jnp.asarray(o), jnp.asarray(d),
                                        pids, 0, cfg, mesh, s.n_tris)
        return jnp.sum(rad * w)

    def rep_loss(s):
        rad = trace_mean_radiance(s, jnp.asarray(o), jnp.asarray(d), cfg,
                                  seed=0, pixel_ids=pids)
        return jnp.sum(rad * w)

    gs_r = jax.grad(ring_loss)(scene)
    gs_p = jax.grad(rep_loss)(scene)
    _assert_tree_close(gs_r, gs_p, rtol=5e-4)


def test_ring_grads_shard_invariant(scene7):
    """Full-pipeline (camera included) grads on an 8-device ring == a
    2-device ring: the sharded adjoint machinery is invariant to the
    shard count (per-lane contributions bit-equal; only cross-device
    accumulation order differs)."""
    cam = Camera.default()
    cfg = QUAL_CFG.replace(width=24, height=16)
    w = _weight(cfg)

    def loss(mesh):
        def f(s, c):
            img = R.render_radiance_ring(s, c, cfg, mesh)
            return jnp.sum(img * w)

        return f

    g8 = jax.grad(loss(make_mesh(8, axis="shard")), argnums=(0, 1))(
        scene7, cam)
    g2 = jax.grad(loss(make_mesh(2, axis="shard")), argnums=(0, 1))(
        scene7, cam)
    _assert_tree_close(g8[0], g2[0], rtol=1e-4)
    _assert_tree_close(g8[1], g2[1], rtol=1e-4)
    assert float(jnp.abs(g8[1].pos).max()) > 0


def test_ring_primitive_vjp_matches_autodiff():
    """The custom VJP of the fused sweep+rows primitive == plain
    autodiff of its impl (which unrolls ppermutes) on the same shards —
    the O(N)-residual backward is exact, not approximate."""
    rng = np.random.default_rng(7)
    mesh = make_mesh(8, axis="shard")
    n_tris, n_rays = 64, 64
    cfg = RenderConfig(intersect="reference")
    table = rng.standard_normal((n_tris, 15)).astype(np.float32)
    # put triangles in front of the rays so some lanes hit
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 2] = -3.0
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    src = np.full(n_rays, -1, np.int32)
    gw = rng.standard_normal((n_rays, 15)).astype(np.float32)
    gd_w = rng.standard_normal(n_rays).astype(np.float32)

    def make_loss(fn):
        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P("shard"), P("shard"), P("shard"),
                           P("shard"), P("shard"), P("shard")),
                 out_specs=P(), check_vma=False)
        def loss(tbl, o, d, src, gw, gd_w):
            dist, idx, rows = fn(o, d, tbl, src, cfg, "shard")
            val = jnp.sum(rows * gw) + jnp.sum(
                jnp.where(idx >= 0, dist, 0.0) * gd_w)
            return jax.lax.psum(val, "shard")

        return loss

    args = (table, o, d, src, gw, gd_w)
    g_custom = jax.grad(lambda t: make_loss(R.nearest_hit_ring_rows)(
        t, *args[1:]))(table)
    g_auto = jax.grad(lambda t: make_loss(R._ring_rows_impl)(
        t, *args[1:]))(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-6)


def test_ring_train_step_optimizes(scene7):
    """Scenes resident only as ring shards can be OPTIMIZED: gradient
    descent on the albedo of a perturbed scene drives the loss against
    the original render down.

    Appearance-only on purpose: the conformance scene's co-planar quads
    share edges, so ANY vertex motion discretely flips the edge-tie
    pixels and the tiny 384-pixel loss jumps (measured: loss rises for
    lr down to 1e-3 when all leaves step). The vertex-gradient
    correctness itself is pinned against the replicated path above;
    ``ring_train_step`` (all leaves) is exercised for finiteness in
    ``__graft_entry__.dryrun_multichip``."""
    import dataclasses

    mesh = make_mesh(8, axis="shard")
    cam = Camera.default()
    cfg = CONF_CFG.replace(width=32, height=24)
    target = R.render_radiance_ring(scene7, cam, cfg, mesh)

    def loss_fn(alb):
        s = dataclasses.replace(scene7, albedo=alb)
        img = R.render_radiance_ring(s, cam, cfg, mesh)
        return jnp.mean((img - target) ** 2)

    alb = jnp.clip(scene7.albedo + 0.25, 0.0, 1.0)
    vg = jax.value_and_grad(loss_fn)
    losses = []
    # lr sized to the measured trajectory (loss decays ~8%/step at
    # lr=2 on this tiny frame): lr=8 → ~28%/step
    for _ in range(5):
        loss, g = vg(alb)
        alb = alb - 8.0 * g
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0]
