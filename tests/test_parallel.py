"""SPMD sharding on a fake 8-device CPU mesh (SURVEY.md §4d).

The driver's separate dry-run validates multi-chip compile; these tests
validate *semantics*: sharded output must equal single-device output
bit-for-bit (the RNG is keyed by global pixel id, so the wavefront can
be split arbitrarily)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.flat import render_flat
from spath_tpu.models.pathtracer import render_pt, render_radiance
from spath_tpu.parallel import (
    make_mesh,
    render_pt_sharded,
    render_radiance_sharded,
)
from spath_tpu.parallel.mesh import make_mesh_2d
from spath_tpu.parallel.ring import render_flat_ring


def _assert_images_match(got, want, max_flip_frac=0.0):
    """Same RNG streams, but different compilations (partitioned vs not)
    round trig a few ulps apart, so pixels agree either bitwise or to
    float32 noise. At the FIXED sizes/seeds used here no grazing path
    flips between the two compilations (measured: max |diff| ≲ 2e-7,
    zero flips), so the default bound is strict — any real sharding bug
    (wrong RNG stream, misrouted shard, dropped pixels) produces O(1)
    differences on many pixels and fails immediately.

    ``max_flip_frac``: a few resolutions put camera rays exactly on
    silhouette edges; those pixels' FIRST hit differs between the two
    compilations by construction (1-ulp intersection differences),
    independent of seed. Tests at such sizes pass a small explicit
    budget; every non-flipped pixel must still be ulp-tight."""
    exact = (got == want).all(-1)
    assert exact.mean() > 0.6, f"only {exact.mean():.3f} pixels exact"
    if max_flip_frac == 0.0:
        np.testing.assert_allclose(got, want, atol=1e-6)
    else:
        flipped = (np.abs(got - want) > 1e-6).any(-1)
        assert flipped.mean() <= max_flip_frac, (
            f"{flipped.mean():.4f} pixels flipped")
        ok = ~flipped
        np.testing.assert_allclose(got[ok], want[ok], atol=1e-6)


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8, (
        "conftest must force an 8-device CPU platform"
    )


@pytest.mark.parametrize("rng,sampler,nee", [
    ("lcg", "angle", False),
    ("threefry", "cosine", True),
])
def test_sharded_matches_single_device(scene7, rng, sampler, nee):
    cfg = RenderConfig(width=40, height=24, spp=4, rng=rng, sampler=sampler,
                       nee=nee)
    cam = Camera.default()
    mesh = make_mesh(8)
    want = np.asarray(render_pt(scene7, cam, cfg, seed=0))
    got = np.asarray(render_pt_sharded(scene7, cam, cfg, seed=0, mesh=mesh))
    _assert_images_match(got, want)


def test_sharded_with_ragged_pixel_count(scene7):
    """41×23 pixels — not a multiple of 8 — exercises padding."""
    cfg = RenderConfig(width=41, height=23, spp=2)
    cam = Camera.default()
    want = np.asarray(render_radiance(scene7, cam, cfg, seed=0))
    got = np.asarray(
        render_radiance_sharded(scene7, cam, cfg, seed=0, mesh=make_mesh(8))
    )
    # 41×23 puts ~13 camera rays exactly on silhouette edges (measured,
    # seed-independent) — those first hits legitimately differ between
    # the partitioned and unpartitioned compilations.
    _assert_images_match(got, want, max_flip_frac=0.02)


def test_sharded_on_subset_of_devices(scene7):
    cfg = RenderConfig(width=32, height=16, spp=2)
    cam = Camera.default()
    want = np.asarray(render_radiance(scene7, cam, cfg, seed=0))
    for n_dev in (2, 4):
        got = np.asarray(
            render_radiance_sharded(
                scene7, cam, cfg, seed=0, mesh=make_mesh(n_dev)
            )
        )
        # 32×16 has ~3 silhouette-edge camera rays (seed-independent).
        _assert_images_match(got, want, max_flip_frac=0.02)


def test_ring_flat_matches_replicated(scene7):
    """Triangle-ring mode: rays AND triangles sharded, triangle shards
    ppermuted around the ring — must reproduce the replicated result
    exactly (associative min-reduction)."""
    cfg = RenderConfig(width=40, height=24, spp=1)
    cam = Camera.default()
    want = np.asarray(render_flat(scene7, cam, cfg))
    got = np.asarray(
        render_flat_ring(scene7, cam, cfg, make_mesh(8, axis="shard"))
    )
    np.testing.assert_array_equal(got, want)


def test_ring_flat_procedural_scene():
    from spath_tpu.scene import procedural_scene

    scene = procedural_scene(300, seed=2)
    cfg = RenderConfig(width=32, height=24, spp=1, tri_block=64)
    cam = Camera.default()
    want = np.asarray(render_flat(scene, cam, cfg))
    got = np.asarray(
        render_flat_ring(scene, cam, cfg, make_mesh(8, axis="shard"))
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_gradients_match():
    """Gradients through the sharded render equal single-device ones —
    the collective transpose (psum of scene grads) is exact. Uses a
    silhouette-free scene so no grazing path can flip between the two
    compilations (flips would be compilation noise, not a sharding bug)."""
    from tests.test_nee import _wall_and_light_scene

    scene = _wall_and_light_scene()
    cfg = RenderConfig(width=24, height=16, spp=2, rng="threefry",
                       sampler="cosine", nee=True, max_bounces=2)
    cam = Camera.default()
    mesh = make_mesh(8)

    def loss_single(albedo):
        s = scene.__class__(scene.vertices, albedo, scene.emission)
        return jnp.sum(render_radiance(s, cam, cfg, seed=0))

    def loss_sharded(albedo):
        s = scene.__class__(scene.vertices, albedo, scene.emission)
        return jnp.sum(render_radiance_sharded(s, cam, cfg, seed=0, mesh=mesh))

    g1 = np.asarray(jax.grad(loss_single)(scene.albedo))
    g2 = np.asarray(jax.grad(loss_sharded)(scene.albedo))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-5)


def test_scaling_efficiency_machinery(scene7):
    """Smoke-test the BASELINE config-5 scaling harness on the fake CPU
    mesh (the ≥85% claim is a hardware measurement, not asserted here —
    fake devices share host cores)."""
    from spath_tpu.parallel.multihost import scaling_efficiency

    cfg = RenderConfig(width=32, height=16, spp=2)
    eff, t1, tn = scaling_efficiency(scene7, Camera.default(), cfg, 4,
                                     reps=1)
    assert t1 > 0 and tn > 0 and eff > 0


def test_ring_full_path_trace_matches_replicated(scene7):
    """Triangle-sharded PT (intersection + attribute ring) reproduces
    the replicated render — same LCG streams, sharded everything."""
    from spath_tpu.parallel.ring import render_pt_ring

    cfg = RenderConfig(width=40, height=24, spp=2)
    cam = Camera.default()
    want = np.asarray(render_pt(scene7, cam, cfg, seed=0))
    got = np.asarray(
        render_pt_ring(scene7, cam, cfg, make_mesh(8, axis="shard"), seed=0)
    )
    _assert_images_match(got, want)


def test_ring_full_pt_procedural_threefry():
    from spath_tpu.scene import procedural_scene
    from spath_tpu.parallel.ring import render_pt_ring

    scene = procedural_scene(160, seed=4)
    cfg = RenderConfig(width=24, height=16, spp=2, rng="threefry",
                       sampler="cosine", tri_block=64)
    cam = Camera.default()
    want = np.asarray(render_pt(scene, cam, cfg, seed=1))
    got = np.asarray(
        render_pt_ring(scene, cam, cfg, make_mesh(8, axis="shard"), seed=1)
    )
    _assert_images_match(got, want)


@pytest.mark.parametrize("mis,rr", [(False, 0), (True, 0), (True, 2)])
def test_ring_nee_matches_replicated(scene7, mis, rr):
    """Ring-mode QUALITY estimator: NEE light tables (prob/cdf columns),
    shadow rays, MIS, and Russian roulette all ring-sharded — must
    reproduce the replicated wavefront draw-for-draw (hash streams are
    keyed by global pixel id; the stored cdf is the exact global
    cumsum, so light selection counts decompose exactly)."""
    from spath_tpu.parallel.ring import render_pt_ring

    cfg = RenderConfig(width=40, height=24, spp=2, rng="hash",
                       sampler="cosine", nee=True, mis=mis, rr_start=rr)
    cam = Camera.default()
    want = np.asarray(render_pt(scene7, cam, cfg, seed=0))
    got = np.asarray(
        render_pt_ring(scene7, cam, cfg, make_mesh(8, axis="shard"), seed=0)
    )
    # Round 4 moved the ring's ray generation inside its jitted frame
    # program (a 10-27x wall-clock win on the remote-TPU path); its
    # compiled trig rounds a few ulps from the replicated path's, which
    # flips a handful of grazing paths at this size (measured 0.1%).
    _assert_images_match(got, want, max_flip_frac=0.01)


@pytest.mark.parametrize("merge,batch", [("0", "0"), ("1", "0"),
                                         ("0", "1"), ("1", "1")])
def test_ring_nee_mode_combos_match_replicated(scene7, monkeypatch,
                                               merge, batch):
    """All four ring execution modes agree with the replicated path:
    the round-5 ICI gearings — the MERGED shadow sweep (bounce b's
    occlusion rides bounce b+1's fused sweep+select: ~1 table rotation
    per NEE bounce instead of 2, with the direct-light term pending
    until its occlusion index returns) and spp-BATCHED lanes (one trace
    over spp·N lanes: one rotation per bounce serves every sample) —
    are bit-stable per-lane restructurings, forced on/off here via
    SPATH_RING_MERGE / SPATH_RING_SPP_BATCH (their auto default keys on
    n_shards > 1). The jit caches key on cfg, not env, so each combo
    clears the frame-program cache."""
    from spath_tpu.parallel import ring as RG

    monkeypatch.setenv("SPATH_RING_MERGE", merge)
    monkeypatch.setenv("SPATH_RING_SPP_BATCH", batch)
    RG._render_pt_ring_jit.clear_cache()
    cfg = RenderConfig(width=40, height=24, spp=2, rng="hash",
                       sampler="cosine", nee=True, mis=True, rr_start=2)
    cam = Camera.default()
    want = np.asarray(render_pt(scene7, cam, cfg, seed=0))
    got = np.asarray(RG.render_pt_ring(
        scene7, cam, cfg, make_mesh(8, axis="shard"), seed=0))
    RG._render_pt_ring_jit.clear_cache()
    _assert_images_match(got, want, max_flip_frac=0.01)


def test_ring_with_pallas_intersection():
    """Ring mode x MXU: the per-shard sweep through the K-packed Pallas
    kernel (``cfg.intersect='pallas'``) — long-context mode no longer
    locked to the XLA intersection (round-3; requires check_vma=False
    on the ring shard_maps since pallas_call outputs carry no vma).

    2-device mesh: each interpret-mode Pallas sweep pads to a full
    1024x1024 tile and runs for seconds on the 2 host cores; with 8
    virtual devices the shards drift past XLA-CPU's hard 40 s collective
    rendezvous timeout and the process aborts. Two symmetric shards stay
    in lockstep. (Real-TPU sweeps are microseconds — not a TPU issue.)
    """
    from jax.experimental.pallas import tpu as pltpu

    from spath_tpu.parallel.ring import render_flat_ring, render_pt_ring
    from spath_tpu.scene import procedural_scene

    scene = procedural_scene(512, seed=0, emissive_fraction=0.1)
    cfg = RenderConfig(width=32, height=16, spp=1, max_bounces=2,
                       rng="hash", sampler="cosine", nee=True,
                       intersect="pallas")
    cam = Camera.default()
    mesh = make_mesh(2, axis="shard")
    with pltpu.force_tpu_interpret_mode():
        flat = np.asarray(render_flat_ring(scene, cam, cfg, mesh))
        from spath_tpu.models.flat import render_flat

        flat_ref = np.asarray(render_flat(scene, cam, cfg))
        pt = np.asarray(render_pt_ring(scene, cam, cfg, mesh, 0))
        want = np.asarray(render_pt(scene, cam, cfg, seed=0))
    assert (flat != flat_ref).any(-1).mean() < 0.02
    _assert_images_match(pt, want)


def test_ring_nee_procedural_multi_light():
    """Many lights spread across different ring shards: selection must
    pick lights owned by remote shards correctly."""
    from spath_tpu.scene import Scene, procedural_scene
    from spath_tpu.parallel.ring import render_pt_ring

    base = procedural_scene(96, seed=7)
    emission = np.asarray(base.emission).copy()
    for t, e in [(5, (4.0, 3.0, 2.0)), (40, (1.0, 5.0, 1.0)),
                 (77, (2.0, 2.0, 6.0))]:
        emission[t] = e
    scene = Scene(base.vertices, base.albedo, jnp.asarray(emission))
    cfg = RenderConfig(width=24, height=16, spp=2, rng="hash",
                       sampler="cosine", nee=True, mis=True, tri_block=64)
    cam = Camera.default()
    want = np.asarray(render_pt(scene, cam, cfg, seed=2))
    got = np.asarray(
        render_pt_ring(scene, cam, cfg, make_mesh(8, axis="shard"), seed=2)
    )
    _assert_images_match(got, want)
