"""Image-level conformance: JAX renders vs the NumPy oracle.

BASELINE configs 1-2: flat shading must match exactly (deterministic,
RNG-free — ``src/cpu_renderer.cpp:81-101``); 5-bounce path tracing with
the per-pixel LCG must match allclose at equal seeds/samples
(``src/render.comp:160-227``). Full 640×480 runs live in the benchmark;
tests use reduced resolutions so the suite stays fast.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.flat import render_flat
from spath_tpu.models.pathtracer import render_pt, render_radiance
from spath_tpu.utils import oracle
from spath_tpu.utils.image import to_rgb_u8


def test_flat_matches_oracle_exact(scene7, scene7_np):
    verts, alb, _ = scene7_np
    cfg = RenderConfig(width=160, height=120, spp=1)
    img = np.asarray(render_flat(scene7, Camera.default(), cfg))
    want = oracle.render_flat(160, 120, verts, alb)
    np.testing.assert_array_equal(to_rgb_u8(img), to_rgb_u8(want))


def test_flat_nontrivial(scene7, scene7_np):
    """The flat image actually shows the scene (not all background)."""
    cfg = RenderConfig(width=160, height=120, spp=1)
    img = np.asarray(render_flat(scene7, Camera.default(), cfg))
    u8 = to_rgb_u8(img)
    # red foreground triangle, white wall, black background all present
    assert (u8 == [255, 0, 0]).all(-1).any()
    assert (u8 == [255, 255, 255]).all(-1).any()
    assert (u8 == [0, 0, 0]).all(-1).any()


def test_flat_rotated_camera(scene7, scene7_np):
    verts, alb, _ = scene7_np
    kw = dict(pos=(0.3, 0.1, -2.0), angle=(0.1, -0.2, 0.0), focal=1.5)
    cam = Camera(
        pos=jnp.asarray(kw["pos"], jnp.float32),
        angle=jnp.asarray(kw["angle"], jnp.float32),
        focal=jnp.float32(kw["focal"]),
    )
    cfg = RenderConfig(width=96, height=72, spp=1)
    img = to_rgb_u8(np.asarray(render_flat(scene7, cam, cfg)))
    want = to_rgb_u8(oracle.render_flat(96, 72, verts, alb, camera_kw=kw))
    # rotation trig may differ in final ulp between XLA and NumPy;
    # allow a tiny number of edge pixels to differ
    mismatch = (img != want).any(-1).mean()
    assert mismatch < 0.005, f"{mismatch:.4%} pixels differ"


def test_pt_conformance_matches_oracle(scene7, scene7_np):
    """5-bounce LCG path trace allclose vs the oracle (config 2 scaled)."""
    verts, alb, emi = scene7_np
    cfg = RenderConfig(
        width=64, height=48, spp=8, rng="lcg", sampler="angle",
        intersect="reference",
    )
    img = np.asarray(render_pt(scene7, Camera.default(), cfg))
    want = oracle.render_pt(64, 48, verts, alb, emi, spp=8)
    # Same RNG stream; only sin/cos ulp noise separates the two, but a
    # near-tangent cosine can amplify a single sample. Compare tonemapped.
    u8_img, u8_want = to_rgb_u8(img), to_rgb_u8(want)
    close = (np.abs(u8_img.astype(int) - u8_want.astype(int)) <= 1).all(-1)
    assert close.mean() > 0.995, f"only {close.mean():.4%} pixels within ±1"
    # A handful of pixels take entirely different paths once a 1-ulp
    # sin/cos difference flips a grazing hit; they shift the raw mean a
    # few tenths of a percent at low spp.
    np.testing.assert_allclose(img.mean(), want.mean(), rtol=2e-2)


def test_pt_pluecker_statistically_consistent(scene7):
    """The MXU intersection path yields the same image (same RNG stream,
    same hits — only intersection rounding differs)."""
    cfg = RenderConfig(width=48, height=32, spp=4, rng="lcg",
                       sampler="angle", intersect="reference")
    a = np.asarray(render_pt(scene7, Camera.default(), cfg))
    b = np.asarray(
        render_pt(scene7, Camera.default(), cfg.replace(intersect="pluecker"))
    )
    close = np.abs(a - b) < 2e-2
    assert close.mean() > 0.99


def test_pt_quality_samplers_agree_in_expectation(scene7):
    """Cosine-weighted and solid-angle-uniform sampling are both unbiased
    for the rendering equation, so their renders converge to the same
    radiance. (The reference's angle-uniform sampler with p = 1/(2π) is a
    *biased* estimator — a documented reference quirk — so it is excluded
    from this equality.)"""
    cam = Camera.default()
    base = RenderConfig(width=32, height=24, spp=128, rng="threefry")
    a = np.asarray(render_radiance(scene7, cam,
                                   base.replace(sampler="cosine"), seed=1))
    b = np.asarray(render_radiance(scene7, cam,
                                   base.replace(sampler="uniform"), seed=2))
    # Means over the image must agree to Monte-Carlo tolerance.
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.08)


def test_conformance_estimator_is_biased_bright(scene7):
    """Pin down the reference quirk: the angle-uniform sampler piles
    density near the normal where cosθ (and the 2·cosθ weight) is
    largest, so the conformance estimator over-brightens indirect light
    relative to the unbiased estimators."""
    cam = Camera.default()
    base = RenderConfig(width=32, height=24, spp=128)
    conf = np.asarray(render_radiance(
        scene7, cam, base.replace(rng="lcg", sampler="angle")))
    unbiased = np.asarray(render_radiance(
        scene7, cam, base.replace(rng="threefry", sampler="cosine"), seed=1))
    assert conf.mean() > unbiased.mean()


def test_pt_deterministic(scene7):
    cfg = RenderConfig(width=32, height=24, spp=2)
    a = np.asarray(render_pt(scene7, Camera.default(), cfg))
    b = np.asarray(render_pt(scene7, Camera.default(), cfg))
    np.testing.assert_array_equal(a, b)


def test_pt_seed_changes_image(scene7):
    cfg = RenderConfig(width=32, height=24, spp=2)
    a = np.asarray(render_pt(scene7, Camera.default(), cfg, seed=0))
    b = np.asarray(render_pt(scene7, Camera.default(), cfg, seed=12345))
    assert not np.array_equal(a, b)


def test_compact_render_matches_full(scene7):
    """Stream compaction is exact: per-pixel RNG streams are keyed by
    global pixel id, so dropping dead background pixels changes nothing."""
    from spath_tpu.models.pathtracer import render_radiance_compact

    cfg = RenderConfig(width=64, height=48, spp=4)
    cam = Camera.default()
    want = np.asarray(render_radiance(scene7, cam, cfg, seed=0))
    got = np.asarray(
        render_radiance_compact(scene7, cam, cfg, seed=0, pad_multiple=256)
    )
    # Same streams; only compilation-level trig ulps may differ.
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.01, f"{flipped.mean():.4f} pixels flipped"
    # background must be exactly zero in both
    assert ((want.sum(-1) == 0) == (got.sum(-1) == 0)).mean() > 0.99
