"""Fused QUALITY megakernel vs the XLA wavefront in hash-RNG mode.

Both draw identical randoms (counter-based hash streams keyed by global
pixel id), so conformance is flip-budget style like the LCG mode: only
trig-ulp path flips between the two compiled programs may differ.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.ops.pallas.megakernel_quality import (
    render_radiance_quality_megakernel, supported,
)


def _cfg(**kw):
    base = dict(width=48, height=32, spp=3, max_bounces=5,
                rng="hash", sampler="cosine", intersect="pluecker")
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.parametrize("nee,mis,rr,strat", [
    (False, False, 0, False), (True, False, 0, False),
    (True, True, 0, False),
    # in-kernel Russian roulette and first-bounce stratification
    (False, False, 2, False), (True, True, 2, False),
    (True, True, 0, True), (True, True, 1, True),
])
def test_quality_megakernel_matches_wavefront(scene7, nee, mis, rr, strat):
    cfg = _cfg(nee=nee, mis=mis, rr_start=rr, stratify=strat)
    cam = Camera.default()
    jw = jax.jit(render_radiance, static_argnames=("cfg",))
    want = np.asarray(jw(scene7, cam, cfg, 3))
    with pltpu.force_tpu_interpret_mode():
        jk = jax.jit(render_radiance_quality_megakernel,
                     static_argnames=("cfg",))
        got = np.asarray(jk(scene7, cam, cfg, 3))
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.01, (
        f"nee={nee} mis={mis} rr={rr} strat={strat}: "
        f"{flipped.mean():.4f} flipped, "
        f"max diff {np.abs(got - want).max():.4f}")
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=2e-2)


def test_quality_megakernel_hash_conformance_many_tris():
    """fori-loop walk + light selection on a bigger procedural scene."""
    from spath_tpu.ops.pallas.megakernel import UNROLL_TRIS
    from spath_tpu.scene import Scene, procedural_scene

    base = procedural_scene(UNROLL_TRIS + 5, seed=4)
    # make two triangles emissive so NEE has a real light distribution
    emission = np.asarray(base.emission).copy()
    emission[3] = (4.0, 3.0, 2.0)
    emission[7] = (1.0, 1.0, 5.0)
    scene = Scene(base.vertices, base.albedo, jnp.asarray(emission))
    cfg = _cfg(width=32, height=24, spp=2, nee=True, mis=True)
    cam = Camera.default()
    jw = jax.jit(render_radiance, static_argnames=("cfg",))
    want = np.asarray(jw(scene, cam, cfg, 0))
    with pltpu.force_tpu_interpret_mode():
        jk = jax.jit(render_radiance_quality_megakernel,
                     static_argnames=("cfg",))
        got = np.asarray(jk(scene, cam, cfg, 0))
    flipped = (np.abs(got - want) > 1e-4).any(-1)
    assert flipped.mean() < 0.02, f"{flipped.mean():.4f} flipped"


def test_quality_megakernel_guardrails(scene7):
    assert supported(scene7, _cfg())
    assert not supported(scene7, _cfg(rng="threefry"))
    assert not supported(scene7, _cfg(sampler="uniform"))
    # rr/stratify are fused in-kernel
    assert supported(scene7, _cfg(stratify=True))
    assert supported(scene7, _cfg(rr_start=2))
    with pytest.raises(ValueError):
        render_radiance_quality_megakernel(
            scene7, Camera.default(), _cfg(rng="lcg"), 0)
