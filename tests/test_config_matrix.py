"""Configuration-matrix sweep: every (rng, sampler, intersect, nee)
combination the config space admits must render finite, sane images.
Catches gaps between features that were each tested only in their home
configuration."""

import itertools

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_pt

RNGS = ["lcg", "threefry"]
SAMPLERS = ["angle", "cosine", "uniform"]
INTERSECTS = ["reference", "pluecker", "pallas"]
NEES = [False, True]


def _valid(rng, sampler, nee):
    return not (nee and rng == "lcg")


@pytest.mark.parametrize(
    "rng,sampler,intersect,nee",
    [
        c for c in itertools.product(RNGS, SAMPLERS, INTERSECTS, NEES)
        if _valid(c[0], c[1], c[3])
    ],
)
def test_combo_renders(scene7, rng, sampler, intersect, nee):
    cfg = RenderConfig(
        width=16, height=12, spp=2, rng=rng, sampler=sampler,
        intersect=intersect, nee=nee,
    )
    ctx = (
        pltpu.force_tpu_interpret_mode()
        if intersect == "pallas"
        else _null_ctx()
    )
    with ctx:
        img = np.asarray(render_pt(scene7, Camera.default(), cfg, seed=0))
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.max() > 0.0, "image is all black"


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_invalid_combo_raises(scene7):
    with pytest.raises(ValueError):
        render_pt(
            scene7, Camera.default(),
            RenderConfig(width=8, height=8, spp=1, rng="lcg", nee=True),
        )
