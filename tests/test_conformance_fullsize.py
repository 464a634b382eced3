"""Full-size BASELINE configs 1-2 (640×480) — marked slow.

The fast suite runs scaled-down versions; these are the exact sizes
from BASELINE.json, cross-checked against the native C++ oracle
(fast enough at full resolution)."""

import numpy as np
import pytest

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.flat import render_flat
from spath_tpu.models.pathtracer import render_pt
from spath_tpu.utils.image import to_rgb_u8
from spath_tpu.utils.native import build, native_render_flat, native_render_pt

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not build(), reason="native toolchain unavailable"),
]


def test_config1_flat_640x480_exact(scene7, scene7_np):
    verts, alb, _ = scene7_np
    cfg = RenderConfig(width=640, height=480, spp=1)
    img = to_rgb_u8(np.asarray(render_flat(scene7, Camera.default(), cfg)))
    want = to_rgb_u8(native_render_flat(640, 480, verts, alb))
    np.testing.assert_array_equal(img, want)


def test_config2_pt_640x480_16spp(scene7, scene7_np):
    verts, alb, emi = scene7_np
    cfg = RenderConfig(width=640, height=480, spp=16, rng="lcg",
                       sampler="angle", intersect="pluecker")
    img = to_rgb_u8(np.asarray(render_pt(scene7, Camera.default(), cfg)))
    want = to_rgb_u8(native_render_pt(640, 480, verts, alb, emi, spp=16))
    close = (np.abs(img.astype(int) - want.astype(int)) <= 1).all(-1)
    assert close.mean() > 0.995, f"only {close.mean():.4%} within ±1"
