"""Native C++ runtime: three-way conformance with the NumPy oracle and
the JAX renderer (scalar recursion vs backward accumulation vs forward
throughput — independent formulations of the same semantics)."""

import numpy as np
import pytest

from spath_tpu.utils import oracle
from spath_tpu.utils.image import to_rgb_u8
from spath_tpu.utils.native import (
    build,
    native_available,
    native_render_flat,
    native_render_pt,
)

pytestmark = pytest.mark.skipif(
    not build(), reason="native toolchain unavailable"
)


def test_native_loads():
    assert native_available()


def test_native_flat_matches_oracle(scene7_np):
    verts, alb, _ = scene7_np
    got = native_render_flat(160, 120, verts, alb)
    want = oracle.render_flat(160, 120, verts, alb)
    np.testing.assert_array_equal(to_rgb_u8(got), to_rgb_u8(want))


def test_native_flat_rotated_camera(scene7_np):
    verts, alb, _ = scene7_np
    kw = dict(pos=(0.3, 0.1, -2.0), angle=(0.1, -0.2, 0.0), focal=1.5)
    got = to_rgb_u8(native_render_flat(96, 72, verts, alb, camera_kw=kw))
    want = to_rgb_u8(oracle.render_flat(96, 72, verts, alb, camera_kw=kw))
    mismatch = (got != want).any(-1).mean()
    assert mismatch < 0.005, f"{mismatch:.4%} pixels differ"


def test_native_pt_matches_oracle(scene7_np):
    """Same LCG streams, same recursion semantics — images agree within
    trig-ulp path-flip noise."""
    verts, alb, emi = scene7_np
    got = native_render_pt(64, 48, verts, alb, emi, spp=8)
    want = oracle.render_pt(64, 48, verts, alb, emi, spp=8)
    u8g, u8w = to_rgb_u8(got), to_rgb_u8(want)
    close = (np.abs(u8g.astype(int) - u8w.astype(int)) <= 1).all(-1)
    assert close.mean() > 0.99, f"only {close.mean():.4%} within ±1"


def test_native_pt_deterministic(scene7_np):
    """Dynamic chunk-stealing must not affect the image (per-pixel
    streams are scheduling-independent, unlike the reference CPU
    renderer's per-thread seeding)."""
    verts, alb, emi = scene7_np
    a = native_render_pt(64, 48, verts, alb, emi, spp=4)
    b = native_render_pt(64, 48, verts, alb, emi, spp=4)
    np.testing.assert_array_equal(a, b)


def test_native_seed_offset(scene7_np):
    verts, alb, emi = scene7_np
    a = native_render_pt(32, 24, verts, alb, emi, spp=2, seed_offset=0)
    b = native_render_pt(32, 24, verts, alb, emi, spp=2, seed_offset=7777)
    assert not np.array_equal(a, b)
