"""CLI and viewer smoke tests (the app-parity layer)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.scene import default_scene
from spath_tpu.viewer import ViewerState, run_viewer

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
)


def _run(*argv):
    return subprocess.run(
        [sys.executable, "-m", "spath_tpu.cli", *argv],
        capture_output=True, text=True, env=ENV, timeout=300,
    )


def test_render_flat_png(tmp_path):
    out = str(tmp_path / "f.png")
    r = _run("render", "--flat", "--size", "64x48", "--backend", "cpu",
             "--out", out)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    assert open(out, "rb").read(4) == b"\x89PNG"


def test_render_pt_ppm(tmp_path):
    out = str(tmp_path / "f.ppm")
    r = _run("render", "--size", "48x32", "--spp", "2", "--backend", "cpu",
             "--out", out)
    assert r.returncode == 0, r.stderr
    assert open(out, "rb").read(2) == b"P6"


def test_render_quality_mode(tmp_path):
    out = str(tmp_path / "q.png")
    r = _run("render", "--size", "48x32", "--spp", "2", "--mode", "quality",
             "--backend", "cpu", "--out", out)
    assert r.returncode == 0, r.stderr


def test_render_native_backend(tmp_path):
    from spath_tpu.utils.native import build

    if not build():
        pytest.skip("no native toolchain")
    out = str(tmp_path / "n.png")
    r = _run("render", "--size", "48x32", "--spp", "2",
             "--backend", "native", "--out", out)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)


def test_render_procedural_scene(tmp_path):
    out = str(tmp_path / "p.png")
    r = _run("render", "--flat", "--scene", "procedural:200",
             "--size", "48x32", "--backend", "cpu", "--out", out)
    assert r.returncode == 0, r.stderr


def test_info():
    r = _run("info")
    assert r.returncode == 0
    assert "jax" in r.stdout


def test_bad_scene_errors():
    r = _run("render", "--scene", "nope")
    assert r.returncode != 0


def test_viewer_state_key_parity(scene7):
    """The reference key bindings mutate camera state identically."""
    cfg = RenderConfig(width=32, height=24, spp=2)
    st = ViewerState(scene7, Camera.default(), cfg)
    z0 = float(st.camera.pos[2])
    st.move([0.0, 0.0, 0.05])      # 'w'
    assert float(st.camera.pos[2]) == pytest.approx(z0 + 0.05)
    f0 = float(st.camera.focal)
    st.zoom(+1)                    # 'f'
    assert float(st.camera.focal) == pytest.approx(f0 + 0.1)
    st.scale_spp(2.0)              # '+'
    assert st.cfg.spp == 4
    st.scale_spp(0.5)
    st.scale_spp(0.5)
    st.scale_spp(0.5)
    assert st.cfg.spp == 1         # clamped at 1 (src/main.cpp:133)
    st.rotate(10, 0)               # mouse drag
    assert abs(float(st.camera.angle[1])) > 0
    assert not st.path_tracing     # starts flat (src/main.cpp:53)
    st.toggle_pt()
    assert st.path_tracing


def test_viewer_headless_frames(tmp_path, scene7):
    cfg = RenderConfig(width=32, height=24, spp=1)
    rc = run_viewer(scene7, Camera.default(), cfg, frames=2,
                    out_dir=str(tmp_path))
    assert rc == 0
    assert os.path.exists(str(tmp_path / "frame_0001.png"))
