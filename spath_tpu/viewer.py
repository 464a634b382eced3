"""Interactive viewer — parity with the reference's GLUT app.

The reference opens a GLUT window, regenerates the ray buffer and
re-renders every frame, and maps keys to camera/sampling mutations
(``src/main.cpp:55-180``). This viewer reproduces those bindings on a
matplotlib window (the portable choice for a JAX host process):

  w/s/a/d   move camera ±z/±x in the camera frame (±0.05,
            ``src/main.cpp:88-107``)
  f/g       focal ±0.1 (``src/main.cpp:109-118``)
  +/-       spp ×2 / ÷2, min 1 (``src/main.cpp:126-136``)
  p         toggle path tracing vs flat debug view (``src/main.cpp:138``)
  r         cycle renderer backend: jax / native
            (``src/main.cpp:120-124`` cycles CPU/OpenCL/Vulkan)
  mouse drag  rotate, 2π·5e-4 rad per pixel (``src/main.cpp:166-180``)
  q/Esc     quit

Headless environments: ``run_viewer(..., frames=N, out_dir=...)``
renders N frames to files instead of opening a window (used by tests).
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.flat import render_flat
from spath_tpu.models.pathtracer import render_pt
from spath_tpu.scene import Scene

MOVE_STEP = 0.05          # src/main.cpp:90
FOCAL_STEP = 0.1          # src/main.cpp:111
ROT_PER_PIXEL = 2.0 * np.pi * 5e-4   # src/main.cpp:169-170


class ViewerState:
    """Mutable interaction state (the analog of namespace gl,
    ``src/main.cpp:39-53``)."""

    def __init__(self, scene: Scene, camera: Camera, cfg: RenderConfig):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.path_tracing = False   # start in flat view (src/main.cpp:53)
        self.backend = "jax"
        self.seed = 0
        self._jit_flat = jax.jit(render_flat, static_argnames=("cfg",))
        self._jit_pt = jax.jit(render_pt, static_argnames=("cfg",))
        self._jits: dict[str, object] = {}

    def _render_with(self, r):
        """Render via backend ``r``, jit-cached per backend name."""
        if not r.jittable:
            return r.render(self.scene, self.camera, self.cfg, self.seed)
        fn = self._jits.get(r.name)
        if fn is None:
            fn = jax.jit(r.render, static_argnames=("cfg",))
            self._jits[r.name] = fn
        return fn(self.scene, self.camera, self.cfg, self.seed)

    # --- key handlers (reference bindings) ---

    def move(self, delta_xyz) -> None:
        self.camera = self.camera.move_relative(
            jnp.asarray(delta_xyz, jnp.float32)
        )

    def rotate(self, dx_px: float, dy_px: float) -> None:
        delta = jnp.asarray(
            [dy_px * ROT_PER_PIXEL, -dx_px * ROT_PER_PIXEL, 0.0], jnp.float32
        )
        self.camera = self.camera.rotate_by(delta)

    def zoom(self, sign: int) -> None:
        self.camera = self.camera.zoom(jnp.float32(sign * FOCAL_STEP))

    def scale_spp(self, factor: float) -> None:
        spp = max(1, int(self.cfg.spp * factor))
        self.cfg = self.cfg.replace(spp=spp)
        print(f"Sample per pixel (PT): {spp}", file=sys.stderr)

    def toggle_pt(self) -> None:
        self.path_tracing = not self.path_tracing

    def cycle_backend(self) -> None:
        """The reference's ``r`` key (``src/main.cpp:120-124``): cycle
        through the renderer REGISTRY (models/renderer.py). "jax" is the
        auto slot — the fastest supported backend per frame."""
        from spath_tpu.models.renderer import available_renderers

        order = ["jax"] + [r.name for r in available_renderers()]
        i = order.index(self.backend) if self.backend in order else 0
        self.backend = order[(i + 1) % len(order)]
        print(f"Current renderer: {self.describe()}", file=sys.stderr)

    def describe(self) -> str:
        kind = "Path Tracing" if self.path_tracing else "Flat"
        if self.backend == "jax":
            return f"JAX (auto) - {kind}"
        from spath_tpu.models.renderer import get_renderer

        return f"{get_renderer(self.backend).describe()} - {kind}"

    # --- frame production ---

    def frame(self) -> np.ndarray:
        from spath_tpu.models.renderer import (
            forward_renderer, get_renderer,
        )

        t = time.perf_counter()
        if not self.path_tracing and self.backend != "native":
            img = np.asarray(
                self._jit_flat(self.scene, self.camera, self.cfg)
            )
        else:
            # auto slot: fastest supported backend for this config
            r = (forward_renderer(self.scene, self.cfg,
                                  require_jittable=False)
                 if self.backend == "jax" else get_renderer(self.backend))
            try:
                if self.path_tracing:
                    img = np.asarray(self._render_with(r))
                else:
                    img = np.asarray(
                        r.render_flat(self.scene, self.camera, self.cfg))
            except ValueError as e:
                # backend can't render this config — fall back like the
                # auto slot rather than crashing the window
                print(f"{r.name}: {e}; falling back", file=sys.stderr)
                img = np.asarray(
                    self._jit_pt(self.scene, self.camera, self.cfg,
                                 self.seed)
                    if self.path_tracing else
                    self._jit_flat(self.scene, self.camera, self.cfg))
        # per-frame wall-clock print, as all reference backends do
        print(f"({time.perf_counter() - t:.1f}s)", file=sys.stderr)
        return np.clip(img, 0.0, 1.0)


def run_viewer(scene, camera, cfg, frames: int | None = None,
               out_dir: str | None = None) -> int:
    """Open the interactive window; or, with ``frames``/``out_dir``,
    render that many frames to files (headless mode)."""
    state = ViewerState(scene, camera, cfg)

    if frames is not None:
        from spath_tpu.utils.image import write_png

        for i in range(frames):
            img = state.frame()
            if out_dir:
                write_png(f"{out_dir}/frame_{i:04d}.png", img)
        return 0

    import matplotlib

    try:
        matplotlib.use("TkAgg")
    except Exception:  # noqa: BLE001 — fall through to default backend
        pass
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    fig.canvas.manager.set_window_title("spath_tpu")
    im = ax.imshow(state.frame())
    ax.set_axis_off()
    drag = {"x": None, "y": None}

    def redraw():
        im.set_data(state.frame())
        fig.canvas.draw_idle()

    def on_key(event):
        k = event.key
        if k == "w":
            state.move([0.0, 0.0, MOVE_STEP])
        elif k == "s":
            state.move([0.0, 0.0, -MOVE_STEP])
        elif k == "a":
            state.move([MOVE_STEP, 0.0, 0.0])
        elif k == "d":
            state.move([-MOVE_STEP, 0.0, 0.0])
        elif k == "f":
            state.zoom(+1)
        elif k == "g":
            state.zoom(-1)
        elif k == "+":
            state.scale_spp(2.0)
        elif k == "-":
            state.scale_spp(0.5)
        elif k == "p":
            state.toggle_pt()
        elif k == "r":
            state.cycle_backend()
        elif k in ("q", "escape"):
            plt.close(fig)
            return
        else:
            return
        redraw()

    def on_press(event):
        drag["x"], drag["y"] = event.x, event.y

    def on_motion(event):
        if event.button == 1 and drag["x"] is not None:
            state.rotate(event.x - drag["x"], event.y - drag["y"])
            drag["x"], drag["y"] = event.x, event.y
            redraw()

    fig.canvas.mpl_connect("key_press_event", on_key)
    fig.canvas.mpl_connect("button_press_event", on_press)
    fig.canvas.mpl_connect("motion_notify_event", on_motion)
    print(f"Current renderer: {state.describe()}", file=sys.stderr)
    plt.show()
    return 0
