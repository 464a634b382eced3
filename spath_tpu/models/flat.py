"""Flat-shaded debug renderer.

Semantics of the reference's ``render_test`` (``src/cpu_renderer.cpp:81-101``,
GPU twins ``render_flat`` at ``src/render.cl:129-148`` and
``src/render.comp:124-133``): for each pixel, the nearest triangle's raw
reflectance color, black on miss — deterministic and RNG-free, "a debug
tool" (reference README) to validate camera + intersection before
stochastic path tracing. It plays the same role here: the conformance
tests compare it pixel-exact against the NumPy oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spath_tpu.camera import Camera, generate_rays
from spath_tpu.config import RenderConfig
from spath_tpu.ops.intersect import nearest_hit
from spath_tpu.scene import Scene


def render_flat(scene: Scene, camera: Camera, cfg: RenderConfig) -> jax.Array:
    """Render the flat-shaded debug view. Returns float32 ``(H, W, 3)``."""
    o, d = generate_rays(camera, cfg.width, cfg.height)
    src = jnp.full(o.shape[0], -1, jnp.int32)
    _, idx = nearest_hit(o, d, scene.v0, scene.v1, scene.v2, src, cfg)
    color = jnp.where(
        idx[:, None] >= 0, scene.albedo[jnp.maximum(idx, 0)], jnp.float32(0.0)
    )
    return color.reshape(cfg.height, cfg.width, 3)


render_flat_jit = jax.jit(render_flat, static_argnames=("cfg",))
