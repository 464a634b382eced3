"""Pinhole camera and differentiable ray generation.

Semantics of ``view::camera::get_viewport`` (``src/view.h:94-132``):

  * image plane height 1, width = aspect; a pixel's plane position is
    ``(x_max - x_step*i - h_x_step, y_max - y_step*j - h_y_step, 0)`` —
    note x *decreases* with column i and y decreases with row j
    (row 0 = image top), ``src/view.h:109-115``;
  * ray direction = ``unit(plane_pos + (0,0,focal))`` (``src/view.h:114``);
  * then the camera rotation ``rY(rX(·))`` is applied to BOTH the plane
    position and the direction (``src/view.h:125-128``, rotations at
    ``src/view.h:54-68``), and finally the camera position is added to the
    ray origin (``src/view.h:130-131``).

Where the reference regenerates the ray buffer on the host every frame and
uploads it to the device (``src/cl_renderer.cpp:210``,
``src/vk_renderer.cpp:353-356``), here ray generation is a jitted batched
computation that runs *on* the TPU and is differentiable w.r.t. camera
position, Euler angles and focal length — the entry point for camera-pose
gradients in inverse rendering.

Defaults: pos (0,0,-3), angle (0,0,0), focal 2.0 (``src/view.h:76``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Differentiable camera parameters (a pytree).

    Attributes:
      pos: ``(3,)`` world-space position.
      angle: ``(3,)`` Euler angles; only x (pitch) and y (yaw) are used,
        matching the reference (``src/view.h:54-68`` implements rX/rY only).
      focal: scalar focal length.
    """

    pos: jax.Array
    angle: jax.Array
    focal: jax.Array

    @classmethod
    def default(cls) -> "Camera":
        return cls(
            pos=jnp.array([0.0, 0.0, -3.0], jnp.float32),
            angle=jnp.zeros(3, jnp.float32),
            focal=jnp.float32(2.0),
        )

    def rotate(self, v: jax.Array) -> jax.Array:
        """Apply the camera rotation ``rY(rX(v))`` to ``(..., 3)`` vectors.

        ``rel_move`` semantics (``src/view.h:83-85``): pitch about x first,
        then yaw about y.
        """
        cx, sx = jnp.cos(self.angle[0]), jnp.sin(self.angle[0])
        cy, sy = jnp.cos(self.angle[1]), jnp.sin(self.angle[1])
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        # rX (src/view.h:62-68)
        y, z = y * cx - z * sx, y * sx + z * cx
        # rY (src/view.h:54-60)
        x, z = x * cy + z * sy, -x * sy + z * cy
        return jnp.stack([x, y, z], axis=-1)

    def move_relative(self, delta: jax.Array) -> "Camera":
        """Translate by ``delta`` expressed in the camera frame.

        ``basic_renderer::set_delta_mov`` → ``camera::rel_move``
        (``src/basic_renderer.h:37-39``, ``src/view.h:83-85``).
        """
        return dataclasses.replace(self, pos=self.pos + self.rotate(delta))

    def rotate_by(self, delta_angle: jax.Array) -> "Camera":
        return dataclasses.replace(self, angle=self.angle + delta_angle)

    def zoom(self, delta_focal) -> "Camera":
        return dataclasses.replace(self, focal=self.focal + delta_focal)


def generate_rays(camera: Camera, width: int, height: int):
    """Generate the per-pixel ray wavefront.

    Returns ``(origins, directions)`` each of shape ``(height*width, 3)``
    in the reference's row-major pixel order ``i + j*res_x`` with row 0 at
    the image top (``src/view.h:36``, ``src/view.h:109-115``).

    All arithmetic is float32 in the same order as the reference so
    conformance images match.
    """
    # Plane geometry, float32 like the reference's `real` (src/view.h:101-108).
    x_size = jnp.float32(width / height)
    x_max = x_size / 2
    x_step = x_size / jnp.float32(width)
    h_x_step = x_step / 2
    y_max = jnp.float32(0.5)
    y_step = jnp.float32(1.0) / jnp.float32(height)
    h_y_step = y_step / 2

    i = jnp.arange(width, dtype=jnp.float32)
    j = jnp.arange(height, dtype=jnp.float32)
    px = x_max - x_step * i - h_x_step            # (W,) — x decreases with i
    py = y_max - y_step * j - h_y_step            # (H,) — y decreases with j
    px = jnp.broadcast_to(px[None, :], (height, width))
    py = jnp.broadcast_to(py[:, None], (height, width))
    plane = jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)  # (H, W, 3)

    d = plane + jnp.array([0.0, 0.0, 1.0], jnp.float32) * camera.focal
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    origins = camera.rotate(plane) + camera.pos
    directions = camera.rotate(d)
    return origins.reshape(-1, 3), directions.reshape(-1, 3)


def format_viewport(origins, directions, width: int, height: int) -> str:
    """Debug dump of the ray buffer — ``view::viewport::print``
    (``src/view.h:33-43``): per pixel ``[pos](dir)`` rows, row-major."""
    import numpy as np

    o = np.asarray(origins).reshape(height, width, 3)
    d = np.asarray(directions).reshape(height, width, 3)
    lines = []
    for j in range(height):
        cells = [
            "[%g,%g,%g](%g,%g,%g)" % (*o[j, i], *d[j, i])
            for i in range(width)
        ]
        lines.append("\t".join(cells))
    return "\n".join(lines) + "\n"
