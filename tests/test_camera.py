"""Camera ray generation: JAX vs the NumPy oracle (``src/view.h:94-132``)."""

import numpy as np
import jax.numpy as jnp

from spath_tpu.camera import Camera, generate_rays
from spath_tpu.utils import oracle


def _cam(pos=(0.0, 0.0, -3.0), angle=(0.0, 0.0, 0.0), focal=2.0):
    return Camera(
        pos=jnp.asarray(pos, jnp.float32),
        angle=jnp.asarray(angle, jnp.float32),
        focal=jnp.float32(focal),
    )


def test_default_camera_matches_oracle():
    o, d = generate_rays(_cam(), 64, 48)
    oo, od = oracle.viewport(64, 48)
    np.testing.assert_allclose(np.asarray(o), oo, rtol=0, atol=3e-7)
    np.testing.assert_allclose(np.asarray(d), od, rtol=0, atol=3e-7)


def test_rotated_camera_matches_oracle():
    kw = dict(pos=(0.2, -0.1, -2.5), angle=(0.15, -0.3, 0.0), focal=1.7)
    o, d = generate_rays(_cam(**kw), 32, 24)
    oo, od = oracle.viewport(32, 24, **kw)
    np.testing.assert_allclose(np.asarray(o), oo, rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(d), od, rtol=0, atol=2e-6)


def test_ray_layout():
    """Row-major i + j*res_x, row 0 at image top, x decreasing with i
    (``src/view.h:36``, ``src/view.h:111``)."""
    o, _ = generate_rays(_cam(pos=(0, 0, 0), angle=(0, 0, 0)), 4, 2)
    o = np.asarray(o).reshape(2, 4, 3)
    assert o[0, 0, 1] > 0  # top row has +y
    assert o[0, 0, 0] > o[0, 3, 0]  # x decreases with column index
    assert o[0, 0, 1] > o[1, 0, 1]  # y decreases with row index


def test_directions_unit_norm():
    _, d = generate_rays(_cam(), 16, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6
    )


def test_camera_relative_move():
    """``rel_move`` moves in the camera frame (``src/view.h:83-85``):
    with yaw=π/2 a forward (z) move shifts world x."""
    cam = _cam(angle=(0.0, np.pi / 2, 0.0))
    moved = cam.move_relative(jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
    delta = np.asarray(moved.pos) - np.asarray(cam.pos)
    np.testing.assert_allclose(delta, [1.0, 0.0, 0.0], atol=1e-6)
