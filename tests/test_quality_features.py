"""Quality features beyond reference parity: scene IO (OBJ/PLY),
tonemap operators, Russian roulette, stratified sampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.flat import render_flat
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.scene import default_scene
from spath_tpu.scene_io import (
    load_scene, loads_obj, loads_ply, save_obj, load_obj,
)
from spath_tpu.utils.image import TONEMAP_MODES, tonemap

OBJ_TEXT = """
# a quad (fan-triangulated) and one extra triangle, negative indices
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 2 0 0
f 1 2 3 4
f -3 -2 -1
"""


def test_obj_fan_triangulation_and_negative_indices():
    s = loads_obj(OBJ_TEXT)
    assert s.n_tris == 3              # quad -> 2 tris, plus 1
    v = np.asarray(s.vertices)
    np.testing.assert_array_equal(v[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    np.testing.assert_array_equal(v[1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])
    np.testing.assert_array_equal(v[2], [[1, 1, 0], [0, 1, 0], [2, 0, 0]])


def test_obj_roundtrip_with_materials(tmp_path):
    scene = default_scene()
    path = str(tmp_path / "scene.obj")
    save_obj(scene, path)
    back = load_obj(path)
    assert back.n_tris == scene.n_tris
    np.testing.assert_allclose(
        np.asarray(back.vertices), np.asarray(scene.vertices), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.albedo), np.asarray(scene.albedo), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(back.emission), np.asarray(scene.emission), atol=1e-5)
    # the loader dispatches by extension too
    assert load_scene(path).n_tris == scene.n_tris


def test_obj_scene_renders(tmp_path):
    scene = default_scene()
    path = str(tmp_path / "scene.obj")
    save_obj(scene, path)
    back = load_obj(path)
    cfg = RenderConfig(width=32, height=24, spp=1)
    a = np.asarray(render_flat(scene, Camera.default(), cfg))
    b = np.asarray(render_flat(back, Camera.default(), cfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


PLY_TEXT = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
property uchar red
property uchar green
property uchar blue
end_header
0 0 0
1 0 0
1 1 0
0 1 0
3 0 1 2 255 0 0
3 0 2 3 0 255 0
"""


def test_ply_with_face_colors():
    s = loads_ply(PLY_TEXT)
    assert s.n_tris == 2
    np.testing.assert_allclose(np.asarray(s.albedo),
                               [[1, 0, 0], [0, 1, 0]], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s.emission), 0.0)


PLY_EXTRA_ELEM = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element edge 2
property int vertex1
property int vertex2
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
0 1
1 2
3 0 1 2
"""


def test_ply_extra_elements_skipped():
    """Elements other than vertex/face (here: edge) are skipped in
    header order rather than misparsed as face rows."""
    s = loads_ply(PLY_EXTRA_ELEM)
    assert s.n_tris == 1
    np.testing.assert_allclose(
        np.asarray(s.vertices)[0],
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_loaders_reject_garbage():
    with pytest.raises(ValueError):
        loads_obj("v 0 0 0\n")            # no faces
    with pytest.raises(ValueError):
        loads_obj("v 0 0 0\nf 1 2 3\n")   # index out of range
    with pytest.raises(ValueError):
        loads_ply("not a ply")


def test_tonemap_modes():
    x = np.asarray([0.0, 0.25, 1.0, 8.0], np.float32)
    for mode in TONEMAP_MODES:
        y = tonemap(x, mode)
        assert y.min() >= 0.0 and y.max() <= 1.0
        assert np.all(np.diff(y) >= -1e-6), f"{mode} not monotone"
    np.testing.assert_array_equal(tonemap(x, "clamp"),
                                  np.clip(x, 0.0, 1.0))
    np.testing.assert_allclose(tonemap(x, "reinhard"), x / (1 + x))
    with pytest.raises(ValueError):
        tonemap(x, "nope")


def test_russian_roulette_unbiased(scene7):
    # Dim the albedos so survival probability q = max(throughput) < 1
    # actually bites (the default scene's albedos have a 1.0 component,
    # making q = 1 -> RR correctly never fires there).
    scene = scene7.__class__(scene7.vertices, scene7.albedo * 0.6,
                             scene7.emission)
    cam = Camera.default()
    base = RenderConfig(width=32, height=24, spp=96, max_bounces=5,
                        rng="threefry", sampler="cosine",
                        intersect="pluecker")
    ref = np.asarray(render_radiance(scene, cam, base, 0))
    rr = np.asarray(render_radiance(
        scene, cam, base.replace(rr_start=2), 0))
    # Unbiased: frame means agree within Monte-Carlo noise.
    assert abs(rr.mean() - ref.mean()) < 0.04 * max(ref.mean(), 1e-6), (
        rr.mean(), ref.mean())
    # And the roulette actually fired: per-pixel values differ.
    assert np.abs(rr - ref).max() > 1e-4


def test_russian_roulette_requires_threefry(scene7):
    cfg = RenderConfig(rng="lcg", rr_start=2, width=8, height=8, spp=1)
    with pytest.raises(ValueError):
        render_radiance(scene7, Camera.default(), cfg, 0)


def test_stratified_sampling_reduces_variance(scene7):
    cam = Camera.default()
    base = RenderConfig(width=24, height=16, spp=8, max_bounces=3,
                        rng="threefry", sampler="cosine",
                        intersect="pluecker")
    strat = base.replace(stratify=True)

    def frames(cfg, seeds):
        return np.stack([
            np.asarray(render_radiance(scene7, cam, cfg, s)) for s in seeds
        ])

    seeds = list(range(6))
    f_base = frames(base, seeds)
    f_strat = frames(strat, seeds)
    # Same estimator in expectation...
    assert abs(f_strat.mean() - f_base.mean()) < 0.05 * f_base.mean()
    # ...with lower across-seed variance in aggregate.
    v_base = f_base.var(axis=0).mean()
    v_strat = f_strat.var(axis=0).mean()
    assert v_strat < v_base, (v_strat, v_base)
