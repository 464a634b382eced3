"""ctypes bindings for the native C++ runtime (native/spath_native.cpp).

The library is built on demand with the checked-in Makefile (no pip
dependencies — plain g++). All functions take/return NumPy arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libspath_native.so")

_F32P = ctypes.POINTER(ctypes.c_float)


def build(force: bool = False) -> bool:
    """Build the shared library with make. Returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            capture_output=True, text=True,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sp_version.restype = ctypes.c_char_p
    lib.sp_render_flat.argtypes = [
        ctypes.c_int, ctypes.c_int, _F32P, _F32P, ctypes.c_int, _F32P, _F32P,
    ]
    lib.sp_render_pt.argtypes = [
        ctypes.c_int, ctypes.c_int, _F32P, _F32P, _F32P, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint32, _F32P, _F32P,
    ]
    lib.sp_render_pt_basic.argtypes = lib.sp_render_pt.argtypes
    return lib


def native_available() -> bool:
    return _lib() is not None


def native_version() -> str:
    lib = _lib()
    return lib.sp_version().decode() if lib else "unavailable"


def _cam_array(camera_kw) -> np.ndarray:
    kw = dict(pos=(0.0, 0.0, -3.0), angle=(0.0, 0.0, 0.0), focal=2.0)
    kw.update(camera_kw or {})
    return np.array(
        [*kw["pos"], *kw["angle"], kw["focal"]], np.float32
    )


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_F32P)


def native_render_flat(width, height, vertices, albedo, camera_kw=None):
    """Flat render via the native runtime → float32 (H, W, 3)."""
    lib = _lib()
    assert lib is not None, "native library unavailable"
    verts = np.ascontiguousarray(vertices, np.float32)
    alb = np.ascontiguousarray(albedo, np.float32)
    cam = _cam_array(camera_kw)
    out = np.empty((height, width, 3), np.float32)
    lib.sp_render_flat(
        width, height, _ptr(verts), _ptr(alb), verts.shape[0], _ptr(cam),
        _ptr(out),
    )
    return out


def native_render_pt(width, height, vertices, albedo, emission, spp,
                     max_bounces=5, seed_offset=0, camera_kw=None):
    """Path-traced render via the native runtime → float32 (H, W, 3)."""
    lib = _lib()
    assert lib is not None, "native library unavailable"
    verts = np.ascontiguousarray(vertices, np.float32)
    alb = np.ascontiguousarray(albedo, np.float32)
    emi = np.ascontiguousarray(emission, np.float32)
    cam = _cam_array(camera_kw)
    out = np.empty((height, width, 3), np.float32)
    lib.sp_render_pt(
        width, height, _ptr(verts), _ptr(alb), _ptr(emi), verts.shape[0],
        spp, max_bounces, seed_offset, _ptr(cam), _ptr(out),
    )
    return out


def native_render_pt_basic(width, height, vertices, albedo, emission, spp,
                           max_bounces=5, srand_seed=1, camera_kw=None):
    """Sequential ``basic_dist`` (std::rand) path trace — the golden for
    the reference's single-threaded ``render_pt`` debug path
    (``src/cpu_renderer.cpp:105-116``). ``srand_seed=1`` is the
    process-default stream the reference consumes. → float32 (H, W, 3).

    NOTE: calls ``srand`` in-process — any other ``rand()`` user in the
    host process sees a reseeded stream afterwards.
    """
    lib = _lib()
    assert lib is not None, "native library unavailable"
    verts = np.ascontiguousarray(vertices, np.float32)
    alb = np.ascontiguousarray(albedo, np.float32)
    emi = np.ascontiguousarray(emission, np.float32)
    cam = _cam_array(camera_kw)
    out = np.empty((height, width, 3), np.float32)
    lib.sp_render_pt_basic(
        width, height, _ptr(verts), _ptr(alb), _ptr(emi), verts.shape[0],
        spp, max_bounces, srand_seed, _ptr(cam), _ptr(out),
    )
    return out
