"""Tonemap and image IO.

Tonemap semantics of ``scene::vec3_RGBA`` (``src/scene.h:32-39``):
clamp to [0,1], scale by 255, add 0.5, truncate to uint8 (i.e.
round-half-up), alpha = 0. The reference's Vulkan backend deviates with
alpha = 255 (``src/vk_renderer.cpp:467``) — we standardize on the CPU/CL
semantics (alpha 0) and expose plain RGB too.

The reference has no image writer at all (frames only go to the GLUT
window, ``src/main.cpp:81``); PPM/PNG writers here provide the offline
equivalent.
"""

from __future__ import annotations

import numpy as np


def to_rgb_u8(img) -> np.ndarray:
    """Float RGB (any shape ending in 3) → uint8 with the reference rounding."""
    img = np.asarray(img, np.float32)
    c = np.clip(img, 0.0, 1.0) * np.float32(255.0) + np.float32(0.5)
    return c.astype(np.uint8)  # truncation == round-half-up after +0.5


def to_rgba_u8(img) -> np.ndarray:
    """Float RGB → uint8 RGBA with alpha 0 (``src/scene.h:38``)."""
    rgb = to_rgb_u8(img)
    alpha = np.zeros(rgb.shape[:-1] + (1,), np.uint8)
    return np.concatenate([rgb, alpha], axis=-1)


def write_ppm(path: str, img) -> None:
    """Write a float or uint8 RGB image as binary PPM (P6)."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_rgb_u8(arr)
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(arr[..., :3].tobytes())


def write_png(path: str, img) -> None:
    """Write a float or uint8 RGB image as PNG (zlib + pure-stdlib encoder)."""
    import struct
    import zlib

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_rgb_u8(arr)
    arr = arr[..., :3]
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# Tonemap operators (beyond-parity: the reference only clamps,
# ``src/scene.h:32-39``). All take UNCLAMPED linear HDR radiance
# (e.g. ``render_radiance``) and return [0, 1] floats.
# ---------------------------------------------------------------------------

TONEMAP_MODES = ("clamp", "reinhard", "aces", "gamma22")


def tonemap(img, mode: str = "clamp", exposure: float = 1.0) -> np.ndarray:
    """Map linear HDR radiance to display [0, 1].

    Modes:
      clamp    — the reference's semantics: clip to [0, 1].
      reinhard — x / (1 + x), global Reinhard.
      aces     — Narkowicz's ACES filmic fit.
      gamma22  — clamp then encode with gamma 1/2.2.
    """
    x = np.asarray(img, np.float32) * np.float32(exposure)
    if mode == "clamp":
        return np.clip(x, 0.0, 1.0)
    if mode == "reinhard":
        return np.clip(x / (1.0 + x), 0.0, 1.0)
    if mode == "aces":
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        return np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)
    if mode == "gamma22":
        return np.clip(x, 0.0, 1.0) ** np.float32(1.0 / 2.2)
    raise ValueError(f"unknown tonemap mode {mode!r}; one of {TONEMAP_MODES}")
