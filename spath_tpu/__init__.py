"""spath_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference C++/OpenCL/Vulkan renderer spath (Emanem/spath):

  * camera-ray generation (``spath_tpu.camera``, ref ``src/view.h:47-133``)
  * brute-force Möller–Trumbore intersection over the full triangle list
    (``spath_tpu.ops.intersect``, ref ``src/geom.h:197-222``), including a
    matmul/MXU (Plücker) formulation and a tiled Pallas kernel
  * 5-bounce Lambertian wavefront path tracing
    (``spath_tpu.models.pathtracer``, ref ``src/render.comp:160-215``)
  * flat-shaded debug rendering (``spath_tpu.models.flat``,
    ref ``src/cpu_renderer.cpp:81-101``)
  * conformance RNG (the reference's LCG, ref ``src/frand.h:53-63``) and a
    quality threefry mode
  * gradients w.r.t. triangle vertices, per-triangle albedo/emission and
    camera pose via detached sampling
  * multi-chip SPMD sharding of ray wavefronts (``spath_tpu.parallel``)
  * inverse rendering (pose/albedo recovery) with checkpointing
    (``spath_tpu.models.inverse``)

Everything is a pure function over pytrees; hot paths are jitted XLA or
Pallas TPU kernels.
"""

from spath_tpu.config import RenderConfig
from spath_tpu.scene import Scene, default_scene, procedural_scene
from spath_tpu.camera import Camera, generate_rays
from spath_tpu.models.flat import render_flat
from spath_tpu.models.pathtracer import render_pt
from spath_tpu.utils.image import to_rgba_u8, to_rgb_u8

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "Scene",
    "default_scene",
    "procedural_scene",
    "Camera",
    "generate_rays",
    "render_flat",
    "render_pt",
    "to_rgba_u8",
    "to_rgb_u8",
]
