"""Sharded rendering: pixels across the ``rays`` mesh axis.

``shard_map`` wraps ``trace_mean_radiance`` — the shard-invariant core
whose RNG is keyed by *global* pixel id — so the sharded image is
bit-identical to the single-device one in both LCG and threefry modes.
Scene, camera and config are replicated (as the reference replicates its
triangle/material buffers per device, ``src/cl_renderer.cpp:211-214``);
each device traces only its pixel shard. The only cross-device traffic
in the forward pass is the implicit all-gather of the final image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spath_tpu.camera import Camera, generate_rays
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import trace_mean_radiance
from spath_tpu.scene import Scene


def pad_to_multiple(x: jax.Array, m: int, axis: int = 0):
    """Pad axis 0 up to a multiple of m. Returns (padded, original_len)."""
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


def render_radiance_sharded(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    seed=0,
    mesh: Mesh | None = None,
) -> jax.Array:
    """Sharded ``render_radiance``: identical output, N-device execution.

    Rays are padded to a multiple of the mesh size and scattered over the
    ``rays`` axis; padded lanes trace harmlessly (their radiance is
    dropped on reshape).
    """
    if mesh is None:
        from spath_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
    n_dev = mesh.devices.size

    origins, directions = generate_rays(camera, cfg.width, cfg.height)
    n = origins.shape[0]
    pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    origins, _ = pad_to_multiple(origins, n_dev)
    directions, _ = pad_to_multiple(directions, n_dev)
    pixel_ids, _ = pad_to_multiple(pixel_ids, n_dev)

    # shard_map must run under jit — eagerly it dispatches per-op across
    # all devices and is pathologically slow.
    mean = _sharded_trace_jit(
        scene, origins, directions, pixel_ids,
        jnp.asarray(seed) if not isinstance(seed, jax.Array) else seed,
        cfg, mesh,
    )
    return mean[:n].reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _sharded_trace_jit(scene, origins, directions, pixel_ids, seed, cfg, mesh):
    shard_trace = jax.shard_map(
        partial(_trace_shard, cfg=cfg),
        mesh=mesh,
        in_specs=(P(), P("rays"), P("rays"), P("rays"), P()),
        out_specs=P("rays"),
    )
    return shard_trace(scene, origins, directions, pixel_ids, seed)


def _trace_shard(scene, origins, directions, pixel_ids, seed, *, cfg):
    return trace_mean_radiance(
        scene, origins, directions, cfg, seed, pixel_ids
    )


def render_pt_sharded(scene, camera, cfg, seed=0, mesh=None):
    """Sharded full frame with the reference clamp."""
    return jnp.clip(
        render_radiance_sharded(scene, camera, cfg, seed, mesh), 0.0, 1.0
    )


def sharded_ray_specs(mesh: Mesh):
    """NamedShardings for (rays-sharded, replicated) placement — for
    callers managing their own jit in/out shardings."""
    return NamedSharding(mesh, P("rays")), NamedSharding(mesh, P())
