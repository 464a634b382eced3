"""Device mesh construction.

Single axis ``rays`` (pure data parallelism over pixels — the analog of
the reference's pixel-chunk scheduling, ``src/cpu_renderer.cpp:149``) and
an optional ``tris`` axis for the ring-sharded triangle mode
(``parallel.ring``) when scenes outgrow replicated HBM.

Multi-host: call ``jax.distributed.initialize()`` before building the
mesh; ``jax.devices()`` then spans all hosts and the same code runs
unchanged — ray shards ride ICI within a host and DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_ray_shards: int, n_tri_shards: int) -> Mesh:
    """2-D ``(rays, tris)`` mesh for ring-sharded triangle buffers."""
    devs = np.array(jax.devices()[: n_ray_shards * n_tri_shards])
    return Mesh(devs.reshape(n_ray_shards, n_tri_shards), ("rays", "tris"))


def default_mesh() -> Mesh:
    return make_mesh()
