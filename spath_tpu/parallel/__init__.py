"""SPMD scale-out: ray-wavefront sharding over a device mesh.

The reference's only parallelism is intra-host: a std::thread pool over
interleaved 16-pixel chunks (``src/cpu_renderer.cpp:118-170``) and
one-work-item-per-pixel GPU dispatches (``src/cl_renderer.cpp:226``).
Here the same data parallelism is expressed the TPU way: a
``jax.sharding.Mesh`` with a ``rays`` axis, ``shard_map`` over pixel
shards with scene/camera replicated (the reference also replicates scene
buffers per device, ``src/cl_renderer.cpp:211-214``), and XLA
collectives — ``psum`` for scene-parameter gradients in training,
``all_gather`` only to assemble the displayed image.
"""

from spath_tpu.parallel.mesh import default_mesh, make_mesh
from spath_tpu.parallel.shard import (
    render_pt_sharded,
    render_radiance_sharded,
)
from spath_tpu.parallel.shard_fast import (
    render_pt_fast_sharded,
    render_radiance_fast_sharded,
    render_radiance_fastgrad_sharded,
)
from spath_tpu.parallel.ring import nearest_hit_ring

__all__ = [
    "default_mesh",
    "make_mesh",
    "render_pt_sharded",
    "render_radiance_sharded",
    "render_pt_fast_sharded",
    "render_radiance_fast_sharded",
    "render_radiance_fastgrad_sharded",
    "nearest_hit_ring",
]
