"""Profiling and render observability.

The reference's only instrumentation is a wall-clock printf around the
hot call in each backend (``src/cpu_renderer.cpp:179-180``,
``src/cl_renderer.cpp:228-229``, ``src/vk_renderer.cpp:476``) and a
progress line (``src/cpu_renderer.cpp:172-178``). TPU-native
equivalents:

  * ``FrameTimer`` — the same rays/s accounting (pixels·spp·bounces /
    wall-clock, the BASELINE metric), with the device-sync caveat
    handled (a tiny result is fetched so async dispatch can't lie).
  * ``trace_to`` — wrap any region in a ``jax.profiler`` trace for
    per-kernel timing in XProf/TensorBoard.
  * ``bounce_stats`` — per-bounce live-ray fractions of the wavefront
    (the number stream compaction would reclaim; SURVEY.md §5 metrics).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


class FrameTimer:
    """rays/s accounting over explicit frame marks.

    >>> ft = FrameTimer(cfg)
    >>> with ft.frame():
    ...     img = render(...)  # must synchronize before exiting
    >>> ft.rays_per_s
    """

    def __init__(self, cfg):
        self.n_rays_per_frame = (
            cfg.width * cfg.height * cfg.spp * cfg.max_bounces
        )
        self.times: list[float] = []

    @contextlib.contextmanager
    def frame(self):
        t = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t)

    @property
    def last_s(self) -> float:
        return self.times[-1]

    @property
    def rays_per_s(self) -> float:
        return self.n_rays_per_frame / min(self.times)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """``jax.profiler`` trace of the enclosed region (view in XProf)."""
    with jax.profiler.trace(log_dir):
        yield


def sync(x):
    """Force device completion observably.

    On the remote-TPU path ``block_until_ready`` can return before
    execution finishes; fetching a scalar reduction cannot. Returns x.
    """
    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))
    return x


def bounce_stats(scene, camera, cfg, seed=0):
    """Per-bounce live-ray fractions for one sample of the wavefront.

    Returns a float array of shape ``(max_bounces,)`` — e.g. the default
    scene keeps ~44% of camera rays alive after bounce 1 (the rest hit
    the background). High tail occupancy argues for stream compaction.
    """
    from spath_tpu.camera import generate_rays
    from spath_tpu.models.pathtracer import trace_radiance
    from spath_tpu.ops.rng import pixel_seeds

    origins, dirs = generate_rays(camera, cfg.width, cfg.height)
    if cfg.rng == "lcg":
        state = pixel_seeds(origins.shape[0], seed)
    else:
        state = jax.random.key(seed)

    @jax.jit
    def go(scene, origins, dirs, state):
        _, _, aux = trace_radiance(
            scene, origins, dirs, cfg, state, return_aux=True
        )
        return aux["alive_fraction"]

    return np.asarray(go(scene, origins, dirs, state))
