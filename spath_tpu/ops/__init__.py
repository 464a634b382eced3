"""Compute ops: intersection, sampling, RNG, tonemap, and Pallas kernels."""

from spath_tpu.ops.intersect import nearest_hit
from spath_tpu.ops.rng import lcg_next, lcg_uniform
from spath_tpu.ops.sampling import hemisphere_sample

__all__ = ["nearest_hit", "lcg_next", "lcg_uniform", "hemisphere_sample"]
