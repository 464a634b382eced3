#!/usr/bin/env python
"""Measure spp-linearity of the streamed kernels at the 100k spec point.

BASELINE config 4's spec point is 1080p x spp64 fwd+bwd at 100k
triangles — ~13 min of device time for the full frame, far past the
remote worker's ~60 s launch-kill bound. The bench therefore runs the
100k stress lines at spp2 and argues the rays/s RATE is spp-independent
(the kernels are compute-bound: O(rays·tris) MXU work per sample, no
per-spp memory growth — the spp loop is a fori_loop over identical
bodies). This script PROVES that argument where VMEM/compile surprises
would appear: it measures the fwd+bwd rate at 100k for spp 2/8/32 on a
1920x135 slice (each launch under the kill bound) and one spp64 run at
1920x54 (the exact spec spp), and prints the rates side by side.

Result recorded in docs/PERFORMANCE.md ("spp-linearity at 100k").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.pathtracer import render_radiance_fastgrad
from spath_tpu.scene import Scene, procedural_scene


def make_bwd(cfg, scene):
    def loss(v, a, cam):
        s = Scene(v, a, scene.emission, light_idx=scene.light_idx)
        return jnp.mean(render_radiance_fastgrad(s, cam, cfg, 0))

    bwd = jax.jit(lambda v, a, c: sum(
        jnp.sum(g) for g in jax.grad(loss, argnums=(0, 1))(v, a, c)))
    return lambda cam: float(bwd(scene.vertices, scene.albedo, cam))


def main():
    print("device:", jax.devices()[0])
    scene = procedural_scene(100_000, seed=0)
    cam = Camera.default()
    rows = []
    for spp, height in ((2, 135), (8, 135), (32, 135), (64, 54)):
        cfg = RenderConfig(width=1920, height=height, spp=spp,
                           max_bounces=5, rng="lcg", sampler="angle",
                           intersect="pluecker")
        b = make_bwd(cfg, scene)
        t0 = time.perf_counter()
        b(cam)
        first = time.perf_counter() - t0
        best = min(
            (lambda: (lambda t: (b(cam), time.perf_counter() - t))(
                time.perf_counter()))()[1]
            for _ in range(2))
        rays = 1920 * height * spp * 5
        rate = rays / best
        rows.append((spp, height, first, best, rate))
        print(f"spp{spp:>3} 1920x{height}: first {first:6.1f}s "
              f"steady {best:7.2f}s -> {rate:.3e} rays/s")
    base = rows[0][-1]
    for spp, height, first, best, rate in rows:
        print(f"spp{spp:>3}: {rate / base * 100:6.1f}% of spp2 rate")


if __name__ == "__main__":
    main()
