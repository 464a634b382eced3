#!/usr/bin/env python
"""Per-phase budget of the fused SMEM quality kernel at 1080p spp64.

Round-3 target: free-camera (jittable full-launch) quality forward
≥ 4e9 rays/s; measured 3.1e9. This script decomposes the gap into the
estimator's phases by measuring real configs that drop one phase at a
time (every line is the same whole-frame fused launch on the default
7-triangle scene):

  * conformance (lcg+angle)      — 1 sweep/bounce, no tail
  * quality BSDF-only (nee=off)  — 1 sweep/bounce, cosine sampler tail
  * quality NEE no-MIS           — 2 sweeps/bounce + select + NEE tail
  * quality NEE+MIS              — + MIS weight tail

The deltas locate the cost: if (NEE − BSDF-only) accounts for the gap,
the second sweep + tail is the price of the estimator itself and the
roofline decision stands; if the BSDF-only line is already far below
conformance, the cosine sampler/hash tail has slack worth hunting.

Results recorded in docs/PERFORMANCE.md ("quality forward roofline").
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
from spath_tpu.models.pathtracer import render_pt_fast
from spath_tpu.scene import default_scene


def main():
    print("device:", jax.devices()[0])
    scene = default_scene()
    cam = Camera.default()
    base = dict(width=1920, height=1080, spp=64, max_bounces=5,
                intersect="pluecker")
    rays = 1920 * 1080 * 64 * 5
    fwd = jax.jit(render_pt_fast, static_argnames=("cfg",))

    def run(label, cfg):
        def f():
            return float(jnp.sum(fwd(scene, cam, cfg, 1).ravel()[:4]))

        f()
        best = min((lambda t0: (f(), time.perf_counter() - t0))(
            time.perf_counter())[1] for _ in range(3))
        print(f"{label:30s} {best:7.4f}s  {rays / best:.3e} rays/s")
        return rays / best

    run("conformance lcg+angle",
        RenderConfig(rng="lcg", sampler="angle", **base))
    run("quality BSDF-only",
        RenderConfig(rng="hash", sampler="cosine", **base))
    run("quality NEE no-MIS",
        RenderConfig(rng="hash", sampler="cosine", nee=True, **base))
    run("quality NEE+MIS",
        RenderConfig(rng="hash", sampler="cosine", nee=True, mis=True,
                     **base))


if __name__ == "__main__":
    main()
