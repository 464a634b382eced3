#!/usr/bin/env python
"""A/B one ring configuration on the real chip.

Env flags select the path (read at trace time, so each setting must run
in its OWN process — jit caches key on cfg, not env):

  * default — auto: merged shadow sweep + spp-batched lanes only when
    the ring is real (n_shards > 1); on mesh(1) the lean 2-cycle path
  * SPATH_RING_MERGE=1 SPATH_RING_SPP_BATCH=1 — force the ICI-geared
    path on one device (measures its on-chip cost)

Usage: python tools/ring_ab.py [T ...]   (default: 4096 65536)
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
from spath_tpu.parallel.mesh import make_mesh
from spath_tpu.parallel.ring import render_pt_ring, render_radiance_ring
from spath_tpu.scene import Scene, procedural_scene

W, H, SPP = 640, 360, 4


def timeit(label, f, n=3):
    f()
    best = min((lambda t0: (f(), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(n))
    rays = W * H * SPP * 5
    print(f"{label:46s} {best:7.3f}s  {rays / best:.3e} rays/s",
          flush=True)
    return best


def main():
    ts = [int(a) for a in sys.argv[1:]] or [4096, 65536]
    flags = {k: os.environ.get(k) for k in
             ("SPATH_RING_MERGE", "SPATH_RING_SPP_BATCH")}
    print("device:", jax.devices()[0], "flags:", flags)
    cam = Camera.default()
    qcfg = RenderConfig(width=W, height=H, spp=SPP, max_bounces=5,
                        rng="hash", sampler="cosine", nee=True, mis=True,
                        intersect="pallas")
    mesh = make_mesh(1, axis="shard")
    for t in ts:
        scene = procedural_scene(t, seed=0, emissive_fraction=0.01)
        timeit(f"ring {t} fwd quality NEE+MIS",
               lambda s=scene: float(jnp.sum(render_pt_ring(
                   s, cam, qcfg, mesh, 0).ravel()[:4])))

    scene = procedural_scene(4096, seed=0, emissive_fraction=0.01)

    def loss(v, a):
        s = Scene(v, a, scene.emission, light_idx=scene.light_idx)
        return jnp.mean(render_radiance_ring(s, cam, qcfg, mesh, 0))

    g = jax.jit(lambda v, a: sum(
        jnp.sum(x) for x in jax.grad(loss, argnums=(0, 1))(v, a)))
    timeit("ring 4096 fwd+bwd quality NEE+MIS",
           lambda: float(g(scene.vertices, scene.albedo)), n=2)


if __name__ == "__main__":
    main()
