#!/usr/bin/env python
"""On-chip ring-mode profile: where do the cycles go?

Round-3 measurement (docs/PERFORMANCE.md "Ring x MXU"): ring mode at
4096 tris, 640x360 spp4 NEE runs ~1.5-2.0e5 rays/s on one chip — bound
by the per-bounce attribute ring-gathers and the NEE tail, not the
sweep. This script decomposes that claim:

  * end-to-end render_pt_ring: fused (2-cycle), pairwise (3-cycle),
    unfused (5-cycle) — the ring-cycle ablation;
  * primitive timings on the same shapes: index-only sweep, fused
    sweep+rows, row gather alone, light select alone — isolating the
    gather/select overhead the fusion levels share.

Run on the real chip; results recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from spath_tpu.camera import Camera, generate_rays
from spath_tpu.config import RenderConfig
from spath_tpu.parallel.mesh import make_mesh
from spath_tpu.parallel import ring as RG
from spath_tpu.scene import procedural_scene

W, H, SPP, T = 640, 360, 4, 4096


def timeit(label, f, n=3):
    f()
    best = min((lambda t0: (f(), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(n))
    rays = W * H * SPP * 5
    print(f"{label:42s} {best:7.3f}s  {rays / best:.3e} rays/s")
    return best


def main():
    print("device:", jax.devices()[0])
    scene = procedural_scene(T, seed=0, emissive_fraction=0.01)
    cam = Camera.default()
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_bounces=5,
                       rng="hash", sampler="cosine", nee=True, mis=True,
                       intersect="pluecker")
    mesh = make_mesh(1, axis="shard")

    if "--prims" not in sys.argv:
        for env, label in ((None, "ring fused (2-cycle)"),
                           ("SPATH_RING_PAIRWISE",
                            "ring pairwise (3-cycle)"),
                           ("SPATH_RING_UNFUSED",
                            "ring unfused (5-cycle)")):
            os.environ.pop("SPATH_RING_PAIRWISE", None)
            os.environ.pop("SPATH_RING_UNFUSED", None)
            if env:
                os.environ[env] = "1"
            # fetch a value: block_until_ready can lie on the
            # remote-TPU path (see bench.py)
            timeit(label, lambda: float(jnp.sum(
                RG.render_pt_ring(scene, cam, cfg, mesh,
                                  seed=0).ravel()[:4])))
        os.environ.pop("SPATH_RING_UNFUSED", None)

    # ---- primitive timings on one bounce's shapes ----
    o, d = generate_rays(cam, W, H)
    n = o.shape[0]
    src = jnp.full(n, -1, jnp.int32)
    u = jnp.linspace(0.0, 0.999, n)
    from spath_tpu.ops.nee import light_cdf

    cdf, prob = light_cdf(scene)
    table = jnp.concatenate(
        [scene.v0, scene.v1, scene.v2, scene.albedo, scene.emission,
         prob[:, None], cdf[:, None]], axis=1)
    axis = mesh.axis_names[0]

    def shmap(f, nargs):
        specs = tuple(P() for _ in range(nargs))
        return jax.jit(partial(
            jax.shard_map, mesh=mesh, in_specs=specs,
            out_specs=P(), check_vma=False)(f))

    f_idx = shmap(lambda o_, d_, s_: RG.nearest_hit_ring(
        o_, d_, scene.v0, scene.v1, scene.v2, s_, cfg, axis), 3)
    f_rows = shmap(lambda o_, d_, s_, t_: RG.nearest_hit_ring_rows(
        o_, d_, t_, s_, cfg, axis), 4)
    f_gat = shmap(lambda t_, i_: RG.ring_gather_rows(t_, i_, axis), 2)
    f_sel = shmap(lambda t_, u_: RG.ring_light_select_rows(
        t_, u_, T, axis), 2)
    f_fus = shmap(lambda o_, d_, t_, s_, u_: RG.nearest_and_select_ring(
        o_, d_, t_, s_, u_, T, cfg, axis), 5)
    idx5 = jnp.clip(src + 5, 0, T - 1)

    timeit("  sweep index-only (nearest_hit_ring)", lambda:
           jax.block_until_ready(f_idx(o, d, src)))
    timeit("  sweep+rows (nearest_hit_ring_rows)", lambda:
           jax.block_until_ready(f_rows(o, d, src, table)))
    timeit("  rows gather alone (ring_gather_rows)", lambda:
           jax.block_until_ready(f_gat(table, idx5)))
    timeit("  light select+rows (ring_light_select_rows)", lambda:
           jax.block_until_ready(f_sel(table, u)))
    timeit("  fused sweep+select (nearest_and_select_ring)", lambda:
           jax.block_until_ready(f_fus(o, d, table, src, u)))


if __name__ == "__main__":
    main()
