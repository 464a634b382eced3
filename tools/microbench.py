#!/usr/bin/env python
"""Kernel micro-benchmarks (real TPU): intersect kernel pairs/s and the
HBM-streamed bigscene megakernel rays/s, exact + fast modes.

Timing note: on the remote-TPU (axon) path ``block_until_ready`` can
return before execution completes, and every dispatch carries a ~30 ms
tunnel round-trip. Every timed closure therefore (a) FETCHES a scalar
that data-depends on the full result and (b) runs a workload large
enough (>0.3 s) that the fixed latency is noise.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

#: measured fixed dispatch+fetch round-trip on the axon tunnel
LATENCY_S = 0.030


def best_of(fn, n=3):
    fn()
    b = float("inf")
    for _ in range(n):
        t = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t)
    return max(b - LATENCY_S, 1e-9)


def main():
    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.ops.pallas.intersect_pallas import nearest_hit_pallas
    from spath_tpu.ops.pallas.megakernel_bigscene import (
        render_radiance_bigscene,
    )
    from spath_tpu.ops.pallas.megakernel_bigscene_grad import (
        render_radiance_bigscene_grad,
    )
    from spath_tpu.scene import procedural_scene

    rng = np.random.Generator(np.random.Philox(0))
    n, t = 1 << 20, 32768
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    verts = rng.uniform(-2, 2, (t, 3, 3)).astype(np.float32)
    v0, v1, v2 = (jnp.asarray(verts[:, i]) for i in range(3))
    src = jnp.full((n,), -1, jnp.int32)

    for fast in (False, True):
        f = jax.jit(lambda o, d, fast=fast: jnp.sum(
            nearest_hit_pallas(o, d, v0, v1, v2, src, fast=fast)[0]))
        dt = best_of(lambda: float(f(o, d)))
        print(f"intersect_pallas fast={fast}: {dt * 1e3:8.1f} ms -> "
              f"{n * t / dt:.3e} pairs/s")

    scene = procedural_scene(10_000, seed=0)
    cam = Camera.default()
    cfg = RenderConfig(width=640, height=360, spp=4, max_bounces=5,
                       rng="lcg", sampler="angle")
    n_rays = cfg.width * cfg.height * cfg.spp * cfg.max_bounces
    for fast in (False, True):
        f = jax.jit(lambda s, c, sd, fast=fast: jnp.sum(
            render_radiance_bigscene(s, c, cfg, sd, fast)),
            static_argnames=())
        dt = best_of(lambda: float(f(scene, cam, 1)))
        print(f"bigscene fwd fast={fast}:     {dt * 1e3:8.1f} ms -> "
              f"{n_rays / dt:.3e} rays/s ({n_rays / dt * scene.n_tris:.3e}"
              f" pairs/s)")

    def loss(vertices, albedo, s, c):
        sc = s.__class__(vertices, albedo, s.emission)
        return jnp.mean(render_radiance_bigscene_grad(sc, c, cfg, 0))

    g = jax.jit(lambda v, a, s, c: sum(
        jnp.sum(x) for x in jax.grad(loss, argnums=(0, 1))(v, a, s, c)))
    dt = best_of(
        lambda: float(g(scene.vertices, scene.albedo, scene, cam)), n=2)
    print(f"bigscene fwd+bwd:           {dt * 1e3:8.1f} ms -> "
          f"{n_rays / dt:.3e} rays/s")


if __name__ == "__main__":
    main()
