#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): rays/s/chip, forward, 1080p 64 spp,
5 bounces, default 7-triangle scene, reference-conformant estimator
(per-pixel LCG + angle-uniform sampler — the semantics of
``/root/reference/src/render.comp:160-227``) with the MXU (Plücker)
intersection kernel. A "ray" is one path segment: W·H·spp·bounces
(the unit the reference's cost structure is measured in — every segment
brute-force scans all triangles, ``src/cpu_renderer.cpp:39-49``).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the reference CPU renderer's semantics measured on this
host — the fastest available CPU implementation of the same algorithm
(the framework's vectorized NumPy oracle; the native C++ oracle is used
instead when built), scaled from a smaller frame.

Secondary metrics (stderr): fwd+bwd rays/s (gradients w.r.t. vertices +
albedo, rematerialized backward), and the stress scene (BASELINE config
4) at a reduced size.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _time_best(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return best


def measure_cpu_baseline(width=320, height=240, spp=8, bounces=5):
    """Reference-semantics CPU rays/s (native C++ oracle if built,
    else the vectorized NumPy oracle)."""
    import numpy as np

    from spath_tpu.scene import default_scene
    from spath_tpu.utils import oracle

    scene = default_scene()
    verts = np.asarray(scene.vertices)
    alb = np.asarray(scene.albedo)
    emi = np.asarray(scene.emission)

    try:
        from spath_tpu.utils.native import native_render_pt, native_available

        if native_available():
            t = time.perf_counter()
            native_render_pt(width, height, verts, alb, emi, spp, bounces)
            dt = time.perf_counter() - t
            _log(f"cpu baseline: native oracle {dt:.2f}s")
            return width * height * spp * bounces / dt
    except ImportError:
        pass

    t = time.perf_counter()
    oracle.render_pt(width, height, verts, alb, emi, spp=spp,
                     max_bounces=bounces)
    dt = time.perf_counter() - t
    _log(f"cpu baseline: numpy oracle {dt:.2f}s at {width}x{height} spp{spp}")
    return width * height * spp * bounces / dt


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the big wavefront/megakernel programs
    # take minutes to compile cold; cache them next to the repo so
    # repeated bench runs (and the driver) start hot.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.models.pathtracer import render_pt, render_radiance
    from spath_tpu.scene import default_scene, procedural_scene

    dev = jax.devices()[0]
    _log(f"device: {dev}")

    scene = default_scene()
    cam = Camera.default()
    cfg = RenderConfig(
        width=1920, height=1080, spp=64, max_bounces=5,
        rng="lcg", sampler="angle", intersect="pluecker",
    )
    n_rays = cfg.width * cfg.height * cfg.spp * cfg.max_bounces

    # --- forward: fused megakernel (the serving path) ---
    from spath_tpu.models.pathtracer import render_pt_fast

    def sync_scalar(x):
        return float(jnp.sum(x.ravel()[:4]))

    fwd = jax.jit(render_pt_fast, static_argnames=("cfg",))
    t = time.perf_counter()
    sync_scalar(fwd(scene, cam, cfg, 0))
    _log(f"fwd compile+first run: {time.perf_counter() - t:.1f}s")
    dt = _time_best(lambda: sync_scalar(fwd(scene, cam, cfg, 1)))
    fwd_rays = n_rays / dt
    _log(f"fwd (megakernel): {dt:.3f}s -> {fwd_rays:.3e} rays/s")

    # --- forward, general wavefront path (differentiable renderer) ---
    fwd_wave = jax.jit(render_pt, static_argnames=("cfg",))
    sync_scalar(fwd_wave(scene, cam, cfg, 0))
    dt_w = _time_best(lambda: sync_scalar(fwd_wave(scene, cam, cfg, 1)))
    _log(f"fwd (wavefront): {dt_w:.3f}s -> {n_rays / dt_w:.3e} rays/s")

    # --- forward+backward (gradients w.r.t. vertices + albedo) ---
    from spath_tpu.models.pathtracer import render_radiance_fastgrad

    def make_bwd(render_fn):
        def loss(vertices, albedo, scene, cam):
            s = scene.__class__(vertices, albedo, scene.emission)
            return jnp.mean(render_fn(s, cam, cfg, 0))

        # Reduce grads to one scalar inside jit: on the remote-TPU path
        # block_until_ready can return before execution completes, so
        # timing must fetch a value.
        return jax.jit(
            lambda v, a, s, c: sum(
                jnp.sum(g)
                for g in jax.grad(loss, argnums=(0, 1))(v, a, s, c)
            )
        )

    bwd_rays = 0.0
    for name, fn in (("megakernel", render_radiance_fastgrad),
                     ("wavefront", render_radiance)):
        bwd = make_bwd(fn)
        try:
            t = time.perf_counter()
            float(bwd(scene.vertices, scene.albedo, scene, cam))
            _log(f"fwd+bwd [{name}] compile+first run: "
                 f"{time.perf_counter() - t:.1f}s")
            dt_b = _time_best(
                lambda: float(bwd(scene.vertices, scene.albedo, scene, cam)),
                n=2,
            )
            _log(f"fwd+bwd [{name}]: {dt_b:.3f}s -> "
                 f"{n_rays / dt_b:.3e} rays/s")
            bwd_rays = max(bwd_rays, n_rays / dt_b)
        except Exception as e:  # noqa: BLE001 — report and continue
            _log(f"fwd+bwd [{name}] failed: {type(e).__name__}: {e}")

    # --- stress scene (BASELINE config 4: 10k tris, 1080p, fwd AND
    # fwd+bwd) via the HBM-streamed fused megakernel. The kernel is
    # fully compute-bound (O(rays·tris) MXU work), so the rays/s rate is
    # spp-independent; spp is reduced from the spec's 64 to keep the
    # bench round-trip bounded — the RATE is the config-4 number.
    try:
        from spath_tpu.ops.pallas.megakernel_bigscene import (
            render_radiance_bigscene,
        )
        from spath_tpu.ops.pallas.megakernel_bigscene_grad import (
            render_radiance_bigscene_grad,
        )

        stress = procedural_scene(10_000, seed=0)
        scfg = cfg.replace(spp=2)                       # 1080p spp2
        n_s = scfg.width * scfg.height * scfg.spp * scfg.max_bounces
        sfwd = jax.jit(render_radiance_bigscene,
                       static_argnames=("cfg", "fast"))
        for fast, label in ((False, "exact"), (True, "fast")):
            sync_scalar(sfwd(stress, cam, scfg, 0, fast))
            dt_s = _time_best(
                lambda: sync_scalar(sfwd(stress, cam, scfg, 1, fast)), n=1
            )
            _log(f"stress 10k tris 1080p spp{scfg.spp} fwd [{label}]: "
                 f"{dt_s:.3f}s -> {n_s / dt_s:.3e} rays/s "
                 f"({n_s / dt_s * 1e4:.3e} pairs/s)")

        bcfg = scfg                                     # 1080p spp2
        n_b = bcfg.width * bcfg.height * bcfg.spp * bcfg.max_bounces

        def sloss(vertices, albedo, s, c):
            sc = s.__class__(vertices, albedo, s.emission)
            return jnp.mean(render_radiance_bigscene_grad(sc, c, bcfg, 0))

        sbwd = jax.jit(lambda v, a, s, c: sum(
            jnp.sum(g) for g in jax.grad(sloss, argnums=(0, 1))(v, a, s, c)
        ))
        float(sbwd(stress.vertices, stress.albedo, stress, cam))
        dt_b = _time_best(
            lambda: float(sbwd(stress.vertices, stress.albedo, stress,
                               cam)), n=1)
        _log(f"stress 10k tris 1080p spp{bcfg.spp} fwd+bwd [exact]: "
             f"{dt_b:.3f}s -> {n_b / dt_b:.3e} rays/s")
    except Exception as e:  # noqa: BLE001
        _log(f"stress failed: {type(e).__name__}: {e}")

    baseline = measure_cpu_baseline()
    _log(f"cpu baseline: {baseline:.3e} rays/s")

    print(json.dumps({
        "metric": "rays_per_s_chip_fwd_1080p_64spp",
        "value": round(fwd_rays),
        "unit": "rays/s",
        "vs_baseline": round(fwd_rays / baseline, 2) if baseline else None,
    }))


if __name__ == "__main__":
    main()
