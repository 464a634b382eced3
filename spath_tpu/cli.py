"""Command-line interface.

The reference has no CLI at all — argc/argv go straight to glutInit
(``src/main.cpp:252``) and every knob is a compile-time constant or a
GLUT key binding (``src/main.cpp:85-150``). Those knobs become flags:

  render   one frame → PNG/PPM (resolution, spp, bounces, seed, scene,
           camera pose, estimator mode, intersection kernel, backend)
  view     interactive viewer with the reference's key bindings
  bench    the benchmark harness (same as ``python bench.py``)
  invert   inverse-rendering demo: synthesize a target, perturb, recover
  info     devices / native runtime status

Examples::

  python -m spath_tpu.cli render --size 640x480 --spp 128 --out frame.png
  python -m spath_tpu.cli render --flat --scene procedural:5000
  python -m spath_tpu.cli render --mode quality --spp 32 --backend cpu
  python -m spath_tpu.cli invert --steps 100
"""

from __future__ import annotations

import argparse
import sys
import time


def _parse_vec3(s: str):
    parts = [float(x) for x in s.split(",")]
    if len(parts) != 3:
        raise argparse.ArgumentTypeError(f"expected x,y,z — got {s!r}")
    return parts


def _parse_size(s: str):
    w, h = s.lower().split("x")
    return int(w), int(h)


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--size", type=_parse_size, default=(640, 480),
                   help="WxH resolution (reference default 640x480)")
    p.add_argument("--spp", type=int, default=128,
                   help="samples per pixel (reference default 128)")
    p.add_argument("--bounces", type=int, default=5,
                   help="path length cap (reference: hard 5)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene", default="default",
                   help='"default" (the 7-triangle scene), '
                        '"procedural:N[:seed]", or a path to a .obj/.ply '
                        'mesh (MTL Kd/Ke -> albedo/emission)')
    p.add_argument("--rr-start", type=int, default=0,
                   help="Russian-roulette start bounce (0 = off; "
                        "quality mode only)")
    p.add_argument("--stratify", action="store_true",
                   help="stratify first-bounce sampling across spp "
                        "(quality mode only)")
    p.add_argument("--mode", choices=["conformance", "quality"],
                   default="conformance",
                   help="conformance = reference LCG+angle sampler; "
                        "quality = cosine+NEE (counter-based RNG)")
    p.add_argument("--rng", choices=["hash", "threefry", "table"],
                   default="hash",
                   help="quality-mode RNG: 'hash' (default — enables the "
                        "fused quality megakernels) or 'threefry' "
                        "(jax.random). Conformance mode is always the "
                        "reference LCG, except '--rng table' which swaps "
                        "in the reference's vec_dist shuffled-table "
                        "debug RNG (src/frand.h:32-50) — like the "
                        "reference's own debug swap, it pairs with the "
                        "plain estimator (conformance mode only).")
    p.add_argument("--intersect",
                   choices=["reference", "pluecker", "pallas", "pallas_fast"],
                   default=None,
                   help="intersection kernel (default: mode-dependent)")
    p.add_argument("--camera-pos", type=_parse_vec3, default=[0, 0, -3])
    p.add_argument("--camera-angle", type=_parse_vec3, default=[0, 0, 0])
    p.add_argument("--focal", type=float, default=2.0)
    p.add_argument("--backend", choices=["auto", "cpu", "native"],
                   default="auto",
                   help="auto = whatever JAX platform is active (TPU when "
                        "available); cpu = force JAX on host CPU; native = "
                        "the C++ runtime (conformance estimator only)")


def _setup_backend(backend: str):
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    return jax


def _build(args):
    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.scene import default_scene, procedural_scene

    import jax.numpy as jnp

    if args.scene == "default":
        scene = default_scene()
    elif args.scene.startswith("procedural:"):
        parts = args.scene.split(":")
        n = int(parts[1])
        seed = int(parts[2]) if len(parts) > 2 else 0
        scene = procedural_scene(n, seed=seed)
    elif args.scene.lower().endswith((".obj", ".ply")):
        from spath_tpu.scene_io import load_scene

        scene = load_scene(args.scene)
    else:
        raise SystemExit(f"unknown scene {args.scene!r}")

    cam = Camera(
        pos=jnp.asarray(args.camera_pos, jnp.float32),
        angle=jnp.asarray(args.camera_angle, jnp.float32),
        focal=jnp.float32(args.focal),
    )
    w, h = args.size
    if args.mode == "quality":
        if getattr(args, "rng", "hash") == "table":
            raise SystemExit(
                "--rng table is a conformance-mode debug RNG (quality "
                "mode's NEE needs a counter-based stream)")
        cfg = RenderConfig(
            width=w, height=h, spp=args.spp, max_bounces=args.bounces,
            rng=getattr(args, "rng", "hash"), sampler="cosine", nee=True,
            intersect=args.intersect or "pluecker",
            rr_start=getattr(args, "rr_start", 0),
            stratify=getattr(args, "stratify", False),
        )
    else:
        if getattr(args, "rr_start", 0) or getattr(args, "stratify", False):
            raise SystemExit(
                "--rr-start/--stratify need --mode quality (the "
                "conformance LCG stream layout has no slot for them)")
        cfg = RenderConfig(
            width=w, height=h, spp=args.spp, max_bounces=args.bounces,
            rng="table" if getattr(args, "rng", "hash") == "table"
            else "lcg",
            sampler="angle",
            intersect=args.intersect or "pluecker",
        )
    return scene, cam, cfg


def cmd_render(args) -> int:
    import numpy as np

    t0 = time.perf_counter()
    if args.backend == "native":
        # Scene construction uses jnp; keep it off any accelerator (the
        # render itself is pure C++).
        _setup_backend("cpu")
        from spath_tpu.utils.native import (
            build, native_render_flat, native_render_pt,
        )

        if not build():
            raise SystemExit("native runtime unavailable (no g++?)")
        if args.mode == "quality":
            raise SystemExit("--backend native supports conformance mode only")
        scene, cam, cfg = _build(args)
        kw = dict(pos=args.camera_pos, angle=args.camera_angle,
                  focal=args.focal)
        verts = np.asarray(scene.vertices)
        alb = np.asarray(scene.albedo)
        if args.flat:
            img = native_render_flat(cfg.width, cfg.height, verts, alb, kw)
        else:
            img = native_render_pt(
                cfg.width, cfg.height, verts, alb,
                np.asarray(scene.emission), cfg.spp, cfg.max_bounces,
                args.seed, kw,
            )
    else:
        jax = _setup_backend(args.backend)
        scene, cam, cfg = _build(args)
        from spath_tpu.models.flat import render_flat
        from spath_tpu.models.pathtracer import render_pt

        if args.flat and args.tonemap != "clamp":
            raise SystemExit(
                "--tonemap operators need HDR radiance; the flat debug "
                "view is already LDR (drop --flat or --tonemap)")
        if args.flat:
            img = np.asarray(
                jax.jit(render_flat, static_argnames=("cfg",))(scene, cam, cfg)
            )
        elif args.tonemap != "clamp":
            # Tonemap operators want unclamped HDR radiance.
            from spath_tpu.models.pathtracer import render_radiance
            from spath_tpu.utils.image import tonemap

            hdr = np.asarray(
                jax.jit(render_radiance, static_argnames=("cfg",))(
                    scene, cam, cfg, args.seed
                )
            )
            img = tonemap(hdr, args.tonemap, args.exposure)
        else:
            img = np.asarray(
                jax.jit(render_pt, static_argnames=("cfg",))(
                    scene, cam, cfg, args.seed
                )
            )
    dt = time.perf_counter() - t0
    n_rays = cfg.width * cfg.height * (1 if args.flat else cfg.spp * cfg.max_bounces)
    print(f"rendered {cfg.width}x{cfg.height} in {dt:.2f}s "
          f"({n_rays / dt:.3g} rays/s incl. compile)", file=sys.stderr)

    from spath_tpu.utils.image import write_png, write_ppm

    out = args.out
    if out.endswith(".ppm"):
        write_ppm(out, img)
    else:
        write_png(out, img)
    print(out)
    return 0


def cmd_info(args) -> int:
    import jax

    print(f"jax {jax.__version__}")
    print(f"devices: {jax.devices()}")
    from spath_tpu.utils.native import build, native_version

    print(f"native runtime: {native_version() if build() else 'unavailable'}")
    from spath_tpu.models.renderer import REGISTRY

    print("renderers:")
    for r in REGISTRY:
        avail = "available" if r.available() else "unavailable here"
        print(f"  {r.name:11s} {r.describe()} [{avail}]")
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def cmd_invert(args) -> int:
    import numpy as np

    jax = _setup_backend(args.backend)
    scene, cam, cfg = _build(args)
    import jax.numpy as jnp

    from spath_tpu.models.inverse import (
        InverseParams, param_group_optimizer, recover,
    )
    from spath_tpu.models.pathtracer import render_radiance

    print("rendering target...", file=sys.stderr)
    target = render_radiance(scene, cam, cfg, seed=args.seed)

    rng = np.random.default_rng(1)
    bad_albedo = np.clip(
        np.asarray(scene.albedo)
        + rng.uniform(-0.4, 0.4, scene.albedo.shape).astype(np.float32),
        0.05, 1.0,
    )
    params = InverseParams(
        cam_pos=cam.pos, cam_angle=cam.angle, cam_focal=cam.focal,
        albedo=jnp.asarray(bad_albedo),
    )
    state, losses = recover(
        scene, target, params, cfg, steps=args.steps,
        optimizer=param_group_optimizer(freeze_pose=True, albedo_lr=2e-2),
        fixed_seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        log_fn=lambda m: print(m, file=sys.stderr),
    )
    err0 = np.abs(bad_albedo - np.asarray(scene.albedo)).mean()
    err1 = np.abs(np.asarray(state.params.albedo)
                  - np.asarray(scene.albedo)).mean()
    print(f"albedo error {err0:.4f} -> {err1:.4f}; "
          f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    return 0


def cmd_view(args) -> int:
    from spath_tpu.viewer import run_viewer

    scene, cam, cfg = _build(args)
    return run_viewer(scene, cam, cfg)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="spath-tpu", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("render", help="render one frame to an image file")
    _add_common(p)
    p.add_argument("--flat", action="store_true",
                   help="flat-shaded debug view (reference render_flat)")
    p.add_argument("--tonemap", default="clamp",
                   choices=["clamp", "reinhard", "aces", "gamma22"],
                   help="HDR->display operator (clamp = reference "
                        "semantics, src/scene.h:32-39)")
    p.add_argument("--exposure", type=float, default=1.0,
                   help="linear exposure multiplier before tonemapping")
    p.add_argument("--out", default="frame.png")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("view", help="interactive viewer (reference keys)")
    _add_common(p)
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser("bench", help="benchmark harness (one JSON line)")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("invert", help="inverse-rendering demo")
    _add_common(p)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--checkpoint-dir", default=None)
    p.set_defaults(fn=cmd_invert)

    p = sub.add_parser("info", help="environment info")
    p.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
