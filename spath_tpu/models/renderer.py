"""Single renderer interface over every backend — C11 parity.

The reference defines one abstract renderer (``src/renderer.h:24-36``:
``get_description``, ``render_flat``, ``render``) implemented by three
peer backends that the app constructs eagerly and cycles with the ``r``
key (``src/main.cpp:120-124, 242-248``). Round 1 reproduced the
*backends* but picked between them ad hoc at each call site
(``render_pt_fast``/``render_radiance_fastgrad``/viewer/CLI); this
module is the missing single interface:

  * ``Renderer`` — ``describe()`` / ``supports()`` / ``render_flat()`` /
    ``render()`` / ``render_radiance()``, plus the framework-specific
    gradient surface (``supports_grad()`` / ``render_radiance_grad()``)
    the reference never had.
  * ``REGISTRY`` — all backends in fused-first order. ``available()``
    filters to what can run here (the analog of the reference's eager
    ctor failures aborting the app — here unavailable backends are just
    skipped).
  * ``forward_renderer(scene, cfg)`` / ``grad_renderer(scene, cfg)`` —
    THE selection rule, used by ``render_pt_fast`` and
    ``render_radiance_fastgrad`` so every entry point agrees on which
    kernel a config runs on.

Camera-state mutations (``basic_renderer.h:25-54``) live on the
immutable ``Camera`` (``move_relative``/``rotate_by``/``zoom``);
viewport sizing is ``RenderConfig.width/height`` — the functional
equivalents of ``set_delta_mov/rot/focal``/``set_viewport_size``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.scene import Scene


def _on_accel() -> bool:
    return jax.devices()[0].platform != "cpu"


#: Routing crossover between the SMEM-table megakernels (O(T) scalar
#: walk, ~1.3-2.2e10 pairs/s on the VPU) and the HBM-streamed MXU
#: kernels (~4-9.5e10 pairs/s, but padded to 256-triangle blocks):
#: measured on a v5e chip, the streamed kernels win from roughly this
#: triangle count up. The SMEM kernels remain CAPABLE up to their own
#: MAX_TRIS for direct calls; this is purely the registry's policy.
SMEM_ROUTE_MAX_TRIS = 128


class Renderer:
    """Abstract renderer (``src/renderer.h`` analog).

    Subclasses override ``supports``/``render_radiance`` (and the grad
    pair when they own a fused VJP). ``render`` applies the reference's
    final clamp (``src/cpu_renderer.cpp:78``); ``render_flat`` defaults
    to the shared XLA flat debug view (``src/cpu_renderer.cpp:81-101``
    semantics — deterministic, RNG-free)."""

    #: short stable identifier (CLI ``--backend``, viewer cycle)
    name: str = "abstract"
    #: human description (``get_description`` parity)
    description: str = ""
    #: False when render() must run OUTSIDE jit (host syncs inside —
    #: it manages its own jitted pieces)
    jittable: bool = True
    #: False to exclude from automatic selection (explicit --backend /
    #: viewer-cycle only) — e.g. the native CPU golden
    auto: bool = True

    def describe(self) -> str:
        return self.description or self.name

    def available(self) -> bool:
        """Can this backend run in this process at all?"""
        return True

    def supports(self, scene: Scene, cfg: RenderConfig) -> bool:
        """Can this backend render this (scene, config) exactly?"""
        raise NotImplementedError

    def supports_grad(self, scene: Scene, cfg: RenderConfig) -> bool:
        return False

    def render_radiance(self, scene, camera, cfg, seed=0) -> jax.Array:
        """Unclamped mean radiance ``(H, W, 3)``."""
        raise NotImplementedError

    def render_radiance_grad(self, scene, camera, cfg, seed=0):
        raise NotImplementedError(f"{self.name} has no gradient path")

    def render(self, scene, camera, cfg, seed=0) -> jax.Array:
        return jnp.clip(self.render_radiance(scene, camera, cfg, seed),
                        0.0, 1.0)

    def render_flat(self, scene, camera, cfg) -> jax.Array:
        from spath_tpu.models.flat import render_flat

        return render_flat(scene, camera, cfg)


class WavefrontRenderer(Renderer):
    """XLA wavefront — the general, differentiable reference path."""

    name = "wavefront"
    description = "XLA wavefront (all configs, jax.grad)"

    def supports(self, scene, cfg) -> bool:
        return True

    def supports_grad(self, scene, cfg) -> bool:
        return True

    def render_radiance(self, scene, camera, cfg, seed=0):
        from spath_tpu.models.pathtracer import render_radiance

        return render_radiance(scene, camera, cfg, seed)

    render_radiance_grad = render_radiance


class VisGradFusedRenderer(Renderer):
    """Visibility gradients at fused-kernel speed.

    The vis_grad estimator's image is ``interior + vis`` where the vis
    terms (warped-area factor, edge-sampled boundary term) have forward
    value EXACTLY zero — so the gradient decomposes additively:
    interior fwd+bwd on the fused custom-VJP megakernels (61× the
    wavefront autodiff), plus ``render_vis_residual`` (a detached walk
    replay differentiating only the O(1)-per-lane vis chains). Same
    total gradient as the wavefront with ``cfg.vis_grad``, asserted in
    ``tests/test_vis_residual.py``."""

    name = "visgrad_fused"
    description = "fused interior VJP + visibility-gradient residual"

    def available(self) -> bool:
        return _on_accel()

    def supports(self, scene, cfg) -> bool:
        return False            # forward-only callers don't need vis_grad

    def supports_grad(self, scene, cfg) -> bool:
        if not (self.available() and cfg.vis_grad):
            return False
        interior = grad_renderer(scene, cfg.replace(vis_grad=False))
        return interior.name not in ("wavefront", "compact")

    def render_radiance_grad(self, scene, camera, cfg, seed=0):
        from spath_tpu.models.pathtracer import _tracing, render_vis_residual

        icfg = cfg.replace(vis_grad=False)
        tracing = _tracing(scene, camera)
        r = grad_renderer(scene, icfg, require_jittable=tracing)
        if r.name == "quality_bigscene" and cfg.spp <= 8:
            # hit-replay route (round-5 item 4): the interior forward
            # exports every (sample, bounce) nearest hit, and the
            # residual consumes them instead of re-running its own
            # O(N·T) detached sweeps — at 100k tris those re-sweeps
            # alone cost a whole streamed forward. spp ≤ 8 because the
            # export kernel unrolls the sample loop.
            from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
                render_bigscene_quality_with_hits,
            )

            interior, hits = render_bigscene_quality_with_hits(
                scene, camera, icfg, seed,
                fast=(icfg.intersect == "pallas_fast"))
            return interior + render_vis_residual(scene, camera, cfg,
                                                  seed, hits=hits)
        interior = r.render_radiance_grad(scene, camera, icfg, seed)
        return interior + render_vis_residual(scene, camera, cfg, seed)


class CompactWavefrontRenderer(WavefrontRenderer):
    """Wavefront with exact background-pixel stream compaction —
    fastest general forward path (not differentiable: one host scalar
    crosses for the live count)."""

    name = "compact"
    description = "XLA wavefront, stream-compacted (forward only)"
    jittable = False        # one host scalar (live count) crosses

    def supports_grad(self, scene, cfg) -> bool:
        return False

    def render_radiance(self, scene, camera, cfg, seed=0):
        from spath_tpu.models.pathtracer import render_radiance_compact

        return render_radiance_compact(scene, camera, cfg, seed)


class MegakernelRenderer(Renderer):
    """Fused whole-frame Pallas kernel, conformance estimator."""

    name = "megakernel"
    description = "fused Pallas megakernel (lcg+angle, small scenes)"

    def available(self) -> bool:
        return _on_accel()

    def supports(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel

        return (self.available() and megakernel.supported(scene, cfg)
                and scene.n_tris <= SMEM_ROUTE_MAX_TRIS)

    def supports_grad(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel_grad

        return self.available() and megakernel_grad.supported_grad(
            scene, cfg)

    def render_radiance(self, scene, camera, cfg, seed=0):
        from spath_tpu.ops.pallas import megakernel

        return megakernel.render_radiance_megakernel(
            scene, camera, cfg, seed)

    def render_radiance_grad(self, scene, camera, cfg, seed=0):
        from spath_tpu.ops.pallas import megakernel_grad

        return megakernel_grad.render_radiance_mega(
            scene, camera, cfg, seed)


class QualityMegakernelRenderer(Renderer):
    """Fused quality kernel: hash RNG + cosine + NEE/MIS + rr/stratify."""

    name = "quality"
    description = "fused quality megakernel (hash+cosine, NEE/MIS)"

    def available(self) -> bool:
        return _on_accel()

    def supports(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel_bigscene_quality as bq
        from spath_tpu.ops.pallas import megakernel_quality

        if not (self.available()
                and megakernel_quality.supported(scene, cfg)):
            return False
        # above the crossover prefer the streamed kernel — unless it
        # can't run (e.g. no static light set under tracing)
        return (scene.n_tris <= SMEM_ROUTE_MAX_TRIS
                or not bq.supported(scene, cfg))

    def supports_grad(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel_bigscene_quality as bq
        from spath_tpu.ops.pallas import megakernel_quality_grad

        if not (self.available()
                and megakernel_quality_grad.supported_grad(scene, cfg)):
            return False
        return (scene.n_tris <= SMEM_ROUTE_MAX_TRIS
                or not bq.supported_grad(scene, cfg))

    def render_radiance(self, scene, camera, cfg, seed=0):
        from spath_tpu.ops.pallas import megakernel_quality

        return megakernel_quality.render_radiance_quality_megakernel(
            scene, camera, cfg, seed)

    def render_radiance_grad(self, scene, camera, cfg, seed=0):
        from spath_tpu.ops.pallas import megakernel_quality_grad

        return megakernel_quality_grad.render_radiance_quality_grad(
            scene, camera, cfg, seed)


class QualityBigsceneRenderer(Renderer):
    """HBM-streamed fused QUALITY kernel: hash + cosine + NEE/MIS at
    large T (the production estimator beyond the SMEM table)."""

    name = "quality_bigscene"
    description = "HBM-streamed quality megakernel (NEE/MIS, large scenes)"

    def available(self) -> bool:
        return _on_accel()

    def supports(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel_bigscene_quality as q

        return self.available() and q.supported(scene, cfg)

    def supports_grad(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel_bigscene_quality as q

        return self.available() and q.supported_grad(scene, cfg)

    def render_radiance(self, scene, camera, cfg, seed=0):
        from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
            render_radiance_bigscene_quality,
        )

        return render_radiance_bigscene_quality(
            scene, camera, cfg, seed,
            fast=(cfg.intersect == "pallas_fast"))

    render_radiance_grad = render_radiance


class BigsceneRenderer(Renderer):
    """HBM-streamed fused kernel for scenes beyond the SMEM table."""

    name = "bigscene"
    description = "HBM-streamed fused megakernel (large scenes)"

    def available(self) -> bool:
        return _on_accel()

    def supports(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel_bigscene

        return self.available() and megakernel_bigscene.supported(
            scene, cfg)

    def supports_grad(self, scene, cfg) -> bool:
        from spath_tpu.ops.pallas import megakernel_bigscene_grad

        return (self.available()
                and megakernel_bigscene_grad.supported_grad(scene, cfg))

    def render_radiance(self, scene, camera, cfg, seed=0):
        from spath_tpu.ops.pallas import megakernel_bigscene

        return megakernel_bigscene.render_radiance_bigscene(
            scene, camera, cfg, seed,
            fast=(cfg.intersect == "pallas_fast"))

    def render_radiance_grad(self, scene, camera, cfg, seed=0):
        from spath_tpu.ops.pallas import megakernel_bigscene_grad

        return megakernel_bigscene_grad.render_radiance_bigscene_grad(
            scene, camera, cfg, seed,
            fast=(cfg.intersect == "pallas_fast"))


class CompactFusedRenderer(Renderer):
    """Bucket-compacted fused megakernel: classify camera rays once,
    launch the fused kernel on the bucket-padded live prefix only
    (``models/compact_fast.py``). Value-identical to the full fused
    launch, ~1/(live fraction) faster (1.55× on the default view); one
    host scalar per PLAN BUILD → not jittable through the registry, so
    callers that wrap ``render_pt_fast``/``render_radiance_fastgrad``
    in ``jax.jit`` route around it (``require_jittable=True``). Jitted
    callers reach the same speed by passing an explicit plan to
    ``compact_fast.render_radiance_compact_grad(plan=...)`` — the
    launch itself is jittable and differentiable (round 4)."""

    name = "compact_fused"
    description = "bucket-compacted fused megakernel (serving + training)"
    jittable = False

    def available(self) -> bool:
        return _on_accel()

    def supports(self, scene, cfg) -> bool:
        from spath_tpu.models import compact_fast

        return self.available() and compact_fast.supported(scene, cfg)

    def supports_grad(self, scene, cfg) -> bool:
        from spath_tpu.models import compact_fast

        return self.available() and compact_fast.supported_grad(
            scene, cfg)

    def render_radiance(self, scene, camera, cfg, seed=0):
        from spath_tpu.models.compact_fast import (
            render_radiance_compact_fused,
        )

        return render_radiance_compact_fused(scene, camera, cfg, seed)

    def render_radiance_grad(self, scene, camera, cfg, seed=0):
        from spath_tpu.models.compact_fast import (
            render_radiance_compact_grad,
        )

        return render_radiance_compact_grad(scene, camera, cfg, seed)


class NativeRenderer(Renderer):
    """The C++ CPU runtime — the independent golden (work-stealing
    thread pool, recursive estimator; ``native/spath_native.cpp``)."""

    name = "native"
    description = "native C++ CPU runtime"
    jittable = False
    auto = False

    def available(self) -> bool:
        from spath_tpu.utils.native import build

        return bool(build())

    def supports(self, scene, cfg) -> bool:
        return (self.available() and cfg.rng == "lcg"
                and cfg.sampler == "angle" and not cfg.nee)

    def render_radiance(self, scene, camera, cfg, seed=0):
        import numpy as np

        from spath_tpu.utils.native import native_render_pt

        img = native_render_pt(
            cfg.width, cfg.height, np.asarray(scene.vertices),
            np.asarray(scene.albedo), np.asarray(scene.emission),
            cfg.spp, cfg.max_bounces, int(seed),
            dict(pos=np.asarray(camera.pos),
                 angle=np.asarray(camera.angle),
                 focal=float(camera.focal)),
        )
        return jnp.asarray(img)

    def render_flat(self, scene, camera, cfg):
        import numpy as np

        from spath_tpu.utils.native import native_render_flat

        img = native_render_flat(
            cfg.width, cfg.height, np.asarray(scene.vertices),
            np.asarray(scene.albedo),
            dict(pos=np.asarray(camera.pos),
                 angle=np.asarray(camera.angle),
                 focal=float(camera.focal)),
        )
        return jnp.asarray(img)


#: All backends, fused-first. Selection takes the first match, so the
#: order IS the performance policy: fused kernels, then the streamed
#: large-scene kernel, then the compacted wavefront (always supported).
REGISTRY: tuple[Renderer, ...] = (
    CompactFusedRenderer(),
    MegakernelRenderer(),
    QualityMegakernelRenderer(),
    QualityBigsceneRenderer(),
    BigsceneRenderer(),
    VisGradFusedRenderer(),
    CompactWavefrontRenderer(),
    WavefrontRenderer(),
    NativeRenderer(),
)


def get_renderer(name: str) -> Renderer:
    for r in REGISTRY:
        if r.name == name:
            return r
    raise KeyError(f"unknown renderer {name!r}; "
                   f"have {[r.name for r in REGISTRY]}")


def available_renderers() -> list[Renderer]:
    """Backends that can run in this process (viewer's ``r`` cycle)."""
    return [r for r in REGISTRY if r.available()]


def forward_renderer(scene: Scene, cfg: RenderConfig,
                     require_jittable: bool = True) -> Renderer:
    """The fastest backend that renders (scene, cfg) exactly.

    ``require_jittable``: callers that run the selected backend inside
    an outer ``jax.jit`` (``render_pt_fast``, the sharded paths) must
    skip backends with host syncs; unjitted entry points (CLI renders,
    the viewer frame loop) pass False and pick up the compacted fused
    path when it applies."""
    for r in REGISTRY:
        if (r.auto and (r.jittable or not require_jittable)
                and r.supports(scene, cfg)):
            return r
    return REGISTRY[-2]          # wavefront: supports everything


def grad_renderer(scene: Scene, cfg: RenderConfig,
                  require_jittable: bool = False) -> Renderer:
    """The fastest backend with a gradient path for (scene, cfg).

    ``require_jittable``: traced callers (a ``jax.jit``-wrapped loss)
    must skip backends whose plan build syncs a host scalar — the
    compacted fused VJP; they can still reach it by passing an explicit
    plan to ``compact_fast.render_radiance_compact_grad``."""
    for r in REGISTRY:
        if ((r.jittable or not require_jittable)
                and r.supports_grad(scene, cfg)):
            return r
    return REGISTRY[-2]


def render_any(scene, camera, cfg: RenderConfig, seed=0,
               backend: str | None = None) -> jax.Array:
    """Clamped render via a named backend, or the auto-selected one."""
    r = get_renderer(backend) if backend else forward_renderer(
        scene, cfg, require_jittable=False)
    return r.render(scene, camera, cfg, seed)
