"""Render configuration.

The reference has no config system — every knob is a compile-time constant
or a GLUT key binding (``src/main.cpp:85-150``: samples +/- , ``p`` toggles
path tracing, ``f``/``g`` focal; 5-bounce cap hardcoded three times at
``src/cpu_renderer.cpp:33``, ``src/render.cl:181``, ``src/render.comp:166``;
epsilon at ``src/geom.h:198``). Here all of those become one frozen
dataclass that is hashable, so it can be passed as a static argument to
``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Literal


# Constants shared with the reference implementation.
# EPSILON: src/geom.h:198; MAX_VALUE_DIST: src/cpu_renderer.cpp:27,
# src/render.comp:58. Both are float32 in the reference (real = float,
# src/geom.h:24).
EPSILON = 1e-14
MAX_DIST = 1e12


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static knobs of a render. Hashable → usable as a jit static arg.

    Attributes:
      width, height: output resolution (ref default 640×480,
        ``src/main.cpp:238-239``).
      spp: samples per pixel (ref default 128, ``src/main.cpp:44``).
      max_bounces: path length cap (ref hard 5, ``src/cpu_renderer.cpp:33``).
      rng: "lcg" reproduces the reference per-pixel LCG stream
        (seed = pixel id, ``src/render.cl:233``, ``src/render.comp:219``;
        formula ``src/frand.h:53-63``); "threefry" uses counter-based
        ``jax.random`` keys (the quality mode); "hash" uses counter-based
        murmur3-mixer streams keyed by (seed, pixel, sample, bounce,
        draw) — statistically equivalent to threefry, ~10 integer ops per
        draw, and implementable verbatim inside Pallas kernels so the
        fused quality megakernel draws the same randoms as the XLA
        wavefront. Both "threefry" and "hash" are sharding-invariant
        (streams keyed by global pixel id). "table" is the reference's
        ``vec_dist`` debug RNG (``src/frand.h:32-50``): the bit-exact
        libstdc++ shuffled table of ``table_size + 1`` evenly spaced
        values rides on-device and each pixel cycles it from a cursor at
        its global pixel id (the per-pixel-stream adaptation of the
        shared sequential cursor — same adaptation the reference makes
        for ``seed_dist`` in ``src/render.cl:233``).
      table_size: ``max_values`` of the ``vec_dist`` table ("table" RNG
        only; reference debug value 1000, ``src/cpu_renderer.cpp:146``).
      sampler: "angle" is the reference's angle-uniform hemisphere sampler
        (``src/geom.h:164-177`` — NOT cosine weighted; paired with the
        reference's p = 1/(2π) it is a *biased* estimator, reproduced
        deliberately for conformance); "cosine" is the variance-optimal
        cosine-weighted mode (quality); "uniform" is solid-angle-uniform
        (unbiased, higher variance — cross-checks "cosine").
      intersect: implementation of the brute-force rays×triangles nearest
        hit. "reference" = straight Möller–Trumbore in XLA; "pluecker" =
        the MXU matmul formulation; "pallas" = the tiled Pallas TPU
        kernel (fp32-accurate: the K-packed bf16 split computes the
        exact fp32 product set but sums it in a different order —
        ~1e-5 relative on distances, nearest indices preserved on all
        conformance suites); "pallas_fast" = the same kernel keeping
        only the hi/lo cross terms (~0.03% of nearest indices may flip
        on near-ties).
      nee: next-event estimation — at every path vertex, additionally
        sample a point on an emissive triangle and add the area-form
        direct-light term (``ops/nee.py``). Lower variance AND the source
        of smooth (reparameterized) camera/vertex gradients. Requires
        rng="threefry" or "hash" (the conformance LCG stream layout has
        no slot for the extra draws); the fused quality megakernel
        additionally requires "hash" (``megakernel_quality.supported``).
      mis: with nee, combine the light sample and the BSDF-sampled
        emitter hits by the power heuristic (β=2) instead of dropping
        the latter — robust when lights are large or close, where BSDF
        sampling is the better strategy. Ignored without nee.
      rr_start: Russian-roulette start bounce (0 = off). From this bounce
        on, each path continues with probability q = max component of its
        throughput (clamped to [0.05, 1]) and surviving paths are
        reweighted by 1/q — the unbiased way to run deep ``max_bounces``
        without paying full variance-free depth everywhere. Requires
        rng="threefry" or "hash" (needs one extra uniform per bounce).
        Termination decisions are detached from gradients.
      stratify: stratify the first-bounce azimuth uniform across the spp
        samples (u -> (s + u)/spp) — lower variance at equal spp, exact
        same estimator in expectation. Requires rng="threefry" or "hash".
      vis_grad: visibility (silhouette) gradients for emitter hits via
        warped-area reparameterization: BSDF-sampled emitter hits are
        re-expressed in the emitter triangle's detached barycentric
        frame, so the hit point follows the moving light and the
        solid-angle→area Jacobian (2A·cosθ_l/r²) carries the boundary
        term. The correction factor is exactly 1.0 in the forward pass
        (bit-identical images); it only adds gradient paths — e.g.
        translating an area light gets the finite-difference gradient
        instead of the detached-sampling 0. With nee, occluder (blocker)
        silhouettes in shadows are additionally recovered by explicit
        edge sampling of the shadow boundary
        (``ops/warp.py::nee_boundary_term``, two extra hash draws whose
        term is forward-exact 0).
      remat: rematerialize each sample's trace in the backward pass
        (``jax.checkpoint`` on the sample-scan body). Essential at high
        spp: without it every sample's per-bounce residuals live until
        the backward pass (~HBM × spp); with it memory is one sample's
        worth at ~1.5× the FLOPs. Applies to the scanned (spp > 8) path.
      tri_block: triangle chunk size for the blocked/streamed intersection
        paths (keeps (rays × tri_block) intermediates bounded for large
        scenes).
      ray_tile: rays processed per Pallas grid step.
    """

    width: int = 640
    height: int = 480
    spp: int = 128
    max_bounces: int = 5
    rng: Literal["lcg", "threefry", "hash", "table"] = "lcg"
    sampler: Literal["angle", "cosine", "uniform"] = "angle"
    intersect: Literal[
        "reference", "pluecker", "pallas", "pallas_fast"
    ] = "reference"
    nee: bool = False
    mis: bool = True
    rr_start: int = 0
    stratify: bool = False
    vis_grad: bool = False
    table_size: int = 1000
    remat: bool = True
    tri_block: int = 512
    ray_tile: int = 2048

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


#: Conformance config: matches the stable machine-independent reference
#: semantics (GPU kernels' seed-by-pixel LCG + angle-uniform sampler).
CONFORMANCE = RenderConfig(rng="lcg", sampler="angle", intersect="reference")

#: Quality config: threefry RNG + cosine-weighted sampling + NEE + fast
#: kernels.
QUALITY = RenderConfig(
    rng="threefry", sampler="cosine", intersect="pluecker", nee=True
)
