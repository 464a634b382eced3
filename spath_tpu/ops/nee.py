"""Next-event estimation (direct light sampling) — quality/gradient mode.

The reference renderer has no light sampling: paths only find the area
light by chance through hemisphere sampling (``src/cpu_renderer.cpp:58``),
which is both high-variance and — crucially for the differentiable
framework — gives an estimator whose camera/vertex gradients are
visibility-only step functions (see tests/test_grad.py).

NEE fixes both. At each path vertex p we draw a point y *on* an emissive
triangle by barycentric reparameterization::

    b1 = 1 - sqrt(u1); b2 = u2 * sqrt(u1)          (area-uniform)
    y  = v0 + b1·(v1-v0) + b2·(v2-v0)

and add the area-form direct-light contribution::

    L_d = albedo/π · emit_ℓ · cosθ_s · cosθ_ℓ / r² · (A_ℓ / q_ℓ) · V(p,y)

Because y, A_ℓ, r, and both cosines are smooth functions of the light's
vertices and of p (hence of camera pose and scene geometry), ``jax.grad``
of an NEE render carries the smooth shading gradients finite differences
see — the "reparameterized sampling" half of the BASELINE north star,
with V (the shadow test) remaining the detached discrete part.

Light selection: a categorical draw over per-triangle weights
``luminance(emission)·area``. The selection probability q is
stop-gradient-ed; the estimator ``f·A/q`` is exactly ``∫_A f dA`` in
expectation for ANY fixed q>0, so detaching q keeps the reparameterized
gradient unbiased for the interior integral.

Lights are double-sided (cosθ_ℓ = |n_ℓ·ω|), matching the reference where
emission is returned for a hit from either side
(``src/cpu_renderer.cpp:67`` adds emittance unconditionally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from spath_tpu.config import RenderConfig
from spath_tpu.ops.intersect import nearest_hit
from spath_tpu.scene import Scene

# numpy scalars, NOT jnp: a module-level jnp scalar is a committed
# device buffer, and executables that close over one run ~400x slower
# on the remote-TPU (axon) path than ones with inlined literals.
INV_PI = np.float32(1.0 / np.pi)


def triangle_areas(scene: Scene) -> jax.Array:
    """(T,) triangle areas, differentiable in vertices."""
    e1 = scene.v1 - scene.v0
    e2 = scene.v2 - scene.v0
    return 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)


def light_cdf(scene: Scene):
    """Selection distribution over triangles ∝ luminance(emission)·area.

    Returns ``(cdf (T,), prob (T,))``, both stop-gradient-ed (selection
    is a detached discrete choice). All-dark scenes get a uniform cdf and
    ``prob`` of zeros — callers mask contributions by ``prob > 0``.
    """
    lum = jnp.sum(scene.emission, axis=-1)
    w = lax.stop_gradient(lum * triangle_areas(scene))
    total = jnp.sum(w)
    safe_total = jnp.where(total > 0, total, jnp.float32(1.0))
    prob = jnp.where(total > 0, w / safe_total, 0.0)
    cdf = jnp.cumsum(prob)
    # Degenerate all-dark fallback: uniform cdf keeps searchsorted valid.
    t = scene.n_tris
    cdf = jnp.where(total > 0, cdf, jnp.arange(1, t + 1, dtype=jnp.float32) / t)
    return cdf, prob


def sample_light_points(scene: Scene, u_sel, u1, u2):
    """Sample N points on emissive triangles.

    Args:
      u_sel, u1, u2: ``(N,)`` uniforms — selection, barycentric 1 & 2.

    Returns dict with ``y (N,3)`` light points, ``normal (N,3)`` light
    unit normals, ``emission (N,3)``, ``area (N,)``, ``prob (N,)``
    detached selection probabilities, ``idx (N,)`` chosen triangle.
    """
    from spath_tpu.ops.gather import fused_row_gather

    cdf, prob = light_cdf(scene)
    idx = jnp.searchsorted(cdf, u_sel, side="right").astype(jnp.int32)
    idx = jnp.clip(idx, 0, scene.n_tris - 1)
    idx = lax.stop_gradient(idx)

    v0, v1, v2, emission, prob_rows = fused_row_gather(
        (scene.v0, scene.v1, scene.v2, scene.emission, prob[:, None]), idx
    )
    su1 = jnp.sqrt(u1)
    b1 = 1.0 - su1
    b2 = u2 * su1
    y = v0 + b1[:, None] * (v1 - v0) + b2[:, None] * (v2 - v0)

    n = jnp.cross(v1 - v0, v2 - v0)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    area = 0.5 * norm[:, 0]
    unit_n = n / jnp.maximum(norm, 1e-20)
    return {
        "y": y,
        "normal": unit_n,
        "emission": emission,
        "area": area,
        "prob": prob_rows[:, 0],
        "idx": idx,
    }


def direct_light(
    scene: Scene,
    p: jax.Array,
    n_s: jax.Array,
    hit_idx: jax.Array,
    u_sel: jax.Array,
    u1: jax.Array,
    u2: jax.Array,
    cfg: RenderConfig,
    hit_albedo: jax.Array | None = None,
):
    """Direct radiance at surface points p with shading normals n_s.

    Returns ``(N, 3)`` — the ``albedo/π · emit · G · A/q · V`` estimator.
    Zero wherever the chosen triangle is non-emissive, the light is below
    the surface horizon, or the shadow ray is occluded. ``hit_idx`` is
    the surface's own triangle (excluded from the shadow trace, the
    reference's source-exclusion convention). ``hit_albedo`` lets the
    caller pass the already-gathered surface albedo to avoid a second
    gather.

    With ``cfg.mis`` the contribution carries the power-heuristic weight
    against the BSDF strategy's pdf for the same direction (the partner
    weight is applied to BSDF-sampled emitter hits in the path tracer).
    """
    s = sample_light_points(scene, u_sel, u1, u2)
    delta = s["y"] - p
    r2 = jnp.sum(delta * delta, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, 1e-20))
    omega = delta / r[:, None]

    cos_s = jnp.sum(n_s * omega, axis=-1)
    cos_l = jnp.abs(jnp.sum(s["normal"] * omega, axis=-1))

    # Shadow ray: the nearest hit (excluding the source surface) must be
    # the sampled light triangle itself.
    _, occ_idx = nearest_hit(
        p, omega, scene.v0, scene.v1, scene.v2, hit_idx, cfg
    )
    visible = occ_idx == s["idx"]

    # Same-triangle degenerate case (surface IS the chosen light): the
    # shadow ray excludes it, making "visible" meaningless — and a
    # point doesn't light itself; mask it.
    valid = (
        visible
        & (s["prob"] > 0)
        & (cos_s > 0)
        & (s["idx"] != hit_idx)
    )
    valid = lax.stop_gradient(valid)

    g = cos_s * cos_l / jnp.maximum(r2, 1e-12)
    weight = s["area"] / jnp.maximum(s["prob"], 1e-20)
    if hit_albedo is None:
        hit_albedo = scene.albedo[jnp.maximum(hit_idx, 0)]
    contrib = hit_albedo * INV_PI * s["emission"] * (g * weight)[:, None]

    if cfg.mis and cfg.sampler != "angle":
        # (the angle sampler's pdf/weight mismatch is a reference quirk;
        # NEE with it stays pure-NEE — matches the path tracer's gate)
        # Power heuristic (β=2) vs the BSDF strategy's solid-angle pdf
        # for this same direction. Weights are detached — they are
        # combination coefficients, not part of the integrand. r² is
        # clamped: dead lanes sit at ~MAX_DIST offsets whose pdf² would
        # overflow to inf and NaN-poison the where-transpose.
        p_nee = (
            s["prob"] / jnp.maximum(s["area"], 1e-20)
        ) * jnp.minimum(r2, 1e12) / jnp.maximum(cos_l, 1e-6)
        p_bsdf = bsdf_pdf(cfg.sampler, cos_s)
        w = p_nee * p_nee / jnp.maximum(
            p_nee * p_nee + p_bsdf * p_bsdf, 1e-30
        )
        contrib = contrib * lax.stop_gradient(w)[:, None]
    return jnp.where(valid[:, None], contrib, 0.0)


def bsdf_pdf(sampler: str, cos_theta: jax.Array) -> jax.Array:
    """Solid-angle pdf of the hemisphere sampler at angle cosθ from the
    shading normal (for MIS weights)."""
    if sampler == "cosine":
        return jnp.maximum(cos_theta, 0.0) * INV_PI
    if sampler == "uniform":
        return jnp.full_like(cos_theta, np.float32(0.5 / np.pi))
    raise ValueError(f"MIS unsupported for sampler {sampler!r}")


def nee_pdf_of_hit(prob, area, dist, cos_l) -> jax.Array:
    """Solid-angle pdf the NEE strategy would have assigned to hitting
    this emitter point via BSDF sampling: (q/A)·r²/|cosθ_l|.

    ``dist`` is clamped: miss lanes carry MAX_DIST=1e12 whose square
    overflows float32 to inf, and an inf/inf in the (masked) MIS weight
    would poison gradients through the where-transpose even though the
    forward value is discarded.
    """
    d = jnp.minimum(dist, 1e6)
    return (
        prob / jnp.maximum(area, 1e-20)
    ) * d * d / jnp.maximum(cos_l, 1e-6)
