"""Visibility (silhouette) gradients via warped-area reparameterization.

Detached sampling differentiates only the smooth part of the estimator:
the indicator "this BSDF-sampled ray hits the emitter" is a step
function of the scene parameters, so translating an area light has a
detached gradient of ~0 even though the image clearly changes (the
reference's discrete nearest-hit argmin, ``src/cpu_renderer.cpp:44``,
is the non-differentiable structure being smoothed here).

The fix re-expresses the emitter-hit sample in the emitter triangle's
own barycentric frame (Loubet et al. 2019 / Bangaru et al. 2020 style
change of variables).  Write the hit as ``y(θ) = v0 + u·e1 + v·e2``
with the barycentrics ``(u, v)`` DETACHED at their sampled values: the
hit point now *moves with the triangle*, the direction
``ω(θ) = (y − o)/r`` rotates with it, and the solid-angle → barycentric
Jacobian

    |dω/d(u,v)| = |e1 × e2| · |cosθ_l| / r²

carries the boundary (silhouette) term.  The Monte-Carlo contribution
of the hit becomes

    f(ω(θ)) · |J(θ)| / stop_grad(p(ω₀) · |J(θ₀)|)

whose ratio to the detached estimator is the scalar factor computed
here:

    C(θ) = [cosθ_prev(ω(θ)) · |e1×e2| · |cosθ_l(θ)| / r(θ)²]
           / stop_grad(same at θ₀)

(``cosθ_prev`` is the ω-dependent part of the BSDF·cos/pdf chain at the
previous path vertex — identical for the angle/uniform/cosine samplers,
whose pdfs are all detached constants or cancel).  ``C ≡ 1.0`` in the
forward pass (x/x with identical float computation), so enabling it
cannot change a rendered image — it only adds gradient paths.

This warp tracks the emitter's OWN edges exactly (unbiased for light
silhouettes: translation, rotation, scaling of emitters).  Boundaries
caused by a *different* triangle occluding the emitter move with the
occluder, not the emitter; those need the auxiliary-ray warp
(`shadow_warp_factor`), which smoothly blends occluder-following and
light-following velocities (Bangaru et al. 2020's harmonic weights,
specialized to triangle scenes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _sg(x):
    return lax.stop_gradient(x)


def reparam_emitter_factor(o, d, v0h, e1h, e2h, nh, prev_n, hit):
    """Per-lane warped-area correction factor for emitter hits.

    Args:
      o: ``(N, 3)`` ray origins (the previous path vertex) —
        differentiable.
      d: ``(N, 3)`` sampled (detached) ray directions.
      v0h, e1h, e2h: ``(N, 3)`` the HIT triangle's vertex/edges, gathered
        at the nearest-hit index — differentiable in scene vertices.
      nh: ``(N, 3)`` the hit triangle's (unnormalized OK) normal —
        differentiable.
      prev_n: ``(N, 3)`` hemisphere axis the direction was sampled
        about at the previous vertex, or ``None`` at bounce 0. Detached
        here (its smooth chain already lives in the throughput weight).
      hit: ``(N,)`` bool — lanes whose factor is meaningful.

    Returns ``(N,)`` float32, exactly 1.0 forward, carrying the
    silhouette gradient backward. Lanes failing the validity guard
    (grazing cosθ_l, degenerate r) return exactly 1.0 with no gradient.
    """
    d = _sg(d)
    # Detached barycentrics of the hit (Möller–Trumbore, all inputs sg).
    v0s, e1s, e2s = _sg(v0h), _sg(e1h), _sg(e2h)
    s = _sg(o) - v0s
    h = jnp.cross(d, e2s)
    a = jnp.sum(e1s * h, axis=-1)
    safe_a = jnp.where(jnp.abs(a) > 0.0, a, jnp.float32(1.0))
    f = jnp.float32(1.0) / safe_a
    q = jnp.cross(s, e1s)
    u = f * jnp.sum(s * h, axis=-1)
    v = f * jnp.sum(d * q, axis=-1)

    # Hit point in the (differentiable) triangle frame.
    y = v0h + u[:, None] * e1h + v[:, None] * e2h
    delta = y - o
    r2 = jnp.sum(delta * delta, axis=-1)

    # Validity must be decided BEFORE the guarded math: a
    # ``where(valid, f(x), 1)`` still differentiates f on masked lanes,
    # so every input below is first clamped on those lanes (the
    # "double where" pattern) to keep inf·0 out of the backward pass.
    valid0 = hit & (_sg(r2) > jnp.float32(1e-16)) & (
        jnp.abs(_sg(a)) >= jnp.float32(1e-14))
    r2c = jnp.where(valid0, r2, jnp.float32(1.0))
    r = jnp.sqrt(r2c)
    omega = jnp.where(valid0[:, None], delta, _sg(d)) / r[:, None]

    cross = jnp.cross(e1h, e2h)
    ta2 = jnp.sum(cross * cross, axis=-1)
    two_area = jnp.sqrt(jnp.where(
        _sg(ta2) > jnp.float32(1e-20), ta2, jnp.float32(1.0)))
    nl2 = jnp.sum(nh * nh, axis=-1)
    nlen = jnp.sqrt(jnp.where(
        _sg(nl2) > jnp.float32(1e-20), nl2, jnp.float32(1.0)))
    cos_l = jnp.abs(jnp.sum(nh * omega, axis=-1)) / nlen
    if prev_n is None:
        cos_p = jnp.ones_like(cos_l)
    else:
        cos_p = jnp.sum(omega * _sg(prev_n), axis=-1)

    num = cos_p * two_area * cos_l / r2c
    den = _sg(num)
    valid = valid0 & (den > jnp.float32(1e-12)) & jnp.isfinite(den)
    safe_num = jnp.where(valid, num, jnp.float32(1.0))
    safe_den = jnp.where(valid, den, jnp.float32(1.0))
    return safe_num / safe_den


def _project_to_plane(p, d, v0, nrm):
    """Distance along ``d`` from ``p`` to the plane ``(v0, nrm)``;
    inf-guarded."""
    denom = jnp.sum(d * nrm, axis=-1)
    safe = jnp.where(jnp.abs(denom) > jnp.float32(1e-12), denom,
                     jnp.float32(1.0))
    t = jnp.sum((v0 - p) * nrm, axis=-1) / safe
    return t, jnp.abs(denom) > jnp.float32(1e-12)


def shadow_warp_point(p, y0, occ_hit, occ_v0, occ_e1, occ_e2,
                      occ_u, occ_v, light_v0, light_n):
    """Warped light-plane point for ONE (possibly occluded) shadow ray.

    If the shadow ray ``p → y0`` is blocked by an occluder triangle, the
    blocking point ``x(θ) = occ_v0 + u·occ_e1 + v·occ_e2`` (detached
    barycentrics) moves with the occluder; re-projecting the ray
    ``p → x(θ)`` onto the (differentiable) light plane yields a point
    that tracks the occluder's silhouette as cast onto the light.  If
    unblocked, the point follows the light's own frame (``y0`` as given,
    already differentiable through the area parameterization).

    Returns ``(N, 3)`` warped points equal to ``y0`` at θ₀ on blocked
    lanes up to float round-trip (the caller divides by the stop_grad of
    the same computation, so the forward value cancels exactly).
    """
    x = occ_v0 + occ_u[:, None] * occ_e1 + occ_v[:, None] * occ_e2
    dirx = x - p
    t, ok = _project_to_plane(p, dirx, light_v0, light_n)
    y_occ = p + t[:, None] * dirx
    use = (occ_hit & ok)[:, None]
    return jnp.where(use, y_occ, y0)
