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
caused by a *different* triangle occluding move with the occluder, not
the emitter; those are handled by explicit edge sampling of the shadow
boundary (`nee_boundary_term`) for the NEE direct term.
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


def nee_boundary_term(scene, p, n_s, hit_albedo, hit_idx, u_sel,
                      u_edge, u_s, cfg, hit):
    """Edge-sampled shadow-boundary gradient for the NEE direct term.

    The NEE estimator's visibility factor V(p↔y) is a step function of
    any parameter that moves an occluder, so detached sampling gives a
    zero gradient for blocker translation even though the shadow clearly
    moves. By the Reynolds transport theorem the missing piece is a line
    integral over the shadow boundary on the light's surface:

        dI/dθ ⊃ ∮_C f_A(y) · (∂y/∂θ · m̂) dl

    where C is the projection of occluder EDGES onto the light plane and
    m̂ the in-plane normal pointing into the shadow (the lit region's
    outward normal). For triangle scenes C is piecewise the projection
    of the 3T mesh edges, so it can be Monte-Carlo sampled exactly
    (redner-style edge sampling, specialized to the direct-light term):
    pick edge e uniformly (prob 1/3T), pick s ~ U[0,1] along it, project
    x(s) from the shading point p onto the (differentiable) plane of the
    sampled light, and — if the projected point lies on a real, visible
    shadow boundary — emit

        f_A(y)·detached  ×  [ (y(θ) − stop_grad(y(θ))) · m̂ ]  ×  |∂y/∂s| · 3T / prob_light

    whose forward value is exactly 0 and whose gradient is the boundary
    integral. ``y(θ)`` is differentiable through the edge endpoints
    (blocker vertices), the shading point p (camera/geometry chains) and
    the light plane (light vertices), so translation AND rotation of
    blockers, receivers, and lights all pick up their silhouette terms.

    Validity of a sample (all detached): the edge must lie strictly
    between p and the light plane (t_plane > 1), project inside the
    light triangle, belong to neither the light nor the shading surface,
    and the lit side of the boundary must actually see the light (a
    shadow ray nudged off the edge by δ = 1e-3·r toward the lit side
    must hit the light). The δ-nudge avoids the measure-zero grazing
    ambiguity of testing exactly on the edge; it biases features thinner
    than ~δ·r, which is the usual edge-sampling tradeoff.

    In MIS mode the returned term carries the NEE strategy's power
    heuristic weight at the boundary point (smooth, detached); the BSDF
    strategy's own blocker boundaries are not yet sampled — light
    silhouettes of BSDF emitter hits come from
    ``reparam_emitter_factor`` instead.

    Returns ``(N, 3)``: add ``throughput * term`` to the radiance.
    """
    import numpy as np

    from spath_tpu.ops.gather import fused_row_gather
    from spath_tpu.ops.intersect import nearest_hit
    from spath_tpu.ops.nee import INV_PI, bsdf_pdf, light_cdf

    v0, v1, v2 = scene.v0, scene.v1, scene.v2
    t = scene.n_tris

    # light selection — identical draws/semantics as sample_light_points
    cdf, prob = light_cdf(scene)
    li = jnp.clip(
        jnp.searchsorted(cdf, u_sel, side="right").astype(jnp.int32),
        0, t - 1)
    li = _sg(li)
    lv0, lv1, lv2, lemi, lprob_r = fused_row_gather(
        (v0, v1, v2, scene.emission, prob[:, None]), li)
    lprob = lprob_r[:, 0]
    le1, le2 = lv1 - lv0, lv2 - lv0
    ln = jnp.cross(le1, le2)            # unnormalized, differentiable

    # edge pick: uniform over the 3T mesh edges
    n_e = 3 * t
    e_id = _sg(jnp.clip((u_edge * n_e).astype(jnp.int32), 0, n_e - 1))
    tri_e = e_id // 3
    k = e_id % 3
    ev0, ev1, ev2 = fused_row_gather((v0, v1, v2), tri_e)
    k3 = k[:, None]
    ea = jnp.where(k3 == 0, ev0, jnp.where(k3 == 1, ev1, ev2))
    eb = jnp.where(k3 == 0, ev1, jnp.where(k3 == 1, ev2, ev0))
    ec = jnp.where(k3 == 0, ev2, jnp.where(k3 == 1, ev0, ev1))

    s_ = _sg(u_s)[:, None]
    x = ea + s_ * (eb - ea)
    dirx = x - p
    denom = jnp.sum(dirx * ln, axis=-1)
    plane_d = jnp.sum((lv0 - p) * ln, axis=-1)
    ok0 = hit & (jnp.abs(_sg(denom)) > jnp.float32(1e-12))
    den_s = jnp.where(ok0, denom, jnp.float32(1.0))
    tq = plane_d / den_s
    y_e = p + tq[:, None] * dirx         # differentiable boundary point
    yd = _sg(y_e)

    # ---- everything below is DETACHED geometry/validity ----
    lv0d, le1d, le2d, lnd = _sg(lv0), _sg(le1), _sg(le2), _sg(ln)
    pd = _sg(p)
    nn = jnp.maximum(jnp.sum(lnd * lnd, axis=-1), jnp.float32(1e-20))
    rel = yd - lv0d
    b1 = jnp.sum(jnp.cross(rel, le2d) * lnd, axis=-1) / nn
    b2 = jnp.sum(jnp.cross(le1d, rel) * lnd, axis=-1) / nn
    inside = (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)

    # arc-length factor and in-plane curve normal of s -> y(s)
    dirxd, tqd = _sg(dirx), _sg(tq)
    ebad = _sg(eb - ea)
    tqp = -tqd * jnp.sum(ebad * lnd, axis=-1) / _sg(den_s)
    dy_ds = tqp[:, None] * dirxd + tqd[:, None] * ebad
    arc = jnp.sqrt(jnp.maximum(jnp.sum(dy_ds * dy_ds, axis=-1),
                               jnp.float32(1e-20)))
    t_dir = dy_ds / arc[:, None]
    ln_unit = lnd / jnp.sqrt(nn)[:, None]
    m0 = jnp.cross(t_dir, ln_unit)
    m0 = m0 / jnp.sqrt(jnp.maximum(jnp.sum(m0 * m0, axis=-1,
                                           keepdims=True),
                                   jnp.float32(1e-20)))
    # orient toward the blocker's projected interior (= the shadow)
    dirc = _sg(ec) - pd
    denc = jnp.sum(dirc * lnd, axis=-1)
    okc = jnp.abs(denc) > jnp.float32(1e-12)
    tqc = _sg(plane_d) / jnp.where(okc, denc, jnp.float32(1.0))
    y_c = pd + tqc[:, None] * dirc
    side = jnp.sum(m0 * (y_c - yd), axis=-1)
    mhat = m0 * jnp.sign(side)[:, None]

    # lit-side visibility: nudge off the edge toward the lit side
    delta = yd - pd
    r2 = jnp.sum(delta * delta, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, jnp.float32(1e-20)))
    eps_off = (jnp.float32(1e-3) * r)[:, None]
    y_test = yd - eps_off * mhat
    om = (y_test - pd)
    om = om / jnp.sqrt(jnp.maximum(jnp.sum(om * om, axis=-1,
                                           keepdims=True),
                                   jnp.float32(1e-20)))
    _, occ = nearest_hit(pd, om, _sg(v0), _sg(v1), _sg(v2), hit_idx, cfg)

    omega = delta / r[:, None]
    cos_s = jnp.sum(_sg(n_s) * omega, axis=-1)
    cos_l = jnp.abs(jnp.sum(ln_unit * omega, axis=-1))
    valid = (
        ok0 & okc & inside & hit
        & (tq > jnp.float32(1.0 + 1e-4)) & (tqc > 0.0)
        & (occ == li) & (lprob > 0.0) & (cos_s > 0.0)
        & (tri_e != li) & (tri_e != hit_idx)
        & (jnp.abs(side) > jnp.float32(1e-9))
    )

    f_scalar = cos_s * cos_l / jnp.maximum(r2, jnp.float32(1e-12))
    if cfg.mis and cfg.sampler != "angle":
        p_nee = (lprob / jnp.maximum(
            0.5 * jnp.sqrt(nn), jnp.float32(1e-20))
        ) * jnp.minimum(r2, jnp.float32(1e12)) / jnp.maximum(
            cos_l, jnp.float32(1e-6))
        p_b = bsdf_pdf(cfg.sampler, cos_s)
        f_scalar = f_scalar * p_nee * p_nee / jnp.maximum(
            p_nee * p_nee + p_b * p_b, jnp.float32(1e-30))

    crossing = jnp.sum((y_e - yd) * mhat, axis=-1)   # forward-exact 0
    w = (arc * np.float32(float(n_e))
         / jnp.maximum(lprob, jnp.float32(1e-20)))
    scale = jnp.where(valid, _sg(f_scalar * w), 0.0) * crossing
    f_rgb = _sg(hit_albedo) * INV_PI * _sg(lemi)
    return f_rgb * scale[:, None]


