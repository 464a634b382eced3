"""Wavefront Monte-Carlo path tracer — the flagship forward model.

TPU-native re-design of the reference's 5-bounce Lambertian path tracer.
Where the CPU backend recurses per pixel (``src/cpu_renderer.cpp:30-68``)
and the Vulkan kernel walks forward storing per-bounce stacks then
accumulates backward (``src/render.comp:160-215``), this implementation
keeps the whole ray *wavefront* (every pixel) in flight simultaneously
and uses the mathematically equivalent **forward throughput** form::

    L       = Σ_b  throughput_b · emittance[hit_b]
    thru_0  = 1
    thru_b+1= thru_b · albedo[hit_b] · w_b

with ``w_b = BRDF_scale·cosθ/p = 2·cosθ`` for the reference's
angle-uniform sampler (``src/cpu_renderer.cpp:60-67``) or ``w_b = 1`` for
the cosine-weighted quality sampler (pdf cancels). The bounce loop is a
statically-unrolled masked scan — no data-dependent control flow, so XLA
compiles one straight-line program; dead rays are masked lanes, not
branches.

Sample loop: ``lax.scan`` carrying (rng_state, accumulator) so the
per-sample radiance is reduced in-register rather than materialized as a
``(spp, N, 3)`` buffer.

Conformance: with ``cfg.rng='lcg'`` + ``cfg.sampler='angle'`` the RNG
stream advances exactly like the reference's per-pixel-seeded kernels
(2 draws per hit, none on miss — ``src/render.comp:173-197``), so images
match the oracle to float tolerance.

Differentiability (detached sampling): sampled directions and hit
indices are ``stop_gradient``-ed; gradients flow through hit distances
(→ hit points → downstream intersections), shading normals, cosθ,
albedo, emission, and camera ray origins/directions. This makes
``jax.grad`` of a loss over the image w.r.t. ``Scene`` and ``Camera``
well-defined and finite-difference-checkable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from spath_tpu.camera import Camera, generate_rays
from spath_tpu.config import RenderConfig
from spath_tpu.ops.gather import fused_row_gather
from spath_tpu.ops.intersect import nearest_hit
from spath_tpu.ops.nee import direct_light
from spath_tpu.ops.rng import lcg_next, per_pixel_uniforms, pixel_seeds
from spath_tpu.ops.sampling import hemisphere_sample
from spath_tpu.scene import Scene


def _bounce_uniforms(cfg, rng_state, hit, bounce, pixel_ids, n,
                     sample_idx=None):
    """Draw the per-ray uniforms for a bounce and advance the RNG.

    LCG mode: state is the per-pixel uint32 seed; it advances twice but
    ONLY where the ray actually hit (reference semantics — the sampler is
    only reached after a hit, ``src/cpu_renderer.cpp:51-58``).
    Threefry mode: state is a key already folded per sample; per-bounce
    subkeys are folded in here and each pixel's draw is keyed by its
    *global* pixel id (counter-based — no sequential state, and
    bit-identical under any sharding of the wavefront). With NEE three
    extra uniforms are drawn (light selection + 2 barycentric).

    Returns ``(state, us)`` where ``us`` has shape ``(2 or 5, N)``.
    """
    if cfg.rng == "lcg":
        s1, u1 = lcg_next(rng_state)
        s2, u2 = lcg_next(s1)
        new_state = jnp.where(hit, s2, rng_state)
        return new_state, jnp.stack([u1, u2])
    if cfg.rng == "table":
        from spath_tpu.ops.rng import device_table, table_uniforms

        table = jnp.asarray(device_table(cfg.table_size))
        s = 0 if sample_idx is None else sample_idx
        return rng_state, table_uniforms(
            table, pixel_ids, s, bounce, 2, cfg.max_bounces,
            offset=rng_state)
    n_draws = (5 if cfg.nee else 2) + (1 if cfg.rr_start else 0) \
        + (2 if (cfg.vis_grad and cfg.nee) else 0)
    if cfg.rng == "hash":
        from spath_tpu.ops.rng import hash_uniforms

        s = 0 if sample_idx is None else sample_idx
        return rng_state, hash_uniforms(
            rng_state, pixel_ids, s, bounce, n_draws)
    k = jax.random.fold_in(rng_state, bounce)
    return rng_state, per_pixel_uniforms(k, pixel_ids, n_draws)


def _tri_dist(o, d, v0h, e1h, e2h, hit):
    """Differentiable hit distance of ray ``(o, d)`` against its KNOWN
    hit triangle ``(v0h, e1h, e2h)`` — O(1) per lane (no O(T) sweep).

    Möller–Trumbore ``t = dot(e2, s × e1) / dot(e1, d × e2)`` with the
    direction detached (detached-sampling policy). Forward equals the
    sweep's distance to reassociation ulps; since the vis-residual's
    forward value is exactly zero regardless, only the GRADIENT
    evaluation point shifts by those ulps. Non-hit lanes return 0 with
    no gradient (double-where guard)."""
    d = lax.stop_gradient(d)
    h = jnp.cross(d, e2h)
    a = jnp.sum(e1h * h, axis=-1)
    valid = hit & (jnp.abs(lax.stop_gradient(a)) > jnp.float32(1e-12))
    ac = jnp.where(valid, a, jnp.float32(1.0))
    s = o - v0h
    q = jnp.cross(s, e1h)
    t = jnp.sum(e2h * q, axis=-1) / ac
    return jnp.where(valid, t, jnp.float32(0.0))


def trace_radiance(
    scene: Scene,
    origins: jax.Array,
    directions: jax.Array,
    cfg: RenderConfig,
    rng_state,
    pixel_ids: jax.Array | None = None,
    return_aux: bool = False,
    first_hit=None,
    sample_idx=None,
    vis_residual: bool = False,
    hits_replay=None,
):
    """Trace ONE sample per ray. Returns ``(radiance (N,3), rng_state)``.

    ``pixel_ids`` are the rays' global pixel indices (default
    ``arange(N)``) — they key the counter-based threefry streams so a
    sharded wavefront draws the same randoms as a single-device one.

    ``return_aux``: additionally return a dict of per-bounce
    observability metrics (``alive_fraction (B,)`` — the wavefront
    occupancy that stream compaction would reclaim).

    ``first_hit``: optional precomputed ``(dist, idx)`` of the camera
    rays. Camera rays are identical for every sample, so their
    (deterministic) intersection can be hoisted out of the sample loop —
    bit-identical results, one fewer nearest-hit sweep per sample.

    ``vis_residual``: compute ONLY the visibility terms of the vis_grad
    estimator — the warped-area factor ``term·(C − 1)`` (forward exactly
    zero, ``C ≡ 1``) and the edge-sampled shadow-boundary term (forward
    exactly zero by construction). The walk itself runs fully DETACHED
    (same draws, same hits, same throughput values — every non-vis
    radiance accumulation is dropped and every throughput update is
    stop_gradient'ed), while a parallel DIFFERENTIABLE position chain
    re-derives each hit point from the known hit triangle in O(1) per
    lane, so the vis terms see the same position/geometry gradients the
    full wavefront autodiff would. Because the returned radiance is an
    exact zero, it composes ADDITIVELY around any interior backend:
    ``grad(fused_interior + residual) == grad(wavefront with vis_grad)``
    — the decomposition behind ``VisGradFusedRenderer``
    (models/renderer.py), which runs the interior fwd+bwd on the fused
    custom-VJP megakernels instead of the 61×-slower wavefront autodiff.

    ``hits_replay``: per-bounce ``[(dist (N,), idx (N,)), ...]`` nearest
    hits exported by the fused interior forward (round-5 item 4 —
    ``megakernel_bigscene_quality.render_bigscene_quality_with_hits``),
    replacing this walk's own O(N·T) detached sweeps; the walk is
    identical because the hash/threefry draws are counter-based (the
    kernel and this walk draw the same uniforms for the same (pixel,
    sample, bounce)), so the kernel's walk IS this walk. Only legal in
    ``vis_residual`` mode (the consumed hits are detached; the fused
    sweep's K-packed distances differ from the XLA sweep's by
    reassociation ulps — the residual's forward is exactly zero either
    way, only the gradient evaluation point shifts by those ulps, the
    ``_tri_dist`` argument).
    """
    if hits_replay is not None and not vis_residual:
        raise ValueError("hits_replay is a vis_residual-only replay")
    if cfg.nee and cfg.rng in ("lcg", "table"):
        raise ValueError("cfg.nee requires rng='threefry' or 'hash'")
    if (cfg.rr_start or cfg.stratify) and cfg.rng in ("lcg", "table"):
        raise ValueError("rr_start/stratify require rng='threefry'/'hash'")
    if vis_residual and not cfg.vis_grad:
        raise ValueError("vis_residual needs cfg.vis_grad")
    n = origins.shape[0]
    if pixel_ids is None:
        pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    v0, v1, v2 = scene.v0, scene.v1, scene.v2
    normals = scene.normals()
    # MIS needs a well-defined solid-angle BSDF pdf; the reference's
    # angle-uniform sampler deliberately mismatches its 1/(2π) weight,
    # so NEE with that sampler stays pure-NEE.
    use_mis = cfg.nee and cfg.mis and cfg.sampler != "angle"
    if use_mis:
        from spath_tpu.ops.nee import light_cdf, triangle_areas

        _, lprob = light_cdf(scene)                      # detached
        lareas = lax.stop_gradient(triangle_areas(scene))
        prev_pdf = jnp.zeros(n, jnp.float32)

    o, d = origins, directions
    sg = lax.stop_gradient
    if vis_residual:
        # detached walk geometry + a parallel differentiable position
        # chain (o_diff); the differentiable scene stays live only
        # through the per-hit gathers the vis terms consume.
        v0w, v1w, v2w = sg(v0), sg(v1), sg(v2)
        o_diff = origins
        o, d = sg(o), sg(d)
        if first_hit is not None:
            first_hit = (sg(first_hit[0]), first_hit[1])
    else:
        v0w, v1w, v2w = v0, v1, v2
    throughput = jnp.ones((n, 3), jnp.float32)
    radiance = jnp.zeros((n, 3), jnp.float32)
    alive = jnp.ones(n, bool)
    src = jnp.full(n, -1, jnp.int32)
    alive_fracs = []
    prev_n = None          # hemisphere axis d was sampled about

    for bounce in range(cfg.max_bounces):
        if hits_replay is not None:
            dist, idx = hits_replay[bounce]
            dist = sg(dist)
        elif bounce == 0 and first_hit is not None:
            dist, idx = first_hit
        else:
            dist, idx = nearest_hit(o, d, v0w, v1w, v2w, src, cfg)
        hit = alive & (idx >= 0)
        safe = jnp.maximum(idx, 0)
        hit3 = hit[:, None]
        point = o + dist[:, None] * d            # src/geom.h:218

        # One fused one-hot/MXU gather for all per-triangle attributes
        # (a plain per-attribute gather is ~10x slower on TPU).
        gtabs = [normals, scene.albedo, scene.emission]
        if use_mis:
            gtabs.append(jnp.stack([lprob, lareas], axis=1))
        if cfg.vis_grad:
            gtabs += [v0, v1 - v0, v2 - v0]
        gout = fused_row_gather(tuple(gtabs), safe)
        nrm, alb, emi = gout[0], gout[1], gout[2]
        if use_mis:
            hit_prob, hit_area = gout[3][:, 0], gout[3][:, 1]
        if cfg.vis_grad:
            v0h, e1h, e2h = gout[-3], gout[-2], gout[-1]
        flip = jnp.sum(nrm * d, axis=-1) > 0.0   # src/cpu_renderer.cpp:56
        adj_n = jnp.where(flip[:, None], -nrm, nrm)

        # Warped-area reparameterization of emitter hits: ≡1.0 forward,
        # carries the light-silhouette gradient backward (ops/warp.py).
        # Bounce 0 has no sampled direction to reparameterize (camera
        # rays are a fixed pixel grid) and keeps the detached semantics.
        if cfg.vis_grad and bounce >= 1:
            from spath_tpu.ops.warp import reparam_emitter_factor

            vis_c = reparam_emitter_factor(
                o_diff if vis_residual else o, d, v0h, e1h, e2h, nrm,
                prev_n, hit)[:, None]
        else:
            vis_c = None
        if vis_residual:
            # differentiable position chain: re-derive the hit point
            # from the known hit triangle (O(1)/lane), detached walk
            dist_diff = _tri_dist(o_diff, d, v0h, e1h, e2h, hit)
            point_diff = o_diff + dist_diff[:, None] * d

        rng_state, us = _bounce_uniforms(
            cfg, rng_state, hit, bounce, pixel_ids, n, sample_idx
        )
        u_az = us[0]
        if cfg.stratify and bounce == 0 and sample_idx is not None:
            # Stratify the first-bounce azimuth across the spp samples:
            # substream s draws from [s/spp, (s+1)/spp) — same marginal
            # distribution, lower variance.
            u_az = (jnp.float32(sample_idx) + u_az) * jnp.float32(
                1.0 / cfg.spp)
        next_d, weight = hemisphere_sample(cfg.sampler, adj_n, u_az, us[1])
        # Detached sampling: the direction is a constant of the backward
        # pass; cosθ keeps its dependence on the (differentiable) normal.
        next_d = lax.stop_gradient(next_d)
        if cfg.sampler in ("angle", "uniform"):
            # Recompute the 2·cosθ weight against the detached direction so
            # gradients flow only through the (differentiable) normal.
            cos_theta = jnp.sum(next_d * adj_n, axis=-1)
            weight = jnp.float32(2.0) * cos_theta

        if cfg.nee:
            # Camera-ray emitter hits count fully; deeper BSDF-sampled
            # emitter hits either carry the MIS partner weight or (pure
            # NEE) are dropped — the area sample covers direct light.
            if bounce == 0:
                if not vis_residual:
                    radiance = radiance + jnp.where(
                        hit3, throughput * emi, 0.0)
            elif use_mis:
                from spath_tpu.ops.nee import nee_pdf_of_hit

                cos_l = jnp.abs(jnp.sum(nrm * d, axis=-1))
                p_nee_here = nee_pdf_of_hit(hit_prob, hit_area, dist, cos_l)
                w_b = prev_pdf * prev_pdf / jnp.maximum(
                    prev_pdf * prev_pdf + p_nee_here * p_nee_here, 1e-30
                )
                w_b = lax.stop_gradient(w_b)
                if vis_residual:
                    # residual of term·C: sg(term)·(C − 1) — forward
                    # exactly 0 (C ≡ 1), backward = term·dC, the exact
                    # complement of the interior d(term)·C chain
                    term = sg(throughput * emi * w_b[:, None]) \
                        * (vis_c - jnp.float32(1.0))
                else:
                    term = throughput * emi * w_b[:, None]
                    if vis_c is not None:
                        term = term * vis_c
                radiance = radiance + jnp.where(hit3, term, 0.0)
            if not vis_residual:
                direct = direct_light(
                    scene, point, adj_n, safe, us[2], us[3], us[4], cfg,
                    hit_albedo=alb,
                )
                radiance = radiance + jnp.where(
                    hit3, throughput * direct, 0.0)
            if cfg.vis_grad:
                # shadow-boundary (blocker silhouette) gradient: a
                # forward-exact-0 edge-sampled line-integral term
                # (ops/warp.py::nee_boundary_term); draws sit AFTER the
                # rr slot so no existing stream shifts.
                from spath_tpu.ops.warp import nee_boundary_term

                ei = 5 + (1 if cfg.rr_start else 0)
                bnd = nee_boundary_term(
                    scene, point_diff if vis_residual else point,
                    adj_n, alb, safe, us[2],
                    us[ei], us[ei + 1], cfg, hit)
                thr_b = sg(throughput) if vis_residual else throughput
                radiance = radiance + jnp.where(hit3, thr_b * bnd, 0.0)
        else:
            if vis_residual:
                if vis_c is not None:
                    term = sg(throughput * emi) * (vis_c - jnp.float32(1.0))
                    radiance = radiance + jnp.where(hit3, term, 0.0)
            else:
                term = throughput * emi
                if vis_c is not None:
                    term = term * vis_c
                radiance = radiance + jnp.where(hit3, term, 0.0)
        throughput = jnp.where(
            hit3, throughput * alb * weight[:, None], throughput
        )
        if vis_residual:
            throughput = sg(throughput)
            o_diff = jnp.where(hit3, point_diff, o_diff)

        o = jnp.where(hit3, point, o)
        d = jnp.where(hit3, next_d, d)
        src = jnp.where(hit, idx, src)
        alive = hit
        prev_n = adj_n if prev_n is None else jnp.where(hit3, adj_n, prev_n)
        if cfg.rr_start and bounce >= cfg.rr_start \
                and bounce < cfg.max_bounces - 1:
            # Russian roulette on the CONTINUATION: survive with
            # probability q = max throughput component, reweight by 1/q.
            # The decision is detached; the 1/q reweight keeps gradients.
            q = lax.stop_gradient(jnp.clip(
                jnp.max(throughput, axis=-1), 0.05, 1.0))
            # rr draw index is FIXED at the end of the base draws, so
            # vis_grad's trailing edge draws never shift the rr stream.
            survive = us[5 if cfg.nee else 2] < q
            throughput = jnp.where(
                (hit & survive)[:, None], throughput / q[:, None],
                throughput,
            )
            alive = hit & survive
        if use_mis:
            from spath_tpu.ops.nee import bsdf_pdf

            cos_next = jnp.sum(next_d * adj_n, axis=-1)
            prev_pdf = lax.stop_gradient(bsdf_pdf(cfg.sampler, cos_next))
        if return_aux:
            alive_fracs.append(jnp.mean(alive.astype(jnp.float32)))

    if return_aux:
        return radiance, rng_state, {"alive_fraction": jnp.stack(alive_fracs)}
    return radiance, rng_state


def trace_mean_radiance(
    scene: Scene,
    origins: jax.Array,
    directions: jax.Array,
    cfg: RenderConfig,
    seed=0,
    pixel_ids: jax.Array | None = None,
    first_hit=None,
    vis_residual: bool = False,
    hits_replay=None,
) -> jax.Array:
    """Average ``cfg.spp`` radiance samples per ray → ``(N, 3)``.

    The shard-invariant core: rays + their global pixel ids in, mean
    radiance out. ``parallel.shard`` maps exactly this function over a
    device mesh.

    The camera rays' nearest hit is deterministic and shared by every
    sample, so it is computed once here and fed to each sample's trace
    (``first_hit``) — unless the caller already supplies it.

    ``hits_replay``: ``(dist (spp, B, N), idx (spp, B, N))`` hit export
    from the fused interior forward (vis_residual only) — every sweep
    this function would run, replayed for free (``trace_radiance``
    docstring).
    """
    n = origins.shape[0]
    if pixel_ids is None:
        pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    if hits_replay is not None:
        first_hit = ()            # sentinel: never used, never computed
    if first_hit is None:
        src = jnp.full(n, -1, jnp.int32)
        first_hit = nearest_hit(
            origins, directions, scene.v0, scene.v1, scene.v2, src, cfg
        )

    if cfg.rng == "lcg":
        # Per-pixel streams seeded by pixel index (src/render.cl:233).
        state0 = pixel_ids.astype(jnp.uint32) + jnp.uint32(seed)
    elif cfg.rng in ("hash", "table"):
        # Stateless counter streams: state is just the frame seed.
        state0 = jnp.asarray(seed).astype(jnp.uint32)
    else:
        state0 = jax.random.key(seed) if not _is_key(seed) else seed

    def sample_step(carry, s):
        state, accum = carry
        if hits_replay is not None:
            dh, ih = hits_replay
            hr = [(dh[s, b], ih[s, b]) for b in range(cfg.max_bounces)]
            fh = None
        else:
            hr, fh = None, first_hit
        if cfg.rng == "threefry":
            state_s = jax.random.fold_in(state, s)
            rad, _ = trace_radiance(
                scene, origins, directions, cfg, state_s, pixel_ids,
                first_hit=fh,
                sample_idx=s if cfg.stratify else None,
                vis_residual=vis_residual, hits_replay=hr,
            )
            new_state = state
        elif cfg.rng in ("hash", "table"):
            rad, _ = trace_radiance(
                scene, origins, directions, cfg, state, pixel_ids,
                first_hit=fh, sample_idx=s,
                vis_residual=vis_residual, hits_replay=hr,
            )
            new_state = state
        else:
            rad, new_state = trace_radiance(
                scene, origins, directions, cfg, state, pixel_ids,
                first_hit=fh, vis_residual=vis_residual, hits_replay=hr,
            )
        return (new_state, accum + rad), None

    init = (state0, jnp.zeros((n, 3), jnp.float32))
    if cfg.spp <= 8:
        # Statically unroll small sample counts. Besides avoiding scan
        # overhead, this keeps the compiled forward and the autodiff
        # linearization numerically identical: XLA compiles a scan body
        # and its linearized replay with slightly different trig
        # roundings, which can flip a grazing path and make
        # finite-difference checks disagree with jax.grad even though
        # both are "correct" for their own compilation.
        carry = init
        for s in range(cfg.spp):
            carry, _ = sample_step(carry, s)
        accum = carry[1]
    else:
        body = jax.checkpoint(sample_step) if cfg.remat else sample_step
        (_, accum), _ = lax.scan(body, init, jnp.arange(cfg.spp))
    return accum * (jnp.float32(1.0) / jnp.float32(cfg.spp))


def render_radiance(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed=0
) -> jax.Array:
    """Average ``cfg.spp`` samples of radiance per pixel → ``(H, W, 3)``.

    Unclamped HDR radiance (the inverse-rendering loss wants this);
    ``render_pt`` applies the reference's clamp.
    """
    origins, directions = generate_rays(camera, cfg.width, cfg.height)
    mean = trace_mean_radiance(scene, origins, directions, cfg, seed)
    return mean.reshape(cfg.height, cfg.width, 3)


def render_vis_residual(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed=0, hits=None
) -> jax.Array:
    """The visibility-gradient residual image → ``(H, W, 3)``.

    Forward value is EXACTLY zero; ``jax.grad`` through it yields the
    warped-area (light silhouette) and edge-sampled (shadow boundary)
    gradient terms of the vis_grad estimator — the exact complement of
    the interior gradients the fused custom-VJP megakernels compute, so

        grad(render_radiance_fused_interior + render_vis_residual)
            == grad(render_radiance with cfg.vis_grad)

    (``trace_radiance(vis_residual=True)`` docstring for the
    decomposition argument; ``VisGradFusedRenderer`` for the routing).
    The walk replays detached (one forward-cost pass, no interior tape);
    only the O(1)-per-lane vis chains are differentiated.

    ``chunk``: pixels per sequentially-mapped slice. The residual's
    per-bounce vis-chain tape is O(N) per sample even under per-sample
    remat, which OOMs a v5e at 1080p on large scenes (measured round 4
    at 10k tris spp4); slicing the frame into ``lax.map``-ed
    ``jax.checkpoint`` chunks bounds the live tape to one chunk with
    zero estimator change — the hash/threefry streams are keyed by the
    global pixel ids passed per chunk, so every draw is identical to
    the unsliced call. ``None`` picks a default that engages above
    ``_VIS_CHUNK`` pixels; pass ``0`` to force unsliced.

    ``hits``: ``(dist (spp, B, N), idx (spp, B, N))`` export from the
    fused interior forward (round-5 item 4) — the residual then skips
    every one of its own O(N·T) nearest-hit re-sweeps and only the
    NEE shadow-boundary edge sweeps (rays the interior never traces)
    remain.
    """
    if not cfg.vis_grad:
        raise ValueError("render_vis_residual needs cfg.vis_grad")
    return _render_vis_residual_impl(scene, camera, cfg, seed,
                                     hits=hits)


#: residual slice size (pixels): one chunk's vis tape at spp<=8 fits a
#: v5e comfortably; frames at or below this run unsliced
_VIS_CHUNK = 262144


def _render_vis_residual_impl(scene, camera, cfg, seed, chunk=None,
                              hits=None):
    origins, directions = generate_rays(camera, cfg.width, cfg.height)
    n = origins.shape[0]
    if chunk is None:
        chunk = _VIS_CHUNK
    if not chunk or n <= chunk:
        mean = trace_mean_radiance(scene, origins, directions, cfg, seed,
                                   vis_residual=True, hits_replay=hits)
        return mean.reshape(cfg.height, cfg.width, 3)
    pad = (-n) % chunk
    pid = jnp.arange(n + pad, dtype=jnp.uint32)
    o = jnp.concatenate([origins, jnp.zeros((pad, 3))]).astype(jnp.float32)
    d = jnp.concatenate([directions, jnp.zeros((pad, 3))]).astype(
        jnp.float32)
    k = (n + pad) // chunk

    @jax.checkpoint
    def one(args):
        oc, dc, pc, hc = args
        return trace_mean_radiance(scene, oc, dc, cfg, seed,
                                   pixel_ids=pc, vis_residual=True,
                                   hits_replay=hc)

    if hits is not None:
        # chunk the (spp, B, N) export along N alongside the rays;
        # padding lanes replay (0, -1): guaranteed-miss, zero chains
        dh, ih = hits
        spp, nb = dh.shape[0], dh.shape[1]
        dhp = jnp.concatenate(
            [dh, jnp.zeros((spp, nb, pad), jnp.float32)], axis=2)
        ihp = jnp.concatenate(
            [ih, jnp.full((spp, nb, pad), -1, jnp.int32)], axis=2)
        hxs = (dhp.reshape(spp, nb, k, chunk).transpose(2, 0, 1, 3),
               ihp.reshape(spp, nb, k, chunk).transpose(2, 0, 1, 3))
    else:
        hxs = None

    if hxs is None:
        @jax.checkpoint
        def one_nohits(args):
            oc, dc, pc = args
            return trace_mean_radiance(scene, oc, dc, cfg, seed,
                                       pixel_ids=pc, vis_residual=True)

        mean = lax.map(one_nohits,
                       (o.reshape(k, chunk, 3), d.reshape(k, chunk, 3),
                        pid.reshape(k, chunk)))
    else:
        mean = lax.map(one, (o.reshape(k, chunk, 3),
                             d.reshape(k, chunk, 3),
                             pid.reshape(k, chunk), hxs))
    return mean.reshape(-1, 3)[:n].reshape(cfg.height, cfg.width, 3)


def render_radiance_compact(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed=0,
    pad_multiple: int = 65536,
):
    """Stream-compacted forward render.

    Pixels whose camera ray misses the whole scene contribute exactly
    zero for every sample and bounce (the camera rays are deterministic),
    so the wavefront is compacted to the live set before the sample loop
    — an EXACT optimization (per-pixel RNG streams are keyed by global
    pixel id, so compaction cannot change any value). On the default view
    ~56% of pixels are background → ~1.8× fewer traced rays.

    Exactly one scalar (the live count, to pick the padded compact size)
    crosses to the host; everything else — the first-hit sweep, the
    on-device ``nonzero`` compaction, the trace, and the scatter back —
    is a single jitted program. The count is padded to ``pad_multiple``
    so camera motion rarely recompiles. Forward/serving path — use
    ``render_radiance`` inside ``jax.grad``.
    """
    origins, directions = generate_rays(camera, cfg.width, cfg.height)
    n = origins.shape[0]
    dist0, idx0 = _first_hit_jit(scene, origins, directions, cfg)
    n_live = int(jnp.sum(idx0 >= 0))          # the one host scalar
    if n_live == 0:
        return jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    padded = min(-(-n_live // pad_multiple) * pad_multiple, n)
    out = _trace_compact_jit(
        scene, origins, directions, dist0, idx0, jnp.asarray(seed),
        cfg, padded,
    )
    return out.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg",))
def _first_hit_jit(scene, origins, directions, cfg):
    src = jnp.full(origins.shape[0], -1, jnp.int32)
    return nearest_hit(
        origins, directions, scene.v0, scene.v1, scene.v2, src, cfg
    )


@partial(jax.jit, static_argnames=("cfg", "padded"))
def _trace_compact_jit(scene, origins, directions, dist0, idx0, seed, cfg,
                       padded):
    n = origins.shape[0]
    live = idx0 >= 0
    # On-device compaction; padding lanes select pixel n-1 repeatedly
    # (fill_value) — their radiance is dropped by the masked scatter.
    (sel,) = jnp.nonzero(live, size=padded, fill_value=n - 1)
    sel = sel.astype(jnp.int32)
    in_range = jnp.arange(padded, dtype=jnp.int32) < jnp.sum(live)
    mean_live = trace_mean_radiance(
        scene, origins[sel], directions[sel], cfg, seed,
        sel.astype(jnp.uint32), first_hit=(dist0[sel], idx0[sel]),
    )
    out = jnp.zeros((n, 3), jnp.float32)
    return out.at[jnp.where(in_range, sel, n)].set(
        mean_live, mode="drop"
    )


def _tracing(*pytrees) -> bool:
    """True when ANY leaf of the given pytrees is a jax tracer.

    Routing must check every leaf: differentiating only albedo/emission
    (the appearance-only training loop of the compact-plan contract)
    leaves ``scene.vertices`` concrete while other leaves are traced, so
    a vertices-only test would route a traced call onto a backend whose
    plan build syncs a host scalar (TracerArrayConversionError)."""
    return any(isinstance(x, jax.core.Tracer)
               for x in jax.tree_util.tree_leaves(pytrees))


def render_pt_fast(scene: Scene, camera: Camera, cfg: RenderConfig, seed=0,
                   mesh=None):
    """Fastest forward-only render (serving path).

    Uses the fused whole-frame megakernel when the config supports it
    (conformance estimator, small triangle count, TPU backend — 5× the
    XLA wavefront at 1080p), otherwise the stream-compacted wavefront.
    Not differentiable; use ``render_pt`` under ``jax.grad``.

    ``mesh``: render pixel-sharded over the ``rays`` axis of a device
    mesh — each device runs the SAME fused kernel on its ray shard with
    the scene table replicated (``parallel.shard_fast``), bit-identical
    to the single-device output.
    """
    if mesh is not None:
        from spath_tpu.parallel.shard_fast import render_pt_fast_sharded

        return render_pt_fast_sharded(scene, camera, cfg, seed, mesh)
    from spath_tpu.models.renderer import forward_renderer

    # Registry order is the selection policy: compacted fused launch
    # (when this call is NOT being traced — it syncs one host scalar),
    # fused megakernels (conformance, then quality, then HBM-streamed),
    # else the compacted wavefront (models/renderer.py).
    r = forward_renderer(scene, cfg,
                         require_jittable=_tracing(scene, camera))
    return r.render(scene, camera, cfg, seed)


def render_radiance_fastgrad(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed=0, mesh=None
) -> jax.Array:
    """Differentiable radiance, fused-kernel VJP when supported.

    Same value and same (detached-sampling) gradient semantics as
    ``render_radiance``, but when the config fits the fused megakernel
    (conformance estimator, small T, accelerator backend) both the
    forward AND the backward are single Pallas launches — the hand-written
    reverse sweep in ``ops/pallas/megakernel_grad`` instead of XLA's
    transpose of the wavefront program (~10x faster fwd+bwd at 1080p).
    Falls back to ``render_radiance`` everywhere else.

    ``mesh``: shard pixels over the ``rays`` axis — every device runs
    the fused forward/backward kernels on its shard and the scene-table
    adjoint is psum'd across the mesh (``parallel.shard_fast``).
    """
    if mesh is not None:
        from spath_tpu.parallel.shard_fast import (
            render_radiance_fastgrad_sharded,
        )

        return render_radiance_fastgrad_sharded(scene, camera, cfg, seed,
                                                mesh)
    from spath_tpu.models.renderer import grad_renderer

    # Registry order is the selection policy: compacted fused VJP (when
    # NOT being traced — its plan build syncs one host scalar), fused
    # hand-written VJPs (conformance, quality, then the streamed
    # large-scene kernel), else the autodiff wavefront
    # (models/renderer.py).
    return grad_renderer(
        scene, cfg,
        require_jittable=_tracing(scene, camera)).render_radiance_grad(
        scene, camera, cfg, seed)


def _is_key(x) -> bool:
    try:
        return jnp.issubdtype(jnp.asarray(x).dtype, jax.dtypes.prng_key)
    except TypeError:
        return False


def render_pt(scene: Scene, camera: Camera, cfg: RenderConfig, seed=0):
    """Full path-traced frame with the reference's final clamp
    (``src/cpu_renderer.cpp:78``). Returns float32 ``(H, W, 3)`` in [0,1].
    """
    return jnp.clip(render_radiance(scene, camera, cfg, seed), 0.0, 1.0)


render_pt_jit = jax.jit(render_pt, static_argnames=("cfg",))
render_radiance_jit = jax.jit(render_radiance, static_argnames=("cfg",))
