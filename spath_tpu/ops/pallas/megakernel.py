"""Whole-frame conformance path tracer in ONE Pallas launch.

Profiling shows the small-scene frame is launch-bound, not FLOP-bound:
at 7 triangles a bounce pass is ~50 XLA fusions over 2M-ray arrays, and
halving the data (stream compaction) barely moves wall-clock. The fix is
structural: fuse the ENTIRE render — sample loop, 5-bounce walk,
intersection, LCG, sampler, shading — into a single kernel so each ray
tile stays resident in VMEM/registers from camera ray to final radiance.
HBM traffic collapses to rays in (32 B/ray) + radiance out (12 B/pixel),
once per frame.

Layout: rays live on *lanes* — every per-ray quantity is a
``(1, TILE_N)`` row vector, so all VPU ops run at full 128-lane width
(a ``(TILE_N, k)`` layout would put components on lanes and waste
127/128 of the machine). The triangle list is a small ``(T, 24)`` VMEM
table walked with an unrolled scalar loop — the kernel targets the
conformance/benchmark regime (T ≤ ``MAX_TRIS``); large scenes use the
blocked Plücker kernels instead.

Semantics: bit-compatible with the XLA conformance path — per-pixel LCG
streams (``src/frand.h:59-62``) advanced only on hits, the reference's
angle-uniform sampler (``src/geom.h:164-177``), Möller–Trumbore with
ε bounds and source-index exclusion, forward-throughput radiance,
first-hit hoisted out of the sample loop.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.config import EPSILON, MAX_DIST, RenderConfig

_EPS = np.float32(EPSILON)
_INV_EPS = np.float32(1.0 / EPSILON)
_BIG = np.float32(MAX_DIST)
_PI = np.float64(np.arccos(-1.0))

TILE_N = int(os.environ.get("SPATH_TILE_N", "1024"))
#: lane-tile quantum: every ray-row block must be a whole number of
#: 128-lane vregs; tiles smaller than TILE_N (small sharded frames) are
#: rounded up to this instead of to TILE_N (see ``shard_lane_multiple``).
LANE = 128

#: Dead-tile skip (camera-tile culling): tiles whose camera rays ALL
#: miss the scene write zeros and skip the sample loop; combined with
#: ``order_rays_live_first`` this culls the background fraction of the
#: frame (~43% of the default view). MEASURED NEGATIVE and therefore
#: OFF by default: any per-tile conditional region (lax.cond OR
#: result-free pl.when, tile 1024-8192) stalls Mosaic's cross-tile
#: software pipeline — quality 1080p64: 214 ms unconditioned vs
#: 249-263 ms with the branch, and an ALL-dead frame still costs
#: 186 ms. Kept env-gated for reproducibility of the decision
#: (docs/PERFORMANCE.md "per-bounce/per-tile compaction"); the skip
#: composes bit-exactly (verified skip-on vs skip-off, fwd and VJP).
DEAD_TILE_SKIP = os.environ.get("SPATH_DEAD_TILE_SKIP", "0") == "1"


def tile_for(n_lanes: int, tile_max: int = TILE_N) -> int:
    """Grid tile for a packed lane count: ``TILE_N`` when the buffer is
    at least one full tile, else the whole (LANE-aligned) buffer as a
    single block. Keeps small sharded frames from padding to
    ``n_devices x TILE_N`` lanes (64x wasted work on a 128-pixel test
    frame — the round-2 multichip-dryrun timeout)."""
    t = min(tile_max, n_lanes)
    assert n_lanes % t == 0 and t % LANE == 0, (n_lanes, t)
    return t


def shard_lane_multiple(n_pixels: int, n_devices: int,
                        tile_max: int = TILE_N) -> int:
    """``lane_multiple`` for ``pack_rays`` under an ``n_devices`` shard:
    every device gets the same whole-vreg lane count, shrunk below
    ``tile_max`` when the frame doesn't fill ``n_devices x tile_max``."""
    per = -(-n_pixels // n_devices)          # ceil pixels per device
    per = -(-per // LANE) * LANE             # whole 128-lane vregs
    return n_devices * min(tile_max, per)
#: Scenes up to this unroll the triangle walk as straight-line code
#: (fastest; compile time grows with T).
UNROLL_TRIS = 16
#: Above UNROLL_TRIS the walk is a ``fori_loop`` with dynamic scalar
#: reads from the SMEM triangle table — O(1) program size. The cap keeps
#: the (T, 24) float32 table comfortably inside scalar memory; truly
#: large scenes use the blocked MXU kernels via the wavefront path.
MAX_TRIS = 1024


def _lcg(seed):
    seed = jnp.uint32(214013) * seed + jnp.uint32(2531011)
    bits = (seed >> jnp.uint32(16)) & jnp.uint32(0x7FFF)
    # Mosaic has no u32→f32 cast; the 15-bit value roundtrips via i32.
    # Divide (don't multiply by the rounded reciprocal): ops/rng.py
    # divides, and the two differ by 1 ulp on some draws — enough to flip
    # a chaotic path and break kernel-vs-wavefront conformance.
    u = bits.astype(jnp.int32).astype(jnp.float32) / np.float32(32767.0)
    return seed, u


def _mt_step(t, ox, oy, oz, dx, dy, dz, src, tri, best_d, best_i):
    """One Möller–Trumbore test of every lane against triangle ``t``.

    Operands are (1, TILE_N) rows; triangle scalars (static OR dynamic
    index into the SMEM table) broadcast. Returns updated (best_d,
    best_i).
    """
    v0x, v0y, v0z = tri[t, 0], tri[t, 1], tri[t, 2]
    e1x, e1y, e1z = tri[t, 3], tri[t, 4], tri[t, 5]
    e2x, e2y, e2z = tri[t, 6], tri[t, 7], tri[t, 8]
    # h = d × e2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    nondeg = jnp.abs(a) >= _EPS
    f = jnp.float32(1.0) / jnp.where(nondeg, a, jnp.float32(1.0))
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    dist = f * (e2x * qx + e2y * qy + e2z * qz)
    ok = (
        nondeg
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (dist > _EPS) & (dist < _INV_EPS)
        & (src != t)
        & (dist < best_d)
    )
    return jnp.where(ok, dist, best_d), jnp.where(ok, t, best_i)


def _nearest(ox, oy, oz, dx, dy, dz, src, tri, n_tris):
    """Möller–Trumbore scan over the SMEM triangle table.

    Unrolled straight-line code for small scenes; a ``fori_loop`` with
    dynamic scalar reads above ``UNROLL_TRIS`` (O(1) program size).
    Returns (best_d, best_i).
    """
    best_d = jnp.full_like(ox, _BIG)
    best_i = jnp.full_like(src, -1)
    if n_tris <= UNROLL_TRIS:
        for t in range(n_tris):
            best_d, best_i = _mt_step(
                t, ox, oy, oz, dx, dy, dz, src, tri, best_d, best_i)
        return best_d, best_i

    def body(t, carry):
        return _mt_step(t, ox, oy, oz, dx, dy, dz, src, tri, *carry)

    return lax.fori_loop(0, n_tris, body, (best_d, best_i))


def _gather_cols(tri, best_i, cols, n_tris):
    """Select per-triangle scalars by index via masked accumulation."""
    cols = tuple(cols)
    outs = [jnp.zeros_like(best_i, dtype=jnp.float32) for _ in cols]
    if n_tris <= UNROLL_TRIS:
        for t in range(n_tris):
            m = best_i == t
            for k, c in enumerate(cols):
                outs[k] = jnp.where(m, tri[t, c], outs[k])
        return outs

    def body(t, outs):
        m = best_i == t
        return tuple(
            jnp.where(m, tri[t, c], o) for c, o in zip(cols, outs)
        )

    return list(lax.fori_loop(0, n_tris, body, tuple(outs)))


def _megakernel(rays, seeds, tri, out, *, cfg: RenderConfig, n_tris: int):
    ox0, oy0, oz0 = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx0, dy0, dz0 = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    src0 = jnp.full_like(ox0, -1.0).astype(jnp.int32)

    # First hit: camera rays are identical for every sample.
    fh_d, fh_i = _nearest(ox0, oy0, oz0, dx0, dy0, dz0, src0, tri, n_tris)

    def sample_body(_, carry):
        seed, acc_r, acc_g, acc_b = carry
        ox, oy, oz = ox0, oy0, oz0
        dx, dy, dz = dx0, dy0, dz0
        src = src0
        alive = jnp.ones_like(ox, dtype=jnp.bool_)
        thr_r = jnp.ones_like(ox)
        thr_g = jnp.ones_like(ox)
        thr_b = jnp.ones_like(ox)
        rad_r = jnp.zeros_like(ox)
        rad_g = jnp.zeros_like(ox)
        rad_b = jnp.zeros_like(ox)

        for bounce in range(cfg.max_bounces):
            if bounce == 0:
                dist, idx = fh_d, fh_i
            else:
                dist, idx = _nearest(
                    ox, oy, oz, dx, dy, dz, src, tri, n_tris
                )
            hit = alive & (idx >= 0)

            nx, ny, nz, ar, ag, ab, er, eg, eb = _gather_cols(
                tri, idx, (9, 10, 11, 12, 13, 14, 15, 16, 17), n_tris
            )
            flip = nx * dx + ny * dy + nz * dz > 0.0
            nx = jnp.where(flip, -nx, nx)
            ny = jnp.where(flip, -ny, ny)
            nz = jnp.where(flip, -nz, nz)

            # LCG draws; state advances only on hits (conformance).
            s1, u1 = _lcg(seed)
            s2, u2 = _lcg(s1)
            seed = jnp.where(hit, s2, seed)

            # angle-uniform sampler (src/geom.h:164-177)
            az = u1 * np.float32(2.0 * _PI)
            el = u2 * np.float32(0.5 * _PI)
            fx = jnp.cos(el)
            sx_ = jnp.cos(az) * fx
            sy_ = jnp.sin(el)
            sz_ = jnp.sin(az) * fx
            aligned = nx * sx_ + ny * sy_ + nz * sz_ >= 0.0
            sgn = jnp.where(aligned, 1.0, -1.0).astype(jnp.float32)
            ndx, ndy, ndz = sx_ * sgn, sy_ * sgn, sz_ * sgn
            cos_t = ndx * nx + ndy * ny + ndz * nz
            w = jnp.float32(2.0) * cos_t

            rad_r = rad_r + jnp.where(hit, thr_r * er, 0.0)
            rad_g = rad_g + jnp.where(hit, thr_g * eg, 0.0)
            rad_b = rad_b + jnp.where(hit, thr_b * eb, 0.0)
            thr_r = jnp.where(hit, thr_r * ar * w, thr_r)
            thr_g = jnp.where(hit, thr_g * ag * w, thr_g)
            thr_b = jnp.where(hit, thr_b * ab * w, thr_b)

            ox = jnp.where(hit, ox + dist * dx, ox)
            oy = jnp.where(hit, oy + dist * dy, oy)
            oz = jnp.where(hit, oz + dist * dz, oz)
            dx = jnp.where(hit, ndx, dx)
            dy = jnp.where(hit, ndy, dy)
            dz = jnp.where(hit, ndz, dz)
            src = jnp.where(hit, idx, src)
            alive = hit

        return (seed, acc_r + rad_r, acc_g + rad_g, acc_b + rad_b)

    seed0 = seeds[0:1, :]
    zeros = jnp.zeros_like(ox0)
    inv = np.float32(1.0) / np.float32(cfg.spp)

    def run_loop():
        _, acc_r, acc_g, acc_b = lax.fori_loop(
            0, cfg.spp, sample_body, (seed0, zeros, zeros, zeros)
        )
        out[0:1, :] = acc_r * inv
        out[1:2, :] = acc_g * inv
        out[2:3, :] = acc_b * inv
        out[3:4, :] = zeros  # padding row of the (4, N) block

    if not DEAD_TILE_SKIP:
        run_loop()
        return

    # Dead-tile skip: if every camera ray in this tile misses the scene,
    # every sample/bounce term is hit-masked to zero, so the whole sample
    # loop is skipped (bit-exact — the skipped branch writes the same
    # all-zero rows the loop would). Background tiles (~25% of a
    # default 1080p frame; ~43% of lanes after live-first ordering, see
    # ``order_rays_live_first``) then cost one first-hit sweep instead of
    # spp x bounces sweeps. Structured as result-free ``pl.when``
    # branches writing ``out`` directly: a ``lax.cond`` RETURNING the
    # (1, N) accumulators makes Mosaic materialize branch-result layouts
    # and measured ~20% slower on the WHOLE kernel.
    live = jnp.any(fh_i >= 0)
    pl.when(live)(run_loop)

    @pl.when(jnp.logical_not(live))
    def _():
        out[0:4, :] = jnp.zeros((4, zeros.shape[1]), jnp.float32)


def _scene_table(scene):
    """(T, 24) table: v0(3), e1(3), e2(3), n(3), albedo(3), emission(3),
    pad(6)."""
    v0 = scene.v0
    e1 = scene.v1 - v0
    e2 = scene.v2 - v0
    n = scene.normals()
    pad = jnp.zeros((v0.shape[0], 6), jnp.float32)
    return jnp.concatenate(
        [v0, e1, e2, n, scene.albedo, scene.emission, pad], axis=1
    )


def supported(scene, cfg: RenderConfig) -> bool:
    return (
        scene.n_tris <= MAX_TRIS
        and cfg.rng == "lcg"
        and cfg.sampler == "angle"
        and not cfg.nee
        and cfg.rr_start == 0
        and not cfg.stratify
    )


def pack_rays(camera, cfg: RenderConfig, seed, lane_multiple: int = TILE_N):
    """Camera → padded ``(8, Np)`` ray rows + ``(1, Np)`` seed row.

    Differentiable in the camera (the concatenate/pad/transpose chain
    transposes cleanly), shared by the forward-only and custom-VJP entry
    points. Returns ``(rays, seeds, n)`` with ``Np = n`` padded up to a
    multiple of ``lane_multiple`` (``n_devices·TILE_N`` for the sharded
    fused path, so every device shard is whole tiles).
    """
    from spath_tpu.camera import generate_rays

    o, d = generate_rays(camera, cfg.width, cfg.height)
    n = o.shape[0]
    pad = (-n) % lane_multiple
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)))
    rays = jnp.concatenate([o.T, d.T, jnp.zeros((2, n + pad))], axis=0)
    rays = rays.astype(jnp.float32)  # (8, Np)
    seeds = (
        jnp.arange(n + pad, dtype=jnp.uint32)[None, :] + jnp.uint32(seed)
    )
    return rays, seeds, n


def order_rays_live_first(scene, rays, keys, cfg: RenderConfig):
    """Stable live-first lane permutation for a packed ray buffer.

    Camera rays that miss the whole scene contribute exactly zero for
    every sample and bounce, and every lane's result depends only on its
    own (ray, key) pair — per-pixel RNG streams are keyed by the global
    pixel id riding in ``keys`` — so reordering lanes changes which lanes
    share a grid tile but not any lane's value. Packing the miss lanes
    (43% of the default 1080p view, plus all padding lanes) into
    contiguous trailing tiles lets the kernels' dead-tile ``lax.cond``
    skip them wholesale instead of catching only the ~25% of tiles that
    happen to be fully dead in row-major order.

    The classification itself doesn't need to match the kernel's ε
    semantics bit-for-bit: each tile re-derives its own first hit, so a
    misclassified lane costs only the skipped-tile saving, never
    correctness.

    Returns ``(rays_p, keys_p, order, n_live)``; unpermute outputs with
    ``out.at[:, order].set(out_p)`` (or rely on the gather transpose for
    gradients through ``rays_p``). ``n_live`` (traced int32) counts the
    live prefix — the compact fused forward slices to it (bucketed).
    """
    from spath_tpu.ops.intersect import nearest_hit

    o = rays[0:3, :].T
    d = rays[3:6, :].T
    src = jnp.full(o.shape[0], -1, jnp.int32)
    _, idx = nearest_hit(
        o, d, scene.v0, scene.v1, scene.v2, src, cfg)
    miss = lax.stop_gradient(idx < 0).astype(jnp.int32)
    order = jnp.argsort(miss, stable=True)
    n_live = jnp.sum(1 - miss).astype(jnp.int32)
    return rays[:, order], keys[:, order], order, n_live


def unpermute_rows(out_p, order):
    """Inverse of the ``order_rays_live_first`` permutation on row-major
    per-lane outputs: ``out_p[:, j]`` belongs to original lane
    ``order[j]``."""
    return jnp.zeros_like(out_p).at[:, order].set(out_p)


def mega_call(rays, seeds, tri, cfg: RenderConfig, n_tris: int):
    """Raw forward pallas_call on packed rows → ``(4, Np)`` radiance rows."""
    np_ = rays.shape[1]
    tile = tile_for(np_)
    kernel = functools.partial(_megakernel, cfg=cfg, n_tris=n_tris)
    return pl.pallas_call(
        kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tri table: scalar reads
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, np_), jnp.float32),
    )(rays, seeds, tri)


def render_radiance_megakernel(scene, camera, cfg: RenderConfig, seed=0):
    """Unclamped mean radiance ``(H, W, 3)`` via the fused kernel.

    Forward-only (no gradient rule); conformance estimator only — see
    ``supported``. For the differentiable fused path use
    ``megakernel_grad.render_radiance_mega``.
    """
    if not supported(scene, cfg):
        raise ValueError("megakernel supports lcg+angle, T <= MAX_TRIS")
    rays, seeds, n = pack_rays(camera, cfg, seed)
    tri = _scene_table(scene)
    if DEAD_TILE_SKIP and rays.shape[1] > TILE_N:
        # live-first ordering: bit-exact, turns scattered miss lanes
        # into whole dead tiles the kernel's pl.when skips
        rays, seeds, order, _ = order_rays_live_first(scene, rays, seeds, cfg)
        out = unpermute_rows(
            mega_call(rays, seeds, tri, cfg, scene.n_tris), order)
    else:
        out = mega_call(rays, seeds, tri, cfg, scene.n_tris)
    return out[:3, :n].T.reshape(cfg.height, cfg.width, 3)
