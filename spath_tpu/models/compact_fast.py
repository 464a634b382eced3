"""Bucket-compacted fused forward renders — the fastest serving path.

Camera rays that miss the whole scene contribute exactly zero for every
sample and bounce, so the frame's background fraction (~43% of the
default 1080p view) is pure wasted kernel time. Skipping it INSIDE the
Pallas kernels was measured and rejected (any per-tile conditional
region stalls Mosaic's cross-tile pipeline — docs/PERFORMANCE.md); the
profitable form is HOST-side: classify once, pack the live lanes first,
and launch the fused megakernel on a bucket-padded live PREFIX — the
grid itself shrinks, no in-kernel branch.

Exactness: live lanes carry their original (ray, per-pixel RNG key)
pairs, so the kernel computes bit-identical radiance for them; dropped
lanes are certified camera-misses whose radiance is exactly the zero
they read back (asserted bit-exact vs the full fused launch in
``tests/test_compact_fused.py``). Padding slots past the live count get
zero-direction rays — guaranteed-miss, the same convention as
``pack_rays`` padding lanes.

The classification is SEED-INDEPENDENT (camera rays are deterministic),
so it is built once per (scene, camera, cfg) as a ``CompactPlan`` and
reused across frames — a static-viewpoint server re-renders with new
seeds paying exactly one kernel dispatch per frame, same as the full
fused path. The plan itself costs one extra dispatch + one host-scalar
fetch (the live count — the only dynamic shape, bucketed to
``PAD_MULTIPLE`` so camera motion rarely recompiles the kernel).
TPU-shaped choices throughout: the live-first permutation comes from
two ``cumsum`` scans (no sort), the frame is reassembled with a
``take`` gather, and the differentiable path's permutation transposes
are custom-VJP inverse GATHERS (``_take_prefix``/``_unpack_rows``) —
XLA scatters are ~10× slower than gathers on TPU.

Round 4 adds TRAINING: ``render_radiance_compact_grad`` runs the
custom-VJP kernels on the live prefix — jittable with an explicit
plan, differentiable w.r.t. scene and camera, gradients identical to
the full-frame kernels (dropped lanes contribute zero to every
adjoint chain). The reference has no analog (it always traces every
pixel, ``src/cpu_renderer.cpp:30-68``); this is a beyond-parity
optimization in the spirit of its persistent frame buffers
(``src/cl_renderer.cpp``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spath_tpu.config import RenderConfig

#: live-count bucket: ≤1.5% average over-launch at 1080p, ~64 distinct
#: kernel programs worst-case over a full sweep of live fractions
PAD_MULTIPLE = 32768


class CompactPlan(NamedTuple):
    """Seed-independent per-(scene, camera, cfg) launch plan.

    ``sel`` lets the differentiable path re-derive the live-first rays
    from a TRACED camera (``rays[:, sel]``), so camera cotangents flow
    through the gather transpose while the permutation itself stays a
    plan constant.
    """

    rays_p: jax.Array      # (8, Np) live-first rays; tail zero-direction
    pix_p: jax.Array       # (1, Np) permuted per-pixel RNG ids
    inv: jax.Array         # (Np,) lane -> packed slot (gather map)
    sel: jax.Array         # (Np,) packed slot -> lane (live-first perm)
    n_live: int            # host-side live count
    padded: int            # bucketed kernel lane count


#: relative classification slack. Cross-formulation discrepancies
#: between the XLA classifier and the kernels' own intersections
#: (Mosaic-vs-XLA FMA contraction ~ulps; K-packed bf16-split
#: reordering ~1e-5 rel, BASELINE.md row 4) are two orders of
#: magnitude below this, so margin-dead certifies kernel-dead.
_MARGIN = 1e-3

#: OPERAND-scale slack coefficient. The kernels' bf16-split/FMA
#: reordering errors are relative to the PRE-cancellation operand
#: magnitudes of each dot product, not its result — for scenes with
#: large coordinates and near-edge-on triangles the result can be
#: orders of magnitude below the operands, and a result-relative
#: margin alone under-covers. Each bound therefore also carries
#: ``_KAPPA × Σ|operand products|`` (one extra |rays|·|feats| matmul,
#: paid once per plan build); measured kernel deviations are ~1e-5 of
#: that scale, so 1e-4 keeps 10× headroom.
_KAPPA = 1e-4


def _any_hit_relaxed(o, d, v0, v1, v2, block: int = 512):
    """Conservative any-hit: True where ANY triangle is within a
    ``_MARGIN``-relative band of the Möller–Trumbore validity bounds.

    Evaluated on the HIGHEST-precision f32 Plücker quantities; each
    bound is slackened by ``_MARGIN`` of its RESULT scale (|a| plus the
    numerators) PLUS ``_KAPPA`` of its OPERAND scale (an abs-value
    matmul bounding the pre-cancellation magnitudes — the scale the
    kernels' bf16-split/FMA-reordering errors actually live on), so a
    lane this classifier calls DEAD fails the strict bounds under every
    kernel formulation whose deviation is ≤ ``_KAPPA`` of operand scale
    — the invariant the compact launch needs (dead lanes read back
    zero). Determinants within the operand-scale error band of zero get
    a sign-robust |·|-only test (the kernel might resolve sign(a)
    differently there). Lanes live-under-margin but kernel-missing just
    render their exact zero in the prefix: a few silhouette-band lanes
    of waste, never a wrong pixel.
    """
    import numpy as np

    from spath_tpu.ops.intersect import (
        _EPS,
        _INV_EPS,
        _pad_tris,
        pluecker_features,
    )
    from jax import lax

    # Matmul outputs MATERIALIZE: at N rays × (4·block) columns the
    # per-step dot output is N·4·block·4 B — 16 GB at 2M×512, the HBM
    # OOM measured in round 4. Bound both factors: shrink the triangle
    # block to T when T is small (no padding waste — the 7-tri frame
    # costs a (N, 28) dot), and chunk the rays so each dot output is
    # ≤ ray_chunk·4·block·4 B ≈ 1 GB transient.
    t = v0.shape[0]
    block = min(block, t)
    ray_chunk = 131072
    (v0p, v1p, v2p), _ = _pad_tris([v0, v1, v2], block)
    n = o.shape[0]
    feats = pluecker_features(v0p, v1p, v2p)       # (10, 4·Tp)
    nblk = v0p.shape[0] // block
    fb = feats.T.reshape(nblk, block * 4, 10)
    fb_abs = jnp.abs(fb)
    mg = np.float32(_MARGIN)
    kap = np.float32(_KAPPA)

    def live_chunk(args):
        oc, dc = args
        m = jnp.cross(oc, dc)
        rays10 = jnp.concatenate(
            [dc, m, oc, jnp.ones((oc.shape[0], 1), jnp.float32)],
            axis=1)
        rays10_abs = jnp.abs(rays10)

        def body(any_live, inp):
            fblk, fblk_abs = inp
            quads = jnp.dot(
                rays10, fblk.T, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            ).reshape(oc.shape[0], block, 4)
            # per-pair, per-component operand magnitude Σ|r_k·f_k| —
            # the scale kernel rounding errors are relative to
            scales = jnp.dot(
                rays10_abs, fblk_abs.T,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            ).reshape(oc.shape[0], block, 4)
            a, u_num, v_num, d_num = (
                quads[..., 0], quads[..., 1], quads[..., 2],
                quads[..., 3])
            err_a = kap * scales[..., 0]
            err_u = kap * scales[..., 1]
            err_v = kap * scales[..., 2]
            err_d = kap * scales[..., 3]
            abs_a = jnp.abs(a)
            s = jnp.sign(a)
            us, vs, ds = u_num * s, v_num * s, d_num * s
            slack = mg * (abs_a + jnp.abs(us) + jnp.abs(vs))
            # sign(a) reliable: signed bounds, each slackened by the
            # result-scale margin plus its operands' error band
            ok_signed = (
                (abs_a + err_a >= _EPS)
                & (us >= -slack - err_u - err_a)
                & (vs >= -slack - err_v - err_a)
                & (us + vs <= abs_a + slack + err_u + err_v + err_a)
                & (ds > _EPS * abs_a - slack - err_d - err_a)
                & (ds < _INV_EPS * (abs_a + err_a) + mg * jnp.abs(ds)
                   + err_d)
            )
            # |a| within the error band of zero: the kernel may resolve
            # sign(a) oppositely, flipping us/vs — fall back to the
            # sign-free necessary conditions |u_num| ≤ |a|, |v_num| ≤ |a|
            # (from u, v ∈ [0, 1]), slackened the same way
            ok_abs = (
                (abs_a + err_a >= _EPS)
                & (jnp.abs(u_num) <= abs_a + slack + err_u + err_a)
                & (jnp.abs(v_num) <= abs_a + slack + err_v + err_a)
            )
            ok = jnp.where(abs_a > err_a, ok_signed, ok_abs)
            return any_live | jnp.any(ok, axis=1), None

        live0 = jnp.zeros(oc.shape[0], bool)
        live, _ = lax.scan(body, live0, (fb, fb_abs))
        return live

    if n <= ray_chunk:
        return live_chunk((o, d))
    pad = (-n) % ray_chunk
    op = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
    dp = jnp.concatenate([d, jnp.zeros((pad, 3), jnp.float32)])
    k = (n + pad) // ray_chunk
    live = lax.map(live_chunk, (op.reshape(k, ray_chunk, 3),
                                dp.reshape(k, ray_chunk, 3)))
    return live.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("cfg", "lane_multiple"))
def _classify(scene, camera, cfg: RenderConfig, lane_multiple: int):
    """Pack + classify + live-first permute (no sort, no scatter).

    Classification is the CONSERVATIVE ``_any_hit_relaxed`` band (round
    4): lanes near any ε bound under any formulation land in the live
    prefix, so the kernels' own intersections (SMEM scalar MT walk /
    streamed K-packed Plücker) can never disagree with a dead
    classification — bit-exact compact-vs-full holds by construction,
    not by per-view luck (property-tested over randomized cameras in
    test_compact_fused.py)."""
    from spath_tpu.ops.pallas.megakernel import pack_rays

    rays, pix, _ = pack_rays(camera, cfg, 0, lane_multiple=lane_multiple)
    o = rays[0:3, :].T
    d = rays[3:6, :].T
    live = _any_hit_relaxed(o, d, scene.v0, scene.v1, scene.v2,
                            cfg.tri_block)
    total = rays.shape[1]
    n_live = jnp.sum(live).astype(jnp.int32)
    livei = live.astype(jnp.int32)
    # packed slot of every lane: live lanes keep order in the prefix,
    # miss lanes keep order in the tail
    inv = jnp.where(
        live, jnp.cumsum(livei) - 1,
        n_live + jnp.cumsum(1 - livei) - 1,
    ).astype(jnp.int32)
    # full live-first permutation: live lanes in order, then miss lanes
    # in order (the argsort-free form of order_rays_live_first's perm)
    sel = jnp.zeros(total, jnp.int32).at[inv].set(
        jnp.arange(total, dtype=jnp.int32))
    in_prefix = jnp.arange(total, dtype=jnp.int32) < n_live
    rays_p = jnp.where(in_prefix[None, :], rays[:, sel], 0.0)
    pix_p = jnp.where(in_prefix[None, :], pix[:, sel], 0)
    return rays_p, pix_p, inv, sel, n_live


def _lane_multiple(kernel: str) -> int:
    if kernel == "bigscene":
        from spath_tpu.ops.pallas.megakernel_bigscene import TILE_R

        return TILE_R
    if kernel == "bigscene_quality":
        from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
            TILE_RQ,
        )

        return TILE_RQ
    from spath_tpu.ops.pallas.megakernel import TILE_N

    return TILE_N


def make_compact_plan(scene, camera, cfg: RenderConfig,
                      pad_multiple: int = PAD_MULTIPLE,
                      kernel: str | None = None) -> CompactPlan:
    if kernel is None:
        kernel = _select_kernel(scene, cfg)
    if kernel is None:
        raise ValueError("no fused megakernel covers this (scene, cfg)")
    lanes = _lane_multiple(kernel)
    rays_p, pix_p, inv, sel, n_live = _classify(scene, camera, cfg, lanes)
    n_live = int(n_live)                  # the one host scalar
    total = rays_p.shape[1]
    bucket = max(min(pad_multiple, total), lanes)
    bucket = -(-bucket // lanes) * lanes  # whole kernel tiles
    padded = min(-(-max(n_live, 1) // bucket) * bucket, total)
    return CompactPlan(rays_p, pix_p, inv, sel, n_live, padded)


@partial(jax.jit, static_argnames=("cfg", "padded", "kernel"))
def _run(scene, rays_p, pix_p, inv, seed, cfg: RenderConfig,
         padded: int, kernel: str):
    """One fused launch on the live prefix + gather back to pixels."""
    rays_c = rays_p[:, :padded]
    fast = cfg.intersect == "pallas_fast"
    if kernel == "quality":
        from spath_tpu.ops.pallas.megakernel_quality import (
            _GOLD,
            quality_table,
        )
        from spath_tpu.ops.pallas.megakernel_quality_grad import (
            quality_call,
        )

        keys_c = (jnp.asarray(seed).astype(jnp.uint32) * _GOLD
                  + pix_p[:, :padded])
        rows = quality_call(rays_c, keys_c, quality_table(scene), cfg,
                            scene.n_tris, scene.light_idx)
    elif kernel == "bigscene_quality":
        from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
            bigq_rows,
            bigscene_quality_tables,
        )
        from spath_tpu.ops.pallas.megakernel_quality import _GOLD

        keys_c = (jnp.asarray(seed).astype(jnp.uint32) * _GOLD
                  + pix_p[:, :padded])
        gfeat, attrs, ltab, cdf_t, n_blocks, n_lights = \
            bigscene_quality_tables(scene)
        rows = bigq_rows(gfeat, attrs, ltab, cdf_t, rays_c, keys_c, cfg,
                         n_blocks, n_lights, fast)
    elif kernel == "bigscene":
        from spath_tpu.ops.pallas.megakernel_bigscene import (
            bigscene_call,
            bigscene_tables,
        )

        keys_c = pix_p[:, :padded] + jnp.asarray(seed).astype(jnp.uint32)
        gfeat, attrs, n_blocks = bigscene_tables(scene)
        rows = bigscene_call(rays_c, keys_c, gfeat, attrs, cfg,
                             n_blocks, fast)
    else:
        from spath_tpu.ops.pallas.megakernel import _scene_table, mega_call

        keys_c = pix_p[:, :padded] + jnp.asarray(seed).astype(jnp.uint32)
        rows = mega_call(rays_c, keys_c, _scene_table(scene), cfg,
                         scene.n_tris)
    # reassemble with a gather (scatters are slow on TPU): lanes whose
    # packed slot fell past `padded` are certified misses -> the zero
    # column appended at index `padded`
    rows_ext = jnp.concatenate(
        [rows, jnp.zeros((4, 1), jnp.float32)], axis=1)
    full = jnp.take(rows_ext, jnp.minimum(inv, padded), axis=1)
    n = cfg.width * cfg.height
    return full[:3, :n].T.reshape(cfg.height, cfg.width, 3)


def _select_kernel(scene, cfg: RenderConfig) -> str | None:
    from spath_tpu.models.renderer import SMEM_ROUTE_MAX_TRIS
    from spath_tpu.ops.pallas import (
        megakernel,
        megakernel_bigscene,
        megakernel_bigscene_quality,
        megakernel_quality,
    )

    if scene.n_tris <= SMEM_ROUTE_MAX_TRIS:
        if megakernel.supported(scene, cfg):
            return "conformance"
        if megakernel_quality.supported(scene, cfg):
            return "quality"
    # large scenes: the HBM-streamed kernels (registry routing order)
    if megakernel_bigscene_quality.supported(scene, cfg):
        return "bigscene_quality"
    if megakernel_bigscene.supported(scene, cfg):
        return "bigscene"
    return None


def _select_kernel_grad(scene, cfg: RenderConfig) -> str | None:
    """Custom-VJP kernel covering (scene, cfg) — mirrors
    ``_select_kernel``'s routing with the grad predicates."""
    from spath_tpu.models.renderer import SMEM_ROUTE_MAX_TRIS
    from spath_tpu.ops.pallas import (
        megakernel_bigscene_grad,
        megakernel_bigscene_quality,
        megakernel_grad,
        megakernel_quality_grad,
    )

    if scene.n_tris <= SMEM_ROUTE_MAX_TRIS:
        if megakernel_grad.supported_grad(scene, cfg):
            return "conformance"
        if megakernel_quality_grad.supported_grad(scene, cfg):
            return "quality"
    if megakernel_bigscene_quality.supported_grad(scene, cfg):
        return "bigscene_quality"
    if megakernel_bigscene_grad.supported_grad(scene, cfg):
        return "bigscene"
    return None


def supported(scene, cfg: RenderConfig) -> bool:
    """True when a fused megakernel (SMEM or HBM-streamed) covers
    (scene, cfg) and the frame spans multiple tiles (else compaction
    can't drop anything)."""
    kernel = _select_kernel(scene, cfg)
    return (kernel is not None
            and cfg.width * cfg.height > _lane_multiple(kernel))


#: tiny plan cache. Fast path is pytree object identity (Scene/Camera
#: are immutable frozen pytrees, so identity implies value); on an
#: identity miss a VALUE fingerprint (bytes of the scene arrays +
#: camera fields) is tried before rebuilding, so a caller that
#: reconstructs an equal Scene/Camera every frame still reuses the
#: plan instead of silently thrashing (round-3 review item). The
#: fingerprint costs one device→host fetch of the scene arrays
#: (~3.6 MB at 100k tris, ms-scale — vs seconds for a plan rebuild).
#: Bounded FIFO.
_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 8


def _value_key(scene, camera, cfg, pad_multiple, kernel):
    import hashlib

    import numpy as np

    h = hashlib.sha1()
    for a in (scene.vertices, scene.albedo, scene.emission,
              camera.pos, camera.angle):
        h.update(np.asarray(a).tobytes())
    h.update(np.float32(camera.focal).tobytes())
    return (h.hexdigest(), scene.light_idx, cfg, pad_multiple, kernel)


def _cache_put(key, val):
    """Insert with the FIFO bound enforced on EVERY insertion — the
    id-keyed insert on the value-hit path included, so a caller that
    rebuilds an equal Scene/Camera each frame can't grow the dict
    unboundedly (it recycles the 8 slots instead)."""
    while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX and key not in _PLAN_CACHE:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = val


def _cached_plan(scene, camera, cfg, pad_multiple,
                 kernel: str | None = None) -> CompactPlan:
    if any(isinstance(x, jax.core.Tracer)
           for x in jax.tree_util.tree_leaves((scene, camera))):
        raise TypeError(
            "compact plan build requires concrete scene/camera values "
            "(the live count crosses to the host); jitted/grad-traced "
            "callers must pass an explicit plan=make_compact_plan(...)")
    key = (id(scene), id(camera), cfg, pad_multiple, kernel)
    plan = _PLAN_CACHE.get(key)
    if plan is not None and plan[0] is scene and plan[1] is camera:
        return plan[2]
    vkey = _value_key(scene, camera, cfg, pad_multiple, kernel)
    plan = _PLAN_CACHE.get(vkey)
    if plan is None:
        # hold scene/camera refs so ids stay valid while cached
        plan = (scene, camera,
                make_compact_plan(scene, camera, cfg, pad_multiple,
                                  kernel=kernel))
        _cache_put(vkey, plan)
    _cache_put(key, plan)
    return plan[2]


def render_radiance_compact_fused(scene, camera, cfg: RenderConfig,
                                  seed=0,
                                  pad_multiple: int = PAD_MULTIPLE,
                                  plan: CompactPlan | None = None):
    """Compacted fused forward render → unclamped ``(H, W, 3)`` radiance.

    Value-identical to the full fused launch; NOT jittable (the plan's
    live count crosses to the host) — it manages its own jitted pieces.
    Pass ``plan`` (or rely on the identity-keyed cache) to amortize the
    classification across frames at a fixed viewpoint.
    """
    kernel = _select_kernel(scene, cfg)
    if kernel is None:
        raise ValueError("no fused SMEM kernel covers this (scene, cfg)")
    if plan is None:
        plan = _cached_plan(scene, camera, cfg, pad_multiple)
    if plan.n_live == 0:
        return jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    return _run(scene, plan.rays_p, plan.pix_p, plan.inv, seed, cfg,
                plan.padded, kernel)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _take_prefix(x, sel, inv, padded: int):
    """``x[:, sel[:padded]]`` with a GATHER transpose.

    ``sel``/``inv`` are a lane permutation and its inverse, so the
    autodiff transpose (an XLA scatter-add at 2M indices — ~10× slower
    than a gather on TPU, measured in BENCH_r04's first compact fwd+bwd
    line) is replaced by the exact inverse gather: lane j's cotangent
    is the packed slot ``inv[j]``'s cotangent, or zero past the prefix.
    """
    return x[:, sel[:padded]]


def _take_prefix_fwd(x, sel, inv, padded):
    return x[:, sel[:padded]], (sel, inv)


def _take_prefix_bwd(padded, res, g):
    sel, inv = res
    g_ext = jnp.concatenate(
        [g, jnp.zeros((g.shape[0], 1), g.dtype)], axis=1)
    gx = jnp.take(g_ext, jnp.minimum(inv, padded), axis=1)
    return gx, None, None


_take_prefix.defvjp(_take_prefix_fwd, _take_prefix_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _unpack_rows(rows_ext, inv, sel, padded: int):
    """``rows_ext[:, min(inv, padded)]`` (packed slots → lanes; slot
    ``padded`` is the appended zero column) with a GATHER transpose:
    slot s < padded is read by exactly one lane (``sel[s]``), so its
    cotangent is that lane's — no scatter (see ``_take_prefix``)."""
    return jnp.take(rows_ext, jnp.minimum(inv, padded), axis=1)


def _unpack_rows_fwd(rows_ext, inv, sel, padded):
    return jnp.take(rows_ext, jnp.minimum(inv, padded), axis=1), \
        (inv, sel, rows_ext.shape[1])


def _unpack_rows_bwd(padded, res, g):
    inv, sel, ncols = res
    grows = jnp.take(g, sel[:padded], axis=1)
    # every dropped lane reads the single appended column (index
    # `padded`): its cotangent is the masked row-sum, exact (and in the
    # caller it flows into a jnp.zeros constant, i.e. nowhere)
    last = jnp.sum(jnp.where(inv[None, :] >= padded, g, 0.0),
                   axis=1, keepdims=True)
    assert ncols == padded + 1
    return jnp.concatenate([grows, last], axis=1), None, None


_unpack_rows.defvjp(_unpack_rows_fwd, _unpack_rows_bwd)


@partial(jax.jit, static_argnames=("cfg", "padded", "kernel"))
def _run_grad(scene, camera, sel, inv, seed, cfg: RenderConfig,
              padded: int, kernel: str):
    """Differentiable compacted launch: custom-VJP rows kernels on the
    live prefix, re-deriving the permuted rays from the traced camera
    so camera cotangents flow through the gather transpose.

    Slots in [n_live, padded) hold genuine camera-miss rays (the
    permutation's ordered tail) — exact zero radiance and zero adjoint
    contributions, so no masking is needed and every original lane's
    value/gradient is identical to the full-frame kernels'.
    """
    from spath_tpu.ops.pallas.megakernel import pack_rays

    lanes = _lane_multiple(kernel)
    # the plan must have been built for a kernel with the same lane
    # multiple, or sel/inv/padded misindex the permutation
    assert padded % lanes == 0 and sel.shape[0] % lanes == 0, (
        f"plan lane multiple inconsistent with kernel {kernel!r} "
        f"(padded={padded}, lanes={lanes}); build the plan with "
        f"make_compact_plan(..., kernel={kernel!r})")
    rays, pix, _ = pack_rays(camera, cfg, 0, lane_multiple=lanes)
    rays_c = _take_prefix(rays, sel, inv, padded)
    pix_c = pix[:, sel[:padded]]            # int: no gradient path
    fast = cfg.intersect == "pallas_fast"
    if kernel == "quality":
        from spath_tpu.ops.pallas.megakernel_quality import (
            _GOLD,
            quality_table,
        )
        from spath_tpu.ops.pallas.megakernel_quality_grad import (
            quality_rows,
        )

        keys_c = jnp.asarray(seed).astype(jnp.uint32) * _GOLD + pix_c
        rows = quality_rows(quality_table(scene), rays_c, keys_c, cfg,
                            scene.n_tris, scene.light_idx)
    elif kernel == "bigscene_quality":
        from spath_tpu.ops.pallas.megakernel_bigscene_quality import (
            bigq_rows,
            bigscene_quality_tables,
        )
        from spath_tpu.ops.pallas.megakernel_quality import _GOLD

        keys_c = jnp.asarray(seed).astype(jnp.uint32) * _GOLD + pix_c
        gfeat, attrs, ltab, cdf_t, n_blocks, n_lights = \
            bigscene_quality_tables(scene)
        rows = bigq_rows(gfeat, attrs, ltab, cdf_t, rays_c, keys_c, cfg,
                         n_blocks, n_lights, fast)
    elif kernel == "bigscene":
        from spath_tpu.ops.pallas.megakernel_bigscene import (
            bigscene_tables,
        )
        from spath_tpu.ops.pallas.megakernel_bigscene_grad import (
            bigscene_rows,
        )

        keys_c = pix_c + jnp.asarray(seed).astype(jnp.uint32)
        gfeat, attrs, n_blocks = bigscene_tables(scene)
        rows = bigscene_rows(gfeat, attrs, rays_c, keys_c, cfg,
                             n_blocks, fast)
    else:
        from spath_tpu.ops.pallas.megakernel import _scene_table
        from spath_tpu.ops.pallas.megakernel_grad import mega_rows

        keys_c = pix_c + jnp.asarray(seed).astype(jnp.uint32)
        rows = mega_rows(_scene_table(scene), rays_c, keys_c, cfg,
                         scene.n_tris)
    rows_ext = jnp.concatenate(
        [rows, jnp.zeros((4, 1), jnp.float32)], axis=1)
    full = _unpack_rows(rows_ext, inv, sel, padded)
    n = cfg.width * cfg.height
    return full[:3, :n].T.reshape(cfg.height, cfg.width, 3)


def supported_grad(scene, cfg: RenderConfig) -> bool:
    """True when a custom-VJP megakernel covers (scene, cfg) and the
    frame spans multiple tiles. The plan build itself needs concrete
    scene/camera values — jit-traced callers must pass ``plan=``."""
    kernel = _select_kernel_grad(scene, cfg)
    return (kernel is not None
            and cfg.width * cfg.height > _lane_multiple(kernel))


def render_radiance_compact_grad(scene, camera, cfg: RenderConfig,
                                 seed=0,
                                 pad_multiple: int = PAD_MULTIPLE,
                                 plan: CompactPlan | None = None):
    """Differentiable compacted fused render → unclamped ``(H, W, 3)``.

    Value- and gradient-identical to the full-frame custom-VJP kernels
    (dropped lanes are certified camera-misses: zero radiance, zero
    adjoint contributions — every chain is hit-masked), ~1/(live
    fraction) faster both directions. With ``plan=`` given the call is
    fully jittable and differentiable w.r.t. scene AND camera; the
    classification itself is detached (same policy as the argmin).

    CONTRACT: the plan certifies misses for the geometry it was built
    with — rebuild it when scene geometry moves beyond the silhouette
    tolerance of your application (a stale plan drops newly-live
    boundary lanes). Appearance-only training (albedo/emission) never
    stales a plan.
    """
    kernel = _select_kernel_grad(scene, cfg)
    if kernel is None:
        raise ValueError(
            "no custom-VJP megakernel covers this (scene, cfg)")
    if plan is None:
        # Build the default plan against the GRAD kernel selection so the
        # plan's lane multiple matches the kernel this call launches —
        # the forward selection can differ (e.g. fwd 'conformance' vs
        # grad 'bigscene') and a lane-multiple divergence would silently
        # misindex the permutation.
        plan = _cached_plan(scene, camera, cfg, pad_multiple,
                            kernel=kernel)
    if plan.n_live == 0:
        # all-miss frame: still differentiable (constant zero)
        return jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    return _run_grad(scene, camera, plan.sel, plan.inv, seed, cfg,
                     plan.padded, kernel)
