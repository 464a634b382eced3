"""Random number generation.

Two modes:

  * **lcg** — the reference's linear congruential generator, for bit-exact
    conformance with its GPU kernels. Formula (``src/frand.h:59-62``,
    duplicated at ``src/render.cl:150-153`` and ``src/render.comp:135-138``)::

        seed = 214013 * seed + 2531011          (uint32 wraparound)
        u    = ((seed >> 16) & 0x7FFF) / 32767.0

    The reference seeds per-pixel streams with the pixel index
    (``src/render.cl:233``, ``src/render.comp:219``) — that scheme is
    scheduling-independent, unlike the CPU renderer's per-thread seeding
    (``src/cpu_renderer.cpp:147``), so it is the conformance golden.
    Unlike the reference's stateful functor, the JAX version threads the
    seed explicitly: ``seed, u = lcg_next(seed)`` — stateless per stream,
    so it vectorizes over millions of pixels.

  * **threefry** — ``jax.random`` counter-based keys (quality mode): keyed
    per (pixel, sample, bounce) via ``fold_in``, the TPU-native equivalent
    of the ledger item "RNG becomes stateless counter-based threefry".

Deliberately NOT reproduced (SURVEY.md C5/C6):

  * ``basic_dist`` (``src/frand.h:26-30``) wraps global-state
    ``std::rand()`` with the process-default seed — its stream depends on
    libc, link order, and whatever else called ``rand()``, so it is not a
    stable golden on ANY machine (the reference itself only uses it in the
    single-threaded debug path, ``src/cpu_renderer.cpp:105-116``). A
    global-state RNG is also unimplementable under SPMD tracing without
    serializing every lane. Conformance mode is the LCG above — the
    scheme the reference's own GPU kernels use.
  * ``vec_dist`` (``src/frand.h:32-50``) — the pre-shuffled-table debug
    RNG — exists host-side as ``TableRng`` below for debugging parity,
    but is not a device mode: it relies on ``std::random_shuffle``
    (removed in C++17) with unspecified engine behavior, so its exact
    stream is not reproducible across toolchains either.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: a module-level jnp scalar is a committed
# device buffer, and executables that close over one run ~400x slower
# on the remote-TPU (axon) path than ones with inlined literals.
_MUL = np.uint32(214013)
_ADD = np.uint32(2531011)
_MASK = np.uint32(0x7FFF)
_NORM = np.float32(1.0 / 32767.0)


def lcg_next(seed: jax.Array):
    """Advance the LCG. ``seed`` is uint32 of any shape.

    Returns ``(new_seed, u)`` with ``u`` float32 in [0, 1].

    The reference normalizes in double and later truncates to float32;
    here ``float32(k) / 32767`` is a single float32 division, which differs
    from the double-then-round path by at most 1 ulp — inside conformance
    tolerance (the seed recurrence itself is exact uint32 arithmetic).
    """
    seed = _MUL * seed + _ADD
    bits = (seed >> 16) & _MASK
    return seed, bits.astype(jnp.float32) / jnp.float32(32767.0)


def lcg_uniform(seed: jax.Array, n: int):
    """Draw ``n`` sequential uniforms from each stream.

    Returns ``(new_seed, us)`` where ``us`` has shape ``(n, *seed.shape)``.
    """
    us = []
    for _ in range(n):
        seed, u = lcg_next(seed)
        us.append(u)
    return seed, jnp.stack(us)


def pixel_seeds(n_pixels: int, offset: int = 0) -> jax.Array:
    """Per-pixel LCG seeds = pixel index (``src/render.cl:233``)."""
    return (jnp.arange(n_pixels, dtype=jnp.uint32) + jnp.uint32(offset))


def threefry_uniform(key: jax.Array, shape, lo=0.0, hi=1.0):
    """Quality-mode uniforms from a threefry key."""
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


class TableRng:
    """The reference's ``vec_dist`` debug RNG (``src/frand.h:32-50``):
    ``max_values + 1`` evenly spaced values in [0, 1], shuffled once,
    then cycled. A deterministic low-discrepancy-ish stream the
    reference swapped in while debugging (``src/cpu_renderer.cpp:146``);
    provided for the same purpose (host-side debugging of samplers and
    the oracle — not a device RNG mode).

    The reference shuffles with ``std::random_shuffle`` (removed in
    C++17, unspecified engine); we use a seeded NumPy shuffle — the
    *structure* (fixed table, cycling cursor) is the reproduced
    semantic, not the exact permutation.
    """

    def __init__(self, max_values: int, seed: int = 0):
        import numpy as _np

        step = 1.0 / max_values
        vals = _np.arange(max_values + 1) * step
        vals[-1] = 1.0
        rng = _np.random.Generator(_np.random.Philox(seed))
        rng.shuffle(vals)
        self._values = vals
        self._next = 0

    def __call__(self) -> float:
        v = self._values[self._next]
        self._next = (self._next + 1) % len(self._values)
        return float(v)


def per_pixel_uniforms(key: jax.Array, pixel_ids: jax.Array, n_draws: int):
    """Counter-based threefry uniforms keyed per pixel.

    ``key`` should already encode (seed, sample, bounce) via ``fold_in``;
    each pixel's stream is then keyed by its *global* pixel id. Because
    the draw depends only on (key, pixel_id) — not on array position —
    the same pixels get the same randoms regardless of how the wavefront
    is sharded across devices, so sharded and single-device renders are
    bit-identical in threefry mode.

    Returns ``(n_draws, N)`` float32 in [0, 1).
    """
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, pixel_ids)
    us = jax.vmap(lambda k: jax.random.uniform(k, (n_draws,), jnp.float32))(
        keys
    )
    return us.T


# ---------------------------------------------------------------------------
# Counter-based hash RNG ("hash" mode): murmur3-finalizer streams keyed by
# (seed, pixel, sample, bounce, draw). Unlike threefry it costs ~10 VPU
# integer ops per draw and is trivially expressible inside a Pallas
# kernel, so the fused quality megakernel and the XLA wavefront can draw
# IDENTICAL randoms (the same property the LCG gives conformance mode).
# Like threefry, streams are keyed by global pixel id -> bit-identical
# under any sharding of the wavefront.
# ---------------------------------------------------------------------------

_H_GOLD = np.uint32(0x9E3779B9)
_H_M1 = np.uint32(0x85EBCA6B)
_H_M2 = np.uint32(0xC2B2AE35)
_H_C1 = np.uint32(0x27D4EB2F)
_H_C2 = np.uint32(0x165667B1)
_H_C3 = np.uint32(0xD3A2646C)


def _fmix32(h):
    """murmur3 finalizer: a full-avalanche 32-bit mixer."""
    h = h ^ (h >> np.uint32(16))
    h = h * _H_M1
    h = h ^ (h >> np.uint32(13))
    h = h * _H_M2
    return h ^ (h >> np.uint32(16))


def hash_u32(seed, pixel, sample, bounce, draw):
    """Stateless uint32 stream value at counter (sample, bounce, draw).

    All args uint32 scalars/arrays (broadcasting). Two mixer rounds give
    full avalanche between any pair of counters.
    """
    h = seed.astype(jnp.uint32) * _H_GOLD + pixel.astype(jnp.uint32)
    h = _fmix32(h)
    h = h + (
        sample.astype(jnp.uint32) * _H_C1
        + bounce.astype(jnp.uint32) * _H_C2
        + draw.astype(jnp.uint32) * _H_C3
    )
    return _fmix32(h)


def hash_uniform(seed, pixel, sample, bounce, draw):
    """float32 uniform in [0, 1) from ``hash_u32``.

    Uses the top-ish 24 bits so the u32->f32 conversion can round-trip
    through int32 (Mosaic has no unsigned casts), exactly matching the
    in-kernel implementation.
    """
    bits = hash_u32(seed, pixel, sample, bounce, draw) >> np.uint32(8)
    return bits.astype(jnp.int32).astype(jnp.float32) * np.float32(2.0**-24)


def hash_uniforms(seed, pixel_ids, sample, bounce, n_draws: int):
    """``(n_draws, N)`` float32 uniforms for one (sample, bounce) step."""
    s = jnp.asarray(sample)
    b = jnp.asarray(bounce)
    return jnp.stack([
        hash_uniform(jnp.asarray(seed), pixel_ids, s, b, jnp.uint32(d))
        for d in range(n_draws)
    ])
