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

Reference parity for the other two RNG functors (SURVEY.md C5/C6):

  * ``basic_dist`` (``src/frand.h:26-30``) wraps global-state
    ``std::rand()`` with the process-default seed. ``std::rand`` is
    implementation-defined, but the reference's only build target is
    gcc/Linux, where it is glibc's TYPE_3 additive-feedback generator —
    a deterministic algorithm reproduced bit-exactly by ``GlibcRand``
    below (validated against the host libc via ctypes in
    ``tests/test_rng_conformance.py``). A single global-state stream is
    inherently sequential (unusable under SPMD tracing), exactly like
    the reference's own single-threaded ``render_pt`` debug path
    (``src/cpu_renderer.cpp:105-116``) that is its sole user — so it is
    provided as the host-side golden for the sequential oracle renderer,
    not as a device mode. Device conformance mode remains the LCG — the
    scheme the reference's own GPU kernels use.
  * ``vec_dist`` (``src/frand.h:32-50``) — the pre-shuffled-table RNG.
    The shuffle is ``std::random_shuffle`` (removed in C++17), which on
    the reference's toolchain (libstdc++) is forward Fisher–Yates with
    ``std::rand() % (i + 1)`` — so with ``GlibcRand`` the exact table is
    reproducible: ``vec_dist_table`` below builds it bit-exactly
    (validated against a compiled C++14 oracle in the tests). ``rng=
    "table"`` is also a device mode: the table rides on-device and each
    pixel's cursor starts at its global pixel id (the same
    stream-per-pixel adaptation the reference itself makes for
    ``seed_dist`` in ``render.cl:233``), making it sharding-independent.
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


class GlibcRand:
    """Bit-exact glibc ``rand()`` — the stream behind the reference's
    ``basic_dist`` (``src/frand.h:26-30``) on its gcc/Linux build target.

    glibc's default generator (TYPE_3) is an additive-feedback LFSR over
    a 31-entry int32 table seeded by a Park–Miller LCG; the classic
    closed form (equivalent to the fptr/rptr pointer walk in
    ``stdlib/random_r.c``)::

        r[0]     = seed                       (srand(0) acts as srand(1))
        r[1..30] = 16807 * r[i-1] mod 2^31-1
        r[31..33]= r[i-31]
        r[i>=34] = r[i-3] + r[i-31]  (mod 2^32)
        output_k = r[344 + k] >> 1            (first 310 outputs discarded)

    Validated draw-for-draw against the host libc via ctypes
    (``tests/test_rng_conformance.py``). The process-default stream the
    reference actually consumes (it never calls ``srand``) is seed 1.
    """

    RAND_MAX = 2147483647

    def __init__(self, seed: int = 1):
        seed = int(seed) & 0xFFFFFFFF
        if seed == 0:
            seed = 1
        r = [0] * 34
        # The seeding LCG runs on int32 (negative intermediates possible
        # for seeds >= 2^31 via Schrage); plain modular form is exact for
        # the positive int32 range and matches Schrage there.
        word = seed if seed < 0x80000000 else seed - 0x100000000
        r[0] = word & 0xFFFFFFFF
        for i in range(1, 31):
            hi, lo = divmod(word, 127773) if word >= 0 else (
                -((-word) // 127773), -((-word) % 127773))
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r[i] = word
        for i in range(31, 34):
            r[i] = r[i - 31]
        self._r = r
        self._i = 34
        for _ in range(310):            # glibc discards 10*31 outputs
            self._step()

    def _step(self) -> int:
        r, i = self._r, self._i
        v = (r[i - 3] + r[i - 31]) & 0xFFFFFFFF
        r.append(v)
        self._i = i + 1
        if self._i > 400:               # keep the window bounded
            del r[: self._i - 34]
            self._i = 34
        return v >> 1

    def rand(self) -> int:
        """One ``std::rand()`` draw in [0, RAND_MAX]."""
        return self._step()

    def __call__(self) -> float:
        """One ``basic_dist`` draw: ``1.0 * rand() / RAND_MAX`` in double
        (``src/frand.h:28``)."""
        return self.rand() / float(self.RAND_MAX)


def vec_dist_table(max_values: int, rand: "GlibcRand | None" = None):
    """The exact ``vec_dist`` table (``src/frand.h:36-43``) as built on
    the reference's toolchain: ``max_values`` evenly spaced doubles
    ``step*i`` plus a trailing 1.0, permuted by libstdc++'s
    ``std::random_shuffle`` — forward Fisher–Yates drawing
    ``std::rand() % (i + 1)`` (``bits/stl_algo.h``; validated against a
    compiled C++14 oracle in ``tests/test_rng_conformance.py``).

    ``rand`` defaults to the process-default glibc stream (seed 1).
    Returns a float64 numpy array of length ``max_values + 1``.
    """
    rand = rand if rand is not None else GlibcRand(1)
    step = 1.0 / max_values
    vals = [step * i for i in range(max_values)] + [1.0]
    for i in range(1, len(vals)):
        j = rand.rand() % (i + 1)
        if i != j:
            vals[i], vals[j] = vals[j], vals[i]
    return np.asarray(vals, np.float64)


class TableRng:
    """The reference's ``vec_dist`` RNG (``src/frand.h:32-50``):
    ``max_values + 1`` evenly spaced values in [0, 1], shuffled once,
    then cycled. Host-side stateful form (the device form is
    ``cfg.rng='table'`` — see ``table_uniforms``).

    With ``exact=True`` (default) the permutation is the bit-exact
    libstdc++ ``std::random_shuffle`` table via ``vec_dist_table``;
    ``exact=False`` keeps the round-1 seeded-NumPy shuffle for
    experiments that want a different permutation per seed.
    """

    def __init__(self, max_values: int, seed: int = 1, exact: bool = True):
        if exact:
            self._values = vec_dist_table(max_values, GlibcRand(seed))
        else:
            step = 1.0 / max_values
            vals = np.arange(max_values + 1) * step
            vals[-1] = 1.0
            rng = np.random.Generator(np.random.Philox(seed))
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


def device_table(max_values: int) -> np.ndarray:
    """Cached float32 ``vec_dist`` table for the device "table" RNG mode.

    Built once per size on the host (the exact libstdc++ permutation,
    seed-1 glibc stream) and embedded as a compile-time constant.
    """
    return _device_table_cached(int(max_values))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _device_table_cached(max_values: int) -> np.ndarray:
    return vec_dist_table(max_values).astype(np.float32)


def table_uniforms(table: jax.Array, pixel_ids, sample, bounce,
                   n_draws: int, max_bounces: int, offset=0):
    """Device-mode ``vec_dist`` draws: ``(n_draws, N)`` float32.

    The reference's ``vec_dist`` is one shared sequential cursor — a
    serialization point no SPMD program can reproduce literally. The
    adaptation mirrors the one the reference itself makes for its GPU
    kernels' ``seed_dist`` (per-pixel streams keyed by pixel id,
    ``src/render.cl:233``): pixel ``p``'s k-th draw reads
    ``table[(p + o + k) % len(table)]`` where ``k`` counts draws in walk
    order ``(sample, bounce, draw)`` and ``o`` is the frame seed offset.
    Stateless in (pixel, counters), so renders are bit-identical under
    any sharding of the wavefront.
    """
    n = table.shape[0]
    k0 = (jnp.asarray(sample, jnp.uint32) * jnp.uint32(max_bounces)
          + jnp.asarray(bounce, jnp.uint32)) * jnp.uint32(n_draws)
    base = pixel_ids.astype(jnp.uint32) + jnp.asarray(offset, jnp.uint32)
    us = []
    for d in range(n_draws):
        cursor = (base + k0 + jnp.uint32(d)) % jnp.uint32(n)
        us.append(jnp.take(table, cursor.astype(jnp.int32), axis=0))
    return jnp.stack(us)


def hash_uniforms(seed, pixel_ids, sample, bounce, n_draws: int):
    """``(n_draws, N)`` float32 uniforms for one (sample, bounce) step."""
    s = jnp.asarray(sample)
    b = jnp.asarray(bounce)
    return jnp.stack([
        hash_uniform(jnp.asarray(seed), pixel_ids, s, b, jnp.uint32(d))
        for d in range(n_draws)
    ])
