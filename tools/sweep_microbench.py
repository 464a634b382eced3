#!/usr/bin/env python
"""Decompose the K-packed intersection sweep: matmul vs epilogue cost.

The blocked MXU sweep (`ops/pallas/intersect_pallas.py`) measures
~50-60% MXU utilization at large T on v5e. Per pair the matmul costs
512 MACs (4 quantity rows x K=128) = 0.031 MXU-cycles and the validity
/distance/argmin epilogue ~30 VPU ops = 0.03 VPU-cycles — if Mosaic
serializes them, ~50% utilization is exactly what falls out. This
script measures, on the real chip:

  * the full kernel (matmul + epilogue);
  * a matmul-only variant (epilogue replaced by a bare min-reduce) —
    the difference is the epilogue's serialized cost;
  * a K=64 variant contracting over SUBLANES via dot_general
    (both operands K-major), which halves the MXU work IF Mosaic
    lowers it at full rate — the K=128 layout pads the lhs LANE dim so
    a narrower K buys nothing in the standard orientation.

Results recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.camera import Camera, generate_rays
from spath_tpu.ops.pallas import intersect_pallas as IP
from spath_tpu.scene import procedural_scene

TILE_N, TILE_T, NBLK = IP.TILE_N, IP.TILE_T, IP._NBLK
T = 65536
N = 230400  # 640x360


def _mk_inputs():
    scene = procedural_scene(T, seed=0)
    o, d = generate_rays(Camera.default(), 640, 360)
    o = IP._pad0(o, TILE_N)
    d = IP._pad0(d, TILE_N)
    rfeat = IP.pack_lhs(IP._ray_rows(o, d), False, axis=0)
    src = IP._pad0(jnp.full(N, -1, jnp.int32), TILE_N, -1)[None, :]
    gfeat = IP.pack_tri_blocks(scene.v0, scene.v1, scene.v2, TILE_T)
    return gfeat, rfeat, src


def _mm_only_kernel(gfeat, rfeat, out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    r = rfeat[:]
    acc = out[:]
    for s in range(NBLK):
        quads = IP._dot1(gfeat[s * 4 * TILE_T:(s + 1) * 4 * TILE_T], r)
        acc = acc + jnp.min(quads, axis=0, keepdims=True)
    out[:] = acc


def _mm_sub64_kernel(gfeatT, rfeatT, out):
    """K=64 on SUBLANES of both operands (dot_general dim0 x dim0)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    r = rfeatT[:]                      # (64, TILE_N)
    acc = out[:]
    for s in range(NBLK):
        g = gfeatT[:, s * 4 * TILE_T:(s + 1) * 4 * TILE_T]  # (64, 4T)
        quads = lax.dot_general(
            g, r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (4T, TILE_N)
        acc = acc + jnp.min(quads, axis=0, keepdims=True)
    out[:] = acc


def timeit(label, f, n=5):
    f()
    best = min((lambda t0: (f(), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(n))
    pairs = N * T
    macs = pairs * 512
    print(f"{label:34s} {best:7.4f}s  {pairs / best:.3e} pairs/s  "
          f"({macs / best / 1e12:.1f} TMAC/s equiv-K128)", flush=True)
    return best


def main():
    gfeat, rfeat, src = _mk_inputs()
    np_, tp = rfeat.shape[1], gfeat.shape[0] // 4
    grid = (np_ // TILE_N, tp // (TILE_T * NBLK))

    full = jax.jit(lambda g, r, s: IP.nearest_hit_pallas_core(
        *_full_args(s))) if False else None

    # full kernel via the public entry
    scene = procedural_scene(T, seed=0)
    o, d = generate_rays(Camera.default(), 640, 360)
    srcv = jnp.full(N, -1, jnp.int32)
    f_full = jax.jit(lambda: IP.nearest_hit_pallas_core(
        o, d, scene.v0, scene.v1, scene.v2, srcv)[0])
    timeit("full sweep kernel", lambda: float(jnp.sum(
        f_full().ravel()[:4])))

    mm = pl.pallas_call(
        _mm_only_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4 * TILE_T * NBLK, IP._KP), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IP._KP, TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, TILE_N), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, np_), jnp.float32)],
    )
    f_mm = jax.jit(lambda g, r: mm(g, r)[0])
    timeit("matmul-only (min epilogue)", lambda: float(jnp.sum(
        f_mm(gfeat, rfeat).ravel()[:4])))

    # K=64 sublane-contraction variant: fold the 6 split-term groups
    # into 10-wide feature slots (60 rows, padded to 64).
    g3 = gfeat.reshape(tp * 4, 8, 16)[:, :6, :10]   # (4Tp, 6, 10)
    gT = g3.reshape(tp * 4, 60).T                   # (60, 4Tp)
    gT = jnp.concatenate(
        [gT, jnp.zeros((4, tp * 4), gT.dtype)], axis=0)  # (64, 4Tp)
    r3 = rfeat.reshape(8, 16, np_)[:6, :10, :]
    rT = r3.reshape(60, np_)
    rT = jnp.concatenate(
        [rT, jnp.zeros((4, np_), rT.dtype)], axis=0)     # (64, Np)
    mm64 = pl.pallas_call(
        _mm_sub64_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, 4 * TILE_T * NBLK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, TILE_N), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, np_), jnp.float32)],
    )
    f_mm64 = jax.jit(lambda g, r: mm64(g, r)[0])
    try:
        timeit("matmul-only K=64 sublane-contract", lambda: float(
            jnp.sum(f_mm64(gT, rT).ravel()[:4])))
    except Exception as e:  # noqa: BLE001
        print(f"K=64 sublane variant FAILED: {type(e).__name__}: {e}")


def _full_args(s):
    raise NotImplementedError


if __name__ == "__main__":
    main()
