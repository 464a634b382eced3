"""Unit tests for ``megakernel_bigscene.stream_scatter_rmw`` — the
double-buffered HBM read-modify-write scatter shared by both streamed
backward kernels (round 4). Exercises the DMA drain/overlap logic at
n_blocks 1/2/3/7 (the drain special-cases n_blocks < 3) and the
accumulate-across-grid-steps contract, against a NumPy scatter oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spath_tpu.ops.pallas.megakernel_bigscene import (
    stream_scatter_rmw,
    zero_hbm_blocks,
)
from spath_tpu.ops.pallas.megakernel_grad import _split3

ROWS = 8
TILE_T = 128
R = 128


def _harness(contribs, idxs, n_blocks: int, grid: int):
    """Pallas harness: each grid step scatters its (E, ROWS, R) event
    contributions at (E, 1, R) indices into a (ROWS, n_blocks·TILE_T)
    HBM accumulator via the shared rmw pass."""

    def kernel(cmat, idx, out, rwbuf, rwsems):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            zero_hbm_blocks(out, rwbuf, rwsems, n_blocks, TILE_T)

        events = []
        for e in range(cmat.shape[0] // ROWS):
            events.append((_split3(cmat[e * ROWS:(e + 1) * ROWS, :]),
                           idx[e:e + 1, :].T))
        stream_scatter_rmw(out, rwbuf, rwsems, events, n_blocks,
                           TILE_T, R)

    ne = contribs.shape[1]
    # real-TPU block sublane dims must be multiples of 8: pad the
    # per-step index rows up (padding rows scatter nothing: idx -1)
    nep = -(-ne // 8) * 8
    idx_p = jnp.concatenate(
        [idxs, jnp.full((grid, nep - ne, R), -1, jnp.int32)], axis=1)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ne * ROWS, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nep, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_blocks * TILE_T),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, TILE_T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(contribs.reshape(grid * ne * ROWS, R),
      idx_p.reshape(grid * nep, R))


@pytest.mark.parametrize("n_blocks", [1, 2, 3, 7])
@pytest.mark.parametrize("grid,ne", [(1, 1), (2, 3)])
def test_rmw_scatter_matches_numpy(n_blocks, grid, ne):
    rng = np.random.default_rng(n_blocks * 10 + grid)
    t = n_blocks * TILE_T
    contribs = rng.normal(size=(grid, ne, ROWS, R)).astype(np.float32)
    # indices across the full range, plus -1 no-scatter sentinels
    idxs = rng.integers(-1, t, size=(grid, ne, R)).astype(np.int32)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_harness(jnp.asarray(contribs),
                                  jnp.asarray(idxs), n_blocks, grid))

    want = np.zeros((ROWS, t), np.float32)
    for g in range(grid):
        for e in range(ne):
            for lane in range(R):
                j = idxs[g, e, lane]
                if j >= 0:
                    want[:, j] += contribs[g, e, :, lane]
    # 3-way bf16 split is exact per product; only f32 summation order
    # differs from the oracle's
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_rmw_scatter_dense_collisions_vs_fp64_oracle():
    """Accumulation-ORDER check at realistic density (round-5 item 3):
    thousands of events per pass with indices skewed so a few triangles
    absorb hundreds of f32 additions each — the collision depth a
    100k–1M-triangle backward pass produces per block. The f32 rmw
    accumulator must stay within f32-summation noise of an fp64 oracle
    (the round-4 oracle test ran toy sizes where depth never exceeded a
    handful)."""
    rng = np.random.default_rng(42)
    n_blocks, grid, ne = 2, 8, 6
    t = n_blocks * TILE_T
    contribs = rng.normal(size=(grid, ne, ROWS, R)).astype(np.float32)
    idxs = rng.integers(0, t, size=(grid, ne, R)).astype(np.int32)
    # skew: half of all events land on 4 hot triangles -> ~700 f32
    # additions deep on each hot column
    hot = rng.integers(0, t, size=4)
    mask = rng.random(size=idxs.shape) < 0.5
    idxs[mask] = hot[rng.integers(0, 4, size=int(mask.sum()))]

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_harness(jnp.asarray(contribs),
                                  jnp.asarray(idxs), n_blocks, grid))

    want64 = np.zeros((ROWS, t), np.float64)
    for g in range(grid):
        for e in range(ne):
            for lane in range(R):
                j = idxs[g, e, lane]
                if j >= 0:
                    want64[:, j] += contribs[g, e, :, lane].astype(
                        np.float64)
    scale = np.abs(want64).max()
    # f32 summation of depth-K sums: error ~ sqrt(K)·eps·|terms|; at
    # K≈700 that is ~3e-6 of the term scale — 1e-4·scale is 30×
    # headroom while still catching any order-dependent blowup
    np.testing.assert_allclose(got, want64, rtol=2e-4,
                               atol=1e-4 * scale)
