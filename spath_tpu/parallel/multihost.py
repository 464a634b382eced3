"""Multi-host initialization and scaling measurement.

The reference is strictly single-process (SURVEY.md §5 "Distributed
communication backend: None"). The TPU-native story:

  * ``init_multihost()`` — ``jax.distributed.initialize`` (controller
    address/process id from the standard env vars on TPU pods); after
    it, ``jax.devices()`` spans all hosts and every ``Mesh`` built from
    it runs the same SPMD program with ray shards riding ICI within a
    host and DCN across hosts. No other code changes — the mesh is the
    only abstraction.

  * ``scaling_efficiency()`` — BASELINE config 5's ≥85% criterion:
    render the same frame on 1 device and on N devices and report
    t(1)/(N·t(N)). On a real pod slice run this under
    ``init_multihost``; in the test environment it runs on the fake
    CPU mesh (a smoke test of the machinery, not a hardware claim).
"""

from __future__ import annotations

import time

import jax

from spath_tpu.parallel.mesh import make_mesh
from spath_tpu.parallel.shard import render_pt_sharded


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize JAX's distributed runtime (no-op if single-process
    env vars are absent and no arguments are given)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # Single-process environment (ValueError) or already initialized
        # (RuntimeError in current JAX) — both mean "nothing to do".
        pass


def _sync(x):
    import jax.numpy as jnp

    float(jnp.sum(x.ravel()[:1]))
    return x


def scaling_efficiency(scene, camera, cfg, n_devices: int, seed=0,
                       reps: int = 2):
    """t(1) / (n · t(n)) for the sharded forward render.

    Returns ``(efficiency, t1, tn)``.
    """
    mesh1 = make_mesh(1)
    meshn = make_mesh(n_devices)

    def run(mesh):
        _sync(render_pt_sharded(scene, camera, cfg, seed, mesh))  # compile
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            _sync(render_pt_sharded(scene, camera, cfg, seed, mesh))
            best = min(best, time.perf_counter() - t)
        return best

    t1 = run(mesh1)
    tn = run(meshn)
    return t1 / (n_devices * tn), t1, tn
