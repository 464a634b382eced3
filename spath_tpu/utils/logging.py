"""Structured metrics logging.

The reference logs by printf only (renderer description, spp, progress
percentage, per-frame seconds — SURVEY.md §5). The training loop wants
machine-readable history: a JSONL logger (one event per line, flushed
eagerly so a killed run keeps its tail) plus grad-norm helpers.
"""

from __future__ import annotations

import json
import time
from typing import IO

import jax
import jax.numpy as jnp


class JsonlLogger:
    """Append-only JSONL metrics log."""

    def __init__(self, path: str):
        self.path = path
        self._f: IO = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, event: str, **fields) -> None:
        rec = {"event": event, "t": round(time.time() - self._t0, 3)}
        rec.update(fields)
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()


def global_norm(tree) -> jax.Array:
    """L2 norm across a pytree (grad-norm metric)."""
    leaves = [jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree)]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.float32(0.0)
