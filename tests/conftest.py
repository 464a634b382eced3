"""Test configuration: run JAX on a fake 8-device CPU mesh.

Multi-chip hardware isn't needed for correctness tests — the standard JAX
pattern is to force N host CPU devices and build a real ``Mesh`` over
them, so every ``shard_map``/``pjit`` path compiles and executes exactly
as it would on a pod slice (SURVEY.md §4d).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This container's sitecustomize force-registers a remote-TPU ("axon")
# PJRT plugin and pins jax_platforms to it, which would route every
# eager test op over the tunnel. jax.config wins over the env var, so
# pin CPU here before any backend is touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from spath_tpu.scene import default_scene  # noqa: E402


@pytest.fixture(scope="session")
def scene7():
    """The reference's 7-triangle scene (``src/main.cpp:185-232``)."""
    return default_scene()


@pytest.fixture(scope="session")
def scene7_np(scene7):
    return (
        np.asarray(scene7.vertices),
        np.asarray(scene7.albedo),
        np.asarray(scene7.emission),
    )
