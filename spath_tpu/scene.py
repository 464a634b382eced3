"""Scene representation: triangles + materials as a structure-of-arrays pytree.

The reference stores an array-of-structs (``geom::triangle{v0,v1,v2,n}``,
``src/geom.h:185-195``; ``scene::material{reflectance,emittance}``,
``src/scene.h:47-50``) and replicates it whole onto every device
(``src/cl_renderer.cpp:211-214``, ``src/vk_renderer.cpp:357-364``). On TPU a
structure-of-arrays is the natural layout: each field is a ``(T, 3)`` array
so vectorized intersection broadcasts over triangles.

The scene is a registered dataclass pytree, so it's differentiable:
``jax.grad`` w.r.t. ``Scene.vertices`` / ``albedo`` / ``emission`` works
directly. Flat normals are *derived* (recomputed from vertices inside jit,
ref ``geom::flat_normal`` at ``src/geom.h:192-195``) so vertex gradients
flow through the shading normal too.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Differentiable scene parameters.

    Attributes:
      vertices: ``(T, 3, 3)`` float32 — per-triangle ``[v0, v1, v2]``.
      albedo:   ``(T, 3)`` float32 — reflectance color
                (ref ``material::reflectance_color``, ``src/scene.h:48``).
      emission: ``(T, 3)`` float32 — emittance color
                (ref ``material::emittance_color``, ``src/scene.h:49``).
      light_idx: optional STATIC tuple of the indices of (potentially)
                emissive triangles. Rides the pytree as metadata, so it
                survives tracing — the HBM-streamed quality kernel needs
                a static light set for its compact SMEM light table
                (``megakernel_bigscene_quality``) while emission VALUES
                stay traced/differentiable. ``None`` means "derive from
                concrete emission at table-build time".
    """

    vertices: jax.Array
    albedo: jax.Array
    emission: jax.Array
    light_idx: tuple[int, ...] | None = dataclasses.field(
        default=None, metadata=dict(static=True))

    @property
    def n_tris(self) -> int:
        return self.vertices.shape[0]

    @property
    def v0(self) -> jax.Array:
        return self.vertices[:, 0]

    @property
    def v1(self) -> jax.Array:
        return self.vertices[:, 1]

    @property
    def v2(self) -> jax.Array:
        return self.vertices[:, 2]

    def normals(self) -> jax.Array:
        """Flat per-triangle unit normals, ``unit((v1-v0)×(v2-v0))``.

        Semantics of ``geom::flat_normal`` (``src/geom.h:192-195``);
        differentiable w.r.t. vertices.
        """
        e1 = self.v1 - self.v0
        e2 = self.v2 - self.v0
        n = jnp.cross(e1, e2)
        # Guard degenerate (zero-area) triangles: they can never be hit
        # (Möller–Trumbore rejects |a| < ε) but a 0/0 here would poison
        # gradients through the gather.
        return n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30
        )


def make_scene(vertices, albedo, emission) -> Scene:
    """Build a Scene from array-likes, casting to float32.

    When ``emission`` is concrete (the normal case: scene construction
    happens outside jit), the static light set is captured in
    ``Scene.light_idx`` so it survives tracing — required by the
    HBM-streamed quality kernel's compact light table. Tracer inputs
    leave it ``None``.
    """
    try:
        light_idx = tuple(
            np.flatnonzero(np.asarray(emission).sum(-1) > 0).tolist())
    except Exception:  # noqa: BLE001 — tracer input
        light_idx = None
    return Scene(
        vertices=jnp.asarray(vertices, jnp.float32),
        albedo=jnp.asarray(albedo, jnp.float32),
        emission=jnp.asarray(emission, jnp.float32),
        light_idx=light_idx,
    )


def default_scene() -> Scene:
    """The reference's hardcoded 7-triangle scene (``src/main.cpp:185-232``).

    Triangle 0: foreground red triangle. 1-2: green/blue floor plane at
    y=-1 extending ±20. 3-4: white emissive area light at y=0.75. 5-6:
    white back wall at z=1.
    """
    p = 20.0  # floor plane half-size (src/main.cpp:190)
    a = 0.75  # area-light half-size (src/main.cpp:198)
    w = 1.0   # back-wall depth (src/main.cpp:206)
    vertices = np.array(
        [
            [[0.0, 0.0, 1.0], [0.5, -0.5, 0.0], [-0.5, -0.5, 0.0]],
            [[p, -1.0, p], [-p, -1.0, -p], [-p, -1.0, p]],
            [[p, -1.0, p], [p, -1.0, -p], [-p, -1.0, -p]],
            [[a, 0.75, a], [-a, 0.75, a], [a, 0.75, -a]],
            [[-a, 0.75, a], [-a, 0.75, -a], [a, 0.75, -a]],
            [[1.25, 0.5, w], [1.25, -1.0, w], [-1.25, -1.0, w]],
            [[1.25, 0.5, w], [-1.25, -1.0, w], [-1.25, 0.5, w]],
        ],
        dtype=np.float32,
    )
    albedo = np.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0],
        ],
        dtype=np.float32,
    )
    emission = np.zeros((7, 3), dtype=np.float32)
    emission[3] = emission[4] = [1.0, 1.0, 1.0]
    return make_scene(vertices, albedo, emission)


def procedural_scene(
    n_tris: int,
    seed: int = 0,
    extent: float = 3.0,
    tri_size: float = 0.12,
    emissive_fraction: float = 0.01,
) -> Scene:
    """Procedural many-triangle scene for the brute-force stress benchmark.

    The reference has no scene loader or generator — its only scene is the
    hardcoded 7-triangle one (``src/main.cpp:185-232``). BASELINE config 4
    ("10k-100k triangle procedural scene") requires one; this generator
    scatters random small triangles in a box in front of the default camera
    (which sits at (0,0,-3) looking toward +z, ``src/view.h:76``), with a
    small fraction made emissive so paths pick up light.

    Deterministic in ``seed`` (NumPy Philox, host-side — scene building is
    not a hot path).
    """
    rng = np.random.Generator(np.random.Philox(seed))
    centers = rng.uniform(-extent, extent, size=(n_tris, 1, 3))
    centers[..., 2] = rng.uniform(0.0, 2.0 * extent, size=(n_tris, 1))
    offsets = rng.uniform(-tri_size, tri_size, size=(n_tris, 3, 3))
    vertices = (centers + offsets).astype(np.float32)
    albedo = rng.uniform(0.05, 1.0, size=(n_tris, 3)).astype(np.float32)
    emissive = rng.uniform(size=(n_tris,)) < emissive_fraction
    emission = np.where(
        emissive[:, None], rng.uniform(1.0, 4.0, size=(n_tris, 3)), 0.0
    ).astype(np.float32)
    return make_scene(vertices, albedo, emission)
