"""Hemisphere direction sampling.

Two modes:

  * **angle** — the reference's sampler, ``geom::rand_unit_vec``
    (``src/geom.h:164-177``, GPU copies at ``src/render.cl:155-169`` and
    ``src/render.comp:140-158``): azimuth = u1·2π, elevation = u2·π/2,
    direction = (cos(az)·cos(el), sin(el), sin(az)·cos(el)), sign-flipped
    to align with the given normal. This is *angle*-uniform — NOT
    cosine-weighted and NOT even solid-angle-uniform (density piles up at
    the pole) — and the reference pairs it with p = 1/(2π)
    (``src/cpu_renderer.cpp:60``), which is only correct for a
    solid-angle-uniform sampler. Conformance mode reproduces both quirks
    exactly; the per-bounce estimator weight (excluding albedo) is
    ``BRDF_scale·cosθ/p = 2·cosθ``.

  * **cosine** — cosine-weighted sampling about the shading normal
    (quality mode): pdf = cosθ/π cancels the Lambertian BRDF·cosθ term
    exactly, so the per-bounce weight is 1 and variance drops. This is
    the correct importance sampler the reference lacks.

Both are pure float32 functions of two uniforms → reparameterization is
explicit: callers apply the detached-sampling policy (stop-gradient on
the sampled direction) at the call site.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: a module-level jnp scalar is a committed
# device buffer, and executables that close over one run ~400x slower
# on the remote-TPU (axon) path than ones with inlined literals.
TWO_PI = np.float32(2.0 * np.pi)
HALF_PI = np.float32(0.5 * np.pi)


def angle_sample(normal: jax.Array, u1: jax.Array, u2: jax.Array):
    """The reference's angle-uniform hemisphere sample.

    Args:
      normal: ``(N, 3)`` orientation normals (already flipped against the
        incoming ray by the caller, ``src/cpu_renderer.cpp:55-57``).
      u1, u2: ``(N,)`` uniforms — u1 drives azimuth, u2 elevation, in the
        reference's draw order (``src/geom.h:168-169``).

    Returns:
      ``(dirs, weight)``: unit directions aligned with ``normal`` and the
      per-bounce estimator weight ``2·cosθ`` (the reference's
      ``BRDF·cosθ/p`` chain with albedo factored out,
      ``src/cpu_renderer.cpp:60-67``).
    """
    rv_xz = u1 * TWO_PI
    rv_y = u2 * HALF_PI
    f_x = jnp.cos(rv_y)
    f_y = jnp.sin(rv_y)
    out = jnp.stack([jnp.cos(rv_xz) * f_x, f_y, jnp.sin(rv_xz) * f_x], axis=-1)
    # Flip to the normal's hemisphere (src/geom.h:174-176).
    aligned = jnp.sum(normal * out, axis=-1, keepdims=True) >= 0.0
    dirs = jnp.where(aligned, out, -out)
    cos_theta = jnp.sum(dirs * normal, axis=-1)
    return dirs, jnp.float32(2.0) * cos_theta


def _orthonormal_basis(n: jax.Array):
    """Branchless tangent frame (Duff et al. 2017) around unit normals."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0).astype(n.dtype)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def cosine_sample(normal: jax.Array, u1: jax.Array, u2: jax.Array):
    """Cosine-weighted hemisphere sample about ``normal``.

    Returns ``(dirs, weight)`` with weight = 1 (pdf cancels the Lambertian
    BRDF·cosθ exactly). The sampler the reference should have had.
    """
    phi = u1 * TWO_PI
    r = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    z = jnp.sqrt(u2)
    t, bt = _orthonormal_basis(normal)
    dirs = (
        t * (jnp.cos(phi) * r)[..., None]
        + bt * (jnp.sin(phi) * r)[..., None]
        + normal * z[..., None]
    )
    return dirs, jnp.ones_like(u1)


def uniform_sample(normal: jax.Array, u1: jax.Array, u2: jax.Array):
    """Solid-angle-uniform hemisphere sample, pdf = 1/(2π).

    The sampler the reference's p = 1/(2π) would have been correct for.
    Per-bounce weight (albedo factored out) = BRDF_scale·cosθ/p = 2·cosθ.
    Useful as an unbiased cross-check against the cosine sampler.
    """
    phi = u1 * TWO_PI
    z = u2
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    t, bt = _orthonormal_basis(normal)
    dirs = (
        t * (jnp.cos(phi) * r)[..., None]
        + bt * (jnp.sin(phi) * r)[..., None]
        + normal * z[..., None]
    )
    cos_theta = jnp.sum(dirs * normal, axis=-1)
    return dirs, jnp.float32(2.0) * cos_theta


def hemisphere_sample(mode: str, normal, u1, u2):
    """Dispatch on sampler mode ("angle" | "cosine" | "uniform")."""
    if mode == "angle":
        return angle_sample(normal, u1, u2)
    if mode == "cosine":
        return cosine_sample(normal, u1, u2)
    if mode == "uniform":
        return uniform_sample(normal, u1, u2)
    raise ValueError(f"unknown sampler mode: {mode}")
