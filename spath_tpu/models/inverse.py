"""Inverse rendering: recover camera pose + per-triangle albedos from
target images by gradient descent through the renderer.

BASELINE config 5. The reference has nothing of the kind (no gradients,
no optimization, no checkpointing — ``README.md`` limitations); this is
the capability the differentiable TPU framework exists for.

Design: parameters are a small pytree (camera pos/angle/focal + albedo
field); the loss is the mean-squared error between the differentiable
render (threefry + cosine + NEE — the estimator with smooth pose
gradients, see ops/nee.py) and the target; optimization is optax Adam;
the whole train step jits, and with a mesh it runs pixel-sharded with
the scene-parameter gradient psum riding the collective transpose of
``shard_map``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.scene import Scene


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InverseParams:
    """The optimizable unknowns."""

    cam_pos: jax.Array
    cam_angle: jax.Array
    cam_focal: jax.Array
    albedo: jax.Array

    @classmethod
    def init(cls, scene: Scene, camera: Camera) -> "InverseParams":
        return cls(
            cam_pos=camera.pos,
            cam_angle=camera.angle,
            cam_focal=camera.focal,
            albedo=scene.albedo,
        )


def apply_params(params: InverseParams, base_scene: Scene):
    """Materialize (scene, camera) from parameters + fixed geometry."""
    cam = Camera(pos=params.cam_pos, angle=params.cam_angle,
                 focal=params.cam_focal)
    scene = dataclasses.replace(
        base_scene, albedo=jnp.clip(params.albedo, 0.0, 1.0)
    )
    return scene, cam


def render_loss(
    params: InverseParams,
    base_scene: Scene,
    target: jax.Array,
    cfg: RenderConfig,
    seed,
    mesh=None,
) -> jax.Array:
    """MSE between the (HDR, unclamped) render and the target image."""
    scene, cam = apply_params(params, base_scene)
    # Fused-megakernel custom VJP when the config fits (TPU, lcg/hash
    # estimators) — ~10x faster train steps — else the XLA wavefront;
    # with a mesh both run pixel-sharded (scene-parameter gradients
    # psum'd across the rays axis). Same values, same detached-sampling
    # gradients either way.
    from spath_tpu.models.pathtracer import render_radiance_fastgrad

    img = render_radiance_fastgrad(scene, cam, cfg, seed, mesh)
    return jnp.mean((img - target) ** 2)


def param_group_optimizer(
    pose_lr: float = 1e-3,
    albedo_lr: float = 2e-2,
    freeze_pose: bool = False,
    freeze_albedo: bool = False,
) -> optax.GradientTransformation:
    """Per-group Adam over InverseParams (pose vs albedo)."""
    labels = InverseParams(
        cam_pos="pose", cam_angle="pose", cam_focal="pose", albedo="albedo"
    )
    return optax.multi_transform(
        {
            "pose": optax.set_to_zero() if freeze_pose else optax.adam(pose_lr),
            "albedo": (
                optax.set_to_zero() if freeze_albedo else optax.adam(albedo_lr)
            ),
        },
        labels,
    )


def stack_cameras(cameras) -> Camera:
    """Stack a list of Cameras into one batched Camera pytree."""
    return Camera(
        pos=jnp.stack([c.pos for c in cameras]),
        angle=jnp.stack([c.angle for c in cameras]),
        focal=jnp.stack([jnp.asarray(c.focal) for c in cameras]),
    )


def multiview_render_loss(
    params: InverseParams,
    base_scene: Scene,
    cameras: Camera,
    targets: jax.Array,
    cfg: RenderConfig,
    seed,
) -> jax.Array:
    """Mean MSE across V known views (``cameras``/``targets`` batched on
    the leading axis).

    Multiple views are what make scene-parameter recovery well-posed:
    a single frontal view confounds e.g. camera distance with focal
    length (see test_inverse.py) and leaves unseen faces unconstrained.
    The camera parameters in ``params`` are ignored here — the views'
    poses are the knowns.
    """
    scene = dataclasses.replace(
        base_scene, albedo=jnp.clip(params.albedo, 0.0, 1.0)
    )
    n_views = targets.shape[0]

    # Per-view fused-VJP renders (round 5): an UNROLLED static loop —
    # V is a handful of known poses, and V fused-kernel instances beat
    # one vmapped wavefront by the same ~10× as the single-view path
    # (render_loss was upgraded in round 3; this path had been left on
    # render_radiance). On CPU the registry falls back to the wavefront
    # — same values, same detached-sampling gradients.
    from spath_tpu.models.pathtracer import render_radiance_fastgrad

    losses = []
    for v in range(n_views):
        cam = Camera(pos=cameras.pos[v], angle=cameras.angle[v],
                     focal=cameras.focal[v])
        img = render_radiance_fastgrad(scene, cam, cfg,
                                       jnp.asarray(seed) + v)
        losses.append(jnp.mean((img - targets[v]) ** 2))
    return jnp.mean(jnp.stack(losses))


def make_multiview_train_step(
    optimizer: optax.GradientTransformation,
    base_scene: Scene,
    cameras: Camera,
    cfg: RenderConfig,
    fixed_seed: int | None = None,
):
    """Jitted multi-view train step (same TrainState machinery)."""

    def step_fn(state: TrainState, targets: jax.Array):
        seed = state.step if fixed_seed is None else fixed_seed
        loss, grads = jax.value_and_grad(multiview_render_loss)(
            state.params, base_scene, cameras, targets, cfg, seed
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        from spath_tpu.utils.logging import global_norm

        aux = {"loss": loss, "grad_norm": global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), aux

    return jax.jit(step_fn)


class TrainState(NamedTuple):
    params: InverseParams
    opt_state: Any
    step: jax.Array


def make_train_step(
    optimizer: optax.GradientTransformation,
    base_scene: Scene,
    cfg: RenderConfig,
    mesh=None,
    fixed_seed: int | None = None,
):
    """Build the jitted train step.

    ``fixed_seed``: render every step with this seed (common random
    numbers). When the target was rendered with the same seed, the loss
    at the true parameters is exactly zero and gradient noise vanishes —
    the right setting for recovery benchmarks and for low-spp
    optimization where per-step seed noise would otherwise swamp the
    signal. Default (None) draws a fresh seed per step (state.step);
    Adam then averages the gradient noise — use with enough spp.
    """

    def step_fn(state: TrainState, target: jax.Array):
        seed = state.step if fixed_seed is None else fixed_seed
        loss, grads = jax.value_and_grad(render_loss)(
            state.params, base_scene, target, cfg, seed, mesh
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        from spath_tpu.utils.logging import global_norm

        aux = {"loss": loss, "grad_norm": global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), aux

    return jax.jit(step_fn)


def init_state(
    optimizer: optax.GradientTransformation, params: InverseParams
) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.int32(0))


def recover(
    base_scene: Scene,
    target: jax.Array,
    init_params: InverseParams,
    cfg: RenderConfig,
    steps: int = 200,
    learning_rate: float = 5e-3,
    mesh=None,
    fixed_seed: int | None = None,
    optimizer: optax.GradientTransformation | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 50,
    log_every: int = 20,
    log_fn=print,
    metrics_path: str | None = None,
    max_retries: int = 0,
):
    """Full optimization loop with optional orbax checkpoint/resume.

    Returns ``(state, losses)``. If ``checkpoint_dir`` holds a previous
    run, resumes from its latest step.

    ``max_retries``: elastic recovery — if a step raises (device loss,
    preemption), roll back to the last checkpoint and continue, up to
    this many times. Requires ``checkpoint_dir``. (The reference's
    failure handling is a top-level try/catch that exits,
    ``src/main.cpp:263-267``; checkpointed restart is the distributed
    -training equivalent.)

    ``optimizer`` overrides the default Adam — e.g. an
    ``optax.multi_transform`` with per-group learning rates. Pose and
    albedo gradients differ by orders of magnitude, and Adam's
    normalization turns even noise-level pose gradients into full-lr
    steps, so joint recovery usually wants a much smaller pose lr (see
    ``param_group_optimizer``).
    """
    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    state = init_state(optimizer, init_params)

    ckpt = None
    if checkpoint_dir is not None:
        from spath_tpu.utils.checkpoint import Checkpointer

        ckpt = Checkpointer(checkpoint_dir)
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = restored
            log_fn(f"resumed from step {int(state.step)}")

    metrics = None
    if metrics_path is not None:
        from spath_tpu.utils.logging import JsonlLogger

        metrics = JsonlLogger(metrics_path)

    if max_retries and ckpt is None:
        raise ValueError("max_retries requires checkpoint_dir")

    train_step = make_train_step(optimizer, base_scene, cfg, mesh, fixed_seed)
    losses = []
    retries_left = max_retries
    i = int(state.step)
    while i < steps:
        try:
            state, aux = train_step(state, target)
        except Exception:  # noqa: BLE001 — elastic recovery boundary
            if retries_left <= 0:
                raise
            retries_left -= 1
            restored = ckpt.restore_latest(init_state(optimizer, init_params))
            state = restored if restored is not None else init_state(
                optimizer, init_params
            )
            i = int(state.step)
            log_fn(f"step failed; rolled back to step {i} "
                   f"({retries_left} retries left)")
            continue
        i = int(state.step)
        loss = float(aux["loss"])
        losses.append(loss)
        if metrics is not None:
            metrics.log("train_step", step=i - 1, loss=loss,
                        grad_norm=float(aux["grad_norm"]))
        if log_every and ((i - 1) % log_every == 0 or i == steps):
            log_fn(f"step {i - 1}: loss {loss:.6f}")
        if ckpt is not None and (i % checkpoint_every == 0):
            ckpt.save(int(state.step), state)
    if ckpt is not None:
        ckpt.save(int(state.step), state)
    if metrics is not None:
        metrics.close()
    return state, losses
