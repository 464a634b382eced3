"""Inverse rendering (BASELINE config 5): recover camera pose and
albedos from target images, with checkpoint/resume."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.models.inverse import (
    InverseParams,
    apply_params,
    init_state,
    make_train_step,
    param_group_optimizer,
    recover,
    render_loss,
)
from spath_tpu.models.pathtracer import render_radiance
from spath_tpu.scene import default_scene

CFG = RenderConfig(
    width=32, height=24, spp=4,
    rng="threefry", sampler="cosine", nee=True, intersect="pluecker",
)


def _target(scene, cam, seed=100):
    return render_radiance(scene, cam, CFG, seed=seed)


def test_albedo_recovery(scene7):
    """Perturb the foreground triangle's albedo; gradient descent must
    drive it back toward the true value."""
    cam = Camera.default()
    target = _target(scene7, cam)
    true_albedo = np.asarray(scene7.albedo)

    bad_albedo = true_albedo.copy()
    bad_albedo[0] = [0.2, 0.6, 0.9]   # foreground triangle: truth (1,0,0)
    bad_albedo[5] = bad_albedo[6] = [0.3, 0.9, 0.2]  # wall: truth (1,1,1)
    params = InverseParams(
        cam_pos=cam.pos, cam_angle=cam.angle, cam_focal=cam.focal,
        albedo=jnp.asarray(bad_albedo),
    )
    state, losses = recover(
        scene7, target, params, CFG, steps=50,
        optimizer=param_group_optimizer(freeze_pose=True, albedo_lr=3e-2),
        fixed_seed=100, log_every=0,
    )
    # Loss is noise-floored by per-step MC seeds; the real criterion is
    # parameter error.
    assert np.isfinite(losses).all()
    got = np.asarray(state.params.albedo)
    err0 = np.abs(bad_albedo[[0, 5, 6]] - true_albedo[[0, 5, 6]]).mean()
    err1 = np.abs(got[[0, 5, 6]] - true_albedo[[0, 5, 6]]).mean()
    assert err1 < 0.5 * err0, (err0, err1)


def test_pose_recovery():
    """Perturbed camera position/angle converges back (silhouette-free
    scene so the NEE pose gradients are clean)."""
    from tests.test_nee import _wall_and_light_scene

    scene = _wall_and_light_scene()
    cfg = dataclasses.replace(CFG, max_bounces=2)
    true_cam = Camera.default()
    target = render_radiance(scene, true_cam, cfg, seed=100)

    params = InverseParams(
        cam_pos=jnp.asarray([0.0, 0.0, -3.4], jnp.float32),
        cam_angle=jnp.zeros(3, jnp.float32),
        cam_focal=jnp.float32(2.0),
        albedo=scene.albedo,
    )
    # Only the camera position is free: for a frontal planar scene,
    # distance and focal length are nearly degenerate (zooming
    # compensates backing up), so jointly optimizing both finds a
    # compensated pose rather than the true one.
    labels = InverseParams(
        cam_pos="free", cam_angle="frozen", cam_focal="frozen",
        albedo="frozen",
    )
    opt = optax.multi_transform(
        {"free": optax.adam(1.5e-2), "frozen": optax.set_to_zero()}, labels
    )
    state, losses = recover(
        scene, target, params, cfg, steps=120, optimizer=opt,
        fixed_seed=100, log_every=0,
    )
    assert losses[-1] < 0.3 * losses[0]
    z_err0 = abs(-3.4 - (-3.0))
    z_err1 = abs(float(state.params.cam_pos[2]) - (-3.0))
    assert z_err1 < 0.5 * z_err0, float(state.params.cam_pos[2])


def test_checkpoint_roundtrip(tmp_path, scene7):
    cam = Camera.default()
    target = _target(scene7, cam)
    opt = optax.adam(1e-2)
    params = InverseParams.init(scene7, cam)
    state = init_state(opt, params)
    step = make_train_step(opt, scene7, CFG)
    for _ in range(3):
        state, _ = step(state, target)

    from spath_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(int(state.step), state)

    template = init_state(opt, params)
    restored = ckpt.restore_latest(template)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree.leaves(restored.params), jax.tree.leaves(state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_recover_resumes_from_checkpoint(tmp_path, scene7):
    cam = Camera.default()
    target = _target(scene7, cam)
    params = InverseParams.init(scene7, cam)
    ckdir = str(tmp_path / "ck")
    state1, _ = recover(
        scene7, target, params, CFG, steps=4, learning_rate=1e-2,
        checkpoint_dir=ckdir, checkpoint_every=2, log_every=0,
    )
    # Resuming with a higher step budget continues, not restarts.
    state2, losses2 = recover(
        scene7, target, params, CFG, steps=6, learning_rate=1e-2,
        checkpoint_dir=ckdir, checkpoint_every=2, log_every=0,
    )
    assert int(state2.step) == 6
    assert len(losses2) == 2  # only the remaining steps ran


def test_multiview_albedo_recovery(scene7):
    """Three known views constrain albedo recovery better than one."""
    import jax.numpy as jnp
    from spath_tpu.models.inverse import (
        init_state,
        make_multiview_train_step,
        multiview_render_loss,
        stack_cameras,
    )
    from spath_tpu.models.pathtracer import render_radiance

    cams = [
        Camera.default(),
        Camera.default().move_relative(
            jnp.asarray([0.5, 0.0, 0.3], jnp.float32)
        ).rotate_by(jnp.asarray([0.0, -0.25, 0.0], jnp.float32)),
        Camera.default().move_relative(
            jnp.asarray([-0.5, 0.2, 0.3], jnp.float32)
        ).rotate_by(jnp.asarray([0.05, 0.25, 0.0], jnp.float32)),
    ]
    cfg = dataclasses.replace(CFG, width=24, height=18)
    targets = jnp.stack([
        render_radiance(scene7, c, cfg, seed=100 + i)
        for i, c in enumerate(cams)
    ])
    batch = stack_cameras(cams)

    true_albedo = np.asarray(scene7.albedo)
    bad = true_albedo.copy()
    bad[0] = [0.2, 0.6, 0.9]
    bad[5] = bad[6] = [0.3, 0.9, 0.2]
    params = InverseParams(
        cam_pos=cams[0].pos, cam_angle=cams[0].angle,
        cam_focal=cams[0].focal, albedo=jnp.asarray(bad),
    )
    opt = param_group_optimizer(freeze_pose=True, albedo_lr=3e-2)
    state = init_state(opt, params)
    step = make_multiview_train_step(opt, scene7, batch, cfg,
                                     fixed_seed=100)
    for _ in range(40):
        state, aux = step(state, targets)
    got = np.asarray(state.params.albedo)
    err0 = np.abs(bad[[0, 5, 6]] - true_albedo[[0, 5, 6]]).mean()
    err1 = np.abs(got[[0, 5, 6]] - true_albedo[[0, 5, 6]]).mean()
    assert err1 < 0.5 * err0, (err0, err1)


def test_elastic_recovery_from_injected_failure(tmp_path, scene7,
                                                monkeypatch):
    """A step that raises mid-run rolls back to the last checkpoint and
    the loop completes (SURVEY §5 failure-detection parity: process
    restart + checkpointed state)."""
    import spath_tpu.models.inverse as inv

    cam = Camera.default()
    target = _target(scene7, cam)
    params = InverseParams.init(scene7, cam)
    ckdir = str(tmp_path / "ck")

    real_make = inv.make_train_step
    calls = {"n": 0}

    def flaky_make(*args, **kw):
        real_step = real_make(*args, **kw)

        def step(state, target):
            calls["n"] += 1
            if calls["n"] == 4:
                raise RuntimeError("injected device loss")
            return real_step(state, target)

        return step

    monkeypatch.setattr(inv, "make_train_step", flaky_make)
    state, losses = inv.recover(
        scene7, target, params, CFG, steps=6, learning_rate=1e-2,
        checkpoint_dir=ckdir, checkpoint_every=2, log_every=0,
        max_retries=2,
    )
    assert int(state.step) == 6
    assert calls["n"] >= 7  # 6 successful + 1 failed attempt
