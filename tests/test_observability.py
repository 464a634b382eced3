"""Observability: rays/s timing, bounce stats, structured metrics."""

import json
import os

import numpy as np

from spath_tpu.camera import Camera
from spath_tpu.config import RenderConfig
from spath_tpu.utils.logging import JsonlLogger, global_norm
from spath_tpu.utils.profiling import FrameTimer, bounce_stats


def test_bounce_stats_decreasing(scene7):
    cfg = RenderConfig(width=32, height=24, spp=1)
    fr = bounce_stats(scene7, Camera.default(), cfg)
    assert fr.shape == (5,)
    # occupancy is non-increasing; some rays die on the background
    assert (np.diff(fr) <= 1e-6).all()
    assert 0.0 < fr[0] < 1.0


def test_frame_timer(scene7):
    import time

    cfg = RenderConfig(width=8, height=8, spp=2)
    ft = FrameTimer(cfg)
    with ft.frame():
        time.sleep(0.01)
    assert ft.last_s >= 0.01
    assert ft.rays_per_s > 0


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = JsonlLogger(path)
    lg.log("train_step", step=0, loss=1.5)
    lg.log("train_step", step=1, loss=1.2)
    lg.close()
    lines = [json.loads(x) for x in open(path)]
    assert [r["step"] for r in lines] == [0, 1]
    assert lines[0]["event"] == "train_step"


def test_global_norm():
    import jax.numpy as jnp

    tree = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray([[4.0]])}
    assert float(global_norm(tree)) == 5.0


def test_recover_writes_metrics(tmp_path, scene7):
    from spath_tpu.models.inverse import InverseParams, recover
    from spath_tpu.models.pathtracer import render_radiance

    cfg = RenderConfig(width=16, height=12, spp=2, rng="threefry",
                       sampler="cosine")
    cam = Camera.default()
    target = render_radiance(scene7, cam, cfg, seed=1)
    mpath = str(tmp_path / "metrics.jsonl")
    recover(scene7, target, InverseParams.init(scene7, cam), cfg,
            steps=3, log_every=0, metrics_path=mpath)
    recs = [json.loads(x) for x in open(mpath)]
    assert len(recs) == 3
    assert all("grad_norm" in r and "loss" in r for r in recs)
