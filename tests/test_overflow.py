"""Overflow policy: training must never silently truncate gradients.

The reference viewer cannot overflow -- it reallocates its sort buffers from
the measured intersection count every frame (reference: src/renderer.ts:
419-441). The static-capacity TPU pipeline instead raises a flag
(ops/binning.py); these tests pin the contract that `fit` ACTS on it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene, render
from gsplat_tpu.train.loop import fit

CFG = RenderConfig(
    width=32, height=32, tile_size=8, max_intersections=1 << 12,
    max_tiles_per_gaussian=32, block_size=8, max_per_tile=128,
)
TINY = dataclasses.replace(CFG, max_intersections=8)  # deliberately undersized


def _batch(scene, cfg):
    cam = Camera.default(cfg.width, cfg.height)
    target = render(scene, cam, CFG).image  # target from a non-overflowing cfg
    return jax.tree.map(lambda x: x[None], cam), target[None]


def test_fit_raises_on_overflow():
    scene = random_scene(jax.random.key(0), 40, sh_degree=1)
    cameras, targets = _batch(scene, TINY)
    with pytest.raises(RuntimeError, match="max_intersections"):
        fit(scene, cameras, targets, TINY, steps=4, log_every=2)


def test_fit_warn_policy_continues(capsys):
    scene = random_scene(jax.random.key(0), 40, sh_degree=1)
    cameras, targets = _batch(scene, TINY)
    _, metrics = fit(
        scene, cameras, targets, TINY, steps=4, log_every=2,
        overflow_policy="warn",
    )
    assert len(metrics) == 2
    assert "capacity overflow" in capsys.readouterr().out


def test_fit_clean_run_does_not_raise():
    scene = random_scene(jax.random.key(0), 40, sh_degree=1)
    cameras, targets = _batch(scene, CFG)
    _, metrics = fit(scene, cameras, targets, CFG, steps=4, log_every=2)
    assert len(metrics) == 2


def test_overflow_message_suggests_capacity():
    scene = random_scene(jax.random.key(0), 40, sh_degree=1)
    cameras, targets = _batch(scene, TINY)
    out = render(scene, Camera.default(32, 32), TINY)
    demand = int(out.num_intersections)
    assert demand > TINY.max_intersections  # the premise of the test
    with pytest.raises(RuntimeError, match=str(demand)):
        fit(scene, cameras, targets, TINY, steps=2, log_every=1)


def test_sharded_step_reports_overflow():
    from jax.sharding import Mesh
    from gsplat_tpu.parallel.train_step import (
        init_train_state, make_optimizer, make_sharded_train_step, shard_batch,
    )

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(jax.devices()[:2], ("tiles",))
    cfg = dataclasses.replace(TINY, impl="jnp")
    scene = random_scene(jax.random.key(0), 40, sh_degree=1)
    optimizer = make_optimizer(1e-2)
    state = init_train_state(scene, optimizer)
    cam = Camera.default(cfg.width, cfg.height)
    cameras = jax.tree.map(lambda x: x[None], cam)
    targets = jnp.zeros((1, cfg.padded_height, cfg.padded_width, 3))
    import numpy as np
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2), ("data", "tiles"))
    step = make_sharded_train_step(cfg, mesh, optimizer)
    cameras, targets = shard_batch(cameras, targets, mesh)
    _, _, aux, _ = step(state, cameras, targets)
    assert bool(aux["overflow"])
