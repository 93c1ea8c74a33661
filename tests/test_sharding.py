"""Multi-device paths on the 8-virtual-CPU mesh: tile-sharded render equals
the single-device render; the distributed train step runs and reduces loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene, render
from gsplat_tpu.parallel.sharding import (
    local_tile_cfg,
    make_mesh,
    render_tile_sharded,
)
from gsplat_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_sharded_train_step,
    shard_batch,
)

CFG = RenderConfig(
    width=64,
    height=64,
    tile_size=8,
    max_intersections=1 << 13,
    max_tiles_per_gaussian=64,
    block_size=8,
    max_per_tile=256,
)


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_tile_sharded_render_matches_single(n_shards):
    mesh = make_mesh({"tiles": n_shards})
    scene = random_scene(jax.random.key(0), 200, sh_degree=2)
    cam = Camera.default(CFG.width, CFG.height)

    img, trans, ovf = jax.jit(
        lambda s, c: render_tile_sharded(s, c, CFG, mesh)
    )(scene, cam)
    ref = render(scene, cam, CFG)

    assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(trans), np.asarray(ref.transmittance), rtol=1e-4, atol=1e-6
    )


def test_local_tile_cfg_rejects_indivisible():
    with pytest.raises(ValueError):
        local_tile_cfg(CFG, 3)  # tiles_y = 8 not divisible by 3


def test_sharded_train_step_reduces_loss():
    mesh = make_mesh({"data": 2, "tiles": 4})
    scene = random_scene(jax.random.key(1), 150, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)

    # Targets: renders of a reference scene (so the loss is minimizable).
    target_scene = random_scene(jax.random.key(2), 150, sh_degree=1)
    target = render(target_scene, cam, CFG).image
    batch = 4  # 2 data shards x 2 views each
    cams = jax.tree.map(lambda x: jnp.stack([x] * batch), cam)
    targets = jnp.stack([target] * batch)
    # Pad targets to the padded image size (tile grid covers 64x64 -> equal).
    assert CFG.padded_height == CFG.height

    optimizer = make_optimizer(lr=5e-2)
    step = make_sharded_train_step(CFG, mesh, optimizer)
    state = init_train_state(scene, optimizer)
    cams_s, targets_s = shard_batch(cams, targets, mesh)

    state, l0, _, _ = step(state, cams_s, targets_s)
    l0 = float(l0)
    for _ in range(10):
        state, l1, _, _ = step(state, cams_s, targets_s)
    l1 = float(l1)
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, f"loss did not decrease: {l0} -> {l1}"
    assert int(state.step) == 11


def test_sharded_loss_matches_single_device():
    """One distributed step's loss == the single-device L1 loss."""
    mesh = make_mesh({"data": 2, "tiles": 2})
    scene = random_scene(jax.random.key(3), 100, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = jax.random.uniform(jax.random.key(4), (CFG.height, CFG.width, 3))
    cams = jax.tree.map(lambda x: jnp.stack([x] * 2), cam)
    targets = jnp.stack([target] * 2)

    optimizer = make_optimizer(lr=0.0)  # lr 0: state unchanged, read loss only
    step = make_sharded_train_step(CFG, mesh, optimizer, ssim_weight=0.0)
    state = init_train_state(scene, optimizer)
    cams_s, targets_s = shard_batch(cams, targets, mesh)
    _, loss, _, _ = step(state, cams_s, targets_s)

    ref = render(scene, cam, CFG)
    ref_loss = float(jnp.mean(jnp.abs(ref.image - target)))
    assert abs(float(loss) - ref_loss) < 1e-5


@pytest.mark.parametrize("n_tiles", [2, 4])
def test_sharded_ssim_matches_single(n_tiles):
    """Exact distributed SSIM: the default (1-w)*L1 + w*DSSIM objective
    under tile sharding equals the single-device rgb_loss -- the halo
    exchange must reconstruct every 11x11 window across band boundaries."""
    from gsplat_tpu.train.losses import rgb_loss

    mesh = make_mesh({"data": 2, "tiles": n_tiles})
    scene = random_scene(jax.random.key(5), 120, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = jax.random.uniform(jax.random.key(6), (CFG.height, CFG.width, 3))
    cams = jax.tree.map(lambda x: jnp.stack([x] * 2), cam)
    targets = jnp.stack([target] * 2)

    optimizer = make_optimizer(lr=0.0)
    step = make_sharded_train_step(CFG, mesh, optimizer)  # default w=0.2
    state = init_train_state(scene, optimizer)
    cams_s, targets_s = shard_batch(cams, targets, mesh)
    _, loss, aux, _ = step(state, cams_s, targets_s)
    assert not bool(aux["overflow"])

    ref = render(scene, cam, CFG)
    ref_loss = float(rgb_loss(ref.image, target, ssim_weight=0.2))
    assert abs(float(loss) - ref_loss) < 1e-5


def test_sharded_ssim_rejects_short_bands():
    """Bands shorter than the SSIM halo can't reconstruct the windows."""
    cfg = dataclasses.replace(CFG, width=32, height=32, tile_size=4)
    mesh = make_mesh({"tiles": 8})  # 4-row bands < SSIM_HALO rows
    with pytest.raises(ValueError, match="halo"):
        make_sharded_train_step(cfg, mesh, make_optimizer(1e-2))


def test_multihost_helpers_single_process():
    """Single-process semantics of the multi-host helpers (the distributed
    runtime itself needs real multi-host hardware; here: the degenerate
    1-process contract)."""
    from gsplat_tpu.parallel import multihost

    multihost.initialize()  # no-op without a coordinator
    assert multihost.is_primary()
    local, off = multihost.process_local_batch(4)
    assert (local, off) == (4, 0)
    mesh = multihost.global_mesh({"tiles": 8})
    assert mesh.shape["tiles"] == 8


def test_tile_sharded_tiered_grads_match_single():
    """Tile-sharded rendering with the production 'tiered' binning: image
    and gradients equal the single-device path (exercises the per-shard
    row-window bookkeeping of the sort-based gather backward)."""
    cfg = dataclasses.replace(CFG, binning="tiered")
    mesh = make_mesh({"tiles": 4})
    scene = random_scene(jax.random.key(9), 220, sh_degree=2)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(10), (cfg.height, cfg.width, 3))

    def sharded_loss(s):
        img, _, _ = render_tile_sharded(s, cam, cfg, mesh)
        return jnp.mean(jnp.abs(img - target))

    def single_loss(s):
        return jnp.mean(jnp.abs(render(s, cam, cfg).image - target))

    g_sh = jax.jit(jax.grad(sharded_loss))(scene)
    g_ref = jax.jit(jax.grad(single_loss))(scene)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6
        )


def test_bench_sharded_runs_on_cpu_mesh():
    """The --sharded tiles=N bench path is one command on any future
    multi-chip allocation; CI exercises it for correctness + capacity (not
    speed) on the virtual mesh, including the comm-volume accounting."""
    from gsplat_tpu.utils.bench import run_bench

    r = run_bench(
        num_gaussians=2000, width=64, height=64, impl="jnp", mode="fwd_bwd",
        iters=1, tile_size=8, max_intersections=1 << 12, block_size=8,
        max_per_tile=256, sharded_tiles=4, ssim_weight=0.2,
    )
    assert r["value"] > 0
    assert not r["details"]["overflow"]
    assert r["details"]["grad_psum_bytes_per_step"] > 0
    assert r["details"]["ssim_halo_bytes_per_step"] > 0
    assert r["details"]["per_shard_max_intersections"] == 1 << 12


def test_tile_sharded_packed16_matches_single():
    """The packed16 fast path under tile sharding: image AND gradients equal
    the single-device packed16 path. The local band config must carry the
    GLOBAL quantization ranges (means are global pixel coordinates); with
    per-band ranges the y-unpack would be off by the band offset and this
    test would fail loudly."""
    cfg = dataclasses.replace(
        CFG, binning="tiered", stream_format="packed16"
    )
    mesh = make_mesh({"tiles": 4})
    scene = random_scene(jax.random.key(11), 220, sh_degree=2)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(12), (cfg.height, cfg.width, 3))

    img, trans, ovf = jax.jit(
        lambda s, c: render_tile_sharded(s, c, cfg, mesh)
    )(scene, cam)
    ref = render(scene, cam, cfg)
    assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )

    def sharded_loss(s):
        im, _, _ = render_tile_sharded(s, cam, cfg, mesh)
        return jnp.mean(jnp.abs(im - target))

    def single_loss(s):
        return jnp.mean(jnp.abs(render(s, cam, cfg).image - target))

    g_sh = jax.jit(jax.grad(sharded_loss))(scene)
    g_ref = jax.jit(jax.grad(single_loss))(scene)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6
        )


def test_sharded_train_step_packed16_runs():
    """One full distributed train step on the packed16 stream (the config-4
    production combination after VERDICT r2 Missing #2)."""
    cfg = dataclasses.replace(
        CFG, binning="tiered", stream_format="packed16"
    )
    mesh = make_mesh({"data": 2, "tiles": 4})
    scene = random_scene(jax.random.key(13), 150, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(14), (cfg.height, cfg.width, 3))
    cams = jax.tree.map(lambda x: jnp.stack([x] * 4), cam)
    targets = jnp.stack([target] * 4)

    optimizer = make_optimizer(lr=1e-2)
    step = make_sharded_train_step(cfg, mesh, optimizer, ssim_weight=0.0)
    state = init_train_state(scene, optimizer)
    cams_s, targets_s = shard_batch(cams, targets, mesh)
    state, l0, _, _ = step(state, cams_s, targets_s)
    for _ in range(5):
        state, l1, _, _ = step(state, cams_s, targets_s)
    assert np.isfinite(float(l1))
    assert float(l1) < float(l0)
