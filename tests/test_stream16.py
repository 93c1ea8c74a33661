"""Packed 16-bit forward stream (cfg.stream_format='packed16') vs the exact
f32 path: pack/unpack round trip, forward image parity to quantization
tolerance, straight-through gradients, jnp and Pallas(interpret) impls."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene
from gsplat_tpu.ops.binning import NUM_FEATURES
from gsplat_tpu.render.pipeline import render, render_loss
from gsplat_tpu.ops.stream16 import pack_stream, unpack_block

CFG = RenderConfig(
    width=64, height=64, tile_size=8, max_intersections=1 << 13,
    max_tiles_per_gaussian=64, block_size=8, max_per_tile=256,
    binning="tiered", tier_spec=(8, 5, 64), pallas_interpret=True,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    n = 500
    feats = np.zeros((NUM_FEATURES, n), np.float32)
    feats[0] = rng.uniform(-3.0, 67.0, n)        # gx within 1.1x extent
    feats[1] = rng.uniform(-3.0, 67.0, n)
    feats[2:] = rng.normal(size=(7, n))
    out = np.asarray(unpack_block(pack_stream(jnp.asarray(feats), CFG), CFG))
    # means: fixed-point over 1.1*64 px at u16 -> step ~0.0011 px
    assert np.abs(out[:2] - feats[:2]).max() < 1.1 * 64 / 65535
    # the rest: bf16 rounding
    ref = feats[2:].astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(out[2:], ref)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_packed16_image_close_to_f32(impl):
    cfg = dataclasses.replace(CFG, impl=impl)
    cfg_p = dataclasses.replace(cfg, stream_format="packed16")
    scene = random_scene(jax.random.key(3), 200, sh_degree=2)
    cam = Camera.default(cfg.width, cfg.height)
    img_f = np.asarray(jax.jit(lambda s: render(s, cam, cfg).image)(scene))
    img_p = np.asarray(jax.jit(lambda s: render(s, cam, cfg_p).image)(scene))
    assert img_p.max() > 0.01
    # bf16 conic/opacity -> ~0.4% alpha noise; images agree to ~1e-2 abs.
    assert np.abs(img_f - img_p).max() < 2e-2, np.abs(img_f - img_p).max()
    assert np.abs(img_f - img_p).mean() < 1e-3


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_packed16_grads_close_to_f32(impl):
    cfg = dataclasses.replace(CFG, impl=impl)
    cfg_p = dataclasses.replace(cfg, stream_format="packed16")
    scene = random_scene(jax.random.key(4), 150, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(5), (64, 64, 3))
    g_f = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    g_p = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_p)))(scene)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_p)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-6)
        # straight-through gradients of a quantized forward: close, not equal
        assert float(np.abs(a - b).max()) <= 0.05 * scale, (
            float(np.abs(a - b).max()) / scale
        )


def test_packed16_rejects_scatter_and_sharded():
    with pytest.raises(ValueError, match="gidk"):
        dataclasses.replace(CFG, stream_format="packed16", binning="scatter")


def test_packed16_with_packed_grad_emission():
    """The fully-packed fast mode: packed16 stream + bf16 gather backward.
    The Pallas raster backward emits the slot gradients already bf16-pair-
    packed (raster.py _pack_grads); grads must match the f32-emission
    packed16 path to bf16 tolerance."""
    cfg_ref = dataclasses.replace(CFG, impl="pallas",
                                  stream_format="packed16")
    cfg_fast = dataclasses.replace(
        cfg_ref, gather_backward="bf16", grad_readout="bf16",
        segment_sum="pallas",
    )
    scene = random_scene(jax.random.key(8), 150, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = jax.random.uniform(jax.random.key(9), (64, 64, 3))
    g_ref = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_ref)))(scene)
    g_fast = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_fast)))(scene)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fast)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) <= 0.03 * scale, (
            float(np.abs(a - b).max()) / scale
        )


def test_slot_gather_c64_bit_exact():
    """slot_gather='c64' (the 5 int32 rows paired into 3 complex64 rows for
    the gather) must be BIT-exact vs the per-row i32 takes -- the pairing is
    pure bitcast, no arithmetic touches the payload."""
    import dataclasses

    import numpy as np

    from gsplat_tpu import Camera, RenderConfig, random_scene, render

    cfg = RenderConfig(
        width=64, height=64, tile_size=8, max_intersections=1 << 14,
        max_tiles_per_gaussian=64, block_size=8, max_per_tile=256,
        binning="tiered", tier_spec=((4, 0), (8, 2), (16, 8), (64, 64)),
        stream_format="packed16",
    )
    scene = random_scene(jax.random.key(11), 400, sh_degree=2)
    cam = Camera.default(cfg.width, cfg.height)
    ref = render(scene, cam, cfg)
    out = render(scene, cam, dataclasses.replace(cfg, slot_gather="c64"))
    np.testing.assert_array_equal(np.asarray(ref.image), np.asarray(out.image))

    # Gradients identical too (same custom_vjp, same gathered bits).
    from gsplat_tpu.render.pipeline import render_loss

    t = jnp.zeros((64, 64, 3))
    g1 = jax.grad(lambda s: render_loss(s, cam, t, cfg))(scene)
    g2 = jax.grad(lambda s: render_loss(
        s, cam, t, dataclasses.replace(cfg, slot_gather="c64")))(scene)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


P4 = dataclasses.replace(CFG, stream_format="packed4")


def test_packed4_roundtrip():
    rng = np.random.default_rng(1)
    n = 500
    feats = np.zeros((NUM_FEATURES, n), np.float32)
    feats[0] = rng.uniform(-3.0, 67.0, n)
    feats[1] = rng.uniform(-3.0, 67.0, n)
    feats[2:5] = rng.normal(size=(3, n))          # conic: bf16
    feats[5:8] = rng.uniform(0.0, 2.5, (3, n))    # colors: 11/11/10 fixed
    feats[8] = rng.uniform(0.0, 1.0, n)           # opacity: bf16
    packed = pack_stream(jnp.asarray(feats), P4)
    assert packed.shape == (4, n)
    out = np.asarray(unpack_block(packed, P4))
    assert np.abs(out[:2] - feats[:2]).max() < 1.1 * 64 / 65535
    conic_op = np.concatenate([feats[2:5], feats[8:9]])
    ref = conic_op.astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(
        np.concatenate([out[2:5], out[8:9]]), ref
    )
    from gsplat_tpu.ops.stream16 import PACKED4_COLOR_RANGE as S

    assert np.abs(out[5:7] - feats[5:7]).max() <= S / 2047 / 2 + 1e-6
    assert np.abs(out[7:8] - feats[7:8]).max() <= S / 1023 / 2 + 1e-6


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_packed4_image_close_to_f32(impl):
    scene = random_scene(jax.random.key(3), 300, sh_degree=2)
    cam = Camera.default(CFG.width, CFG.height)
    cfg_f = dataclasses.replace(CFG, impl=impl)
    cfg_p = dataclasses.replace(P4, impl=impl)
    a = np.asarray(render(scene, cam, cfg_f).image)
    b = np.asarray(render(scene, cam, cfg_p).image)
    # color fixed-point step 0.002 + bf16 conic/opacity noise
    assert np.abs(a - b).max() < 0.05


def test_packed4_gradients_straight_through():
    scene = random_scene(jax.random.key(4), 200, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = jnp.zeros((CFG.height, CFG.width, 3))
    gp = jax.grad(lambda s: render_loss(s, cam, target, P4))(scene)
    gf = jax.grad(lambda s: render_loss(s, cam, target, CFG))(scene)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        assert bool(jnp.all(jnp.isfinite(a)))
        # straight-through on quantized forward: close, not equal
        denom = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / denom < 0.2


def test_packed4_rejected_on_gaussian_sharded_and_c64():
    with pytest.raises(ValueError, match="5 packed rows"):
        dataclasses.replace(P4, slot_gather="c64")
    from gsplat_tpu.parallel.gaussian_sharded import render_gaussian_sharded
    from gsplat_tpu.parallel.sharding import make_mesh

    scene = random_scene(jax.random.key(0), 64, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    cfg = dataclasses.replace(P4, binning="packed")
    with pytest.raises(ValueError, match="packed16"):
        render_gaussian_sharded(scene, cam, cfg, make_mesh({"gauss": 2}))
