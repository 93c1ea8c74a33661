"""Pallas kernels vs the jnp reference path (interpreter mode on CPU; the
same kernels run compiled on TPU -- exercised by bench.py / __graft_entry__)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene
from gsplat_tpu.ops.binning import bin_gaussians, gather_features
from gsplat_tpu.ops.pallas.raster import rasterize_pallas
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp
from gsplat_tpu.render.pipeline import render, render_loss

PCFG = RenderConfig(
    width=64,
    height=64,
    tile_size=8,
    max_intersections=1 << 13,
    max_tiles_per_gaussian=64,
    block_size=8,
    max_per_tile=512,
    pallas_block_size=32,
    pallas_interpret=True,
    impl="pallas",
)


@pytest.fixture(scope="module")
def pipeline_inputs():
    scene = random_scene(jax.random.key(0), 150, sh_degree=2)
    cam = Camera.default(PCFG.width, PCFG.height)
    proj = project_gaussians(scene, cam, PCFG)
    binned = bin_gaussians(proj, PCFG)
    features = gather_features(proj, binned, PCFG)
    return scene, cam, features, binned


def test_pallas_fwd_matches_jnp(pipeline_inputs):
    _, _, features, binned = pipeline_inputs
    img_p, trans_p = rasterize_pallas(features, binned.ranges, PCFG)
    img_j, trans_j = rasterize_tiles_jnp(features, binned.ranges, PCFG)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_j), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(trans_p), np.asarray(trans_j), rtol=1e-4, atol=1e-6
    )
    assert float(jnp.max(img_p)) > 0.01


def test_pallas_bwd_matches_jnp(pipeline_inputs):
    _, _, features, binned = pipeline_inputs
    key = jax.random.key(5)
    g_img = jax.random.normal(key, (PCFG.height, PCFG.width, 3))
    g_trans = jax.random.normal(jax.random.fold_in(key, 1), (PCFG.height, PCFG.width))

    def loss_pallas(f):
        img, trans = rasterize_pallas(f, binned.ranges, PCFG)
        return jnp.sum(img * g_img) + jnp.sum(trans * g_trans)

    def loss_jnp(f):
        img, trans = rasterize_tiles_jnp(f, binned.ranges, PCFG)
        return jnp.sum(img * g_img) + jnp.sum(trans * g_trans)

    gp = jax.grad(loss_pallas)(features)
    gj = jax.grad(loss_jnp)(features)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=2e-3, atol=2e-4)


def test_pallas_full_pipeline_grads(pipeline_inputs):
    """End-to-end scene gradients through the Pallas path == jnp path."""
    scene, cam, _, _ = pipeline_inputs
    target = jax.random.uniform(jax.random.key(9), (PCFG.height, PCFG.width, 3))

    cfg_jnp = dataclasses.replace(PCFG, impl="jnp")
    g_pallas = jax.grad(render_loss)(scene, cam, target, PCFG)
    g_jnp = jax.grad(render_loss)(scene, cam, target, cfg_jnp)
    for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_jnp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )


def test_pallas_empty_tiles(pipeline_inputs):
    """Tiles with no Gaussians must come out black with T=1."""
    _, _, features, binned = pipeline_inputs
    empty_ranges = jnp.zeros_like(binned.ranges)
    img, trans = rasterize_pallas(features, empty_ranges, PCFG)
    np.testing.assert_array_equal(np.asarray(img), 0.0)
    np.testing.assert_array_equal(np.asarray(trans), 1.0)


def test_pallas_early_exit_correctness():
    """Opaque front Gaussians saturate pixels; the early-exited Pallas walk
    must still match the full jnp walk."""
    scene = random_scene(jax.random.key(2), 300, sh_degree=0)
    scene = scene.replace(
        opacity_logits=jnp.full_like(scene.opacity_logits, 4.0),
        log_scales=jnp.full_like(scene.log_scales, -1.5),
    )
    cam = Camera.default(PCFG.width, PCFG.height)
    out_p = render(scene, cam, PCFG)
    out_j = render(scene, cam, dataclasses.replace(PCFG, impl="jnp"))
    assert float(jnp.min(out_p.transmittance)) < 1e-3  # saturation happened
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_j.image), rtol=1e-4, atol=1e-5
    )


def test_pallas_tile32_matches_jnp():
    """tile_size 32 with the VMEM-sized G=128 block (the production bench
    shape) in interpreter mode."""
    import dataclasses as _dc

    from gsplat_tpu import Camera, RenderConfig, random_scene, render

    cfg = RenderConfig(
        width=64, height=64, tile_size=32, max_intersections=1 << 13,
        max_tiles_per_gaussian=16, block_size=8, max_per_tile=256,
        binning="packed", impl="pallas", pallas_interpret=True,
        pallas_block_size=128,
    )
    scene = random_scene(jax.random.key(21), 150, sh_degree=1)
    cam = Camera.default(64, 64)
    out_p = render(scene, cam, cfg)
    out_j = render(scene, cam, _dc.replace(cfg, impl="jnp"))
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_j.image), rtol=1e-3, atol=2e-4
    )


def test_vmem_budget_guard():
    import pytest as _pytest

    from gsplat_tpu import RenderConfig

    with _pytest.raises(ValueError, match="VMEM"):
        RenderConfig(width=64, height=64, tile_size=32, impl="pallas",
                     pallas_block_size=256, block_size=8, max_per_tile=256)


def test_pallas_cull_mask_matches_jnp():
    """The fused cull kernel (ops/pallas/cull.py) must agree lane-for-lane
    with the jnp _rect_cull_mask it replaces."""
    import jax.numpy as _jnp

    from gsplat_tpu.ops import binning as _b
    from gsplat_tpu.ops.pallas.cull import tile_cull_mask_pallas

    cfg = dataclasses.replace(PCFG, tile_culling=True)
    scene = random_scene(jax.random.key(7), 400, sh_degree=0)
    cam = Camera.default(cfg.width, cfg.height)
    proj = project_gaussians(scene, cam, cfg)

    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian
    k = _jnp.arange(kmax, dtype=_jnp.int32)[None, :]
    rect_w = _jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 1)
    ky, kx = _b._rect_divmod(k, rect_w[:, None])
    tx = proj.rect[:, 0:1] + kx
    ty = proj.rect[:, 1:2] + ky
    ref = (k < proj.counts[:, None]) & _b._precise_tile_valid(
        proj, _jnp.arange(n, dtype=_jnp.int32), tx, ty, cfg
    )
    got = tile_cull_mask_pallas(proj, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_segmented_suffix_sum_vs_naive():
    """ops/pallas/segsum.py vs a direct numpy per-run reduction: random
    sorted runs (lengths <= kmax, gaps in the id space, invalid tail)."""
    from gsplat_tpu.ops.pallas.segsum import segmented_suffix_sum

    rng = np.random.default_rng(0)
    kmax, f = 16, 5
    # Sorted run ids with gaps + a large invalid tail, crossing block edges.
    ids = np.cumsum(rng.integers(1, 4, size=300))
    lengths = rng.integers(1, kmax + 1, size=300)
    rows = np.repeat(ids, lengths).astype(np.int32)
    m = rows.shape[0]
    rows = np.concatenate([rows, np.full(50, (2**31 - 1) >> 7, np.int32)])
    x = rng.normal(size=(f, rows.shape[0])).astype(np.float32)
    # The invalid tail is one run LONGER than kmax -- allowed only because
    # its values are zero (exactly the real pipeline: padding slots carry
    # zero gradient). Runs longer than kmax with nonzero values are out of
    # contract for both this kernel and the XLA doubling path.
    x[:, m:] = 0.0

    out = segmented_suffix_sum(
        jnp.asarray(x), jnp.asarray(rows), kmax=kmax, block_size=256,
        interpret=True,
    )
    out = np.asarray(out)

    # Naive: suffix sum within each run.
    ref = np.zeros_like(x)
    start = 0
    for rid, ln in zip(ids, lengths):
        seg = x[:, start : start + ln]
        ref[:, start : start + ln] = np.cumsum(seg[:, ::-1], axis=1)[:, ::-1]
        start += ln
    np.testing.assert_allclose(out[:, :m], ref[:, :m], rtol=1e-5, atol=1e-5)


def test_segment_sum_pallas_grads_match_doubling():
    """cfg.segment_sum='pallas' must reproduce the XLA doubling gradients
    (same sums up to f32 addition order) through the full render_loss."""
    cfg = dataclasses.replace(PCFG, binning="tiered", tier_spec=(8, 5, 64))
    scene = random_scene(jax.random.key(21), 150, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(22), (64, 64, 3))

    g_ref = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    cfg_p = dataclasses.replace(cfg, segment_sum="pallas")
    g_p = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_p)))(scene)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
