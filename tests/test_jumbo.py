"""Jumbo-tier two-level K (cfg.max_tiles_jumbo): splats whose rects exceed
the base K_max walk are enumerated in full (up to K_jumbo) on their own
small grid instead of being truncated -- the static-shape answer to the
reference's demand-sized rect walk (src/write_tile_ids.wgsl:23-35,
renderer.ts:419-441)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene, render
from gsplat_tpu.models.gaussians import GaussianScene


def big_splat_scene(n=60, n_big=6, seed=0):
    """Small scene with a tail of huge splats whose rects blow past a
    small base K_max."""
    scene = random_scene(jax.random.key(seed), n, sh_degree=1)
    big = jnp.zeros((n, 1)).at[:n_big].set(1.0)
    return scene.replace(
        log_scales=jnp.where(big > 0, jnp.log(1.5), scene.log_scales),
        opacity_logits=jnp.where(
            big[:, 0] > 0, 1.0, scene.opacity_logits
        ),
    )


BASE = dict(
    width=64, height=64, tile_size=8, max_intersections=1 << 13,
    block_size=8, max_per_tile=256, impl="jnp",
)


def jumbo_cfg(**kw):
    return RenderConfig(
        **BASE, binning="tiered", max_tiles_per_gaussian=8,
        tier_spec=((4, 0), (8, 2)),
        max_tiles_jumbo=64, jumbo_tier_spec=((16, 16), (32, 8), (64, 8)),
        **kw,
    )


def ref_cfg(**kw):
    # Exact reference: full-K sort binning covers every tile of every
    # splat (K_max 64 = the whole 8x8 tile grid).
    return RenderConfig(
        **BASE, binning="sort", max_tiles_per_gaussian=64, **kw,
    )


def test_jumbo_matches_full_k_sort():
    scene = big_splat_scene()
    cam = Camera.default(64, 64)
    out_j = render(scene, cam, jumbo_cfg())
    out_r = render(scene, cam, ref_cfg())
    assert not bool(out_j.overflow), "jumbo budgets must fit this scene"
    assert not bool(out_r.overflow)
    assert int(out_j.num_intersections) == int(out_r.num_intersections)
    np.testing.assert_allclose(
        np.asarray(out_j.image), np.asarray(out_r.image), atol=1e-5
    )


def test_jumbo_without_it_truncates():
    """Sanity of the test scene: at base K_max 8 WITHOUT jumbo tiers the
    big splats overflow (rects > 8 tiles)."""
    scene = big_splat_scene()
    cam = Camera.default(64, 64)
    cfg = RenderConfig(
        **BASE, binning="tiered", max_tiles_per_gaussian=8,
        tier_spec=((4, 0), (8, 2)),
    )
    out = render(scene, cam, cfg)
    assert bool(out.overflow)


def test_jumbo_gradients_match_full_k():
    scene = big_splat_scene(n=40, n_big=4)
    cam = Camera.default(64, 64)
    target = jnp.zeros((64, 64, 3))

    def loss(s, cfg):
        return jnp.mean(jnp.abs(render(s, cam, cfg).image - target))

    gj = jax.grad(lambda s: loss(s, jumbo_cfg()))(scene)
    gr = jax.grad(lambda s: loss(s, ref_cfg()))(scene)
    for a, b, name in zip(
        jax.tree.leaves(gj), jax.tree.leaves(gr),
        [str(p) for p, _ in jax.tree_util.tree_flatten_with_path(gj)[0]],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name
        )


def test_jumbo_row_budget_overflow_flagged():
    scene = big_splat_scene(n=60, n_big=12)
    cam = Camera.default(64, 64)
    cfg = dataclasses.replace(
        jumbo_cfg(), jumbo_tier_spec=((16, 4), (32, 2), (64, 1))
    )  # 4 rows for 12 jumbo splats
    out = render(scene, cam, cfg)
    assert bool(out.overflow)


def test_jumbo_packed16_matches_f32():
    scene = big_splat_scene()
    cam = Camera.default(64, 64)
    out_f = render(scene, cam, jumbo_cfg())
    out_p = render(
        scene, cam, jumbo_cfg(
            stream_format="packed16", gather_backward="bf16",
            grad_readout="bf16", segment_sum="pallas",
            pallas_interpret=True,
        )
    )
    assert not bool(out_p.overflow)
    # packed16 quantizes means/conic/color to ~bf16: loose tolerance.
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_f.image), atol=0.05
    )


def test_jumbo_config_validation():
    with pytest.raises(ValueError, match="binning='tiered'"):
        RenderConfig(**BASE, binning="sort", max_tiles_jumbo=64,
                     jumbo_tier_spec=((64, 8),))
    with pytest.raises(ValueError, match="jumbo_tier_spec"):
        RenderConfig(**BASE, binning="tiered", max_tiles_per_gaussian=8,
                     max_tiles_jumbo=64)
    with pytest.raises(ValueError, match="ascend"):
        RenderConfig(**BASE, binning="tiered", max_tiles_per_gaussian=8,
                     max_tiles_jumbo=64,
                     jumbo_tier_spec=((64, 8), (32, 4)))


def test_jumbo_tile_sharded_matches_single():
    """Jumbo tiers under tile sharding: per-shard jumbo enumeration with
    shard-local masking + gcounts equals the single-device render."""
    from gsplat_tpu.parallel.sharding import make_mesh, render_tile_sharded

    mesh = make_mesh({"tiles": 4})
    scene = big_splat_scene()
    cam = Camera.default(64, 64)
    cfg = jumbo_cfg()
    img, trans, ovf = jax.jit(
        lambda s, c: render_tile_sharded(s, c, cfg, mesh)
    )(scene, cam)
    ref = render(scene, cam, cfg)
    assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref.image), rtol=1e-4, atol=1e-5
    )
