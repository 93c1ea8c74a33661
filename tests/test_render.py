"""End-to-end: tiled pipeline == dense per-pixel oracle; determinism; jit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene, render, render_jit
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.raster_jnp import rasterize_dense_oracle


@pytest.mark.parametrize("binning", ["sort", "scatter"])
def test_tiled_matches_dense_oracle(binning, small_cfg, small_scene, small_camera):
    cfg = dataclasses.replace(small_cfg, binning=binning)
    out = render(small_scene, small_camera, cfg)
    assert not bool(out.overflow)

    proj = project_gaussians(small_scene, small_camera, cfg)
    oracle_img, oracle_trans = rasterize_dense_oracle(proj, cfg)

    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(oracle_img), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.transmittance), np.asarray(oracle_trans), rtol=1e-4, atol=1e-5
    )
    # Scene renders something.
    assert float(jnp.max(out.image)) > 0.01


def test_render_jit_matches_eager(small_cfg, small_scene, small_camera):
    eager = render(small_scene, small_camera, small_cfg)
    jitted = render_jit(small_scene, small_camera, small_cfg)
    # atol 1e-4: jit fuses the MXU quadratic-basis matmul differently
    # from eager (ops/blend.py _block_weights), reassociating f32 sums.
    np.testing.assert_allclose(
        np.asarray(eager.image), np.asarray(jitted.image), rtol=1e-4, atol=1e-4
    )


def test_render_deterministic(small_cfg, small_scene, small_camera):
    a = render_jit(small_scene, small_camera, small_cfg)
    b = render_jit(small_scene, small_camera, small_cfg)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))


def test_background_compositing(small_cfg, small_scene, small_camera):
    bg = jnp.array([1.0, 1.0, 1.0])
    out_black = render(small_scene, small_camera, small_cfg)
    out_white = render(small_scene, small_camera, small_cfg, background=bg)
    expected = np.asarray(out_black.image) + np.asarray(out_black.transmittance)[
        ..., None
    ]
    np.testing.assert_allclose(np.asarray(out_white.image), expected, rtol=1e-5, atol=1e-6)


def test_empty_scene_renders_black(small_cfg, small_camera):
    scene = random_scene(jax.random.key(1), 16, sh_degree=0)
    # Push everything behind the camera.
    scene = scene.replace(means=scene.means.at[:, 2].set(-10.0))
    out = render(scene, small_camera, small_cfg)
    assert float(jnp.max(jnp.abs(out.image))) == 0.0
    np.testing.assert_array_equal(np.asarray(out.transmittance), 1.0)
    assert int(out.num_intersections) == 0


def test_nonsquare_image():
    cfg = RenderConfig(
        width=48, height=40, tile_size=8, max_intersections=1 << 13,
        block_size=8, max_per_tile=256,
    )
    cam = Camera.default(cfg.width, cfg.height)
    scene = random_scene(jax.random.key(2), 64, sh_degree=1)
    out = render(scene, cam, cfg)
    assert out.image.shape == (40, 48, 3)
    proj = project_gaussians(scene, cam, cfg)
    oracle_img, _ = rasterize_dense_oracle(proj, cfg)
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(oracle_img), rtol=1e-4, atol=1e-4
    )


def test_golden_image_regression():
    """Fixed scene + camera against a stored golden render (SURVEY.md
    section 4 item 3): catches any unintended numerical drift in the
    projection/binning/blend semantics."""
    import os

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "render_64.npz")
    )["image"].astype(np.float32)
    cfg = RenderConfig(width=64, height=64, tile_size=8,
                       max_intersections=1 << 14, max_tiles_per_gaussian=64,
                       block_size=8, max_per_tile=512)
    scene = random_scene(jax.random.key(42), 300, sh_degree=3)
    cam = Camera.default(64, 64)
    img = np.asarray(render(scene, cam, cfg).image)
    mse = float(np.mean((img - golden) ** 2))
    psnr = 10 * np.log10(max(golden.max(), 1.0) ** 2 / max(mse, 1e-12))
    assert psnr > 55.0, f"golden PSNR {psnr:.1f} dB"


def test_image_invariant_to_tile_size():
    """Tile size is a scheduling choice: the rendered image must not depend
    on it (same per-pixel blend sequence, different binning granularity)."""
    scene = random_scene(jax.random.key(6), 200, sh_degree=1)
    cam = Camera.default(64, 64)
    imgs = []
    for ts in (8, 16, 32):
        cfg = RenderConfig(width=64, height=64, tile_size=ts,
                           max_intersections=1 << 14,
                           max_tiles_per_gaussian=64, block_size=8,
                           max_per_tile=1024, binning="packed")
        imgs.append(np.asarray(render(scene, cam, cfg).image))
    # atol 1e-4: the power matmul uses TILE-RELATIVE coordinates, so
    # different tile sizes expand the quadratic about different origins
    # -- invariance holds to f32 cancellation (~3e-5), not bit-exactly.
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(imgs[1], imgs[2], rtol=1e-4, atol=1e-4)
