"""Edge cases: ragged tile grids, empty intersection streams, degenerate
scenes -- the paths a fixed test resolution never exercises."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RenderConfig, random_scene, render
from gsplat_tpu.render.pipeline import render_loss


def _cfg(w, h, **kw):
    base = dict(
        width=w, height=h, tile_size=16, max_intersections=1 << 13,
        max_tiles_per_gaussian=32, block_size=8, max_per_tile=256,
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.parametrize("wh", [(50, 34), (33, 65), (16, 16), (17, 17)])
def test_ragged_image_sizes(wh):
    w, h = wh
    cfg = _cfg(w, h)
    scene = random_scene(jax.random.key(0), 100, sh_degree=1)
    cam = Camera.default(w, h)
    out = render(scene, cam, cfg)
    assert out.image.shape == (h, w, 3)
    assert np.isfinite(np.asarray(out.image)).all()
    g = jax.grad(lambda s: render_loss(s, cam, jnp.zeros((h, w, 3)), cfg))(scene)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


@pytest.mark.parametrize("binning", ["sort", "packed", "tiered", "scatter"])
def test_empty_stream_all_behind_camera(binning):
    """Every Gaussian culled -> zero intersections; image black, grads zero
    but finite, no NaNs from the empty-segment paths."""
    cfg = _cfg(64, 64, binning=binning)
    scene = random_scene(jax.random.key(1), 64, sh_degree=1)
    scene = scene.replace(
        means=scene.means.at[:, 2].set(-5.0)  # behind the camera
    )
    cam = Camera.default(64, 64)
    out = render(scene, cam, cfg)
    assert int(out.num_intersections) == 0
    np.testing.assert_array_equal(np.asarray(out.image), 0.0)
    np.testing.assert_array_equal(np.asarray(out.transmittance), 1.0)
    g = jax.grad(lambda s: render_loss(s, cam, jnp.zeros((64, 64, 3)), cfg))(scene)
    for x in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(x)).all()


def test_fully_transparent_scene():
    cfg = _cfg(64, 64, binning="packed")
    scene = random_scene(jax.random.key(2), 64, sh_degree=1)
    scene = scene.replace(opacity_logits=jnp.full((64,), -30.0))
    cam = Camera.default(64, 64)
    out = render(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(out.image), 0.0)
    # With exact culling the stream is empty (alpha < 1/255 everywhere).
    assert int(out.num_intersections) == 0


def test_single_giant_gaussian_saturates():
    """One opaque splat covering the frame: T ~ 0 everywhere inside the
    ellipse core; early-exit path in the kernels."""
    cfg = _cfg(64, 64, binning="packed", max_tiles_per_gaussian=64)
    scene = random_scene(jax.random.key(3), 1, sh_degree=0)
    scene = scene.replace(
        means=jnp.array([[0.0, 0.0, 2.0]]),
        log_scales=jnp.full((1, 3), jnp.log(2.0)),
        opacity_logits=jnp.full((1,), 12.0),
    )
    cam = Camera.default(64, 64)
    out = render(scene, cam, cfg)
    # Wherever the center lands under the default pose, the core pixels
    # saturate to T = 1 - alpha_clamp.
    assert float(jnp.min(out.transmittance)) < 0.02
    assert np.isfinite(np.asarray(out.image)).all()


def test_tiny_tile_size_and_blocks():
    cfg = _cfg(24, 24, tile_size=8, block_size=8, max_per_tile=64)
    scene = random_scene(jax.random.key(4), 50, sh_degree=0)
    cam = Camera.default(24, 24)
    out = render(scene, cam, cfg)
    assert out.image.shape == (24, 24, 3)
    assert np.isfinite(np.asarray(out.image)).all()


def test_pallas_interpret_empty_stream():
    """The Pallas kernels' nb == 0 path (no DMA issued, output zeroed)."""
    cfg = _cfg(32, 32, binning="packed", impl="pallas", pallas_interpret=True,
               block_size=8, pallas_block_size=128)
    scene = random_scene(jax.random.key(5), 16, sh_degree=0)
    scene = scene.replace(means=scene.means.at[:, 2].set(-5.0))
    cam = Camera.default(32, 32)
    out = render(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(out.image), 0.0)
    np.testing.assert_array_equal(np.asarray(out.transmittance), 1.0)
