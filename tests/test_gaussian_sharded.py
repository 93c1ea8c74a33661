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
