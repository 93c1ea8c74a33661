"""Pure-jnp rasterizers.

Two implementations, both built on the shared block math in ops/blend.py:

  - ``rasterize_tiles_jnp``: the production-shaped tiled path (same dataflow
    as the Pallas kernel: per-tile walk of the sorted stream), vmapped over
    tiles, scanned over Gaussian blocks. Fully differentiable via autodiff;
    this is the ground truth the Pallas kernels are tested against.

  - ``rasterize_dense_oracle``: per-pixel walk over ALL depth-sorted
    Gaussians with the tile-membership test applied per pixel -- a direct,
    binning-free transcription of the reference's per-pixel loop
    (reference: src/compute_tiles.wgsl:49-66). O(N * H * W); tests only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.ops import blend as blend_ops
from gsplat_tpu.ops.binning import NUM_FEATURES
from gsplat_tpu.ops.blend import BlendCarry, blend_block, init_carry, tile_pixel_coords
from gsplat_tpu.ops.projection import ProjectedGaussians


def _tiles_to_image(tile_colors: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """(T, 3, P) per-tile pixels -> (H, W, 3) image."""
    ts = cfg.tile_size
    x = tile_colors.reshape(cfg.tiles_y, cfg.tiles_x, 3, ts, ts)
    x = x.transpose(0, 3, 1, 4, 2)  # (ty, py, tx, px, c)
    x = x.reshape(cfg.padded_height, cfg.padded_width, 3)
    return x[: cfg.height, : cfg.width]


def _tiles_to_scalar_image(tile_vals: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """(T, P) per-tile scalars -> (H, W)."""
    ts = cfg.tile_size
    x = tile_vals.reshape(cfg.tiles_y, cfg.tiles_x, ts, ts)
    x = x.transpose(0, 2, 1, 3).reshape(cfg.padded_height, cfg.padded_width)
    return x[: cfg.height, : cfg.width]


def rasterize_tiles_jnp(
    features: jnp.ndarray,  # (NUM_FEATURES, max_intersections)
    ranges: jnp.ndarray,    # (num_tiles + 1,)
    cfg: RenderConfig,
):
    """Returns (image (H, W, 3), final_transmittance (H, W))."""
    assert features.shape[0] == NUM_FEATURES
    max_i = features.shape[1]
    g = cfg.block_size
    n_blocks = cfg.max_per_tile // g

    def render_tile(tile_idx):
        px, py = tile_pixel_coords(tile_idx, cfg)
        start = ranges[tile_idx]
        end = ranges[tile_idx + 1]

        def body(carry: BlendCarry, i):
            idx = start + i * g + jnp.arange(g, dtype=jnp.int32)
            in_range = (idx < end)[None, :]
            feat = jnp.take(features, jnp.clip(idx, 0, max_i - 1), axis=1)
            carry = blend_block(carry, feat, px, py, in_range, cfg)
            return carry, None

        carry, _ = jax.lax.scan(
            body, init_carry(cfg.pixels_per_tile), jnp.arange(n_blocks)
        )
        return carry.color, carry.trans[:, 0]

    tile_colors, tile_trans = jax.vmap(render_tile)(
        jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    )
    image = _tiles_to_image(tile_colors, cfg)
    trans = _tiles_to_scalar_image(tile_trans, cfg)
    return image, trans


def rasterize_dense_oracle(proj: ProjectedGaussians, cfg: RenderConfig):
    """Reference-semantics oracle: scan over globally depth-sorted Gaussians,
    blending into the full image, with each Gaussian restricted to the pixels
    whose tile lies inside its rect (exactly the tiled pipeline's coverage).
    Small scenes only. Returns (image (H, W, 3), final_transmittance)."""
    n = proj.mask.shape[0]
    order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf))
    take = lambda x: jnp.take(x, order, axis=0)
    uv, conic, color, opacity, rect, mask = map(
        take, (proj.uv, proj.conic, proj.color, proj.opacity, proj.rect, proj.mask)
    )
    gx = uv[:, 0] * cfg.width
    gy = uv[:, 1] * cfg.height

    ys = jnp.arange(cfg.height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(cfg.width, dtype=jnp.float32)[None, :]
    tile_x = (xs / cfg.tile_size).astype(jnp.int32)
    tile_y = (ys / cfg.tile_size).astype(jnp.int32)

    def body(carry, i):
        img, trans, done = carry
        covered = (
            (tile_x >= rect[i, 0])
            & (tile_x < rect[i, 2])
            & (tile_y >= rect[i, 1])
            & (tile_y < rect[i, 3])
            & mask[i]
        )
        dx = xs - gx[i]
        dy = ys - gy[i]
        power = (
            -0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
            - conic[i, 1] * dx * dy
        )
        alpha = jnp.minimum(cfg.alpha_clamp, opacity[i] * jnp.exp(power))
        ok = covered & (power <= 0.0) & (alpha >= cfg.alpha_min) & (done < 0.5)
        test_t = trans * (1.0 - alpha)
        terminate = ok & (test_t < cfg.transmittance_min)
        apply = ok & ~terminate
        a = jnp.where(apply, alpha, 0.0)
        img = img + a[..., None] * trans[..., None] * color[i]
        trans = jnp.where(apply, test_t, trans)
        done = jnp.maximum(done, terminate.astype(done.dtype))
        return (img, trans, done), None

    init = (
        jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
        jnp.ones((cfg.height, cfg.width), jnp.float32),
        jnp.zeros((cfg.height, cfg.width), jnp.float32),
    )
    (img, trans, _), _ = jax.lax.scan(body, init, jnp.arange(n))
    return img, trans
