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

import functools

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.ops import blend as blend_ops
from gsplat_tpu.ops.binning import NUM_FEATURES
from gsplat_tpu.ops.blend import (
    BlendCarry,
    blend_block,
    blend_block_bwd,
    init_carry,
    tile_pixel_coords,
)
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


def _raster_tiles(features, ranges, tile_offset, cfg: RenderConfig):
    """Forward walk -> (tile_colors (T, 3, P), tile_trans (T, P))."""
    max_i = features.shape[1]
    g = cfg.block_size
    n_blocks = cfg.max_per_tile // g

    def render_tile(tile_idx):
        px, py = tile_pixel_coords(tile_idx + tile_offset, cfg)
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

    return jax.vmap(render_tile)(jnp.arange(cfg.num_tiles, dtype=jnp.int32))


def _raster_tiles_bwd_walk(
    features, ranges, tile_offset, tile_colors, tile_trans, g_color_tiles,
    b_total_tiles, cfg: RenderConfig,
):
    """Analytic backward: forward re-walk with the suffix-sum identity (see
    ops/blend.py). Memory stays O(stream) -- no per-block residuals -- which
    is what lets the jnp path backprop 1M-Gaussian scenes where plain
    autodiff-of-scan OOMs. Returns dfeat (NUM_FEATURES, max_i)."""
    max_i = features.shape[1]
    g = cfg.block_size
    n_blocks = cfg.max_per_tile // g

    def bwd_tile(tile_idx):
        px, py = tile_pixel_coords(tile_idx + tile_offset, cfg)
        start = ranges[tile_idx]
        end = ranges[tile_idx + 1]
        g_color = g_color_tiles[tile_idx]        # (3, P)
        b_total = b_total_tiles[tile_idx]        # (P, 1)

        def body(state, i):
            carry, accum_b = state
            idx = start + i * g + jnp.arange(g, dtype=jnp.int32)
            in_range = (idx < end)[None, :]
            feat = jnp.take(features, jnp.clip(idx, 0, max_i - 1), axis=1)
            dfeat, carry, accum_b = blend_block_bwd(
                carry, feat, px, py, in_range, g_color, b_total, accum_b, cfg
            )
            return (carry, accum_b), (dfeat, jnp.where(idx < end, idx, max_i))

        state0 = (init_carry(cfg.pixels_per_tile), jnp.zeros((cfg.pixels_per_tile, 1)))
        _, (dfeats, idxs) = jax.lax.scan(body, state0, jnp.arange(n_blocks))
        return dfeats, idxs  # (n_blocks, F, g), (n_blocks, g)

    dfeats, idxs = jax.vmap(bwd_tile)(jnp.arange(cfg.num_tiles, dtype=jnp.int32))
    # Tile segments are disjoint slots: one scatter-set assembles the stream
    # gradient (out-of-range indices drop).
    flat_idx = idxs.reshape(-1)
    # (T, n_blocks, F, g) -> (F, T * n_blocks * g), matching flat_idx order.
    flat_d = dfeats.transpose(2, 0, 1, 3).reshape(NUM_FEATURES, -1)
    dfeat = jnp.zeros((NUM_FEATURES, max_i + 1), jnp.float32)
    dfeat = dfeat.at[:, flat_idx].set(flat_d, mode="drop")
    return dfeat[:, :max_i]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rasterize_tiles(features, ranges, tile_offset, cfg: RenderConfig):
    return _raster_tiles(features, ranges, tile_offset, cfg)


def _rasterize_tiles_fwd(features, ranges, tile_offset, cfg):
    tc, tt = _raster_tiles(features, ranges, tile_offset, cfg)
    return (tc, tt), (features, ranges, tile_offset, tc, tt)


def _rasterize_tiles_bwd(cfg, residuals, grads):
    features, ranges, tile_offset, tc, tt = residuals
    g_tc, g_tt = grads  # (T, 3, P), (T, P)
    b_total = (
        jnp.sum(g_tc * tc, axis=1) + g_tt * tt
    )[..., None]  # (T, P, 1)
    dfeat = _raster_tiles_bwd_walk(
        features, ranges, tile_offset, tc, tt, g_tc, b_total, cfg
    )
    return dfeat, None, None


_rasterize_tiles.defvjp(_rasterize_tiles_fwd, _rasterize_tiles_bwd)


def rasterize_tiles_jnp(
    features: jnp.ndarray,  # (NUM_FEATURES, max_intersections)
    ranges: jnp.ndarray,    # (num_tiles + 1,)
    cfg: RenderConfig,
    tile_offset=0,
    analytic_vjp: bool = True,
):
    """Returns (image (H, W, 3), final_transmittance (H, W)).

    tile_offset (may be traced): global tile index of local tile 0 -- used by
    the tile-sharded path, where `cfg` describes the LOCAL tile rows (same
    width/tiles_x as the global config) and pixel coordinates must stay
    global because Gaussian centers are in global pixels.

    analytic_vjp=True uses the hand-derived O(stream)-memory backward (same
    math as the Pallas bwd kernel); False differentiates the scan with plain
    autodiff (memory O(stream * blocks) -- gradcheck oracle only)."""
    assert features.shape[0] == NUM_FEATURES
    if analytic_vjp:
        tile_colors, tile_trans = _rasterize_tiles(
            features, ranges, jnp.asarray(tile_offset, jnp.int32), cfg
        )
    else:
        tile_colors, tile_trans = _raster_tiles(features, ranges, tile_offset, cfg)
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
