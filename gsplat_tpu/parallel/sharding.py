"""Multi-chip rendering: tile-sharded rasterization over a device mesh.

The reference is a single-WebGPU-queue browser app with no distribution of
any kind (SURVEY.md section 2, "Parallelism components"); this module is the
from-scratch TPU scaling layer required by BASELINE.json configs 4-5.

Design (the 3DGS analogue of tensor/sequence parallelism for rendering):
  - mesh axis 'tiles': the tile grid is sharded by contiguous ROWS of tiles,
    so each chip's output is a contiguous horizontal band of the image and
    the final image is assembled by the shard_map output spec alone -- no
    collective on the image.
  - Gaussians are replicated; each chip projects all N (cheap, fully
    vectorized) but bins, sorts and blends ONLY its tile rows, so the
    expensive work (sort + blend, both O(intersections)) scales with 1/D.
    cfg.max_intersections acts as the PER-SHARD stream capacity.
  - No cross-chip communication in the forward pass at all; in the backward
    pass the per-Gaussian gradients are partial sums over each chip's tiles
    and are reduced by a single psum -- issued inside shard_map so XLA can
    overlap it with the remaining backward work (BASELINE config 4).

A Gaussian-sharded mode (shard N, exchange per-tile fragments -- for scenes
too large to replicate) is the config-5 extension; see
parallel/gaussian_sharded.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import GaussianScene
from gsplat_tpu.ops.binning import bin_gaussians, gather_features
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.ops.projection import project_gaussians


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    total = int(np.prod(list(axis_sizes.values())))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(tuple(axis_sizes.values()))
    return Mesh(arr, tuple(axis_sizes.keys()))


def local_tile_cfg(cfg: RenderConfig, num_shards: int) -> RenderConfig:
    """Config describing one shard's tile rows. The padded tile grid is
    divided along tile rows; requires tiles_y % num_shards == 0. The
    packed16 quantization ranges are pinned to the GLOBAL image extent
    (means stay global pixel coordinates on every shard)."""
    if cfg.tiles_y % num_shards != 0:
        raise ValueError(
            f"tiles_y={cfg.tiles_y} not divisible by {num_shards} shards"
        )
    from gsplat_tpu.ops.stream16 import quant_params

    local_rows = cfg.tiles_y // num_shards
    return dataclasses.replace(
        cfg,
        height=local_rows * cfg.tile_size,
        width=cfg.padded_width,  # keep tiles_x identical to the global grid
        quant_ranges=quant_params(cfg),
    )


def halo_exchange_rows(band: jnp.ndarray, axis_name: str, n_shards: int,
                       halo: int) -> jnp.ndarray:
    """(h, W, C) row band -> (h + 2*halo, W, C) extended with the neighbor
    shards' boundary rows (zeros at the global top/bottom edge, matching
    zero window padding). Used for exact distributed SSIM: every 11x11
    window then sees the same pixels as the single-device computation."""
    up = jax.lax.ppermute(
        band[-halo:], axis_name, [(i, i + 1) for i in range(n_shards - 1)]
    )
    down = jax.lax.ppermute(
        band[:halo], axis_name, [(i, i - 1) for i in range(1, n_shards)]
    )
    return jnp.concatenate([up, band, down], axis=0)


def _render_local_tiles(scene, camera, cfg: RenderConfig, lcfg: RenderConfig,
                        shard_idx, axis_name: str, uv_tap=None):
    """Per-shard body: project all, bin/blend only this shard's tile rows.
    Returns (image_band, trans_band, overflow, num_intersections) of the
    PADDED image. uv_tap threads the zero-valued screen-space gradient tap
    through projection (train/loop.py's densification trigger)."""
    tile_start = shard_idx * lcfg.num_tiles
    proj = project_gaussians(scene, camera, cfg, uv_tap=uv_tap)
    binned = bin_gaussians(
        proj, cfg, tile_start=tile_start, num_local_tiles=lcfg.num_tiles
    )
    if cfg.stream_format in ("packed16", "packed4"):
        # Same fused quantize -> gather -> rasterize custom_vjp as the
        # single-device path; lcfg carries the global quant_ranges so the
        # in-kernel unpack agrees with the pack.
        from gsplat_tpu.ops.binning import features_f32
        from gsplat_tpu.ops.stream16 import rasterize_packed16

        image, trans = rasterize_packed16(
            features_f32(proj, cfg), binned.sorted_gid, binned.sorted_gidk,
            binned.gauss_offsets, binned.gauss_counts, binned.ranges,
            tile_start, cfg, lcfg,
        )
        return image, trans, binned.overflow, binned.num_intersections
    features = gather_features(proj, binned, cfg)
    if cfg.impl == "pallas":
        from gsplat_tpu.ops.pallas.raster import rasterize_pallas

        image, trans = rasterize_pallas(
            features, binned.ranges, lcfg, tile_offset=tile_start
        )
    else:
        from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

        image, trans = rasterize_tiles_jnp(
            features, binned.ranges, lcfg, tile_offset=tile_start
        )
    return image, trans, binned.overflow, binned.num_intersections


def render_tile_sharded(
    scene: GaussianScene,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    axis_name: str = "tiles",
    background: jnp.ndarray | None = None,
):
    """Render with the tile grid sharded over `mesh[axis_name]`.

    Returns (image (H, W, 3), transmittance (H, W), overflow ()) with the
    image sharded over rows (NamedSharding(mesh, P('tiles'))).
    """
    d = mesh.shape[axis_name]
    lcfg = local_tile_cfg(cfg, d)

    def shard_fn(scene, camera):
        idx = jax.lax.axis_index(axis_name)
        img, trans, ovf, _ = _render_local_tiles(
            scene, camera, cfg, lcfg, idx, axis_name
        )
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), axis_name)
        return img, trans, ovf

    in_specs = (P(), P())
    out_specs = (P(axis_name, None, None), P(axis_name, None), P())
    img, trans, ovf = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(scene, camera)
    img = img[: cfg.height, : cfg.width]
    trans = trans[: cfg.height, : cfg.width]
    if background is not None:
        img = img + trans[..., None] * background
    return img, trans, ovf.astype(bool)
