"""Tile binning: duplicate Gaussians per covered tile, order by (tile, depth),
compute per-tile ranges, gather the sorted feature stream.

Reference pipeline being replaced (all of it collapses into this module):
  - exclusive prefix-sum over per-Gaussian tile counts
      (reference: src/exclusive_scan.ts + prefix_sum.wgsl/block_prefix_sum.wgsl/
       add_block_sums.wgsl) -> ``jnp.cumsum`` (XLA emits the multi-block scan).
  - per-(tile,depth) key emission with decimal packing ``tile*1000 + 50*depth``
      (reference: src/write_tile_ids.wgsl:23-35) -> exact lexicographic
      (int32 tile, float32 depth) two-key sort; no depth quantization, no
      4.29M-tile overflow.
  - 32-bit LSD radix sort with decoupled lookback
      (reference: src/radix_sort/sort.ts + radix_sort.wgsl) ->
      ``jax.lax.sort(..., num_keys=2)`` (XLA's TPU sort). The lookback
      spin-wait pattern does not exist on TPU.
  - range compaction (reference: src/compute_ranges.wgsl) ->
      one ``jnp.searchsorted`` over the sorted tile ids.

Static-shape discipline: capacity is ``cfg.max_intersections``; the
reference's per-frame CPU readback + reallocation (renderer.ts:419-441)
becomes an overflow flag. Two binning strategies (cfg.binning):
  'sort':    sort all N*K_max candidate keys (sentinel-padded) and keep the
             first max_intersections -- pure sort, no scatter.
  'scatter': cumsum offsets + scatter into the capacity buffer, then sort
             max_intersections keys -- wins when N*K_max >> capacity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.ops.projection import ProjectedGaussians

# Feature-row indices of the gathered sorted stream (F, max_intersections).
FEAT_GX = 0      # gaussian center x in pixels
FEAT_GY = 1
FEAT_CA = 2      # conic A
FEAT_CB = 3      # conic B
FEAT_CC = 4      # conic C
FEAT_R = 5
FEAT_G = 6
FEAT_B = 7
FEAT_OPACITY = 8
FEAT_DEPTH = 9
NUM_FEATURES = 10
# Feature rows padded to a multiple of the TPU f32 sublane tile (8) so Pallas
# DMA slices are tiling-aligned.
PADDED_FEATURES = 16


@struct.dataclass
class BinnedGaussians:
    sorted_tile: jnp.ndarray   # (max_I,) int32, sentinel = num_tiles
    sorted_gid: jnp.ndarray    # (max_I,) int32 gaussian index per slot
    #                          #   (-1 = alignment-padding slot)
    ranges: jnp.ndarray        # (num_tiles + 1,) int32; tile t spans
    #                          #   [ranges[t], ranges[t+1])
    num_intersections: jnp.ndarray  # () int32 true total (may exceed capacity)
    overflow: jnp.ndarray      # () bool: capacity or K_max exceeded


def _align_stream(s_tile, s_gid, ranges, max_i: int, n_local: int, align: int):
    """Re-space the sorted stream so every tile's segment length is a multiple
    of `align` (the Pallas blend block size). Padding slots get gid -1, which
    gathers to all-zero features (zero opacity -> no contribution, no
    gradient). Alignment guarantees:
      - every per-tile DMA offset is `align`-aligned (Mosaic tiling rule),
      - the backward kernel's per-tile gradient writes never overlap another
        tile's slots, keeping them race-free with zero atomics.
    """
    counts = ranges[1:] - ranges[:-1]                         # (T,)
    padded = ((counts + align - 1) // align) * align
    pstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )                                                          # (T+1,)
    total_padded = pstart[-1]
    new_ranges = jnp.minimum(pstart, max_i).astype(jnp.int32)

    # Per-slot segment info WITHOUT per-slot table lookups: every needed
    # per-tile quantity (tile index, cumulative pad shift, segment end) is
    # monotone over slots, so scatter it at the segment starts and take a
    # prefix max. This replaces a many-queries-into-small-array searchsorted,
    # which XLA lowers disastrously (~1s at 8M slots).
    s = jnp.arange(max_i, dtype=jnp.int32)
    pos = jnp.minimum(pstart[:-1], max_i)

    def seg_broadcast(values):  # values (T,) monotone -> (max_i,) per slot
        m = jnp.zeros((max_i + 1,), jnp.int32).at[pos].max(values)[:max_i]
        return jax.lax.cummax(m)

    shift = pstart[:-1] - ranges[:-1]          # cumulative padding before t
    shift_of_s = seg_broadcast(shift)
    end_of_s = seg_broadcast(ranges[1:])       # ranges[t_of_s + 1]
    t_of_s = seg_broadcast(jnp.arange(n_local, dtype=jnp.int32))

    orig = s - shift_of_s
    valid = (orig < end_of_s) & (s < total_padded)
    new_gid = jnp.where(valid, s_gid[jnp.clip(orig, 0, max_i - 1)], -1)
    new_tile = jnp.where(valid, t_of_s, n_local)
    return new_tile, new_gid, new_ranges, total_padded


def depth_bits_for(n_tiles: int) -> int:
    """Depth bits left in a u32 key after the tile id of an n_tiles grid."""
    tile_bits = max(int(n_tiles + 1).bit_length(), 1)
    return 32 - tile_bits


def pack_tile_depth_key(tile, depth, n_tiles: int):
    """u32 key = tile << depth_bits | monotone-float-bit-quantized depth.
    Raw float bits of a positive float are monotone in the float, so sorting
    the packed key orders by (tile, depth) exactly up to depth ties within
    2^-depth_bits relative precision (far finer than the reference's
    1000-level decimal quantization, src/write_tile_ids.wgsl:29-31)."""
    depth_bits = depth_bits_for(n_tiles)
    if depth_bits < 12:
        raise ValueError(
            f"{n_tiles} tiles leave only {depth_bits} depth bits in a u32 key"
        )
    dbits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    depth_q = jax.lax.shift_right_logical(dbits, 31 - depth_bits)
    return jax.lax.shift_left(
        tile.astype(jnp.uint32), jnp.uint32(depth_bits)
    ) | depth_q.astype(jnp.uint32)


def _tiered_candidates(proj: ProjectedGaussians, cfg: RenderConfig):
    """Tiered candidate expansion: every Gaussian gets K0=4 candidate slots;
    Gaussians whose rect covers more tiles are compacted (cumsum-rank
    scatter, no atomics) into budgeted overflow pools with 16 and K_max
    slots. Cuts the sort input from N*K_max to ~N*4 + budgets -- the
    dominant cost at 1M Gaussians -- while preserving exact coverage up to
    the (flagged) pool budgets.

    Returns (tile (M,), depth (M,), gid (M,), valid (M,), pool_overflow ()).
    """
    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian
    tiers = [(0, min(4, kmax), None)]
    if kmax > 4:
        tiers.append((4, min(16, kmax), max(n // 4, 1)))
    if kmax > 16:
        tiers.append((16, kmax, max(n // 16, 1)))

    rect_w = jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 1)
    counts = proj.counts
    all_ids = jnp.arange(n, dtype=jnp.int32)

    tiles_l, depth_l, gid_l, valid_l = [], [], [], []
    pool_overflow = jnp.zeros((), bool)
    for k_lo, k_hi, budget in tiers:
        if budget is None:
            ids = all_ids
        else:
            member = counts > k_lo
            rank = jnp.cumsum(member) - 1
            pool_overflow = pool_overflow | (jnp.sum(member) > budget)
            slot = jnp.where(member & (rank < budget), rank, budget)
            ids = jnp.full((budget + 1,), n, jnp.int32).at[slot].set(
                all_ids, mode="drop"
            )[:budget]
        k = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[None, :]
        ids_c = jnp.clip(ids, 0, n - 1)
        w = rect_w[ids_c][:, None]
        tx = proj.rect[ids_c, 0:1] + k % w
        ty = proj.rect[ids_c, 1:2] + k // w
        tile = ty * cfg.tiles_x + tx
        valid = (ids[:, None] < n) & (k < counts[ids_c][:, None])
        tiles_l.append(tile.reshape(-1))
        depth_l.append(
            jnp.broadcast_to(proj.depth[ids_c][:, None], tile.shape).reshape(-1)
        )
        gid_l.append(jnp.broadcast_to(ids_c[:, None], tile.shape).reshape(-1))
        valid_l.append(valid.reshape(-1))

    return (
        jnp.concatenate(tiles_l),
        jnp.concatenate(depth_l),
        jnp.concatenate(gid_l),
        jnp.concatenate(valid_l),
        pool_overflow,
    )


def _candidate_tiles(proj: ProjectedGaussians, cfg: RenderConfig):
    """Expand each Gaussian into its K_max candidate (tile, depth, gid)
    triples; entry k is valid iff k < counts[gid]. Row-major walk of the
    rect, like the reference's write_tile_ids loop
    (reference: src/write_tile_ids.wgsl:23-35)."""
    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian
    k = jnp.arange(kmax, dtype=jnp.int32)[None, :]            # (1, K)
    rect_w = jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 1)[:, None]
    tx = proj.rect[:, 0:1] + k % rect_w
    ty = proj.rect[:, 1:2] + k // rect_w
    tile = ty * cfg.tiles_x + tx                              # (N, K)
    valid = k < proj.counts[:, None]                          # (N, K)
    gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], tile.shape)
    depth = jnp.broadcast_to(proj.depth[:, None], tile.shape)
    return tile, depth, gid, valid


def bin_gaussians(
    proj: ProjectedGaussians,
    cfg: RenderConfig,
    tile_start=None,
    num_local_tiles: int | None = None,
) -> BinnedGaussians:
    """Bin into the (tile, depth)-sorted stream.

    tile_start / num_local_tiles restrict binning to the half-open global
    tile range [tile_start, tile_start + num_local_tiles) with tile ids
    re-based to local -- the per-shard path for tile-sharded multi-chip
    rendering (each chip bins, sorts and blends only its tile rows;
    cfg.max_intersections is then the PER-SHARD capacity). tile_start may be
    a traced scalar (it is `axis_index * local_tiles` under shard_map);
    num_local_tiles must be static.
    """
    max_i = cfg.max_intersections
    n_local = cfg.num_tiles if num_local_tiles is None else num_local_tiles
    sentinel = jnp.int32(n_local)
    if cfg.binning == "tiered":
        tile, depth, gid, valid, pool_ovf = _tiered_candidates(proj, cfg)
    else:
        tile, depth, gid, valid = _candidate_tiles(proj, cfg)
        pool_ovf = jnp.zeros((), bool)
    if tile_start is not None:
        t0 = jnp.asarray(tile_start, jnp.int32)
        valid = valid & (tile >= t0) & (tile < t0 + n_local)
        tile = tile - t0
    total = jnp.sum(valid).astype(jnp.int32)
    overflow = proj.overflow | pool_ovf | (total > max_i)

    tile_f = jnp.where(valid, tile, sentinel).reshape(-1)
    depth_f = jnp.where(valid, depth, jnp.inf).reshape(-1).astype(jnp.float32)
    gid_f = gid.reshape(-1)

    if cfg.binning in ("packed", "tiered"):
        # Single-u32-key sort: key = tile << depth_bits | depth_q. Depth is
        # quantized via its raw float bits (monotone for positives), so the
        # only divergence from the exact 2-key sort is tie order among
        # near-equal depths. Far finer than the reference's 1000-level
        # decimal quantization (reference: src/write_tile_ids.wgsl:29-31)
        # and ~2/3 the sort traffic of the exact mode.
        depth_bits = depth_bits_for(n_local)
        key = pack_tile_depth_key(tile, depth, n_local)
        key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF)).reshape(-1)
        s_key, s_gid = jax.lax.sort_key_val(key, gid.reshape(-1))
        if s_key.shape[0] >= max_i:
            s_key = s_key[:max_i]
            s_gid = s_gid[:max_i]
        else:
            pad = max_i - s_key.shape[0]
            s_key = jnp.concatenate(
                [s_key, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)]
            )
            s_gid = jnp.concatenate([s_gid, jnp.zeros((pad,), jnp.int32)])
        s_tile = jnp.minimum(
            jax.lax.shift_right_logical(s_key, jnp.uint32(depth_bits)),
            jnp.uint32(n_local),
        ).astype(jnp.int32)
    elif cfg.binning == "sort":
        # Sentinel-keyed entries sort to the back; valid prefix is ordered by
        # (tile, depth). Depth is a stop-gradient sort key by construction
        # (int/float values only flow through ordering, not arithmetic).
        s_tile, _, s_gid = jax.lax.sort(
            (tile_f, jax.lax.stop_gradient(depth_f), gid_f), num_keys=2
        )
        if s_tile.shape[0] >= max_i:
            s_tile = s_tile[:max_i]
            s_gid = s_gid[:max_i]
        else:
            pad = max_i - s_tile.shape[0]
            s_tile = jnp.concatenate([s_tile, jnp.full((pad,), sentinel, jnp.int32)])
            s_gid = jnp.concatenate([s_gid, jnp.zeros((pad,), jnp.int32)])
    else:  # 'scatter'
        counts = jnp.sum(valid, axis=1).astype(jnp.int32)
        offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)  # exclusive
        # Rank of each VALID candidate within its Gaussian's local-valid set.
        local_rank = jnp.cumsum(valid, axis=1).astype(jnp.int32) - 1
        slot = offsets[:, None] + local_rank
        slot = jnp.where(valid & (slot < max_i), slot, max_i)  # trash slot
        slot_f = slot.reshape(-1)
        tile_buf = jnp.full((max_i + 1,), sentinel, jnp.int32).at[slot_f].set(
            tile_f, mode="drop"
        )[:max_i]
        depth_buf = jnp.full((max_i + 1,), jnp.inf, jnp.float32).at[slot_f].set(
            depth_f, mode="drop"
        )[:max_i]
        gid_buf = jnp.zeros((max_i + 1,), jnp.int32).at[slot_f].set(
            gid_f, mode="drop"
        )[:max_i]
        s_tile, _, s_gid = jax.lax.sort(
            (tile_buf, jax.lax.stop_gradient(depth_buf), gid_buf), num_keys=2
        )

    # Range compaction: one searchsorted replaces the reference's
    # compute_ranges kernel (and fixes its 0xFFFFFFFE/0xFFFFFFFF sentinel
    # mismatch, reference: src/compute_ranges.wgsl:13 vs radix_sort.wgsl:78).
    ranges = jnp.searchsorted(
        s_tile, jnp.arange(n_local + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    align = cfg.stream_align or (
        cfg.pallas_block_size if cfg.impl == "pallas" else 1
    )
    if align > 1:
        s_tile, s_gid, ranges, total_padded = _align_stream(
            s_tile, s_gid, ranges, max_i, n_local, align
        )
        overflow = overflow | (total_padded > max_i)

    return BinnedGaussians(
        sorted_tile=s_tile,
        sorted_gid=jax.lax.stop_gradient(s_gid),
        ranges=jax.lax.stop_gradient(ranges),
        num_intersections=total,
        overflow=overflow,
    )


def gather_features(
    proj: ProjectedGaussians, binned: BinnedGaussians, cfg: RenderConfig
) -> jnp.ndarray:
    """Gather the per-Gaussian render features into sorted-stream order.

    Returns (NUM_FEATURES, max_intersections) float32 -- feature-major so the
    blend kernels DMA contiguous (F, G) blocks with Gaussians along lanes.
    Alignment-padding slots (gid -1) gather to all-zero columns via fill mode.
    The gather is differentiable: its transpose (scatter-add of per-slot
    gradients back to Gaussians) is exactly the gradient accumulation the
    CUDA 3DGS backward does with atomics, but expressed as one XLA scatter.
    """
    gx = proj.uv[:, 0] * cfg.width
    gy = proj.uv[:, 1] * cfg.height
    feats = jnp.stack(
        [
            gx,
            gy,
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            proj.color[:, 0],
            proj.color[:, 1],
            proj.color[:, 2],
            proj.opacity,
            proj.depth,
        ],
        axis=0,
    ).astype(jnp.float32)  # (F, N)
    # Padding slots use gid -1; jnp.take's fill mode only fills for indices
    # >= n (negatives wrap), so remap -1 to n first.
    gid = jnp.where(binned.sorted_gid < 0, feats.shape[1], binned.sorted_gid)
    return jnp.take(feats, gid, axis=1, mode="fill", fill_value=0.0)
