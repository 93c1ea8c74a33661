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

import functools

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
# Depth is deliberately NOT a gathered feature: the blend never reads it
# (ordering is baked into the stream by the sort), and the two big gathers
# plus the gather-backward sort all pay per-ELEMENT costs (PROFILE.md), so
# every row is ~2.5 ms/iter at the 1080p/1M bench shape. The
# Gaussian-sharded path gathers depth separately as a merge key
# (parallel/gaussian_sharded.py _fragment_blocks).
NUM_FEATURES = 9
# Feature rows padded to a multiple of the TPU f32 sublane tile (8) so Pallas
# DMA slices are tiling-aligned.
PADDED_FEATURES = 16


# Bits of the per-Gaussian candidate index k packed into the low end of the
# (gid << KBITS | k) u32 sort value. Supports K_max <= 128 and
# N < 2^24 - 1 (gidk must stay below the 2^31 - 1 invalid sentinel).
# With jumbo tiers (cfg.max_tiles_jumbo) the k field widens to
# ceil(log2 K_jumbo) bits -- producers and consumers derive the same width
# from the effective K via _kbits(), so the constant is only the floor.
KBITS = 7


def kmax_eff(cfg: RenderConfig) -> int:
    """Largest candidate count any single Gaussian can emit (the jumbo
    ceiling when jumbo tiers are on, else K_max) -- the K that sizes the
    gidk bit split and the gather-backward's suffix-sum depth."""
    return cfg.max_tiles_jumbo or cfg.max_tiles_per_gaussian


def _kbits(kmax: int) -> int:
    """k-field width of the gidk packing for a given effective K."""
    return max(KBITS, (kmax - 1).bit_length())


@struct.dataclass
class BinnedGaussians:
    sorted_tile: jnp.ndarray   # (max_I,) int32, sentinel = num_tiles
    sorted_gid: jnp.ndarray    # (max_I,) int32 gaussian index per slot
    #                          #   (-1 = alignment-padding slot)
    ranges: jnp.ndarray        # (num_tiles + 1,) int32; tile t spans
    #                          #   [ranges[t], ranges[t+1])
    num_intersections: jnp.ndarray  # () int32 true total (may exceed capacity)
    overflow: jnp.ndarray      # () bool: capacity or K_max exceeded
    sorted_gidk: jnp.ndarray | None = None  # (max_I,) int32 gid << KBITS | k
    #                          #   per slot (-1 = padding); enables the
    #                          #   sort-based gather backward
    gauss_offsets: jnp.ndarray | None = None  # (N,) int32 exclusive start of
    #                          #   each Gaussian's run in gidk-sorted order
    gauss_counts: jnp.ndarray | None = None   # (N,) int32 surviving
    #                          #   candidates per Gaussian (post-cull)


def _align_stream(s_tile, s_gid, ranges, max_i: int, n_local: int, align: int,
                  s_cand=None):
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
    orig_c = jnp.clip(orig, 0, max_i - 1)
    new_gid = jnp.where(valid, s_gid[orig_c], -1)
    new_tile = jnp.where(valid, t_of_s, n_local)
    if s_cand is None:
        return new_tile, new_gid, new_ranges, total_padded
    new_cand = jnp.where(valid, s_cand[orig_c], -1)
    return new_tile, new_gid, new_ranges, total_padded, new_cand


def _rect_divmod(k, w):
    """(k // w, k % w) for int32 k in [0, 2^16), w in [1, 2^10) via f32
    division: the VPU has no integer divide (XLA expands it to a long
    sequence), while (k + 0.5) / w is provably never within f32 rounding
    error of an integer, so floor is exact."""
    q = jnp.floor((k.astype(jnp.float32) + 0.5) / w.astype(jnp.float32))
    q = q.astype(jnp.int32)
    return q, k - q * w


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


def _precise_tile_valid(proj: ProjectedGaussians, ids, tx, ty, cfg: RenderConfig):
    """Exact ellipse-tile intersection test (the reference and the original
    3DGS CUDA code bin by the conservative screen rect only, reference:
    src/process_gaussians.wgsl:297-319). A candidate survives iff its peak
    alpha over the tile's pixel centers reaches cfg.alpha_min -- i.e.
    min_{p in rect} q(p) <= 2*ln(opacity/alpha_min), with
    q(p) = A dx^2 + 2B dx dy + C dy^2 the conic quadratic the blend
    evaluates. Because the blend skips alpha < alpha_min anyway
    (ops/blend.py ok-mask), culling these candidates changes NOTHING in the
    image or gradients -- it only shrinks the intersection stream (2-4x for
    fat anisotropic splats, which rects grossly overcover).

    The constrained minimum of the convex quadratic over an axis-aligned
    rect is exact: 0 if the center is inside, else the min over the four
    edges, each a 1D convex quadratic minimized at its clamped stationary
    point. ids: (R,) Gaussian row per candidate row; tx, ty: (R, K) tile
    coords. Returns (R, K) bool.

    NOTE on indexing style: `jnp.take` on 1-D columns, never mixed
    advanced+basic indexing like `proj.conic[ids, 0]` -- XLA lowers the
    mixed form to a pathological gather on TPU (measured 80x slower)."""
    ts = float(cfg.tile_size)

    def col(x2d, j):
        return jnp.take(x2d[:, j], ids)[:, None]

    gx = col(proj.uv, 0) * cfg.width
    gy = col(proj.uv, 1) * cfg.height
    a = col(proj.conic, 0)
    b = col(proj.conic, 1)
    c = col(proj.conic, 2)
    op = jnp.take(proj.opacity, ids)[:, None]

    # Tile pixel-center range [t*ts, t*ts + ts - 1], as deltas from center.
    dx0 = tx * ts - gx
    dx1 = dx0 + (ts - 1.0)
    dy0 = ty * ts - gy
    dy1 = dy0 + (ts - 1.0)
    inside = (dx0 <= 0) & (0 <= dx1) & (dy0 <= 0) & (0 <= dy1)

    # Per-ROW reciprocals (broadcast over the K lanes) instead of per-lane
    # divisions in the edge minimizers.
    neg_b_over_a = -b / jnp.maximum(a, 1e-12)
    neg_b_over_c = -b / jnp.maximum(c, 1e-12)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    def edge_x(d):  # dx = d fixed, minimize over dy
        dy = jnp.clip(neg_b_over_c * d, dy0, dy1)
        return q(d, dy)

    def edge_y(d):  # dy = d fixed, minimize over dx
        dx = jnp.clip(neg_b_over_a * d, dx0, dx1)
        return q(dx, d)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(dx0), edge_x(dx1)),
        jnp.minimum(edge_y(dy0), edge_y(dy1)),
    )
    qmin = jnp.where(inside, 0.0, qmin)
    tau = 2.0 * jnp.log(jnp.maximum(op / cfg.alpha_min, 1e-12))
    return (op > cfg.alpha_min) & (qmin <= tau)


def _rect_cull_mask(proj, cfg: RenderConfig, n: int, kmax: int, rect_w):
    """(N, K_max) validity of the rect walk: k < counts, intersected with
    the exact ellipse-tile cull when enabled. On the pallas path a single
    fused kernel computes it (the jnp form makes XLA materialize a dozen
    (N, K_max) f32 intermediates, ~62 ms at 64M lanes)."""
    if cfg.tile_culling and cfg.impl == "pallas":
        from gsplat_tpu.ops.pallas.cull import tile_cull_mask_pallas

        return tile_cull_mask_pallas(proj, cfg)
    k = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    ky, kx = _rect_divmod(k, rect_w[:, None])
    tx_all = proj.rect[:, 0:1] + kx
    ty_all = proj.rect[:, 1:2] + ky
    valid_all = k < proj.counts[:, None]
    if cfg.tile_culling:
        valid_all &= _precise_tile_valid(
            proj, jnp.arange(n, dtype=jnp.int32), tx_all, ty_all, cfg
        )
    return valid_all


def _normalize_tier_plan(spec, kmax: int, n: int):
    """tier_spec -> [(k_lo, k_hi, budget_rows | None), ...].

    Legacy form (K0, div1, div2): dense K0-slot tier + pools of N/div1 rows
    over slots [K0, 4*K0) and N/div2 rows over [4*K0, K_max).
    General form ((k_hi, div), ...): cumulative slot boundaries; div == 0
    means a dense tier (all N rows), else a pool of N//div rows. Finer
    ladders track the tile-count histogram more closely, shrinking the
    sort stream toward the true intersection count."""
    if spec and isinstance(spec[0], (tuple, list)):
        plan = []
        k_lo = 0
        for k_hi, div in spec:
            k_hi = min(int(k_hi), kmax)
            if k_hi <= k_lo:
                continue
            plan.append(
                (k_lo, k_hi, None if div == 0 else max(n // int(div), 1))
            )
            k_lo = k_hi
        if k_lo < kmax:  # implicit final tier to K_max, reuse last divisor
            last_div = spec[-1][1] if spec else 0
            plan.append(
                (k_lo, kmax, None if last_div == 0 else max(n // int(last_div), 1))
            )
        return plan
    k0, d1, d2 = spec
    k1 = min(4 * k0, kmax)
    plan = [(0, min(k0, kmax), None)]
    if kmax > k0:
        plan.append((k0, k1, max(n // d1, 1)))
    if kmax > k1:
        plan.append((k1, kmax, max(n // d2, 1)))
    return plan


def _tiered_candidates(proj: ProjectedGaussians, cfg: RenderConfig,
                       n_local: int, tile_start=None):
    """Tiered candidate expansion straight to packed sort operands: every
    Gaussian gets a dense tier of candidate slots; Gaussians whose rect
    covers more tiles take rows in budgeted overflow pools (prefixes of one
    shared count-descending ranking). Cuts the sort input from N*K_max to
    ~N*K0 + pool budgets -- the dominant cost at 1M Gaussians -- while
    preserving exact coverage up to the (flagged) pool budgets.

    Emits the (key, gidk) sort operands directly, built per tier in 2-D
    (rows, k) form: materializing intermediate 1-D tile/depth/gid/kidx/valid
    streams cost ~4 ms/iter of broadcast+reshape relayouts at the 1080p/1M
    bench shape (PROFILE.md). Depth is quantized per ROW (one op per
    Gaussian, not per candidate) and broadcast into the key.

    tile_start (traced ok) restricts to the shard-local tile range
    [tile_start, tile_start + n_local), re-bases tile ids, and recomputes
    per-Gaussian counts within the shard.

    Returns (key (M,) u32 -- 0xFFFFFFFF for invalid, gidk (M,) int32,
    total () int32 valid count, pool_overflow (), gcounts (N,) per-Gaussian
    candidate counts within this shard's range). gidk carries gid << KBITS |
    compact candidate index (position among the Gaussian's surviving tiles)
    -- unique within a Gaussian across tiers.
    """
    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian
    kb = _kbits(kmax_eff(cfg))
    depth_bits = depth_bits_for(n_local)
    if depth_bits < 12:
        # Same guard as pack_tile_depth_key (the 'packed' path): huge tile
        # grids would silently get very coarse depth ordering.
        raise ValueError(
            f"{n_local} tiles leave only {depth_bits} depth bits in a u32 "
            "key"
        )

    # Upfront (N, K_max) rect enumeration + exact ellipse culling, then a
    # per-row compaction (one lane-wise sort) so tiers enumerate only the
    # SURVIVING tiles. Tier membership and pool budgets are therefore sized
    # on true post-cull counts -- without this, fat-splat scenes blow the
    # pool budgets on rect candidates the cull would have dropped anyway.
    k = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    rect_w = jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 1)
    valid_all = _rect_cull_mask(proj, cfg, n, kmax, rect_w)
    counts = jnp.sum(valid_all, axis=1).astype(jnp.int32)  # culled counts
    if cfg.max_tiles_jumbo:
        # Splats whose RAW rect exceeds the base walk are handled by the
        # jumbo tiers (full enumeration up to max_tiles_jumbo on their own
        # small grid, below); zeroing their base counts removes them from
        # every base tier and pool so nothing double-emits.
        area_raw = jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 0) \
            * jnp.maximum(proj.rect[:, 3] - proj.rect[:, 1], 0)
        area_raw = jnp.where(proj.mask, area_raw, 0)
        is_jumbo = area_raw > kmax
        counts = jnp.where(is_jumbo, 0, counts)
    compact_k = jnp.sort(jnp.where(valid_all, k, kmax), axis=1, stable=False)  # (N, kmax)

    tiers = _normalize_tier_plan(cfg.tier_spec, kmax, n)

    # ONE count-descending ranking shared by every pool tier. Tier
    # memberships are NESTED (counts > 16 implies counts > 8), so the
    # members of ANY pool tier form a prefix of ids_by_count and budget
    # selection is a static slice. This replaces the old per-tier
    # member-mask + cumsum-rank + 1M-lane compaction sort (measured ~40
    # ms/iter across 4 pools at the bench shape -- the per-tier machinery,
    # not the row gathers, dominated). Overflow now drops the SMALLEST
    # overflowing Gaussians instead of the highest-id ones.
    pool_budgets = [b for _, _, b in tiers if b is not None]
    if pool_budgets:
        _, ids_by_count = jax.lax.sort_key_val(
            -counts, jnp.arange(n, dtype=jnp.int32), is_stable=False
        )
        bmax = max(pool_budgets)
        ids_pool = ids_by_count[:bmax]            # (bmax,) count-descending
        # Row data gathered ONCE at the largest budget (smaller tiers
        # slice), and as ONE (N, 5) -> (bmax, 5) row gather, not five 1-D
        # takes: the flat take's runtime is data-dependent (see the gather
        # NOTE below) and the five takes measured ~24 ms at bmax=500k where
        # this row gather is ~3 ms. Depth rides along bitcast to int32.
        pool_data = jnp.take(
            jnp.stack(
                [
                    rect_w,
                    proj.rect[:, 0],
                    proj.rect[:, 1],
                    jax.lax.bitcast_convert_type(proj.depth, jnp.int32),
                    counts,
                ],
                axis=1,
            ),
            ids_pool,
            axis=0,
        )  # (bmax, 5)
        pool_w = pool_data[:, 0]
        pool_x0 = pool_data[:, 1]
        pool_y0 = pool_data[:, 2]
        pool_depth = jax.lax.bitcast_convert_type(
            pool_data[:, 3], jnp.float32
        )
        pool_counts = pool_data[:, 4]

    if tile_start is not None:
        t0 = jnp.asarray(tile_start, jnp.int32)
        # Shard-local per-Gaussian candidate counts for the gather backward
        # (the global culled counts over-count candidates outside this
        # shard's tile range). Computed on the compact (N, K_max) grid --
        # elementwise only, no gathers.
        cky_a, ckx_a = _rect_divmod(
            jnp.minimum(compact_k, kmax - 1), rect_w[:, None]
        )
        tile_all = (proj.rect[:, 1:2] + cky_a) * cfg.tiles_x + (
            proj.rect[:, 0:1] + ckx_a
        )
        in_rng = (
            (k < counts[:, None])
            & (tile_all >= t0)
            & (tile_all < t0 + n_local)
        )
        gcounts = jnp.sum(in_rng, axis=1).astype(jnp.int32)
    else:
        gcounts = counts

    key_l, gidk_l = [], []
    total = jnp.zeros((), jnp.int32)
    pool_overflow = jnp.zeros((), bool)
    for k_lo, k_hi, budget in tiers:
        kk = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[None, :]
        if budget is None:
            # Dense tier: rows ARE Gaussians -- no gathers. (An identity
            # jnp.take still costs per-element on TPU: ~40 ms for the
            # 1M x 8 dense tier, the single largest cost of the old path.)
            ids_c = jnp.arange(n, dtype=jnp.int32)
            ck = compact_k[:, k_lo:k_hi]
            row_w = rect_w[:, None]
            row_x0, row_y0 = proj.rect[:, 0:1], proj.rect[:, 1:2]
            row_depth = proj.depth[:, None]
            row_counts = counts[:, None]
        else:
            # Prefix of the shared ranking. Rows past the true member count
            # have counts <= k_lo, so every candidate kk in [k_lo, k_hi)
            # fails kk < row_counts -- no member mask needed. Overflowing
            # members (rank >= budget) are dropped and flagged.
            pool_overflow = pool_overflow | (jnp.sum(counts > k_lo) > budget)
            ids_c = ids_pool[:budget]
            # Slice the column range BEFORE the row gather (gather cost is
            # per-element, so gathering all K_max columns then slicing pays
            # K_max/k_range times the traffic), and jnp.take + basic slice,
            # NOT compact_k[ids_c, k_lo:k_hi]: the mixed advanced+slice form
            # lowers to a pathological TPU gather (80x).
            ck = jnp.take(compact_k[:, k_lo:k_hi], ids_c, axis=0)
            row_w = pool_w[:budget, None]
            row_x0 = pool_x0[:budget, None]
            row_y0 = pool_y0[:budget, None]
            row_depth = pool_depth[:budget, None]
            row_counts = pool_counts[:budget, None]
        cky, ckx = _rect_divmod(ck, row_w)
        tile = (row_y0 + cky) * cfg.tiles_x + (row_x0 + ckx)
        valid = kk < row_counts
        if tile_start is not None:
            valid = valid & (tile >= t0) & (tile < t0 + n_local)
            tile = tile - t0
        # Per-ROW depth quantization (see pack_tile_depth_key), broadcast
        # into the 2-D key; invalid lanes take the sentinel key.
        depth_q = jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(
                row_depth.astype(jnp.float32), jnp.int32
            ),
            31 - depth_bits,
        ).astype(jnp.uint32)
        key = (
            jax.lax.shift_left(tile.astype(jnp.uint32),
                               jnp.uint32(depth_bits))
            | depth_q
        )
        key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
        gidk = jax.lax.shift_left(ids_c[:, None], jnp.int32(kb)) | kk
        total = total + jnp.sum(valid).astype(jnp.int32)
        key_l.append(key.reshape(-1))
        gidk_l.append(jnp.broadcast_to(gidk, key.shape).reshape(-1))

    if cfg.max_tiles_jumbo:
        jkey_l, jgidk_l, jtotal, jovf, gcounts = _jumbo_candidates(
            proj, cfg, n_local, tile_start, rect_w, area_raw, is_jumbo,
            gcounts, depth_bits, kb,
        )
        key_l += jkey_l
        gidk_l += jgidk_l
        total = total + jtotal
        pool_overflow = pool_overflow | jovf

    return (
        jnp.concatenate(key_l),
        jnp.concatenate(gidk_l),
        total,
        pool_overflow,
        gcounts,
    )


def _jumbo_candidates(proj, cfg: RenderConfig, n_local: int, tile_start,
                      rect_w, area_raw, is_jumbo, gcounts, depth_bits: int,
                      kb: int):
    """Jumbo-tier candidate emission (cfg.max_tiles_jumbo): full tile
    enumeration, up to max_tiles_jumbo per splat, for the few thousand
    splats whose raw rect exceeds the base K_max walk -- on their own
    (rows, K_jumbo) cull grid so the (N, K_max) base machinery keeps its
    small K. Selection is a raw-area ranking (area >= post-cull count, so
    the top-R-by-area prefix is a superset of any top-R-by-count set of
    the same size up to ranking noise at the boundary -- dropped splats
    set the overflow flag either way); within the selected rows, tiers
    take prefixes of a post-cull-count ranking, exactly like the base
    pools. Returns (key chunks, gidk chunks, total, overflow, gcounts')
    where gcounts' has the jumbo splats' true culled counts scattered in
    (the backward's run-length bookkeeping).

    The reference walks each splat's full rect with dynamically-sized
    buffers (reference: src/write_tile_ids.wgsl:23-35, renderer.ts:419-441)
    -- this is the static-shape answer: exact coverage, budgeted rows,
    flagged overflow."""
    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian
    jumbo = cfg.max_tiles_jumbo
    jspec = list(cfg.jumbo_tier_spec)
    budgets = [b for _, b in jspec]
    if budgets != sorted(budgets, reverse=True):
        raise ValueError(
            "jumbo_tier_spec row budgets must descend (tiers take nested "
            f"prefixes of the area ranking); got {budgets}"
        )
    r_rows = budgets[0]

    overflow = (
        (jnp.sum(is_jumbo) > r_rows) | jnp.any(area_raw > jumbo)
    )

    # ONE raw-area-descending ranking: selection (top-R rows) AND tier
    # membership come from it. Jumbo tiers enumerate the RAW rect walk
    # (validity = the cull mask at raw k), not a compacted one: membership
    # in tier [k_lo, k_hi) is then `area > k_lo`, which nests, so every
    # tier is a static prefix slice of the same ranking -- and the (R,
    # K_jumbo) compaction row-sort (whose 2048-wide sorting network
    # dominated cold compile) disappears. The cost is dead lanes where the
    # cull rejected a rect tile; at jumbo scale (tens of K rows) that is
    # noise next to the base stream.
    _, ids_by_area = jax.lax.sort_key_val(
        -area_raw, jnp.arange(n, dtype=jnp.int32), is_stable=False
    )
    ids_r = ids_by_area[:r_rows]

    # Cull mask over the jumbo grid. Walk bound per row: the full raw rect
    # (clipped to K_jumbo).
    bound = jnp.minimum(area_raw, jumbo)
    kj = jnp.arange(jumbo, dtype=jnp.int32)[None, :]
    w_r = jnp.take(rect_w, ids_r)
    x0_r = jnp.take(proj.rect[:, 0], ids_r)
    y0_r = jnp.take(proj.rect[:, 1], ids_r)
    if cfg.tile_culling and cfg.impl == "pallas":
        from gsplat_tpu.ops.pallas.cull import (
            cull_mask_from_params,
            cull_params,
        )

        params = cull_params(proj, cfg, counts=bound)  # (10, N), elementwise
        maskj = cull_mask_from_params(
            jnp.take(params, ids_r, axis=1), jumbo, cfg.tile_size,
            cfg.pallas_interpret,
        )  # (R, jumbo)
        ky_r, kx_r = _rect_divmod(kj, w_r[:, None])
    else:
        ky_r, kx_r = _rect_divmod(kj, w_r[:, None])
        maskj = kj < jnp.take(bound, ids_r)[:, None]
        if cfg.tile_culling:
            maskj &= _precise_tile_valid(
                proj, ids_r, x0_r[:, None] + kx_r, y0_r[:, None] + ky_r, cfg
            )
    # Budget-padding rows (area <= K_max) live in the base tiers; zero them
    # here or they double-emit.
    maskj &= jnp.take(is_jumbo, ids_r)[:, None]
    jcounts = jnp.sum(maskj, axis=1).astype(jnp.int32)  # culled, bookkeeping
    tile_j = (y0_r[:, None] + ky_r) * cfg.tiles_x + (x0_r[:, None] + kx_r)

    if tile_start is not None:
        # Shard-local candidate counts (tile-sharded path).
        t0 = jnp.asarray(tile_start, jnp.int32)
        in_rng = maskj & (tile_j >= t0) & (tile_j < t0 + n_local)
        jc_shard = jnp.sum(in_rng, axis=1).astype(jnp.int32)
        gcounts = gcounts.at[ids_r].add(jc_shard)
    else:
        gcounts = gcounts.at[ids_r].add(jcounts)

    # gidk candidate index: RANK within the Gaussian's surviving set (the
    # gather backward needs k < its suffix-sum depth = kmax_eff, and dense
    # ranks keep keys unique): exclusive running count of valid lanes.
    krank = jnp.cumsum(maskj, axis=1).astype(jnp.int32) - 1

    depth_r = jnp.take(proj.depth, ids_r)
    depth_q = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(depth_r.astype(jnp.float32), jnp.int32),
        31 - depth_bits,
    ).astype(jnp.uint32)[:, None]

    key_j = (
        jax.lax.shift_left(tile_j.astype(jnp.uint32), jnp.uint32(depth_bits))
        | depth_q
    )
    gidk_j = jax.lax.shift_left(ids_r[:, None], jnp.int32(kb)) | krank

    key_l, gidk_l = [], []
    total = jnp.zeros((), jnp.int32)
    k_lo = 0
    for k_hi, budget in jspec:
        # Membership in [k_lo, k_hi) of the raw walk is area > k_lo --
        # checked against ALL jumbo splats, not just the selected rows.
        overflow = overflow | (
            jnp.sum(is_jumbo & (area_raw > k_lo)) > budget
        )
        valid = maskj[:budget, k_lo:k_hi]
        if tile_start is not None:
            tile_s = tile_j[:budget, k_lo:k_hi]
            valid = valid & (tile_s >= t0) & (tile_s < t0 + n_local)
            key = key_j[:budget, k_lo:k_hi] - jax.lax.shift_left(
                t0.astype(jnp.uint32), jnp.uint32(depth_bits)
            )
        else:
            key = key_j[:budget, k_lo:k_hi]
        key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
        total = total + jnp.sum(valid).astype(jnp.int32)
        key_l.append(key.reshape(-1))
        gidk_l.append(gidk_j[:budget, k_lo:k_hi].reshape(-1))
        k_lo = k_hi

    return key_l, gidk_l, total, overflow, gcounts


def tier_occupancy(proj: ProjectedGaussians, cfg: RenderConfig) -> dict:
    """Capacity report for tiered binning on a given scene+camera: per-tier
    membership vs budget, post-cull intersection total, and K_max pressure.
    Host-side diagnostic (not jitted into the render path) backing the
    realistic-scene capacity validation -- run via scripts/scene_report.py.

    Returns {"tiers": [{k_lo, k_hi, budget, members, occupancy}...],
             "num_intersections", "suggested_max_intersections",
             "rect_overflow" (some rect exceeded K_max -- raise K_max),
             "count_quantiles" (post-cull tiles/Gaussian distribution)}."""
    import numpy as np

    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _counts(proj, cfg):
        rect_w = jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 1)
        valid_all = _rect_cull_mask(proj, cfg, n, kmax, rect_w)
        return jnp.sum(valid_all, axis=1).astype(jnp.int32)

    counts = np.asarray(_counts(proj, cfg))
    jumbo_report = None
    if cfg.max_tiles_jumbo and cfg.binning == "tiered":
        # Jumbo splats leave the base ladder entirely (_tiered_candidates
        # zeroes their base counts); report their budgets separately.
        # Membership here uses the RAW rect area (an upper bound on the
        # post-cull count -- the in-graph budget checks use exact culled
        # counts, so occupancy <= these numbers).
        rect = np.asarray(proj.rect)
        area = np.maximum(rect[:, 2] - rect[:, 0], 0) * np.maximum(
            rect[:, 3] - rect[:, 1], 0
        )
        area = np.where(np.asarray(proj.mask), area, 0)
        isj = area > kmax
        counts = np.where(isj, 0, counts)
        jrows = []
        k_lo = 0
        for k_hi, budget in cfg.jumbo_tier_spec:
            members = int((isj & (np.minimum(area, cfg.max_tiles_jumbo)
                                  > k_lo)).sum())
            jrows.append(dict(k_lo=k_lo, k_hi=k_hi, budget=budget,
                              members_upper=members,
                              occupancy_upper=round(members / budget, 4)))
            k_lo = k_hi
        jumbo_report = {
            "rows_budget": cfg.jumbo_tier_spec[0][1],
            "jumbo_splats": int(isj.sum()),
            "max_raw_rect": int(area.max()),
            "over_k_jumbo": int((area > cfg.max_tiles_jumbo).sum()),
            "tiers": jrows,
        }
    tiers = _normalize_tier_plan(cfg.tier_spec, kmax, n)
    rows = []
    for k_lo, k_hi, budget in tiers:
        members = int((counts > k_lo).sum()) if budget is not None else n
        rows.append(
            dict(
                k_lo=k_lo,
                k_hi=k_hi,
                budget=budget if budget is not None else n,
                members=members,
                occupancy=round(
                    members / (budget if budget is not None else n), 4
                ),
            )
        )
    total = int(counts.sum())
    # With jumbo on, `total` counts only base-ladder candidates; the jumbo
    # splats' post-cull contribution is bounded by their raw-area sum and
    # the exact grand total comes from the render's num_intersections.
    out = {
        "tiers": rows,
        "num_intersections": total,
        "suggested_max_intersections": int(total * 1.15),
        "rect_overflow": bool(proj.overflow) if jumbo_report is None
        else jumbo_report["over_k_jumbo"] > 0,
        "count_quantiles": {
            str(q): int(np.quantile(counts, q))
            for q in (0.5, 0.9, 0.99, 0.999, 1.0)
        },
    }
    if jumbo_report is not None:
        out["jumbo"] = jumbo_report
    return out


def diagnose_overflow(proj: ProjectedGaussians, cfg: RenderConfig) -> dict:
    """Classify WHY a frame's overflow flag is set (host-side; wraps
    tier_occupancy). An overflowed frame renders truncated work, so any
    perf/quality number taken from it is invalid -- the bench prints this
    diagnosis whenever the flag is up (VERDICT r4 weak #1).

    Returns {"causes": [...], "occupancy": tier_occupancy dict}; causes are
    'rect>K_max' (some splat's tile rect exceeds max_tiles_per_gaussian --
    raise K_max or set cfg.max_screen_radius), 'pool' (a tier pool budget
    saturated -- raise its divisor), 'stream' (live intersections exceed
    max_intersections -- raise it)."""
    occ = tier_occupancy(proj, cfg)
    causes = []
    if occ["rect_overflow"]:
        causes.append(
            "rect>K_jumbo" if cfg.max_tiles_jumbo else "rect>K_max"
        )
    if any(t["occupancy"] > 1.0 for t in occ["tiers"]):
        causes.append("pool")
    j = occ.get("jumbo")
    if j and (
        j["jumbo_splats"] > j["rows_budget"]
        or any(t["occupancy_upper"] > 1.0 for t in j["tiers"])
    ):
        causes.append("jumbo-budget(upper-bound)")
    if occ["num_intersections"] > cfg.max_intersections:
        causes.append("stream")
    return {"causes": causes, "occupancy": occ}


def _candidate_tiles(proj: ProjectedGaussians, cfg: RenderConfig):
    """Expand each Gaussian into its K_max candidate (tile, depth, gid, k)
    tuples; entry k is valid iff the cull mask passes. Row-major walk of the
    rect, like the reference's write_tile_ids loop
    (reference: src/write_tile_ids.wgsl:23-35)."""
    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian
    k = jnp.arange(kmax, dtype=jnp.int32)[None, :]            # (1, K)
    rect_w = jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 1)
    ky, kx = _rect_divmod(k, rect_w[:, None])
    tx = proj.rect[:, 0:1] + kx
    ty = proj.rect[:, 1:2] + ky
    tile = ty * cfg.tiles_x + tx                              # (N, K)
    valid = _rect_cull_mask(proj, cfg, n, kmax, rect_w)       # (N, K)
    gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], tile.shape)
    depth = jnp.broadcast_to(proj.depth[:, None], tile.shape)
    kidx = jnp.broadcast_to(k, tile.shape)
    return tile, depth, gid, kidx, valid


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
    n = proj.mask.shape[0]
    kmax = cfg.max_tiles_per_gaussian
    kb = _kbits(kmax_eff(cfg))
    n_local = cfg.num_tiles if num_local_tiles is None else num_local_tiles
    sentinel = jnp.int32(n_local)
    if cfg.binning != "scatter":
        n_cap = min((1 << 24) - 1, 1 << (31 - kb))
        if kmax > (1 << kb) or n >= n_cap:
            raise ValueError(
                f"gid<<{kb}|k packing needs max_tiles_per_gaussian <= "
                f"{1 << kb} and N < {n_cap} (got K_max {kmax}, N {n}); use "
                "binning='scatter' beyond that, or lower max_tiles_jumbo"
            )
    if cfg.binning == "tiered":
        # Emits packed (key, gidk) sort operands directly (2-D per tier, no
        # intermediate tile/depth/gid/kidx/valid streams) and handles the
        # shard tile range internally.
        key, gidk, total, pool_ovf, gcounts = _tiered_candidates(
            proj, cfg, n_local, tile_start
        )
    else:
        tile, depth, gid, kidx, valid = _candidate_tiles(proj, cfg)
        pool_ovf = jnp.zeros((), bool)
        if tile_start is not None:
            t0 = jnp.asarray(tile_start, jnp.int32)
            # Shard-local per-Gaussian candidate counts for the gather
            # backward (the global culled counts over-count candidates
            # outside this shard's tile range).
            valid = valid & (tile >= t0) & (tile < t0 + n_local)
            tile = tile - t0
        gcounts = jnp.sum(valid, axis=1).astype(jnp.int32)
        total = jnp.sum(valid).astype(jnp.int32)
        tile_f = jnp.where(valid, tile, sentinel).reshape(-1)
        depth_f = (
            jnp.where(valid, depth, jnp.inf).reshape(-1).astype(jnp.float32)
        )
        # gid << KBITS | k: one sort value carrying both the Gaussian index
        # (for the slot-order feature gather) and the per-Gaussian candidate
        # index (for the sort-based gather backward, which re-sorts slot
        # gradients by gidk -> gid-major runs). Replaces separate gid +
        # candidate-id sort operands (one fewer 13M-lane sort operand).
        gidk = (
            jax.lax.shift_left(gid, jnp.int32(kb)) | kidx
        ).reshape(-1)
        if cfg.binning == "packed":
            # Single-u32-key sort: key = tile << depth_bits | depth_q.
            # Depth is quantized via its raw float bits (monotone for
            # positives), so the only divergence from the exact 2-key sort
            # is tie order among near-equal depths. Far finer than the
            # reference's 1000-level decimal quantization (reference:
            # src/write_tile_ids.wgsl:29-31) and ~2/3 the sort traffic of
            # the exact mode.
            key = pack_tile_depth_key(tile, depth, n_local)
            key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    # With jumbo tiers on, rects past the base K_max are COVERED (by the
    # jumbo enumeration), not truncated -- proj.overflow (area > K_max) is
    # no longer an error; _jumbo_candidates raised pool_ovf for anything
    # actually dropped (row budgets, area > K_jumbo).
    rect_ovf = (
        jnp.zeros((), bool) if (cfg.max_tiles_jumbo and
                                cfg.binning == "tiered")
        else proj.overflow
    )
    overflow = rect_ovf | pool_ovf | (total > max_i)

    if cfg.binning in ("packed", "tiered"):
        depth_bits = depth_bits_for(n_local)
        # is_stable=False: XLA's stable lowering adds a 13M-lane iota
        # tiebreak operand (~1/3 of the sort's cost); ties are identical
        # (tile, quantized-depth) keys whose blend order is arbitrary.
        s_key, s_gidk = jax.lax.sort((key, gidk), num_keys=1,
                                     is_stable=False)
        if s_key.shape[0] >= max_i:
            s_key = s_key[:max_i]
            s_gidk = s_gidk[:max_i]
        else:
            pad = max_i - s_key.shape[0]
            s_key = jnp.concatenate(
                [s_key, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)]
            )
            s_gidk = jnp.concatenate([s_gidk, jnp.full((pad,), -1, jnp.int32)])
        s_tile = jnp.minimum(
            jax.lax.shift_right_logical(s_key, jnp.uint32(depth_bits)),
            jnp.uint32(n_local),
        ).astype(jnp.int32)
        # Invalid candidates share the sentinel key; mark them out.
        s_gidk = jnp.where(s_tile < n_local, s_gidk, -1)
        s_gid = jnp.where(
            s_gidk >= 0,
            jax.lax.shift_right_logical(s_gidk, jnp.int32(kb)),
            0,
        )
    elif cfg.binning == "sort":
        # Sentinel-keyed entries sort to the back; valid prefix is ordered by
        # (tile, depth). Depth is a stop-gradient sort key by construction
        # (int/float values only flow through ordering, not arithmetic).
        s_tile, _, s_gidk = jax.lax.sort(
            (tile_f, jax.lax.stop_gradient(depth_f), gidk), num_keys=2,
            is_stable=False,
        )
        if s_tile.shape[0] >= max_i:
            s_tile = s_tile[:max_i]
            s_gidk = s_gidk[:max_i]
        else:
            pad = max_i - s_tile.shape[0]
            s_tile = jnp.concatenate([s_tile, jnp.full((pad,), sentinel, jnp.int32)])
            s_gidk = jnp.concatenate([s_gidk, jnp.full((pad,), -1, jnp.int32)])
        s_gidk = jnp.where(s_tile < n_local, s_gidk, -1)
        s_gid = jnp.where(
            s_gidk >= 0,
            jax.lax.shift_right_logical(s_gidk, jnp.int32(kb)),
            0,
        )
    else:  # 'scatter'
        gid_f = gid.reshape(-1)
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
            (tile_buf, jax.lax.stop_gradient(depth_buf), gid_buf), num_keys=2,
            is_stable=False,
        )
        s_gidk = None

    # Range compaction: one searchsorted replaces the reference's
    # compute_ranges kernel (and fixes its 0xFFFFFFFE/0xFFFFFFFF sentinel
    # mismatch, reference: src/compute_ranges.wgsl:13 vs radix_sort.wgsl:78).
    ranges = jnp.searchsorted(
        s_tile, jnp.arange(n_local + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # The Pallas kernels handle unaligned segments natively (block-0 RMW in
    # the backward), so alignment is opt-in (debug / experiments) only.
    align = cfg.stream_align or 1
    if align > 1:
        if s_gidk is None:
            s_tile, s_gid, ranges, total_padded = _align_stream(
                s_tile, s_gid, ranges, max_i, n_local, align
            )
        else:
            s_tile, s_gid, ranges, total_padded, s_gidk = _align_stream(
                s_tile, s_gid, ranges, max_i, n_local, align, s_gidk
            )
        overflow = overflow | (total_padded > max_i)

    if s_gidk is None:
        offsets = None
        gcounts = None
    else:
        offsets = (jnp.cumsum(gcounts) - gcounts).astype(jnp.int32)

    return BinnedGaussians(
        sorted_tile=s_tile,
        sorted_gid=jax.lax.stop_gradient(s_gid),
        ranges=jax.lax.stop_gradient(ranges),
        num_intersections=total,
        overflow=overflow,
        sorted_gidk=None if s_gidk is None else jax.lax.stop_gradient(s_gidk),
        gauss_offsets=None if offsets is None else jax.lax.stop_gradient(offsets),
        gauss_counts=None if gcounts is None else jax.lax.stop_gradient(gcounts),
    )


def features_f32(proj: ProjectedGaussians, cfg: RenderConfig) -> jnp.ndarray:
    """The (NUM_FEATURES, N) f32 per-Gaussian render-feature table in FEAT_*
    row order (what the reference packs as its 64-B GaussianData records,
    reference: src/process_gaussians.wgsl:8-15)."""
    return jnp.stack(
        [
            proj.uv[:, 0] * cfg.width,
            proj.uv[:, 1] * cfg.height,
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            proj.color[:, 0],
            proj.color[:, 1],
            proj.color[:, 2],
            proj.opacity,
        ],
        axis=0,
    ).astype(jnp.float32)


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
    feats = features_f32(proj, cfg)
    if binned.sorted_gidk is None:
        # 'scatter' binning: plain differentiable gather (autodiff transpose
        # is an XLA scatter-add -- slow on TPU, but this mode is not the
        # production path).
        gid = jnp.where(binned.sorted_gid < 0, feats.shape[1], binned.sorted_gid)
        return jnp.take(feats, gid, axis=1, mode="fill", fill_value=0.0)
    segsum = cfg.segment_sum
    if segsum == "pallas" and cfg.pallas_interpret:
        segsum = "pallas_interpret"
    return _gather_slots(
        kmax_eff(cfg), cfg.gather_backward, cfg.grad_readout,
        segsum, feats, binned.sorted_gid, binned.sorted_gidk,
        binned.gauss_offsets, binned.gauss_counts,
    )


def _pack_bf16_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(F, M) f32 -> (ceil(F/2), M) f32, each lane carrying two bf16-rounded
    rows. Used to halve the per-ELEMENT cost of gathers/sorts over gradient
    streams (PROFILE.md: element movement, not bandwidth, is the cost).

    LAYOUT CONTRACT (change all sites together): pair i packs row 2i in the
    LOW 16 bits and row 2i+1 in the HIGH bits, RNE-rounded. Implemented
    bit-compatibly in four places: here/_unpack_bf16_pairs (XLA),
    ops/pallas/segsum.py _kernel_packed (in-VMEM), ops/stream16.py
    pack_stream/unpack_block (rows 2+), and ops/pallas/raster.py
    _pack_grad_block/_unpack_grad_block (in-VMEM). Packed arrays must be
    TYPED int32 in any context XLA might route through compute ops --
    zero-high pairs are f32 denormals and TPU flushes them."""
    f, m = x.shape
    if f % 2:
        x = jnp.concatenate([x, jnp.zeros((1, m), x.dtype)])
    b = jnp.moveaxis(x.astype(jnp.bfloat16).reshape(-1, 2, m), 1, -1)
    return jax.lax.bitcast_convert_type(b, jnp.float32)  # (pairs, M)


def _unpack_bf16_pairs(p: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of _pack_bf16_pairs: (pairs, M) f32 -> (f, M) f32."""
    b = jax.lax.bitcast_convert_type(p, jnp.bfloat16)  # (pairs, M, 2)
    x = jnp.moveaxis(b, -1, 1).reshape(2 * p.shape[0], -1)
    return x[:f].astype(jnp.float32)


# NOTE on gather strategy (measured on v5e, 10 rows x 4.5M columns):
# XLA TPU's flat 1-D take has a fast path that is ~22x quicker than the
# 2-D multi-row gather (3.3 ms vs 71 ms) -- but its runtime is strongly
# DATA-DEPENDENT: it degrades ~300x on locally-monotone index streams
# (tile-sorted gids: 927 ms; the real candidate-order permutation: 342 ms)
# where the 2-D general gather stays flat (39-83 ms regardless of data).
# Every index stream in this pipeline is sorted or mostly-monotone, so the
# 2-D form wins everywhere despite the tempting microbenchmark.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _gather_slots(kmax: int, strategy: str, readout: str, segsum: str, feats,
                  gid, gidk, offsets, counts):
    """Gather per-Gaussian features into slot order with a sort-based VJP.

    The autodiff transpose of this gather is a scatter-add of max_I rows into
    N -- measured at ~2.7 s for 33M rows on a v5e chip (XLA TPU scatter
    serializes). The hand-written backward uses only one variadic sort and
    dense reductions (all fast on TPU):
      1. one lax.sort keyed by gidk = gid << KBITS | k carrying the slot
         gradient rows as values -> gradients in gid-major runs,
      2. segmented suffix-sum by doubling (ceil(log2 K_max) shift+add
         passes) leaves every Gaussian's full gradient at its run start,
      3. one (F, N) take at gauss_offsets (exclusive cumsum of the
         per-Gaussian candidate counts) reads the runs out.
    Requires every valid candidate to be present in the stream, which holds
    whenever the overflow flag is clear."""
    g = jnp.where(gid < 0, feats.shape[1], gid)
    # Zero column + clip instead of mode='fill': fill materializes a
    # (max_I,) pred + select over the gathered stream (~1 ms + a 4.1M pred
    # copy in the profile); the padded table gets the same zero features
    # (zero opacity -> no contribution) for free.
    feats_pad = jnp.pad(feats, ((0, 0), (0, 1)))
    return jnp.take(feats_pad, g, axis=1, mode="clip")


def _gather_slots_fwd(kmax: int, strategy: str, readout: str, segsum: str,
                      feats, gid, gidk, offsets, counts):
    out = _gather_slots(
        kmax, strategy, readout, segsum, feats, gid, gidk, offsets, counts
    )
    return out, (gidk, offsets, counts)


def packed_grad_reduce(kmax: int, segsum: str, key, xp_i32, f: int, offsets,
                       counts):
    """Reduce an int32 bf16-pair-packed slot-gradient stream to per-Gaussian
    (f, N) f32 gradients: one (1 + P)-operand sort to gid-major runs, the
    packed Pallas segsum kernel, and the pair-packed run-start take. Used by
    the 'bf16' gather backward (which packs dslot first) and the packed16
    raster backward (whose Pallas kernel emits dslot already packed)."""
    from gsplat_tpu.ops.pallas.segsum import segmented_suffix_sum

    m_i = key.shape[0]
    p = xp_i32.shape[0]
    sorted_all = jax.lax.sort(
        (key,) + tuple(xp_i32[i] for i in range(p)), num_keys=1,
        is_stable=False,
    )
    rows = jax.lax.shift_right_logical(sorted_all[0], jnp.int32(_kbits(kmax)))
    xpacked = jnp.stack(sorted_all[1:])  # (P, m_i) int32
    xsum = segmented_suffix_sum(
        xpacked, rows, kmax=kmax, packed=True,
        interpret=segsum.endswith("interpret"),
    )  # (P, M_pad) int32 packed bf16 run totals
    offs = jnp.clip(offsets, 0, m_i - 1)
    dgauss = _unpack_bf16_pairs(
        jax.lax.bitcast_convert_type(
            jnp.take(xsum, offs, axis=1), jnp.float32
        ),
        f,
    )
    return dgauss * (counts > 0)[None, :].astype(dgauss.dtype)


def _gather_slots_bwd(kmax: int, strategy: str, readout: str, segsum: str,
                      res, dslot):
    """Slot gradients -> per-Gaussian gradients without any scatter; see
    _gather_slots docstring. The run grouping comes straight from the gidk
    value (gid = gidk >> KBITS); no per-tier metadata is needed."""
    gidk, offsets, counts = res
    f = dslot.shape[0]
    m_i = gidk.shape[0]
    key = jnp.where(gidk >= 0, gidk, jnp.int32(2**31 - 1))
    if strategy == "permute":
        # Compile-friendly variant (cfg.gather_backward='permute'): a
        # 2-operand sort producing the permutation, then one (F, m_i) 2-D
        # take. ~40 ms/iter slower than the variadic sort at 4.5M slots but
        # skips the sort expander's 11-operand blowup that dominates the
        # ~19-minute cold compile.
        s_key, pos = jax.lax.sort_key_val(
            key, jnp.arange(m_i, dtype=jnp.int32), is_stable=False
        )
        rows = jax.lax.shift_right_logical(s_key, jnp.int32(_kbits(kmax)))
        x = jnp.take(dslot, pos, axis=1)  # (F, m_i), gid-major run order
    elif strategy == "c64":
        # Pair the f32 gradient rows into complex64 sort values: same exact
        # f32 payload, but ceil(F/2)+1 sort operands instead of F+1 -- the
        # sort expander's cold-compile blowup scales with operand count
        # (the 11-operand form dominates the ~19-minute compile), and the
        # sorted bytes per lane are identical.
        pairs = (f + 1) // 2
        xpad = (
            dslot if f % 2 == 0
            else jnp.concatenate([dslot, jnp.zeros((1, m_i), dslot.dtype)])
        )
        cvals = jax.lax.complex(xpad[0::2], xpad[1::2])  # (pairs, m_i)
        sorted_all = jax.lax.sort(
            (key,) + tuple(cvals[i] for i in range(pairs)), num_keys=1,
            is_stable=False,
        )
        rows = jax.lax.shift_right_logical(sorted_all[0],
                                           jnp.int32(_kbits(kmax)))
        cs = jnp.stack(sorted_all[1:])  # (pairs, m_i)
        x = jnp.stack([jnp.real(cs), jnp.imag(cs)], axis=1).reshape(
            2 * pairs, m_i
        )[:f]
    elif strategy == "bf16":
        # Mixed-precision fast path (requires segment_sum='pallas' and
        # grad_readout='bf16', enforced by RenderConfig): per-slot gradient
        # rows are bf16-rounded and PAIR-PACKED before the sort, so the sort
        # moves ceil(F/2)+1 operands of real payload (vs F+1) -- ~18 ms vs
        # 31 ms at 4.1M lanes -- and the packed segsum kernel unpacks in
        # VMEM, sums in f32, and re-packs, halving its DMA too. The packed
        # rows ride as complex64 sort values for the same compile-time win
        # as 'c64'. Rounds each slot's gradient (not just the final sum) to
        # bf16: ~0.4% relative noise per element, standard mixed-precision
        # territory; use 'c64'/'variadic' + grad_readout='f32' for exact.
        from gsplat_tpu.ops.pallas.segsum import segmented_suffix_sum

        # The packed pairs ride as INT32 sort values, not f32/complex64: a
        # packed lane whose high bf16 is zero is an f32 DENORMAL bit
        # pattern, and TPU compute ops flush denormals to zero (measured:
        # complex64-wrapped packed rows came back with their low halves
        # zeroed -- the opacity row, whose pair partner is the zero pad
        # row). Integer lanes pass through the sort bit-exactly.
        xp = jax.lax.bitcast_convert_type(
            _pack_bf16_pairs(dslot), jnp.int32
        )  # (P, m_i) int32 lanes = bf16 pairs
        dgauss = packed_grad_reduce(
            kmax, segsum, key, xp, NUM_FEATURES, offsets, counts
        )
        return dgauss, None, None, None, None
    else:
        # One variadic sort carrying the gradient rows as values, instead of
        # sort_key_val + a (F, m_i) permutation gather: the 11-operand sort
        # measures 50 ms vs 93 ms for sort+2-D-take at 4.5M slots (the
        # permutation is mostly monotone, the worst case for the TPU gather).
        sorted_all = jax.lax.sort(
            (key,) + tuple(dslot[i] for i in range(f)), num_keys=1,
            is_stable=False,  # valid keys are unique; no iota tiebreak operand
        )
        rows = jax.lax.shift_right_logical(sorted_all[0],
                                           jnp.int32(_kbits(kmax)))
        # Stacking into (F, m_i) costs a 1-D -> tiled relayout (~19 ms in the
        # profile) but keeping rows separate is far worse (10 unfused 1-D
        # passes: 218 ms vs 82 ms measured end-to-end) -- the 2-D forms fuse.
        x = jnp.stack(sorted_all[1:])  # (F, m_i), gid-major run order

    if segsum.startswith("pallas"):
        # One-pass Pallas segmented suffix-sum (doubling done per-block in
        # VMEM, cross-block runs chained through a carry) instead of
        # log2(K_max) full-stream XLA passes. May return a block-padded
        # stream; run starts are unaffected.
        from gsplat_tpu.ops.pallas.segsum import segmented_suffix_sum

        x = segmented_suffix_sum(
            x, rows, kmax=kmax, interpret=segsum.endswith("interpret")
        )
    else:
        s = 1
        while s < kmax and s < m_i:  # shifts >= m_i can't pair two slots
            rows_sh = jnp.concatenate(
                [rows[s:], jnp.full((s,), -1, rows.dtype)]
            )
            same = (rows_sh == rows)[None, :].astype(x.dtype)
            x_sh = jnp.concatenate(
                [x[:, s:], jnp.zeros((f, s), x.dtype)], axis=1
            )
            x = x + x_sh * same
            s <<= 1

    offs = jnp.clip(offsets, 0, m_i - 1)
    if readout == "bf16":
        # Per-Gaussian sums bf16-rounded BEFORE the run-start take: halves
        # the take's element count (the suffix sums are exact f32; only the
        # final gradient is rounded, exactly like casting grads to bf16 in
        # any mixed-precision trainer).
        # int32-typed so no compute op can ever flush zero-high pairs
        # (f32-denormal bit patterns) -- see the 'bf16' strategy above.
        xp = jax.lax.bitcast_convert_type(_pack_bf16_pairs(x), jnp.int32)
        dgauss = _unpack_bf16_pairs(
            jax.lax.bitcast_convert_type(
                jnp.take(xp, offs, axis=1), jnp.float32
            ),
            f,
        )
    else:
        dgauss = jnp.take(x, offs, axis=1)  # (F, N): run sum at run start
    dgauss = dgauss * (counts > 0)[None, :].astype(dgauss.dtype)
    return dgauss, None, None, None, None


_gather_slots.defvjp(_gather_slots_fwd, _gather_slots_bwd)
