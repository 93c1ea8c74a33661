"""Gaussian-sharded multi-chip rendering (memory scaling for 6M+ splats).

The reference is a single-device browser app with no distribution of any kind
(SURVEY.md section 2, "Parallelism components"); this is the BASELINE.json
config-5 scaling mode: the scene's N axis is sharded over the mesh, so no
chip ever holds (or optimizes) more than N/D Gaussians.

Design -- the 3DGS analogue of expert/context parallelism, with one
`all_to_all` as the only collective in the forward pass:

  Every device owns BOTH a Gaussian shard (N/D splats) and a tile shard
  (contiguous tile rows of the image, same partition as
  sharding.render_tile_sharded). Per device:

  1. project its local Gaussians (N/D work),
  2. bin + depth-sort them over the GLOBAL tile grid (per-shard sort --
     sorts are O((N/D) log) instead of O(N log)),
  3. re-space the sorted stream into D fixed-capacity blocks, one per
     destination tile shard (pure gather; the sorted-by-tile stream is
     already segmented by destination because tile shards are contiguous),
  4. exchange blocks with `lax.all_to_all` -- the per-tile fragment
     exchange; feature payloads ride along so no second lookup is needed,
  5. merge the D received depth-sorted segments with one packed-key
     sort over local tiles (order-correct composite: the merged stream is
     globally depth-ordered per tile, so blending is EXACT, not a
     per-shard (color, T) approximation),
  6. blend its tile rows exactly like the single-device pipeline.

  Backward: ordering is a stop-gradient permutation; gradients flow
  image -> received features -> (all_to_all transpose, which XLA emits as
  the reverse all_to_all) -> sent features -> local Gaussians. Each chip
  ends up with gradients for exactly its own N/D parameters -- no psum over
  parameters at all (contrast tile-sharded mode, which psums full-N grads).

Capacity discipline: `per_dest_capacity` is the static per-(source, dest)
fragment budget; the exchange is D x per_dest_capacity both ways. Overflow
(any source->dest segment exceeding it) is flagged, mirroring the
single-device max_intersections policy.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import GaussianScene
from gsplat_tpu.ops.binning import (
    PADDED_FEATURES,
    _align_stream,
    bin_gaussians,
    depth_bits_for,
    gather_features,
    pack_tile_depth_key,
)
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.parallel.sharding import local_tile_cfg


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _blocks_gather(td: int, cap: int, num_shards: int, feats, idx,
                   sorted_tile, seg_start, seg_end):
    """take(feats, idx) whose VJP is a GATHER, not a scatter: the slot of a
    stream position p is reconstructed arithmetically (dest shard from the
    sorted tile id, offset from the destination's segment start), so the
    transpose never touches XLA's pathologically slow TPU scatter."""
    return jnp.take(feats, idx, axis=1, mode="fill", fill_value=0.0)


def _blocks_gather_fwd(td, cap, num_shards, feats, idx, sorted_tile,
                       seg_start, seg_end):
    out = _blocks_gather(td, cap, num_shards, feats, idx, sorted_tile,
                         seg_start, seg_end)
    return out, (feats.shape[1], sorted_tile, seg_start, seg_end)


def _blocks_gather_bwd(td, cap, num_shards, res, dblocks):
    max_i, sorted_tile, seg_start, seg_end = res
    p = jnp.arange(max_i, dtype=jnp.int32)
    # dest shard of stream position p from its (global-grid) tile id
    # (static-divisor integer division: strength-reduced by XLA).
    dest = sorted_tile // td
    destc = jnp.clip(dest, 0, num_shards - 1)
    within = p - jnp.take(seg_start, destc)
    slot = destc * cap + within
    ok = (
        (dest < num_shards)
        & (within >= 0)
        & (within < cap)
        & (p < jnp.take(seg_end, destc))
    )
    picked = jnp.take(
        dblocks, jnp.clip(slot, 0, dblocks.shape[1] - 1), axis=1
    )
    dfeats = jnp.where(ok[None, :], picked, 0.0)
    return dfeats, None, None, None, None


_blocks_gather.defvjp(_blocks_gather_fwd, _blocks_gather_bwd)


def _block_layout(ranges_g, num_shards: int, td: int, cap: int):
    """Destination-block slot map of the globally-sorted local stream:
    block slot s of destination shard d = s // cap reads stream position
    src_pos[s]; the seg boundaries partition the full sorted stream because
    contiguous tile shards cover the whole grid. Returns (seg_start,
    seg_end, dest, src_pos, valid, overflow)."""
    seg_start = ranges_g[jnp.arange(num_shards) * td]          # (D,)
    seg_end = ranges_g[(jnp.arange(num_shards) + 1) * td]      # (D,)
    overflow = jnp.any(seg_end - seg_start > cap)
    s = jnp.arange(num_shards * cap, dtype=jnp.int32)
    dest = s // cap
    src_pos = seg_start[dest] + s % cap                        # (D*cap,)
    valid = src_pos < seg_end[dest]
    return seg_start, seg_end, dest, src_pos, valid, overflow


def _block_merge_keys(proj, binned, td: int, dest, src_pos, valid):
    """Per-block-slot u32 merge key (local_tile << depth_bits | depth_q),
    0xFFFFFFFF for invalid slots. Depth is a merge-ordering key only (no
    longer a gathered feature row; ops/binning.py NUM_FEATURES note):
    gathered per slot explicitly, outside the differentiable path."""
    src_c = jnp.minimum(src_pos, binned.sorted_tile.shape[0] - 1)
    tile = jnp.take(binned.sorted_tile, src_c, axis=0)
    tile_blocks = jnp.where(valid, tile - dest * td, td).astype(jnp.int32)
    n = proj.depth.shape[0]
    depth_slots = jnp.take(
        jax.lax.stop_gradient(proj.depth),
        jnp.clip(binned.sorted_gid, 0, n - 1),
    )
    depth_row = jnp.where(valid, jnp.take(depth_slots, src_c), 0.0)
    return jnp.where(
        tile_blocks >= td,
        jnp.uint32(0xFFFFFFFF),
        pack_tile_depth_key(tile_blocks, depth_row, td),
    )


def _fragment_blocks(proj, binned, cfg: RenderConfig, td: int, num_shards: int,
                     cap: int, seg_start, seg_end, src_pos, valid):
    """Re-space the globally-sorted local f32 feature stream into D
    fixed-size destination blocks (F, D*cap)."""
    feats = gather_features(proj, binned, cfg)                 # (F, max_I)
    idx = jnp.where(valid, src_pos, feats.shape[1])
    return _blocks_gather(
        td, cap, num_shards, feats, idx, binned.sorted_tile, seg_start,
        seg_end,
    )


@jax.custom_vjp
def _perm_gather(recv_feats, gid, present):
    """take(recv_feats, gid) for an injective slot permutation, with a
    sort-based VJP: received slot r's gradient sits at rank(r) of the
    final stream sorted by source slot id -- rank is a plain cumsum of the
    present mask, so the transpose is sort + gather, never a scatter."""
    m = recv_feats.shape[1]
    return jnp.take(
        recv_feats, jnp.where(gid < 0, m, gid), axis=1, mode="fill",
        fill_value=0.0,
    )


def _perm_gather_fwd(recv_feats, gid, present):
    return _perm_gather(recv_feats, gid, present), (gid, present)


def _perm_gather_bwd(res, dout):
    gid, present = res
    m = present.shape[0]
    key = jnp.where(gid >= 0, gid, jnp.int32(2**31 - 1))
    _, pos = jax.lax.sort_key_val(
        key, jnp.arange(gid.shape[0], dtype=jnp.int32)
    )
    dsorted = jnp.take(dout, pos, axis=1)  # columns ordered by recv slot id
    rank = jnp.cumsum(present) - 1
    picked = jnp.take(
        dsorted, jnp.clip(rank, 0, dsorted.shape[1] - 1), axis=1
    )
    drecv = jnp.where(present[None, :], picked, 0.0)
    return drecv, None, None


_perm_gather.defvjp(_perm_gather_fwd, _perm_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _a2a_features_bf16(feat_blocks, axis_name: str, cfg: RenderConfig):
    """all_to_all of the (F, D*cap) feature payload packed to 5 int32 rows
    on the wire (int32, never f32: zero-high bf16 pairs are f32 denormals
    -- see ops/binning.py). The FORWARD uses the stream16 packing (means as
    u16 fixed-point pairs over the GLOBAL image extent -- bf16 means would
    be ~8 px coarse at 1080p -- conic/color/opacity as bf16 pairs); the
    gradient transpose uses plain bf16 pairs (gradients are small floats,
    not pixel coordinates). ~45% fewer exchange bytes each way."""
    from gsplat_tpu.ops.stream16 import pack_stream, unpack_block

    recv = jax.lax.all_to_all(
        pack_stream(feat_blocks, cfg), axis_name, split_axis=1,
        concat_axis=1, tiled=True,
    )
    return unpack_block(recv, cfg)


def _a2a_features_bf16_fwd(feat_blocks, axis_name: str, cfg: RenderConfig):
    return _a2a_features_bf16(feat_blocks, axis_name, cfg), None


def _a2a_features_bf16_bwd(axis_name: str, cfg: RenderConfig, res, dout):
    from gsplat_tpu.ops.binning import _pack_bf16_pairs, _unpack_bf16_pairs

    # The tiled all_to_all over one axis is its own transpose (block i of
    # source s becomes block s of destination i, an involution).
    packed = jax.lax.bitcast_convert_type(
        _pack_bf16_pairs(dout), jnp.int32
    )
    recv = jax.lax.all_to_all(
        packed, axis_name, split_axis=1, concat_axis=1, tiled=True
    )
    return (
        _unpack_bf16_pairs(
            jax.lax.bitcast_convert_type(recv, jnp.float32), dout.shape[0]
        ),
    )


_a2a_features_bf16.defvjp(_a2a_features_bf16_fwd, _a2a_features_bf16_bwd)


def _merge_order(recv_key, lcfg: RenderConfig, align: int):
    """Merge-sort metadata for D received depth-sorted fragments: recv_key
    is the packed (local_tile << depth_bits | depth_q) u32 merge key,
    computed at the SOURCE and exchanged instead of separate tile + depth
    rows (half the metadata bytes; bit-identical merge order). Returns
    (s_perm merged-pos -> recv-slot with -1 pad, present recv-slot
    validity, ranges (td+1,), overflow) -- integers only, shared by the f32
    and packed16 paths."""
    m = recv_key.shape[0]
    td = lcfg.num_tiles
    depth_bits = depth_bits_for(td)
    perm = jnp.arange(m, dtype=jnp.int32)
    s_key, s_perm = jax.lax.sort_key_val(recv_key, perm)
    s_tile = jnp.minimum(
        jax.lax.shift_right_logical(s_key, jnp.uint32(depth_bits)),
        jnp.uint32(td),
    ).astype(jnp.int32)
    s_perm = jnp.where(s_tile < td, s_perm, -1)
    ranges = jnp.searchsorted(
        s_tile, jnp.arange(td + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    overflow = jnp.zeros((), bool)
    if align > 1:
        s_tile, s_perm, ranges, total_padded = _align_stream(
            s_tile, s_perm, ranges, m, td, align
        )
        overflow = total_padded > m
    # every valid received slot lands in the stream
    present = recv_key != jnp.uint32(0xFFFFFFFF)
    return s_perm, present, jax.lax.stop_gradient(ranges), overflow


def _merge_received(recv_feats, recv_key, lcfg: RenderConfig, align: int):
    """Merge D depth-sorted fragments into one per-tile depth-ordered
    feature stream + ranges for the local tile rows (f32 feature path)."""
    s_perm, present, ranges, overflow = _merge_order(recv_key, lcfg, align)
    feats = _perm_gather(recv_feats, s_perm, present)
    return feats, ranges, overflow


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _p16_shard_raster(axis_name: str, src_cfg: RenderConfig,
                      lcfg: RenderConfig, feats9, block_gid, gidk_block,
                      offsets, counts, s_perm, present, ranges_l,
                      tile_offset):
    """packed16 fragment exchange + merge + raster as ONE fused custom_vjp
    (an int32 packed stream cannot carry JAX cotangents between separate
    VJPs -- same reason ops/stream16.rasterize_packed16 is fused).

    Forward: quantize the per-Gaussian features once (stream16.pack_stream,
    GLOBAL quant ranges), compose the slot gather and the destination-block
    re-space into a single (5, D*cap) int32 gather by Gaussian id, exchange
    5 int32 rows on the wire (u16 fixed-point means -- finer than the bf16
    wire format -- and bf16-pair conic/color/opacity), permutation-gather
    the merge order, and feed the packed merged stream straight to the
    raster kernel, which unpacks in VMEM.

    Backward: raster bwd emits per-merged-slot gradients (bf16-pair-packed
    int32 on the Pallas path); the merge permutation is inverted with one
    sort (never a scatter), the tiled all_to_all transposes itself (an
    involution), and the received block slots reduce DIRECTLY to
    per-Gaussian gradients via the gidk sort + segmented suffix-sum --
    the (F, max_I) stream intermediate of the f32 path never exists.

    block_gid: (D*cap,) int32 Gaussian id per outgoing block slot
      (N_local = invalid); gidk_block: matching gid<<KBITS|k (-1 invalid);
    s_perm: (D*cap,) merged-position -> received-slot permutation (-1 pad);
    present: (D*cap,) bool received-slot validity; ranges_l: (td+1,) local
    tile ranges of the merged stream."""
    out, _ = _p16_fwd_impl(axis_name, src_cfg, lcfg, feats9, block_gid,
                           s_perm, ranges_l, tile_offset)
    return out


def _p16_fwd_impl(axis_name, src_cfg, lcfg, feats9, block_gid, s_perm,
                  ranges_l, tile_offset):
    from gsplat_tpu.ops.stream16 import pack_stream, unpack_block

    packed = pack_stream(feats9, src_cfg)            # (5, N_local) int32
    # Zero pad column: an all-zero packed column unpacks to zero opacity,
    # so invalid slots cannot contribute (binning._gather_slots note).
    packed_pad = jnp.pad(packed, ((0, 0), (0, 1)))
    blocks = jnp.take(packed_pad, block_gid, axis=1, mode="clip")
    recv = jax.lax.all_to_all(
        blocks, axis_name, split_axis=1, concat_axis=1, tiled=True
    )                                                # (5, D*cap) int32
    m = recv.shape[1]
    recv_pad = jnp.pad(recv, ((0, 0), (0, 1)))
    merged = jnp.take(
        recv_pad, jnp.where(s_perm < 0, m, s_perm), axis=1, mode="clip"
    )
    offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)
    if lcfg.impl == "pallas":
        from gsplat_tpu.ops.pallas import raster as R

        (image, trans), res = R._rasterize_fwd(merged, ranges_l, offset, lcfg)
        return (image, trans), res
    merged9 = unpack_block(merged, lcfg)
    from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

    image, trans = rasterize_tiles_jnp(
        merged9, ranges_l, lcfg, tile_offset=offset[0]
    )
    return (image, trans), (merged9, ranges_l, offset)


def _p16_shard_raster_fwd(axis_name, src_cfg, lcfg, feats9, block_gid,
                          gidk_block, offsets, counts, s_perm, present,
                          ranges_l, tile_offset):
    out, raster_res = _p16_fwd_impl(
        axis_name, src_cfg, lcfg, feats9, block_gid, s_perm, ranges_l,
        tile_offset,
    )
    return out, (raster_res, gidk_block, offsets, counts, s_perm, present)


def _p16_shard_raster_bwd(axis_name, src_cfg, lcfg, residuals, grads):
    from gsplat_tpu.ops.binning import (
        NUM_FEATURES,
        _gather_slots_bwd,
        packed_grad_reduce,
    )

    raster_res, gidk_block, offsets, counts, s_perm, present = residuals
    if lcfg.impl == "pallas":
        from gsplat_tpu.ops.pallas import raster as R

        dmerged = R._rasterize_bwd(lcfg, raster_res, grads)[0]
    else:
        merged9, ranges_l, offset = raster_res
        from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

        _, vjp = jax.vjp(
            lambda s: rasterize_tiles_jnp(
                s, ranges_l, lcfg, tile_offset=offset[0]
            ),
            merged9,
        )
        dmerged = vjp(grads)[0]
    # Un-merge: transpose of the injective take-by-s_perm -- received slot
    # r's gradient sits at rank(r) of the merged stream sorted by source
    # slot id (_perm_gather_bwd's sort-based construction; works unchanged
    # on the int32 bf16-pair-packed gradient rows).
    key = jnp.where(s_perm >= 0, s_perm, jnp.int32(2**31 - 1))
    _, pos = jax.lax.sort_key_val(
        key, jnp.arange(s_perm.shape[0], dtype=jnp.int32)
    )
    dsorted = jnp.take(dmerged, pos, axis=1)
    rank = jnp.cumsum(present) - 1
    picked = jnp.take(
        dsorted, jnp.clip(rank, 0, dsorted.shape[1] - 1), axis=1
    )
    zero = jnp.zeros((), dmerged.dtype)
    drecv = jnp.where(present[None, :], picked, zero)
    # The tiled all_to_all over one axis is its own transpose. int32 lanes
    # pass through bit-exactly (bf16 pairs as f32 would be denormal-flushed).
    dblocks = jax.lax.all_to_all(
        drecv, axis_name, split_axis=1, concat_axis=1, tiled=True
    )
    # Block slots -> per-Gaussian gradients: block slots cover every valid
    # stream position exactly once (the seg boundaries partition the sorted
    # stream; overflow truncation is flagged by the caller), so the gidk
    # sort + segmented suffix-sum reduce applies directly.
    segsum = src_cfg.segment_sum
    if segsum == "pallas" and src_cfg.pallas_interpret:
        segsum = "pallas_interpret"
    keyg = jnp.where(gidk_block >= 0, gidk_block, jnp.int32(2**31 - 1))
    if dblocks.dtype == jnp.int32:
        dfeats = packed_grad_reduce(
            src_cfg.max_tiles_per_gaussian, segsum, keyg, dblocks,
            NUM_FEATURES, offsets, counts,
        )
    else:
        dfeats = _gather_slots_bwd(
            src_cfg.max_tiles_per_gaussian, src_cfg.gather_backward,
            src_cfg.grad_readout, segsum, (keyg, offsets, counts), dblocks,
        )[0]
    return (dfeats,) + (None,) * 8


_p16_shard_raster.defvjp(_p16_shard_raster_fwd, _p16_shard_raster_bwd)


def _src_cfg_for(cfg: RenderConfig) -> RenderConfig:
    """Per-source binning config: no pre-alignment (alignment happens after
    the exchange) and the single-u32-key path so the per-tile order is the
    same quantized order the merge sort uses."""
    return dataclasses.replace(
        cfg,
        binning="tiered" if cfg.binning == "tiered" else "packed",
        stream_align=1,
    )


def _shard_render(scene, camera, cfg: RenderConfig, src_cfg: RenderConfig,
                  lcfg: RenderConfig, d: int, cap: int, align: int,
                  axis_name: str, uv_tap=None):
    """Per-shard forward body (called INSIDE shard_map): local projection,
    per-shard sort, all_to_all fragment exchange, order-correct merge, local
    tile-band blend. Returns (image_band, trans_band, overflow, visible)
    where visible is the (N_local,) bool Gaussian-touched->=1-tile mask (the
    densification visibility denominator) and overflow is this shard's flag
    (caller pmax-reduces)."""
    idx = jax.lax.axis_index(axis_name)
    td = lcfg.num_tiles
    proj = project_gaussians(scene, camera, src_cfg, uv_tap=uv_tap)
    binned = bin_gaussians(proj, src_cfg)
    seg_start, seg_end, dest, src_pos, valid, ovf = _block_layout(
        binned.ranges, d, td, cap
    )
    # Merge key computed at the SOURCE: one u32 row on the wire instead of
    # tile (i32) + depth (f32).
    key_blocks = _block_merge_keys(proj, binned, td, dest, src_pos, valid)
    recv_key = jax.lax.all_to_all(
        key_blocks, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    s_perm, present, ranges, merge_ovf = _merge_order(recv_key, lcfg, align)
    tile_offset = idx * td
    if cfg.stream_format == "packed4":
        raise ValueError(
            "the Gaussian-sharded fragment-exchange wire format is the "
            "5-row packed16 stream (or f32); use stream_format='packed16' "
            "on this path"
        )
    if cfg.stream_format == "packed16":
        # Production fast path: quantize once per shard, exchange 5 int32
        # rows, raster the packed merged stream (fused custom_vjp above).
        from gsplat_tpu.ops.binning import features_f32

        feats9 = features_f32(proj, src_cfg)
        src_c = jnp.minimum(src_pos, binned.sorted_gid.shape[0] - 1)
        g = jnp.take(binned.sorted_gid, src_c)
        block_gid = jnp.where(valid & (g >= 0), g, feats9.shape[1])
        gidk_block = jnp.where(
            valid, jnp.take(binned.sorted_gidk, src_c), -1
        )
        image, trans = _p16_shard_raster(
            axis_name, src_cfg, lcfg, feats9, block_gid, gidk_block,
            binned.gauss_offsets, binned.gauss_counts, s_perm, present,
            ranges, tile_offset,
        )
    else:
        feat_blocks = _fragment_blocks(
            proj, binned, src_cfg, td, d, cap, seg_start, seg_end, src_pos,
            valid,
        )
        # The fragment exchange: block i on source s becomes block s on
        # destination i. Feature payload (F, D*cap) splits on the slot axis.
        if cfg.fragment_format == "bf16":
            recv_feats = _a2a_features_bf16(feat_blocks, axis_name, cfg)
        else:
            recv_feats = jax.lax.all_to_all(
                feat_blocks, axis_name, split_axis=1, concat_axis=1,
                tiled=True,
            )
        feats = _perm_gather(recv_feats, s_perm, present)
        if cfg.impl == "pallas":
            from gsplat_tpu.ops.pallas.raster import rasterize_pallas

            image, trans = rasterize_pallas(
                feats, ranges, lcfg, tile_offset=tile_offset
            )
        else:
            from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

            image, trans = rasterize_tiles_jnp(
                feats, ranges, lcfg, tile_offset=tile_offset
            )
    ovf = ovf | binned.overflow | merge_ovf
    visible = jax.lax.stop_gradient(proj.counts > 0)
    return image, trans, ovf, visible


def fragment_occupancy(
    scene: GaussianScene,
    camera: Camera,
    cfg: RenderConfig,
    num_shards: int,
    per_dest_capacity: int | None = None,
) -> dict:
    """Capacity report for the fragment exchange on a given scene+camera:
    the (src shard, dest shard) segment-length matrix against
    `per_dest_capacity` -- the Gaussian-sharded analogue of
    ops/binning.tier_occupancy (round-2 verdict weak #3). Host-side
    diagnostic; no mesh needed (each source shard is binned sequentially,
    so it also sizes meshes bigger than the devices at hand).

    Returns {"per_dest_capacity", "max_segment",
    "suggested_per_dest_capacity" (1.15x the measured max),
    "occupancy" (max/capacity), "total_intersections", "overflow",
    "segment_quantiles", "per_dest_totals"}."""
    import numpy as np

    d = num_shards
    c = scene.num_gaussians
    if c % d != 0:
        raise ValueError(f"capacity {c} not divisible by {d} shards")
    n_local = c // d
    src_cfg = _src_cfg_for(cfg)
    lcfg = local_tile_cfg(cfg, d)
    td = lcfg.num_tiles

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _shard_ranges(scene_s, camera, cfg):
        proj = project_gaussians(scene_s, camera, cfg)
        return bin_gaussians(proj, cfg).ranges

    seg = np.zeros((d, d), np.int64)
    for s in range(d):
        scene_s = jax.tree.map(
            lambda x: x[s * n_local : (s + 1) * n_local]
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == c
            else x,
            scene,
        )
        r = np.asarray(_shard_ranges(scene_s, camera, src_cfg))
        idx = np.arange(d)
        seg[s] = r[(idx + 1) * td] - r[idx * td]
    cap = per_dest_capacity or max(cfg.max_intersections // d, 1)
    mx = int(seg.max())
    return {
        "per_dest_capacity": cap,
        "max_segment": mx,
        "suggested_per_dest_capacity": int(mx * 1.15),
        "occupancy": round(mx / cap, 4),
        "total_intersections": int(seg.sum()),
        "overflow": bool(mx > cap),
        "segment_quantiles": {
            str(q): int(np.quantile(seg, q)) for q in (0.5, 0.9, 1.0)
        },
        "per_dest_totals": seg.sum(axis=0).tolist(),
    }


def render_gaussian_sharded(
    scene: GaussianScene,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    axis_name: str = "gauss",
    per_dest_capacity: int | None = None,
    background: jnp.ndarray | None = None,
):
    """Render with the scene's N axis sharded over `mesh[axis_name]`.

    `scene` arrays must be shardable on axis 0 by the mesh axis size (pad the
    scene with transparent Gaussians via GaussianScene.pad_to if needed).
    Returns (image (H, W, 3), transmittance (H, W), overflow ()); the image
    comes out sharded over rows, like render_tile_sharded.
    """
    d = mesh.shape[axis_name]
    lcfg = local_tile_cfg(cfg, d)
    cap = per_dest_capacity or max(cfg.max_intersections // d, 1)
    src_cfg = _src_cfg_for(cfg)
    align = cfg.stream_align or 1

    def shard_fn(scene, camera):
        image, trans, ovf, _ = _shard_render(
            scene, camera, cfg, src_cfg, lcfg, d, cap, align, axis_name
        )
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), axis_name)
        return image, trans, ovf

    img, trans, ovf = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(P(axis_name, None, None), P(axis_name, None), P()),
        check_vma=False,
    )(scene, camera)
    img = img[: cfg.height, : cfg.width]
    trans = trans[: cfg.height, : cfg.width]
    if background is not None:
        img = img + trans[..., None] * background
    return img, trans, ovf.astype(bool)
