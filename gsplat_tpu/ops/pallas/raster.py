"""Fused Pallas TPU rasterization kernels (forward + hand-derived backward).

TPU-native replacement for the reference's per-tile blend shader
(reference: src/compute_tiles.wgsl): one kernel program per tile, walking the
tile's span of the depth-sorted intersection stream. Differences dictated by
the hardware:

  - The reference launches one thread per pixel and loops Gaussians serially
    per thread. Here each tile program blends a whole (P pixels x G Gaussians)
    block at a time on the VPU/MXU, using the cumulative-transmittance
    formulation from ops/blend.py (the sequential T recurrence becomes an
    upper-triangular matmul on the MXU).
  - Gaussian data is pre-gathered into sorted-stream order OUTSIDE the kernel
    (one XLA gather), so the kernel's loads are contiguous (NUM_FEATURES, G)
    slices, double-buffered HBM->VMEM with async DMA.
  - Early exit: the reference masks saturated pixels but walks the full range
    (compute_tiles.wgsl:61-65); here the while-loop stops as soon as every
    pixel in the tile has terminated.
  - Dynamic per-tile trip counts come from scalar-prefetched `ranges` (the
    searchsorted output), so zero wasted blocks on empty tiles.

The backward kernel re-walks each tile's span in FORWARD order, recomputing
the forward quantities and using the suffix-sum identity (see ops/blend.py)
to avoid storing any per-Gaussian state; per-slot gradients are DMA'd to a
(NUM_FEATURES, max_I) buffer which the caller reduces back to Gaussians with
the sort-based VJP in ops/binning.py (_gather_slots). Tile segments are NOT
block-aligned: each tile's blocks start at the aligned floor of its segment,
out-of-segment lanes are masked (zero gradient), and the one block a tile
may share with its predecessor is combined with a synchronous
read-modify-write -- race-free because the 'arbitrary' grid dimension
executes sequentially on the TensorCore. The TPU analogue of the CUDA
backward's atomic adds is "no atomics needed".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.ops import blend as blend_ops
from gsplat_tpu.ops.binning import NUM_FEATURES, PADDED_FEATURES


def _feat_rows(cfg: RenderConfig) -> int:
    """Sublane rows of the (padded) feature stream: 8 for the packed16
    int32 stream (5 payload rows), PADDED_FEATURES for f32."""
    return (8 if cfg.stream_format in ("packed16", "packed4")
            else PADDED_FEATURES)


def _feat_block(feat, cfg: RenderConfig):
    """Unpack a VMEM feature block to NUM_FEATURES f32 rows when the
    stream is packed16 (bit ops + converts only; Mosaic-safe)."""
    if cfg.stream_format in ("packed16", "packed4"):
        from gsplat_tpu.ops.stream16 import unpack_block

        return unpack_block(feat, cfg)
    return feat


def _pack_grads(cfg: RenderConfig) -> bool:
    """In the fully-packed fast mode the backward kernel emits the slot
    gradients already bf16-pair-packed as int32 (binning._pack_bf16_pairs
    layout), skipping the ~3 ms XLA pack relayout and halving the output
    DMA. Only possible on the packed16 path, where raster bwd and gather
    bwd live inside ONE fused custom_vjp (ops/stream16.py) -- the plain
    path's VJP boundary requires f32 cotangents."""
    return (
        cfg.stream_format in ("packed16", "packed4")
        and cfg.gather_backward == "bf16"
    )


def _pack_grad_block(dfeat, g: int):
    """(NUM_FEATURES, g) f32 -> (8, g) int32 bf16-pair rows (+3 zero pad
    rows). Row pairing matches binning._pack_bf16_pairs (even row low)."""
    from gsplat_tpu.ops.pallas.segsum import _rne_bf16_bits

    lo = jnp.concatenate(
        [dfeat[0:1], dfeat[2:3], dfeat[4:5], dfeat[6:7], dfeat[8:9]], axis=0
    )
    hi = jnp.concatenate(
        [dfeat[1:2], dfeat[3:4], dfeat[5:6], dfeat[7:8],
         jnp.zeros((1, g), jnp.float32)],
        axis=0,
    )
    packed = (_rne_bf16_bits(lo) >> 16) | _rne_bf16_bits(hi)  # (5, g) u32
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(packed, jnp.int32),
            jnp.zeros((3, g), jnp.int32),
        ],
        axis=0,
    )


def _unpack_grad_block(pblock):
    """Inverse of _pack_grad_block: (>=5, g) int32 -> (NUM_FEATURES, g)
    f32 (bf16-rounded values)."""
    u = jax.lax.bitcast_convert_type(pblock[:5], jnp.uint32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return jnp.concatenate(
        [lo[0:1], hi[0:1], lo[1:2], hi[1:2], lo[2:3], hi[2:3], lo[3:4],
         hi[3:4], lo[4:5]],
        axis=0,
    )
from gsplat_tpu.ops.blend import (
    BlendCarry,
    blend_block,
    blend_block_bwd,
    make_triangular,
    triangular_cumsum,
)

# Rows of the per-tile output/residual buffer.
ROW_R, ROW_G, ROW_B, ROW_TRANS, ROW_DONE = 0, 1, 2, 3, 4
OUT_ROWS = 8  # padded to 8 sublanes


def _tile_origin(cfg: RenderConfig, tile_idx):
    ts = cfg.tile_size
    tx = tile_idx % cfg.tiles_x
    ty = tile_idx // cfg.tiles_x
    return tx * ts, ty * ts


def _pixel_coords(cfg: RenderConfig, tile_idx):
    ts = cfg.tile_size
    p = cfg.pixels_per_tile
    ox, oy = _tile_origin(cfg, tile_idx)
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (ox + lin % ts).astype(jnp.float32)
    py = (oy + lin // ts).astype(jnp.float32)
    return px, py


def _fwd_kernel(ranges_ref, offset_ref, feat_hbm, out_ref, buf, sems, *, cfg: RenderConfig):
    g = cfg.pallas_block_size
    p = cfg.pixels_per_tile
    t = pl.program_id(0)
    start = ranges_ref[t]
    end = ranges_ref[t + 1]
    # Segments are NOT block-aligned; blocks start at the aligned floor of
    # `start` (so every DMA offset is g-aligned for Mosaic) and a two-sided
    # in_range mask drops the head/tail lanes belonging to neighbor tiles.
    base = (start // g) * g
    nb = jnp.where(end > start, pl.cdiv(end - base, g), 0)

    px, py = _pixel_coords(cfg, t + offset_ref[0])
    tri = make_triangular(g)
    cumsum = functools.partial(
        triangular_cumsum, tri=tri, precision=cfg.matmul_precision,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    out_ref[0, :, :] = jnp.zeros((OUT_ROWS, p), jnp.float32)

    def dma(slot, i):
        off = pl.multiple_of(base + i * g, g)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, g)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nb > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        i, trans, done = state
        return (i < nb) & jnp.logical_not(jnp.all(done > 0.5))

    def body(state):
        i, trans, done = state
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()
        feat = _feat_block(buf[slot], cfg)  # (NUM_FEATURES+, g) f32
        idx = base + i * g + lane
        in_range = (idx >= start) & (idx < end)
        carry = BlendCarry(color=out_ref[0, 0:3, :], trans=trans, done=done)
        carry = blend_block(carry, feat, px, py, in_range, cfg, cumsum_fn=cumsum)
        out_ref[0, 0:3, :] = carry.color
        return i + 1, carry.trans, carry.done

    init = (
        jnp.int32(0),
        jnp.ones((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
    )
    final_i, trans, done = jax.lax.while_loop(cond, body, init)

    # Early exit leaves the prefetched DMA for block `final_i` in flight;
    # drain it so no semaphore survives the kernel.
    @pl.when(final_i < nb)
    def _():
        dma(jax.lax.rem(final_i, 2), final_i).wait()

    out_ref[0, ROW_TRANS, :] = trans[:, 0]
    out_ref[0, ROW_DONE, :] = done[:, 0]


def _bwd_kernel(
    ranges_ref, offset_ref, g_tile_ref, feat_hbm, _dzero, dfeat_hbm,
    buf, dbuf, rbuf, sems, osems, rsem, *, cfg: RenderConfig,
):
    g = cfg.pallas_block_size
    p = cfg.pixels_per_tile
    t = pl.program_id(0)
    start = ranges_ref[t]
    end = ranges_ref[t + 1]
    # Unaligned segments: this tile's FIRST block may share a g-block with
    # the previous tile's last block (whose overhang lanes it wrote as
    # zeros). Block 0 is therefore a synchronous read-modify-write -- safe
    # because grid dimension 'arbitrary' executes sequentially on the core,
    # so the previous tile's write completed before this tile's read. All
    # later blocks are exclusively this tile's and stay fully pipelined.
    base = (start // g) * g
    nb = jnp.where(end > start, pl.cdiv(end - base, g), 0)

    px, py = _pixel_coords(cfg, t + offset_ref[0])
    tri = make_triangular(g)
    cumsum = functools.partial(
        triangular_cumsum, tri=tri, precision=cfg.matmul_precision,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    g_color = g_tile_ref[0, 0:3, :]          # (3, P)
    b_total = g_tile_ref[0, 3:4, :].reshape(p, 1)

    def dma_in(slot, i):
        off = pl.multiple_of(base + i * g, g)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, g)], buf.at[slot], sems.at[slot]
        )

    def dma_out(slot, i):
        off = pl.multiple_of(base + i * g, g)
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dfeat_hbm.at[:, pl.ds(off, g)],
            osems.at[slot],
        )

    def dma_read_out(i):
        off = pl.multiple_of(base + i * g, g)
        return pltpu.make_async_copy(
            dfeat_hbm.at[:, pl.ds(off, g)], rbuf, rsem
        )

    @pl.when(nb > 0)
    def _():
        dma_in(0, 0).start()

    def cond(state):
        i, trans, done, accum_b = state
        return (i < nb) & jnp.logical_not(jnp.all(done > 0.5))

    def body(state):
        i, trans, done, accum_b = state
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            dma_in(jax.lax.rem(i + 1, 2), i + 1).start()

        dma_in(slot, i).wait()
        # Before overwriting this slot's output staging buffer, drain its
        # previous outbound DMA. Block 0's write is synchronous (waited in
        # its own iteration), so only blocks >= 1 are ever outstanding.
        @pl.when(i >= 3)
        def _():
            dma_out(slot, i - 2).wait()

        feat = _feat_block(buf[slot], cfg)
        idx = base + i * g + lane
        in_range = (idx >= start) & (idx < end)
        carry = BlendCarry(color=jnp.zeros((3, p), jnp.float32), trans=trans, done=done)
        dfeat, carry, accum_b = blend_block_bwd(
            carry, feat, px, py, in_range, g_color, b_total, accum_b, cfg,
            cumsum_fn=cumsum,
        )
        if _pack_grads(cfg):
            dbuf[slot] = _pack_grad_block(dfeat, g)
        else:
            dbuf[slot] = jnp.concatenate(
                [dfeat,
                 jnp.zeros((PADDED_FEATURES - NUM_FEATURES, g), jnp.float32)],
                axis=0,
            )

        @pl.when(i == 0)
        def _():
            # RMW: fold in the previous tile's overhang contribution (f32
            # accumulate; on the packed path the previous tile's packed
            # overhang is unpacked, added, and re-rounded -- one extra bf16
            # rounding on boundary lanes only).
            rd = dma_read_out(0)
            rd.start()
            rd.wait()
            if _pack_grads(cfg):
                dbuf[slot] = _pack_grad_block(
                    dfeat + _unpack_grad_block(rbuf[...]), g
                )
            else:
                dbuf[slot] = dbuf[slot] + rbuf[...]
            wr = dma_out(slot, 0)
            wr.start()
            wr.wait()

        @pl.when(i > 0)
        def _():
            dma_out(slot, i).start()

        return i + 1, carry.trans, carry.done, accum_b

    init = (
        jnp.int32(0),
        jnp.ones((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
    )
    final_i, _, _, _ = jax.lax.while_loop(cond, body, init)

    # Drain the early-exit inbound prefetch and outstanding output DMAs
    # (block 0's write was synchronous; only blocks >= 1 are in flight).
    @pl.when(final_i < nb)
    def _():
        dma_in(jax.lax.rem(final_i, 2), final_i).wait()

    @pl.when(final_i >= 3)
    def _():
        dma_out(jax.lax.rem(final_i, 2), final_i - 2).wait()

    @pl.when(final_i >= 2)
    def _():
        dma_out(jax.lax.rem(final_i - 1, 2), final_i - 1).wait()


def _pad_features(features: jnp.ndarray, g: int, rows: int) -> jnp.ndarray:
    """Pad rows to the sublane tile (`rows`) and lanes by one block so the
    last block's DMA slice never reads out of bounds."""
    return jnp.pad(features, ((0, rows - features.shape[0]), (0, g)))


def _fwd_pallas_call(features, ranges, offset, num_tiles, cfg: RenderConfig):
    g = cfg.pallas_block_size
    p = cfg.pixels_per_tile
    fr = _feat_rows(cfg)
    feats_padded = _pad_features(features, g, fr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, OUT_ROWS, p), lambda t, ranges, off: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, fr, g), features.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_ROWS, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=cfg.pallas_interpret,
    )(ranges, offset, feats_padded)


def _bwd_pallas_call(features, ranges, offset, g_tile, num_tiles, cfg: RenderConfig):
    g = cfg.pallas_block_size
    p = cfg.pixels_per_tile
    fr = _feat_rows(cfg)
    feats_padded = _pad_features(features, g, fr)
    max_ip = feats_padded.shape[1]
    grows, gdtype = (
        (8, jnp.int32) if _pack_grads(cfg) else
        (PADDED_FEATURES, jnp.float32)
    )
    dzero = jnp.zeros((grows, max_ip), gdtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, OUT_ROWS, p), lambda t, ranges, off: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, fr, g), features.dtype),
            pltpu.VMEM((2, grows, g), gdtype),
            pltpu.VMEM((grows, g), gdtype),  # block-0 RMW
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dfeat = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grows, max_ip), gdtype),
        input_output_aliases={4: 0},  # dzero (arg idx incl. prefetch) -> dfeat
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=cfg.pallas_interpret,
    )(ranges, offset, g_tile, feats_padded, dzero)
    out_rows = 5 if _pack_grads(cfg) else NUM_FEATURES
    return dfeat[:out_rows, : features.shape[1]]


def _tiles_to_image(tile_colors, cfg: RenderConfig):
    from gsplat_tpu.ops.raster_jnp import _tiles_to_image as impl

    return impl(tile_colors, cfg)


def _tiles_to_scalar(tile_vals, cfg: RenderConfig):
    from gsplat_tpu.ops.raster_jnp import _tiles_to_scalar_image as impl

    return impl(tile_vals, cfg)


def _image_to_tiles(img: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """(H, W, C) -> (T, C, P): inverse of _tiles_to_image (zero-pads the
    ragged edge tiles)."""
    ts = cfg.tile_size
    c = img.shape[-1]
    padded = jnp.zeros((cfg.padded_height, cfg.padded_width, c), img.dtype)
    padded = padded.at[: cfg.height, : cfg.width].set(img)
    x = padded.reshape(cfg.tiles_y, ts, cfg.tiles_x, ts, c)
    x = x.transpose(0, 2, 4, 1, 3)  # (ty, tx, c, py, px)
    return x.reshape(cfg.num_tiles, c, cfg.pixels_per_tile)


def rasterize_pallas(features, ranges, cfg: RenderConfig, tile_offset=0):
    """Returns (image (H, W, 3), final_transmittance (H, W)).

    For the tile-sharded path, `cfg` describes the LOCAL tile rows and
    `tile_offset` is the global tile index of local tile 0 (may be traced)."""
    if (ranges.shape[0] - 1) != cfg.num_tiles:
        raise ValueError("ranges length does not match cfg.num_tiles")
    offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)
    return _rasterize_pallas(features, ranges, offset, cfg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rasterize_pallas(features, ranges, offset, cfg: RenderConfig):
    out = _fwd_pallas_call(features, ranges, offset, cfg.num_tiles, cfg)
    image = _tiles_to_image(out[:, 0:3, :], cfg)
    trans = _tiles_to_scalar(out[:, ROW_TRANS, :], cfg)
    return image, trans


def _rasterize_fwd(features, ranges, offset, cfg: RenderConfig):
    out = _fwd_pallas_call(features, ranges, offset, cfg.num_tiles, cfg)
    image = _tiles_to_image(out[:, 0:3, :], cfg)
    trans = _tiles_to_scalar(out[:, ROW_TRANS, :], cfg)
    return (image, trans), (features, ranges, offset, out)


def _rasterize_bwd(cfg: RenderConfig, residuals, grads):
    features, ranges, offset, out = residuals
    g_image, g_trans = grads
    g_color_tiles = _image_to_tiles(g_image, cfg)             # (T, 3, P)
    g_trans_tiles = _image_to_tiles(g_trans[..., None], cfg)  # (T, 1, P)
    # b_total = sum_c g_color*final_color + g_trans*final_trans (per pixel);
    # see blend_block_bwd docstring.
    b_total = (
        jnp.sum(g_color_tiles * out[:, 0:3, :], axis=1, keepdims=True)
        + g_trans_tiles * out[:, ROW_TRANS : ROW_TRANS + 1, :]
    )
    g_tile = jnp.concatenate(
        [
            g_color_tiles,
            b_total,
            jnp.zeros(
                (cfg.num_tiles, OUT_ROWS - 4, cfg.pixels_per_tile), jnp.float32
            ),
        ],
        axis=1,
    )  # (T, OUT_ROWS, P)
    dfeat = _bwd_pallas_call(features, ranges, offset, g_tile, cfg.num_tiles, cfg)
    return dfeat, None, None


_rasterize_pallas.defvjp(_rasterize_fwd, _rasterize_bwd)
