"""Packed 16-bit forward feature stream (cfg.stream_format='packed16').

The slot-order feature gather is the single largest op of the fwd+bwd frame
(~25 ms of ~149 at 1080p/1M, PROFILE.md) and XLA TPU gathers pay per
ELEMENT, so halving the row count halves the cost. This module packs the
NUM_FEATURES=9 f32 rows into 5 int32 rows:

    row 0: gx | gy << 16     u16 fixed-point, scale-adaptive affine over
                             1.1x the image extent (~1/30 px at 1080p)
    rows 1-4: bf16 pairs     (ca|cb), (cc|r), (g|b), (opacity|0)
                             -- binning._pack_bf16_pairs layout

int32 typing end-to-end: a bf16 pair whose high half is zero is an f32
DENORMAL bit pattern, and TPU compute ops flush denormals to zero (see
ops/binning.py gather_backward='bf16' note). Integers are flush-proof.

Quantization error: means <= 1/(2s) px (~0.017 px at 1080p -- finer than
the reference's own half-float buffers would give); conic/color/opacity
~0.4% relative (bf16). Gradients are STRAIGHT-THROUGH onto the f32
features: the hand-derived raster backward differentiates the unpacked
values, and the quantizer's Jacobian is treated as identity -- the standard
quantized-inference/training contract.

Because an int32 array cannot carry JAX cotangents, pack -> gather ->
rasterize is ONE fused custom_vjp here (`rasterize_packed16`) rather than
the separate differentiable gather + raster VJPs of the f32 path.

Supported on ALL paths: single-device, tile-sharded (the local band config
carries the global quantization ranges via cfg.quant_ranges, so pack and
in-kernel unpack agree across shards), and Gaussian-sharded (where the
packed stream doubles as the fragment-exchange wire format --
parallel/gaussian_sharded.py `_p16_shard_raster`: 5 int32 rows on the
all_to_all, u16 fixed-point means, finer than the f32 path's optional
fragment_format='bf16' compression at the same byte count).

Reference parity note: the reference streams full-f32 Gaussian records to
its WGSL blend (reference: src/compute_tiles.wgsl, 64-B GaussianData); this
is a TPU-side compression of that stream, off by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.ops.binning import (
    NUM_FEATURES,
    _gather_slots_bwd,
    _pack_bf16_pairs,
    kmax_eff,
)


def quant_params(cfg: RenderConfig) -> tuple[float, float, float, float]:
    """(lox, sx, loy, sy): q = round((v - lo) * s) in [0, 65535]; v = q/s+lo.
    The range covers uv in [(1-l)/2, (1+l)/2] * extent (the frustum cull
    admits |ndc| < l = cfg.frustum_ndc_limit), so every valid mean fits.

    cfg.quant_ranges overrides the derivation: on the tile-sharded path the
    raster kernel runs under a LOCAL config (one band of tile rows) but the
    means are GLOBAL pixel coordinates, so local_tile_cfg stamps the global
    ranges into the local config and pack/unpack agree across shards."""
    if cfg.quant_ranges is not None:
        return cfg.quant_ranges
    l = float(cfg.frustum_ndc_limit)
    lox = (1.0 - l) / 2.0 * cfg.width
    loy = (1.0 - l) / 2.0 * cfg.height
    sx = 65535.0 / (l * cfg.width)
    sy = 65535.0 / (l * cfg.height)
    return lox, sx, loy, sy


# Color fixed-point range of the 'packed4' stream: SH colors are clamped
# >= 0 and practically < 4 (the +0.5 offset plus bounded SH response);
# 11/11/10 bits over [0, 4) give steps of 4/2047 ~ 0.002 (r, g) and
# 4/1023 ~ 0.004 (b) -- finer than 8-bit display quantization either way.
PACKED4_COLOR_RANGE = 4.0


def pack_stream(feats: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """(NUM_FEATURES, N) f32 -> packed int32 stream.

    'packed16': 5 rows -- means u16 pair, then bf16 pairs
                (ca|cb), (cc|r), (g|b), (op|0).
    'packed4':  4 rows -- means u16 pair, bf16 pairs (ca|cb), (cc|op), and
                rgb as one u32 of 11/11/10-bit fixed point over
                [0, PACKED4_COLOR_RANGE). One fewer row through the slot
                gather -- the frame's largest per-element op -- at color
                quantization finer than bf16's ~1/256 relative step."""
    lox, sx, loy, sy = quant_params(cfg)
    qx = jnp.clip(
        jnp.round((feats[0] - lox) * sx), 0.0, 65535.0
    ).astype(jnp.int32)
    qy = jnp.clip(
        jnp.round((feats[1] - loy) * sy), 0.0, 65535.0
    ).astype(jnp.int32)
    row0 = qx | jax.lax.shift_left(qy, jnp.int32(16))
    if cfg.stream_format == "packed4":
        pairs = jax.lax.bitcast_convert_type(
            _pack_bf16_pairs(feats[jnp.array([2, 3, 4, 8])]), jnp.int32
        )  # (2, N): (ca|cb), (cc|op)
        s = PACKED4_COLOR_RANGE
        qr = jnp.clip(jnp.round(feats[5] * (2047.0 / s)), 0.0, 2047.0)
        qg = jnp.clip(jnp.round(feats[6] * (2047.0 / s)), 0.0, 2047.0)
        qb = jnp.clip(jnp.round(feats[7] * (1023.0 / s)), 0.0, 1023.0)
        row3 = (
            qr.astype(jnp.int32)
            | jax.lax.shift_left(qg.astype(jnp.int32), jnp.int32(11))
            | jax.lax.shift_left(qb.astype(jnp.int32), jnp.int32(22))
        )
        return jnp.concatenate([row0[None], pairs, row3[None]], axis=0)
    pairs = jax.lax.bitcast_convert_type(
        _pack_bf16_pairs(feats[2:NUM_FEATURES]), jnp.int32
    )  # (4, N): (ca|cb), (cc|r), (g|b), (op|0)
    return jnp.concatenate([row0[None], pairs], axis=0)


def unpack_block(feat_i32: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """(>=rows, G) int32 packed block -> (NUM_FEATURES, G) f32. Pure jnp on
    values, Mosaic-safe (bit ops + int32->f32 converts only), so the Pallas
    kernels call it directly on VMEM blocks."""
    lox, sx, loy, sy = quant_params(cfg)
    if cfg.stream_format == "packed4":
        u = jax.lax.bitcast_convert_type(feat_i32[:4], jnp.uint32)
        qx = (u[0:1] & jnp.uint32(0xFFFF)).astype(jnp.int32)
        qy = (u[0:1] >> 16).astype(jnp.int32)
        gx = qx.astype(jnp.float32) * (1.0 / sx) + lox
        gy = qy.astype(jnp.float32) * (1.0 / sy) + loy
        even = jax.lax.bitcast_convert_type(u[1:3] << 16, jnp.float32)
        odd = jax.lax.bitcast_convert_type(
            u[1:3] & jnp.uint32(0xFFFF0000), jnp.float32
        )  # even: ca, cc; odd: cb, op
        s = PACKED4_COLOR_RANGE
        qr = (u[3:4] & jnp.uint32(0x7FF)).astype(jnp.int32)
        qg = ((u[3:4] >> 11) & jnp.uint32(0x7FF)).astype(jnp.int32)
        qb = ((u[3:4] >> 22) & jnp.uint32(0x3FF)).astype(jnp.int32)
        r = qr.astype(jnp.float32) * (s / 2047.0)
        g = qg.astype(jnp.float32) * (s / 2047.0)
        b = qb.astype(jnp.float32) * (s / 1023.0)
        # FEAT order: gx, gy, ca, cb, cc, r, g, b, opacity.
        return jnp.concatenate(
            [gx, gy, even[0:1], odd[0:1], even[1:2], r, g, b, odd[1:2]],
            axis=0,
        )
    u = jax.lax.bitcast_convert_type(feat_i32[:5], jnp.uint32)
    # u32 -> i32 -> f32: Mosaic has no u32->f32 convert; both halves are
    # <= 65535 so the int32 round-trip is exact.
    qx = (u[0:1] & jnp.uint32(0xFFFF)).astype(jnp.int32)
    qy = (u[0:1] >> 16).astype(jnp.int32)
    gx = qx.astype(jnp.float32) * (1.0 / sx) + lox
    gy = qy.astype(jnp.float32) * (1.0 / sy) + loy
    even = jax.lax.bitcast_convert_type(u[1:5] << 16, jnp.float32)
    odd = jax.lax.bitcast_convert_type(
        u[1:5] & jnp.uint32(0xFFFF0000), jnp.float32
    )
    # FEAT order: gx, gy, ca, cb, cc, r, g, b, opacity.
    return jnp.concatenate(
        [gx, gy, even[0:1], odd[0:1], even[1:2], odd[1:2], even[2:3],
         odd[2:3], even[3:4]],
        axis=0,
    )


def _gather_packed(feats, sorted_gid, cfg):
    packed = pack_stream(feats, cfg)
    g = jnp.where(sorted_gid < 0, feats.shape[1], sorted_gid)
    # Zero column + clip, not mode='fill' (see binning._gather_slots): a
    # zero packed column unpacks to zero opacity, so invalid slots cannot
    # contribute.
    packed_pad = jnp.pad(packed, ((0, 0), (0, 1)))
    if cfg.slot_gather == "c64":
        # Pair the 5 int32 rows (+1 zero row) into 3 complex64 rows.
        # MEASURED LOSER on TPU v5e (see RenderConfig.slot_gather): c64
        # gathers run at 5.7 ns/elem vs i32's 1.06, so 3/5 the elements
        # costs 1.76x the time. Bit-exact on-chip (denormal rows included;
        # scripts/micro_gather_c64.py) -- kept as the recorded ablation.
        f = jax.lax.bitcast_convert_type(
            jnp.pad(packed_pad, ((0, 1), (0, 0))), jnp.float32
        )
        c = jax.lax.complex(f[0::2], f[1::2])              # (3, N+1)
        s = jnp.take(c, g, axis=1, mode="clip")            # (3, max_I)
        re = jax.lax.bitcast_convert_type(jnp.real(s), jnp.int32)
        im = jax.lax.bitcast_convert_type(jnp.imag(s), jnp.int32)
        return jnp.stack([re, im], axis=1).reshape(6, -1)[:5]
    return jnp.take(packed_pad, g, axis=1, mode="clip")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def rasterize_packed16(feats, sorted_gid, gidk, offsets, counts, ranges,
                       tile_offset, cfg: RenderConfig, lcfg: RenderConfig):
    """feats (NUM_FEATURES, N) f32 -> (image, trans) through the packed
    stream. One custom_vjp spanning quantize -> slot gather -> rasterize
    (an int32 intermediate cannot carry cotangents between separate VJPs).
    lcfg describes the rasterized tile rows (== cfg off the sharded path)."""
    out, _ = _rasterize_p16_fwd_impl(feats, sorted_gid, ranges, tile_offset,
                                     cfg, lcfg)
    return out


def _rasterize_p16_fwd_impl(feats, sorted_gid, ranges, tile_offset, cfg,
                            lcfg):
    slots = _gather_packed(feats, sorted_gid, cfg)  # (5, max_I) int32
    offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)
    if cfg.impl == "pallas":
        from gsplat_tpu.ops.pallas import raster as R

        (image, trans), res = R._rasterize_fwd(slots, ranges, offset, lcfg)
        return (image, trans), res
    slots9 = unpack_block(slots, cfg)
    from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

    (image, trans), vjp = jax.vjp(
        lambda s: rasterize_tiles_jnp(s, ranges, lcfg, tile_offset=offset[0]),
        slots9,
    )
    del vjp  # recomputed in the bwd (residual closures can't be saved)
    return (image, trans), (slots9, ranges, offset)


def _rasterize_p16_fwd(feats, sorted_gid, gidk, offsets, counts, ranges,
                       tile_offset, cfg, lcfg):
    out, raster_res = _rasterize_p16_fwd_impl(
        feats, sorted_gid, ranges, tile_offset, cfg, lcfg
    )
    return out, (raster_res, gidk, offsets, counts)


def _rasterize_p16_bwd(cfg, lcfg, residuals, grads):
    raster_res, gidk, offsets, counts = residuals
    if cfg.impl == "pallas":
        from gsplat_tpu.ops.pallas import raster as R

        dslot = R._rasterize_bwd(lcfg, raster_res, grads)[0]  # (F, M)
    else:
        slots9, ranges, offset = raster_res
        from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

        _, vjp = jax.vjp(
            lambda s: rasterize_tiles_jnp(
                s, ranges, lcfg, tile_offset=offset[0]
            ),
            slots9,
        )
        dslot = vjp(grads)[0]
    segsum = cfg.segment_sum
    if segsum == "pallas" and cfg.pallas_interpret:
        segsum = "pallas_interpret"
    if dslot.dtype == jnp.int32:
        # The raster backward kernel emitted the slot gradients already
        # bf16-pair-packed (ops/pallas/raster.py _pack_grads): go straight
        # to the packed sort + segsum + readout.
        from gsplat_tpu.ops.binning import packed_grad_reduce

        key = jnp.where(gidk >= 0, gidk, jnp.int32(2**31 - 1))
        dfeats = packed_grad_reduce(
            kmax_eff(cfg), segsum, key, dslot, NUM_FEATURES,
            offsets, counts,
        )
    else:
        dfeats = _gather_slots_bwd(
            kmax_eff(cfg), cfg.gather_backward,
            cfg.grad_readout, segsum, (gidk, offsets, counts), dslot,
        )[0]
    return dfeats, None, None, None, None, None, None


rasterize_packed16.defvjp(_rasterize_p16_fwd, _rasterize_p16_bwd)
