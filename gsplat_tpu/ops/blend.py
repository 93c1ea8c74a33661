"""Front-to-back alpha blending -- the shared block math used by BOTH the
pure-jnp tiled rasterizer and the fused Pallas TPU kernels (forward and the
hand-derived backward).

Semantics follow the reference blend loop (reference: src/compute_tiles.wgsl:
49-66): power = -0.5*(A*dx^2 + C*dy^2) - B*dx*dy from the conic,
alpha = min(0.99, opacity * exp(power)), skip when power > 0 or
alpha < 1/255, terminate when transmittance would drop below 1e-4,
color += cond * c * alpha * T, T *= (1 - alpha).

One deliberate divergence (documented; see SURVEY.md "quirks"): when the
transmittance test fails, the reference keeps testing later Gaussians
(compute_tiles.wgsl:63-65) while the original 3DGS CUDA rasterizer terminates
the pixel permanently. We adopt permanent termination: it is the
training-standard semantics, makes T monotone (enabling early exit), and
admits the fully vectorized cumulative-product formulation below.

Vectorized formulation (the TPU-native trick): within a block of G depth-
ordered Gaussians x P pixels, the sequential transmittance recurrence
    T_{i+1} = T_i * (1 - a_i)
becomes a cumulative product P_i = T_in * prod_{j<=i}(1 - a_j), computed as
exp(cumsum(log1p(-a))). The cumsum along the Gaussian axis is an associative
scan -- in the Pallas kernel it is ONE (P,G)x(G,G) upper-triangular matmul on
the MXU. Contributions are w_i = a_i * P_i / (1 - a_i) (= a_i * T_before_i),
valid while P_i >= t_min (valid lanes form a prefix because P is monotone).
Color accumulation and the backward suffix sums are likewise matmuls.

The backward pass needs no stored per-Gaussian state: since
sum_j w_j * c_j = final_color, the suffix sums S_i = sum_{j>i} (c_j . g) w_j
needed for dL/da_i are recovered in a single forward re-walk as
(g . final_color) - cumsum((c_i . g) w_i) -- the same trick the CUDA 3DGS
backward uses with its back-to-front walk, but prefix-sum-vectorized.

Shapes (shared by jnp and Pallas callers):
  feat:  (NUM_FEATURES, G)  Gaussian block, depth-ordered along axis 1
  px,py: (P, 1)             pixel centers
  color: (3, P) carry; trans/done: (P, 1) carries
All functions are pure jnp on those shapes, so the Pallas kernels call them
directly on VMEM refs' values.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.ops.binning import (
    FEAT_CA,
    FEAT_CB,
    FEAT_CC,
    FEAT_GX,
    FEAT_GY,
    FEAT_OPACITY,
    FEAT_R,
    NUM_FEATURES,
)


class BlendCarry(NamedTuple):
    color: jnp.ndarray  # (3, P)
    trans: jnp.ndarray  # (P, 1) current transmittance T
    done: jnp.ndarray   # (P, 1) float32 0/1 permanent-termination flag


def init_carry(num_pixels: int, dtype=jnp.float32) -> BlendCarry:
    return BlendCarry(
        color=jnp.zeros((3, num_pixels), dtype),
        trans=jnp.ones((num_pixels, 1), dtype),
        done=jnp.zeros((num_pixels, 1), dtype),
    )


def cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last (Gaussian) axis. The Pallas kernels
    substitute a triangular-matmul version that runs on the MXU."""
    return jnp.cumsum(x, axis=-1)


# 'high' is deliberately ABSENT: it means the manual 3-pass bf16 emulation
# (mm_einsum / triangular_cumsum handle it before this lookup), and an
# unrouted PRECISIONS['high'] must raise rather than silently run the
# 6-pass HIGHEST path (2x MXU cost, semantic drift).
PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _hi_lo_bf16(x: jnp.ndarray):
    """Split f32 into (hi, lo) bf16 with x ~ hi + lo to ~2^-16 relative --
    the operand decomposition behind XLA's own multi-pass f32 matmul
    emulation, done by hand because Mosaic lowers only DEFAULT and HIGHEST
    dot precisions inside Pallas kernels (lax.Precision.HIGH raises
    NotImplementedError in the Mosaic lowering)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def mm_einsum(sub: str, a: jnp.ndarray, b: jnp.ndarray,
              precision_name: str) -> jnp.ndarray:
    """Einsum contraction at a named precision. 'high' = manual 3-pass bf16
    decomposition (a_hi b_hi + a_hi b_lo + a_lo b_hi, each a true bf16 MXU
    pass with f32 accumulation, ~2^-16 relative -- same arithmetic XLA
    emits for Precision.HIGH outside Pallas); 'highest' = 6 passes;
    'default' = 1 rounded pass."""
    if precision_name == "high":
        ah, al = _hi_lo_bf16(a)
        bh, bl = _hi_lo_bf16(b)

        def d(x, y):
            return jnp.einsum(sub, x, y, preferred_element_type=jnp.float32)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jnp.einsum(
        sub, a, b, preferred_element_type=jnp.float32,
        precision=PRECISIONS[precision_name],
    )


def triangular_cumsum(
    x: jnp.ndarray, tri: jnp.ndarray,
    precision: str = "highest",
) -> jnp.ndarray:
    """cumsum via (P,G) @ (G,G) upper-triangular ones matrix -- MXU-native.

    `precision` is the cfg.matmul_precision NAME. Precision better than one
    bf16 pass is required: single-pass bf16 rounds the log-transmittance
    prefix sums to ~3 decimal digits (~1e-2 absolute image error vs the jnp
    rasterizer). 'high' exploits that `tri` is 0/1 and therefore bf16-EXACT:
    only x needs the hi/lo split, so the whole cumsum is 2 true-bf16 MXU
    passes (vs 6 for 'highest') with per-term error ~2^-16 relative -- and
    this matmul is the largest FLOP consumer of both kernels."""
    if precision == "high":
        xh, xl = _hi_lo_bf16(x)
        trib = tri.astype(jnp.bfloat16)
        return jnp.dot(
            xh, trib, preferred_element_type=jnp.float32
        ) + jnp.dot(xl, trib, preferred_element_type=jnp.float32)
    return jnp.dot(
        x, tri, preferred_element_type=jnp.float32,
        precision=PRECISIONS[precision],
    )


def make_triangular(g: int, dtype=jnp.float32) -> jnp.ndarray:
    """tri[j, i] = 1 if j <= i, so (x @ tri)[p, i] = sum_{j<=i} x[p, j]."""
    import jax

    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (row <= col).astype(dtype)


def _pixel_basis(px: jnp.ndarray, py: jnp.ndarray):
    """Quadratic pixel basis for the MXU power evaluation: (P, 6) columns
    [1, xr, yr, xr^2, yr^2, xr*yr] in TILE-RELATIVE coordinates (xr = px -
    px[0]): keeps the expanded quadratic's terms O(tile_size^2 / sigma^2)
    so the f32 cancellation error stays ~1e-4 in `power` (absolute pixel
    coordinates would put px^2 ~ 4e6 into the sum). Returns (basis, ox, oy).
    """
    ox = px[0:1, 0:1]
    oy = py[0:1, 0:1]
    xr = px - ox
    yr = py - oy
    one = jnp.ones_like(xr)
    basis = jnp.concatenate(
        [one, xr, yr, xr * xr, yr * yr, xr * yr], axis=1
    )  # (P, 6)
    return basis, ox, oy


def _block_weights(
    carry: BlendCarry,
    feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    in_range: jnp.ndarray,
    cfg: RenderConfig,
    cumsum_fn: Callable,
):
    """Shared fwd/bwd recomputation: per-(pixel, Gaussian) effective alpha
    `a`, running transmittance-after `p_incl`, contribution weight `w`, and
    the updated (trans, done) carries.

    The quadratic itself stays on the VPU (measured: a (P, 6) @ (6, G)
    HIGHEST-precision power matmul is ~2 ms/iter SLOWER at the bench shape
    -- the K=6 contraction wastes the MXU and serializes against the VPU in
    the block loop), but the basis/tile-relative quantities are recorded in
    aux for the backward's MOMENTS matmul, which contracts over P=1024 and
    does win (see blend_block_bwd)."""
    ca = feat[FEAT_CA][None, :]
    cb = feat[FEAT_CB][None, :]
    cc = feat[FEAT_CC][None, :]
    op = feat[FEAT_OPACITY][None, :]

    basis, ox, oy = _pixel_basis(px, py)
    gxr = feat[FEAT_GX][None, :] - ox  # (1, G) tile-relative means
    gyr = feat[FEAT_GY][None, :] - oy
    dx = (px - ox) - gxr  # = px - gx, via tile-relative terms
    dy = (py - oy) - gyr
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    # exp of the NON-POSITIVE part only: a PSD conic makes power <= 0
    # mathematically, but at huge conic magnitudes (tiny splats: A ~ 1/
    # sigma^2) catastrophic cancellation can leave power spuriously
    # POSITIVE by up to ~|terms|*eps -- large enough that exp overflows to
    # inf. Such lanes are excluded by the ok-mask (power <= 0), but an inf
    # alpha_u then turns the backward's 0 * inf products into NaNs, and the
    # moments matmul spreads one NaN lane to every Gaussian in the block --
    # measured as 120k splats dying inside one training step. min(power, 0)
    # is exact on every contributing lane and bounds alpha_u <= opacity.
    e = jnp.exp(jnp.minimum(power, 0.0))
    alpha_u = op * e
    alpha = jnp.minimum(cfg.alpha_clamp, alpha_u)
    ok = (
        (power <= 0.0)
        & (alpha >= cfg.alpha_min)
        & in_range
        & (carry.done < 0.5)
    )
    a = jnp.where(ok, alpha, 0.0)

    # One exp and no divide: t_before = trans * exp(EXCLUSIVE cumsum), the
    # exclusive sum recovered by subtracting each lane's own log term (the
    # divide-by-(1-a) form costs a VPU divide per lane; the subtract+multiply
    # form is exact for a=0 lanes and differs only in rounding elsewhere).
    l1 = jnp.log1p(-a)
    c_incl = cumsum_fn(l1)
    t_before = carry.trans * jnp.exp(c_incl - l1)
    p_incl = t_before * (1.0 - a)  # (P, G) transmittance AFTER this Gaussian
    valid = p_incl >= cfg.transmittance_min
    w = jnp.where(valid, a * t_before, 0.0)

    trigger = (a > 0.0) & ~valid
    new_trans = jnp.minimum(
        carry.trans,
        jnp.min(jnp.where(valid, p_incl, jnp.inf), axis=-1, keepdims=True),
    )
    new_done = jnp.maximum(
        carry.done, jnp.any(trigger, axis=-1, keepdims=True).astype(carry.done.dtype)
    )
    aux = dict(
        alpha_u=alpha_u, a=a, ok=ok, valid=valid, t_before=t_before,
        ca=ca, cb=cb, cc=cc, op=op, basis=basis, gxr=gxr, gyr=gyr,
    )
    return w, new_trans, new_done, aux


def blend_block(
    carry: BlendCarry,
    feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    in_range: jnp.ndarray,
    cfg: RenderConfig,
    cumsum_fn: Callable = cumsum_lanes,
) -> BlendCarry:
    """Blend one depth-ordered block of G Gaussians into P pixels."""
    w, new_trans, new_done, _ = _block_weights(
        carry, feat, px, py, in_range, cfg, cumsum_fn
    )
    colors = feat[FEAT_R : FEAT_R + 3]  # (3, G)
    # (3, G) x (P, G) contracted over G -> (3, P): MXU.
    new_color = carry.color + mm_einsum(
        "cg,pg->cp", colors, w, cfg.matmul_precision
    )
    return BlendCarry(color=new_color, trans=new_trans, done=new_done)


def blend_block_bwd(
    carry: BlendCarry,
    feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    in_range: jnp.ndarray,
    g_color: jnp.ndarray,       # (3, P) upstream gradient d L / d final_color
    b_total: jnp.ndarray,       # (P, 1) = sum_c g_color * final_color per pixel
    accum_b: jnp.ndarray,       # (P, 1) running prefix of b (carried forward)
    cfg: RenderConfig,
    cumsum_fn: Callable = cumsum_lanes,
):
    """One backward block (same forward walk order). Returns
    (dfeat (NUM_FEATURES, G), new_carry, new_accum_b).

    b_total must be sum_c g_color * final_color + g_trans * final_trans per
    pixel: the final-transmittance gradient path (background compositing,
    alpha losses) has exactly the same -1/(1-a_i) suffix structure as the
    color path, so it folds into the same suffix sum.

    d L / d trans_in is not produced: the initial transmittance is the
    constant 1.0."""
    w, new_trans, new_done, aux = _block_weights(
        carry, feat, px, py, in_range, cfg, cumsum_fn
    )
    colors = feat[FEAT_R : FEAT_R + 3]  # (3, G)

    # dL/dw[p,g] = sum_c colors[c,g] * g_color[c,p]
    dw = mm_einsum("cg,cp->pg", colors, g_color, cfg.matmul_precision)
    b = dw * w                                    # (P, G)
    cum_b = accum_b + cumsum_fn(b)                # inclusive prefix incl. past blocks
    suffix = b_total - cum_b                      # sum over strictly-later Gaussians
    new_accum_b = cum_b[:, -1:]

    a = aux["a"]
    da = jnp.where(
        a > 0.0,
        dw * aux["t_before"] - suffix / (1.0 - a),
        0.0,
    )
    # Chain through alpha = min(clamp, opacity * exp(power)); clamped lanes
    # and skipped lanes get zero gradient (aux['ok'] already excludes skips,
    # and w==0 lanes have da only through the suffix term, which is correct:
    # an applied Gaussian affects later ones even if its own w was zeroed --
    # but by construction a>0 implies it was applied or invalid; invalid
    # (post-termination) lanes have w=0 AND must get zero grad, enforced here:
    da = jnp.where(aux["valid"], da, 0.0)
    not_clamped = (aux["alpha_u"] < cfg.alpha_clamp).astype(a.dtype)
    dpower = da * aux["alpha_u"] * not_clamped    # (P, G)

    # All pixel reductions through ONE moments matmul (MXU): with the
    # quadratic expanded in tile-relative coordinates,
    #   M[k, g] = sum_p basis[p, k] * dpower[p, g],
    # every conic/mean gradient is a G-length combination of M -- replacing
    # five (P, G) product temporaries + six pixel-axis reductions on the VPU.
    m = mm_einsum(
        "pk,pg->kg", aux["basis"], dpower, cfg.matmul_precision
    )  # (6, G): [sum, x, y, x^2, y^2, xy] moments of dpower
    gxr, gyr = aux["gxr"][0], aux["gyr"][0]  # (G,)
    ca, cb, cc, op = aux["ca"][0], aux["cb"][0], aux["cc"][0], aux["op"][0]
    sdx = m[1] - gxr * m[0]                   # sum dpower * dx
    sdy = m[2] - gyr * m[0]                   # sum dpower * dy
    # d power/d ca = -0.5 dx^2; dx^2 = xr^2 - 2 xr gxr + gxr^2.
    d_ca = -0.5 * (m[3] - 2.0 * gxr * m[1] + gxr * gxr * m[0])
    d_cc = -0.5 * (m[4] - 2.0 * gyr * m[2] + gyr * gyr * m[0])
    d_cb = -(m[5] - gyr * m[1] - gxr * m[2] + gxr * gyr * m[0])
    # d power/d gx = ca dx + cb dy (d dx/d gx = -1 twice cancels the sign).
    d_gx = ca * sdx + cb * sdy
    d_gy = cc * sdy + cb * sdx
    # dop_pg = da * e * not_clamped = dpower / opacity. Opacity is a
    # sigmoid so it is positive for REAL lanes, but zero-feature lanes
    # (stream padding gathered from the zero column, or fully-underflowed
    # opacities) make this 0/0 -> NaN, which the downstream segment-sum
    # multiplies into neighboring runs (NaN * 0 = NaN). Select, don't mask:
    # jnp.where is a lane select, so the NaN in the untaken branch is inert.
    d_op = jnp.where(op > 0.0, m[0] / jnp.maximum(op, 1e-30), 0.0)
    # dL/dcolor[c,g] = sum_p g_color[c,p] * w[p,g]
    d_colors = mm_einsum("cp,pg->cg", g_color, w, cfg.matmul_precision)

    dfeat = jnp.concatenate(
        [
            d_gx[None],
            d_gy[None],
            d_ca[None],
            d_cb[None],
            d_cc[None],
            d_colors,
            d_op[None],
        ],
        axis=0,
    )
    assert dfeat.shape[0] == NUM_FEATURES
    return dfeat, BlendCarry(carry.color, new_trans, new_done), new_accum_b


def tile_pixel_coords(tile_idx, cfg: RenderConfig, dtype=jnp.float32):
    """Pixel centers of tile `tile_idx` (row-major tiles, row-major pixels
    within a tile): (P, 1) px and py. Matches the reference's integer pixel
    coordinates (compute_tiles.wgsl:40 uses the raw invocation id)."""
    import jax

    ts = cfg.tile_size
    tx = tile_idx % cfg.tiles_x
    ty = tile_idx // cfg.tiles_x
    p = jax.lax.broadcasted_iota(jnp.int32, (cfg.pixels_per_tile, 1), 0)
    px = (tx * ts + p % ts).astype(dtype)
    py = (ty * ts + p // ts).astype(dtype)
    return px, py
