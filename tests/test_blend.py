"""Blend-block math: vectorized cumprod formulation vs a literal sequential
transcription of the (graphdeco-semantics) per-Gaussian loop."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import RenderConfig
from gsplat_tpu.ops.blend import (
    BlendCarry,
    blend_block,
    blend_block_bwd,
    init_carry,
    make_triangular,
    triangular_cumsum,
)

CFG = RenderConfig(width=8, height=8, tile_size=8, block_size=8, max_per_tile=64)


def _random_inputs(key, g, p, opacity_scale=1.0):
    ks = jax.random.split(key, 6)
    feat = jnp.zeros((9, g))
    feat = feat.at[0].set(jax.random.uniform(ks[0], (g,), minval=0, maxval=8))
    feat = feat.at[1].set(jax.random.uniform(ks[1], (g,), minval=0, maxval=8))
    # Random PSD conics.
    l = jax.random.normal(ks[2], (g, 2, 2)) * 0.4
    cov = l @ l.transpose(0, 2, 1) + 0.05 * jnp.eye(2)
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] ** 2
    feat = feat.at[2].set(cov[:, 1, 1] / det)
    feat = feat.at[3].set(-cov[:, 0, 1] / det)
    feat = feat.at[4].set(cov[:, 0, 0] / det)
    feat = feat.at[5:8].set(jax.random.uniform(ks[3], (3, g)))
    feat = feat.at[8].set(
        jax.random.uniform(ks[4], (g,), minval=0.3, maxval=1.0) * opacity_scale
    )
    px = jnp.arange(p, dtype=jnp.float32)[:, None] % 8
    py = jnp.arange(p, dtype=jnp.float32)[:, None] // 8
    return feat, px, py


def _sequential_oracle(feat, px, py, in_range, cfg):
    """Literal per-Gaussian loop (permanent-termination semantics)."""
    g = feat.shape[1]
    p = px.shape[0]
    feat = np.asarray(feat)
    px = np.asarray(px)[:, 0]
    py = np.asarray(py)[:, 0]
    in_range = np.asarray(in_range)[0]
    color = np.zeros((3, p))
    T = np.ones(p)
    done = np.zeros(p, bool)
    for i in range(g):
        if not in_range[i]:
            continue
        dx = px - feat[0, i]
        dy = py - feat[1, i]
        power = -0.5 * (feat[2, i] * dx * dx + feat[4, i] * dy * dy) - feat[3, i] * dx * dy
        alpha = np.minimum(cfg.alpha_clamp, feat[8, i] * np.exp(power))
        ok = (power <= 0) & (alpha >= cfg.alpha_min) & ~done
        test_t = T * (1 - alpha)
        terminate = ok & (test_t < cfg.transmittance_min)
        apply = ok & ~terminate
        color += np.where(apply, alpha * T, 0.0) * feat[5:8, i : i + 1]
        T = np.where(apply, test_t, T)
        done |= terminate
    return color, T, done


def test_blend_block_matches_sequential_oracle():
    feat, px, py = _random_inputs(jax.random.key(0), 32, 64)
    in_range = jnp.ones((1, 32), bool)
    carry = blend_block(init_carry(64), feat, px, py, in_range, CFG)
    oc, ot, _ = _sequential_oracle(feat, px, py, in_range, CFG)
    np.testing.assert_allclose(np.asarray(carry.color), oc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry.trans)[:, 0], ot, rtol=1e-4, atol=1e-6)


def test_blend_block_termination_path():
    # High opacity stack forces transmittance below 1e-4 -> permanent done.
    feat, px, py = _random_inputs(jax.random.key(1), 64, 64, opacity_scale=0.99)
    feat = feat.at[8].set(0.95)
    # Wide, strong Gaussians covering the whole tile so T collapses fast.
    feat = feat.at[2].set(0.02).at[3].set(0.0).at[4].set(0.02)
    in_range = jnp.ones((1, 64), bool)
    carry = blend_block(init_carry(64), feat, px, py, in_range, CFG)
    oc, ot, odone = _sequential_oracle(feat, px, py, in_range, CFG)
    assert odone.any(), "test should exercise termination"
    np.testing.assert_allclose(np.asarray(carry.color), oc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry.trans)[:, 0], ot, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(carry.done)[:, 0] > 0.5, odone)


def test_blend_blocks_compose():
    """Two blocks of 16 == one block of 32."""
    feat, px, py = _random_inputs(jax.random.key(2), 32, 64)
    in_range = jnp.ones((1, 32), bool)
    one = blend_block(init_carry(64), feat, px, py, in_range, CFG)
    c = init_carry(64)
    c = blend_block(c, feat[:, :16], px, py, in_range[:, :16], CFG)
    c = blend_block(c, feat[:, 16:], px, py, in_range[:, 16:], CFG)
    # atol 1e-4: the MXU quadratic-basis power matmul reassociates f32 sums
    # differently per block width (ops/blend.py _block_weights).
    np.testing.assert_allclose(np.asarray(one.color), np.asarray(c.color), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(one.trans), np.asarray(c.trans), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(one.done), np.asarray(c.done))


def test_triangular_cumsum_equals_cumsum():
    x = jax.random.normal(jax.random.key(3), (16, 32))
    tri = make_triangular(32)
    np.testing.assert_allclose(
        np.asarray(triangular_cumsum(x, tri)),
        np.asarray(jnp.cumsum(x, axis=-1)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_blend_block_in_range_mask():
    feat, px, py = _random_inputs(jax.random.key(4), 32, 64)
    in_range = (jnp.arange(32) < 20)[None, :]
    masked = blend_block(init_carry(64), feat, px, py, in_range, CFG)
    trunc = blend_block(
        init_carry(64), feat[:, :20], px, py, jnp.ones((1, 20), bool), CFG
    )
    np.testing.assert_allclose(
        np.asarray(masked.color), np.asarray(trunc.color), rtol=1e-5, atol=1e-6
    )


def test_blend_bwd_matches_autodiff():
    """Hand-derived backward vs jax.grad of the forward block chain,
    including the final-transmittance gradient path."""
    key = jax.random.key(5)
    feat, px, py = _random_inputs(key, 48, 64)
    in_range = jnp.ones((1, 48), bool)
    g_color = jax.random.normal(jax.random.key(6), (3, 64))
    g_trans = jax.random.normal(jax.random.key(7), (64, 1))

    def fwd(feat):
        c = init_carry(64)
        c = blend_block(c, feat[:, :24], px, py, in_range[:, :24], CFG)
        c = blend_block(c, feat[:, 24:], px, py, in_range[:, 24:], CFG)
        return jnp.sum(c.color * g_color) + jnp.sum(c.trans * g_trans), (
            c.color,
            c.trans,
        )

    (loss, (final_color, final_trans)), auto_grad = jax.value_and_grad(
        fwd, has_aux=True
    )(feat)

    # Analytic backward: forward re-walk with suffix-sum trick.
    b_total = jnp.sum(g_color * final_color, axis=0)[:, None] + g_trans * final_trans
    carry = init_carry(64)
    accum = jnp.zeros((64, 1))
    d1, carry, accum = blend_block_bwd(
        carry, feat[:, :24], px, py, in_range[:, :24], g_color, b_total, accum, CFG
    )
    d2, carry, accum = blend_block_bwd(
        carry, feat[:, 24:], px, py, in_range[:, 24:], g_color, b_total, accum, CFG
    )
    analytic = jnp.concatenate([d1, d2], axis=1)
    np.testing.assert_allclose(
        np.asarray(analytic), np.asarray(auto_grad), rtol=2e-3, atol=2e-4
    )


def test_matmul_precision_high_matches_highest():
    """'high' is a MANUAL 3-pass bf16 decomposition (2-pass for the
    triangular cumsum, whose 0/1 matrix is bf16-exact) because Mosaic
    lowers only DEFAULT/HIGHEST inside Pallas kernels. It must agree with
    'highest' to ~2^-16 relative."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplat_tpu.ops.blend import make_triangular, mm_einsum, triangular_cumsum

    key = jax.random.key(0)
    x = jax.random.normal(key, (64, 32)) * 5.0
    tri = make_triangular(32)
    hi = triangular_cumsum(x, tri, "high")
    exact = triangular_cumsum(x, tri, "highest")
    # per-term rounding is ~2^-16 relative; elements of the cumsum can
    # cancel, so tolerance is absolute against the ~50-magnitude sums
    np.testing.assert_allclose(np.asarray(hi), np.asarray(exact),
                               rtol=1e-3, atol=5e-4)

    a = jax.random.normal(jax.random.fold_in(key, 1), (3, 32))
    b = jax.random.normal(jax.random.fold_in(key, 2), (64, 32))
    np.testing.assert_allclose(
        np.asarray(mm_einsum("cg,pg->cp", a, b, "high")),
        np.asarray(mm_einsum("cg,pg->cp", a, b, "highest")),
        rtol=1e-3, atol=5e-4,
    )


def test_indefinite_conic_no_nan_gradients():
    """exp(power) must not overflow: huge-conic cancellation can leave
    `power` spuriously positive (PSD conics make it <= 0 only in exact
    arithmetic), and an inf alpha on a masked lane turns the backward's
    0*inf products into NaNs that the moments matmul spreads to every
    Gaussian in the block (measured: 120k splats killed in one training
    step). Feed an INDEFINITE conic (the adversarial extreme of the
    rounding case) and require finite gradients."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.ops.binning import NUM_FEATURES
    from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

    cfg = RenderConfig(width=32, height=32, tile_size=8,
                       max_intersections=1 << 10, block_size=8,
                       max_per_tile=64)
    m = cfg.max_intersections
    feats = jnp.zeros((NUM_FEATURES, m), jnp.float32)
    # slot 0: indefinite conic (B^2 > AC) in tile 0 -> power > 0 far from
    # center -> exp overflow without the min(power, 0) guard.
    feats = feats.at[:, 0].set(
        jnp.asarray([4.0, 4.0, 1.0, -10.0, 1.0, 0.5, 0.5, 0.5, 0.9])
    )
    # slot 1: a normal splat in the same tile (its gradient must survive).
    feats = feats.at[:, 1].set(
        jnp.asarray([4.0, 4.0, 0.5, 0.0, 0.5, 0.2, 0.4, 0.6, 0.8])
    )
    ranges = jnp.zeros((cfg.num_tiles + 1,), jnp.int32).at[1:].set(2)

    def loss(f):
        img, trans = rasterize_tiles_jnp(f, ranges, cfg)
        return jnp.sum(img) + jnp.sum(trans)

    val, g = jax.value_and_grad(loss)(feats)
    assert bool(jnp.isfinite(val))
    assert bool(jnp.all(jnp.isfinite(g))), "NaN leaked from the masked lane"
