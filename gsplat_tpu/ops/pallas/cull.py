"""Pallas kernel for the exact ellipse-tile cull mask.

The jnp formulation of _precise_tile_valid (ops/binning.py) is pure
elementwise math, but XLA materializes a dozen (N, K_max) f32 intermediates
(~62 ms at 1M x 64 on v5e). This kernel computes the mask in one pass:
each grid block reads a (ROWS, BN) slab of per-Gaussian parameters and
writes the (K_max, BN) mask block -- Gaussians ride the 128-lane axis,
rect-walk indices the sublane axis.

Semantics match the jnp version bit-for-bit in spirit; tiny fp divergence at
the alpha_min threshold is harmless either way because the blend re-tests
every surviving lane exactly (culling only needs to be a subset of the
blend's own skip -- see _precise_tile_valid docstring)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.config import RenderConfig

# Parameter rows of the packed (ROWS, N) input.
R_GX, R_GY, R_A, R_B, R_C, R_TAU, R_X0, R_Y0, R_W, R_COUNT = range(10)
NUM_ROWS = 16  # padded to two f32 sublane tiles


def _cull_kernel(params_ref, out_ref, *, kmax: int, ts: float):
    p = params_ref[...]  # (NUM_ROWS, BN)
    bn = p.shape[1]

    def row(i):  # (1, BN)
        return p[i : i + 1, :]

    k = jax.lax.broadcasted_iota(jnp.int32, (kmax, bn), 0).astype(jnp.float32)
    w = row(R_W)
    # k // w via exact f32 division ((k + 0.5) / w is never integral).
    ky = jnp.floor((k + 0.5) / w)
    kx = k - ky * w
    tx = row(R_X0) + kx
    ty = row(R_Y0) + ky

    dx0 = tx * ts - row(R_GX)
    dx1 = dx0 + (ts - 1.0)
    dy0 = ty * ts - row(R_GY)
    dy1 = dy0 + (ts - 1.0)
    inside = (dx0 <= 0.0) & (0.0 <= dx1) & (dy0 <= 0.0) & (0.0 <= dy1)

    a = row(R_A)
    b = row(R_B)
    c = row(R_C)
    nb_over_a = -b / jnp.maximum(a, 1e-12)
    nb_over_c = -b / jnp.maximum(c, 1e-12)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    def edge_x(d):
        dy = jnp.clip(nb_over_c * d, dy0, dy1)
        return q(d, dy)

    def edge_y(d):
        dx = jnp.clip(nb_over_a * d, dx0, dx1)
        return q(dx, d)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(dx0), edge_x(dx1)),
        jnp.minimum(edge_y(dy0), edge_y(dy1)),
    )
    qmin = jnp.where(inside, 0.0, qmin)
    ok = (qmin <= row(R_TAU)) & (k < row(R_COUNT))
    out_ref[...] = ok.astype(jnp.float32)


def cull_params(proj, cfg: RenderConfig, counts=None) -> jnp.ndarray:
    """(10, N) f32 parameter rows the cull kernel consumes. `counts`
    overrides proj.counts (the jumbo tiers pass a higher walk bound than
    the base K_max clip)."""
    rect_w = jnp.maximum(proj.rect[:, 2] - proj.rect[:, 0], 1)
    tau = 2.0 * jnp.log(
        jnp.maximum(proj.opacity / cfg.alpha_min, 1e-12)
    )
    tau = jnp.where(proj.opacity > cfg.alpha_min, tau, -1.0)  # cull all
    if counts is None:
        counts = proj.counts
    rows = [
        proj.uv[:, 0] * cfg.width,
        proj.uv[:, 1] * cfg.height,
        proj.conic[:, 0],
        proj.conic[:, 1],
        proj.conic[:, 2],
        tau,
        proj.rect[:, 0].astype(jnp.float32),
        proj.rect[:, 1].astype(jnp.float32),
        rect_w.astype(jnp.float32),
        counts.astype(jnp.float32),
    ]
    # The mask is pure ordering/validity (boolean in the jnp twin), so it
    # carries no gradient; pallas_call has no autodiff rule anyway.
    return jax.lax.stop_gradient(
        jnp.stack(rows, axis=0).astype(jnp.float32)
    )


def cull_mask_from_params(params, kmax: int, tile_size: int,
                          interpret: bool) -> jnp.ndarray:
    """(10, R) prepared params -> (R, kmax) bool survival mask. Row-subset
    capable: the jumbo tiers call this on the gathered big-splat rows with
    kmax = max_tiles_jumbo."""
    r = params.shape[1]
    # Block lanes bounded so the (kmax, bn) output block + the kernel's ~8
    # live (kmax, bn) f32 intermediates stay inside the ~16 MB VMEM budget:
    # kmax 64-128 keeps the tuned bn=512; the jumbo grids (kmax up to 2048)
    # shrink bn instead of blowing the scoped-vmem stack.
    bn = max(128, min(512, (1 << 16) // kmax))
    r_pad = ((r + bn - 1) // bn) * bn
    params = jnp.pad(
        params, ((0, NUM_ROWS - params.shape[0]), (0, r_pad - r))
    )
    out = pl.pallas_call(
        functools.partial(_cull_kernel, kmax=kmax, ts=float(tile_size)),
        grid=(r_pad // bn,),
        in_specs=[
            pl.BlockSpec((NUM_ROWS, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kmax, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kmax, r_pad), jnp.float32),
        interpret=interpret,
    )(params)
    return out[:, :r].T > 0.5  # (R, kmax) bool


def tile_cull_mask_pallas(proj, cfg: RenderConfig) -> jnp.ndarray:
    """(N, K_max) f32 0/1 mask of candidates surviving the exact cull AND
    the rect walk bound (k < counts). proj: ProjectedGaussians."""
    return cull_mask_from_params(
        cull_params(proj, cfg), cfg.max_tiles_per_gaussian,
        cfg.tile_size, cfg.pallas_interpret,
    )
