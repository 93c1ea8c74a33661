"""Pallas TPU segmented suffix-sum over the gid-major gradient stream.

The gather backward (ops/binning.py _gather_slots_bwd) reduces per-slot
gradient rows to per-Gaussian totals: after the gidk sort the stream is
gid-major, so each Gaussian's gradient is the sum of a contiguous run, read
out at the run's first slot. XLA expresses that reduction as ceil(log2 K_max)
masked shift+add passes over the full (F, max_I) stream -- 6 full HBM
round-trips at K_max=64 (~12 ms of the 196 ms iteration, PROFILE.md). This
kernel does the same reduction in ONE pass: each grid step loads a (F, B)
block, runs the log2(K_max) doubling steps entirely in VMEM/VPU, and chains
runs that cross block boundaries through a carry kept in scratch, walking
blocks RIGHT-to-LEFT (suffix sums need the continuation total before the run
start is reached).

Reference analogue: none -- the reference has no backward pass at all; this
is part of the TPU replacement for the CUDA 3DGS backward's atomic gradient
scatter (reference: src/compute_tiles.wgsl has no gradient path).

Race-freedom: the single grid dimension is 'arbitrary' (sequential on the
TensorCore), so the carry handoff between consecutive blocks needs no
synchronization -- same argument as the raster backward's block-0 RMW
(ops/pallas/raster.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_left_lanes(x, s, fill):
    """y[..., j] = x[..., j+s], tail filled -- static s, lane axis last."""
    pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
    return jnp.concatenate([x[..., s:], pad], axis=-1)


def _kernel(x_ref, rows_ref, out_ref, carry_f, carry_r, *, kmax: int, b: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_f[...] = jnp.zeros_like(carry_f)
        # -2 matches no row id (valid gids >= 0, invalid/pad rows are large
        # positives), so the rightmost block starts with an empty carry.
        carry_r[...] = jnp.full_like(carry_r, -2)

    xb = x_ref[...]  # (F, B)
    rb = rows_ref[...]  # (1, B) int32, sorted ascending across the stream

    # In-VMEM segmented suffix-sum by doubling: runs are <= kmax slots long
    # (a Gaussian touches at most K_max tiles), so log2(kmax) steps suffice
    # within a block; runs crossing the block's right edge are completed by
    # the carry below.
    s = 1
    while s < kmax and s < b:
        rsh = _shift_left_lanes(rb, s, jnp.int32(-1))
        same = (rsh == rb).astype(xb.dtype)  # (1, B)
        xb = xb + _shift_left_lanes(xb, s, xb.dtype.type(0)) * same
        s <<= 1

    # Chain runs that continue into the block to the right: every lane whose
    # row equals the NEXT block's first row belongs to that boundary run
    # (rows are sorted, so they form this block's suffix).
    match = (rb == carry_r[0:1, 0:1]).astype(xb.dtype)  # (1, B)
    xb = xb + carry_f[:, 0:1] * match

    out_ref[...] = xb
    carry_f[:, 0:1] = xb[:, 0:1]
    carry_r[0:1, 0:1] = rb[0:1, 0:1]


def segmented_suffix_sum(
    x: jnp.ndarray,
    rows: jnp.ndarray,
    *,
    kmax: int,
    block_size: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[:, j] = sum_{k >= j, rows[k] == rows[j]} x[:, k].

    x: (F, M) float32 gradient rows in gid-major run order; rows: (M,) int32
    run ids, sorted ascending, each run at most `kmax` long (runs longer
    than kmax are summed only kmax-deep -- the same contract as the XLA
    doubling path; the pipeline's one long run, the invalid-slot tail,
    carries zero values so this never matters). Returns
    (F, M_padded) with M_padded = M rounded up to block_size -- run totals
    sit at run starts, so callers indexing by run-start offset can use the
    padded array directly (pad lanes form their own all-zero run).
    """
    f, m = x.shape
    b = block_size
    nb = -(-m // b)
    m_pad = nb * b
    if m_pad != m:
        # One extra copy; size max_intersections to a block_size multiple to
        # skip it.
        x = jnp.pad(x, ((0, 0), (0, m_pad - m)))
        rows = jnp.pad(rows, (0, m_pad - m), constant_values=jnp.int32(2**30))
    rows2d = rows.reshape(1, m_pad)

    rev = lambda t: (0, nb - 1 - t)  # noqa: E731  right-to-left walk
    return pl.pallas_call(
        functools.partial(_kernel, kmax=kmax, b=b),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((f, b), rev),
            pl.BlockSpec((1, b), rev),
        ],
        out_specs=pl.BlockSpec((f, b), rev),
        out_shape=jax.ShapeDtypeStruct((f, m_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((f, 128), x.dtype),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, rows2d)
