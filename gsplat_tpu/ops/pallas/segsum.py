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


def _rne_bf16_bits(x):
    """Round f32 -> bf16 (round-to-nearest-even) and return the bf16 bits in
    the TOP 16 bits of a uint32 (low 16 zero). Standard bit trick:
    u + 0x7FFF + lsb(u>>16), then truncate. Not NaN/inf-preserving in the
    payload bits -- gradients are finite by construction."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    return r & jnp.uint32(0xFFFF0000)


def _kernel_packed(x_ref, rows_ref, out_ref, carry_f, carry_r, *, kmax: int,
                   b: int):
    """Packed twin of _kernel: INT32 lanes hold bf16 PAIRS
    (binning._pack_bf16_pairs layout -- even row in the low 16 bits, odd row
    high; int32 rather than f32 because a pair with a zero high half is an
    f32 denormal, which TPU compute flushes to zero). Unpacks to f32 in
    VMEM, runs the same doubling + carry on the 2P unpacked rows, re-rounds
    the sums to bf16 and writes them re-packed -- so both the sort feeding
    this kernel and the run-start take after it move half the elements."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_f[...] = jnp.zeros_like(carry_f)
        carry_r[...] = jnp.full_like(carry_r, -2)

    u = jax.lax.bitcast_convert_type(x_ref[...], jnp.uint32)  # (P, B)
    xe = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    xo = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    xb = jnp.concatenate([xe, xo], axis=0)  # (2P, B): even block, odd block
    rb = rows_ref[...]  # (1, B)

    s = 1
    while s < kmax and s < b:
        rsh = _shift_left_lanes(rb, s, jnp.int32(-1))
        same = (rsh == rb).astype(xb.dtype)
        xb = xb + _shift_left_lanes(xb, s, xb.dtype.type(0)) * same
        s <<= 1

    match = (rb == carry_r[0:1, 0:1]).astype(xb.dtype)
    xb = xb + carry_f[:, 0:1] * match

    p = u.shape[0]
    out_ref[...] = jax.lax.bitcast_convert_type(
        (_rne_bf16_bits(xb[:p]) >> 16) | _rne_bf16_bits(xb[p:]), jnp.int32
    )
    carry_f[:, 0:1] = xb[:, 0:1]
    carry_r[0:1, 0:1] = rb[0:1, 0:1]


def segmented_suffix_sum(
    x: jnp.ndarray,
    rows: jnp.ndarray,
    *,
    kmax: int,
    block_size: int = 2048,
    interpret: bool = False,
    packed: bool = False,
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

    With packed=True, x rows are bf16 PAIRS packed into INT32 lanes
    (ops/binning.py _pack_bf16_pairs layout, bitcast to int32 -- zero-high
    pairs are f32 denormals and must never be typed as f32 on TPU); sums
    are computed in f32 and re-rounded/re-packed, so input and output move
    half the elements.
    """
    # Compiled Pallas TPU kernels cannot run on the CPU backend; fall back
    # to interpret mode automatically so every entry point that enables
    # segment_sum='pallas' (bench --gather-backward bf16, fit_demo --fast,
    # cli --segment-sum pallas) stays runnable on CPU-only machines.
    interpret = interpret or jax.default_backend() == "cpu"
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

    kern = _kernel_packed if packed else _kernel
    carry_rows = 2 * f if packed else f
    rev = lambda t: (0, nb - 1 - t)  # noqa: E731  right-to-left walk
    return pl.pallas_call(
        functools.partial(kern, kmax=kmax, b=b),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((f, b), rev),
            pl.BlockSpec((1, b), rev),
        ],
        out_specs=pl.BlockSpec((f, b), rev),
        out_shape=jax.ShapeDtypeStruct((f, m_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((carry_rows, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, rows2d)
