"""Microbenchmark: gather strategies for the sorted feature stream.

The pipeline's two big gathers read (F=10, M~4.1M) columns out of (F, N=1M)
tables by a per-slot Gaussian id. XLA TPU's flat 1-D take has a fast path
whose runtime is data-dependent: fast on random index streams, ~10-300x
slower on (locally) monotone ones -- and every index stream here is
tile-sorted (mostly monotone). Hypothesis under test: routing the gather
through a TRANSPOSE shuffle restores the fast path at the cost of two
bandwidth-bound transposes:

    view j = (q, r) on a (Q, R) grid; gather in (r, q) scan order, where
    consecutive indices sample the stream R apart (uncorrelated tiles),
    then transpose the gathered block back.

Run on the real TPU: python scripts/micro_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F, N, M = 10, 1_000_000, 4_100_000
R = 2048  # shuffle stride; Q*R >= M


def timeit(fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / iters * 1000, out


def main():
    key = jax.random.key(0)
    feats = jax.random.normal(key, (F, N), jnp.float32)
    rng = np.random.default_rng(0)
    gid_np = rng.integers(0, N, size=M, dtype=np.int32)
    gid_sorted = np.sort(gid_np)  # worst case: globally monotone
    # Tile-sorted-like: ~2k segments, random ids inside each segment but the
    # same local neighborhood repeats -- mirrors the real sorted_gid stream.
    seg = rng.integers(0, N, size=(2048, 2048), dtype=np.int32)
    gid_tileish = np.sort(seg, axis=1).reshape(-1)[:M].copy()
    gid = jnp.asarray(gid_np)
    gid_mono = jnp.asarray(gid_sorted)
    gid_tile = jnp.asarray(gid_tileish)

    q = -(-M // R)
    mpad = q * R

    @jax.jit
    def take2d(g):
        return jnp.take(feats, g, axis=1)

    @jax.jit
    def takeflat(g):
        flat_idx = (
            jnp.arange(F, dtype=jnp.int32)[:, None] * N + g[None, :]
        ).reshape(-1)
        return jnp.take(feats.reshape(-1), flat_idx).reshape(F, M)

    @jax.jit
    def take_transposed(g):
        gp = jnp.concatenate([g, jnp.zeros((mpad - M,), g.dtype)])
        gs = gp.reshape(q, R).T.reshape(-1)  # stride-R scan order
        tmp = jnp.take(feats, gs, axis=1)  # (F, mpad) in shuffled order
        out = tmp.reshape(F, R, q).transpose(0, 2, 1).reshape(F, mpad)
        return out[:, :M]

    @jax.jit
    def take_transposed_flat(g):
        gp = jnp.concatenate([g, jnp.zeros((mpad - M,), g.dtype)])
        gs = gp.reshape(q, R).T.reshape(-1)
        flat_idx = (
            jnp.arange(F, dtype=jnp.int32)[:, None] * N + gs[None, :]
        ).reshape(-1)
        tmp = jnp.take(feats.reshape(-1), flat_idx).reshape(F, mpad)
        out = tmp.reshape(F, R, q).transpose(0, 2, 1).reshape(F, mpad)
        return out[:, :M]

    for name, fn in [
        ("2d take", take2d),
        ("flat take", takeflat),
        ("2d transposed", take_transposed),
        ("flat transposed", take_transposed_flat),
    ]:
        for gname, g in [
            ("mono", gid_mono),
            ("tileish", gid_tile),
            ("random", gid),
        ]:
            ms, out = timeit(fn, g)
            ref = take2d(g)
            ok = bool(jnp.allclose(out, ref))
            print(f"{name:16s} {gname:8s} {ms:8.2f} ms  match={ok}", flush=True)


if __name__ == "__main__":
    main()
