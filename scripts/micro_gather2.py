"""Microbenchmark round 2: cheaper gather encodings + sort costs.

Finding from micro_gather.py: the (F, M) 2-D column gather is
data-INDEPENDENT at ~52 ms for F=10, M=4.1M -- i.e. ~1.3 ns per gathered
ELEMENT, far from bandwidth-bound. So the lever is fewer/wider elements:

  - complex64 packing: 2 f32 rows per complex row (same element cost moves
    8 B instead of 4 B) -> expect ~2x
  - row gather (axis=0) with a wide contiguous row: slice_sizes=(1, F) makes
    the inner dim a contiguous slice -- if TPU lowers it as a per-row block
    copy this is the real fix; the (M, F) -> (F, M) transpose after is
    bandwidth-bound.

Also times the sorts the pipeline leans on (4.1M and 13.3M lanes).

Run: python -u scripts/micro_gather2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F, N, M = 10, 1_000_000, 4_100_000
LANES = 13_300_000  # candidate lanes at tier_spec (8,5,64)


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
    gid = jnp.asarray(np.sort(rng.integers(0, N, size=M, dtype=np.int32)))

    ref = None

    @jax.jit
    def take2d(g):
        return jnp.take(feats, g, axis=1)

    @jax.jit
    def take_c64(g):
        c = jax.lax.complex(feats[0:5], feats[5:10])  # (5, N) c64
        out = jnp.take(c, g, axis=1)                   # (5, M)
        return jnp.concatenate([jnp.real(out), jnp.imag(out)], axis=0)

    @jax.jit
    def take_rows(g):
        fnf = feats.T  # (N, F); in the pipeline we'd build this directly
        return jnp.take(fnf, g, axis=0)  # (M, F) -- no transpose back

    @jax.jit
    def take_rows_t(g):
        fnf = feats.T
        return jnp.take(fnf, g, axis=0).T  # (F, M)

    @jax.jit
    def take_rows16_t(g):
        fnf = jnp.zeros((N, 16), jnp.float32).at[:, :F].set(feats.T)
        return jnp.take(fnf, g, axis=0).T[:F]

    names = [
        ("2d take f32x10", take2d),
        ("2d take c64x5", take_c64),
        ("rows (M,10)", take_rows),
        ("rows (M,10)+T", take_rows_t),
        ("rows (M,16)+T", take_rows16_t),
    ]
    ref = take2d(gid)
    for name, fn in names:
        ms, out = timeit(fn, gid)
        if out.shape == ref.shape:
            ok = bool(jnp.allclose(out, ref))
        elif out.shape == (M, F):
            ok = bool(jnp.allclose(out.T, ref))
        else:
            ok = bool(jnp.allclose(out[:F], ref))
        print(f"{name:16s} {ms:8.2f} ms  match={ok}", flush=True)

    # Sorts.
    k4 = jax.random.bits(key, (M,), jnp.uint32)
    v4 = jnp.arange(M, dtype=jnp.int32)
    k13 = jax.random.bits(key, (LANES,), jnp.uint32)
    v13 = jnp.arange(LANES, dtype=jnp.int32)

    @jax.jit
    def skv(k, v):
        return jax.lax.sort_key_val(k, v, is_stable=False)

    ms, _ = timeit(skv, k4, v4)
    print(f"sort_key_val 4.1M:  {ms:8.2f} ms", flush=True)
    ms, _ = timeit(skv, k13, v13)
    print(f"sort_key_val 13.3M: {ms:8.2f} ms", flush=True)

    rows = jax.random.normal(key, (F, M), jnp.float32)

    @jax.jit
    def variadic(k, r):
        return jax.lax.sort((k,) + tuple(r[i] for i in range(F)), num_keys=1,
                            is_stable=False)

    ms, _ = timeit(variadic, k4, rows)
    print(f"variadic 11-op 4.1M:{ms:8.2f} ms", flush=True)

    @jax.jit
    def variadic_c(k, r):
        c = jax.lax.complex(r[0:5], r[5:10])
        out = jax.lax.sort((k,) + tuple(c[i] for i in range(5)), num_keys=1,
                           is_stable=False)
        return out

    try:
        ms, _ = timeit(variadic_c, k4, rows)
        print(f"variadic 6-op c64:  {ms:8.2f} ms", flush=True)
    except Exception as e:  # complex sort values may be unsupported
        print(f"variadic 6-op c64:  FAILED ({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
