"""Probe: cheaper formulations of the gather-backward's run-start readout.

The readout is the per-Gaussian gradient take at run starts:
(P, M) packed stream, (N,) offsets -> (P, N); it costs 11.4 ms at the
bench shape (P=5 packed rows, M=4.1M, N=1M) = 2.3 ns per OUTPUT element,
~2x the general gather floor. Variants probed here:

  A. production form: jnp.take(x, offs, axis=1)
  B. transposed output: jnp.take(x.T, offs, axis=0) (row gather of (M, P))
  C. visible-compact: take at the V visible offsets only (plus the scatter
     back that a consumer would need)

    python -u scripts/micro_readout.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")

P, M, N, V = 5, 4_100_000, 1_000_000, 580_000
key = jax.random.key(0)
x = jax.random.randint(key, (P, M), 0, 1 << 30, dtype=jnp.int32)
offs = jnp.sort(
    jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, M,
                       dtype=jnp.int32)
)
vis_ids = jnp.sort(
    jax.random.choice(jax.random.fold_in(key, 2), N, (V,), replace=False)
).astype(jnp.int32)


def timeit(fn, *a, iters=20):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000


@jax.jit
def variant_a(x, offs):
    return jnp.take(x, offs, axis=1)


@jax.jit
def variant_b(x, offs):
    return jnp.take(x.T, offs, axis=0)  # (N, P) row gather


@jax.jit
def variant_b2(x, offs):
    # pre-transposed input (as if the segsum kernel emitted (M, P))
    xt = x.T
    return jnp.take(xt, offs, axis=0)


@jax.jit
def variant_c(x, offs, vis):
    offs_v = jnp.take(offs, vis)
    got = jnp.take(x, offs_v, axis=1)           # (P, V)
    # scatter back to (P, N) -- what a full-grad consumer needs
    out = jnp.zeros((P, N + 1), jnp.int32)
    return out.at[:, vis].set(got)[:, :N]


for name, fn, args in [
    ("A take axis=1 (production)", variant_a, (x, offs)),
    ("B take rows of x.T", variant_b, (x, offs)),
    ("C visible-compact + scatter", variant_c, (x, offs, vis_ids)),
]:
    ms = timeit(fn, *args)
    print(f"{name:32s}: {ms:7.2f} ms", flush=True)
