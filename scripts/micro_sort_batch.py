"""Probe: XLA TPU sort cost -- single (M,) vs vmap-batched (B, M) vs flat
(B*M,) with view-offset keys. The protocol training trace (TRAINING.md /
PROFILE.md) shows the batched sorts at 4.4-4.9 ns/elem-op vs 0.7-0.9 for
the bench's unbatched sorts -- 68% of the 522 ms train step.

    python scripts/micro_sort_batch.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")

M = 9_557_312 // 2 * 2
B = 2
key = jax.random.key(0)
k1 = jax.random.randint(key, (B, M), 0, (1 << 31) - 1, dtype=jnp.int32).astype(jnp.uint32)
v1 = jax.random.randint(jax.random.fold_in(key, 1), (B, M), 0, (1 << 31) - 1, dtype=jnp.int32)

def timeit(fn, *a, iters=10):
    out = jax.block_until_ready(fn(*a)); t0 = time.time()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000

@jax.jit
def sort_single(k, v):  # (M,)
    return jax.lax.sort_key_val(k[0], v[0], is_stable=False)

@jax.jit
def sort_batched(k, v):  # (B, M) -- what vmap(render) produces
    return jax.lax.sort_key_val(k, v, is_stable=False)

@jax.jit
def sort_vmapped(k, v):
    return jax.vmap(lambda a, b: jax.lax.sort_key_val(a, b, is_stable=False))(k, v)

@jax.jit
def sort_flat(k, v):  # one (B*M,) sort, batch id in the high bit
    kk = (k >> 1) | (
        (jnp.arange(B, dtype=jnp.uint32)[:, None] << 31)
    )
    sk, sv = jax.lax.sort_key_val(kk.reshape(-1), v.reshape(-1), is_stable=False)
    return sk.reshape(B, M), sv.reshape(B, M)

for name, fn in [("single (M,) x1", sort_single), ("batched (B,M)", sort_batched),
                 ("vmapped (B,M)", sort_vmapped), ("flat (B*M,)", sort_flat)]:
    ms = timeit(fn, k1, v1)
    elems = (M if "single" in name else B * M) * 2
    print(f"{name:16s}: {ms:8.2f} ms  ({ms*1e6/elems:.2f} ns/elem-op)", flush=True)

# 4-operand variant (the backward gather sort shape)
M2 = 4_714_496
k2 = jax.random.randint(key, (B, M2), 0, (1 << 31) - 1, dtype=jnp.int32)
vs = [jax.random.randint(jax.random.fold_in(key, i), (B, M2), 0, (1 << 31) - 1, dtype=jnp.int32) for i in range(3)]

@jax.jit
def sort4_batched(k, a, b, c):
    return jax.lax.sort((k, a, b, c), dimension=-1, is_stable=False)

@jax.jit
def sort4_flat(k, a, b, c):
    kk = jnp.where(jnp.arange(B, dtype=jnp.int32)[:, None] > 0, k | (1 << 30), k)
    out = jax.lax.sort(
        (kk.reshape(-1), a.reshape(-1), b.reshape(-1), c.reshape(-1)),
        dimension=-1, is_stable=False)
    return tuple(o.reshape(B, M2) for o in out)

for name, fn in [("4op batched", sort4_batched), ("4op flat", sort4_flat)]:
    ms = timeit(fn, k2, *vs)
    elems = B * M2 * 4
    print(f"{name:16s}: {ms:8.2f} ms  ({ms*1e6/elems:.2f} ns/elem-op)", flush=True)
