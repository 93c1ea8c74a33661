"""Probe: does a complex64 row gather cost per ELEMENT or per BYTE on TPU?

The packed16 slot gather is the largest single op of the frame (5 int32
rows x max_I slots at ~1 ns/elem). If XLA's gather pays per element
regardless of width, pairing the 5 rows into 3 c64 rows (lax.complex of
bitcast halves) cuts it 40%.

    python scripts/micro_gather_c64.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")

N, I = 1_000_001, 4_100_000
key = jax.random.key(0)
tab5 = jax.random.randint(key, (5, N), 0, (1 << 31) - 1, dtype=jnp.int32)
idx = jax.random.randint(jax.random.fold_in(key, 1), (I,), 0, N, dtype=jnp.int32)

def timeit(fn, *a, iters=20):
    out = jax.block_until_ready(fn(*a)); t0 = time.time()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000

@jax.jit
def take5_i32(tab, g):
    return jnp.take(tab, g, axis=1, mode="clip")

@jax.jit
def take3_c64(tab, g):
    f = jax.lax.bitcast_convert_type(jnp.pad(tab, ((0, 1), (0, 0))), jnp.float32)
    c = jax.lax.complex(f[0::2], f[1::2])              # (3, N)
    s = jnp.take(c, g, axis=1, mode="clip")            # (3, I) c64
    re = jax.lax.bitcast_convert_type(jnp.real(s), jnp.int32)
    im = jax.lax.bitcast_convert_type(jnp.imag(s), jnp.int32)
    rows = jnp.stack([re, im], axis=1).reshape(6, -1)  # (6, I)
    return rows[:5]

@jax.jit
def take3_c64_raw(tab, g):
    # gather only (no repack) -- isolates the gather cost
    f = jax.lax.bitcast_convert_type(jnp.pad(tab, ((0, 1), (0, 0))), jnp.float32)
    c = jax.lax.complex(f[0::2], f[1::2])
    return jnp.take(c, g, axis=1, mode="clip")

a = take5_i32(tab5, idx); b = take3_c64(tab5, idx)
import numpy as np
assert np.array_equal(np.asarray(a), np.asarray(b[:5])), "repack mismatch"

for name, fn, elems in [
    ("take 5 x i32", take5_i32, 5 * I),
    ("take 3 x c64 (+repack)", take3_c64, 3 * I),
    ("take 3 x c64 (raw)", take3_c64_raw, 3 * I),
]:
    ms = timeit(fn, tab5, idx)
    print(f"{name:24s}: {ms:8.2f} ms  ({ms*1e6/elems:.2f} ns/elem)", flush=True)

# On-chip bit-exactness with the REAL packed16 bit patterns (ADVICE r4):
# packed row 4 is (opacity|0) -- a zero-high-half f32 DENORMAL pattern for
# every alive slot. If the TPU gather (or the complex() construction)
# flushes denormals, c64 silently zeroes all opacities.
den = tab5.at[4].set(tab5[4] & 0x0000FFFF)          # force denormal row
den = den.at[3].set((den[3] & jnp.int32(-65536)) | 1)  # tiny low bits too
a2 = take5_i32(den, idx); b2 = take3_c64(den, idx)
ok = np.array_equal(np.asarray(a2), np.asarray(b2[:5]))
nz = int(np.count_nonzero(np.asarray(a2[4])))
print(f"denormal-row bit-exact: {ok} (row4 nonzero slots: {nz}/{I})", flush=True)
