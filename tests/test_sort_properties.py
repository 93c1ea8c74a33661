"""Property tests for the sort/scan primitives the pipeline builds on --
the TPU-native analogue of the reference's GPU sort self-check
(reference: src/radix_sort/utils.ts:55-81 testSort, its only test)."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops.binning import depth_bits_for, pack_tile_depth_key


def test_sort_key_val_matches_numpy():
    key = jax.random.bits(jax.random.key(0), (8192,), jnp.uint32)
    val = jnp.arange(8192, dtype=jnp.int32)
    s_key, s_val = jax.lax.sort_key_val(key, val)
    order = np.argsort(np.asarray(key), kind="stable")
    np.testing.assert_array_equal(np.asarray(s_key), np.asarray(key)[order])
    np.testing.assert_array_equal(np.asarray(s_val), order)


def test_sort_reversed_identity():
    """The reference's testSort: sort reversed 0..n-1, expect identity."""
    n = 8192
    key = jnp.arange(n - 1, -1, -1, dtype=jnp.uint32)
    s_key, s_val = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(s_key), np.arange(n))
    np.testing.assert_array_equal(np.asarray(s_val), np.arange(n - 1, -1, -1))


def test_variadic_sort_is_stable():
    """Equal keys keep candidate order (the binning relies on this for
    the present-order window/backward bookkeeping)."""
    key = jnp.zeros((512,), jnp.uint32).at[256:].set(1)
    cand = jnp.arange(512, dtype=jnp.int32)
    _, s_cand = jax.lax.sort((key, cand), num_keys=1)
    np.testing.assert_array_equal(np.asarray(s_cand), np.arange(512))


def test_cumsum_matches_numpy():
    x = jax.random.randint(jax.random.key(1), (100_000,), 0, 64, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(jnp.cumsum(x)), np.cumsum(np.asarray(x))
    )


def test_packed_key_orders_by_tile_then_depth():
    """Monotone float-bit depth packing: sorting the packed u32 key sorts by
    (tile, depth) lexicographically for positive depths."""
    n_tiles = 500
    rng = np.random.default_rng(2)
    tile = jnp.asarray(rng.integers(0, n_tiles, 4096), jnp.int32)
    depth = jnp.asarray(rng.uniform(0.01, 100.0, 4096), jnp.float32)
    key = pack_tile_depth_key(tile, depth, n_tiles)
    order = np.argsort(np.asarray(key), kind="stable")
    t_s = np.asarray(tile)[order]
    d_s = np.asarray(depth)[order]
    assert (np.diff(t_s) >= 0).all()
    same_tile = np.diff(t_s) == 0
    assert (np.diff(d_s)[same_tile] >= 0).all()
    # Tile recoverable from the key's high bits.
    db = depth_bits_for(n_tiles)
    np.testing.assert_array_equal(
        np.asarray(key) >> db, np.asarray(tile).astype(np.uint32)
    )


def test_searchsorted_ranges_partition():
    tiles = jnp.sort(
        jax.random.randint(jax.random.key(3), (2048,), 0, 64, jnp.int32)
    )
    ranges = jnp.searchsorted(tiles, jnp.arange(65, dtype=jnp.int32), side="left")
    r = np.asarray(ranges)
    t = np.asarray(tiles)
    assert r[0] == 0 and r[-1] <= 2048
    for k in range(64):
        assert (t[r[k] : r[k + 1]] == k).all()
