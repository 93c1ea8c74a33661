"""Sub-stage timing of bin_gaussians (the largest pipeline stage at r01:
~60 ms of the 196 ms iteration). Isolates, at the bench config:

  1. the fused Pallas ellipse-tile cull mask   (N, K_max)
  2. the per-row compaction sort of surviving tile slots (N, K_max lanes)
  3. tiered candidate assembly (pool compaction sorts + rect walk)
  4. the big packed-key lax.sort (candidate lanes -> sorted stream)
  5. range searchsorted

Usage: python scripts/profile_binning.py [--n 1000000] [--tier-spec 8,5,64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / iters * 1000, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--max-intersections", type=int, default=4_100_000)
    ap.add_argument("--tile-size", type=int, default=32)
    ap.add_argument("--tier-spec", default="8,5,64")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from gsplat_tpu.config import RenderConfig
    from gsplat_tpu.models.gaussians import random_scene
    from gsplat_tpu.ops import binning as B
    from gsplat_tpu.ops.camera import Camera
    from gsplat_tpu.ops.projection import project_gaussians

    spec = tuple(
        tuple(int(y) for y in x.split(":")) if ":" in x else int(x)
        for x in args.tier_spec.split(",")
    )
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        tile_size=args.tile_size,
        max_intersections=args.max_intersections,
        max_tiles_per_gaussian=64,
        block_size=32,
        max_per_tile=8192,
        binning="tiered",
        impl="pallas",
        pallas_block_size=128,
        tier_spec=spec,
    )
    scene = jax.device_put(random_scene(jax.random.key(0), args.n, sh_degree=3))
    cam = Camera.default(cfg.width, cfg.height)
    proj = jax.jit(lambda s: project_gaussians(s, cam, cfg))(scene)
    proj = jax.block_until_ready(proj)
    n, kmax = args.n, cfg.max_tiles_per_gaussian

    # 1. cull mask
    cull = jax.jit(
        lambda p: B._rect_cull_mask(
            p, cfg, n, kmax, jnp.maximum(p.rect[:, 2] - p.rect[:, 0], 1)
        )
    )
    ms, valid_all = timeit(cull, proj, iters=args.iters)
    print(f"cull mask (pallas):   {ms:8.2f} ms", flush=True)

    # 2. per-row compaction sort
    k = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    compact = jax.jit(
        lambda v: jnp.sort(jnp.where(v, k, kmax), axis=1, stable=False)
    )
    ms, _ = timeit(compact, valid_all, iters=args.iters)
    print(f"compact_k row sort:   {ms:8.2f} ms", flush=True)

    # 3. tier assembly (includes 1+2)
    tiered = jax.jit(lambda p: B._tiered_candidates(p, cfg, cfg.num_tiles))
    ms, out = timeit(tiered, proj, iters=args.iters)
    key, gidk, total, povf, counts = out
    lanes = key.shape[0]
    nvalid = int(total)
    print(
        f"tiered candidates:    {ms:8.2f} ms   "
        f"(lanes={lanes}, valid={nvalid}, {100*nvalid/lanes:.0f}% occupied)",
        flush=True,
    )

    # 4. the big sort alone at the real candidate count
    key = B.pack_tile_depth_key(tile, depth, cfg.num_tiles)
    key = jnp.where(validc, key, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    gidk = (jax.lax.shift_left(gid, jnp.int32(B.KBITS)) | kidx).reshape(-1)
    key, gidk = jax.block_until_ready((key, gidk))
    bigsort = jax.jit(
        lambda kk, vv: jax.lax.sort((kk, vv), num_keys=1, is_stable=False)
    )
    ms, _ = timeit(bigsort, key, gidk, iters=args.iters)
    print(f"packed-key sort:      {ms:8.2f} ms   ({lanes} lanes x 2 ops)", flush=True)

    # 5. searchsorted over the truncated stream
    s_key, _ = bigsort(key, gidk)
    s_tile = jnp.minimum(
        jax.lax.shift_right_logical(
            s_key[: cfg.max_intersections],
            jnp.uint32(B.depth_bits_for(cfg.num_tiles)),
        ),
        jnp.uint32(cfg.num_tiles),
    ).astype(jnp.int32)
    ss = jax.jit(
        lambda st: jnp.searchsorted(
            st, jnp.arange(cfg.num_tiles + 1, dtype=jnp.int32), side="left"
        )
    )
    ms, _ = timeit(ss, s_tile, iters=args.iters)
    print(f"ranges searchsorted:  {ms:8.2f} ms", flush=True)

    # full bin for reference
    binf = jax.jit(lambda p: B.bin_gaussians(p, cfg))
    ms, binned = timeit(binf, proj, iters=args.iters)
    print(
        f"FULL bin_gaussians:   {ms:8.2f} ms   "
        f"(I={int(binned.num_intersections)}, overflow={bool(binned.overflow)})",
        flush=True,
    )


if __name__ == "__main__":
    main()
