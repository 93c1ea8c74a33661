"""Per-stage timing of the 1080p/1M pipeline on the current device.

Each stage is jitted separately (device-to-device handoffs between stages are
free compared to the stage costs) so the wall can be located. Mirrors the
reference's per-pass console timing (reference: src/renderer.ts:395-590) but
as a reproducible script.

Usage: python scripts/profile_stages.py [--binning tiered] [--n 1000000] ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import random_scene
from gsplat_tpu.ops.binning import bin_gaussians, gather_features
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.render.pipeline import render, render_loss


def timeit(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))  # compile
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
    ap.add_argument("--binning", default="tiered")
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--max-intersections", type=int, default=1 << 25)
    ap.add_argument("--pallas-block", type=int, default=256)
    ap.add_argument("--kmax", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tile-size", type=int, default=16)
    ap.add_argument("--tier-spec", default="8,5,16",
                    help="K0,div1,div2 for tiered binning")
    args = ap.parse_args()

    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        tile_size=args.tile_size,
        max_intersections=args.max_intersections,
        max_tiles_per_gaussian=args.kmax,
        block_size=32,
        max_per_tile=8192,
        binning=args.binning,
        impl=args.impl,
        pallas_block_size=args.pallas_block,
        tier_spec=tuple(int(x) for x in args.tier_spec.split(",")),
    )
    scene = jax.device_put(random_scene(jax.random.key(0), args.n, sh_degree=3))
    cam = Camera.default(cfg.width, cfg.height)

    project = jax.jit(lambda s: project_gaussians(s, cam, cfg))
    ms, proj = timeit(project, scene, iters=args.iters)
    print(f"project:        {ms:8.2f} ms")

    binf = jax.jit(lambda p: bin_gaussians(p, cfg))
    ms, binned = timeit(binf, proj, iters=args.iters)
    print(f"bin+sort+align: {ms:8.2f} ms   "
          f"(I={int(binned.num_intersections)}, overflow={bool(binned.overflow)})")

    gath = jax.jit(lambda p, b: gather_features(p, b, cfg))
    ms, feats = timeit(gath, proj, binned, iters=args.iters)
    print(f"gather:         {ms:8.2f} ms")

    if cfg.impl == "pallas":
        from gsplat_tpu.ops.pallas.raster import rasterize_pallas

        rast = jax.jit(lambda f, r: rasterize_pallas(f, r, cfg))
    else:
        from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp

        rast = jax.jit(lambda f, r: rasterize_tiles_jnp(f, r, cfg))
    ms, _ = timeit(rast, feats, binned.ranges, iters=args.iters)
    print(f"raster fwd:     {ms:8.2f} ms")

    def rast_loss(f, r):
        img, trans = rast.__wrapped__(f, r) if hasattr(rast, "__wrapped__") else rast(f, r)
        return jnp.sum(img * 0.001) + jnp.sum(trans * 0.001)

    g = jax.jit(jax.grad(rast_loss))
    ms, _ = timeit(g, feats, binned.ranges, iters=args.iters)
    print(f"raster fwd+bwd: {ms:8.2f} ms")

    full = jax.jit(lambda s: render(s, cam, cfg).image)
    ms, _ = timeit(full, scene, iters=args.iters)
    print(f"FULL fwd:       {ms:8.2f} ms")

    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    gfull = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))
    ms, _ = timeit(gfull, scene, iters=args.iters)
    print(f"FULL fwd+bwd:   {ms:8.2f} ms")


if __name__ == "__main__":
    main()
