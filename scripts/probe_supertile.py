"""Measured verdict on a literal hierarchical (supertile) tile-binning
pre-pass (BASELINE.json config-5 phrase; PARITY.md "hierarchical tile
binning" row; VERDICT r4 task 5).

The claim to test: a coarse-to-fine pre-pass (test 4x4-supertiles first,
then fine tiles only inside surviving supertiles) is DOMINATED on TPU
because (a) the fine (N, K_max) cull grid must be materialized for the
downstream compaction sort regardless (its shape is static -- a pre-pass
cannot shrink it), and (b) a TPU vector lane evaluates the masked fine
ellipse test at full rate (no divergence to save), so the pre-pass only
ADDS its own (N, K_max/16) grid cost.

This probe MEASURES both sides at the bench shape (1M realistic Gaussians,
1080p, tile 32):
  - the production fine cull kernel at (N, 128) lanes,
  - the same kernel math at supertile granularity: tile_size*4 = 128 px
    supertiles, K_max/16 = 8 lanes -- EXACTLY the (N, K/16) pre-pass grid
    (the ellipse-vs-rect min-quadratic test is the same arithmetic for a
    128 px box as for a 32 px box, so this is the pre-pass's true cost).

    python -u scripts/probe_supertile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import realistic_scene
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.ops.pallas.cull import tile_cull_mask_pallas
from gsplat_tpu.ops.projection import project_gaussians

cfg_fine = RenderConfig(
    width=1920, height=1080, tile_size=32, max_intersections=4_100_000,
    max_tiles_per_gaussian=128, block_size=32, max_per_tile=8192,
    binning="tiered", impl="pallas", pallas_block_size=128,
    tier_spec=((4, 0), (8, 2), (16, 6), (32, 25), (64, 50)),
    max_screen_radius=144.0,
)
# Supertile pre-pass grid: 4x4 tiles -> one test per 128px supertile,
# K_max/16 lanes. Same kernel, same per-lane math, coarser geometry.
# (pallas_block_size shrunk only to satisfy the BLEND kernel's VMEM
# validation -- this probe never runs the blend.)
cfg_coarse = dataclasses.replace(
    cfg_fine, tile_size=128, max_tiles_per_gaussian=8,
    pallas_block_size=8,
)

scene = jax.device_put(realistic_scene(jax.random.key(0), 1_000_000))
cam = Camera.default(1920, 1080)


def timeit(fn, *a, iters=20):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000, out


for name, cfg in [("fine (N,128) tile32", cfg_fine),
                  ("coarse (N,8) supertile128 pre-pass", cfg_coarse)]:
    proj = jax.jit(
        lambda s, cfg=cfg: project_gaussians(s, cam, cfg)
    )(scene)
    f = jax.jit(lambda p, cfg=cfg: tile_cull_mask_pallas(p, cfg))
    ms, out = timeit(f, proj)
    lanes = out.shape[0] * out.shape[1]
    print(f"{name}: {ms:.2f} ms standalone ({lanes/1e6:.1f}M lanes, "
          f"{ms*1e6/lanes:.2f} ns/lane)", flush=True)

print(
    "verdict basis: the fine (N, K_max) grid is a STATIC shape consumed by "
    "the compaction sort -- a surviving-supertile pre-pass cannot shrink "
    "it, so the coarse cost above is pure addition.", flush=True,
)
