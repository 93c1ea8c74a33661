"""Benchmark harness.

The reference's only performance surface is per-pass console timing in a
browser (reference: src/renderer.ts:395-590). Here: a reproducible harness
that times the jitted fwd / fwd+bwd pipeline on the current default device
and reports it/s and Mpix/s (the BASELINE.json metrics).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import random_scene
from gsplat_tpu.render.pipeline import render, render_loss


def run_bench(
    num_gaussians: int = 1_000_000,
    width: int = 1920,
    height: int = 1080,
    impl: str = "jnp",
    mode: str = "fwd_bwd",
    iters: int = 20,
    tile_size: int = 16,
    max_intersections: int = 1 << 22,
    block_size: int = 32,
    max_per_tile: int = 4096,
    ply: str | None = None,
    seed: int = 0,
    target_its: float = 30.0,
    binning: str = "sort",
    pallas_block_size: int = 256,
    tier_spec: tuple | None = None,
    max_tiles_per_gaussian: int | None = None,
) -> dict:
    extra = {}
    if tier_spec is not None:
        extra["tier_spec"] = tuple(tier_spec)
    if max_tiles_per_gaussian is not None:
        extra["max_tiles_per_gaussian"] = max_tiles_per_gaussian
    cfg = RenderConfig(
        width=width,
        height=height,
        tile_size=tile_size,
        max_intersections=max_intersections,
        block_size=block_size,
        max_per_tile=max_per_tile,
        impl=impl,
        binning=binning,
        pallas_block_size=pallas_block_size,
        **extra,
    )
    if ply:
        from gsplat_tpu.io.ply import load_ply

        scene = load_ply(ply)
    else:
        scene = random_scene(jax.random.key(seed), num_gaussians, sh_degree=3)
    scene = jax.device_put(scene)

    from gsplat_tpu.ops.camera import Camera

    cam = Camera.default(width, height)

    if mode == "fwd":
        fn = jax.jit(lambda s: render(s, cam, cfg).image, static_argnums=())
    else:
        target = jnp.zeros((height, width, 3), jnp.float32)
        fn = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))
    run = lambda: jax.block_until_ready(fn(scene))

    # Warmup / compile.
    t0 = time.time()
    run()
    compile_s = time.time() - t0
    run()

    # Steady-state throughput: dispatch the whole window, block once, so
    # host dispatch latency overlaps device work as in a real training loop.
    t0 = time.time()
    out_last = None
    for _ in range(iters):
        out_last = fn(scene)
    jax.block_until_ready(out_last)
    dt = (time.time() - t0) / iters

    its = 1.0 / dt
    mpix_s = width * height / dt / 1e6
    out = render(scene, cam, cfg)
    return {
        "metric": f"{mode} it/s @ {width}x{height}, {scene.num_gaussians} gaussians ({impl})",
        "value": round(its, 3),
        "unit": "it/s",
        # No published reference numbers exist (BASELINE.md); normalized
        # against the 30 it/s north-star target from BASELINE.json.
        "vs_baseline": round(its / target_its, 4),
        "details": {
            "ms_per_iter": round(dt * 1000, 3),
            "mpix_per_s": round(mpix_s, 2),
            "compile_s": round(compile_s, 1),
            "num_intersections": int(out.num_intersections),
            "overflow": bool(out.overflow),
            # Capacity-proportional stages (gather, backward sort) pay for
            # unused slots; ~15% headroom over the measured stream is the
            # sweet spot for a fixed camera set.
            "suggested_max_intersections": int(out.num_intersections * 1.15),
            "device": str(jax.devices()[0]),
            "impl": impl,
        },
    }
