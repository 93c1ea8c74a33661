"""Command-line entry point.

The TPU-native replacement for the reference's browser app shell
(reference: src/app.ts, index.html): file pickers become flags, the canvas
becomes PNG output, the tile-size <select> becomes --tile-size, and the
interactive camera becomes --camera presets / --orbit.

Subcommands:
  render   PLY (+ optional cameras.json) -> PNG(s)
  info     print scene statistics
  bench    timing on the current default device (TPU if available)
  train    fit a scene to target images (see gsplat_tpu/train)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_cfg(args, width: int, height: int):
    from gsplat_tpu.config import RenderConfig

    if getattr(args, "viewer_preset", False):
        # The measured interactive-viewer configuration (PROFILE.md
        # round-5 viewer section: 45.8 ms random / 43.2 ms realistic at
        # 800^2 with 1M Gaussians, overflow-free on BOTH): tile 32,
        # dual-distribution tier ladder, K_max 32 + jumbo tiers to 1024,
        # packed16 stream, 3-pass bf16 kernel matmuls. The reference's
        # defaults are its own interactive loop (index.html:19-24);
        # without this preset `cli render` uses the portable jnp/sort
        # path, which is 10x off.
        return RenderConfig(
            width=width, height=height, tile_size=32,
            max_intersections=args.max_intersections
            if args.max_intersections != (1 << 22) else 2_330_000,
            max_tiles_per_gaussian=32, block_size=32, max_per_tile=8192,
            sh_degree=args.sh_degree, impl="pallas", binning="tiered",
            tier_spec=((4, 0), (8, 6), (16, 35), (32, 135)),
            pallas_block_size=128, stream_format="packed4",
            matmul_precision="high",
            # Captures put thousands of splats past K_max 32 at 800^2
            # (bench.py viewer comment has the measured tail); jumbo tiers
            # render them in full instead of truncating.
            max_tiles_jumbo=1024,
            jumbo_tier_spec=(
                (64, 11264), (128, 5120), (256, 1792), (512, 512),
                (1024, 64),
            ),
        )
    return RenderConfig(
        width=width,
        height=height,
        tile_size=args.tile_size,
        max_intersections=args.max_intersections,
        max_tiles_per_gaussian=args.max_tiles_per_gaussian,
        block_size=args.block_size,
        max_per_tile=args.max_per_tile,
        sh_degree=args.sh_degree,
        impl=args.impl,
        binning=args.binning,
        gather_backward=args.gather_backward,
        grad_readout=args.grad_readout,
        segment_sum=args.segment_sum,
        stream_format=args.stream_format,
    )


def _bucket(n: int) -> int:
    """Round a Gaussian count up to the nearest capacity bucket (1, 1.5,
    2, 3, 4, 6, 8 ... x 10^k). Scenes padded to a shared bucket reuse ONE
    compiled graph (XLA keys on shapes), so `cli warmup` can precompile
    the viewer preset once per bucket and any PLY under that size starts
    warm -- the static-shape answer to 'first frame takes minutes'.
    Padding slots carry -inf opacity logits (zero opacity -> no
    contribution, culled by the rect mask)."""
    k = 1
    while True:
        for m in (10, 15, 20, 30, 40, 60, 80):
            b = m * k // 10
            if n <= b:
                return b
        k *= 10


def _common_flags(p: argparse.ArgumentParser):
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--tile-size", type=int, default=16, choices=[8, 16, 32],
                   help="tile size (reference: index.html:20-24)")
    p.add_argument("--max-intersections", type=int, default=1 << 22)
    p.add_argument("--max-tiles-per-gaussian", type=int, default=64)
    p.add_argument("--block-size", type=int, default=32)
    p.add_argument("--max-per-tile", type=int, default=4096)
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--impl", default="jnp", choices=["jnp", "pallas"])
    p.add_argument("--binning", default="sort", choices=["sort", "scatter", "packed", "tiered"])
    p.add_argument("--gather-backward", default="variadic",
                   choices=["variadic", "permute", "c64", "bf16"],
                   help="slot-gradient reduction strategy (see RenderConfig)")
    p.add_argument("--grad-readout", default="f32", choices=["f32", "bf16"])
    p.add_argument("--segment-sum", default="doubling",
                   choices=["doubling", "pallas"])
    p.add_argument("--stream-format", default="f32",
                   choices=["f32", "packed16", "packed4"],
                   help="packed16: 5 int32 rows instead of 9 f32 (fastest; "
                   "quantized forward, straight-through grads)")


def _load_scene(args):
    from gsplat_tpu.io.ply import load_ply
    from gsplat_tpu.models.gaussians import random_scene

    if args.ply == "synthetic":
        import jax

        return random_scene(jax.random.key(args.seed), args.synthetic_n,
                            sh_degree=min(args.sh_degree, 3))
    return load_ply(args.ply)


def cmd_render(args) -> int:
    import jax
    import numpy as np

    from gsplat_tpu.ops.camera import Camera, orbit_cameras
    from gsplat_tpu.render.pipeline import render_jit
    from gsplat_tpu.utils.image import write_png

    scene = _load_scene(args)
    print(f"scene: {scene.num_gaussians} gaussians, SH degree {scene.sh_degree}")
    if getattr(args, "pad_bucket", False):
        b = _bucket(scene.num_gaussians)
        if b > scene.num_gaussians:
            scene = scene.pad_to(b)
            print(f"padded to capacity bucket {b} (compile-cache reuse)")

    cfg = _build_cfg(args, args.width, args.height)
    if args.cameras:
        from gsplat_tpu.io.cameras import load_cameras

        cams = load_cameras(args.cameras, width_override=args.width,
                            height_override=args.height)
        if args.camera_index is not None:
            cams = [cams[args.camera_index]]
    elif args.orbit:
        center = np.asarray(scene.means).mean(0)
        radius = float(np.percentile(
            np.linalg.norm(np.asarray(scene.means) - center, axis=-1), 90) * 2.0)
        cams = [
            (f"orbit_{i:03d}", c)
            for i, c in enumerate(orbit_cameras(
                center, radius, args.orbit, args.width, args.height,
                fx=float(args.width), fy=float(args.height)))
        ]
    else:
        cams = [("default", Camera.default(args.width, args.height))]

    for name, cam in cams:
        t0 = time.time()
        out = render_jit(scene, cam, cfg)
        out.image.block_until_ready()
        dt = time.time() - t0
        path = args.output.replace("{}", name)
        write_png(path, np.asarray(out.image))
        print(
            f"{name}: {dt * 1000:.1f} ms, {int(out.num_intersections)} intersections"
            f"{' [OVERFLOW]' if bool(out.overflow) else ''} -> {path}"
        )
    return 0


def cmd_info(args) -> int:
    import numpy as np

    scene = _load_scene(args)
    means = np.asarray(scene.means)
    print(json.dumps({
        "num_gaussians": int(scene.num_gaussians),
        "sh_degree": int(scene.sh_degree),
        "bbox_min": means.min(0).tolist(),
        "bbox_max": means.max(0).tolist(),
        "mean_scale": float(np.exp(np.asarray(scene.log_scales)).mean()),
    }, indent=2))
    return 0


def cmd_bench(args) -> int:
    """The reference's perf surface is per-pass console timing in a browser
    (reference: src/renderer.ts:395-590); here: a reproducible bench plus
    optional on-device profiler traces (--profile DIR, view with
    tensorboard/xprof)."""
    import contextlib

    from gsplat_tpu.utils.bench import run_bench

    trace_ctx = contextlib.nullcontext()
    if args.profile:
        import jax

        trace_ctx = jax.profiler.trace(args.profile)
    with trace_ctx:
        result = _run_bench_args(args, run_bench)
    print(json.dumps(result))
    return 0


def _run_bench_args(args, run_bench):
    return run_bench(
        num_gaussians=args.synthetic_n,
        width=args.width,
        height=args.height,
        impl=args.impl,
        mode=args.mode,
        iters=args.iters,
        tile_size=args.tile_size,
        max_intersections=args.max_intersections,
        block_size=args.block_size,
        ply=None if args.ply == "synthetic" else args.ply,
        binning=args.binning,
        sharded_tiles=args.sharded_tiles or None,
        data_shards=args.data_shards,
        ssim_weight=args.ssim_weight,
    )


def cmd_train(args) -> int:
    from gsplat_tpu.train.loop import train_from_cli

    return train_from_cli(args)


def cmd_warmup(args) -> int:
    """Precompile the viewer-preset render graph into the persistent
    compile cache for each capacity bucket, so a later
    `cli render PLY --viewer-preset --pad-bucket` starts warm (seconds)
    instead of cold-compiling minutes into its first frame. The reference
    never compiles per-frame (WGSL pipelines build in ms); this is the
    XLA-native equivalent: compile once, serve every scene under the
    bucket."""
    import time as _t

    import jax

    from gsplat_tpu.models.gaussians import random_scene
    from gsplat_tpu.ops.camera import Camera
    from gsplat_tpu.render.pipeline import render_jit

    buckets = [int(x) for x in args.buckets.split(",")]
    args.viewer_preset = True
    cfg = _build_cfg(args, args.width, args.height)
    cam = Camera.default(args.width, args.height)
    for b in buckets:
        scene = random_scene(jax.random.key(0), b,
                             sh_degree=min(args.sh_degree, 3))
        t0 = _t.time()
        render_jit(scene, cam, cfg).image.block_until_ready()
        t1 = _t.time()
        render_jit(scene, cam, cfg).image.block_until_ready()
        t2 = _t.time()
        print(f"bucket {b}: compile+first {t1 - t0:.1f} s, "
              f"steady frame {(t2 - t1) * 1000:.1f} ms")
    return 0


def _enable_compile_cache():
    """Persistent XLA compilation cache: the fwd+bwd graph cold-compiles in
    minutes (see bench.py); warm invocations reuse the serialized binary."""
    import os

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_gsplat"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except (OSError, AttributeError):
        pass  # read-only FS or old jax: run without the cache


def main(argv=None) -> int:
    _enable_compile_cache()
    parser = argparse.ArgumentParser("gsplat-tpu",
                                     description="TPU-native 3D Gaussian Splatting")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="render PLY to PNG")
    p.add_argument("ply", help="path to .ply, or 'synthetic'")
    p.add_argument("--cameras", help="cameras.json path")
    p.add_argument("--camera-index", type=int)
    p.add_argument("--orbit", type=int, help="render N orbit views")
    p.add_argument("--output", "-o", default="render_{}.png",
                   help="output path; '{}' is replaced by the camera name")
    p.add_argument("--synthetic-n", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--viewer-preset", action="store_true",
                   help="the measured interactive config (tile 32, tiered "
                        "ladder, K_max 32, packed16; PROFILE.md viewer "
                        "ledger) instead of the portable defaults")
    p.add_argument("--pad-bucket", action="store_true",
                   help="pad the scene to the nearest capacity bucket so "
                        "the compiled graph (and `cli warmup`'s cache "
                        "entries) are shared across scenes")
    _common_flags(p)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser(
        "warmup",
        help="precompile viewer-preset render graphs per capacity bucket "
             "into the persistent cache (then `render --viewer-preset "
             "--pad-bucket` starts warm)")
    p.add_argument("--buckets", default="600000,800000,1000000",
                   help="comma-separated Gaussian capacity buckets")
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--max-intersections", type=int, default=1 << 22)
    p.set_defaults(fn=cmd_warmup)

    p = sub.add_parser("info", help="scene statistics")
    p.add_argument("ply")
    p.add_argument("--synthetic-n", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sh-degree", type=int, default=3)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("bench", help="benchmark fwd / fwd+bwd throughput")
    p.add_argument("--ply", default="synthetic")
    p.add_argument("--synthetic-n", type=int, default=1_000_000)
    p.add_argument("--mode", default="fwd_bwd", choices=["fwd", "fwd_bwd"])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile", metavar="DIR",
                   help="write a jax.profiler trace to DIR (xprof/tensorboard)")
    p.add_argument("--sharded-tiles", type=int, default=0,
                   help="bench the tile-sharded distributed path on an "
                        "N-shard 'tiles' mesh (max-intersections becomes "
                        "the per-shard capacity)")
    p.add_argument("--data-shards", type=int, default=1)
    p.add_argument("--ssim-weight", type=float, default=0.0)
    _common_flags(p)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("train", help="fit a scene to target renders")
    p.add_argument("--ply", default="synthetic")
    p.add_argument("--synthetic-n", type=int, default=5000)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="trained.ply")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--resume", help="checkpoint path to resume from")
    p.add_argument("--densify-every", type=int, default=0,
                   help="adaptive density control interval (0 = off); the "
                        "scene is padded to --capacity")
    p.add_argument("--capacity", type=int, default=0,
                   help="static Gaussian capacity for densification "
                        "(default 2x the initial count)")
    p.add_argument("--densify-grad-threshold", type=float, default=2e-4)
    p.add_argument("--densify-from", type=int, default=0,
                   help="first densification step (graphdeco: 500)")
    p.add_argument("--densify-until", type=int, default=None,
                   help="stop densifying after this step (default steps/2)")
    p.add_argument("--densify-max-scale", type=float, default=None,
                   help="prune splats whose world scale exceeds this "
                        "(3DGS 5.2 big-splat prune)")
    p.add_argument("--opacity-reset-every", type=int, default=0,
                   help="periodic opacity reset interval (3DGS 5.2)")
    p.add_argument("--overflow-policy", default="raise",
                   choices=["raise", "warn", "ignore"])
    p.add_argument("--ssim-weight", type=float, default=0.2,
                   help="loss = (1-w)*L1 + w*DSSIM (0 disables SSIM)")
    p.add_argument("--batch", type=int, default=1,
                   help="views per training step")
    p.add_argument("--sh-warmup-every", type=int, default=0,
                   help="activate one more SH band every N steps "
                        "(graphdeco oneupSHdegree; 0 = all bands from "
                        "step 0)")
    p.add_argument("--position-lr-final-ratio", type=float, default=None,
                   help="exponential position-lr decay to lr*ratio over "
                        "the run (graphdeco: 0.01)")
    p.add_argument("--holdout-views", type=int, default=0,
                   help="extra orbit views excluded from training, used "
                        "for held-out PSNR")
    p.add_argument("--eval-every", type=int, default=0,
                   help="held-out PSNR eval interval (needs "
                        "--holdout-views)")
    p.add_argument("--metrics-csv", default=None,
                   help="append per-step metrics rows to this CSV")
    _common_flags(p)
    p.set_defaults(fn=cmd_train)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
