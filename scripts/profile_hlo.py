"""Op-level profile of the FULL fwd+bwd bench graph on TPU.

Captures a jax.profiler trace of the exact bench.py workload and converts the
xplane proto to per-HLO-op time via tensorboard_plugin_profile, printing the
top ops by self time -- the map PROFILE.md is built from.

Usage: python -u scripts/profile_hlo.py [--mode fwd_bwd] [--top 40]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fwd_bwd")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--outdir", default="/tmp/jax-trace")
    ap.add_argument("--tier-spec", default="8,5,64")
    ap.add_argument("--gather-backward", default="variadic")
    ap.add_argument("--grad-readout", default="f32")
    ap.add_argument("--segment-sum", default="doubling")
    ap.add_argument("--stream-format", default="f32")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--max-intersections", type=int, default=4_100_000)
    ap.add_argument("--num-gaussians", type=int, default=1_000_000)
    ap.add_argument("--matmul-precision", default="highest")
    ap.add_argument("--kmax", type=int, default=64)
    args = ap.parse_args()

    from gsplat_tpu.config import RenderConfig
    from gsplat_tpu.models.gaussians import random_scene
    from gsplat_tpu.ops.camera import Camera
    from gsplat_tpu.render.pipeline import render, render_loss

    spec = tuple(
        tuple(int(y) for y in x.split(":")) if ":" in x else int(x)
        for x in args.tier_spec.split(",")
    )
    cfg = RenderConfig(
        width=args.width, height=args.height, tile_size=32,
        max_intersections=args.max_intersections,
        max_tiles_per_gaussian=args.kmax,
        block_size=32, max_per_tile=8192, binning="tiered", impl="pallas",
        pallas_block_size=128, tier_spec=spec,
        gather_backward=args.gather_backward,
        grad_readout=args.grad_readout,
        segment_sum=args.segment_sum,
        stream_format=args.stream_format,
        matmul_precision=args.matmul_precision,
    )
    scene = jax.device_put(
        random_scene(jax.random.key(0), args.num_gaussians, sh_degree=3)
    )
    cam = Camera.default(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    if args.mode == "fwd":
        fn = jax.jit(lambda s: render(s, cam, cfg).image)
    else:
        fn = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))

    jax.block_until_ready(fn(scene))  # compile
    jax.block_until_ready(fn(scene))

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(3):
            out = fn(scene)
        jax.block_until_ready(out)

    xplanes = glob.glob(
        os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True
    )
    xplanes.sort(key=os.path.getmtime)
    path = xplanes[-1]
    print(f"# xplane: {path}", flush=True)

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data([path], tool, {})
            break
        except Exception as e:
            print(f"# {tool} failed: {e}", flush=True)
            data = None
    if data is None:
        sys.exit(1)
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")

    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        print(data[:2000])
        sys.exit(0)
    cols = rows[0].keys()
    tkey = next(
        (k for k in cols if "self" in k.lower() and "time" in k.lower()), None
    )
    print(f"# columns: {list(cols)}", flush=True)
    rows.sort(key=lambda r: -float(r.get(tkey, 0) or 0))
    total = sum(float(r.get(tkey, 0) or 0) for r in rows)
    print(f"# total self time: {total:.0f} us over {len(rows)} ops")
    namek = next((k for k in cols if "name" in k.lower()), None)
    catk = next((k for k in cols if "categor" in k.lower() or "type" in k.lower()), None)
    for r in rows[: args.top]:
        t = float(r.get(tkey, 0) or 0)
        print(
            f"{t:10.0f} us {100*t/total:5.1f}%  {r.get(catk,''):24s} "
            f"{(r.get(namek,'') or '')[:110]}"
        )


if __name__ == "__main__":
    main()
