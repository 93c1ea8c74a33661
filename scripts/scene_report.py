"""Capacity report for a scene distribution: tier-pool occupancy, post-cull
intersection totals, K_max pressure, and suggested capacities -- over a set
of cameras (worst case governs the static budgets).

The reference resizes buffers per frame from a CPU readback
(reference: src/renderer.ts:419-441); the static-shape TPU design instead
sizes capacities up front. This script is how you size them for a real or
realistic scene before training/serving.

Usage:
  python scripts/scene_report.py --scene realistic --n 1000000 \
      --width 1920 --height 1080 --tile-size 32 --orbit 8
  python scripts/scene_report.py --ply scene.ply ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import random_scene, realistic_scene
from gsplat_tpu.ops.binning import tier_occupancy
from gsplat_tpu.ops.camera import Camera, orbit_cameras
from gsplat_tpu.ops.projection import project_gaussians


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="realistic",
                    choices=["realistic", "random"])
    ap.add_argument("--ply", help="report on a real capture instead")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tile-size", type=int, default=32)
    ap.add_argument("--kmax", type=int, default=64)
    ap.add_argument("--tier-spec", default="8,5,64")
    ap.add_argument("--orbit", type=int, default=4,
                    help="number of orbit cameras (worst case reported)")
    ap.add_argument("--max-intersections", type=int, default=1 << 23)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. when no TPU attached)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        tile_size=args.tile_size,
        max_intersections=args.max_intersections,
        max_tiles_per_gaussian=args.kmax,
        block_size=32,
        max_per_tile=8192,
        binning="tiered",
        tier_spec=tuple(
            tuple(int(y) for y in x.split(":")) if ":" in x else int(x)
            for x in args.tier_spec.split(",")
        ),
    )
    if args.ply:
        from gsplat_tpu.io.ply import load_ply

        scene = load_ply(args.ply)
    elif args.scene == "realistic":
        scene = realistic_scene(jax.random.key(args.seed), args.n)
    else:
        scene = random_scene(jax.random.key(args.seed), args.n)
    scene = jax.device_put(scene)

    import numpy as np

    cams = [Camera.default(cfg.width, cfg.height)]
    if args.orbit > 1:
        center = np.asarray(scene.means).mean(0)
        cams += orbit_cameras(
            center, radius=4.0, num=args.orbit, width=cfg.width,
            height=cfg.height, fx=float(cfg.width), fy=float(cfg.height),
        )

    project = jax.jit(lambda s, c: project_gaussians(s, c, cfg))
    worst = None
    for i, cam in enumerate(cams):
        rep = tier_occupancy(project(scene, cam), cfg)
        rep["camera"] = i
        print(json.dumps(rep), file=sys.stderr)
        if worst is None or rep["num_intersections"] > worst["num_intersections"]:
            worst = rep
    worst["scene"] = args.ply or f"{args.scene}({args.n})"
    worst["worst_of_cameras"] = len(cams)
    print(json.dumps(worst, indent=2))


if __name__ == "__main__":
    main()
