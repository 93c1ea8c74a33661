"""Quantify the image delta of cfg.max_screen_radius on the realistic scene.

Why this exists: the realistic (capture-statistics) scene's fat-splat tail
projects tile rects up to 2040 tiles at 1080p/tile32 (= the whole 60x34
grid; round-5 measurement in this file's history) -- no practical K_max
covers that raw, so the honest overflow-free config-3 bench needs the
screen-footprint clamp (config.py max_screen_radius). This probe measures
what the clamp costs in image terms.

Method -- scale-matched quarter resolution: the clamp is defined in PIXELS
and splat footprints scale linearly with resolution, so rendering the SAME
scene at 448x252 (a 14x8=112-tile grid <= K_max 128) makes the UNCLAMPED
reference render feasible on the production tiered path (at 1080p it would
need K_max 2048). The 1080p clamp of 144 px scales to 144 * (448/1920) =
33.6 px. PSNR(unclamped vs clamp 33.6) at this scale is the geometry-
matched estimate of what clamp 144 costs the 1080p bench frame.

    python -u scripts/probe_clamp_delta.py [--n 1000000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import realistic_scene
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.render.pipeline import render
from gsplat_tpu.train.losses import psnr

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--case", type=int, default=None,
                help="render only case i (0=unclamped, 1, 2) and save to "
                "/tmp/clamp_case_i.npy -- each case cold-compiles its own "
                "graph, so one process per case stays inside a timeout; "
                "omit to compare previously saved cases")
args = ap.parse_args()

W, H = 448, 252  # 14 x 8 tiles = 112 <= K_max 128: unclamped fits
SCALE = W / 1920.0

scene = jax.device_put(realistic_scene(jax.random.key(0), args.n))
cam = Camera.default(W, H)


def cfg_for(clamp):
    return RenderConfig(
        width=W, height=H, tile_size=32,
        max_intersections=1_500_000, max_tiles_per_gaussian=128,
        block_size=32, max_per_tile=8192, binning="tiered", impl="pallas",
        pallas_block_size=128,
        tier_spec=((4, 0), (8, 2), (16, 4), (32, 8), (64, 16), (128, 32)),
        max_screen_radius=clamp, stream_format="packed16",
        matmul_precision="high",
    )


cases = [0.0, 144.0 * SCALE, 320.0 * SCALE]
if args.case is not None:
    clamp = cases[args.case]
    cfg = cfg_for(clamp)
    out = jax.jit(lambda s, cfg=cfg: render(s, cam, cfg))(scene)
    np.save(f"/tmp/clamp_case_{args.case}.npy", np.asarray(out.image))
    print(f"case {args.case}: clamp={clamp:.1f}px "
          f"(= {clamp / SCALE:.0f}px at 1080p): "
          f"overflow={bool(out.overflow)} "
          f"num_intersections={int(out.num_intersections)}", flush=True)
    sys.exit(0)

imgs = [np.load(f"/tmp/clamp_case_{i}.npy") for i in range(len(cases))]
ref = imgs[0]
for i, clamp in enumerate(cases[1:], start=1):
    p = float(psnr(jnp.asarray(imgs[i]), jnp.asarray(ref)))
    d = float(np.abs(imgs[i] - ref).max())
    print(f"PSNR(clamp {clamp / SCALE:.0f}@1080p-equiv vs UNCLAMPED) = "
          f"{p:.2f} dB  (max abs err {d:.4f})", flush=True)
