"""Self-contained training demo: fit a fresh Gaussian scene to orbit renders
of a synthetic target, with adaptive density control, on whatever device JAX
finds (TPU or CPU). Writes target/initial/fitted PNGs + a metrics CSV.

    python examples/fit_demo.py --steps 800 --out-dir examples/out
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out-dir", default="examples/out")
    ap.add_argument("--fast", action="store_true",
                    help="the mixed-precision production path: bf16-packed "
                    "gather backward + Pallas segsum (bench.py default)")
    ap.add_argument("--stream-format", default="f32",
                    choices=["f32", "packed16", "packed4"])
    args = ap.parse_args()

    from gsplat_tpu import Camera, RenderConfig, random_scene, render
    from gsplat_tpu.ops.camera import orbit_cameras
    from gsplat_tpu.train.loop import fit
    from gsplat_tpu.train.losses import psnr
    from gsplat_tpu.utils.image import write_png

    s = args.size
    cfg = RenderConfig(
        width=s, height=s, tile_size=16, max_intersections=1 << 17,
        max_tiles_per_gaussian=96, block_size=16, max_per_tile=1024,
        binning="packed",
        impl="pallas" if jax.default_backend() == "tpu" else "jnp",
        stream_format=args.stream_format,
        **(dict(gather_backward="bf16", grad_readout="bf16",
                segment_sum="pallas") if args.fast else {}),
    )
    target_scene = random_scene(jax.random.key(0), args.n, sh_degree=2)
    # Center the cloud at the origin so the orbit sees it from every view
    # (random_scene builds a frustum box for the DEFAULT camera pose).
    target_scene = target_scene.replace(
        means=target_scene.means - target_scene.means.mean(0)
    )
    radius = 2.5 * float(
        np.percentile(np.linalg.norm(np.asarray(target_scene.means), axis=-1), 90)
    )
    cams = orbit_cameras(
        np.zeros(3), radius, args.views, s, s, fx=float(s), fy=float(s)
    )
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    render_j = jax.jit(lambda c: render(target_scene, c, cfg).image)
    targets = jnp.stack([render_j(c) for c in cams])

    init = random_scene(jax.random.key(1), args.n, sh_degree=2)
    init = init.replace(
        means=(init.means - init.means.mean(0)) * 1.2
    ).pad_to(2 * args.n)

    os.makedirs(args.out_dir, exist_ok=True)
    write_png(os.path.join(args.out_dir, "target.png"), targets[0])
    write_png(
        os.path.join(args.out_dir, "initial.png"),
        render(init, cams[0], cfg).image,
    )

    trained, metrics = fit(
        init, cameras, targets, cfg,
        steps=args.steps, lr=2e-2, batch=2, log_every=50,
        densify_every=100, densify_grad_threshold=5e-5,
        # 3DGS 5.2 big-splat prune: without it, repeated splits can grow a
        # few splats past K_max's tile rect and trip the overflow policy.
        densify_max_scale=0.05 * radius,
        metrics_csv=os.path.join(args.out_dir, "metrics.csv"),
    )
    fitted = render(trained, cams[0], cfg).image
    write_png(os.path.join(args.out_dir, "fitted.png"), fitted)
    p = float(psnr(fitted, targets[0]))
    print(f"view-0 PSNR after {args.steps} steps: {p:.2f} dB")
    print(f"outputs in {args.out_dir}/")


if __name__ == "__main__":
    main()
