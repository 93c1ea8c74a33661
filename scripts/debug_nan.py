"""Single-step NaN hunt from a protocol checkpoint (round-4 failure: every
protocol-scale run under the standard recipe hits non-finite gradients in
ALL leaves between steps 151 and 200; the one run with an opacity reset at
step 150 survives to a healthy 19.3 dB).

Loads the step-140 checkpoint of runs/diag_r4c (identical deterministic
setup via train_protocol.build), replays the exact epoch-shuffled view
sequence, and steps with PER-STEP host checks: loss, image finiteness per
view, per-leaf gradient finiteness. At the first bad step it re-renders
each view, isolates L1-vs-SSIM, and dumps the offending Gaussian lanes.

    python scripts/debug_nan.py --ckpt runs/diag_r4c/ckpt/ckpt_000140.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from train_protocol import build, parse_args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/diag_r4c/ckpt/ckpt_000140.npz")
    ap.add_argument("--from-step", type=int, default=140)
    ap.add_argument("--until", type=int, default=175)
    ap.add_argument("--active-sh", type=int, default=0,
                    help="-1 for None (unmasked graph)")
    args = ap.parse_args()
    if args.active_sh < 0:
        args.active_sh = None

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    # The exact protocol config of the failing runs.
    pargs = parse_args([
        "--steps", "5000", "--lr-max-steps", "5000",
        "--out-dir", "runs/_debug_nan",
    ])
    b = build(pargs)
    cfg, cameras, targets = b["cfg"], b["cameras"], b["targets"]

    from gsplat_tpu.parallel.train_step import (
        init_train_state, make_optimizer,
    )
    from gsplat_tpu.train.loop import make_train_step
    from gsplat_tpu.utils.checkpoint import load_checkpoint

    optimizer = make_optimizer(
        pargs.lr, position_lr_final_ratio=0.01, lr_max_steps=5000
    )
    state = init_train_state(b["init"], optimizer)
    state = load_checkpoint(args.ckpt, state)
    print(f"resumed at step {int(state.step)}", flush=True)

    step_fn = make_train_step(cfg, optimizer, ssim_weight=0.2)

    # Replay fit()'s epoch-shuffled view sampling: seed 0, batch 2, one
    # next_views(2) call per step starting from step 0.
    num_views = targets.shape[0]
    rng = np.random.default_rng(pargs.seed)
    queue = []

    def next_views(k):
        nonlocal queue
        out = []
        while len(out) < k:
            if not queue:
                queue = list(rng.permutation(num_views))
            out.append(queue.pop())
        return np.asarray(out)

    burn = args.from_step
    for _ in range(burn):
        next_views(pargs.batch)

    def leaf_report(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {
            jax.tree_util.keystr(p): (
                int(jnp.sum(~jnp.isfinite(v))),
                float(jnp.max(jnp.abs(jnp.where(jnp.isfinite(v), v, 0.0)))),
            )
            for p, v in flat
        }

    from gsplat_tpu import render

    for it in range(args.from_step, args.until):
        sel = next_views(pargs.batch)
        cams_b = jax.tree.map(lambda x: x[sel], cameras)
        targets_b = targets[sel]
        prev_scene = state.scene
        # fit() runs with sh_warmup active: active_sh = it // 1000 = 0 in
        # this window -- the MASKED-SH graph (sh * band_mask) is the one
        # that produced the NaN; the unmasked graph replays clean.
        state, loss, aux, (tap_g, vis) = step_fn(
            state, cams_b, targets_b, args.active_sh
        )
        ok = bool(aux["grads_finite"])
        print(
            {
                "step": it + 1,
                "views": sel.tolist(),
                "loss": round(float(loss), 6),
                "grads_finite": ok,
                "n_int": int(aux["num_intersections"]),
            },
            flush=True,
        )
        if not ok:
            print("=== first bad step; drilling on the PRE-step scene ===")
            scene = prev_scene
            # Per-view forward / loss / grads, L1-only vs +SSIM.
            from gsplat_tpu.train.losses import rgb_loss

            for vi, v in enumerate(sel.tolist()):
                cam = jax.tree.map(lambda x: x[v], cameras)
                out = render(scene, cam, cfg)
                img = out.image
                print(f"view {v}: image finite={bool(jnp.all(jnp.isfinite(img)))} "
                      f"max={float(jnp.max(img)):.4f} overflow={bool(out.overflow)}")
                for w, tag in ((0.0, "l1"), (0.2, "l1+ssim")):
                    g = jax.grad(
                        lambda s: rgb_loss(
                            render(s, cam, cfg).image, targets[v], w
                        )
                    )(scene)
                    rep = leaf_report(g)
                    bad = {k: r for k, r in rep.items() if r[0]}
                    print(f"  {tag}: bad leaves {bad or 'none'} "
                          f"max|g| { {k: f'{r[1]:.3e}' for k, r in rep.items()} }")
                    if bad:
                        # Locate the lanes.
                        gm = g.means
                        lanes = np.where(
                            ~np.asarray(jnp.all(jnp.isfinite(gm), axis=-1))
                        )[0]
                        if lanes.size == 0:
                            for leafname in ("log_scales", "quats", "sh",
                                             "opacity_logits"):
                                arr = np.asarray(getattr(g, leafname))
                                fin = np.isfinite(arr).reshape(arr.shape[0], -1)
                                lanes = np.where(~fin.all(1))[0]
                                if lanes.size:
                                    break
                        print(f"    {lanes.size} bad lanes; first 10: "
                              f"{lanes[:10].tolist()}")
                        for i in lanes[:5].tolist():
                            print(
                                f"    lane {i}: mean={np.asarray(scene.means[i])}"
                                f" logit={float(scene.opacity_logits[i]):.3f}"
                                f" log_scales={np.asarray(scene.log_scales[i])}"
                                f" quat={np.asarray(scene.quats[i])}"
                                f" |sh|max={float(jnp.max(jnp.abs(scene.sh[i]))):.3e}"
                            )
            return
    print("no non-finite gradients in the window (??)")


if __name__ == "__main__":
    main()
