"""Forward-level drill at the reproduced -inf-loss step (159, views 4/1):
image magnitude + SSIM denominator pole check. Uses only cached graphs."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from train_protocol import build, parse_args

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

pargs = parse_args(["--steps","5000","--lr-max-steps","5000","--out-dir","runs/_debug_nan"])
b = build(pargs)
cfg, cameras, targets = b["cfg"], b["cameras"], b["targets"]

from gsplat_tpu.parallel.train_step import init_train_state, make_optimizer
from gsplat_tpu.train.loop import make_train_step
from gsplat_tpu.utils.checkpoint import load_checkpoint

optimizer = make_optimizer(pargs.lr, position_lr_final_ratio=0.01, lr_max_steps=5000)
state = init_train_state(b["init"], optimizer)
state = load_checkpoint("runs/diag_r4c/ckpt/ckpt_000140.npz", state)
step_fn = make_train_step(cfg, optimizer, ssim_weight=0.2)

# Replay to just before step 159 with the masked graph (active_sh=0).
num_views = targets.shape[0]
rng = np.random.default_rng(pargs.seed); queue = []
def next_views(k):
    global queue
    out = []
    while len(out) < k:
        if not queue: queue = list(rng.permutation(num_views))
        out.append(queue.pop())
    return np.asarray(out)
for _ in range(140): next_views(2)
for it in range(140, 158):
    sel = next_views(2)
    state, loss, aux, _ = step_fn(state, jax.tree.map(lambda x: x[sel], cameras), targets[sel], 0)
print("pre-159 state ready; last loss", float(loss), flush=True)
sel = next_views(2); print("views", sel, flush=True)
scene = state.scene

# masked sh as the loss sees it (active degree 0)
from gsplat_tpu.train.loop import sh_band_mask
mscene = scene.replace(sh=scene.sh * sh_band_mask(scene.sh.shape[1], 0))
stats = {
  "max_dc": float(jnp.max(jnp.abs(scene.sh[:,0]))),
  "max_logit": float(jnp.max(scene.opacity_logits)),
  "log_scales_minmax": (float(jnp.min(scene.log_scales)), float(jnp.max(scene.log_scales))),
  "quat_norm_min": float(jnp.min(jnp.linalg.norm(scene.quats, axis=-1))),
}
print(stats, flush=True)

er = b["eval_render"]
from gsplat_tpu.train.losses import ssim_map, _gaussian_window, _blur
for v in sel.tolist():
    cam = b["cams"][v]
    img = er(mscene, cam)
    tgt = targets[v]
    print(f"view {v}: img finite={bool(jnp.all(jnp.isfinite(img)))} "
          f"max={float(jnp.max(img)):.6g} min={float(jnp.min(img)):.6g}", flush=True)
    w = _gaussian_window()
    a, bb = img, tgt
    mu_a, mu_b = _blur(a, w), _blur(bb, w)
    sigma_aa = _blur(a*a, w) - mu_a*mu_a
    sigma_bb = _blur(bb*bb, w) - mu_b*mu_b
    den2 = sigma_aa + sigma_bb + 0.03**2
    den1 = mu_a*mu_a + mu_b*mu_b + 0.01**2
    smap = ssim_map(a, bb)
    print(f"  den2 min={float(jnp.min(den2)):.6g} #<=0: {int(jnp.sum(den2<=0))} "
          f"sigma_aa min={float(jnp.min(sigma_aa)):.6g} "
          f"smap finite={bool(jnp.all(jnp.isfinite(smap)))} "
          f"smap minmax=({float(jnp.min(smap)):.6g},{float(jnp.max(smap)):.6g})", flush=True)
    # where is the image max?
    iy, ix = np.unravel_index(int(jnp.argmax(jnp.max(img, -1))), img.shape[:2])
    print(f"  argmax pixel ({iy},{ix}) val={np.asarray(img[iy,ix])}", flush=True)
