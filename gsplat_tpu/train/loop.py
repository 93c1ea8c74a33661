"""Training loop: fit a GaussianScene to target images.

The reference renders only (no training, no backward -- SURVEY.md section 2);
this provides the training-framework surface: multi-view L1(+DSSIM)
optimization with per-parameter Adam, structured per-step metrics, periodic
checkpointing, and PLY export. Runs single-device or on a ('data','tiles')
mesh via parallel/train_step.py.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import GaussianScene, random_scene
from gsplat_tpu.ops.camera import Camera, orbit_cameras
from gsplat_tpu.parallel.train_step import (
    TrainState,
    init_train_state,
    make_optimizer,
)
from gsplat_tpu.render.pipeline import render
from gsplat_tpu.train.losses import psnr, rgb_loss
from gsplat_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def sh_band_mask(num_coeffs: int, active_degree) -> jnp.ndarray:
    """(K, 1) float mask keeping SH bands <= active_degree (traced ok).
    Band of coefficient j is floor(sqrt(j)) -- computed host-side with
    integer sqrt so there is no float-precision edge at j = 1, 4, 9."""
    import math

    band = jnp.asarray(
        [math.isqrt(j) for j in range(num_coeffs)], jnp.int32
    )
    return (band <= active_degree).astype(jnp.float32)[:, None]


def make_train_step(cfg: RenderConfig, optimizer, ssim_weight: float = 0.2):
    """Single-device train step over a batch of (cameras, targets).

    Returns step(state, cameras, targets, active_sh_degree=None) ->
    (state, loss, aux, (screen_grads, visible)):
      active_sh_degree: traced int32 (or None = all bands). SH bands above
           it are zero-masked inside the loss, realizing graphdeco's
           progressive SH activation (oneupSHdegree) without changing cfg
           (which is static under jit): inactive bands contribute nothing
           and receive zero gradient.
      aux: batch-aggregated capacity diagnostics ({"overflow",
           "num_intersections"}) -- a saturated stream silently truncates
           gradients, so `fit` refuses to train through it (overflow_policy).
      screen_grads: (N, 2) d loss / d uv_tap -- the exact screen-space
           positional gradient (Kerbl section 5.2 densification trigger).
      visible: (N,) bool, Gaussian touched >= 1 tile in >= 1 view this step
           (the CUDA original's radii > 0 visibility denominator)."""
    from gsplat_tpu.ops.projection import project_gaussians

    # Pool-tier thresholds of the cfg ladder (static): per-step membership
    # counts ride in aux so the staged-capacity schedule can re-size the
    # budgets from MEASURED post-cull membership (train/loop.py fit).
    from gsplat_tpu.ops.binning import _normalize_tier_plan

    tier_klos = tuple(
        k_lo
        for k_lo, _, budget in _normalize_tier_plan(
            cfg.tier_spec, cfg.max_tiles_per_gaussian, 1
        )
        if budget is not None
    ) if cfg.binning == "tiered" else ()

    def loss_fn(scene, tap, cameras, targets, active_sh):
        if active_sh is not None:
            scene = scene.replace(
                sh=scene.sh * sh_band_mask(scene.sh.shape[1], active_sh)
            )

        def one(camera, target):
            out = render(scene, camera, cfg, uv_tap=tap)
            # Same projection call as inside render (CSE'd by XLA); counts>0
            # is the "touched a tile" visibility the ADC denom wants.
            proj = project_gaussians(scene, camera, cfg, uv_tap=tap)
            members = (
                jnp.stack([
                    jnp.sum(out.gauss_counts > k).astype(jnp.int32)
                    for k in tier_klos
                ])
                if tier_klos and out.gauss_counts is not None
                else jnp.zeros((len(tier_klos),), jnp.int32)
            )
            return (
                rgb_loss(out.image, target, ssim_weight),
                out.overflow,
                out.num_intersections,
                jax.lax.stop_gradient(proj.counts > 0),
                members,
            )

        # UNROLLED over the (tiny) view batch, NOT vmapped: vmap turns the
        # two dominant sorts (binning key sort, gather-backward sort) into
        # batched (B, M) sorts, which XLA lowers 5-7x slower per element
        # than the unbatched form -- measured 354 ms of a 522 ms protocol
        # step (PROFILE.md round-4 training ledger). Unrolling keeps each
        # view's sorts at the bench's ~0.9 ns/elem-op.
        outs = [
            one(jax.tree.map(lambda x: x[i], cameras), targets[i])
            for i in range(targets.shape[0])
        ]
        losses, ovf, n_int, vis, members = (
            jnp.stack([o[j] for o in outs]) for j in range(5)
        )
        return jnp.mean(losses), {
            "overflow": jnp.any(ovf),
            "num_intersections": jnp.max(n_int),
            "visible": jnp.any(vis, axis=0),
            "tier_members": jnp.max(members, axis=0),  # (T,) worst view
        }

    @functools.partial(jax.jit, static_argnames=("mask_sh",))
    def _step(state: TrainState, cameras, targets, active_sh, mask_sh):
        tap = jnp.zeros((state.scene.num_gaussians, 2), jnp.float32)
        (loss, aux), (grads, tap_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.scene, tap, cameras, targets,
          active_sh if mask_sh else None)
        # One NaN/inf gradient lane cascades through Adam into the whole
        # scene within a couple of steps (a non-finite parameter renders
        # non-finite pixels, whose gradients touch every splat in the
        # tile); surface it so fit() can abort with a diagnosis instead of
        # silently training a dead scene.
        leaf_ok = jnp.stack([
            jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)
        ])
        aux["grads_finite"] = jnp.all(leaf_ok)
        # Per-leaf flags ride along so the abort message can NAME the first
        # non-finite gradient (param identity is the whole diagnosis: a NaN
        # in d/d_quats points at projection, in d/d_sh at color/blend).
        aux["grads_finite_leaves"] = leaf_ok
        updates, opt_state = optimizer.update(grads, state.opt_state, state.scene)
        scene = optax.apply_updates(state.scene, updates)
        visible = aux.pop("visible")
        return (
            TrainState(scene, opt_state, state.step + 1),
            loss,
            aux,
            (tap_grads, visible),
        )

    def step(state, cameras, targets, active_sh_degree=None):
        # active_sh rides as a TRACED scalar (one compilation for the whole
        # warmup, not one per degree); mask_sh only distinguishes the
        # no-masking fast path.
        mask_sh = active_sh_degree is not None
        active = jnp.asarray(
            0 if active_sh_degree is None else active_sh_degree, jnp.int32
        )
        return _step(state, cameras, targets, active, mask_sh)

    return step


def _append_csv_row(path: str, row: dict):
    """Append a metrics row; if the row introduces columns the existing
    header lacks (e.g. the first eval row's PSNR columns), rewrite the file
    with the extended header, padding earlier rows."""
    import csv

    header = list(row.keys())
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            reader = csv.DictReader(f)
            old_header = reader.fieldnames or []
            if set(header) <= set(old_header):
                with open(path, "a") as fa:
                    fa.write(
                        ",".join(str(row.get(k, "")) for k in old_header)
                        + "\n"
                    )
                return
            rows = list(reader)
            header = old_header + [k for k in header if k not in old_header]
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows + [row]:
            f.write(",".join(str(r.get(k, "")) for k in header) + "\n")


def _zero_opacity_moments(opt_state, capacity: int):
    """Zero the opacity-group moments inside a multi_transform state (the
    CUDA original resets the opacity optimizer state alongside the opacity
    reset). Falls back to a no-op for optimizers without that structure."""
    inner = getattr(opt_state, "inner_states", None)
    if not isinstance(inner, dict) or "opacity_logits" not in inner:
        return opt_state

    def f(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] == capacity
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        ):
            return jnp.zeros_like(leaf)
        return leaf

    new_inner = dict(inner)
    new_inner["opacity_logits"] = jax.tree.map(f, inner["opacity_logits"])
    return opt_state._replace(inner_states=new_inner)


def fit(
    scene: GaussianScene,
    cameras,           # Camera pytree with leading view axis
    targets,           # (V, H, W, 3)
    cfg: RenderConfig,
    steps: int = 200,
    lr: float = 1e-2,
    batch: int = 1,
    ssim_weight: float = 0.2,
    seed: int = 0,
    log_every: int = 20,
    checkpoint_every: int = 0,
    checkpoint_dir: str = "checkpoints",
    resume: str | None = None,
    on_metrics=None,
    densify_every: int = 0,
    densify_grad_threshold: float = 2e-4,
    densify_from: int = 0,
    densify_until: int | None = None,
    densify_max_scale: float | None = None,
    metrics_csv: str | None = None,
    overflow_policy: str = "raise",
    opacity_reset_every: int = 0,
    sh_warmup_every: int = 0,
    position_lr_final_ratio: float | None = None,
    lr_max_steps: int | None = None,
    eval_every: int = 0,
    eval_fn=None,
    trace_dir: str | None = None,
    trace_steps: tuple[int, int] | None = None,
    mesh=None,
    data_axis: str = "data",
    tile_axis: str = "tiles",
    retighten_capacity: float = 0.0,
):
    """Returns (trained scene, metrics list).

    mesh: optional jax.sharding.Mesh with ('data', 'tiles') axes -- the fit
    then runs the DISTRIBUTED train step (parallel/train_step.py: tile-
    sharded render, in-shard_map grad psum) with the identical protocol
    surface: densification, opacity reset, SH warmup, overflow and health
    guards all drive the sharded step unchanged. `batch` must be divisible
    by the 'data' axis size; cfg.max_intersections is the PER-SHARD stream
    capacity. Scene/optimizer state stays replicated, so eval_fn /
    checkpoints see ordinary arrays.

    sh_warmup_every > 0 activates SH bands progressively: active degree =
    min(sh_degree, step // sh_warmup_every) (graphdeco's oneupSHdegree,
    every 1000 steps in the original recipe).

    position_lr_final_ratio enables exponential position-lr decay over
    lr_max_steps (default: `steps`) -- see make_optimizer.

    eval_every > 0 calls eval_fn(scene, step) every that many steps (host
    callback outside jit; used for held-out-view PSNR); its dict return is
    merged into that step's metrics row.

    densify_from delays the first densification round (graphdeco's
    densify_from_iter=500: rounds before the fit has any structure split
    half the random init at once).

    densify_every > 0 enables adaptive density control (train/densify.py):
    the scene must carry free capacity (GaussianScene.pad_to). The trigger
    is the screen-space positional gradient averaged over visible steps
    (Kerbl section 5.2); Adam moments are PRESERVED for slots that survive
    a densification round and zeroed only for killed/new slots.

    opacity_reset_every > 0 clamps opacities below 0.01 every that many
    steps (and zeroes the opacity Adam moments), letting the next prune
    round cull floaters -- Kerbl section 5.2's periodic opacity reset.

    retighten_capacity > 0 enables the STAGED-CAPACITY schedule: once
    densification ends (step == densify_until), the train step is re-jitted
    with cfg.max_intersections tightened to retighten_capacity x the peak
    stream demand measured so far (the backward sort + gradient readout pay
    for CAPACITY, not demand -- a 2.5x sizing margin costs ~2x on ~60% of
    the step, PROFILE.md round-4 training ledger; the margin is only needed
    while densification still grows the stream). 1.3 is a good value. If a
    later step overflows the tightened capacity, the step is automatically
    re-jitted back at the original capacity (one warn, no abort) -- the
    safety net that keeps overflow_policy='raise' runs alive. Re-jit cost
    is one extra compile, amortized by the persistent compile cache.

    overflow_policy: what to do when the intersection stream / tier pools
    saturate (which silently truncates gradients):
      'raise'  -- abort with the measured demand so the user can re-run with
                  a sufficient cfg.max_intersections (default: densification
                  GROWS the stream over training, so a quietly degrading fit
                  is the likely outcome otherwise),
      'warn'   -- print once per log window and continue,
      'ignore' -- reference-viewer behavior (it can't overflow: dynamic
                  realloc, src/renderer.ts:419-441); benches use this.
    Checked every log_every steps (device-side accumulation in between, so
    the async dispatch pipeline is never stalled per-step).
    """
    if overflow_policy not in ("raise", "warn", "ignore"):
        raise ValueError(f"unknown overflow_policy {overflow_policy!r}")
    from gsplat_tpu.train.densify import (
        accumulate_grads, densify_and_prune, init_densify_state,
        mask_opt_moments, reset_opacity,
    )

    optimizer = make_optimizer(
        lr,
        position_lr_final_ratio=position_lr_final_ratio,
        lr_max_steps=(lr_max_steps or steps)
        if position_lr_final_ratio is not None else None,
    )
    state = init_train_state(scene, optimizer)
    dstate = init_densify_state(scene.num_gaussians)
    densify_fn = jax.jit(functools.partial(
        densify_and_prune, grad_threshold=densify_grad_threshold,
        max_world_scale=densify_max_scale))
    if resume:
        state = load_checkpoint(resume, state)
        print(f"resumed from {resume} at step {int(state.step)}")
    if mesh is not None:
        from gsplat_tpu.parallel.sharding import local_tile_cfg  # validate
        from gsplat_tpu.parallel.train_step import (
            make_sharded_train_step, shard_batch,
        )

        local_tile_cfg(cfg, mesh.shape[tile_axis])
        if batch % mesh.shape[data_axis] != 0:
            raise ValueError(
                f"batch={batch} not divisible by data axis "
                f"{mesh.shape[data_axis]}"
            )
        # Targets padded once to the tile grid (each shard holds only its
        # band after shard_batch's device_put).
        ph, pw = cfg.padded_height, cfg.padded_width
        targets = jnp.pad(
            targets,
            ((0, 0), (0, ph - targets.shape[1]), (0, pw - targets.shape[2]),
             (0, 0)),
        )

    def build_step(c: RenderConfig):
        """Train step under config c -- rebuilt by the staged-capacity
        schedule (retighten_capacity) with a different max_intersections."""
        if mesh is not None:
            sharded_step = make_sharded_train_step(
                c, mesh, optimizer, ssim_weight,
                data_axis=data_axis, tile_axis=tile_axis,
            )

            def step_fn(state, cams_b, targets_b, active_sh=None):
                cams_b, targets_b = shard_batch(
                    cams_b, targets_b, mesh, data_axis, tile_axis
                )
                return sharded_step(state, cams_b, targets_b, active_sh)

            return step_fn
        return make_train_step(c, optimizer, ssim_weight)

    step_fn = build_step(cfg)
    # Staged-capacity state: 'full' -> (tighten at densify_until) ->
    # 'tight' -> (re-grow on overflow) -> 'regrown' (terminal).
    capacity_stage = "full"
    tight_cfg: RenderConfig | None = None

    num_views = targets.shape[0]
    rng = np.random.default_rng(seed)
    metrics = []
    t_last = time.time()
    start_step = int(state.step)
    ovf_any = jnp.zeros((), bool)          # device-side accumulators --
    int_max = jnp.zeros((), jnp.int32)     # no per-step host sync
    grads_ok = jnp.ones((), bool)
    grads_leaf_ok = None  # (L,) accumulated per-leaf finite flags
    tier_max = None       # (T,) peak pool-tier membership (worst view)

    def check_overflow(at_step):
        nonlocal ovf_any, int_max, capacity_stage, step_fn
        if overflow_policy == "ignore" or not bool(ovf_any):
            return
        demand = int(int_max)
        if capacity_stage == "tight" and tight_cfg is not None:
            # ANY overflow under the tightened config (stream demand OR a
            # tightened pool budget) re-grows instead of aborting -- the
            # safety net that keeps overflow_policy='raise' runs alive
            # under the staged-capacity schedule. Gradients of <=
            # log_every steps were truncated (same exposure as
            # overflow_policy='warn').
            print(
                f"WARNING: staged capacity overflowed at step <= {at_step} "
                f"(stream demand {demand} vs tightened "
                f"{tight_cfg.max_intersections}; or a tightened pool); "
                f"re-jitting back at the original sizing"
            )
            step_fn = build_step(cfg)
            capacity_stage = "regrown"
            ovf_any = jnp.zeros((), bool)
            int_max = jnp.zeros((), jnp.int32)
            return
        if demand > cfg.max_intersections:
            cause = (
                f"measured demand {demand} > capacity "
                f"{cfg.max_intersections}; re-run with max_intersections "
                f">= {int(demand * 1.15)}"
            )
        else:
            cause = (
                f"stream demand {demand} fits capacity "
                f"{cfg.max_intersections}, so a tier pool saturated or a "
                f"splat's tile rect exceeded max_tiles_per_gaussian="
                f"{cfg.max_tiles_per_gaussian}; raise the tier budgets / "
                f"K_max, or prune big splats (fit(densify_max_scale=...), "
                f"the 3DGS 5.2 rule)"
            )
        msg = (
            f"capacity overflow during step <= {at_step}: {cause}. "
            f"Gradients were truncated."
        )
        if overflow_policy == "raise":
            raise RuntimeError(msg)
        print(f"WARNING: {msg}")
        ovf_any = jnp.zeros((), bool)
        int_max = jnp.zeros((), jnp.int32)

    # Scene-health guard: the round-3 sfm protocol run died before step 250
    # yet trained a black image for 47 minutes (eval frozen at 6.285 dB for
    # 20 consecutive evals, 2 alive Gaussians). Cheap liveness checks on the
    # eval rows turn that failure mode into a 5-minute diagnosis.
    eval_hist: list[dict] = []
    alive_first: int | None = None

    def check_scene_health(row, at_step):
        nonlocal alive_first
        if overflow_policy == "ignore":
            return
        problems = []
        alive = row.get("alive")
        if alive is not None:
            if alive_first is None:
                alive_first = max(int(alive), 1)
            elif int(alive) < max(64, alive_first // 100):
                problems.append(
                    f"alive-Gaussian count collapsed to {alive} "
                    f"(first eval: {alive_first})"
                )
        eval_hist.append(row)
        metric = next(
            (k for k in ("holdout_psnr", "train_psnr") if k in row), None
        )
        if metric is not None and len(eval_hist) >= 3:
            vals = [r.get(metric) for r in eval_hist[-3:]]
            if (
                all(v is not None for v in vals)
                and max(vals) - min(vals) < 1e-3
                and vals[-1] < 15.0
            ):
                problems.append(
                    f"{metric} frozen at {vals[-1]} dB for 3 consecutive "
                    "evals (the rendered image is not changing; a dead/NaN "
                    "scene otherwise trains silently to the end)"
                )
        if problems:
            msg = (
                f"scene-health collapse detected at step {at_step}: "
                + "; ".join(problems)
            )
            if overflow_policy == "raise":
                raise RuntimeError(msg)
            print(f"WARNING: {msg}")

    # Epoch-shuffled view sampling (graphdeco pops from a reshuffled camera
    # stack each epoch; uniform-with-replacement can starve views).
    view_queue: list[int] = []

    def next_views(k: int):
        nonlocal view_queue
        out = []
        while len(out) < k:
            if not view_queue:
                view_queue = list(rng.permutation(num_views))
            out.append(view_queue.pop())
        return np.asarray(out)

    # Resume fast-forward: replay the draws steps [0, start_step) consumed
    # so a resumed run samples the SAME view path as an uninterrupted one
    # (cheap + deterministic; without it the queue restarts at the epoch
    # head and views near the checkpoint repeat/starve). The densification
    # accumulator is NOT checkpointed -- the first densify window after a
    # resume averages over fewer steps (partial window), which only
    # advances the trigger by <= densify_every steps once.
    for _ in range(start_step):
        next_views(batch)

    for it in range(start_step, steps):
        # Optional profiler window (trace_dir + trace_steps=(start, stop)):
        # captures the real training loop -- densify rounds, evals, host
        # callbacks included -- not just the jitted step.
        if trace_dir and trace_steps and it == trace_steps[0]:
            jax.block_until_ready(state.scene.means)
            jax.profiler.start_trace(trace_dir)
        if trace_dir and trace_steps and it == trace_steps[1]:
            jax.block_until_ready(state.scene.means)
            jax.profiler.stop_trace()
            print(f"trace written to {trace_dir}")
        sel = next_views(batch)
        cams_b = jax.tree.map(lambda x: x[sel], cameras)
        targets_b = targets[sel]
        active_sh = (
            min(scene.sh_degree, it // sh_warmup_every)
            if sh_warmup_every else None
        )
        state, loss, aux, (screen_grads, visible) = step_fn(
            state, cams_b, targets_b, active_sh
        )
        ovf_any = ovf_any | aux["overflow"]
        tm = aux.get("tier_members")
        if tm is not None and tm.shape[0]:
            tier_max = tm if tier_max is None else jnp.maximum(tier_max, tm)
        grads_ok = grads_ok & aux["grads_finite"]
        grads_leaf_ok = (
            aux["grads_finite_leaves"] if grads_leaf_ok is None
            else grads_leaf_ok & aux["grads_finite_leaves"]
        )
        int_max = jnp.maximum(int_max, aux["num_intersections"])
        until = densify_until if densify_until is not None else steps // 2
        if densify_every:
            dstate = accumulate_grads(dstate, screen_grads, visible)
            if (
                (it + 1) % densify_every == 0
                and densify_from <= it + 1 <= until
            ):
                new_scene, dstate, changed, dstats = densify_fn(
                    state.scene, dstate
                )
                # Moments survive for untouched slots; only killed/new slots
                # start cold (matches the CUDA original's cat_tensors /
                # prune_optimizer bookkeeping).
                state = TrainState(
                    new_scene,
                    mask_opt_moments(state.opt_state, changed),
                    state.step,
                )
                print({k: int(v) if k != "saturated" else bool(v)
                       for k, v in dstats.items()} | {"densify_at": it + 1})
        if (
            retighten_capacity
            and capacity_stage == "full"
            and it + 1 >= until
            # Peak demand is a max over sampled views: wait one full epoch
            # past the segment start so every view contributed (matters on
            # resume, where the accumulator restarts empty).
            and it + 1 >= start_step + -(-num_views // batch)
        ):
            # Densification is over: the stream stops growing, so the
            # sizing margin (2.5x demand for a 5k-step protocol run) is
            # pure tax on the capacity-proportional backward stages. Re-jit
            # at retighten_capacity x the measured peak demand (rounded up
            # to the segsum block multiple).
            demand_now = int(int_max)
            new_max = int(demand_now * retighten_capacity)
            new_max += (-new_max) % 2048
            # Pool budgets tightened from MEASURED peak post-cull tier
            # membership the same way: sizing margins (4x) are only needed
            # while densification still moves the distribution, and
            # oversized pools inflate the binning sort's candidate lanes
            # (measured: the 1024^2 protocol's auto-sized div-1 ladder
            # carried ~64M lanes for ~7.9M live).
            new_spec = None
            if tier_max is not None and cfg.binning == "tiered":
                from gsplat_tpu.ops.binning import _normalize_tier_plan

                n_cap = state.scene.num_gaussians
                plan = _normalize_tier_plan(
                    cfg.tier_spec, cfg.max_tiles_per_gaussian, n_cap
                )
                members = [int(x) for x in np.asarray(tier_max)]
                spec, mi = [], 0
                for k_lo, k_hi, budget in plan:
                    if budget is None:
                        spec.append((k_hi, 0))
                        continue
                    rows = int(members[mi] * retighten_capacity) + 256
                    mi += 1
                    spec.append((k_hi, max(1, n_cap // rows)))
                new_spec = tuple(spec)
            if 0 < new_max < cfg.max_intersections or (
                new_spec is not None and new_spec != tuple(cfg.tier_spec)
            ):
                import dataclasses

                tight_cfg = dataclasses.replace(
                    cfg,
                    max_intersections=min(
                        new_max or cfg.max_intersections,
                        cfg.max_intersections,
                    ),
                    **(
                        {"tier_spec": new_spec}
                        if new_spec is not None else {}
                    ),
                )
                print(
                    f"staged capacity: tightening max_intersections "
                    f"{cfg.max_intersections} -> "
                    f"{tight_cfg.max_intersections} and tier_spec "
                    f"{cfg.tier_spec} -> {tight_cfg.tier_spec} at step "
                    f"{it + 1} ({retighten_capacity}x peak demand "
                    f"{demand_now}, peak members "
                    f"{None if tier_max is None else [int(x) for x in np.asarray(tier_max)]}; "
                    "re-jit follows)"
                )
                step_fn = build_step(tight_cfg)
                capacity_stage = "tight"
            else:
                capacity_stage = "regrown"  # nothing to gain; don't retry
        if opacity_reset_every and (it + 1) % opacity_reset_every == 0 \
                and it + 1 < steps:
            state = TrainState(
                reset_opacity(state.scene),
                _zero_opacity_moments(state.opt_state,
                                      state.scene.num_gaussians),
                state.step,
            )
        if (it + 1) % log_every == 0 or it + 1 == steps:
            check_overflow(it + 1)
            if not bool(grads_ok):
                paths = [
                    jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(
                        state.scene
                    )[0]
                ]
                bad = [
                    name
                    for name, ok in zip(paths, np.asarray(grads_leaf_ok))
                    if not ok
                ] if grads_leaf_ok is not None else []
                msg = (
                    f"non-finite gradients during step <= {it + 1} in "
                    f"{bad or 'unknown leaves'}: a "
                    "NaN/inf parameter cascades through the whole scene "
                    "within a few steps (the fit is unrecoverable). "
                    "Typical causes: degenerate quats/scales, a custom "
                    "loss without stabilizers."
                )
                if overflow_policy == "raise":
                    raise FloatingPointError(msg)
                print(f"WARNING: {msg}")
                grads_ok = jnp.ones((), bool)
                grads_leaf_ok = None
            loss = float(loss)
            dt = time.time() - t_last
            t_last = time.time()
            its = log_every / dt if it + 1 != start_step + 1 else 1.0 / dt
            row = {"step": it + 1, "loss": round(loss, 6), "it_per_s": round(its, 3)}
            if eval_every and eval_fn is not None and (
                (it + 1) % eval_every == 0 or it + 1 == steps
            ):
                row.update(eval_fn(state.scene, it + 1) or {})
                check_scene_health(row, it + 1)
                t_last = time.time()  # don't bill eval time to it/s
            metrics.append(row)
            print(row if on_metrics is None else on_metrics(row))
            if metrics_csv:
                # Structured per-step metrics (SURVEY.md section 5: the
                # reference only console.logs).
                _append_csv_row(metrics_csv, row)
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            path = os.path.join(checkpoint_dir, f"ckpt_{it + 1:06d}.npz")
            save_checkpoint(path, state)
            print(f"checkpoint -> {path}")
    return state.scene, metrics


def train_from_cli(args) -> int:
    """Backs the `gsplat-tpu train` subcommand: self-supervised demo -- fit a
    fresh random scene to orbit renders of a target scene (or a PLY)."""
    from gsplat_tpu.cli import _build_cfg
    from gsplat_tpu.io.ply import load_ply, save_ply
    from gsplat_tpu.train.losses import psnr as psnr_fn

    cfg = _build_cfg(args, args.width, args.height)
    key = jax.random.key(args.seed)
    if args.ply == "synthetic":
        target_scene = random_scene(key, args.synthetic_n, sh_degree=min(args.sh_degree, 3))
    else:
        target_scene = load_ply(args.ply)

    means = np.asarray(target_scene.means)
    center = means.mean(0)
    radius = float(
        np.percentile(np.linalg.norm(means - center, axis=-1), 90) * 2.5
    )
    holdout = getattr(args, "holdout_views", 0)
    total_views = args.views + holdout
    all_cams = orbit_cameras(
        center, radius, total_views, cfg.width, cfg.height,
        fx=float(cfg.width), fy=float(cfg.height),
    )
    print(f"rendering {total_views} target views "
          f"({args.views} train + {holdout} held-out)...")
    render_j = jax.jit(lambda c: render(target_scene, c, cfg).image)
    all_targets = jnp.stack([render_j(c) for c in all_cams])
    # Interleave the holdout so it samples the whole orbit, like taking
    # every Nth image of a capture (the graphdeco -eval convention).
    idx = np.arange(total_views)
    hold_idx = idx[:: total_views // holdout][:holdout] if holdout else idx[:0]
    train_idx = np.setdiff1d(idx, hold_idx)
    cams = [all_cams[i] for i in train_idx]
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    targets = all_targets[train_idx]

    init = random_scene(jax.random.fold_in(key, 1), target_scene.num_gaussians,
                        sh_degree=target_scene.sh_degree)
    # Start near the target's spatial distribution.
    init = init.replace(
        means=init.means * radius / 2.5 + jnp.asarray(center, jnp.float32),
    )
    if args.densify_every:
        capacity = args.capacity or 2 * init.num_gaussians
        init = init.pad_to(capacity)

    eval_fn = None
    if holdout:
        eval_render = jax.jit(
            lambda s, c: render(s, c, cfg).image
        )

        def eval_fn(scene_now, step):
            vals = [
                float(psnr_fn(eval_render(scene_now, all_cams[i]),
                              all_targets[i]))
                for i in hold_idx
            ]
            tr = float(psnr_fn(eval_render(scene_now, cams[0]), targets[0]))
            return {
                "holdout_psnr": round(float(np.mean(vals)), 3),
                "train_psnr": round(tr, 3),
            }

    trained, metrics = fit(
        init, cameras, targets, cfg,
        steps=args.steps, lr=args.lr, seed=args.seed,
        batch=args.batch,
        ssim_weight=args.ssim_weight,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        densify_every=args.densify_every,
        densify_grad_threshold=args.densify_grad_threshold,
        densify_from=getattr(args, "densify_from", 0),
        densify_until=args.densify_until,
        densify_max_scale=args.densify_max_scale,
        opacity_reset_every=args.opacity_reset_every,
        overflow_policy=args.overflow_policy,
        sh_warmup_every=args.sh_warmup_every,
        position_lr_final_ratio=args.position_lr_final_ratio,
        metrics_csv=args.metrics_csv,
        eval_every=args.eval_every,
        eval_fn=eval_fn,
    )
    final_psnr = float(
        psnr_fn(render(trained, cams[0], cfg).image, targets[0])
    )
    print(f"final view-0 PSNR: {final_psnr:.2f} dB")
    if eval_fn is not None:
        print(f"final held-out metrics: {eval_fn(trained, args.steps)}")
    save_ply(trained, args.out)
    print(f"saved {args.out}")
    return 0
