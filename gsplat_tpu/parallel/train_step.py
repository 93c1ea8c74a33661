"""Distributed training step: data-parallel over cameras x tile-parallel
within each view, gradients psum'd inside shard_map so the all-reduce
overlaps the remaining backward work (BASELINE.json config 4).

Sharding layout on a ('data', 'tiles') mesh:
  - scene + optimizer state: replicated
  - camera batch: sharded over 'data'
  - target images: sharded over 'data' (batch) AND 'tiles' (image rows --
    each chip only ever holds the band of the target it renders)
  - loss/grads: per-chip partials -> psum over both axes
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import GaussianScene
from gsplat_tpu.parallel.sharding import (
    _render_local_tiles,
    halo_exchange_rows,
    local_tile_cfg,
)
from gsplat_tpu.train.losses import rgb_loss


def make_optimizer(
    lr: float = 1e-2,
    *,
    position_lr_final_ratio: float | None = None,
    lr_max_steps: int | None = None,
) -> optax.GradientTransformation:
    """Per-parameter learning-rate scaling in the style of graphdeco 3DGS
    (positions slower than color/opacity).

    position_lr_final_ratio + lr_max_steps enable the standard-protocol
    exponential position-lr decay: lr_means(t) = lr_init * ratio^(t /
    lr_max_steps) (graphdeco's get_expon_lr_func log-lerp; the reference
    itself has no training, SURVEY.md section 2). Other groups stay
    constant, as in the original recipe."""
    means_lr = lr * 0.016
    if position_lr_final_ratio is not None:
        if not lr_max_steps:
            raise ValueError(
                "position_lr_final_ratio requires lr_max_steps"
            )
        means_lr = optax.exponential_decay(
            init_value=means_lr,
            transition_steps=lr_max_steps,
            decay_rate=position_lr_final_ratio,
            end_value=means_lr * position_lr_final_ratio,
        )
    return optax.multi_transform(
        {
            "means": optax.adam(means_lr),
            "log_scales": optax.adam(lr * 0.5),
            "quats": optax.adam(lr * 0.1),
            "opacity_logits": optax.adam(lr * 5.0),
            "sh": optax.adam(lr * 0.25),
        },
        GaussianScene(
            means="means",
            log_scales="log_scales",
            quats="quats",
            opacity_logits="opacity_logits",
            sh="sh",
        ),
    )


class TrainState(NamedTuple):
    scene: GaussianScene
    opt_state: optax.OptState
    step: jnp.ndarray


def init_train_state(scene: GaussianScene, optimizer) -> TrainState:
    return TrainState(scene, optimizer.init(scene), jnp.zeros((), jnp.int32))


def make_sharded_train_step(
    cfg: RenderConfig,
    mesh: Mesh,
    optimizer,
    ssim_weight: float = 0.2,
    data_axis: str = "data",
    tile_axis: str = "tiles",
):
    """Returns train_step(state, cameras, targets, active_sh_degree=None)
    -> (state, loss, aux, (screen_grads, visible)) -- the SAME contract as
    the single-device make_train_step (train/loop.py), so fit(mesh=...)
    drives the full training protocol (densification, opacity reset, SH
    warmup, health guards) through this step unchanged.

    cameras: a Camera pytree with a leading batch axis, sharded over 'data'.
    targets: (B, padded_H, padded_W, 3), sharded P('data', 'tiles').

    aux: overflow (any shard), num_intersections (max per-shard stream
    demand -- capacity here is PER SHARD), grads_finite(+_leaves).
    screen_grads: d loss / d uv -- the psum'd screen-space positional
    gradient (densification trigger); visible: OR over views/shards of
    "touched >= 1 tile".

    The loss is the standard 3DGS objective (1-w)*L1 + w*DSSIM with
    ssim_weight=0.2 by default. SSIM is EXACT under sharding: each band
    ppermutes its SSIM_HALO boundary rows to its neighbors so every 11x11
    window sees the same pixels as the single-device computation (edge
    shards receive zeros from the missing neighbor, matching the global
    zero-padded window stats). Comm cost: 2 * SSIM_HALO rows of pred+target
    per view over ICI -- negligible next to the gradient psum.
    """
    n_tiles = mesh.shape[tile_axis]
    lcfg = local_tile_cfg(cfg, n_tiles)
    true_pixels = cfg.height * cfg.width * 3

    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.train.losses import SSIM_HALO, ssim_map

    if ssim_weight > 0.0 and lcfg.height < SSIM_HALO:
        raise ValueError(
            f"tile bands of {lcfg.height} rows are shorter than the SSIM "
            f"halo ({SSIM_HALO}); use fewer tile shards or ssim_weight=0"
        )

    def _halo_exchange(band):
        return halo_exchange_rows(band, tile_axis, n_tiles, SSIM_HALO)

    def per_chip_loss(scene, tap, cameras, targets, active_sh):
        if active_sh is not None:
            from gsplat_tpu.train.loop import sh_band_mask

            scene = scene.replace(
                sh=scene.sh * sh_band_mask(scene.sh.shape[1], active_sh)
            )
        tile_idx = jax.lax.axis_index(tile_axis)
        # Validity mask for this band of the PADDED image (the ragged edge
        # tiles render pixels outside the true image; exclude them).
        y0 = tile_idx * lcfg.height
        ys = y0 + jnp.arange(lcfg.height)
        xs = jnp.arange(lcfg.width)
        mask = ((ys[:, None] < cfg.height) & (xs[None, :] < cfg.width))[..., None]

        def one_view(camera, target_band):
            img, _, ovf, n_int = _render_local_tiles(
                scene, camera, cfg, lcfg, tile_idx, tile_axis, uv_tap=tap
            )
            # Same projection as inside the render (CSE'd by XLA); counts
            # are GLOBAL-image tile counts, identical on every tile shard
            # (projection is replicated), so visibility needs no collective
            # over 'tiles'.
            proj = project_gaussians(scene, camera, cfg, uv_tap=tap)
            vis = jax.lax.stop_gradient(proj.counts > 0)
            # Masked L1, normalized by the TRUE pixel count so the psum over
            # tile bands reconstructs the full-image mean exactly.
            loss = jnp.sum(jnp.abs(img - target_band) * mask) / true_pixels
            if ssim_weight > 0.0:
                # Exact distributed SSIM: extend both bands by the halo rows
                # (masked first, so out-of-image pixels are zero exactly as
                # in the single-device path), evaluate the SSIM map, keep
                # only this band's own rows, and normalize by the global
                # pixel count -- the psum over bands then reconstructs
                # jnp.mean(ssim_map(full_pred, full_target)) bit-for-bit up
                # to reduction order.
                ext_a = _halo_exchange(img * mask)
                ext_b = _halo_exchange(target_band * mask)
                smap = ssim_map(ext_a, ext_b)[SSIM_HALO : SSIM_HALO + lcfg.height]
                ssim_partial = jnp.sum(smap * mask) / true_pixels
                loss = (1.0 - ssim_weight) * loss + ssim_weight * (
                    1.0 / n_tiles - ssim_partial
                )
            return loss, (ovf, n_int, vis)

        # Unrolled over the per-chip view batch, not vmapped -- vmap makes
        # the binning/backward sorts batched (B, M) sorts, 5-7x slower per
        # element (PROFILE.md round-4 training ledger; same fix as the
        # single-device step in train/loop.py).
        outs = [
            one_view(jax.tree.map(lambda x: x[i], cameras), targets[i])
            for i in range(targets.shape[0])
        ]
        losses = jnp.stack([o[0] for o in outs])
        ovf = jnp.stack([o[1][0] for o in outs])
        n_int = jnp.stack([o[1][1] for o in outs])
        vis = jnp.stack([o[1][2] for o in outs])
        return jnp.mean(losses), (
            jnp.any(ovf), jnp.max(n_int), jnp.any(vis, axis=0)
        )

    def shard_fn(state: TrainState, cameras, targets, active_sh, mask_sh):
        tap = jnp.zeros((state.scene.num_gaussians, 2), jnp.float32)
        (loss, (overflow, n_int, visible)), (grads, tap_grads) = (
            jax.value_and_grad(per_chip_loss, argnums=(0, 1), has_aux=True)(
                state.scene, tap, cameras, targets,
                active_sh if mask_sh else None,
            )
        )
        # Mean over data shards, sum over tile shards (each tile band is a
        # disjoint part of every image's loss). The psum is issued inside
        # shard_map: XLA overlaps it with the optimizer update & remaining
        # backward computation.
        grads = jax.lax.psum(grads, tile_axis)
        grads = jax.lax.pmean(grads, data_axis)
        tap_grads = jax.lax.psum(tap_grads, tile_axis)
        tap_grads = jax.lax.pmean(tap_grads, data_axis)
        loss = jax.lax.psum(loss, tile_axis)
        loss = jax.lax.pmean(loss, data_axis)
        # Any shard's stream saturating truncates gradients; surface it so
        # train/loop.py's overflow_policy can abort/resize. The demand max
        # is PER-SHARD (capacity is per-shard under tile sharding).
        overflow = (
            jax.lax.pmax(
                jax.lax.pmax(overflow.astype(jnp.int32), tile_axis), data_axis
            )
            > 0
        )
        n_int = jax.lax.pmax(
            jax.lax.pmax(n_int, tile_axis), data_axis
        )
        visible = (
            jax.lax.pmax(visible.astype(jnp.int32), data_axis) > 0
        )  # identical across 'tiles' (global counts); OR over views
        leaf_ok = jnp.stack([
            jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)
        ])
        aux = {
            "overflow": overflow,
            "num_intersections": n_int,
            "grads_finite": jnp.all(leaf_ok),
            "grads_finite_leaves": leaf_ok,
        }
        updates, opt_state = optimizer.update(grads, state.opt_state, state.scene)
        scene = optax.apply_updates(state.scene, updates)
        return (
            TrainState(scene, opt_state, state.step + 1),
            loss,
            aux,
            (tap_grads, visible),
        )

    state_spec = P()

    @functools.partial(jax.jit, static_argnames=("mask_sh",))
    def _step(state, cameras, targets, active_sh, mask_sh):
        return jax.shard_map(
            functools.partial(shard_fn, mask_sh=mask_sh),
            mesh=mesh,
            in_specs=(state_spec, P(data_axis), P(data_axis, tile_axis), P()),
            out_specs=(state_spec, P(), P(), (P(), P())),
            check_vma=False,
        )(state, cameras, targets, active_sh)

    def step(state, cameras, targets, active_sh_degree=None):
        # active_sh rides as a TRACED scalar (one compilation for the whole
        # SH warmup); mask_sh only distinguishes the no-masking fast path.
        mask_sh = active_sh_degree is not None
        active = jnp.asarray(
            0 if active_sh_degree is None else active_sh_degree, jnp.int32
        )
        return _step(state, cameras, targets, active, mask_sh)

    return step


def shard_batch(cameras, targets, mesh: Mesh, data_axis="data", tile_axis="tiles"):
    """Place a (cameras, targets) batch with the layout the train step
    expects."""
    cam_sharding = NamedSharding(mesh, P(data_axis))
    tgt_sharding = NamedSharding(mesh, P(data_axis, tile_axis))
    cameras = jax.device_put(cameras, cam_sharding)
    targets = jax.device_put(targets, tgt_sharding)
    return cameras, targets
