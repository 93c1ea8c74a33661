"""Adaptive density control (densify / prune) on a STATIC capacity.

The reference is a forward-only viewer with a fixed Gaussian count
(reference: src/ply.ts -- the scene is immutable after load); real 3DGS
training grows and shrinks the scene (Kerbl et al. 2023, section 5.2:
clone small under-reconstructed Gaussians, split large ones, prune
transparent ones). TPU-native constraint: jit demands static shapes, so the
scene lives in a fixed-capacity buffer (GaussianScene.pad_to) where dead
slots are fully transparent (opacity logit -30) and never contribute to the
image or gradients. Densification then becomes a masked slot-allocation
problem -- the same cumsum-rank compaction the tiered binning uses, no
dynamic shapes, no host round-trips.

Design:
  - a DensifyState accumulates per-Gaussian SCREEN-SPACE positional
    gradient norms between densification rounds, normalized by the number
    of steps each Gaussian was visible -- exactly the Kerbl section 5.2
    trigger (the CUDA original reads means2D.grad and divides by a
    visibility denom). The screen gradient comes from the uv_tap in
    project_gaussians (d loss / d tap), converted to NDC units
    (d/d_ndc = 0.5 * d/d_uv) so the standard 2e-4 threshold applies.
  - densify_and_prune(): one jitted call that
      prune:  opacity < min_opacity -> slot freed,
      split:  trigger & max scale > split_size -> two children at scale/1.6,
              displaced +/- along the major axis; parent slot freed,
      clone:  trigger & max scale <= split_size -> copy nudged by the
              accumulated gradient direction,
    writing children into freed + padding slots by rank matching. If there
    are more children than free slots, the lowest-priority children are
    dropped and the `saturated` flag is set (the static-capacity analogue of
    the reference's dynamic realloc being impossible under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gsplat_tpu.models.gaussians import GaussianScene

DEAD_OPACITY_LOGIT = -30.0
DEAD_LOG_SCALE = -10.0


@struct.dataclass
class DensifyState:
    grad_accum: jnp.ndarray   # (C,) accumulated ||dL/d_ndc_xy|| over window
    count: jnp.ndarray        # () int32 steps accumulated
    visit_count: jnp.ndarray  # (C,) int32 steps each Gaussian was visible


def init_densify_state(capacity: int) -> DensifyState:
    return DensifyState(
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        visit_count=jnp.zeros((capacity,), jnp.int32),
    )


def accumulate_grads(
    state: DensifyState, screen_grads: jnp.ndarray, visible=None
) -> DensifyState:
    """Add this step's per-Gaussian screen-space gradient norms.

    screen_grads: (C, 2) d loss / d uv_tap (summed over the view batch by
    autodiff); converted here to NDC units. visible: (C,) bool/int -- steps
    where the Gaussian touched at least one tile (the CUDA original's
    radii > 0 denom); defaults to every step."""
    norm = 0.5 * jnp.linalg.norm(screen_grads, axis=-1)  # d/d_ndc units
    vis = (
        jnp.ones_like(state.visit_count)
        if visible is None
        else visible.astype(jnp.int32)
    )
    return DensifyState(
        grad_accum=state.grad_accum + norm,
        count=state.count + 1,
        visit_count=state.visit_count + vis,
    )


def alive_mask(scene: GaussianScene, min_opacity: float = 1.0 / 255.0) -> jnp.ndarray:
    return jax.nn.sigmoid(scene.opacity_logits) >= min_opacity


def densify_and_prune(
    scene: GaussianScene,
    state: DensifyState,
    grad_threshold: float = 2e-4,
    split_size: float = 0.01,
    min_opacity: float = 1.0 / 255.0,
    split_scale_down: float = 1.6,
    max_world_scale: float | None = None,
):
    """One densification round. Returns (scene, fresh_state, stats dict).

    max_world_scale, when set, prunes Gaussians whose largest axis exceeds
    it -- the 3DGS section 5.2 big-splat removal. Without it, splitting can
    let a few splats grow until their tile rect exceeds K_max and the
    overflow policy aborts training (the static-capacity analogue of the
    CUDA impl's unbounded per-splat work).

    All shapes static (capacity C preserved); fully jittable.
    """
    c = scene.num_gaussians
    avg_grad = state.grad_accum / jnp.maximum(
        state.visit_count, 1
    ).astype(jnp.float32)
    alive = alive_mask(scene, min_opacity)
    max_scale = jnp.exp(jnp.max(scene.log_scales, axis=-1))

    trigger = alive & (avg_grad > grad_threshold)
    split_want = trigger & (max_scale > split_size)
    clone_want = trigger & ~split_want

    # ---- admission against the TRUE free-slot budget --------------------
    # Each admitted op nets +1 slot (a split frees its parent and places 2
    # children; a clone places 1), so at most `free0` ops fit, where free0
    # counts slots freed by PRUNING alone (dead, or big-and-not-splitting).
    # Ops beyond the budget are NOT performed at all -- their parents
    # survive untouched. (The previous behavior killed every split parent
    # and then dropped the children that found no slot: each saturated
    # round destroyed up to 2*splits - free Gaussians; a continuously
    # saturated run collapsed the whole scene.)
    big = (
        (max_scale > max_world_scale)
        if max_world_scale is not None
        else jnp.zeros_like(alive)
    )
    pruned = (~alive) | (alive & big & ~split_want)
    free0 = jnp.sum(pruned)
    want = trigger & ~pruned
    # Admission is ranked by accumulated gradient, not slot index (a
    # slot-ordered cumsum starves high-index splats with large gradients
    # across every saturated round). Big splats that want a split rank
    # first regardless of gradient: their children are the only way to
    # satisfy the 5.2 size bound without destroying content.
    score = avg_grad + jnp.where(big & split_want, 1e9, 0.0)
    order = jnp.argsort(jnp.where(want, -score, jnp.inf))
    adm_rank = jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32)
    )
    admitted = want & (adm_rank < free0)
    split = split_want & admitted
    clone = clone_want & admitted
    saturated = jnp.sum(want) > free0
    # Hard 5.2 bound: a big splat whose split was NOT admitted must not
    # survive untouched (its tile rect is the K_max-overflow risk the bound
    # exists to prevent) -- prune it outright. Only enlarges the free-slot
    # pool, so the no-drop admission guarantee below still holds.
    big_unadmitted = big & split_want & ~admitted

    # --- children: 2 per split + 1 per clone ----------------------------
    # (child specs read the ORIGINAL scene; the kill pass comes after)
    # Child spec arrays are (C, 2): column j is the j-th child of slot i.
    rot = _quat_rotmat(scene.quats)  # normalized inside
    major_axis = jnp.take_along_axis(
        jnp.swapaxes(rot, -1, -2),  # rows = principal axes
        jnp.argmax(scene.log_scales, axis=-1)[:, None, None].repeat(3, -1),
        axis=-2,
    )[:, 0, :]  # (C, 3)
    sigma = max_scale
    offset = major_axis * sigma[:, None]

    child_want = jnp.stack([split | clone, split], axis=1)    # (C, 2)
    # Split children sit at +/- one sigma along the major axis; a clone's
    # child is nudged a small fraction of sigma so the twins decorrelate.
    child_means = jnp.stack(
        [
            jnp.where(
                split[:, None], scene.means + offset, scene.means + 0.01 * offset
            ),
            scene.means - offset,
        ],
        axis=1,
    )  # (C, 2, 3)
    child_ls = jnp.where(
        split[:, None, None],
        scene.log_scales[:, None, :] - jnp.log(split_scale_down),
        scene.log_scales[:, None, :],
    ).repeat(2, axis=1)

    # --- prune + free split parents -------------------------------------
    # A big splat that splits is replaced by its /1.6 children; a big splat
    # that doesn't is pruned outright (3DGS 5.2 big-splat removal).
    dead = pruned | split | big_unadmitted

    def kill(x, fill, mask):
        shape = (c,) + (1,) * (x.ndim - 1)
        return jnp.where(mask.reshape(shape), fill, x)

    killed = GaussianScene(
        means=kill(scene.means, 0.0, dead),
        log_scales=kill(scene.log_scales, DEAD_LOG_SCALE, dead),
        quats=kill(scene.quats, 0.0, dead).at[:, 0].set(
            jnp.where(dead, 1.0, scene.quats[:, 0])
        ),
        opacity_logits=kill(scene.opacity_logits, DEAD_OPACITY_LOGIT, dead),
        sh=kill(scene.sh, 0.0, dead),
    )

    # --- slot allocation: rank-match children to free slots -------------
    free = dead
    free_rank = jnp.cumsum(free) - 1                          # (C,)
    num_free = jnp.sum(free)

    child_flat = child_want.reshape(-1)                       # (2C,)
    child_rank = jnp.cumsum(child_flat) - 1
    # Admission guarantees 2*splits + clones <= free0 + splits = num_free:
    # every child of an admitted op gets a slot; no drops.

    # slot_of_rank: r-th free slot's index (C entries, C sentinel-padded).
    slot_of_rank = jnp.full((c + 1,), c, jnp.int32).at[
        jnp.where(free, free_rank, c)
    ].set(jnp.arange(c, dtype=jnp.int32), mode="drop")[:c]

    dest = jnp.where(
        child_flat & (child_rank < num_free),
        jnp.take(slot_of_rank, jnp.clip(child_rank, 0, c - 1)),
        c,
    )  # (2C,) destination slot per child, c = dropped

    def place(dst_arr, child_vals):
        flat = child_vals.reshape((2 * c,) + child_vals.shape[2:])
        return dst_arr.at[dest].set(flat, mode="drop")

    new_scene = GaussianScene(
        means=place(killed.means, child_means),
        log_scales=place(killed.log_scales, child_ls),
        quats=place(killed.quats, scene.quats[:, None, :].repeat(2, 1)),
        opacity_logits=place(
            killed.opacity_logits, scene.opacity_logits[:, None].repeat(2, 1)
        ),
        sh=place(killed.sh, scene.sh[:, None].repeat(2, 1)),
    )

    # Slots whose CONTENT changed this round: killed (pruned or split
    # parents) or overwritten by a child. Optimizer moments of every other
    # slot are still valid -- the Kerbl implementation preserves Adam state
    # for surviving Gaussians and only zero-inits new ones.
    received = (
        jnp.zeros((c + 1,), bool).at[dest].set(True, mode="drop")[:c]
    )
    changed = dead | received

    stats = dict(
        num_alive=jnp.sum(alive_mask(new_scene, min_opacity)),
        num_split=jnp.sum(split),
        num_clone=jnp.sum(clone),
        num_free_before=num_free,
        saturated=saturated,
    )
    return new_scene, init_densify_state(c), changed, stats


def mask_opt_moments(opt_state, changed: jnp.ndarray):
    """Zero optimizer moments (any per-slot leaf) at `changed` slots,
    preserving them everywhere else. Works on any optax state pytree: a
    leaf is per-slot iff its leading dim equals the capacity."""
    c = changed.shape[0]
    keep = (~changed).astype(jnp.float32)

    def f(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == c:
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                return leaf * keep.reshape((c,) + (1,) * (leaf.ndim - 1)).astype(
                    leaf.dtype
                )
        return leaf

    return jax.tree.map(f, opt_state)


def reset_opacity(scene: GaussianScene, ceiling: float = 0.01) -> GaussianScene:
    """Periodic opacity reset (Kerbl section 5.2: clamp opacity below a
    small ceiling every ~3k steps so the ADC prune can cull floaters that
    the optimizer has pushed opaque). Dead slots stay dead."""
    cap = jnp.float32(jnp.log(ceiling) - jnp.log1p(-ceiling))  # logit(ceiling)
    new_logits = jnp.minimum(scene.opacity_logits, cap)
    dead = scene.opacity_logits <= DEAD_OPACITY_LOGIT
    return scene.replace(
        opacity_logits=jnp.where(dead, scene.opacity_logits, new_logits)
    )


def _quat_rotmat(quats):
    from gsplat_tpu.ops.projection import quat_to_rotmat

    return quat_to_rotmat(quats)
