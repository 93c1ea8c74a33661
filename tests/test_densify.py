"""Adaptive density control on static capacity: split/clone/prune semantics,
slot allocation, saturation flag, and trainability of the result."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.models.gaussians import GaussianScene, random_scene
from gsplat_tpu.train.densify import (
    DEAD_OPACITY_LOGIT,
    accumulate_grads,
    alive_mask,
    densify_and_prune,
    init_densify_state,
)


def _scene_with_capacity(n, cap, key=0):
    return random_scene(jax.random.key(key), n, sh_degree=1).pad_to(cap)


def test_prune_transparent():
    scene = _scene_with_capacity(8, 16)
    scene = scene.replace(
        opacity_logits=scene.opacity_logits.at[0:2].set(-10.0)  # ~4.5e-5
    )
    state = init_densify_state(16)
    out, _, _, stats = jax.jit(densify_and_prune)(scene, state)
    assert int(stats["num_alive"]) == 6
    assert float(out.opacity_logits[0]) == DEAD_OPACITY_LOGIT


def test_split_and_clone():
    cap = 32
    scene = _scene_with_capacity(4, cap)
    # Gaussian 0: big (split). Gaussian 1: small (clone). 2,3: quiet.
    scene = scene.replace(
        log_scales=scene.log_scales.at[0].set(jnp.log(0.05))
        .at[1].set(jnp.log(0.001)),
        opacity_logits=scene.opacity_logits.at[:4].set(2.0),
    )
    state = init_densify_state(cap)
    grads = jnp.zeros((cap, 2)).at[0].set(1.0).at[1].set(1.0)
    state = accumulate_grads(state, grads)

    out, fresh, changed, stats = jax.jit(densify_and_prune)(scene, state)
    assert int(stats["num_split"]) == 1
    assert int(stats["num_clone"]) == 1
    assert not bool(stats["saturated"])
    # split parent freed, 2 children born; clone parent kept, 1 child born.
    assert int(stats["num_alive"]) == 4 - 1 + 3
    assert int(fresh.count) == 0

    # Exactly two split children at parent_scale / 1.6; one clone child at
    # the clone parent's scale; split parent's original scale gone.
    alive = np.asarray(alive_mask(out))
    ls0 = np.asarray(out.log_scales)[alive][:, 0]
    child_scale = np.log(0.05) - np.log(1.6)
    assert (np.abs(ls0 - child_scale) < 1e-5).sum() == 2
    assert (np.abs(ls0 - np.log(0.001)) < 1e-5).sum() == 2  # parent + child
    assert (np.abs(ls0 - np.log(0.05)) < 1e-5).sum() == 0


def test_saturation_flag():
    cap = 4  # no free slots at all
    scene = _scene_with_capacity(4, cap)
    scene = scene.replace(opacity_logits=jnp.full((cap,), 2.0))
    state = accumulate_grads(init_densify_state(cap), jnp.ones((cap, 2)))
    out, _, _, stats = jax.jit(densify_and_prune)(scene, state)
    assert bool(stats["saturated"])


def test_densified_scene_still_renders_and_trains():
    from gsplat_tpu import Camera, RenderConfig, render
    from gsplat_tpu.render.pipeline import render_loss

    cfg = RenderConfig(width=32, height=32, tile_size=8,
                       max_intersections=1 << 12, max_tiles_per_gaussian=16,
                       block_size=8, max_per_tile=128)
    cap = 64
    scene = _scene_with_capacity(20, cap)
    cam = Camera.default(32, 32)

    # The real screen-space trigger path: d loss / d uv_tap.
    def loss_of_tap(tap):
        out = render(scene, cam, cfg, uv_tap=tap)
        return jnp.mean(jnp.abs(out.image))

    tap_grads = jax.grad(loss_of_tap)(jnp.zeros((cap, 2)))
    state = accumulate_grads(init_densify_state(cap), tap_grads)
    out, _, _, stats = jax.jit(
        lambda s, st: densify_and_prune(s, st, grad_threshold=0.0)
    )(scene, state)
    img = render(out, cam, cfg).image
    assert np.isfinite(np.asarray(img)).all()
    g = jax.grad(lambda s: render_loss(s, cam, jnp.zeros((32, 32, 3)), cfg))(out)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_moments_survive_densify():
    """Adam moments of untouched slots survive a densification round;
    killed/new slots start cold (Kerbl's cat_tensors/prune bookkeeping)."""
    import optax

    from gsplat_tpu.train.densify import mask_opt_moments

    cap = 16
    scene = _scene_with_capacity(8, cap)
    # Slot 0 transparent -> pruned (changed); slots 1..7 quiet (survive).
    scene = scene.replace(
        opacity_logits=scene.opacity_logits.at[0].set(-10.0)
    )
    opt = optax.adam(1e-2)
    opt_state = opt.init(scene)
    # Fake nonzero moments: one update with all-ones grads.
    ones = jax.tree.map(jnp.ones_like, scene)
    _, opt_state = opt.update(ones, opt_state, scene)

    state = init_densify_state(cap)  # no grads -> no split/clone
    new_scene, _, changed, _ = jax.jit(densify_and_prune)(scene, state)
    masked = mask_opt_moments(opt_state, changed)

    mu_before = jax.tree.leaves(opt_state)[0]  # some (cap, ...) moment leaf
    # find the means mu leaf in both states
    def find_means_mu(st):
        for leaf in jax.tree.leaves(st):
            if hasattr(leaf, "shape") and leaf.shape == scene.means.shape:
                return leaf
        raise AssertionError("no per-slot moment leaf found")

    before = np.asarray(find_means_mu(opt_state))
    after = np.asarray(find_means_mu(masked))
    ch = np.asarray(changed)
    assert ch[0] and not ch[1:8].any()
    # survivors keep their moments bit-exactly; changed slots are zeroed
    np.testing.assert_array_equal(after[~ch], before[~ch])
    assert (after[ch] == 0).all()


def test_opacity_reset():
    from gsplat_tpu.train.densify import DEAD_OPACITY_LOGIT, reset_opacity

    cap = 8
    scene = _scene_with_capacity(4, cap)
    scene = scene.replace(
        opacity_logits=jnp.array([5.0, -1.0, 2.0, 0.0] + [-30.0] * 4)
    )
    out = reset_opacity(scene, ceiling=0.01)
    sig = np.asarray(jax.nn.sigmoid(out.opacity_logits[:4]))
    assert (sig <= 0.01 + 1e-6).all()
    # already-below logits untouched, dead slots stay dead
    assert float(out.opacity_logits[1]) == -1.0 or sig[1] <= 0.01
    np.testing.assert_array_equal(
        np.asarray(out.opacity_logits[4:]), np.full(4, DEAD_OPACITY_LOGIT)
    )


def test_visibility_normalized_trigger():
    """avg grad divides by per-Gaussian visible-step count, not total steps."""
    cap = 4
    st = init_densify_state(cap)
    g = jnp.full((cap, 2), 1.0)
    vis_a = jnp.array([True, True, False, False])
    vis_b = jnp.array([True, False, False, False])
    st = accumulate_grads(st, g, vis_a)
    st = accumulate_grads(st, jnp.zeros((cap, 2)), vis_b)
    avg = np.asarray(st.grad_accum / np.maximum(np.asarray(st.visit_count), 1))
    norm1 = 0.5 * np.sqrt(2.0)
    # slot 0: one grad over two visible steps; slot 1: one grad over one step
    assert abs(avg[0] - norm1 / 2) < 1e-6
    assert abs(avg[1] - norm1) < 1e-6


def test_fit_with_densification_reduces_loss():
    from gsplat_tpu import Camera, RenderConfig, render
    from gsplat_tpu.train.loop import fit

    cfg = RenderConfig(width=32, height=32, tile_size=8,
                       max_intersections=1 << 12, max_tiles_per_gaussian=16,
                       block_size=8, max_per_tile=128)
    target_scene = random_scene(jax.random.key(3), 30, sh_degree=1)
    cam = Camera.default(32, 32)
    cams = jax.tree.map(lambda x: x[None], cam)
    targets = render(target_scene, cam, cfg).image[None]

    init = random_scene(jax.random.key(4), 20, sh_degree=1).pad_to(64)
    trained, metrics = fit(
        init, cams, targets, cfg, steps=30, lr=5e-2, log_every=10,
        densify_every=10, densify_grad_threshold=1e-5, densify_until=20,
    )
    assert trained.num_gaussians == 64  # capacity preserved
    assert metrics[-1]["loss"] < metrics[0]["loss"]


def test_saturated_round_preserves_mass():
    """At zero free capacity, a densify round must be a NO-OP (plus the
    saturated flag) -- the old behavior killed split parents and dropped
    the children that found no slot, destroying mass every saturated round
    (measured: a continuously saturated run collapsed 256k splats to 0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplat_tpu.models.gaussians import random_scene
    from gsplat_tpu.train.densify import (
        DensifyState,
        densify_and_prune,
        init_densify_state,
    )

    scene = random_scene(jax.random.key(0), 64, sh_degree=1)
    # All alive (high opacity), all large (will want splits), no free slots.
    scene = scene.replace(
        opacity_logits=jnp.full_like(scene.opacity_logits, 3.0),
        log_scales=jnp.full_like(scene.log_scales, jnp.log(0.5)),
    )
    st = init_densify_state(64)
    st = DensifyState(
        grad_accum=jnp.full((64,), 1.0),     # every splat far over threshold
        count=jnp.ones((), jnp.int32),
        visit_count=jnp.ones((64,), jnp.int32),
    )
    new_scene, _, changed, stats = densify_and_prune(
        scene, st, grad_threshold=2e-4, split_size=0.01
    )
    assert bool(stats["saturated"])
    assert int(stats["num_alive"]) == 64, "saturation must not destroy mass"
    for a, b in zip(jax.tree.leaves(new_scene), jax.tree.leaves(scene)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not bool(jnp.any(changed))


def test_partially_saturated_round_admits_budget():
    """With F free slots and more than F wanted ops, exactly F ops run and
    every admitted split places BOTH children."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.models.gaussians import random_scene
    from gsplat_tpu.train.densify import (
        DensifyState,
        alive_mask,
        densify_and_prune,
    )

    c, n_alive = 64, 48  # 16 free slots
    scene = random_scene(jax.random.key(1), n_alive, sh_degree=1)
    scene = scene.replace(
        opacity_logits=jnp.full_like(scene.opacity_logits, 3.0),
        log_scales=jnp.full_like(scene.log_scales, jnp.log(0.5)),
    ).pad_to(c)
    st = DensifyState(
        grad_accum=jnp.where(jnp.arange(c) < n_alive, 1.0, 0.0),
        count=jnp.ones((), jnp.int32),
        visit_count=jnp.ones((c,), jnp.int32),
    )
    new_scene, _, _, stats = densify_and_prune(
        scene, st, grad_threshold=2e-4, split_size=0.01
    )
    assert bool(stats["saturated"])
    # 16 admitted splits: 48 - 16 parents + 32 children = 64 alive.
    assert int(stats["num_alive"]) == 64
    assert int(jnp.sum(alive_mask(new_scene))) == 64
