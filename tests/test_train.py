import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import Camera, RenderConfig, random_scene, render
from gsplat_tpu.parallel.train_step import init_train_state, make_optimizer
from gsplat_tpu.train.loop import fit, make_train_step
from gsplat_tpu.train.losses import l1, psnr, rgb_loss, ssim
from gsplat_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

CFG = RenderConfig(
    width=32, height=32, tile_size=8, max_intersections=1 << 12,
    max_tiles_per_gaussian=32, block_size=8, max_per_tile=128,
)


def test_ssim_identity():
    img = jax.random.uniform(jax.random.key(0), (32, 32, 3))
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    noisy = img + 0.3 * jax.random.normal(jax.random.key(1), img.shape)
    assert float(ssim(img, noisy)) < 0.9


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-3


def test_rgb_loss_combines():
    a = jax.random.uniform(jax.random.key(0), (32, 32, 3))
    b = jax.random.uniform(jax.random.key(1), (32, 32, 3))
    pure_l1 = float(l1(a, b))
    combined = float(rgb_loss(a, b, ssim_weight=0.2))
    assert combined != pure_l1
    assert float(rgb_loss(a, b, ssim_weight=0.0)) == pure_l1


def test_fit_reduces_loss():
    key = jax.random.key(0)
    target_scene = random_scene(key, 40, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = render(target_scene, cam, CFG).image
    cameras = jax.tree.map(lambda x: x[None], cam)
    targets = target[None]

    # Start from a perturbed copy of the target scene.
    init = target_scene.replace(
        means=target_scene.means
        + 0.03 * jax.random.normal(jax.random.fold_in(key, 1), target_scene.means.shape),
        opacity_logits=target_scene.opacity_logits - 0.5,
    )
    optimizer = make_optimizer(1e-2)
    step = make_train_step(CFG, optimizer, ssim_weight=0.0)
    state = init_train_state(init, optimizer)
    _, l0, aux0, _ = step(state, cameras, targets)
    assert not bool(aux0["overflow"])
    trained, metrics = fit(
        init, cameras, targets, CFG, steps=30, lr=1e-2,
        ssim_weight=0.0, log_every=30,
    )
    assert metrics[-1]["loss"] < float(l0)


def test_checkpoint_roundtrip(tmp_path):
    scene = random_scene(jax.random.key(0), 16, sh_degree=1)
    optimizer = make_optimizer(1e-2)
    state = init_train_state(scene, optimizer)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch(tmp_path):
    scene = random_scene(jax.random.key(0), 16, sh_degree=1)
    optimizer = make_optimizer(1e-2)
    state = init_train_state(scene, optimizer)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)
    bigger = init_train_state(
        random_scene(jax.random.key(1), 32, sh_degree=1), optimizer
    )
    import pytest

    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, bigger)


def test_fit_aborts_naming_nonfinite_grad_leaf():
    """A NaN parameter must abort the fit (overflow_policy='raise') with a
    message NAMING the offending gradient leaf -- the round-4 diagnosis
    instrumentation. A NaN mean renders NaN pixels whose gradients are
    non-finite from the first step."""
    import pytest

    key = jax.random.key(0)
    scene = random_scene(key, 40, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = render(scene, cam, CFG).image
    bad = scene.replace(means=scene.means.at[0, 0].set(jnp.nan))
    with pytest.raises(FloatingPointError, match="means"):
        fit(
            bad, jax.tree.map(lambda x: x[None], cam), target[None], CFG,
            steps=2, lr=1e-2, ssim_weight=0.0, log_every=1,
            overflow_policy="raise",
        )


def test_ssim_no_denominator_pole():
    """SSIM must be pole-free BY CONSTRUCTION: the variance estimates
    blur(a^2) - mu^2 go negative under floating-point cancellation (on TPU,
    bf16-default convs pushed them to -4e-3, past the c2 = 9e-4 stabilizer
    -- the round-4 protocol-run killer: loss = -inf at step 159), so the
    clamped map must stay finite with finite gradients for ANY input
    magnitude."""
    from gsplat_tpu.train.losses import ssim_map

    key = jax.random.key(3)
    a = 1e3 * jax.random.uniform(key, (64, 64, 3))
    b = 1e3 * jax.random.uniform(jax.random.fold_in(key, 1), (64, 64, 3))
    m = ssim_map(a, b)
    assert bool(jnp.all(jnp.isfinite(m)))
    g = jax.grad(lambda x: ssim(x, b))(a)
    assert bool(jnp.all(jnp.isfinite(g)))
    # Identity still exact.
    assert abs(float(ssim(a / 1e3, a / 1e3)) - 1.0) < 1e-5


def test_staged_capacity_tightens_and_regrows(capsys):
    """retighten_capacity: after densify_until the step re-jits at a
    tightened max_intersections sized from measured peak demand; the
    run completes with the same final quality surface (finite loss,
    no overflow abort) under overflow_policy='raise'."""
    key = jax.random.key(0)
    target_scene = random_scene(key, 40, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = render(target_scene, cam, CFG).image
    cameras = jax.tree.map(lambda x: x[None], cam)
    targets = target[None]
    init = target_scene.replace(
        opacity_logits=target_scene.opacity_logits - 0.5,
    )
    trained, metrics = fit(
        init, cameras, targets, CFG, steps=12, lr=1e-2, ssim_weight=0.0,
        log_every=4, overflow_policy="raise", densify_until=6,
        retighten_capacity=1.3,
    )
    out = capsys.readouterr().out
    assert "staged capacity: tightening max_intersections" in out
    assert np.isfinite(metrics[-1]["loss"])


def test_staged_capacity_no_tighten_when_demand_high(capsys):
    """When capacity is already tight (new_max >= max_intersections), the
    schedule is a no-op (no re-jit, no message)."""
    key = jax.random.key(1)
    target_scene = random_scene(key, 40, sh_degree=1)
    cam = Camera.default(CFG.width, CFG.height)
    target = render(target_scene, cam, CFG).image
    cameras = jax.tree.map(lambda x: x[None], cam)
    targets = target[None]
    import dataclasses

    out0 = render(target_scene, cam, CFG)
    snug = dataclasses.replace(
        CFG, max_intersections=int(out0.num_intersections) + 64
    )
    trained, metrics = fit(
        target_scene, cameras, targets, snug, steps=8, lr=1e-3,
        ssim_weight=0.0, log_every=4, overflow_policy="warn",
        densify_until=2, retighten_capacity=1.3,
    )
    out = capsys.readouterr().out
    assert "staged capacity: tightening" not in out


def test_staged_capacity_tightens_tier_spec(capsys):
    """With tiered binning, the staged schedule also re-sizes pool budgets
    from measured post-cull membership (aux['tier_members'])."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, binning="tiered", tier_spec=((4, 0), (8, 2), (16, 4), (32, 8)),
    )
    key = jax.random.key(2)
    target_scene = random_scene(key, 60, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = render(target_scene, cam, cfg).image
    cameras = jax.tree.map(lambda x: x[None], cam)
    targets = target[None]
    trained, metrics = fit(
        target_scene, cameras, targets, cfg, steps=10, lr=1e-3,
        ssim_weight=0.0, log_every=5, overflow_policy="raise",
        densify_until=4, retighten_capacity=1.5,
    )
    out = capsys.readouterr().out
    assert "tier_spec" in out and "staged capacity: tightening" in out
    assert np.isfinite(metrics[-1]["loss"])
