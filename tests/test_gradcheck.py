"""Gradient checks (BASELINE config 1): autodiff through the full pipeline vs
finite differences on a tiny synthetic scene, plus oracle-vs-tiled gradient
agreement."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import Camera, RenderConfig, random_scene
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.raster_jnp import rasterize_dense_oracle
from gsplat_tpu.render.pipeline import render, render_loss

CFG = RenderConfig(
    width=32, height=32, tile_size=8, max_intersections=1 << 12,
    max_tiles_per_gaussian=32, block_size=8, max_per_tile=128,
)


def _setup():
    cam = Camera.default(CFG.width, CFG.height)
    scene = random_scene(jax.random.key(11), 24, sh_degree=1)
    key = jax.random.key(12)
    target = jax.random.uniform(key, (CFG.height, CFG.width, 3))
    return scene, cam, target


def test_grad_finite_and_nonzero():
    scene, cam, target = _setup()
    g = jax.grad(render_loss)(scene, cam, target, CFG)
    for name, leaf in zip(
        ["means", "log_scales", "quats", "opacity_logits", "sh"],
        [g.means, g.log_scales, g.quats, g.opacity_logits, g.sh],
    ):
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr)), f"non-finite grad in {name}"
        assert np.any(arr != 0.0), f"all-zero grad in {name}"


def test_grad_matches_finite_differences():
    scene, cam, target = _setup()

    loss_fn = jax.jit(lambda s: render_loss(s, cam, target, CFG))
    grad_fn = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, CFG)))
    g = grad_fn(scene)

    rng = np.random.default_rng(0)
    eps = 1e-3
    checks = 0
    for field in ["means", "opacity_logits", "sh", "log_scales", "quats"]:
        base = np.asarray(getattr(scene, field), dtype=np.float64)
        gf = np.asarray(getattr(g, field))
        flat = base.reshape(-1)
        # Probe a few random coordinates per field.
        for idx in rng.choice(flat.size, size=4, replace=False):
            bump = np.zeros_like(flat)
            bump[idx] = eps
            pert = bump.reshape(base.shape).astype(np.float32)
            s_plus = scene.replace(**{field: jnp.asarray(base + pert, jnp.float32)})
            s_minus = scene.replace(**{field: jnp.asarray(base - pert, jnp.float32)})
            fd = (float(loss_fn(s_plus)) - float(loss_fn(s_minus))) / (2 * eps)
            an = gf.reshape(-1)[idx]
            # f32 forward -> FD noise floor ~1e-4/eps; tolerate both scales.
            assert abs(fd - an) < 5e-3 + 0.05 * abs(fd), (
                f"{field}[{idx}]: fd={fd:.6f} analytic={an:.6f}"
            )
            checks += 1
    assert checks == 20


def test_tiled_and_oracle_grads_agree():
    scene, cam, target = _setup()

    def loss_tiled(s):
        return render_loss(s, cam, target, CFG)

    def loss_oracle(s):
        proj = project_gaussians(s, cam, CFG)
        img, _ = rasterize_dense_oracle(proj, CFG)
        return jnp.mean(jnp.abs(img - target))

    g1 = jax.grad(loss_tiled)(scene)
    g2 = jax.grad(loss_oracle)(scene)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )


def test_no_nan_grads_with_aligned_padding_slots():
    """Regression: d_op = moments/opacity NaN'd on zero-feature lanes
    (stream_align padding gathers the zero column -> opacity exactly 0),
    and the segment-sum spread the NaN into real runs (NaN * 0 = NaN)."""
    import dataclasses

    import jax.numpy as jnp

    from gsplat_tpu import Camera, RenderConfig, random_scene
    from gsplat_tpu.render.pipeline import render_loss

    cfg = RenderConfig(width=64, height=64, tile_size=8,
                       max_intersections=1 << 13, max_tiles_per_gaussian=64,
                       block_size=8, max_per_tile=256, binning="tiered",
                       tier_spec=(8, 5, 64), stream_align=16, impl="pallas",
                       pallas_interpret=True, pallas_block_size=32)
    scene = random_scene(jax.random.key(0), 150, sh_degree=1)
    cam = Camera.default(64, 64)
    target = jax.random.uniform(jax.random.key(1), (64, 64, 3))
    g = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))
