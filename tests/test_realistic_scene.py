"""Heavy-tailed capture-statistics scenes (VERDICT r01 missing #1 / weak #4):
the tier budgets and capacities tuned on random_scene must hold -- or be
resizable from tier_occupancy's report -- on a realistic distribution with
fat anisotropic splats, bimodal opacity, and a long depth tail."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import Camera, RenderConfig, render
from gsplat_tpu.models.gaussians import realistic_scene
from gsplat_tpu.ops.binning import tier_occupancy
from gsplat_tpu.ops.projection import project_gaussians

CFG = RenderConfig(
    width=128,
    height=128,
    tile_size=16,
    max_intersections=1 << 16,
    max_tiles_per_gaussian=64,
    block_size=16,
    max_per_tile=1024,
    binning="tiered",
    tier_spec=(8, 5, 64),
)


def test_realistic_scene_statistics():
    scene = realistic_scene(jax.random.key(0), 20_000)
    ls = np.asarray(scene.log_scales)
    op = 1 / (1 + np.exp(-np.asarray(scene.opacity_logits)))
    # log-normal scales with a fat tail: the max footprint must dwarf the
    # median (random_scene's uniform [-4.5, -2.5] never exceeds ~12x).
    assert np.exp(ls.max()) / np.exp(np.median(ls)) > 50
    # bimodal opacity: both sub-1/255-adjacent and near-opaque mass present
    assert (op < 0.1).mean() > 0.15 and (op > 0.6).mean() > 0.3
    # long depth tail
    z = np.asarray(scene.means)[:, 2]
    assert z.max() / np.median(z) > 2.5


def test_tier_occupancy_report_sizes_capacity():
    """The report's suggested capacity must actually cover the scene: re-bin
    with it and see no stream overflow (rect K_max pressure is reported
    separately and handled by raising K_max)."""
    scene = realistic_scene(jax.random.key(1), 10_000)
    cam = Camera.default(CFG.width, CFG.height)
    big = dataclasses.replace(CFG, max_tiles_per_gaussian=128, tier_spec=(8, 5, 128))
    rep = tier_occupancy(project_gaussians(scene, cam, big), big)
    assert rep["num_intersections"] > 0
    assert all(r["occupancy"] <= 1.0 for r in rep["tiers"])

    sized = dataclasses.replace(
        big, max_intersections=max(rep["suggested_max_intersections"], 1024)
    )
    out = render(scene, cam, sized)
    assert not bool(out.overflow)
    assert np.isfinite(np.asarray(out.image)).all()
    assert int(out.num_intersections) == rep["num_intersections"]


def test_realistic_render_finite_and_bounded():
    scene = realistic_scene(jax.random.key(2), 10_000)
    cam = Camera.default(CFG.width, CFG.height)
    big = dataclasses.replace(
        CFG, max_tiles_per_gaussian=128, tier_spec=(8, 5, 128),
        max_intersections=1 << 17,
    )
    out = render(scene, cam, big)
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    # SH radiance can exceed 1 pre-display-clamp (the reference clamps at
    # presentation, src/process_gaussians.wgsl keeps colors >= 0 only);
    # transmittance-weighted blending bounds it by the max splat radiance.
    assert img.min() >= 0.0 and img.max() < 3.0


def test_realistic_fit_reduces_loss():
    from gsplat_tpu.train.loop import fit

    cfg = dataclasses.replace(
        CFG, width=64, height=64, tile_size=8, block_size=8,
        max_intersections=1 << 14, max_tiles_per_gaussian=128,
        tier_spec=(8, 5, 128), max_per_tile=512,
    )
    target_scene = realistic_scene(jax.random.key(3), 300, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    cams = jax.tree.map(lambda x: x[None], cam)
    targets = render(target_scene, cam, cfg).image[None]

    init = realistic_scene(jax.random.key(4), 200, sh_degree=1).pad_to(256)
    trained, metrics = fit(
        init, cams, targets, cfg, steps=25, lr=3e-2, log_every=5,
        overflow_policy="warn",
    )
    assert metrics[-1]["loss"] < metrics[0]["loss"]
