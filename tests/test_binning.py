import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import RenderConfig
from gsplat_tpu.ops.binning import bin_gaussians, gather_features
from gsplat_tpu.ops.projection import project_gaussians


def _bin(cfg, scene, cam, mode):
    # The numpy oracle below models the pure rect walk, so the exact
    # ellipse-tile culling (tested separately for image-invariance) is off.
    cfg = dataclasses.replace(cfg, binning=mode, tile_culling=False)
    proj = project_gaussians(scene, cam, cfg)
    return proj, bin_gaussians(proj, cfg), cfg


@pytest.mark.parametrize("mode", ["sort", "scatter"])
def test_binning_against_numpy(mode, small_cfg, small_scene, small_camera):
    proj, binned, cfg = _bin(small_cfg, small_scene, small_camera, mode)
    rect = np.asarray(proj.rect)
    counts = np.asarray(proj.counts)
    depth = np.asarray(proj.depth)
    n = counts.shape[0]

    # Build the expected (tile, depth, gid) list in numpy.
    entries = []
    for i in range(n):
        c = 0
        for ty in range(rect[i, 1], rect[i, 3]):
            for tx in range(rect[i, 0], rect[i, 2]):
                if c >= counts[i]:
                    break
                entries.append((ty * cfg.tiles_x + tx, depth[i], i))
                c += 1
            if c >= counts[i]:
                break
        # row-major rect walk, truncated at counts[i] -- matches
        # _candidate_tiles' k % w / k // w ordering.
    entries.sort(key=lambda e: (e[0], e[1]))
    total = counts.sum()
    assert int(binned.num_intersections) == total
    assert not bool(binned.overflow)

    s_tile = np.asarray(binned.sorted_tile)[:total]
    s_gid = np.asarray(binned.sorted_gid)[:total]
    np.testing.assert_array_equal(s_tile, [e[0] for e in entries])
    np.testing.assert_array_equal(s_gid, [e[2] for e in entries])
    # Padding is sentinel.
    assert np.all(np.asarray(binned.sorted_tile)[total:] == cfg.num_tiles)

    # Ranges: per-tile spans partition the valid prefix.
    ranges = np.asarray(binned.ranges)
    assert ranges[0] == 0 and ranges[-1] == total
    for t in range(cfg.num_tiles):
        seg = s_tile[ranges[t] : ranges[t + 1]]
        assert np.all(seg == t)
        seg_d = depth[s_gid[ranges[t] : ranges[t + 1]]]
        assert np.all(np.diff(seg_d) >= 0)  # depth-ordered within tile


def test_sort_and_scatter_agree(small_cfg, small_scene, small_camera):
    _, b1, _ = _bin(small_cfg, small_scene, small_camera, "sort")
    _, b2, _ = _bin(small_cfg, small_scene, small_camera, "scatter")
    np.testing.assert_array_equal(
        np.asarray(b1.sorted_tile), np.asarray(b2.sorted_tile)
    )
    np.testing.assert_array_equal(np.asarray(b1.ranges), np.asarray(b2.ranges))
    total = int(b1.num_intersections)
    np.testing.assert_array_equal(
        np.asarray(b1.sorted_gid)[:total], np.asarray(b2.sorted_gid)[:total]
    )


def test_packed_binning_matches_sort(small_cfg, small_scene, small_camera):
    """Packed single-key mode: identical per-tile membership and ranges;
    ordering identical up to quantized-depth ties (none in a random scene)."""
    _, b_sort, _ = _bin(small_cfg, small_scene, small_camera, "sort")
    _, b_packed, cfg = _bin(small_cfg, small_scene, small_camera, "packed")
    np.testing.assert_array_equal(
        np.asarray(b_sort.ranges), np.asarray(b_packed.ranges)
    )
    total = int(b_sort.num_intersections)
    np.testing.assert_array_equal(
        np.asarray(b_sort.sorted_gid)[:total],
        np.asarray(b_packed.sorted_gid)[:total],
    )


def test_tiered_binning_matches_sort(small_cfg, small_scene, small_camera):
    """Tiered candidate pools reproduce the exact sorted stream when the
    overflow budgets suffice."""
    _, b_sort, _ = _bin(small_cfg, small_scene, small_camera, "sort")
    _, b_tiered, cfg = _bin(small_cfg, small_scene, small_camera, "tiered")
    assert not bool(b_tiered.overflow)
    assert int(b_tiered.num_intersections) == int(b_sort.num_intersections)
    np.testing.assert_array_equal(
        np.asarray(b_sort.ranges), np.asarray(b_tiered.ranges)
    )
    total = int(b_sort.num_intersections)
    np.testing.assert_array_equal(
        np.asarray(b_sort.sorted_gid)[:total],
        np.asarray(b_tiered.sorted_gid)[:total],
    )


def test_tiered_pool_overflow_flag(small_camera):
    """More big-rect Gaussians than the pool budget -> overflow flagged."""
    import jax as _jax
    from gsplat_tpu.models.gaussians import random_scene as _rs

    # Huge gaussians: every one covers > 16 tiles; budget n//16 = 0 -> flag.
    scene = _rs(_jax.random.key(5), 16, sh_degree=0)
    scene = scene.replace(log_scales=jnp.full_like(scene.log_scales, 0.0))
    cfg = RenderConfig(
        width=64, height=64, tile_size=8, max_intersections=1 << 13,
        max_tiles_per_gaussian=64, block_size=8, max_per_tile=256,
        binning="tiered",
    )
    from gsplat_tpu.ops.projection import project_gaussians as _pg

    proj = _pg(scene, small_camera, cfg)
    binned = bin_gaussians(proj, cfg)
    counts = np.asarray(proj.counts)
    if (counts > 16).sum() > max(16 // 16, 1):
        assert bool(binned.overflow)


def test_capacity_overflow_flag(small_scene, small_camera):
    cfg = RenderConfig(
        width=64, height=64, tile_size=8, max_intersections=8,
        max_tiles_per_gaussian=64, block_size=8, max_per_tile=8,
    )
    proj = project_gaussians(small_scene, small_camera, cfg)
    binned = bin_gaussians(proj, cfg)
    assert bool(binned.overflow)
    assert binned.sorted_tile.shape == (8,)


def test_gather_features_shape(small_cfg, small_scene, small_camera):
    proj, binned, cfg = _bin(small_cfg, small_scene, small_camera, "sort")
    feats = gather_features(proj, binned, cfg)
    assert feats.shape == (9, cfg.max_intersections)
    total = int(binned.num_intersections)
    gid = np.asarray(binned.sorted_gid)[:total]
    np.testing.assert_allclose(
        np.asarray(feats)[8, :total], np.asarray(proj.opacity)[gid],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(feats)[0, :total],
        np.asarray(proj.uv)[gid, 0] * cfg.width,
        rtol=1e-5,
    )


def test_precise_tile_culling_is_image_invariant():
    """Culled candidates are exactly those the blend's alpha_min skip would
    zero anyway, so the image and gradients must be bit-comparable while the
    intersection count shrinks."""
    import dataclasses

    from gsplat_tpu import Camera, RenderConfig, random_scene, render
    from gsplat_tpu.render.pipeline import render_loss

    cfg_off = RenderConfig(
        width=64, height=64, tile_size=8, max_intersections=1 << 14,
        max_tiles_per_gaussian=64, block_size=8, max_per_tile=512,
        binning="packed", tile_culling=False,
    )
    cfg_on = dataclasses.replace(cfg_off, tile_culling=True)
    scene = random_scene(jax.random.key(7), 300, sh_degree=2)
    cam = Camera.default(64, 64)

    out_off = render(scene, cam, cfg_off)
    out_on = render(scene, cam, cfg_on)
    assert int(out_on.num_intersections) < int(out_off.num_intersections)
    np.testing.assert_allclose(
        np.asarray(out_on.image), np.asarray(out_off.image), rtol=1e-5, atol=1e-6
    )

    target = jnp.zeros((64, 64, 3))
    g_on = jax.grad(lambda s: render_loss(s, cam, target, cfg_on))(scene)
    g_off = jax.grad(lambda s: render_loss(s, cam, target, cfg_off))(scene)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("mode", ["packed", "tiered", "sort"])
def test_sort_based_gather_backward_matches_autodiff(mode):
    """The custom sort+gather VJP of the slot gather must reproduce the
    autodiff (scatter-add) gradients exactly -- compared via the 'scatter'
    binning mode, whose gather keeps the plain autodiff transpose."""
    from gsplat_tpu import Camera, RenderConfig, random_scene
    from gsplat_tpu.render.pipeline import render_loss

    cfg = RenderConfig(
        width=64, height=64, tile_size=8, max_intersections=1 << 14,
        max_tiles_per_gaussian=64, block_size=8, max_per_tile=512,
        binning=mode,
    )
    cfg_ref = dataclasses.replace(cfg, binning="scatter")
    scene = random_scene(jax.random.key(11), 250, sh_degree=2)
    cam = Camera.default(64, 64)
    target = jax.random.uniform(jax.random.key(12), (64, 64, 3))

    g = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    g_ref = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_ref)))(scene)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_tiered_matches_sort_large_kmax(small_scene, small_camera):
    """Three-tier structure with a k_range past 64 (kmax=96)."""
    cfg = RenderConfig(
        width=64, height=64, tile_size=8, max_intersections=1 << 14,
        max_tiles_per_gaussian=96, block_size=8, max_per_tile=512,
        tile_culling=False,
    )
    proj = project_gaussians(small_scene, small_camera, cfg)
    b_sort = bin_gaussians(proj, dataclasses.replace(cfg, binning="sort"))
    b_tier = bin_gaussians(proj, dataclasses.replace(cfg, binning="tiered"))
    assert int(b_tier.num_intersections) == int(b_sort.num_intersections)
    np.testing.assert_array_equal(
        np.asarray(b_sort.ranges), np.asarray(b_tier.ranges)
    )


def test_nested_tier_plan_matches_packed(small_cfg, small_camera):
    """General ((k_hi, div), ...) tier plans (ladder form) must reproduce the
    packed-mode image and gradients exactly (up to fp blend-order jitter)."""
    from gsplat_tpu import random_scene, render
    from gsplat_tpu.render.pipeline import render_loss

    scene = random_scene(jax.random.key(5), 500, sh_degree=2)
    ref_cfg = dataclasses.replace(small_cfg, binning="packed")
    ref = render(scene, small_camera, ref_cfg)
    plan = ((4, 0), (8, 2), (16, 6), (32, 32), (64, 512))
    cfg = dataclasses.replace(small_cfg, binning="tiered", tier_spec=plan)
    out = render(scene, small_camera, cfg)
    assert not bool(out.overflow)
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(ref.image), rtol=1e-5, atol=1e-6
    )
    target = jnp.zeros_like(ref.image)
    g_t = jax.grad(lambda s: render_loss(s, small_camera, target, cfg))(scene)
    g_r = jax.grad(lambda s: render_loss(s, small_camera, target, ref_cfg))(scene)
    for name in ["means", "log_scales", "quats", "opacity_logits", "sh"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g_t, name)), np.asarray(getattr(g_r, name)),
            rtol=1e-4, atol=1e-6, err_msg=name,
        )


def test_gather_backward_permute_matches_variadic():
    """cfg.gather_backward='permute' (compile-friendly 2-operand sort +
    2-D take) must produce bit-identical gradients to the default variadic
    sort -- both reduce the same slot gradients over the same runs."""
    import dataclasses

    import numpy as np

    from gsplat_tpu import Camera, RenderConfig, random_scene
    from gsplat_tpu.render.pipeline import render_loss

    cfg = RenderConfig(width=64, height=64, tile_size=8,
                       max_intersections=1 << 13, max_tiles_per_gaussian=64,
                       block_size=8, max_per_tile=256, binning="tiered",
                       tier_spec=(8, 5, 64))
    scene = random_scene(jax.random.key(11), 150, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(12), (64, 64, 3))

    g_var = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    cfg_p = dataclasses.replace(cfg, gather_backward="permute")
    g_perm = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_p)))(scene)
    for a, b in zip(jax.tree.leaves(g_var), jax.tree.leaves(g_perm)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_backward_c64_matches_variadic():
    """cfg.gather_backward='c64' (gradient rows paired into complex64 sort
    values; fewer sort operands for the compile-time win) carries the exact
    same f32 payload, so gradients must be bit-identical to 'variadic'."""
    import dataclasses

    import numpy as np

    from gsplat_tpu import Camera, RenderConfig, random_scene
    from gsplat_tpu.render.pipeline import render_loss

    cfg = RenderConfig(width=64, height=64, tile_size=8,
                       max_intersections=1 << 13, max_tiles_per_gaussian=64,
                       block_size=8, max_per_tile=256, binning="tiered",
                       tier_spec=(8, 5, 64))
    scene = random_scene(jax.random.key(11), 150, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(12), (64, 64, 3))

    g_var = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    cfg_c = dataclasses.replace(cfg, gather_backward="c64")
    g_c = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_c)))(scene)
    for a, b in zip(jax.tree.leaves(g_var), jax.tree.leaves(g_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_readout_bf16_close_to_f32():
    """cfg.grad_readout='bf16' rounds only the final per-Gaussian gradient
    (suffix sums stay f32), so it must match the f32 path to bf16 precision
    (~0.4% relative), not bit-exactly."""
    import dataclasses

    import numpy as np

    from gsplat_tpu import Camera, RenderConfig, random_scene
    from gsplat_tpu.render.pipeline import render_loss

    cfg = RenderConfig(width=64, height=64, tile_size=8,
                       max_intersections=1 << 13, max_tiles_per_gaussian=64,
                       block_size=8, max_per_tile=256, binning="tiered",
                       tier_spec=(8, 5, 64))
    scene = random_scene(jax.random.key(3), 120, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(4), (64, 64, 3))

    g_f32 = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    cfg_b = dataclasses.replace(cfg, grad_readout="bf16")
    g_b = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_b)))(scene)
    for a, b in zip(jax.tree.leaves(g_f32), jax.tree.leaves(g_b)):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 rounds the feature-level grads (<=0.4% each); chaining
        # through projection can amplify that on cancellation-prone
        # entries, so tolerate relative to the leaf's gradient scale.
        scale = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) <= 0.02 * scale, (
            float(np.abs(a - b).max()) / scale
        )


def test_gather_backward_bf16_close_to_exact():
    """cfg.gather_backward='bf16' (slot grads bf16-pair-packed through the
    sort and the packed Pallas segsum kernel) must match the exact path to
    mixed-precision tolerance."""
    import dataclasses

    import numpy as np

    from gsplat_tpu import Camera, RenderConfig, random_scene
    from gsplat_tpu.render.pipeline import render_loss

    cfg = RenderConfig(width=64, height=64, tile_size=8,
                       max_intersections=1 << 13, max_tiles_per_gaussian=64,
                       block_size=8, max_per_tile=256, binning="tiered",
                       tier_spec=(8, 5, 64), pallas_interpret=True)
    scene = random_scene(jax.random.key(5), 120, sh_degree=1)
    cam = Camera.default(cfg.width, cfg.height)
    target = jax.random.uniform(jax.random.key(6), (64, 64, 3))

    g_f32 = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg)))(scene)
    cfg_b = dataclasses.replace(cfg, gather_backward="bf16",
                                grad_readout="bf16", segment_sum="pallas")
    g_b = jax.jit(jax.grad(lambda s: render_loss(s, cam, target, cfg_b)))(scene)
    for a, b in zip(jax.tree.leaves(g_f32), jax.tree.leaves(g_b)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) <= 0.03 * scale, (
            float(np.abs(a - b).max()) / scale
        )


def test_pool_first_tier_is_survivor_compaction(small_cfg, small_camera):
    """A BUDGETED first tier ((K0, div) with div > 0) is visibility
    compaction: every tier enumerates rows from the count-descending
    ranking prefix, so only Gaussians with >= 1 surviving tile occupy sort
    lanes. Must match the dense-first-tier image and gradients exactly, and
    flag overflow when the budget is smaller than the survivor count
    (VERDICT r3 task 4 -- measured rejection lives in PROFILE.md; the mode
    stays supported for scenes with low survivor fractions)."""
    from gsplat_tpu import random_scene, render
    from gsplat_tpu.render.pipeline import render_loss

    scene = random_scene(jax.random.key(7), 500, sh_degree=2)
    ref_cfg = dataclasses.replace(
        small_cfg, binning="tiered",
        tier_spec=((4, 0), (8, 2), (16, 6), (32, 32), (64, 512)),
    )
    ref = render(scene, small_camera, ref_cfg)
    # div=1 first tier: budget N rows -- coverage-identical, all gathered.
    cfg = dataclasses.replace(
        ref_cfg, tier_spec=((4, 1), (8, 2), (16, 6), (32, 32), (64, 512))
    )
    out = render(scene, small_camera, cfg)
    assert not bool(out.overflow)
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(ref.image), rtol=1e-5, atol=1e-6
    )
    target = jnp.zeros_like(ref.image)
    g_c = jax.grad(lambda s: render_loss(s, small_camera, target, cfg))(scene)
    g_r = jax.grad(
        lambda s: render_loss(s, small_camera, target, ref_cfg)
    )(scene)
    for name in ["means", "log_scales", "quats", "opacity_logits", "sh"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g_c, name)), np.asarray(getattr(g_r, name)),
            rtol=1e-4, atol=1e-6, err_msg=name,
        )
    # A first-tier budget below the survivor count must flag overflow.
    tight = dataclasses.replace(
        ref_cfg, tier_spec=((4, 100), (8, 2), (16, 6), (32, 32), (64, 512))
    )
    assert bool(render(scene, small_camera, tight).overflow)
