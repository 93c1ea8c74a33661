import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import Camera, RenderConfig, random_scene
from gsplat_tpu.models.gaussians import GaussianScene
from gsplat_tpu.ops.projection import (
    compute_cov3d,
    project_gaussians,
    quat_to_rotmat,
)


def _scene_single(mean, log_scale, quat, opacity=2.0, sh0=1.0):
    return GaussianScene(
        means=jnp.array([mean], jnp.float32),
        log_scales=jnp.array([log_scale], jnp.float32),
        quats=jnp.array([quat], jnp.float32),
        opacity_logits=jnp.array([opacity], jnp.float32),
        sh=jnp.full((1, 1, 3), sh0, jnp.float32),
    )


def test_quat_to_rotmat_orthonormal():
    q = jax.random.normal(jax.random.key(1), (64, 4))
    r = np.asarray(quat_to_rotmat(q))
    eye = np.broadcast_to(np.eye(3), r.shape)
    np.testing.assert_allclose(r @ r.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_quat_identity():
    r = np.asarray(quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]])))
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-7)


def test_cov3d_equals_reference_MtM():
    """Reference builds Sigma = M^T M with M = S R_wgsl where R_wgsl is the
    column-major (= transposed) rotation (src/process_gaussians.wgsl:127-162);
    algebraically Sigma = R diag(s^2) R^T. Verify our closed form against the
    reference's construction done explicitly in numpy."""
    rng = np.random.default_rng(3)
    log_s = rng.normal(size=(16, 3)).astype(np.float32) * 0.5
    quats = rng.normal(size=(16, 4)).astype(np.float32)
    got = np.asarray(compute_cov3d(jnp.asarray(log_s), jnp.asarray(quats), 1.0))

    for i in range(16):
        q = quats[i] / np.linalg.norm(quats[i])
        w, x, y, z = q
        r_std = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        s = np.diag(np.exp(log_s[i]))
        m = s @ r_std.T  # the reference's M (column-major R == R^T)
        sigma = m.T @ m
        np.testing.assert_allclose(got[i], sigma, rtol=1e-4, atol=1e-5)


def test_cov2d_matches_slow_ewa():
    """Full EWA chain vs an explicit per-Gaussian numpy transcription of
    src/process_gaussians.wgsl:165-218."""
    cfg = RenderConfig(width=128, height=128, tile_size=16)
    cam = Camera.default(128, 128)
    scene = random_scene(jax.random.key(7), 32, sh_degree=0)
    proj = project_gaussians(scene, cam, cfg)

    view = np.asarray(cam.view)
    fx, fy = np.asarray(cam.focal)
    tanx, tany = np.asarray(cam.tan_fov)
    cov3d = np.asarray(compute_cov3d(scene.log_scales, scene.quats, 1.0))
    means = np.asarray(scene.means)
    mask = np.asarray(proj.mask)

    for i in range(32):
        if not mask[i]:
            continue
        t = view[:3, :3] @ means[i] + view[:3, 3]
        limx, limy = 1.3 * tanx, 1.3 * tany
        tx = min(limx, max(-limx, t[0] / t[2])) * t[2]
        ty = min(limy, max(-limy, t[1] / t[2])) * t[2]
        tz = t[2]
        J = np.array(
            [
                [fx / tz, 0, -fx * tx / tz**2],
                [0, fy / tz, -fy * ty / tz**2],
            ]
        )
        T = J @ view[:3, :3]
        cov = T @ cov3d[i] @ T.T + 0.3 * np.eye(2)
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] ** 2
        conic = np.array([cov[1, 1], -cov[0, 1], cov[0, 0]]) / det
        np.testing.assert_allclose(
            np.asarray(proj.conic)[i], conic, rtol=2e-3, atol=1e-5
        )
        mid = 0.5 * (cov[0, 0] + cov[1, 1])
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(lam))
        np.testing.assert_allclose(np.asarray(proj.radius)[i], radius, atol=1.0)


def test_frustum_culling():
    cfg = RenderConfig(width=64, height=64, tile_size=8)
    cam = Camera.create(np.eye(4), 64, 64, fx=64.0, fy=64.0, znear=0.2, zfar=100.0)
    # behind camera, in front, far off-axis
    scene = GaussianScene(
        means=jnp.array(
            [[0, 0, -5.0], [0, 0, 5.0], [100.0, 0, 5.0], [0, 0, 0.1]], jnp.float32
        ),
        log_scales=jnp.full((4, 3), -2.0),
        quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (4, 1)),
        opacity_logits=jnp.zeros(4),
        sh=jnp.ones((4, 1, 3)),
    )
    proj = project_gaussians(scene, cam, cfg)
    mask = np.asarray(proj.mask)
    assert not mask[0]  # behind
    assert mask[1]      # visible
    assert not mask[2]  # off-axis
    assert not mask[3]  # closer than znear


def test_rect_and_counts(small_cfg, small_scene, small_camera):
    proj = project_gaussians(small_scene, small_camera, small_cfg)
    rect = np.asarray(proj.rect)
    counts = np.asarray(proj.counts)
    mask = np.asarray(proj.mask)
    assert np.all(rect[:, 0] >= 0) and np.all(rect[:, 1] >= 0)
    assert np.all(rect[:, 2] <= small_cfg.tiles_x)
    assert np.all(rect[:, 3] <= small_cfg.tiles_y)
    area = np.maximum(rect[:, 2] - rect[:, 0], 0) * np.maximum(
        rect[:, 3] - rect[:, 1], 0
    )
    np.testing.assert_array_equal(
        counts, np.where(mask, np.minimum(area, small_cfg.max_tiles_per_gaussian), 0)
    )
    assert np.all(counts[~mask] == 0)


def test_projection_uv_center():
    """A Gaussian on the optical axis lands at uv = (0.5, 0.5)."""
    cfg = RenderConfig(width=64, height=64, tile_size=8)
    cam = Camera.create(np.eye(4), 64, 64, fx=64.0, fy=64.0)
    scene = _scene_single([0.0, 0.0, 3.0], [-2.0, -2.0, -2.0], [1.0, 0, 0, 0])
    proj = project_gaussians(scene, cam, cfg)
    np.testing.assert_allclose(np.asarray(proj.uv)[0], [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(proj.depth)[0], 3.0, atol=1e-6)


def test_projection_grads_finite(small_cfg, small_scene, small_camera):
    def loss(scene):
        p = project_gaussians(scene, small_camera, small_cfg)
        sel = p.mask.astype(jnp.float32)
        return (
            jnp.sum(sel[:, None] * p.uv)
            + jnp.sum(sel[:, None] * p.conic)
            + jnp.sum(sel[:, None] * p.color)
            + jnp.sum(sel * p.opacity)
        )

    g = jax.grad(loss)(small_scene)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_max_screen_radius_bounds_rects():
    """cfg.max_screen_radius shrinks oversized footprints so the tile rect
    is bounded BY CONSTRUCTION (static K_max safety under training); small
    splats are bit-identical to the unclamped projection."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplat_tpu import Camera, RenderConfig, random_scene
    from gsplat_tpu.ops.projection import project_gaussians

    cfg = RenderConfig(width=256, height=256, tile_size=16,
                       max_intersections=1 << 14, max_tiles_per_gaussian=64,
                       block_size=16, max_per_tile=256)
    scene = random_scene(jax.random.key(0), 64, sh_degree=1)
    # One giant splat right in front of the camera: full-screen footprint.
    scene = scene.replace(
        log_scales=scene.log_scales.at[0].set(jnp.log(5.0))
    )
    cam = Camera.default(cfg.width, cfg.height)

    base = project_gaussians(scene, cam, cfg)
    assert bool(base.overflow), "unclamped giant splat must overflow K_max"

    r_max = 40.0
    ccfg = dataclasses.replace(cfg, max_screen_radius=r_max)
    clamped = project_gaussians(scene, cam, ccfg)
    assert not bool(clamped.overflow)
    rad = np.asarray(clamped.radius)[np.asarray(clamped.mask)]
    assert rad.max() <= r_max + 1.0  # ceil slack
    area = np.asarray(
        (clamped.rect[:, 2] - clamped.rect[:, 0])
        * (clamped.rect[:, 3] - clamped.rect[:, 1])
    )
    per_axis = int(2 * r_max // cfg.tile_size) + 2
    assert area.max() <= per_axis * per_axis

    # Splats under the bound are untouched.
    small = np.asarray(base.radius) <= r_max
    np.testing.assert_array_equal(
        np.asarray(base.conic)[small], np.asarray(clamped.conic)[small]
    )

    # Still differentiable (the clamp factor is stop-gradient).
    def loss(s):
        p = project_gaussians(s, cam, ccfg)
        return jnp.sum(jnp.where(p.mask[:, None], p.conic, 0.0))

    g = jax.grad(lambda s: loss(s))(scene)
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g)
    )
