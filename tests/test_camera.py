import math

import numpy as np

from gsplat_tpu.ops.camera import (
    Camera,
    focal2fov,
    fov2focal,
    look_at,
    perspective_matrix,
)


def test_perspective_matrix_matches_reference_convention():
    # reference: src/camera.ts:16-38 -- z in view space maps to
    # (f*z - f*n)/(f-n) / z in NDC, w' = z.
    n, f = 0.2, 10.0
    fov = focal2fov(800, 800)
    p = perspective_matrix(n, f, fov, fov)
    # A point on the near plane maps to ndc z = 0, far plane to 1.
    for z, expected in [(n, 0.0), (f, 1.0)]:
        v = p @ np.array([0, 0, z, 1.0])
        assert abs(v[3] - z) < 1e-6
        assert abs(v[2] / v[3] - expected) < 1e-6
    # tan(fov/2) scaling: x = z*tan(fov/2) maps to ndc x = 1.
    z = 5.0
    v = p @ np.array([z * math.tan(fov / 2), 0, z, 1.0])
    assert abs(v[0] / v[3] - 1.0) < 1e-6


def test_focal_fov_roundtrip():
    assert abs(fov2focal(focal2fov(1234.0, 800), 800) - 1234.0) < 1e-9


def test_default_camera_pose():
    cam = Camera.default()
    # Camera position = translation of inverse view (reference camera.ts:145-148).
    view = np.asarray(cam.view)
    pos = np.asarray(cam.cam_pos)
    restored = np.linalg.inv(view)[:3, 3]
    np.testing.assert_allclose(pos, restored, atol=1e-5)
    # Rotation part approximately orthonormal (the reference's hardcoded pose
    # is itself only float32-orthonormal).
    rot = view[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=2e-2)
    # full_proj = proj @ view
    np.testing.assert_allclose(
        np.asarray(cam.full_proj), np.asarray(cam.proj) @ view, atol=1e-5
    )


def test_look_at_points_forward():
    view = look_at([0, 0, -5], [0, 0, 0])
    # Target is straight ahead at depth 5 (+z forward).
    p = view @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, 5], atol=1e-6)


def test_from_rt_matches_reference_math():
    # view @ x = R (x - t)  (reference: src/camera.ts:314-320)
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    t = rng.normal(size=3)
    cam = Camera.from_rt(rot, t, 800, 800, 500.0, 500.0)
    pt = rng.normal(size=3)
    expected = rot @ (pt - t)
    got = np.asarray(cam.view) @ np.array([*pt, 1.0])
    np.testing.assert_allclose(got[:3], expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.cam_pos), t, atol=1e-5)
