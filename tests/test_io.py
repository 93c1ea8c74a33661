import json

import jax
import numpy as np
import pytest

from gsplat_tpu import random_scene
from gsplat_tpu.io.cameras import load_cameras
from gsplat_tpu.io.ply import load_ply, save_ply
from gsplat_tpu.utils.image import read_png, write_png


def test_ply_roundtrip(tmp_path):
    scene = random_scene(jax.random.key(0), 64, sh_degree=3)
    path = tmp_path / "scene.ply"
    save_ply(scene, path)
    loaded = load_ply(path)
    for a, b in zip(jax.tree.leaves(scene), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert loaded.sh_degree == 3


@pytest.mark.parametrize("degree", [0, 1, 2])
def test_ply_roundtrip_degrees(tmp_path, degree):
    scene = random_scene(jax.random.key(1), 8, sh_degree=degree)
    path = tmp_path / "scene.ply"
    save_ply(scene, path)
    loaded = load_ply(path)
    assert loaded.sh_degree == degree
    np.testing.assert_allclose(
        np.asarray(loaded.sh), np.asarray(scene.sh), rtol=1e-6
    )


def test_ply_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"not a ply at all" * 10)
    with pytest.raises(ValueError):
        load_ply(p)


def test_ply_rejects_ascii(tmp_path):
    p = tmp_path / "ascii.ply"
    p.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 0\nend_header\n")
    with pytest.raises(ValueError, match="binary_little_endian"):
        load_ply(p)


def test_cameras_json():
    # graphdeco-format entry (reference: src/camera.ts:4-13).
    rot = np.eye(3).tolist()
    data = json.dumps(
        [
            {
                "id": 0,
                "img_name": "00001",
                "width": 400,
                "height": 300,
                "position": [1.0, 2.0, 3.0],
                "rotation": rot,
                "fx": 350.0,
                "fy": 340.0,
            }
        ]
    )
    cams = load_cameras(data)
    assert len(cams) == 1
    name, cam = cams[0]
    assert name == "00001"
    np.testing.assert_allclose(np.asarray(cam.cam_pos), [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.focal), [350, 340])
    # view @ x = R (x - t): a point at t maps to origin.
    v = np.asarray(cam.view) @ np.array([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(v[:3], 0.0, atol=1e-5)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((17, 23, 3)).astype(np.float32)
    path = str(tmp_path / "x.png")
    write_png(path, img)
    back = read_png(path)
    assert back.shape == (17, 23, 3)
    np.testing.assert_allclose(back, img, atol=1.0 / 255.0 + 1e-6)
