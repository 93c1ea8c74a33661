"""CLI smoke tests (SURVEY.md C1 -- the reference's app shell, app.ts:6-64,
becomes `python -m gsplat_tpu.cli` with render/info/bench/train subcommands).
Everything runs in-process on the CPU backend with tiny shapes."""

import json
import os

import numpy as np
import pytest

from gsplat_tpu.cli import main


def _common(size=64):
    return [
        "--width", str(size), "--height", str(size), "--tile-size", "8",
        "--max-intersections", str(1 << 13), "--block-size", "8",
        "--max-per-tile", "256", "--impl", "jnp", "--binning", "packed",
    ]


def test_cli_info(capsys):
    rc = main(["info", "synthetic", "--synthetic-n", "200"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["num_gaussians"] == 200
    assert 0 <= stats["sh_degree"] <= 3


def test_cli_render_synthetic(tmp_path, capsys):
    out = str(tmp_path / "r_{}.png")
    rc = main(["render", "synthetic", "--synthetic-n", "300",
               "--output", out] + _common())
    assert rc == 0
    path = str(tmp_path / "r_default.png")
    assert os.path.exists(path)
    from gsplat_tpu.utils.image import read_png

    img = read_png(path)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0  # something rendered


def test_cli_render_ply_roundtrip(tmp_path):
    import jax

    from gsplat_tpu import random_scene
    from gsplat_tpu.io.ply import save_ply

    ply = str(tmp_path / "scene.ply")
    save_ply(random_scene(jax.random.key(3), 150, sh_degree=1), ply)
    out = str(tmp_path / "p_{}.png")
    rc = main(["render", ply, "--output", out] + _common())
    assert rc == 0
    assert os.path.exists(str(tmp_path / "p_default.png"))


def test_cli_bench_smoke(capsys):
    rc = main(["bench", "--synthetic-n", "300", "--mode", "fwd",
               "--iters", "2"] + _common())
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    result = json.loads(lines[-1])
    assert result["unit"] in ("it/s", "fps") or "value" in result


def test_cli_train_smoke(tmp_path, capsys):
    out = str(tmp_path / "trained.ply")
    rc = main(["train", "--synthetic-n", "200", "--steps", "3",
               "--views", "2", "--out", out] + _common())
    assert rc == 0
    assert os.path.exists(out)
    from gsplat_tpu.io.ply import load_ply

    scene = load_ply(out)
    assert scene.num_gaussians >= 200
    assert np.all(np.isfinite(np.asarray(scene.means)))


def test_cli_bad_subcommand():
    with pytest.raises(SystemExit):
        main(["frobnicate"])
