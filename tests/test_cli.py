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


def test_cli_train_full_surface(tmp_path, capsys):
    """Every 3DGS-5.2 training feature on at once, driven purely from the
    CLI (VERDICT round-2 weak item 4): densify + big-splat prune + opacity
    reset + SH warmup + position-lr decay + SSIM loss + batch>1 + held-out
    PSNR eval + metrics CSV + overflow_policy=raise surviving the run."""
    out = str(tmp_path / "trained.ply")
    csv_path = str(tmp_path / "metrics.csv")
    rc = main([
        "train", "--synthetic-n", "150", "--steps", "8", "--views", "3",
        "--out", out, "--batch", "2", "--ssim-weight", "0.2",
        "--densify-every", "4", "--capacity", "300",
        "--densify-until", "6", "--densify-max-scale", "1.0",
        "--opacity-reset-every", "6", "--overflow-policy", "raise",
        "--sh-warmup-every", "2", "--position-lr-final-ratio", "0.01",
        "--holdout-views", "2", "--eval-every", "4",
        "--metrics-csv", csv_path, "--sh-degree", "1",
    ] + _common(48))
    assert rc == 0
    assert os.path.exists(out)
    text = capsys.readouterr().out
    assert "held-out" in text
    with open(csv_path) as f:
        header = f.readline().strip().split(",")
        rows = [l.strip().split(",") for l in f]
    assert "holdout_psnr" in header and "train_psnr" in header
    col = header.index("holdout_psnr")
    vals = [r[col] for r in rows if len(r) > col and r[col]]
    assert vals, "no held-out PSNR was recorded in the CSV"
    assert all(np.isfinite(float(v)) for v in vals)


def test_sh_band_mask():
    from gsplat_tpu.train.loop import sh_band_mask

    m = np.asarray(sh_band_mask(16, 2))[:, 0]
    # bands: coeff 0 -> 0, 1-3 -> 1, 4-8 -> 2, 9-15 -> 3
    assert m.tolist() == [1.0] * 9 + [0.0] * 7
    assert np.asarray(sh_band_mask(16, 3)).min() == 1.0
    assert np.asarray(sh_band_mask(16, 0))[:, 0].tolist() == [1.0] + [0.0] * 15


def test_cli_bad_subcommand():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_bucket_rounding():
    from gsplat_tpu.cli import _bucket

    assert _bucket(1) == 1
    assert _bucket(9) == 10
    assert _bucket(123_456) == 150_000
    assert _bucket(600_001) == 800_000
    assert _bucket(1_000_000) == 1_000_000


def test_viewer_preset_cfg():
    import argparse

    from gsplat_tpu.cli import _build_cfg

    ns = argparse.Namespace(viewer_preset=True, max_intersections=1 << 22,
                            sh_degree=3)
    cfg = _build_cfg(ns, 800, 800)
    assert cfg.impl == "pallas" and cfg.binning == "tiered"
    assert cfg.max_intersections == 2_330_000
    assert cfg.max_tiles_jumbo == 1024  # capture-capable since round 5
    # explicit capacity override wins
    ns2 = argparse.Namespace(viewer_preset=True, max_intersections=123,
                             sh_degree=3)
    assert _build_cfg(ns2, 800, 800).max_intersections == 123
