"""cameras.json (graphdeco format) loader.

Format per the reference parser (reference: src/camera.ts:4-13, 314-340):
list of {id, img_name, width, height, position (3,), rotation (3x3 nested),
fx, fy}. View matrix math matches the reference's worldToCamFromRT
(view @ x = R (x - t)); unlike the reference, which discards the per-camera
fx/fy/width/height in favor of hardcoded 800x800 (camera.ts:323-337 -- a
documented quirk), we honor them (with optional overrides).
"""

from __future__ import annotations

import json
import os

import numpy as np

from gsplat_tpu.ops.camera import Camera


def load_cameras(
    path_or_str,
    znear: float = 0.2,
    zfar: float = 100.0,
    width_override: int | None = None,
    height_override: int | None = None,
):
    """Returns list of (name, Camera)."""
    if isinstance(path_or_str, (str, os.PathLike)) and os.path.exists(path_or_str):
        with open(path_or_str) as f:
            raw = json.load(f)
    else:
        raw = json.loads(path_or_str)

    cams = []
    for entry in raw:
        width = width_override or int(entry["width"])
        height = height_override or int(entry["height"])
        fx = float(entry["fx"])
        fy = float(entry["fy"])
        if width_override:
            fx *= width_override / int(entry["width"])
        if height_override:
            fy *= height_override / int(entry["height"])
        cam = Camera.from_rt(
            np.asarray(entry["rotation"], np.float32),
            np.asarray(entry["position"], np.float32),
            width,
            height,
            fx,
            fy,
            znear=znear,
            zfar=zfar,
        )
        cams.append((entry.get("img_name", str(entry.get("id", len(cams)))), cam))
    return cams
