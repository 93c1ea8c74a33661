"""Camera model.

Matches the matrix conventions of the reference viewer so that renders of the
same PLY + camera agree (reference: src/camera.ts:16-39 projection,
src/camera.ts:145-155 camera position / full projection, src/camera.ts:310-312
focal<->fov). The reference stores matrices column-major (wgpu-matrix / WGSL);
here everything is a row-major math matrix applied as ``M @ [x, 1]``.

The reference's perspective matrix (camera.ts:16-38) is, in row-major math
form (symmetric frustum; its off-center terms land transposed in the original
but are zero for symmetric frustums):

    [[1/tan_fovx_half, 0,              0,          0        ],
     [0,               1/tan_fovy_half, 0,          0        ],
     [0,               0,              f/(f-n),    -f*n/(f-n)],
     [0,               0,              1,           0        ]]

i.e. +z forward, NDC depth in [0, 1], ``w' = z_view``.

TPU-native notes: ``Camera`` is a pytree of small arrays so a batch of cameras
can be vmapped / sharded over a device mesh ('data' axis) for multi-view
training; all scalars that determine shapes stay in RenderConfig.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


def focal2fov(focal: float, pixels: float) -> float:
    """reference: src/camera.ts:310-312."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def perspective_matrix(znear: float, zfar: float, fov_x: float, fov_y: float) -> np.ndarray:
    """Row-major perspective matrix matching reference src/camera.ts:16-38."""
    tan_x = math.tan(fov_x / 2.0)
    tan_y = math.tan(fov_y / 2.0)
    p = np.zeros((4, 4), dtype=np.float32)
    p[0, 0] = 1.0 / tan_x
    p[1, 1] = 1.0 / tan_y
    p[2, 2] = zfar / (zfar - znear)
    p[2, 3] = -(zfar * znear) / (zfar - znear)
    p[3, 2] = 1.0
    return p


@struct.dataclass
class Camera:
    """A single camera. All fields are jnp arrays (pytree leaves) so cameras
    can be traced, vmapped and sharded; image dimensions are static and live
    in RenderConfig."""

    view: jnp.ndarray        # (4, 4) world -> camera
    proj: jnp.ndarray        # (4, 4) perspective (camera -> clip)
    full_proj: jnp.ndarray   # (4, 4) = proj @ view
    cam_pos: jnp.ndarray     # (3,) camera center in world space
    focal: jnp.ndarray       # (2,) [fx, fy] in pixels
    tan_fov: jnp.ndarray     # (2,) [tan(fovx/2), tan(fovy/2)]
    znear: jnp.ndarray       # () near plane (also the frustum cull depth,
    #                        #    reference: process_gaussians.wgsl:120)

    @classmethod
    def create(
        cls,
        view: np.ndarray,
        width: int,
        height: int,
        fx: float,
        fy: float,
        znear: float = 0.2,
        zfar: float = 100.0,
    ) -> "Camera":
        view = np.asarray(view, dtype=np.float32)
        fov_x = focal2fov(fx, width)
        fov_y = focal2fov(fy, height)
        proj = perspective_matrix(znear, zfar, fov_x, fov_y)
        # Camera world position = translation of the inverse view matrix
        # (reference: src/camera.ts:145-148).
        cam_pos = np.linalg.inv(view)[:3, 3]
        return cls(
            view=jnp.asarray(view),
            proj=jnp.asarray(proj),
            full_proj=jnp.asarray(proj @ view),
            cam_pos=jnp.asarray(cam_pos.astype(np.float32)),
            focal=jnp.asarray(np.array([fx, fy], dtype=np.float32)),
            tan_fov=jnp.asarray(
                np.array([math.tan(fov_x / 2), math.tan(fov_y / 2)], dtype=np.float32)
            ),
            znear=jnp.asarray(np.float32(znear)),
        )

    @classmethod
    def from_rt(
        cls,
        rotation: np.ndarray,   # (3, 3) world->camera rotation
        position: np.ndarray,   # (3,) camera center in world space
        width: int,
        height: int,
        fx: float,
        fy: float,
        znear: float = 0.2,
        zfar: float = 100.0,
    ) -> "Camera":
        """Build from the graphdeco ``cameras.json`` (R, t) convention:
        ``view @ x = R @ (x - t)`` (reference: src/camera.ts:314-320).

        Unlike the reference, which ignores the per-camera fx/fy/width/height
        in favor of hardcoded 800x800 constants (src/camera.ts:323-337 -- a
        documented quirk), we honor them.
        """
        rotation = np.asarray(rotation, dtype=np.float32)
        position = np.asarray(position, dtype=np.float32)
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = rotation
        view[:3, 3] = -rotation @ position
        return cls.create(view, width, height, fx, fy, znear, zfar)

    @classmethod
    def default(cls, width: int = 800, height: int = 800) -> "Camera":
        """The reference's hardcoded default pose (src/camera.ts:79-122):
        focal = (W, H) px, znear 0.2, zfar 10, fixed view matrix (stored
        column-major there; transposed here into row-major math form)."""
        view_colmajor = np.array(
            [
                [0.582345724105835, -0.3235852122306824, 0.7372694611549377, 0.0],
                [0.23868794739246368, 0.9381394982337952, 0.22253619134426117, 0.0],
                [-0.7680802941322327, 0.04477229341864586, 0.6242981553077698, 0.0],
                [0.13517332077026367, -1.1848870515823364, 3.3873789310455322, 1.0],
            ],
            dtype=np.float32,
        )
        view = view_colmajor.T
        return cls.create(view, width, height, fx=float(width), fy=float(height),
                          znear=0.2, zfar=10.0)


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """World->camera view matrix with +z forward (matching the reference's
    frustum convention: visible points have positive view-space z)."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    rot = np.stack([right, true_up, fwd], axis=0)  # rows: x right, y up, z fwd
    view = np.eye(4, dtype=np.float64)
    view[:3, :3] = rot
    view[:3, 3] = -rot @ eye
    return view.astype(np.float32)


def orbit_cameras(
    center,
    radius: float,
    num: int,
    width: int,
    height: int,
    fx: float,
    fy: float,
    elevation: float = 0.3,
    znear: float = 0.2,
    zfar: float = 100.0,
):
    """Generate an orbit of cameras around a scene (headless stand-in for the
    reference's InteractiveCamera, src/camera.ts:192-308)."""
    center = np.asarray(center, dtype=np.float64)
    cams = []
    for i in range(num):
        theta = 2.0 * math.pi * i / num
        eye = center + radius * np.array(
            [math.cos(theta), elevation, math.sin(theta)]
        )
        cams.append(
            Camera.create(look_at(eye, center), width, height, fx, fy, znear, zfar)
        )
    return cams
