"""Per-Gaussian projection: frustum cull, EWA 2D covariance, conic, screen
rect, SH color, opacity.

Semantics match the reference preprocess shader
(reference: src/process_gaussians.wgsl):
  - frustum cull: view z <= znear or |ndc| >= 1.1           (:108-125)
  - 3D covariance Sigma = R S^2 R^T from exp(log_scale)*modifier and the
    normalized (w,x,y,z) quaternion                          (:127-162)
  - EWA 2D covariance: clamp tx/tz, ty/tz to 1.3*tan_fov, Jacobian J,
    cov2d = (J W) Sigma (J W)^T, +0.3 low-pass on the diagonal (:165-218)
  - conic = inverse of cov2d                                 (:58-69)
  - radius = ceil(3 * sqrt(max eigenvalue)), sqrt arg clamped >= 0.1 (:74-77)
  - tile rect via floor((pix +- radius)/tile)                (:297-319); unlike
    the reference we clamp rect_max to the tile grid (its `+1` can index one
    past the grid -- the "last tile full of intersections" TODO at :296)
  - SH color (+0.5, clamp >= 0)                              (:220-280)
  - opacity = sigmoid(logit)                                 (:282-294)

Everything is a single vectorized jnp function over (N, ...) arrays: one fused
XLA kernel on the VPU, differentiable by construction (where-guards keep
culled lanes NaN-free so gradients are exactly zero through the mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.ops.sh import eval_sh


@struct.dataclass
class ProjectedGaussians:
    mask: jnp.ndarray      # (N,) bool, survives frustum cull & valid cov
    uv: jnp.ndarray        # (N, 2) in [0, 1]^2 (ndc*0.5 + 0.5)
    conic: jnp.ndarray     # (N, 3) (A, B, C) of the inverse 2D covariance
    depth: jnp.ndarray     # (N,) view-space z (sort key)
    color: jnp.ndarray     # (N, 3) RGB from SH
    opacity: jnp.ndarray   # (N,)
    radius: jnp.ndarray    # (N,) screen-space radius in pixels
    rect: jnp.ndarray      # (N, 4) int32 (tx0, ty0, tx1, ty1), tile coords,
    #                      #   half-open [tx0, tx1) x [ty0, ty1)
    counts: jnp.ndarray    # (N,) int32 tiles touched (clipped to K_max)
    overflow: jnp.ndarray  # () bool: some Gaussian's rect exceeded K_max


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) (w,x,y,z) unnormalized -> (N, 3, 3). Matches the reference's
    matrix up to its column-major storage (the product R S^2 R^T is
    identical); reference: src/process_gaussians.wgsl:137-149."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def compute_cov3d(log_scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T, s = exp(log_scale) * modifier. Equivalent to
    the reference's Sigma = M^T M with M = S R^T
    (reference: src/process_gaussians.wgsl:127-162). Returns (N, 3, 3)."""
    s = jnp.exp(log_scales) * scale_modifier
    rot = quat_to_rotmat(quats)
    m = rot * s[..., None, :]          # R @ diag(s)
    return m @ jnp.swapaxes(m, -1, -2)  # R S^2 R^T


def project_gaussians(
    scene, camera: Camera, cfg: RenderConfig, uv_tap=None
) -> ProjectedGaussians:
    """uv_tap: optional (N, 2) zeros added to the screen-space uv -- a
    gradient tap. d loss / d uv_tap is the exact screen-space positional
    gradient (the densification trigger of Kerbl et al. section 5.2, which
    the CUDA original reads off means2D.grad). Zero-valued, so the rendered
    image is unchanged."""
    n = scene.means.shape[0]
    pos = scene.means  # (N, 3)

    # View / clip transforms.
    p_view = pos @ camera.view[:3, :3].T + camera.view[:3, 3]           # (N, 3)
    p_hom = pos @ camera.full_proj[:3, :3].T + camera.full_proj[:3, 3]  # (N, 3)
    w_hom = pos @ camera.full_proj[3, :3] + camera.full_proj[3, 3]      # (N,)
    inv_w = 1.0 / (w_hom + 1e-7)  # reference: process_gaussians.wgsl:52
    ndc = p_hom[:, :2] * inv_w[:, None]

    tz = p_view[:, 2]
    lim = cfg.frustum_ndc_limit
    in_frustum = (
        (tz > camera.znear)
        & (jnp.abs(ndc[:, 0]) < lim)
        & (jnp.abs(ndc[:, 1]) < lim)
    )
    uv = ndc * 0.5 + 0.5
    if uv_tap is not None:
        uv = uv + uv_tap  # zeros; every downstream use contributes to d/d_tap

    # EWA 2D covariance, fully unrolled into (N,)-vector arithmetic: the
    # naive formulation is a batch of 2x3 / 3x3 dot_generals whose tiny
    # contraction dims waste the MXU; unrolling keeps everything as fused
    # elementwise VPU work.
    tz_safe = jnp.where(in_frustum, tz, 1.0)
    lim_xy = 1.3 * camera.tan_fov  # (2,); reference: process_gaussians.wgsl:180-186
    txy = jnp.clip(p_view[:, :2] / tz_safe[:, None], -lim_xy, lim_xy) * tz_safe[:, None]
    fx, fy = camera.focal[0], camera.focal[1]
    inv_tz = 1.0 / tz_safe
    inv_tz2 = inv_tz * inv_tz
    # J rows: [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2].
    ja = fx * inv_tz
    jb = -fx * txy[:, 0] * inv_tz2
    jc = fy * inv_tz
    jd = -fy * txy[:, 1] * inv_tz2
    w = camera.view[:3, :3]
    # T2 = J @ W: row 0 = ja * W[0] + jb * W[2]; row 1 = jc * W[1] + jd * W[2].
    t0 = [ja * w[0, k] + jb * w[2, k] for k in range(3)]  # 3 x (N,)
    t1 = [jc * w[1, k] + jd * w[2, k] for k in range(3)]

    # Sigma = R diag(s^2) R^T, entries sig[i][j] = sum_k s2_k R[:,i,k] R[:,j,k].
    rot = quat_to_rotmat(scene.quats)  # (N, 3, 3); fused away by XLA
    s2 = jnp.square(jnp.exp(scene.log_scales) * cfg.scale_modifier)  # (N, 3)
    sig = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            acc = s2[:, 0] * rot[:, i, 0] * rot[:, j, 0]
            acc += s2[:, 1] * rot[:, i, 1] * rot[:, j, 1]
            acc += s2[:, 2] * rot[:, i, 2] * rot[:, j, 2]
            sig[i][j] = sig[j][i] = acc

    def quad(u, v):
        # u @ Sigma @ v for 3-vectors of (N,) components.
        return sum(u[i] * sum(sig[i][j] * v[j] for j in range(3)) for i in range(3))

    c00 = quad(t0, t0) + cfg.lowpass
    c01 = quad(t0, t1)
    c11 = quad(t1, t1) + cfg.lowpass

    det = c00 * c11 - c01 * c01
    valid = in_frustum & (det > 0.0)
    det_safe = jnp.where(valid, det, 1.0)

    mid = 0.5 * (c00 + c11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(cfg.eigen_clamp, mid * mid - det_safe))
    if cfg.max_screen_radius:
        # Screen-footprint clamp (see RenderConfig.max_screen_radius):
        # isotropic covariance shrink by f <= 1 so the 3-sigma radius lands
        # at the bound. f is a stop-gradient (the clamp is a projection-
        # time guard, not a differentiable model component), det scales by
        # f^2 and lambda1 by f, so conic/radius/rect below all see the
        # bounded footprint consistently.
        r_raw = cfg.radius_sigma * jnp.sqrt(lambda1)
        f = jax.lax.stop_gradient(
            jnp.minimum(1.0, cfg.max_screen_radius / jnp.maximum(r_raw, 1e-6))
            ** 2
        )
        c00 = c00 * f
        c01 = c01 * f
        c11 = c11 * f
        det_safe = det_safe * f * f
        lambda1 = lambda1 * f

    inv_det = 1.0 / det_safe
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], -1)
    radius = jnp.ceil(cfg.radius_sigma * jnp.sqrt(lambda1))

    opacity = jax_sigmoid(scene.opacity_logits)

    # Tile rect (clamped to the grid; see module docstring). Per-axis
    # half-extents: the reference uses the circumscribed circle of the 3-sigma
    # ellipse (radius above) on both axes; we additionally intersect with the
    # AABB of the *reachable-alpha* ellipse {q <= tau},
    # tau = 2 ln(opacity/alpha_min) -- its x half-extent is sqrt(tau*cov_xx).
    # Every pixel whose alpha can reach alpha_min satisfies q <= tau AND lies
    # inside the circle rect the reference walks, so the intersection rect
    # covers exactly the same contributing tiles (the blend's alpha_min skip
    # zeroes everything else either way): image-invariant, but anisotropic
    # and semi-transparent splats get far smaller rects (36% fewer candidate
    # lanes, max area 81 -> 48 at 1080p/1M random-scene).
    tau = 2.0 * jnp.log(jnp.maximum(opacity / cfg.alpha_min, 1e-12))
    rtau = jnp.sqrt(jnp.maximum(tau, 0.0))
    ext_x = jnp.minimum(radius, jnp.ceil(rtau * jnp.sqrt(jnp.maximum(c00, 0.0))))
    ext_y = jnp.minimum(radius, jnp.ceil(rtau * jnp.sqrt(jnp.maximum(c11, 0.0))))
    ext = jnp.stack([ext_x, ext_y], -1)
    ext = jnp.where((opacity > cfg.alpha_min)[:, None], ext, -1.0)  # empty rect
    ext = jax.lax.stop_gradient(ext)  # rect is ordering-only (ints downstream)
    pix = uv * jnp.array([cfg.width, cfg.height], jnp.float32)
    ts = float(cfg.tile_size)
    ntx, nty = cfg.tiles_x, cfg.tiles_y
    lo = jnp.floor((pix - ext) / ts)
    hi = jnp.floor((pix + ext) / ts) + 1.0
    tx0 = jnp.clip(lo[:, 0], 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(lo[:, 1], 0, nty).astype(jnp.int32)
    tx1 = jnp.clip(hi[:, 0], 0, ntx).astype(jnp.int32)
    ty1 = jnp.clip(hi[:, 1], 0, nty).astype(jnp.int32)
    rect = jnp.stack([tx0, ty0, tx1, ty1], -1)
    area = jnp.maximum(tx1 - tx0, 0) * jnp.maximum(ty1 - ty0, 0)
    area = jnp.where(valid, area, 0)
    valid = valid & (area > 0)
    counts = jnp.minimum(area, cfg.max_tiles_per_gaussian)
    overflow = jnp.any(area > cfg.max_tiles_per_gaussian)

    # Color.
    dirs = pos - camera.cam_pos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    degree = min(cfg.sh_degree, int(round(scene.sh.shape[1] ** 0.5)) - 1)
    color = eval_sh(scene.sh, dirs, degree)

    return ProjectedGaussians(
        mask=valid,
        uv=uv,
        conic=conic,
        depth=tz,
        color=color,
        opacity=opacity,
        radius=radius,
        rect=rect,
        counts=counts,
        overflow=overflow,
    )


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid (reference: src/process_gaussians.wgsl:282-294)."""
    import jax

    return jax.nn.sigmoid(x)
