"""End-to-end differentiable render pipeline.

The reference's seven host-synchronized GPU passes + blit
(reference: src/renderer.ts:349-593 -- uniforms, process_gaussians, scan,
write_tile_ids, radix sort, compute_ranges, compute_tiles, render.wgsl) are
here ONE pure jitted function with zero mid-frame host syncs:

    render(scene, camera, cfg) = project -> bin/sort -> gather -> blend

Gradient flow: ordering (sorted ids, ranges) is a stop-gradient permutation
(standard 3DGS practice); all values flow through the differentiable gather,
so d image / d {means, log_scales, quats, opacity_logits, sh} is exact for
the fixed ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import GaussianScene
from gsplat_tpu.ops.binning import bin_gaussians, gather_features
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.raster_jnp import rasterize_tiles_jnp


@struct.dataclass
class RenderOutput:
    image: jnp.ndarray               # (H, W, 3) float32, black background
    transmittance: jnp.ndarray       # (H, W) final T (for bg compositing)
    num_intersections: jnp.ndarray   # () int32
    overflow: jnp.ndarray            # () bool -- static capacity exceeded
    # (N,) int32 post-cull candidates per Gaussian (stop-gradient;
    # None on binning='scatter'). The staged-capacity schedule reads tier
    # membership off it to re-size pool budgets mid-training.
    gauss_counts: jnp.ndarray | None = None


def render(
    scene: GaussianScene,
    camera: Camera,
    cfg: RenderConfig,
    background: jnp.ndarray | None = None,
    uv_tap: jnp.ndarray | None = None,
) -> RenderOutput:
    proj = project_gaussians(scene, camera, cfg, uv_tap=uv_tap)
    binned = bin_gaussians(proj, cfg)

    if cfg.stream_format in ("packed16", "packed4"):
        # Quantized forward stream: quantize -> gather -> rasterize is one
        # fused custom_vjp (ops/stream16.py) with straight-through f32
        # gradients.
        from gsplat_tpu.ops.binning import features_f32
        from gsplat_tpu.ops.stream16 import rasterize_packed16

        image, trans = rasterize_packed16(
            features_f32(proj, cfg), binned.sorted_gid, binned.sorted_gidk,
            binned.gauss_offsets, binned.gauss_counts, binned.ranges, 0,
            cfg, cfg,
        )
    elif cfg.impl == "pallas":
        from gsplat_tpu.ops.pallas.raster import rasterize_pallas

        features = gather_features(proj, binned, cfg)
        image, trans = rasterize_pallas(features, binned.ranges, cfg)
    else:
        features = gather_features(proj, binned, cfg)
        image, trans = rasterize_tiles_jnp(features, binned.ranges, cfg)

    if background is not None:
        image = image + trans[..., None] * background

    return RenderOutput(
        image=image,
        transmittance=trans,
        num_intersections=binned.num_intersections,
        overflow=binned.overflow,
        gauss_counts=binned.gauss_counts,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_jit(scene, camera, cfg: RenderConfig) -> RenderOutput:
    return render(scene, camera, cfg)


def render_loss(
    scene: GaussianScene,
    camera: Camera,
    target: jnp.ndarray,
    cfg: RenderConfig,
    background: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """L1 loss against a target image (training losses incl. SSIM live in
    gsplat_tpu.train.losses; this is the minimal hook used by gradcheck)."""
    out = render(scene, camera, cfg, background)
    return jnp.mean(jnp.abs(out.image - target))


def render_loss_with_aux(
    scene: GaussianScene,
    camera: Camera,
    target: jnp.ndarray,
    cfg: RenderConfig,
    background: jnp.ndarray | None = None,
):
    """render_loss plus the capacity diagnostics every training step must
    consume: when the intersection stream or a tier pool saturates, the
    rendered image (and therefore every gradient) is silently truncated --
    the static-shape analogue of the reference's dynamic per-frame realloc
    (reference: src/renderer.ts:419-441) failing. Returns
    (loss, {"overflow": bool, "num_intersections": int32})."""
    out = render(scene, camera, cfg, background)
    loss = jnp.mean(jnp.abs(out.image - target))
    return loss, {
        "overflow": out.overflow,
        "num_intersections": out.num_intersections,
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_loss_and_grad(scene, camera, target, cfg: RenderConfig):
    return jax.value_and_grad(render_loss)(scene, camera, target, cfg)
