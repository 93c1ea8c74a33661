"""gsplat_tpu: a TPU-native differentiable 3D Gaussian Splatting framework.

From-scratch rebuild (JAX / XLA / Pallas / pjit) of the capabilities of
ldyken53/gaussian-splatting-wgpu -- forward tile-based rasterization -- plus
everything the TPU/training setting demands that the reference lacks:
hand-derived backward passes, multi-chip sharding, a training loop,
checkpointing, and a bench/CLI harness. See SURVEY.md for the component map.
"""

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import GaussianScene, random_scene
from gsplat_tpu.ops.camera import Camera
from gsplat_tpu.render.pipeline import RenderOutput, render, render_jit

__all__ = [
    "Camera",
    "GaussianScene",
    "RenderConfig",
    "RenderOutput",
    "random_scene",
    "render",
    "render_jit",
]

__version__ = "0.1.0"
