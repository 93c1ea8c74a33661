"""Test env: force CPU with 8 virtual devices so sharding paths run in CI
without TPU hardware (SURVEY.md section 4, item 4).

Note: this image's sitecustomize imports jax before conftest runs (so
JAX_PLATFORMS from the environment is already consumed); jax.config.update
still wins because backends initialize lazily, and XLA_FLAGS is read at
backend init, which also hasn't happened yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gsplat_tpu import Camera, RenderConfig, random_scene  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg():
    return RenderConfig(
        width=64,
        height=64,
        tile_size=8,
        max_intersections=1 << 14,
        max_tiles_per_gaussian=64,
        block_size=8,
        max_per_tile=256,
    )


@pytest.fixture(scope="session")
def small_scene():
    return random_scene(jax.random.key(0), 200, sh_degree=2)


@pytest.fixture(scope="session")
def small_camera(small_cfg):
    return Camera.default(small_cfg.width, small_cfg.height)
