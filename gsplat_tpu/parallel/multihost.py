"""Multi-host initialization and helpers (BASELINE config 5 topology).

The reference is a single-browser-tab app with no distribution
(SURVEY.md section 2); scaling past one host here uses stock JAX
distributed runtime -- no custom transport: `jax.distributed.initialize`
brings up the coordination service, after which `jax.devices()` spans every
chip in the slice and the Mesh-based renderers in parallel/sharding.py and
parallel/gaussian_sharded.py work unchanged (collectives ride ICI within a
slice and DCN across hosts, inserted by XLA from the shard_map specs).

Typical v5e-16 (2 hosts x 8 chips) training launch, same script on every
host:

    from gsplat_tpu.parallel import multihost
    multihost.initialize()                      # env-driven (TPU pods)
    mesh = multihost.global_mesh({"data": 2, "tiles": 8})
    ...
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from gsplat_tpu.parallel.sharding import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime. On TPU pods all arguments are
    discovered from the environment; pass them explicitly elsewhere.
    Safe to call when already initialized (no-op)."""
    if jax.process_count() > 1 or getattr(
        jax.distributed, "is_initialized", lambda: False
    )():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Single-process run (tests, one host without a coordinator).
        pass


def global_mesh(axis_sizes: dict[str, int]) -> Mesh:
    """Mesh over ALL devices in the slice (every host sees the same mesh)."""
    return make_mesh(axis_sizes, devices=jax.devices())


def process_local_batch(global_batch: int) -> tuple[int, int]:
    """(local_batch, offset) for this host's slice of a data-parallel batch."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    local = global_batch // n
    return local, jax.process_index() * local


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs."""
    return jax.process_index() == 0
