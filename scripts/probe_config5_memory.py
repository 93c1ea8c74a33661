"""Config-5 memory budget: AOT-compile the Gaussian-sharded train step at
per-shard shapes for 6M splats / 4K render / 16 shards and report the
compiler's HBM/VMEM figures (VERDICT r4 task 6b) -- the closest a 1-chip
environment gets to proving config 5 fits.

Strategy A (preferred): abstract AOT against a 16-chip v5e topology
description (`jax.experimental.topologies`) -- compiles the REAL 16-device
program (all_to_all included) without hardware.
Strategy B (fallback when the backend refuses topology AOT): compile the
per-shard computation single-device at exactly the per-shard shapes
(N/16 Gaussians, full 4K image, d*cap fragment buffers) and add the
collective buffers analytically (they are plain arrays of known size).

    python -u scripts/probe_config5_memory.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gsplat")

from gsplat_tpu.config import RenderConfig
from gsplat_tpu.models.gaussians import random_scene

# Config-5 shape: bicycle-class capture, 6M splats, 4K, v5e-16.
N_TOTAL, D = 6_000_000, 16
N_SHARD = N_TOTAL // D
W, H = 3840, 2048  # 4K-class width; tile rows 64 = divisible by 16 shards
# Per-dest fragment capacity: measured-intersection scaling -- the 1080p/1M
# bench carries 3.9M live; 4K is 4x pixels and 6x splats but per-shard
# sources 1/16: cap per (src, dest) pair sized so d*cap ~ 2x the bench
# stream per shard.
PER_DEST_CAP = 550_000

cfg = RenderConfig(
    width=W, height=H, tile_size=32, max_intersections=8_800_000,
    max_tiles_per_gaussian=64, block_size=32, max_per_tile=8192,
    binning="packed", impl="pallas", pallas_block_size=128,
    stream_format="packed16", gather_backward="bf16", grad_readout="bf16",
    segment_sum="pallas",
)


def try_topology_aot():
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:4x4"
    )
    devs = np.array(topo.devices).reshape(D)
    mesh = jax.sharding.Mesh(devs, ("gauss",))

    from gsplat_tpu.parallel.gaussian_train import (
        make_gaussian_sharded_train_step,
    )
    from gsplat_tpu.parallel.train_step import (
        TrainState, init_train_state, make_optimizer,
    )
    from gsplat_tpu.ops.camera import Camera

    scene = jax.eval_shape(
        lambda: random_scene(jax.random.key(0), N_TOTAL, sh_degree=3)
    )
    optimizer = make_optimizer(lr=1e-2)
    # abstract state pytree
    state = jax.eval_shape(
        lambda s: init_train_state(s, optimizer), scene
    )
    cam = Camera.default(W, H)
    cams = jax.tree.map(lambda x: jnp.asarray(x)[None], cam)
    targets = jax.ShapeDtypeStruct(
        (1, cfg.padded_height, cfg.padded_width, 3), jnp.float32
    )
    step = make_gaussian_sharded_train_step(
        cfg, mesh, optimizer,
        random_scene(jax.random.key(0), 16, sh_degree=3),  # template only
        ssim_weight=0.0, per_dest_capacity=PER_DEST_CAP,
    )
    lowered = jax.jit(step).lower(state, cams, targets)
    compiled = lowered.compile()
    return compiled.memory_analysis()


def shard_proxy_aot():
    """Single-device compile at per-shard shapes; collective wire buffers
    added analytically."""
    from gsplat_tpu.parallel.train_step import (
        init_train_state, make_optimizer,
    )
    from gsplat_tpu.train.loop import make_train_step
    from gsplat_tpu.ops.camera import Camera

    scene = random_scene(jax.random.key(0), N_SHARD, sh_degree=3)
    optimizer = make_optimizer(lr=1e-2)
    step = make_train_step(cfg, optimizer, ssim_weight=0.0)
    state = init_train_state(scene, optimizer)
    cam = Camera.default(W, H)
    cams = jax.tree.map(lambda x: jnp.asarray(x)[None], cam)
    targets = jax.ShapeDtypeStruct(
        (1, cfg.padded_height, cfg.padded_width, 3), jnp.float32
    )
    # AOT: lower + compile WITHOUT executing (no 4K buffers materialize).
    lowered = jax.jit(
        lambda st, c, t: step(st, c, t)
    ).lower(state, cams, jnp.zeros(targets.shape, targets.dtype))
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    # Fragment-exchange buffers (parallel/gaussian_sharded.py): packed16
    # wire = (5+1) int32 rows fwd + 5 rows bwd, D dests x PER_DEST_CAP.
    a2a_bytes = (6 + 5) * D * PER_DEST_CAP * 4
    return mem, a2a_bytes


out = {"config": {"n_total": N_TOTAL, "shards": D, "n_shard": N_SHARD,
                  "resolution": f"{W}x{H}",
                  "per_dest_capacity": PER_DEST_CAP,
                  "max_intersections": cfg.max_intersections}}
try:
    mem = try_topology_aot()
    out["mode"] = "topology-aot-16dev"
    out["memory"] = {
        k: getattr(mem, k)
        for k in dir(mem) if "bytes" in k or "size" in k
        if isinstance(getattr(mem, k, None), int)
    }
except Exception as e:
    out["topology_aot_error"] = f"{type(e).__name__}: {e}"[:500]
    mem, a2a = shard_proxy_aot()
    out["mode"] = "per-shard-proxy-1dev"
    out["memory"] = {
        k: getattr(mem, k)
        for k in dir(mem)
        if isinstance(getattr(mem, k, None), int) and not k.startswith("_")
    }
    out["a2a_wire_bytes_analytic"] = a2a

print(json.dumps(out, indent=1))
