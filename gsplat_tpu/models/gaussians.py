"""Scene container: a struct-of-arrays pytree of Gaussian parameters.

The reference packs Gaussians into an interleaved 320-byte/record byte buffer
with a runtime WGSL-ABI layout engine (reference: src/ply.ts:190-198,
src/packing.ts). On TPU, XLA owns memory layout, so the scene is a plain
struct-of-arrays pytree -- each field is one dense (N, ...) array, which is
exactly what vectorized projection, sharding (`NamedSharding` over the N
axis), and optimizers want.

Parameterization matches the 3DGS convention the reference renders
(src/process_gaussians.wgsl:127-162, 282-294):
  scales stored as log(scale), opacity stored as a logit, rotation as a
  (w, x, y, z) quaternion (normalized at use), color as SH coefficients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def num_sh_coeffs(degree: int) -> int:
    """(degree+1)**2; reference: src/ply.ts:125-138."""
    if degree not in (0, 1, 2, 3):
        raise ValueError(f"Unsupported SH degree: {degree}")
    return (degree + 1) ** 2


@struct.dataclass
class GaussianScene:
    means: jnp.ndarray           # (N, 3) world-space positions
    log_scales: jnp.ndarray      # (N, 3)
    quats: jnp.ndarray           # (N, 4) (w, x, y, z), unnormalized
    opacity_logits: jnp.ndarray  # (N,)
    sh: jnp.ndarray              # (N, K, 3), K = (sh_degree+1)**2

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round(np.sqrt(self.sh.shape[1]))) - 1

    def astype(self, dtype) -> "GaussianScene":
        return jax.tree.map(lambda x: x.astype(dtype), self)

    def pad_to(self, capacity: int) -> "GaussianScene":
        """Pad to a static capacity with fully transparent Gaussians placed
        behind the far plane is unnecessary: padding uses opacity logit -30
        (sigmoid ~ 0) and zero scale, so padded entries never contribute.
        Static capacity is the TPU-native substrate for densify/prune."""
        n = self.num_gaussians
        if capacity < n:
            raise ValueError("capacity < current size")
        pad = capacity - n

        def _pad(x, fill):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
            )

        return GaussianScene(
            means=_pad(self.means, 0.0),
            log_scales=_pad(self.log_scales, -10.0),
            quats=_pad(self.quats, 0.0).at[n:, 0].set(1.0),
            opacity_logits=_pad(self.opacity_logits, -30.0),
            sh=_pad(self.sh, 0.0),
        )


def random_scene(
    key: jax.Array,
    num: int,
    sh_degree: int = 3,
    extent: float = 1.0,
    depth_range: tuple = (2.0, 6.0),
    scale_range: tuple = (-4.5, -2.5),
) -> GaussianScene:
    """Synthetic scene in front of the origin-looking-+z camera; deterministic
    given the key. Used for tests and benchmarks (the reference has no
    synthetic scene generator; its only scenes are user PLY files)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    xy = jax.random.uniform(k1, (num, 2), minval=-extent, maxval=extent)
    z = jax.random.uniform(k2, (num, 1), minval=depth_range[0], maxval=depth_range[1])
    means = jnp.concatenate([xy * z / depth_range[0], z], axis=-1)
    log_scales = jax.random.uniform(
        k3, (num, 3), minval=scale_range[0], maxval=scale_range[1]
    )
    quats = jax.random.normal(k4, (num, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    k5a, k5b = jax.random.split(k5)
    opacity_logits = jax.random.uniform(k5a, (num,), minval=-1.0, maxval=3.0)
    K = num_sh_coeffs(sh_degree)
    sh = jnp.concatenate(
        [
            jax.random.uniform(k5b, (num, 1, 3), minval=0.0, maxval=2.0),
            0.1 * jax.random.normal(jax.random.fold_in(k5b, 1), (num, K - 1, 3)),
        ],
        axis=1,
    ) if K > 1 else jax.random.uniform(k5b, (num, 1, 3), minval=0.0, maxval=2.0)
    return GaussianScene(
        means=means.astype(jnp.float32),
        log_scales=log_scales.astype(jnp.float32),
        quats=quats.astype(jnp.float32),
        opacity_logits=opacity_logits.astype(jnp.float32),
        sh=sh.astype(jnp.float32),
    )


def realistic_scene(
    key: jax.Array,
    num: int,
    sh_degree: int = 3,
    extent: float = 1.0,
    depth_range: tuple = (2.0, 20.0),
    log_scale_mu: float = -4.2,
    log_scale_sigma: float = 1.0,
    aniso_sigma: float = 0.6,
    fat_fraction: float = 0.02,
    fat_log_scale_mu: float = -1.6,
) -> GaussianScene:
    """Heavy-tailed synthetic scene matching the statistics of real
    graphdeco captures (garden/bicycle-style), which `random_scene`'s
    uniform small-splat distribution does not: trained 3DGS scenes have

      - LOG-NORMAL scale distribution with a fat tail of large background/
        sky splats (here: log-scale ~ N(mu, sigma) per splat plus per-axis
        anisotropy noise, and a `fat_fraction` mixture component of huge
        splats at `fat_log_scale_mu`) -- these dominate the intersection
        stream and stress the tiered-binning pool budgets and K_max;
      - BIMODAL opacity (the densify/prune cycle pushes splats toward
        transparent-or-opaque): 35% at logit U(-4, -1), 65% at U(0.5, 6) --
        exercising the opacity-aware AABB tightening and exact tile cull;
      - LOG-UNIFORM depth (dense foreground, long thin background tail).

    The reference's PLY loader exists solely to view such scenes
    (reference: src/ply.ts:140-198); this generator reproduces their load
    profile without shipping a half-GB capture in the repo."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    # Log-uniform depth: p(z) ~ 1/z over [near, far].
    u = jax.random.uniform(k1, (num, 1))
    z = depth_range[0] * jnp.exp(
        u * jnp.log(depth_range[1] / depth_range[0])
    )
    xy = jax.random.uniform(k2, (num, 2), minval=-extent, maxval=extent)
    means = jnp.concatenate([xy * z / depth_range[0], z], axis=-1)

    base = log_scale_mu + log_scale_sigma * jax.random.normal(k3, (num, 1))
    fat = jax.random.uniform(k4, (num, 1)) < fat_fraction
    base = jnp.where(
        fat,
        fat_log_scale_mu + 0.5 * jax.random.normal(jax.random.fold_in(k4, 1),
                                                   (num, 1)),
        base,
    )
    log_scales = base + aniso_sigma * jax.random.normal(k5, (num, 3))

    quats = jax.random.normal(k6, (num, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)

    k7a, k7b, k7c = jax.random.split(k7, 3)
    low = jax.random.uniform(k7a, (num,), minval=-4.0, maxval=-1.0)
    high = jax.random.uniform(k7b, (num,), minval=0.5, maxval=6.0)
    opacity_logits = jnp.where(
        jax.random.uniform(jax.random.fold_in(k7a, 1), (num,)) < 0.35,
        low,
        high,
    )

    K = num_sh_coeffs(sh_degree)
    dc = jax.random.uniform(k7c, (num, 1, 3), minval=0.0, maxval=2.0)
    if K > 1:
        sh = jnp.concatenate(
            [dc, 0.1 * jax.random.normal(jax.random.fold_in(k7c, 1),
                                         (num, K - 1, 3))],
            axis=1,
        )
    else:
        sh = dc
    return GaussianScene(
        means=means.astype(jnp.float32),
        log_scales=log_scales.astype(jnp.float32),
        quats=quats.astype(jnp.float32),
        opacity_logits=opacity_logits.astype(jnp.float32),
        sh=sh.astype(jnp.float32),
    )
