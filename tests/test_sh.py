import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.sh import SH_C0, SH_C1, SH_C2, SH_C3, eval_sh


def eval_sh_numpy(sh, d, degree):
    """Scalar transcription of reference src/process_gaussians.wgsl:240-280."""
    result = SH_C0 * sh[0]
    if degree >= 1:
        x, y, z = d
        result = result + SH_C1 * (-y * sh[1] + z * sh[2] - x * sh[3])
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, xz, yz = x * y, x * z, y * z
        result = result + (
            SH_C2[0] * xy * sh[4]
            + SH_C2[1] * yz * sh[5]
            + SH_C2[2] * (2 * zz - xx - yy) * sh[6]
            + SH_C2[3] * xz * sh[7]
            + SH_C2[4] * (xx - yy) * sh[8]
        )
    if degree >= 3:
        result = result + (
            SH_C3[0] * y * (3 * xx - yy) * sh[9]
            + SH_C3[1] * xy * z * sh[10]
            + SH_C3[2] * y * (4 * zz - xx - yy) * sh[11]
            + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
            + SH_C3[4] * x * (4 * zz - xx - yy) * sh[13]
            + SH_C3[5] * z * (xx - yy) * sh[14]
            + SH_C3[6] * x * (xx - 3 * yy) * sh[15]
        )
    return np.maximum(result + 0.5, 0.0)


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_eval_sh_matches_scalar_oracle(degree):
    rng = np.random.default_rng(degree)
    n, k = 32, (degree + 1) ** 2
    sh = rng.normal(size=(n, k, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs.astype(np.float32)

    got = np.asarray(eval_sh(jnp.asarray(sh), jnp.asarray(dirs), degree))
    want = np.stack(
        [eval_sh_numpy(sh[i], dirs[i], degree) for i in range(n)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_eval_sh_degree0_is_dc_only():
    sh = jnp.ones((4, 1, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    got = eval_sh(sh, dirs, 0)
    np.testing.assert_allclose(np.asarray(got), SH_C0 * 1.0 + 0.5, rtol=1e-6)


def test_eval_sh_clamps_negative():
    sh = -10.0 * jnp.ones((1, 1, 3))
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    assert np.all(np.asarray(eval_sh(sh, dirs, 0)) == 0.0)


def test_eval_sh_grad_finite():
    sh = jnp.ones((2, 16, 3)) * 0.3
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.6, 0.8, 0.0]])
    g = jax.grad(lambda s: jnp.sum(eval_sh(s, dirs, 3)))(sh)
    assert np.all(np.isfinite(np.asarray(g)))
