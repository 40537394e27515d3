"""Fused triage triangulation/refresh kernel vs the XLA path (interpret)."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from msckf_tpu.ops.pallas_kernels import triage_refresh_fused
from msckf_tpu.ops.smallmat import matvec_small, transpose_small
from msckf_tpu.ops.triangulation import intersect_lines
from msckf_tpu.ops.geometry import idp_angles_m


def test_triage_refresh_matches_xla():
    rng = np.random.default_rng(0)
    F, M = 10, 6
    f32 = np.float32
    # consistent geometry: world points observed from camera centers
    wp = rng.normal(size=(F, 3)) * 2 + np.array([0, 0, 5.0])
    bases = rng.normal(size=(F, M, 3)).astype(f32)
    dirs = (wp[:, None, :] - bases).astype(f32)
    dirs += rng.normal(size=dirs.shape).astype(f32) * 0.01
    score = rng.uniform(0.5, 1.0, size=(F, M)).astype(f32)
    valid = rng.random((F, M)) > 0.2
    valid[:, 0] = True
    weights = np.where(valid, score, 0.0).astype(f32)

    R_a = Rotation.random(F, random_state=3).as_matrix().astype(f32)
    t_a = bases[:, 0, :]
    K = np.array([[180.0, 0, 320], [0, 180, 240], [0, 0, 1]], dtype=f32)
    Kinv = np.linalg.inv(K).astype(f32)

    m, rho, ok = triage_refresh_fused(
        jnp.asarray(bases), jnp.asarray(dirs), jnp.asarray(weights),
        jnp.asarray(R_a), jnp.asarray(t_a), jnp.asarray(K), jnp.asarray(Kinv),
        1e-6, 640, 480, interpret=True,
    )

    # XLA reference (same math as the filter's else-branch)
    W_p = jax.vmap(intersect_lines)(
        jnp.asarray(bases), jnp.asarray(dirs), jnp.asarray(score), jnp.asarray(valid)
    )
    Ci_p = matvec_small(transpose_small(jnp.asarray(R_a)), W_p - jnp.asarray(t_a))
    z_safe = jnp.where(jnp.abs(Ci_p[:, 2:3]) < 1e-30, 1e-30, Ci_p[:, 2:3])
    Im_p = (Ci_p @ jnp.asarray(K).T)[:, :2] / z_safe
    ok_ref = (
        (Ci_p[:, 2] > 0)
        & (Im_p[:, 0] >= 0) & (Im_p[:, 0] < 640)
        & (Im_p[:, 1] >= 0) & (Im_p[:, 1] < 480)
    )
    homog = jnp.concatenate([Im_p, jnp.ones((F, 1), jnp.float32)], axis=-1)
    W_v = matvec_small(jnp.asarray(R_a), homog @ jnp.asarray(Kinv).T)
    m_ref = idp_angles_m(W_v)
    rho_ref = 1.0 / Ci_p[:, 2]

    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    okm = np.asarray(ok_ref)
    np.testing.assert_allclose(np.asarray(m)[okm], np.asarray(m_ref)[okm], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(rho)[okm], np.asarray(rho_ref)[okm], rtol=2e-3
    )
