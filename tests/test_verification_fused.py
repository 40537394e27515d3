"""Fused verification-scores kernel (interpret mode) vs the XLA plane math."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from msckf_tpu.ops.pallas_kernels import verification_scores


def _xla_reference(R1, t1, kp1, kp2, camR, camt, K, Kinv):
    R12 = np.einsum("fmji,jk->fmik", R1, camR)
    t12 = np.einsum("fmji,fmj->fmi", R1, camt - t1)
    baseline = np.linalg.norm(t12, axis=-1)
    F, M = t1.shape[:2]
    x1 = np.concatenate([kp1, np.ones((F, M, 1))], axis=-1)
    x2 = np.concatenate([kp2, np.ones((F, 1))], axis=-1)
    H = np.einsum("ij,fmjk,kl->fmil", K, R12, Kinv)
    Hinv = np.einsum("ij,fmkj,kl->fmil", K, R12, Kinv)
    x1p = np.einsum("fmij,fj->fmi", Hinv, x2)
    x2p = np.einsum("fmij,fmj->fmi", H, x1)
    x1p = x1p[..., :2] / x1p[..., 2:3]
    x2p = x2p[..., :2] / x2p[..., 2:3]
    homo = 0.5 * (
        np.linalg.norm(kp2[:, None, :] - x1p, axis=-1)
        + np.linalg.norm(kp1 - x2p, axis=-1)
    )

    def skew(v):
        out = np.zeros(v.shape[:-1] + (3, 3))
        out[..., 0, 1] = -v[..., 2]
        out[..., 0, 2] = v[..., 1]
        out[..., 1, 0] = v[..., 2]
        out[..., 1, 2] = -v[..., 0]
        out[..., 2, 0] = -v[..., 1]
        out[..., 2, 1] = v[..., 0]
        return out

    Fm = np.einsum("ji,fmjk,fmkl,lo->fmio", Kinv, skew(t12), R12, Kinv)
    epi = np.einsum("fi,fmij,fmj->fm", x2, Fm, x1)
    return homo, epi, baseline


def test_verification_scores_matches_xla():
    rng = np.random.default_rng(0)
    F, M = 12, 8
    R1 = Rotation.random(F * M, random_state=1).as_matrix().reshape(F, M, 3, 3)
    t1 = rng.normal(size=(F, M, 3))
    kp1 = rng.uniform(0, 640, size=(F, M, 2))
    kp2 = rng.uniform(0, 640, size=(F, 2))
    camR = Rotation.random(1, random_state=2).as_matrix()[0]
    camt = rng.normal(size=3)
    K = np.array([[180.0, 0, 320], [0, 180, 240], [0, 0, 1]])
    Kinv = np.linalg.inv(K)

    want = _xla_reference(R1, t1, kp1, kp2, camR, camt, K, Kinv)
    f32 = np.float32
    got = verification_scores(
        jnp.asarray(R1, f32), jnp.asarray(t1, f32), jnp.asarray(kp1, f32),
        jnp.asarray(kp2, f32), jnp.asarray(camR, f32), jnp.asarray(camt, f32),
        jnp.asarray(K, f32), jnp.asarray(Kinv, f32), interpret=True,
    )
    for g, w, name, tol in zip(got, want, ("homo", "epi", "base"), (2e-2, 2e-3, 1e-5)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3, atol=tol, err_msg=name)
