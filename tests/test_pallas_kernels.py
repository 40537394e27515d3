"""Pallas kernel correctness (interpret mode on CPU) vs the XLA reference."""

import jax
import numpy as np

import jax.numpy as jnp

from msckf_tpu.ops.pallas_kernels import batched_gating_gamma, gating_gamma_reference


def _spd_batch(rng, U, n, scale=1.0):
    A = rng.normal(size=(U, n, n)).astype(np.float32) * scale
    S = A @ A.transpose(0, 2, 1) + 0.01 * np.eye(n, dtype=np.float32)
    return S


def test_gating_gamma_matches_cholesky_solve():
    rng = np.random.default_rng(0)
    U, n = 16, 32
    S = _spd_batch(rng, U, n, 0.3)
    r = rng.normal(size=(U, n)).astype(np.float32)
    got = np.asarray(batched_gating_gamma(jnp.asarray(S), jnp.asarray(r), interpret=True))
    want = np.asarray(gating_gamma_reference(jnp.asarray(S), jnp.asarray(r)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_gating_gamma_padded_rows():
    """sigma^2-diagonal padding rows with zero residual contribute zero."""
    rng = np.random.default_rng(1)
    U, n, k = 8, 24, 10  # k real rows
    S = np.zeros((U, n, n), np.float32)
    r = np.zeros((U, n), np.float32)
    Ssub = _spd_batch(rng, U, k, 0.5)
    rsub = rng.normal(size=(U, k)).astype(np.float32)
    S[:, :k, :k] = Ssub
    for i in range(k, n):
        S[:, i, i] = 0.01
    r[:, :k] = rsub
    got = np.asarray(batched_gating_gamma(jnp.asarray(S), jnp.asarray(r), interpret=True))
    want = np.asarray(gating_gamma_reference(jnp.asarray(Ssub), jnp.asarray(rsub)))
    np.testing.assert_allclose(got, want, rtol=2e-4)
