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


def test_blocked_gamma_matches_reference():
    """Batched-rule gating path: panel-blocked XLA Cholesky gamma vs the
    cho_solve reference, including padded (sigma^2-diagonal) rows."""
    from msckf_tpu.ops.pallas_kernels import blocked_gamma_xla

    rng = np.random.default_rng(7)
    for B, U, n in ((1, 5, 16), (3, 32, 64), (2, 7, 24)):
        S = _spd_batch(rng, B * U, n).reshape(B, U, n, n)
        r = rng.normal(size=(B, U, n)).astype(np.float32)
        got = np.asarray(blocked_gamma_xla(jnp.asarray(S), jnp.asarray(r)))
        want = np.asarray(
            gating_gamma_reference(jnp.asarray(S), jnp.asarray(r))
        )
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)


def test_vmapped_gating_uses_blocked_form():
    """jax.vmap over batched_gating_gamma equals per-item kernel calls."""
    rng = np.random.default_rng(8)
    B, U, n = 3, 6, 16
    S = _spd_batch(rng, B * U, n).reshape(B, U, n, n)
    r = rng.normal(size=(B, U, n)).astype(np.float32)
    got = np.asarray(
        jax.vmap(lambda s, rr: batched_gating_gamma(s, rr, interpret=True))(
            jnp.asarray(S), jnp.asarray(r)
        )
    )
    want = np.stack([
        np.asarray(batched_gating_gamma(jnp.asarray(S[b]), jnp.asarray(r[b]), interpret=True))
        for b in range(B)
    ])
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)
