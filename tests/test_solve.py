"""Newton-Schulz batched gain solve (`ops/solve.py`) vs LU truth.

The batched multi-trajectory filter replaces the per-item LU custom call
(which serializes across the vmap batch) with Newton-Schulz matmuls plus a
residual-gated LU fallback; these tests pin accuracy on realistic
(filter-structured) systems, the fallback on hopeless conditioning, and the
unbatched == LU contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from msckf_tpu.ops.solve import gain_solve


def _filter_system(rng, D, gain_scale):
    """Bt = sigma^2 I + P A with A PSD, P SPD — the correction-chain shape.

    ``gain_scale`` sets ||P A|| / sigma^2, i.e. how far Bt is from sigma^2 I
    (oracle-captured real systems sit at cond ~1.2).
    """
    H = rng.standard_normal((40, D)).astype(np.float32)
    A = (H.T @ H).astype(np.float32)
    P = rng.standard_normal((D, D)).astype(np.float32)
    P = (P @ P.T + np.eye(D)).astype(np.float32)
    sigma2 = 0.01
    s = gain_scale * sigma2 / np.abs(P @ A).max()
    Bt = (sigma2 * np.eye(D) + s * (P @ A)).astype(np.float32)
    return Bt, P


def test_unbatched_is_lu():
    rng = np.random.default_rng(0)
    Bt, P = _filter_system(rng, 63, 0.3)
    got = np.asarray(jax.jit(gain_solve)(jnp.asarray(Bt), jnp.asarray(P)))
    want = np.asarray(jnp.linalg.solve(jnp.asarray(Bt), jnp.asarray(P)))
    np.testing.assert_array_equal(got, want)


def test_batched_ns_matches_f64_on_realistic_systems():
    rng = np.random.default_rng(1)
    systems = [_filter_system(rng, 87, s) for s in (0.1, 0.5, 2.0)]
    Bt = jnp.asarray(np.stack([b for b, _ in systems]))
    P = jnp.asarray(np.stack([p for _, p in systems]))
    Y = np.asarray(jax.jit(jax.vmap(gain_solve))(Bt, P))
    Yr = np.linalg.solve(np.asarray(Bt, np.float64), np.asarray(P, np.float64))
    rel = np.abs(Y - Yr).max() / np.abs(Yr).max()
    assert rel < 1e-5, rel


def test_batched_fallback_fires_on_hard_systems():
    """cond ~1e6 systems: raw NS at the default iteration count cannot
    converge, so the accuracy of the result proves the LU fallback ran."""
    rng = np.random.default_rng(2)
    D, B = 87, 3
    A = rng.standard_normal((B, D, D)).astype(np.float32)
    A = A @ np.swapaxes(A, 1, 2)
    P = rng.standard_normal((B, D, D)).astype(np.float32)
    P = P @ np.swapaxes(P, 1, 2)
    Bt = (1e-4 * np.eye(D) + P @ A).astype(np.float32)
    assert np.linalg.cond(Bt.astype(np.float64)).max() > 1e5
    Y = np.asarray(jax.jit(jax.vmap(gain_solve))(jnp.asarray(Bt), jnp.asarray(P)))
    Ylu = np.asarray(jnp.linalg.solve(jnp.asarray(Bt), jnp.asarray(P)))
    np.testing.assert_allclose(Y, Ylu, rtol=0, atol=1e-5 * np.abs(Ylu).max())


def test_correction_terms_ns_matches_lu_under_vmap():
    """The wired-in path: vmapped `_correction_terms` with batched_solver
    'ns' vs 'lu' agree to f32 working accuracy."""
    from msckf_tpu.config import reference_experiment_config
    from msckf_tpu.filter.update import _correction_terms

    base = dict(
        dtype="float32", correction_dtype="none",
        f_max=32, u_max=8, k_max=32, desc_dim=8,
    )
    cfg_ns = reference_experiment_config(batched_solver="ns", **base)
    cfg_lu = reference_experiment_config(batched_solver="lu", **base)
    D = cfg_ns.err_dim
    rng = np.random.default_rng(3)
    B = 4
    H = rng.standard_normal((B, 30, D)).astype(np.float32) * 0.5
    A = jnp.asarray(np.einsum("bri,brj->bij", H, H))
    P = rng.standard_normal((B, D, D)).astype(np.float32) * 0.05
    P = jnp.asarray(P @ np.swapaxes(P, 1, 2) + 0.01 * np.eye(D, dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    d_ns, P_ns = jax.jit(jax.vmap(lambda p, a, cc: _correction_terms(cfg_ns, p, a, cc)))(P, A, c)
    d_lu, P_lu = jax.jit(jax.vmap(lambda p, a, cc: _correction_terms(cfg_lu, p, a, cc)))(P, A, c)
    np.testing.assert_allclose(np.asarray(d_ns), np.asarray(d_lu), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(P_ns), np.asarray(P_lu), rtol=2e-4, atol=1e-7)
