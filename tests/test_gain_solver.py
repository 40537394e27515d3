"""Unbatched correction-solve variants (`MSCKFConfig.gain_solver`).

"lu" is the parity path (`jnp.linalg.solve` on B^T Y = P). "ns" replaces the
LU custom call with Newton-Schulz MXU matmuls; "chol" uses the identity
L = P B^{-1} = P M^{-1} P with M = sigma^2 P + P A P = P B (SPD), so one
Cholesky custom call replaces the pivoted LU. Both carry the residual-gated
LU fallback of `ops/solve.py`. Reference semantics being substituted:
float64 `np.linalg.inv` in the gain/Joseph chain (`MSCKF.py:604-614`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.filter.msckf import make_initial_state, run_sequence
from msckf_tpu.ops.solve import chol_gain_solve, ns_solve_direct


def _system(rng, D=64, cond=1e3, rank=40, dtype=np.float32):
    """A filter-shaped system: P SPD with given condition, A = H^T H PSD."""
    Q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    eigs = np.logspace(0, -np.log10(cond), D)
    P = (Q * eigs) @ Q.T
    H = rng.standard_normal((rank, D)) / np.sqrt(rank)
    A = H.T @ H
    return jnp.asarray(P, dtype), jnp.asarray(A, dtype)


def test_variants_match_f64_truth():
    rng = np.random.default_rng(0)
    P, A = _system(rng, cond=1e3)
    sigma2 = jnp.float32(1.5)
    D = P.shape[0]

    P64, A64 = np.asarray(P, np.float64), np.asarray(A, np.float64)
    L_true = P64 @ np.linalg.inv(1.5 * np.eye(D) + A64 @ P64)

    Bt = sigma2 * jnp.eye(D, dtype=jnp.float32) + P @ A
    L_ns = np.asarray(
        jax.jit(ns_solve_direct, static_argnames="iters")(Bt, P, iters=12)
    ).T
    L_ch = np.asarray(jax.jit(chol_gain_solve)(P, A, sigma2))

    scale = np.max(np.abs(L_true))
    # B is well-conditioned (sigma^2 floor), so NS converges to the f32
    # residual floor; forward error ~ cond(B) * residual
    assert np.max(np.abs(L_ns - L_true)) / scale < 1e-5
    # chol solves through M = P B (cond ~ cond(P) cond(B) ~ 5e3):
    # forward error ~ eps * cond(M) ~ 6e-4
    assert np.max(np.abs(L_ch - L_true)) / scale < 2e-3


def test_ns_residual_gate_falls_back_to_lu():
    """One NS iteration on a cond-1e3 system cannot meet the 1e-4 residual
    gate (error contracts as (1 - 1/cond)^(2^k)), so the output must be the
    LU branch bit-for-bit."""
    rng = np.random.default_rng(1)
    P, A = _system(rng, cond=1e3)
    sigma2 = jnp.float32(1e-3)  # cond(Bt) ~ 1e3: one iteration is hopeless
    D = P.shape[0]

    Bt = sigma2 * jnp.eye(D, dtype=jnp.float32) + P @ A
    L_lu = np.asarray(jnp.linalg.solve(Bt, P)).T
    L_ns = np.asarray(ns_solve_direct(Bt, P, iters=1)).T
    np.testing.assert_array_equal(L_ns, L_lu)


def test_chol_gate_keeps_ill_conditioned_finite():
    """Near the f32 PD limit (cond(P) ~ 1e8, so cond(M) ~ eps^-1) the chol
    path must still return a finite answer consistent with LU — either its
    own solution passing the residual gate, or the LU fallback (a NaN
    Cholesky compares False at the gate)."""
    rng = np.random.default_rng(2)
    P, A = _system(rng, cond=1e8)
    sigma2 = jnp.float32(1.5)
    D = P.shape[0]

    Bt = sigma2 * jnp.eye(D, dtype=jnp.float32) + P @ A
    L_lu = np.asarray(jnp.linalg.solve(Bt, P)).T
    L_ch = np.asarray(chol_gain_solve(P, A, sigma2))

    assert np.all(np.isfinite(L_ch))
    # gate guarantees residual < 1e-4; cond(Bt) is small (sigma^2 floor),
    # so forward agreement with LU within ~cond(Bt) * 1e-4
    scale = np.max(np.abs(L_lu))
    assert np.max(np.abs(L_ch - L_lu)) / scale < 1e-2


def _run(gain_solver, max_ticks=450):
    cfg = reference_experiment_config(
        dtype="float64", correction_dtype="", f_max=192, u_max=32, k_max=256,
        desc_dim=16, gain_solver=gain_solver,
    )
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
        max_ticks=max_ticks,
    )
    std = to_device(st, cfg)
    state0 = make_initial_state(cfg, std.R_init)
    final, pre, out = jax.jit(lambda s, p, f: run_sequence(cfg, s, p, f))(
        state0, std.prefix, std.frames
    )
    return jax.device_get(final), jax.device_get(out)


def test_end_to_end_variants_match_lu():
    """Full filter runs under each solver agree in every discrete decision
    and to solve round-off in the trajectory (f64, so round-off ~1e-12)."""
    final_lu, out_lu = _run("lu")
    for variant in ("ns", "chol"):
        final_v, out_v = _run(variant)
        np.testing.assert_array_equal(out_lu.n_cams, out_v.n_cams)
        np.testing.assert_array_equal(out_lu.n_tracks, out_v.n_tracks)
        np.testing.assert_allclose(out_lu.p_WI, out_v.p_WI, atol=1e-6)
        np.testing.assert_allclose(final_lu.P, final_v.P, atol=1e-6)
