"""BASELINE.json ablation configs: GN inverse-depth triangulation (config 4)
and the high-noise sweep (config 3)."""

import functools

import numpy as np
import pytest

import jax

from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
from msckf_tpu.config import NOISE_PRESETS
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence

CFG = dict(dtype="float64", f_max=512, u_max=64, k_max=512)


def _run(cfg, seq, T):
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, max_ticks=T,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    run = jax.jit(functools.partial(run_sequence, cfg))
    final, pre, fr = run(state, std.prefix, std.frames)
    p = np.asarray(fr.p_WI).reshape(-1, 3)
    v = np.asarray(fr.valid).reshape(-1)
    n = int(np.asarray(std.prefix["imu_valid"]).sum()) + int(v.sum())
    err = np.linalg.norm(p[v] - seq.poses_t[n - int(v.sum()):n], axis=-1)
    return final, err


def test_gn_triangulation_tracks(seq=None):
    """Config 4: the GN inverse-depth triangulator must also track the
    trajectory (and not diverge from the line-intersection baseline)."""
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    T = 800
    _, err_lines = _run(reference_experiment_config(**CFG), seq, T)
    _, err_gn = _run(
        reference_experiment_config(triangulation="gn", **CFG), seq, T
    )
    assert err_lines[-1] < 0.05
    assert err_gn[-1] < 0.05
    # the two parameterizations should agree to first order on clean data
    assert abs(err_gn[-1] - err_lines[-1]) < 0.05


def test_gn_refinement_reduces_reprojection_error():
    """Unit-level: GN refinement improves a perturbed inverse-depth point."""
    import jax.numpy as jnp

    from msckf_tpu.ops.geometry import idp_angles_m
    from msckf_tpu.ops.triangulation import refine_inverse_depth_gn

    rng = np.random.default_rng(3)
    p_true = np.array([1.0, 0.5, 6.0])
    anchor = np.zeros(3)
    M = 6
    cam_t = np.concatenate([np.zeros((1, 3)), rng.normal(size=(M - 1, 3)) * 0.5])
    cam_R = np.broadcast_to(np.eye(3), (M, 3, 3)).copy()
    z = ((p_true - cam_t) / (p_true - cam_t)[:, 2:3])[:, :2]
    m_true = np.asarray(idp_angles_m(jnp.asarray(p_true - anchor)))
    rho_true = 1.0 / np.linalg.norm(p_true - anchor) / np.linalg.norm(m_true) * np.linalg.norm(m_true)
    # perturbed seed
    m0 = m_true + rng.normal(size=3) * 0.02
    rho0 = 1.0 / p_true[2] * 1.3
    m_r, rho_r = refine_inverse_depth_gn(
        jnp.asarray(anchor), jnp.asarray(m0 / np.linalg.norm(m0)), jnp.asarray(rho0),
        jnp.asarray(cam_R), jnp.asarray(cam_t), jnp.asarray(z),
        jnp.ones(M, bool), iters=10,
    )

    def reproj_err(m, rho):
        pw = rho * (anchor - cam_t) + np.asarray(m)
        zh = pw[:, :2] / pw[:, 2:3]
        return np.abs(zh - z).max()

    assert reproj_err(np.asarray(m_r), float(rho_r)) < 1e-6
    assert reproj_err(m0, rho0) > 1e-3  # the seed really was off


@pytest.mark.parametrize("level", ["low", "mid", "high"])
def test_noise_sweep(level):
    """Config 3: the filter stays bounded across the reference's noise
    presets (`main.py:139-160`)."""
    a_nd, g_nd, a_rw, g_rw = NOISE_PRESETS[level]
    seq = generate_circle_sequence(
        rng=np.random.default_rng(7),
        sigma_acc=a_nd, sigma_gyro=g_nd, sigma_ba=a_rw, sigma_bg=g_rw,
    )
    cfg = reference_experiment_config(
        accelerometer_noise_density=a_nd,
        gyroscope_noise_density=g_nd,
        accelerometer_random_walk=a_rw,
        gyroscope_random_walk=g_rw,
        **CFG,
    )
    _, err = _run(cfg, seq, 600)
    bound = {"low": 0.1, "mid": 0.3, "high": 1.0}[level]
    assert err[-1] < bound, f"{level}: {err[-1]}"


def test_gn_refinement_numpy_oracle():
    """Independent NumPy Gauss-Newton oracle for refine_inverse_depth_gn:
    same measurement model, numeric-difference Jacobians, same damping and
    iteration count — the two refinements must land on the same (m, rho)."""
    import numpy as np
    import jax.numpy as jnp

    from msckf_tpu.ops.triangulation import refine_inverse_depth_gn

    rng = np.random.default_rng(17)
    M = 8
    # ground-truth point and cameras looking roughly at it
    gt = np.array([1.0, 0.5, 6.0])
    cam_t = rng.normal(scale=0.5, size=(M, 3))
    cam_R = np.stack([np.eye(3)] * M)  # forward-looking
    z = np.empty((M, 2))
    for j in range(M):
        pc = cam_R[j].T @ (gt - cam_t[j])
        z[j] = pc[:2] / pc[2] + rng.normal(scale=1e-3, size=2)
    anchor_base = cam_t[0]
    v0 = gt - anchor_base
    m0 = v0 / np.linalg.norm(v0)
    rho0 = 0.5 / np.linalg.norm(v0)  # deliberately off
    mask = np.ones(M, bool)
    iters, damping = 6, 1e-6

    def pack(th, ph, rho):
        return np.array([th, ph, rho])

    def model_residual(p):
        th, ph, rho = p
        m = np.array([np.cos(ph) * np.sin(th), -np.sin(ph), np.cos(ph) * np.cos(th)])
        r = np.empty(2 * M)
        for j in range(M):
            pw = rho * (anchor_base - cam_t[j]) + m
            pc = cam_R[j].T @ pw
            zc = pc[2] if abs(pc[2]) > 1e-12 else 1e-12
            r[2 * j : 2 * j + 2] = z[j] - pc[:2] / zc
        return r

    # NumPy GN with numeric Jacobians (independent of the jax derivation)
    th = np.arctan2(m0[0], m0[2])
    ph = np.arctan2(-m0[1], np.hypot(m0[0], m0[2]))
    p = pack(th, ph, rho0)
    eps = 1e-7
    for _ in range(iters):
        r = model_residual(p)
        J = np.empty((2 * M, 3))
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = eps
            J[:, k] = (model_residual(p + dp) - model_residual(p - dp)) / (2 * eps)
        J = -J  # jax code defines J = d r / d p with r = z - zhat
        H = J.T @ J + damping * np.eye(3)
        p = p - np.linalg.solve(H, J.T @ r * -1.0)

    m_np = np.array([
        np.cos(p[1]) * np.sin(p[0]), -np.sin(p[1]), np.cos(p[1]) * np.cos(p[0])
    ])
    m_jx, rho_jx = refine_inverse_depth_gn(
        jnp.asarray(anchor_base), jnp.asarray(m0), jnp.asarray(rho0),
        jnp.asarray(cam_R), jnp.asarray(cam_t), jnp.asarray(z),
        jnp.asarray(mask), iters=iters, damping=damping,
    )
    np.testing.assert_allclose(np.asarray(m_jx), m_np, atol=1e-5)
    np.testing.assert_allclose(float(rho_jx), p[2], atol=1e-5)
    # and both must actually localize the point: reproject through camera 0
    pw = p[2] * (anchor_base - cam_t[0]) + m_np
    depth = 1.0 / p[2]
    est = anchor_base + m_np * depth  # world point from the anchor form
    np.testing.assert_allclose(est, gt, atol=2e-2)
