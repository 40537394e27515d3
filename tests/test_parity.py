"""Golden-trace parity: the TPU scan filter vs the float64 NumPy oracle.

The oracle (tests/oracle) implements the reference formulations (scipy
null_space, QR compression, np.delete marginalization, buffer-and-replay
bootstrap); the TPU build uses the re-derived fixed-shape equivalents. Both
run the same synthetic sequence; state trajectories must agree to float64
round-off accumulation.
"""

import functools

import numpy as np
import pytest

import jax

from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from tests.oracle.driver import run_oracle_loop


@pytest.fixture(scope="module")
def seq():
    return generate_circle_sequence(rng=np.random.default_rng(0))


def _flatten_tick_outputs(prefix_out, frame_out):
    """Concatenate prefix and frame-block tick outputs into flat (T, ...)
    arrays, dropping invalid padding ticks."""
    res = {}
    pv = np.asarray(prefix_out.valid)
    fv = np.asarray(frame_out.valid).reshape(-1)
    for name in ("R_WI", "p_WI", "v_WI", "sigma_rot", "sigma_pos", "n_cams", "n_tracks"):
        a = np.asarray(getattr(prefix_out, name))
        b = np.asarray(getattr(frame_out, name))
        b = b.reshape((-1,) + b.shape[2:])
        res[name] = np.concatenate([a[pv], b[fv]], axis=0)
    return res


def _run_tpu(cfg, seq, max_ticks):
    st = build_stream(
        cfg,
        seq.timestamps,
        seq.imu_gyro,
        seq.imu_acc,
        seq.cam_frame_ticks,
        seq.cam_keypoints,
        seq.cam_descriptors,
        seq.cam_scores,
        max_ticks=max_ticks,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    run = jax.jit(functools.partial(run_sequence, cfg))
    final, pre_out, fr_out = run(state, std.prefix, std.frames)
    return final, _flatten_tick_outputs(pre_out, fr_out)


CFG = dict(dtype="float64", f_max=512, u_max=64, k_max=512)


def test_imu_only_parity(seq):
    """Config 1 (BASELINE.json): pure propagation, no vision."""
    cfg = reference_experiment_config(only_imu=True, **CFG)
    T = 800
    final, out = _run_tpu(cfg, seq, T)
    oracle, ref = run_oracle_loop(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, T,
    )
    assert out["p_WI"].shape[0] == T
    np.testing.assert_allclose(out["p_WI"], ref["p"], atol=1e-10)
    np.testing.assert_allclose(out["v_WI"], ref["v"], atol=1e-10)
    np.testing.assert_allclose(out["R_WI"], ref["R"], atol=1e-10)
    np.testing.assert_allclose(out["sigma_rot"], ref["sig_rot"], rtol=1e-8, atol=1e-18)
    np.testing.assert_allclose(out["sigma_pos"], ref["sig_pos"], rtol=1e-8, atol=1e-18)


def test_full_vio_parity(seq):
    """Config 2 analog: full MSCKF VIO with oracle features on the synthetic
    circle — matching, verification, triage, update, marginalization, pruning
    all active. The trajectories must agree to f64 round-off growth."""
    cfg = reference_experiment_config(**CFG)
    T = 600
    final, out = _run_tpu(cfg, seq, T)
    oracle, ref = run_oracle_loop(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, T,
    )
    # identical discrete decisions
    np.testing.assert_array_equal(out["n_cams"], ref["n_cams"])
    np.testing.assert_array_equal(out["n_tracks"], ref["n_feats"])
    # state trajectories to round-off
    np.testing.assert_allclose(out["p_WI"], ref["p"], atol=1e-7)
    np.testing.assert_allclose(out["v_WI"], ref["v"], atol=1e-7)
    np.testing.assert_allclose(out["R_WI"], ref["R"], atol=1e-7)
    np.testing.assert_allclose(out["sigma_pos"], ref["sig_pos"], rtol=1e-4, atol=1e-16)
    np.testing.assert_allclose(out["sigma_rot"], ref["sig_rot"], rtol=1e-4, atol=1e-16)
    # rejection counters
    assert int(final.diag.n_epipolar_rejected) == oracle.n_epi_rej
    assert int(final.diag.n_homography_rejected) == oracle.n_homo_rej
    assert int(final.diag.n_gating_rejected) == oracle.n_gate_rej


def test_gn_triangulation_parity(seq):
    """Golden-trace parity for the GN-triangulation ablation (BASELINE
    config 4): the oracle's float64 Gauss-Newton refinement
    (tests/oracle/numpy_msckf.py::_gn_refine) against the TPU build's
    ``refine_inverse_depth_gn`` through the full filter loop — the same
    parity bar as the lines path."""
    cfg = reference_experiment_config(triangulation="gn", **CFG)
    T = 600
    final, out = _run_tpu(cfg, seq, T)
    oracle, ref = run_oracle_loop(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, T,
    )
    np.testing.assert_array_equal(out["n_cams"], ref["n_cams"])
    np.testing.assert_array_equal(out["n_tracks"], ref["n_feats"])
    np.testing.assert_allclose(out["p_WI"], ref["p"], atol=1e-7)
    np.testing.assert_allclose(out["v_WI"], ref["v"], atol=1e-7)
    np.testing.assert_allclose(out["R_WI"], ref["R"], atol=1e-7)
    np.testing.assert_allclose(out["sigma_pos"], ref["sig_pos"], rtol=1e-4, atol=1e-16)
    np.testing.assert_allclose(out["sigma_rot"], ref["sig_rot"], rtol=1e-4, atol=1e-16)
    assert int(final.diag.n_gating_rejected) == oracle.n_gate_rej


def test_vio_tracks_ground_truth(seq):
    """Sanity: the filter follows the true trajectory (loose bound)."""
    cfg = reference_experiment_config(**CFG)
    T = 600
    _, out = _run_tpu(cfg, seq, T)
    err = np.linalg.norm(out["p_WI"] - seq.poses_t[:T], axis=-1)
    assert err[-1] < 0.05, f"final position error {err[-1]:.4f} m"
