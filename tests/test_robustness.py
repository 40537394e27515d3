"""Degradation-path robustness: undersized buffers must degrade gracefully
(finite state, counted overflow), never NaN or crash."""

import functools

import numpy as np

import jax

from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence


def _run(cfg, seq, T):
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, max_ticks=T,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    run = jax.jit(functools.partial(run_sequence, cfg))
    final, pre, fr = run(state, std.prefix, std.frames)
    return final, fr


def test_track_overflow_counted_and_finite():
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    cfg = reference_experiment_config(
        dtype="float32", f_max=64, u_max=8, k_max=512, desc_dim=16
    )
    final, fr = _run(cfg, seq, 600)
    p = np.asarray(fr.p_WI)
    assert np.isfinite(p[np.asarray(fr.valid)]).all()
    # with only 64 track slots for ~120 live tracks, spawns must overflow
    assert int(final.diag.n_track_overflow) > 0
    # and the filter still roughly tracks (degraded, not broken)
    valid = np.asarray(fr.valid).reshape(-1)
    pf = np.asarray(fr.p_WI).reshape(-1, 3)[valid][-1]
    n = int(np.asarray(fr.valid).sum()) + len(np.asarray(fr.valid)) * 0  # noqa
    assert np.linalg.norm(pf) < 10.0


def test_update_overflow_counted():
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    cfg = reference_experiment_config(
        dtype="float64", f_max=256, u_max=2, k_max=512
    )
    final, fr = _run(cfg, seq, 600)
    assert int(final.diag.n_update_overflow) > 0
    assert np.isfinite(np.asarray(final.imu.p_WI)).all()


def test_tiny_window_configuration():
    """A 6-camera sliding window (aggressive marginalization) stays stable."""
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    cfg = reference_experiment_config(
        dtype="float64", f_max=256, u_max=32, k_max=512,
        max_camera_states=6, n_cam_slots=8, m_max=8,
    )
    final, fr = _run(cfg, seq, 800)
    valid = np.asarray(fr.valid).reshape(-1)
    pf = np.asarray(fr.p_WI).reshape(-1, 3)[valid]
    n = int(np.asarray(fr.valid).sum())
    # stays bounded near ground truth despite the tiny window
    err = np.linalg.norm(pf[-1] - seq.poses_t[: 800][-1])
    assert np.isfinite(pf).all()
    assert err < 0.5, err
