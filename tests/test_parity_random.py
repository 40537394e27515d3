"""Randomized golden-trace parity: random waypoint trajectories, random
world clouds, and varying buffer capacities must all reproduce the float64
oracle — guarding the fixed-shape machinery (slot allocation, masking,
compaction) against fixture overfitting, not just the circle preset."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_sequence, random_world_points
from msckf_tpu.filter.msckf import make_initial_state, run_sequence
from tests.oracle.driver import run_oracle_loop


def _random_sequence(rng: np.random.Generator):
    """A short random 2-4 segment trajectory over a random point cloud."""
    n_seg = int(rng.integers(2, 4))
    pts = [np.zeros(3)]
    angs = [np.zeros(3)]
    for _ in range(n_seg):
        pts.append(pts[-1] + rng.uniform(-2.0, 2.0, 3) * np.array([1, 1, 0.2]))
        angs.append(angs[-1] + np.array([0, 0, rng.uniform(-1.2, 1.2)]))
    segments = [
        ([pts[i], pts[i + 1]], [angs[i], angs[i + 1]]) for i in range(n_seg)
    ]
    wp, wd = random_world_points(
        rng, int(rng.integers(60, 120)), [14.0, 14.0, 4.0], [-7.0, -5.0, 0.0]
    )
    return generate_sequence(
        segments, wp, wd, rng=rng, stationary_prefix=19,
        sigma_acc=2e-4, sigma_gyro=2e-5,
    )


@pytest.mark.parametrize("seed,caps", [
    (101, dict(f_max=256, u_max=48, k_max=256, n_cam_slots=32, m_max=32)),
    (202, dict(f_max=320, u_max=64, k_max=192, n_cam_slots=32, m_max=32)),
    (303, dict(f_max=256, u_max=32, k_max=256, n_cam_slots=36, m_max=36)),
])
def test_random_sequence_parity(seed, caps):
    rng = np.random.default_rng(seed)
    seq = _random_sequence(rng)
    T = min(400, len(seq.timestamps))
    cfg = reference_experiment_config(dtype="float64", **caps)

    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, max_ticks=T,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    final, pre, fr = jax.jit(functools.partial(run_sequence, cfg))(
        state, std.prefix, std.frames
    )
    pv = np.asarray(pre.valid)
    fv = np.asarray(fr.valid).reshape(-1)
    p = np.concatenate(
        [np.asarray(pre.p_WI)[pv], np.asarray(fr.p_WI).reshape(-1, 3)[fv]]
    )
    n_cams = np.concatenate(
        [np.asarray(pre.n_cams)[pv], np.asarray(fr.n_cams).reshape(-1)[fv]]
    )
    n_tracks = np.concatenate(
        [np.asarray(pre.n_tracks)[pv], np.asarray(fr.n_tracks).reshape(-1)[fv]]
    )

    oracle, ref = run_oracle_loop(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, T,
    )
    assert int(final.diag.n_track_overflow) == 0
    assert int(final.diag.n_update_overflow) == 0
    np.testing.assert_array_equal(n_cams, ref["n_cams"])
    np.testing.assert_array_equal(n_tracks, ref["n_feats"])
    np.testing.assert_allclose(p, np.asarray(ref["p"]), atol=1e-7)
    assert int(final.diag.n_epipolar_rejected) == oracle.n_epi_rej
    assert int(final.diag.n_homography_rejected) == oracle.n_homo_rej
    assert int(final.diag.n_gating_rejected) == oracle.n_gate_rej
