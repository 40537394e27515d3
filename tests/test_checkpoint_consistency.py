"""Checkpoint/resume round trip (bit-exact scan continuation) and
NEES/3-sigma consistency on a real filtered sequence."""

import functools

import numpy as np

import jax

from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.filter.msckf import frame_step
from msckf_tpu.utils.checkpoint import load_state, save_state
from msckf_tpu.utils.consistency import consistency_report, nees_bounds

CFG = dict(dtype="float64", f_max=384, u_max=48, k_max=512)


def _setup(T=600):
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    cfg = reference_experiment_config(**CFG)
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, max_ticks=T,
    )
    return seq, cfg, to_device(st, cfg)


def test_checkpoint_resume_bit_exact(tmp_path):
    seq, cfg, std = _setup(400)
    state = make_initial_state(cfg, std.R_init)
    step = jax.jit(functools.partial(frame_step, cfg))

    frames = std.frames
    n = frames["imu_ts"].shape[0]
    half = n // 2
    for j in range(half):
        state, _ = step(state, {k: v[j] for k, v in frames.items()})

    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)
    restored = load_state(path, cfg)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continue both and compare — bit-exact resume
    s1, s2 = state, restored
    for j in range(half, n):
        fr = {k: v[j] for k, v in frames.items()}
        s1, _ = step(s1, fr)
        s2, _ = step(s2, fr)
    np.testing.assert_array_equal(np.asarray(s1.P), np.asarray(s2.P))
    np.testing.assert_array_equal(np.asarray(s1.imu.p_WI), np.asarray(s2.imu.p_WI))


def test_consistency_on_sequence():
    seq, cfg, std = _setup(1200)
    state = make_initial_state(cfg, std.R_init)
    run = jax.jit(functools.partial(run_sequence, cfg))
    final, pre, fr = run(state, std.prefix, std.frames)

    def flat(o, name):
        a = np.asarray(getattr(pre, name))
        b = np.asarray(getattr(fr, name))
        return np.concatenate([a, b.reshape((-1,) + b.shape[2:])])

    valid = flat(None, "valid").astype(bool)
    est_R = flat(None, "R_WI")[valid]
    est_t = flat(None, "p_WI")[valid]
    s_rot = flat(None, "sigma_rot")[valid]
    s_pos = flat(None, "sigma_pos")[valid]
    T = len(est_t)
    rep = consistency_report(
        seq.poses_R[:T], seq.poses_t[:T], est_R, est_t, s_rot, s_pos
    )
    lo, hi = nees_bounds()
    assert 0 < lo < hi
    # reference headline: errors within the 3-sigma envelope (`README.md:28`)
    assert rep["ate_within_3sigma"] > 0.8, rep
    assert np.isfinite(rep["nees_mean"])
