"""Chunked double-buffered streaming (`filter/streamed.py`) vs the
monolithic `run_sequence`: identical trajectories, outputs, and final state.

The streamed runner exists for sequences larger than HBM (reference analog:
host-RAM loop, `/root/reference/main.py:261`); padding no-op frames must be
exact state pass-throughs for the chunking to be semantics-free.
"""

import jax
import numpy as np

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.filter.msckf import make_initial_state, run_sequence
from msckf_tpu.filter.streamed import run_sequence_streamed


def _prepared(max_ticks=400):
    cfg = reference_experiment_config(
        dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16
    )
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
        max_ticks=max_ticks,
    )
    return cfg, st


def test_streamed_matches_monolithic():
    cfg, st = _prepared()
    C = st.frames["has_camera"].shape[0]
    assert C >= 10

    std = to_device(st, cfg)
    state0 = make_initial_state(cfg, std.R_init)
    final_m, pre_m, out_m = jax.jit(
        lambda s, p, f: run_sequence(cfg, s, p, f)
    )(state0, std.prefix, std.frames)

    # chunk size NOT dividing C: exercises last-chunk padding
    state0b = make_initial_state(cfg, st.R_init)
    final_s, pre_s, out_s = run_sequence_streamed(
        cfg, state0b, st.prefix, st.frames, chunk_frames=7
    )
    assert out_s.p_WI.shape == out_m.p_WI.shape

    for name in ("R_WI", "p_WI", "v_WI", "sigma_rot", "sigma_pos"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out_m, name)), getattr(out_s, name),
            err_msg=f"frame output {name} differs",
        )
    np.testing.assert_array_equal(np.asarray(out_m.n_cams), out_s.n_cams)
    np.testing.assert_array_equal(np.asarray(out_m.n_tracks), out_s.n_tracks)
    np.testing.assert_array_equal(np.asarray(pre_m.p_WI), pre_s.p_WI)

    fm = jax.device_get(final_m)
    fs = jax.device_get(final_s)
    np.testing.assert_array_equal(fm.imu.p_WI, fs.imu.p_WI)
    np.testing.assert_array_equal(fm.P, fs.P)
    assert int(fs.diag.n_track_overflow) == 0


def test_batched_streamed_matches_batched():
    """run_batched_streamed == batched_run_sequence, with distinct batch
    lanes (perturbed initial positions) so lane mixing would be caught."""
    import jax.numpy as jnp

    from msckf_tpu.filter.streamed import run_batched_streamed
    from msckf_tpu.parallel.batched import batched_initial_state, batched_run_sequence

    cfg, st = _prepared(max_ticks=300)
    B = 3
    states = batched_initial_state(cfg, B, R_init=st.R_init)
    dp = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.1, -0.2, 0.05], [-0.3, 0.02, 0.1]], cfg.jdtype
    )
    states = states.replace(imu=states.imu.replace(p_WI=states.imu.p_WI + dp))

    std = to_device(st, cfg)
    rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    prefix_d = {k: rep(v) for k, v in std.prefix.items()}
    frames_d = {k: rep(v) for k, v in std.frames.items()}
    final_m, pre_m, out_m = jax.jit(
        lambda s, p, f: batched_run_sequence(cfg, s, p, f)
    )(states, prefix_d, frames_d)

    rep_h = lambda x: np.broadcast_to(np.asarray(x), (B,) + x.shape)
    prefix_h = {k: rep_h(v) for k, v in st.prefix.items()}
    frames_h = {k: rep_h(v) for k, v in st.frames.items()}
    final_s, pre_s, out_s = run_batched_streamed(
        cfg, states, prefix_h, frames_h, chunk_frames=5
    )

    assert out_s.p_WI.shape == out_m.p_WI.shape  # (B, C, Bt, 3)
    # distinct lanes stayed distinct
    assert not np.allclose(out_s.p_WI[0], out_s.p_WI[1])
    for name in ("R_WI", "p_WI", "v_WI", "sigma_pos"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out_m, name)), getattr(out_s, name),
            err_msg=f"batched frame output {name} differs",
        )
    np.testing.assert_array_equal(np.asarray(pre_m.p_WI), pre_s.p_WI)
    fm, fs = jax.device_get(final_m), jax.device_get(final_s)
    np.testing.assert_array_equal(fm.imu.p_WI, fs.imu.p_WI)
    np.testing.assert_array_equal(fm.P, fs.P)


def test_live_telemetry_during_streamed_run():
    """LiveRerunStream + on_chunk: every valid tick is logged, in order,
    with per-chunk granularity DURING the run (sink-injected; rerun-sdk is
    absent from this image)."""
    from msckf_tpu.utils.viz import LiveRerunStream

    class FakeSink:
        def __init__(self):
            self.ticks = []
            self.logged = []

        def set_time(self, timeline, sequence):
            self.ticks.append(sequence)

        def log(self, entity, payload):
            self.logged.append(entity)

    cfg, st = _prepared(max_ticks=300)
    n_ticks = st.n_ticks

    # GT arrays sized to the tick count (identity/zeros are fine: the live
    # stream logs raw error series, it does not gate on them)
    gt_R = np.broadcast_to(np.eye(3), (n_ticks, 3, 3))
    gt_t = np.zeros((n_ticks, 3))
    sink = FakeSink()
    live = LiveRerunStream(gt_R, gt_t, sink=sink)

    chunk_sizes = []

    def on_chunk(start, out):
        chunk_sizes.append(np.asarray(out.p_WI).shape[0])
        live.consume(out)

    state0 = make_initial_state(cfg, st.R_init)
    run_sequence_streamed(
        cfg, state0, st.prefix, st.frames, chunk_frames=4,
        on_prefix=live.consume, on_chunk=on_chunk,
    )

    # chunked delivery happened (many callbacks, fixed size except the tail)
    assert len(chunk_sizes) >= 3
    assert set(chunk_sizes[:-1]) == {4}
    # ticks logged monotonically 0..T-1 over all valid ticks
    total_valid = int(np.sum(st.prefix["imu_valid"])) + int(
        np.sum(st.frames["imu_valid"])
    )
    expect = min(total_valid, n_ticks)
    assert live.tick == expect
    assert sink.ticks == list(range(expect))
    assert "world/estimated_trajectory" in sink.logged
    assert "absolute_orientation_error/yaw" in sink.logged


def test_streamed_single_chunk_and_oversize():
    """chunk_frames >= C degrades to one upload; chunk_frames=1 still works."""
    cfg, st = _prepared(max_ticks=250)
    state0 = make_initial_state(cfg, st.R_init)
    f_big, _, out_big = run_sequence_streamed(
        cfg, state0, st.prefix, st.frames, chunk_frames=10_000
    )
    state0 = make_initial_state(cfg, st.R_init)
    f_one, _, out_one = run_sequence_streamed(
        cfg, state0, st.prefix, st.frames, chunk_frames=1
    )
    np.testing.assert_array_equal(out_big.p_WI, out_one.p_WI)
    np.testing.assert_array_equal(
        jax.device_get(f_big).P, jax.device_get(f_one).P
    )
