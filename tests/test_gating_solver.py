"""Chi-square gate solver variants (`MSCKFConfig.gating_solver`).

The gate computes gamma = r~^T S^{-1} r~ against a chi-square threshold
(`/root/reference/src/msckf/MSCKF.py:561-568`). "xla" solves with batched
Cholesky (the parity path on CPU); "ns" inverts the Jacobi-pre-scaled S by
Newton-Schulz iteration + two polish steps (`filter/update.py`). gamma only
feeds a threshold COMPARE, so the contract is: identical gate decisions on
the fixture and trajectories equal to solve round-off. Round 5 made "ns"
the bench default unbatched too (full-shape 1036.9 -> 1288.9 Hz on v5e);
this test pins the decision equivalence the bench configs rely on.
"""

import jax
import numpy as np

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.filter.msckf import make_initial_state, run_sequence


def _run(gating_solver, max_ticks=450):
    cfg = reference_experiment_config(
        dtype="float32", correction_dtype="none", f_max=192, u_max=32,
        k_max=256, desc_dim=16, gating_solver=gating_solver,
        gating_ns_iters=12,
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


def test_ns_gate_matches_cholesky_gate():
    final_x, out_x = _run("xla")
    final_n, out_n = _run("ns")
    # identical discrete decisions frame by frame
    assert int(final_x.diag.n_gating_rejected) > 0  # the gate actually fires
    np.testing.assert_array_equal(
        final_x.diag.n_gating_rejected, final_n.diag.n_gating_rejected
    )
    np.testing.assert_array_equal(out_x.n_cams, out_n.n_cams)
    np.testing.assert_array_equal(out_x.n_tracks, out_n.n_tracks)
    # trajectory equal to f32 solve round-off
    np.testing.assert_allclose(out_x.p_WI, out_n.p_WI, atol=2e-4)
    np.testing.assert_allclose(final_x.P, final_n.P, atol=2e-3)
