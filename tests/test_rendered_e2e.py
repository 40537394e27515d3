"""Full-pipeline e2e on rendered imagery: raytraced textured-plane frames ->
XFeat -> matching -> MSCKF. This is the stand-in for the reference's
photorealistic (TartanAir) runs — the images are ground truth, features come
from the real CNN front-end.

The plumbing test runs with random weights (structure only); the accuracy
test requires the trained self-supervised weights artifact and gates on
actual trajectory error.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "weights", "xfeat_selfsup.npz")


def _run_vio_on_rendered(seq, params, top_k, cfg_overrides=None):
    from msckf_tpu.config import reference_experiment_config
    from msckf_tpu.data.stream import build_stream, suggest_capacities, to_device
    from msckf_tpu.filter.msckf import make_initial_state, run_sequence
    from msckf_tpu.models.xfeat import detect_and_compute

    fn = jax.jit(functools.partial(detect_and_compute, top_k=top_k))
    kps, descs, scores = [], [], []
    for img in seq.images:
        k, d, s, v = jax.device_get(fn(params, jnp.asarray(img)))
        kps.append(k[v])
        descs.append(d[v])
        scores.append(s[v])

    H, W = seq.images.shape[1:]
    fxy = 180.0
    caps = suggest_capacities(kps, max_camera_states=30)
    cfg = reference_experiment_config(
        dtype="float32",
        R_WC=seq.R_WC_extrinsic.tolist(),
        K=[[fxy, 0.0, W / 2.0], [0.0, fxy, H / 2.0], [0.0, 0.0, 1.0]],
        width=W,
        height=H,
        f_max=caps["f_max"],
        k_max=caps["k_max"],
        u_max=max(caps["u_max"], 48),
        desc_dim=64,
        **(cfg_overrides or {}),
    )
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        kps, descs, scores,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    run = jax.jit(functools.partial(run_sequence, cfg))
    final, pre_out, fr_out = run(state, std.prefix, std.frames)
    pv = np.asarray(pre_out.valid)
    fv = np.asarray(fr_out.valid).reshape(-1)
    p = np.concatenate(
        [np.asarray(pre_out.p_WI)[pv], np.asarray(fr_out.p_WI).reshape(-1, 3)[fv]]
    )
    ate = np.linalg.norm(p - seq.poses_t[: len(p)], axis=1)
    return ate, final


def test_rendered_pipeline_plumbing():
    """Random-weight CNN: the full image pipeline must run and stay finite."""
    from msckf_tpu.data.rendered import generate_rendered_circle
    from msckf_tpu.models.xfeat import init_params

    seq = generate_rendered_circle(n_ticks=400, width=160, height=128)
    params = init_params(jax.random.key(0), 128, 160)
    ate, final = _run_vio_on_rendered(seq, params, top_k=100)
    assert np.all(np.isfinite(ate))


@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason="no trained weights artifact")
def test_rendered_vio_accuracy_with_trained_weights():
    """Trained weights: the full pipeline must actually track the camera.

    Gate: final ATE < 10% of the path length, and far below the dead-
    reckoning (IMU-only) drift on the same sequence.
    """
    from msckf_tpu.data.rendered import generate_rendered_circle
    from msckf_tpu.models.train_xfeat import load_npz_params

    seq = generate_rendered_circle(n_ticks=2400, width=320, height=240)
    params = load_npz_params(WEIGHTS)
    ate, final = _run_vio_on_rendered(seq, params, top_k=300)

    # path length: one ~18 s lap of a 3 m-radius circle at ~1 m/s
    path_len = float(
        np.sum(np.linalg.norm(np.diff(seq.poses_t, axis=0), axis=1))
    )
    # IMU-only dead reckoning on the same stream for scale
    from msckf_tpu.config import reference_experiment_config
    from msckf_tpu.data.stream import build_stream, to_device
    from msckf_tpu.filter.msckf import make_initial_state, run_sequence

    cfg0 = reference_experiment_config(dtype="float32", only_imu=True,
                                       R_WC=seq.R_WC_extrinsic.tolist())
    st0 = build_stream(cfg0, seq.timestamps, seq.imu_gyro, seq.imu_acc,
                       seq.cam_frame_ticks,
                       [np.zeros((0, 2))] * len(seq.cam_frame_ticks),
                       [np.zeros((0, 10))] * len(seq.cam_frame_ticks),
                       [np.zeros((0,))] * len(seq.cam_frame_ticks))
    std0 = to_device(st0, cfg0)
    state0 = make_initial_state(cfg0, std0.R_init)
    f0, pre0, fr0 = jax.jit(functools.partial(run_sequence, cfg0))(
        state0, std0.prefix, std0.frames
    )
    dead = float(np.linalg.norm(np.asarray(f0.imu.p_WI) - seq.poses_t[-1]))

    final_ate = float(ate[-1])
    assert final_ate < 0.10 * path_len, (
        f"final ATE {final_ate:.3f} m over {path_len:.1f} m path"
    )
    assert final_ate < 0.5 * dead or dead < 0.05, (
        f"vision adds nothing: ATE {final_ate:.3f} vs dead-reckoning {dead:.3f}"
    )
