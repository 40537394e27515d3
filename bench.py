"""Headline benchmark: full MSCKF camera-update loop rate on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's camera-update loop runs at ~7 Hz on a laptop CPU
(`/root/reference/README.md:29`; one loop = XFeat + full EKF vision update +
its share of IMU ticks). Here one "camera update" = one frame block of the
on-device scan: 10 IMU propagation steps + state augmentation + matching +
geometric verification + triage/triangulation + gated EKF update +
marginalization/pruning, measured end-to-end over a long synthetic sequence
(features pre-extracted, like the reference's --source synthetic mode).
North-star target (BASELINE.json): >500 Hz on one v5e chip.
"""

import functools
import json
import time

import numpy as np

BASELINE_CAMERA_HZ = 7.0


def main():
    import jax

    from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
    from msckf_tpu.data.stream import build_stream, to_device
    from msckf_tpu.data.synthetic import generate_circle_sequence

    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    cfg = reference_experiment_config(dtype="float32", f_max=512, u_max=64, k_max=512)
    st = build_stream(
        cfg,
        seq.timestamps,
        seq.imu_gyro,
        seq.imu_acc,
        seq.cam_frame_ticks,
        seq.cam_keypoints,
        seq.cam_descriptors,
        seq.cam_scores,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    run = jax.jit(functools.partial(run_sequence, cfg))

    # warm-up / compile
    final, pre, fr = run(state, std.prefix, std.frames)
    jax.block_until_ready(final.P)

    n_frames = std.frames["imu_ts"].shape[0]
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        final, pre, fr = run(state, std.prefix, std.frames)
    jax.block_until_ready(final.P)
    dt = (time.perf_counter() - t0) / reps

    # sanity: the benchmarked filter must actually track
    p = np.asarray(fr.p_WI).reshape(-1, 3)
    valid = np.asarray(fr.valid).reshape(-1)
    n_ticks = int(np.asarray(std.prefix["imu_valid"]).sum() + valid.sum())
    gt = seq.poses_t[n_ticks - int(valid.sum()) : n_ticks]
    final_err = float(np.linalg.norm(p[valid][-1] - gt[-1]))
    assert final_err < 0.2, f"filter diverged in bench: {final_err} m"

    hz = n_frames / dt
    print(
        json.dumps(
            {
                "metric": "camera_update_loop_hz",
                "value": round(hz, 2),
                "unit": "Hz",
                "vs_baseline": round(hz / BASELINE_CAMERA_HZ, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
