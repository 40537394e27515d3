"""Headline benchmark: full MSCKF camera-update loop rate on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's camera-update loop runs at ~7 Hz on a laptop CPU
(`/root/reference/README.md:29`; one loop = feature matching + geometric
verification + triage/triangulation + gated EKF update + marginalization +
that frame's 10 IMU propagation steps). Here one "camera update" = one frame
block of the on-device scan over a full synthetic circle sequence (features
pre-extracted, like the reference's --source synthetic mode). North-star
target (BASELINE.json): >500 Hz on one v5e chip.
"""

import functools
import json
import time

import numpy as np

BASELINE_CAMERA_HZ = 7.0


def main():
    import os

    import jax

    # persistent compilation cache: the tunneled remote compile can take
    # minutes cold; cache hits bring reruns down to seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
    from msckf_tpu.data.stream import build_stream, to_device
    from msckf_tpu.data.synthetic import generate_circle_sequence

    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    # capacities sized to the sequence (validated: zero overflow, identical
    # trajectory vs f_max=512; the overflow assert below keeps this honest).
    # desc_dim 16 covers the synthetic 10-d descriptors (zero-padding leaves
    # cosine similarity unchanged).
    cfg = reference_experiment_config(
        dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16
    )
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
    gt_final = jnp.asarray(seq.poses_t[len(seq.timestamps) - 1], dtype=cfg.jdtype)

    @jax.jit
    def run(state, prefix, frames):
        final, _, _ = run_sequence(cfg, state, prefix, frames)
        err = jnp.linalg.norm(final.imu.p_WI - gt_final)
        overflow = final.diag.n_track_overflow + final.diag.n_update_overflow
        return err, overflow

    # warm-up / compile (fetch only scalars — device->host transfers
    # through the test harness tunnel are expensive)
    err, overflow = jax.device_get(run(state, std.prefix, std.frames))
    assert np.isfinite(err) and err < 0.2, f"filter diverged in bench: {err} m"
    assert int(overflow) == 0, "capacity overflow: benchmark config undersized"

    n_frames = std.frames["imu_ts"].shape[0]
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        err, _ = jax.device_get(run(state, std.prefix, std.frames))
    dt = (time.perf_counter() - t0) / reps

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
