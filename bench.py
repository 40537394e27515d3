"""Headline benchmark: full MSCKF camera-update loop rate on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Baseline: the reference's camera-update loop runs at ~7 Hz on a laptop CPU
(`/root/reference/README.md:29`; one loop = XFeat CNN inference + feature
matching + geometric verification + triage/triangulation + gated EKF update +
marginalization + that frame's 10 IMU propagation steps). North-star target
(BASELINE.json): >500 Hz on one v5e chip.

Three measurements (VERDICT.md round-1 item 3):

  * ``value`` / ``e2e_cnn_hz`` — the headline: CNN-INCLUSIVE end-to-end rate
    (XFeat detectAndCompute on a 640x480 frame + one reference-shaped filter
    frame block), the apples-to-apples number against the reference's 7 Hz.
  * ``extra.filter_full_hz`` — filter-only rate at reference-shaped
    capacities (k_max=512, desc_dim=64, f_max=768, u_max=128).
  * ``extra.filter_small_hz`` — filter-only rate at capacities auto-sized to
    the synthetic circle sequence (f_max=192, k_max=256, desc_dim=16): the
    round-1 headline configuration, kept for continuity.
  * ``extra.mfu_pct`` — FLOPs-based utilization from XLA's compiled cost
    analysis against the chip's bf16 peak. Expected to be very low: the
    filter is tiny-matrix sequential work (207x207 covariance algebra), not
    a dense-matmul workload.
"""

import json
import time

import numpy as np

BASELINE_CAMERA_HZ = 7.0

# peak dense bf16 FLOPs/s per chip (public spec sheets); used only for the
# MFU *estimate*. Unknown device kinds fall back to v5e.
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _time_reps(fn, reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    return (time.perf_counter() - t0) / reps, out


def bench_filter(jax, jnp, cfg, seq):
    """Filter-only camera-loop rate for one config. Returns (hz, flops/rep)."""
    from msckf_tpu import make_initial_state, run_sequence
    from msckf_tpu.data.stream import build_stream, to_device

    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    gt_final = jnp.asarray(seq.poses_t[len(seq.timestamps) - 1], dtype=cfg.jdtype)

    def run(state, prefix, frames):
        # assume_camera: build_stream blocks always carry a camera frame
        final, _, _ = run_sequence(cfg, state, prefix, frames, assume_camera=True)
        err = jnp.linalg.norm(final.imu.p_WI - gt_final)
        overflow = final.diag.n_track_overflow + final.diag.n_update_overflow
        return err, overflow

    compiled = (
        jax.jit(run).lower(state, std.prefix, std.frames).compile()
    )
    # warm-up + health gates (fetch only scalars — device->host transfers
    # through the test harness tunnel are expensive)
    err, overflow = jax.device_get(compiled(state, std.prefix, std.frames))
    assert np.isfinite(err), f"filter produced non-finite state: {err}"
    if not cfg.only_imu:  # dead reckoning drifts freely, vision must not
        assert err < 0.2, f"filter diverged in bench: {err} m"
    assert int(overflow) == 0, "capacity overflow: benchmark config undersized"

    n_frames = std.frames["imu_ts"].shape[0]
    # median of three 5-rep passes: single-pass numbers vary a few percent
    # with tunnel/host interference
    passes = []
    for _ in range(3):
        dt, _ = _time_reps(
            lambda: jax.device_get(compiled(state, std.prefix, std.frames)), 5
        )
        passes.append(dt)
    return n_frames / sorted(passes)[1], _flops_of(compiled) / n_frames


def bench_batched(jax, jnp, cfg, seq, batch):
    """Aggregate throughput of the vmap-batched multi-trajectory filter on
    one chip (BASELINE config 5, SURVEY §5 "vmap N trajectories per chip") —
    the framework's utilization story. Returns (aggregate camera-updates/s,
    flops/step-call)."""
    from msckf_tpu.data.stream import build_stream, to_device
    from msckf_tpu.parallel.batched import batched_initial_state, batched_run_sequence

    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
    )
    std = to_device(st, cfg)
    states = batched_initial_state(cfg, batch, R_init=std.R_init)
    rep = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    prefix = {k: rep(v) for k, v in std.prefix.items()}
    frames = {k: rep(v) for k, v in std.frames.items()}
    gt_final = jnp.asarray(
        seq.poses_t[len(seq.timestamps) - 1], dtype=cfg.jdtype
    )

    def run(states, prefix, frames):
        final, _, _ = batched_run_sequence(cfg, states, prefix, frames)
        err = jnp.linalg.norm(final.imu.p_WI - gt_final, axis=-1)
        overflow = final.diag.n_track_overflow + final.diag.n_update_overflow
        return jnp.max(err), jnp.sum(overflow)

    compiled = jax.jit(run).lower(states, prefix, frames).compile()
    err, overflow = jax.device_get(compiled(states, prefix, frames))
    assert np.isfinite(err) and err < 0.2, f"batched filter diverged: {err} m"
    assert int(overflow) == 0, "batched bench capacity overflow"

    n_frames = std.frames["imu_ts"].shape[0]
    passes = []
    for _ in range(3):
        dt, _ = _time_reps(
            lambda: jax.device_get(compiled(states, prefix, frames)), 3
        )
        passes.append(dt)
    agg_hz = batch * n_frames / sorted(passes)[1]
    return agg_hz, _flops_of(compiled), sorted(passes)[1]


def bench_xfeat(jax, jnp, top_k=300, width=640, height=480):
    """Per-frame XFeat detectAndCompute latency on one chip (the reference
    runs this once per camera frame, `MSCKF.py:271-274`)."""
    from msckf_tpu.models.xfeat import detect_and_compute, init_params

    params = init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, size=(height, width)).astype(np.float32))

    fn = jax.jit(lambda p, im: detect_and_compute(p, im, top_k=top_k))
    compiled = fn.lower(params, img).compile()
    kp, desc, sc, valid = compiled(params, img)  # warm-up
    jax.block_until_ready(kp)

    reps = 20
    dt, out = _time_reps(
        lambda: jax.block_until_ready(compiled(params, img)[0]), reps
    )
    return dt, _flops_of(compiled)


def _wait_for_device(max_wait_s=1500, probe_timeout_s=150):
    """Bounded wait for device discovery. The tunneled TPU's discovery RPC
    HANGS (not raises) when the tunnel is down, so probe it in a subprocess
    with a timeout and retry; give the driver a fast JSON failure instead of
    an indefinite hang if the tunnel never comes back."""
    import subprocess
    import sys

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print('UP', jax.devices()[0].device_kind)"],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0 and "UP" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print(json.dumps({
                "metric": "e2e_camera_loop_hz", "value": 0.0, "unit": "Hz",
                "vs_baseline": 0.0,
                "extra": {"error": "device discovery unreachable "
                          f"(tunnel down?) after {max_wait_s}s, "
                          f"{attempt} probes"},
            }))
            raise SystemExit(1)
        time.sleep(30)


def main():
    import os

    _wait_for_device()

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

    from msckf_tpu import reference_experiment_config
    from msckf_tpu.data.synthetic import generate_circle_sequence

    seq = generate_circle_sequence(rng=np.random.default_rng(0))

    # (3) measured first: per-frame XFeat latency inflates ~100x when timed
    # after the filter benches in the same process (dispatch-queue/tunnel
    # state poisoning; standalone 0.10 ms vs 40 ms after) — order matters.
    xfeat_dt, xfeat_flops = bench_xfeat(jax, jnp, top_k=300)

    # (1) round-1 configuration: capacities sized to the sequence (validated:
    # zero overflow, identical trajectory vs f_max=512). desc_dim 16 covers
    # the synthetic 10-d descriptors.
    # gain_solver="ns": Newton-Schulz matmuls for the correction solve beat
    # the serialized LU custom call on-chip (scripts/probe_solve.py, v5e:
    # small 1424->1660 Hz, full 646->688 Hz); golden-trace parity for all
    # three variants is pinned by tests/test_parity_fuzz.py.
    cfg_small = reference_experiment_config(
        dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
        gain_solver="ns",
    )
    small_hz, small_flops = bench_filter(jax, jnp, cfg_small, seq)

    # (2) reference-shaped capacities: room for 300 extracted keypoints,
    # 64-d descriptors, the default track budget (`config.py` defaults).
    cfg_full = reference_experiment_config(dtype="float32", gain_solver="ns")
    full_hz, full_flops = bench_filter(jax, jnp, cfg_full, seq)

    # (4) pure propagation rate (BASELINE config 1; reference ~171 Hz with a
    # 5 ms sleep inflating it, ~0.85 ms true compute -> ~1.2 kHz equivalent)
    cfg_imu = reference_experiment_config(
        dtype="float32", only_imu=True, f_max=16, u_max=8, k_max=16, desc_dim=16
    )
    imu_hz, _ = bench_filter(jax, jnp, cfg_imu, seq)
    imu_steps = imu_hz * 10.0  # 10 IMU ticks per camera-frame block
    e2e_dt = xfeat_dt + 1.0 / full_hz
    e2e_hz = 1.0 / e2e_dt

    # MFU estimate for the end-to-end loop
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_FLOPS.get(kind, 197e12)
    flops_per_frame = xfeat_flops + full_flops
    mfu = flops_per_frame / e2e_dt / peak * 100.0

    # (5) batched axis (VERDICT r2 #4): aggregate camera-updates/s and
    # utilization of the vmapped multi-trajectory filter at batch 32 on this
    # chip — the design's actual MFU story
    cfg_batch = reference_experiment_config(
        dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16
    )
    batched_agg_hz, batched_flops, batched_dt = bench_batched(
        jax, jnp, cfg_batch, seq, batch=32
    )
    batched_mfu = batched_flops / batched_dt / peak * 100.0

    print(
        json.dumps(
            {
                "metric": "e2e_camera_loop_hz",
                "value": round(e2e_hz, 2),
                "unit": "Hz",
                "vs_baseline": round(e2e_hz / BASELINE_CAMERA_HZ, 2),
                "extra": {
                    "filter_full_hz": round(full_hz, 2),
                    "filter_small_hz": round(small_hz, 2),
                    "imu_only_steps_per_s": round(imu_steps, 0),
                    "xfeat_ms_per_frame": round(xfeat_dt * 1e3, 3),
                    "mfu_pct": round(mfu, 4),
                    "flops_per_frame": int(flops_per_frame),
                    "batched_agg_hz": round(batched_agg_hz, 1),
                    "batched_mfu_pct": round(batched_mfu, 4),
                    "device_kind": kind,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
