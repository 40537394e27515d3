"""Measure the unbatched correction-solve variants on the real chip:
gain_solver in {lu, ns, chol} on the full- and small-shape single-sequence
filter (run after the tunnel is up). The LU custom call was ~90 us/frame in
round-2 traces (docs/PERF.md); "ns" trades it for MXU matmuls, "chol" for
one SPD Cholesky custom call (ops/solve.py).

Usage: python scripts/probe_solve.py
"""
import os, sys, time, numpy as np, jax, jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from msckf_tpu import reference_experiment_config
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.filter.msckf import make_initial_state, run_sequence

seq = generate_circle_sequence(rng=np.random.default_rng(0))

def single(cfg, label):
    st = build_stream(cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
                      seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores)
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    n = std.frames["imu_ts"].shape[0]
    def run(state, prefix, frames):
        final, _, _ = run_sequence(cfg, state, prefix, frames, assume_camera=True)
        return jnp.linalg.norm(final.imu.p_WI), final.diag.n_update_overflow
    compiled = jax.jit(run).lower(state, std.prefix, std.frames).compile()
    nrm, ovf = jax.device_get(compiled(state, std.prefix, std.frames))
    passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            jax.device_get(compiled(state, std.prefix, std.frames))
        passes.append((time.perf_counter() - t0) / 5)
    print(f"{label}: {n/sorted(passes)[1]:.1f} Hz  (|p|={nrm:.4f} ovf={ovf})",
          flush=True)

for gs in ("lu", "ns", "chol"):
    single(reference_experiment_config(
        dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
        gain_solver=gs), f"small {gs}")
    single(reference_experiment_config(dtype="float32", gain_solver=gs),
           f"full {gs}")
