"""Measure prune_path='cond' vs 'masked' on the real chip: single-sequence
full/small shapes and the batch-32 aggregate (run after the tunnel is up).

Usage: python scripts/probe_prune.py [--batch-only]
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
from msckf_tpu.parallel.batched import batched_initial_state, batched_run_sequence

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
    jax.device_get(compiled(state, std.prefix, std.frames))
    passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            jax.device_get(compiled(state, std.prefix, std.frames))
        passes.append((time.perf_counter() - t0) / 5)
    print(f"{label}: {n/sorted(passes)[1]:.1f} Hz", flush=True)

def batched(cfg, label, batch=32):
    st = build_stream(cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
                      seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores)
    std = to_device(st, cfg)
    n = std.frames["imu_ts"].shape[0]
    states = batched_initial_state(cfg, batch, R_init=std.R_init)
    rep = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    prefix = {k: rep(v) for k, v in std.prefix.items()}
    frames = {k: rep(v) for k, v in std.frames.items()}
    def run(states, prefix, frames):
        final, _, _ = batched_run_sequence(cfg, states, prefix, frames)
        return jnp.max(jnp.linalg.norm(final.imu.p_WI, axis=-1))
    compiled = jax.jit(run).lower(states, prefix, frames).compile()
    jax.device_get(compiled(states, prefix, frames))
    passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            jax.device_get(compiled(states, prefix, frames))
        passes.append((time.perf_counter() - t0) / 3)
    print(f"{label}: {batch*n/sorted(passes)[1]:.0f} agg Hz", flush=True)

batch_only = "--batch-only" in sys.argv
for pp in ("cond", "masked"):
    if not batch_only:
        single(reference_experiment_config(
            dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
            prune_path=pp), f"small {pp}")
        single(reference_experiment_config(dtype="float32", prune_path=pp),
               f"full {pp}")
    batched(reference_experiment_config(
        dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
        prune_path=pp), f"batch32 {pp}")
