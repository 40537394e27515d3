import os, time, numpy as np, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from msckf_tpu import reference_experiment_config
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.parallel.batched import batched_initial_state, batched_run_sequence

seq = generate_circle_sequence(rng=np.random.default_rng(0))
cfg = reference_experiment_config(dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16)
st = build_stream(cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
                  seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores)
std = to_device(st, cfg)
n_frames = std.frames["imu_ts"].shape[0]
for batch in (1, 4, 32):
    states = batched_initial_state(cfg, batch, R_init=std.R_init)
    rep = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    prefix = {k: rep(v) for k, v in std.prefix.items()}
    frames = {k: rep(v) for k, v in std.frames.items()}
    def run(states, prefix, frames):
        final, _, _ = batched_run_sequence(cfg, states, prefix, frames)
        return jnp.max(jnp.linalg.norm(final.imu.p_WI, axis=-1)), jnp.sum(final.diag.n_track_overflow)
    t0 = time.perf_counter()
    compiled = jax.jit(run).lower(states, prefix, frames).compile()
    ct = time.perf_counter() - t0
    jax.device_get(compiled(states, prefix, frames))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.device_get(compiled(states, prefix, frames))
    dt = (time.perf_counter() - t0) / 3
    print(f"batch {batch}: compile {ct:.0f}s run {dt:.3f}s -> {batch*n_frames/dt:.0f} agg Hz, {1e3*dt/n_frames:.2f} ms/frame-batch", flush=True)
