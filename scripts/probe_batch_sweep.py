"""On-chip probe: batched aggregate throughput vs batch size (round 4).

If the vmapped frame step is dominated by per-op fixed overhead (dispatch,
relayouts, serialized custom-call segments) rather than by per-trajectory
content, the step time grows sublinearly with the batch and aggregate Hz
keeps climbing — the cheapest route to the 5x-single target. This sweeps
batch in {16, 32, 64, 128, 256} on the small-shape config, same fixture as
scripts/probe_batched_opts.py.

Usage: python scripts/probe_batch_sweep.py [b1 b2 ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from msckf_tpu import reference_experiment_config
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.parallel.batched import batched_initial_state, batched_run_sequence

BATCHES = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128, 256]

seq = generate_circle_sequence(rng=np.random.default_rng(0))
# correction_dtype="float32": same short-sequence island opt-out as the
# bench's single-sequence configs — without it the round-5 batched_dispatch
# keeps the compensated island under vmap (float64 -> compensated+ns), a
# much bigger program than the r4 number this sweep extends.
base = reference_experiment_config(
    dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
    correction_dtype="float32",
)
st = build_stream(
    base, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
    seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
)
std = to_device(st, base)
n_frames = std.frames["imu_ts"].shape[0]

for B in BATCHES:
    states = batched_initial_state(base, B, R_init=std.R_init)
    rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    prefix = {k: rep(v) for k, v in std.prefix.items()}
    frames = {k: rep(v) for k, v in std.frames.items()}

    def run(states, prefix, frames):
        final, _, _ = batched_run_sequence(
            base, states, prefix, frames, assume_camera=True
        )
        return (
            jnp.max(jnp.linalg.norm(final.imu.p_WI, axis=-1)),
            jnp.sum(final.diag.n_track_overflow + final.diag.n_update_overflow),
        )

    t0 = time.perf_counter()
    compiled = jax.jit(run).lower(states, prefix, frames).compile()
    ct = time.perf_counter() - t0
    err, ovf = jax.device_get(compiled(states, prefix, frames))
    passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            out = jax.device_get(compiled(states, prefix, frames))
        passes.append((time.perf_counter() - t0) / 2)
    dt = sorted(passes)[1]
    print(
        f"B={B:<4} compile {ct:5.0f}s  {B * n_frames / dt:8.0f} agg Hz  "
        f"{1e3 * dt / n_frames:7.2f} ms/frame-batch  "
        f"{1e3 * dt / (n_frames * B):6.3f} ms/frame-traj  "
        f"|p|={float(err):.3f} ovf={int(ovf)}",
        flush=True,
    )
