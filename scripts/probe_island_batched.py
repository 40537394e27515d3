"""On-chip artifact: the compensated correction island under vmap at batch 32.

VERDICT r4 missing #3 / next #5: round 4 degraded the island to plain f32
under vmap because refined_solve's LU custom calls serialized across the
batch (309 ms/frame) and crashed the TPU worker. Round 5's island_solver="ns"
(custom-call-free NS-preconditioned double-word solve) + ozaki_matmul make
the island vmappable; this probe runs the full batch-32 sequence ON CHIP with
the island ACTIVE (batched_dispatch keeps it) and reports throughput + final
error, proving the config that used to crash now runs.

Usage: python scripts/probe_island_batched.py [batch]
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
from msckf_tpu.parallel.batched import (
    batched_dispatch, batched_initial_state, batched_run_sequence,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32

seq = generate_circle_sequence(rng=np.random.default_rng(0))
base = reference_experiment_config(
    dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
    correction_dtype="compensated",
)
eff = batched_dispatch(base)
print(f"dispatch: correction_dtype={eff.correction_dtype} "
      f"island_solver={eff.island_solver} (island kept: "
      f"{eff.correction_dtype == 'compensated'})", flush=True)

st = build_stream(
    base, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
    seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
)
std = to_device(st, base)
n_frames = std.frames["imu_ts"].shape[0]
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
print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
err, ovf = jax.device_get(compiled(states, prefix, frames))
assert np.isfinite(err), f"island batched run non-finite: {err}"
t0 = time.perf_counter()
out = None
for _ in range(2):
    out = compiled(states, prefix, frames)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 2
print(
    f"ISLAND-ON batch={B}: {B * n_frames / dt:.0f} agg Hz  "
    f"{1e3 * dt / n_frames:.2f} ms/frame-batch  |p|={float(err):.3f} "
    f"ovf={int(ovf)}  -> no crash, island active under vmap",
    flush=True,
)
