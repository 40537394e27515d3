"""On-chip probe: round-5 batched-path content cuts at batch 32/128.

The round-5 sweep (scripts/probe_batch_sweep.py) showed the vmapped frame
step scales LINEARLY in batch (0.42-0.45 ms/frame-trajectory flat, agg
saturating ~2.4 kHz) — content-bound, not dispatch-bound. The round-5
profile (scripts/profile_attrib.py batched) attributed the content:
~2.6 ms/frame of gating-kernel grid overhead, ~2 ms of batch-minor layout
copies around the dense Hcam/H_t build, per-obs einsums, obs compaction.

Configs probed here:
  base      — current code (includes the pattern-matmul Hcam build)
  ns        — gating_solver="ns" (batched Newton-Schulz gamma instead of
              the flattened-batch gating kernel)
  ns+masked — + prune_path="masked"

Usage: python scripts/probe_batched_r5.py [b1 b2 ...]
"""

import dataclasses
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

BATCHES = [int(a) for a in sys.argv[1:]] or [32, 128]

seq = generate_circle_sequence(rng=np.random.default_rng(0))
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

CONFIGS = [
    ("base", {}),
    ("ns16", {"gating_solver": "ns"}),
    ("ns12", {"gating_solver": "ns", "gating_ns_iters": 12}),
]

for B in BATCHES:
    states = batched_initial_state(base, B, R_init=std.R_init)
    rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    prefix = {k: rep(v) for k, v in std.prefix.items()}
    frames = {k: rep(v) for k, v in std.frames.items()}

    for label, kw in CONFIGS:
        cfg = dataclasses.replace(base, **kw)

        def run(states, prefix, frames):
            final, _, _ = batched_run_sequence(
                cfg, states, prefix, frames, assume_camera=True
            )
            return (
                jnp.max(jnp.linalg.norm(final.imu.p_WI, axis=-1)),
                jnp.sum(final.diag.n_track_overflow + final.diag.n_update_overflow),
                jnp.sum(final.diag.n_gating_rejected),
            )

        t0 = time.perf_counter()
        compiled = jax.jit(run).lower(states, prefix, frames).compile()
        ct = time.perf_counter() - t0
        err, ovf, nrej = jax.device_get(compiled(states, prefix, frames))
        passes = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = jax.device_get(compiled(states, prefix, frames))
            passes.append((time.perf_counter() - t0) / 2)
        dt = sorted(passes)[1]
        print(
            f"B={B:<4} {label:10s} compile {ct:5.0f}s  "
            f"{B * n_frames / dt:8.0f} agg Hz  "
            f"{1e3 * dt / n_frames:7.2f} ms/frame-batch  "
            f"|p|={float(err):.3f} ovf={int(ovf)} rej={int(nrej)}",
            flush=True,
        )
