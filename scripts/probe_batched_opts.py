"""On-chip probe: batched-path config sweep at batch 32 (round 4).

Questions this answers (VERDICT r4 items 1+3):
  * cost of the compensated correction island (now the TPU default via the
    float64 safe-degrade) on the batched and single paths
  * prune_path "cond" vs "masked" under vmap (cond runs BOTH branches and
    select-copies every carried leaf per frame — profile shows 144
    copies/frame, 1.24 ms)
  * Newton-Schulz iteration count sensitivity

Usage: python scripts/probe_batched_opts.py [batch]
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

import dataclasses

from msckf_tpu import reference_experiment_config
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.parallel.batched import batched_initial_state, batched_run_sequence

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32

seq = generate_circle_sequence(rng=np.random.default_rng(0))
base = reference_experiment_config(
    dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16
)
st = build_stream(
    base, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
    seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
)
std = to_device(st, base)
n_frames = std.frames["imu_ts"].shape[0]

states0 = batched_initial_state(base, BATCH, R_init=std.R_init)
rep = lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape)
prefix = {k: rep(v) for k, v in std.prefix.items()}
frames = {k: rep(v) for k, v in std.frames.items()}


def probe(label, assume_camera=False, **kw):
    cfg = dataclasses.replace(base, **kw)
    states = jax.tree.map(lambda x: x, states0)

    def run(states, prefix, frames):
        final, _, _ = batched_run_sequence(
            cfg, states, prefix, frames, assume_camera=assume_camera
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
        for _ in range(3):
            out = jax.device_get(compiled(states, prefix, frames))
        passes.append((time.perf_counter() - t0) / 3)
    dt = sorted(passes)[1]
    print(
        f"{label:<42} compile {ct:5.0f}s  {BATCH * n_frames / dt:7.0f} agg Hz  "
        f"{1e3 * dt / n_frames:7.2f} ms/frame-batch  |p|={float(err):.3f} ovf={int(ovf)}",
        flush=True,
    )


# order: small/cheap first is irrelevant here (all same program size);
# baseline first for continuity with BENCH_r03
# batched_dispatch degrades the island to plain f32 under vmap (crash +
# 309 ms/frame serialized LU, see parallel/batched.py), so "baseline" here
# IS the round-3 behavior.
probe("baseline (island auto-degraded)")
probe("masked prune", prune_path="masked")
probe("masked prune + ns8", prune_path="masked", solver_ns_iters=8)
probe("masked + assume_camera", prune_path="masked", assume_camera=True)
probe(
    "masked + assume_camera + ns8",
    prune_path="masked", assume_camera=True, solver_ns_iters=8,
)
probe(
    "masked + assume_camera + fused update",
    prune_path="masked", assume_camera=True, update_kernel="fused",
)
