"""Multi-host scaffold on the single-process virtual-device mesh: the same
code paths (global mesh, process-local batch assembly, SPMD run) that a pod
slice executes, degraded to process_count == 1."""

import numpy as np

import jax
import jax.numpy as jnp

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.data.stream import build_stream
from msckf_tpu.parallel.batched import batched_initial_state
from msckf_tpu.parallel.multihost import (
    global_data_mesh,
    init_distributed,
    local_batch_slice,
    multihost_run_sequence,
    shard_global_batch,
)


def test_multihost_single_process_dp():
    assert init_distributed() is False  # plain host: stays single-process
    start, per = local_batch_slice(8)
    assert (start, per) == (0, 8)

    from msckf_tpu.data.synthetic import generate_circle_sequence

    cfg = reference_experiment_config(
        dtype="float32", f_max=64, u_max=16, k_max=64, desc_dim=16,
        use_pallas=False,
    )
    B = 8
    seqs = [generate_circle_sequence(rng=np.random.default_rng(b),
                                     n_world_points=60) for b in range(B)]
    streams = [
        build_stream(cfg, s.timestamps, s.imu_gyro, s.imu_acc,
                     s.cam_frame_ticks, s.cam_keypoints, s.cam_descriptors,
                     s.cam_scores, max_ticks=200)
        for s in seqs
    ]

    def stack(dicts):
        return {k: np.stack([np.asarray(d[k]) for d in dicts]) for k in dicts[0]}

    def cast(d):
        return {k: (v.astype(np.float32) if v.dtype.kind == "f" else v)
                for k, v in d.items()}

    mesh = global_data_mesh()
    prefix = shard_global_batch(cast(stack([s.prefix for s in streams])), mesh)
    frames = shard_global_batch(cast(stack([s.frames for s in streams])), mesh)
    states = batched_initial_state(
        cfg, B, R_init=np.stack([s.R_init for s in streams])
    )
    states = shard_global_batch(jax.device_get(states), mesh)

    run = multihost_run_sequence(cfg, mesh)
    final, pre_out, fr_out = run(states, prefix, frames)
    p = np.asarray(jax.device_get(final.imu.p_WI))
    assert p.shape == (B, 3)
    errs = [
        np.linalg.norm(p[b] - seqs[b].poses_t[streams[b].n_ticks - 1])
        for b in range(B)
    ]
    assert np.all(np.isfinite(errs))
    assert max(errs) < 1.0


def test_two_process_distributed_cpu():
    """REAL multi-process execution: two jax.distributed processes on CPU
    run the SPMD batched filter over a 2-device global mesh
    (`scripts/multihost_demo.py` — the same program a pod slice runs). Both
    processes must report the same final position for their (identical)
    local trajectory, matching the single-process filter."""
    import os
    import re
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "XLA_FLAGS": ""}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "scripts", "multihost_demo.py"),
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"demo process failed:\n{out[-2000:]}"

    vals = []
    for out in outs:
        m = re.search(r"MULTIHOST process (\d)/2 devices=2 local_rows=1 "
                      r"p_WI=\[([^\]]+)\]", out)
        assert m, f"no MULTIHOST line in:\n{out[-2000:]}"
        vals.append(np.fromstring(m.group(2), sep=" "))
    # identical input trajectories -> identical rows across processes
    np.testing.assert_allclose(vals[0], vals[1], rtol=0, atol=0)
    assert np.all(np.isfinite(vals[0]))
