"""Two-process multi-host demo/fixture for the batched filter.

Runs the REAL multi-process path (`parallel/multihost.py`) on CPU: each
process contributes its local slice of the trajectory batch, the jitted
batched scan executes SPMD over the global ('data',) mesh, and each process
prints its local shard of the final positions. This is the same program a
TPU pod slice runs (reference capability: none — the reference is strictly
single-sequence, SURVEY.md §2; this is the TPU build's scale-out axis).

Launched by tests/test_multihost.py as two subprocesses; manual use:

    python scripts/multihost_demo.py --coordinator 127.0.0.1:9911 \
        --num_processes 2 --process_id 0 &
    python scripts/multihost_demo.py --coordinator 127.0.0.1:9911 \
        --num_processes 2 --process_id 1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--ticks", type=int, default=40)
    args = ap.parse_args(argv)

    import jax

    # force CPU before any device/distributed query (the axon TPU platform
    # is pinned in this environment's JAX_PLATFORMS and its discovery RPC
    # needs the tunnel; the demo is backend-agnostic)
    jax.config.update("jax_platforms", "cpu")

    from msckf_tpu.parallel import multihost as mh

    ok = mh.init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert ok and jax.process_count() == args.num_processes, (
        f"distributed init failed: process_count={jax.process_count()}"
    )

    import numpy as np

    from msckf_tpu.config import reference_experiment_config
    from msckf_tpu.data.stream import build_stream
    from msckf_tpu.data.synthetic import generate_circle_sequence
    from msckf_tpu.parallel.batched import batched_initial_state

    cfg = reference_experiment_config(
        dtype="float32", f_max=32, u_max=8, k_max=32, desc_dim=10,
        n_cam_slots=6, max_camera_states=4, m_max=6,
    )
    seq = generate_circle_sequence(
        rng=np.random.default_rng(0), n_world_points=40, desc_dim=10
    )
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
        max_ticks=args.ticks,
    )

    mesh = mh.global_data_mesh()
    n_global = jax.device_count()
    start, per = mh.local_batch_slice(n_global)

    # every trajectory is the same stream here (content equality is what the
    # test asserts across process layouts); real runs feed per-trajectory data
    states_local = jax.device_get(batched_initial_state(cfg, per, R_init=st.R_init))
    rep = lambda x: np.broadcast_to(np.asarray(x), (per,) + np.asarray(x).shape)
    prefix_local = {k: rep(v) for k, v in st.prefix.items()}
    frames_local = {k: rep(v) for k, v in st.frames.items()}

    states = mh.shard_global_batch(states_local, mesh)
    prefix = mh.shard_global_batch(prefix_local, mesh)
    frames = mh.shard_global_batch(frames_local, mesh)

    run = mh.multihost_run_sequence(cfg, mesh)
    final, _, _ = run(states, prefix, frames)
    jax.block_until_ready(final.imu.p_WI)

    # each process reports its addressable rows of the global result
    rows = sorted(
        (s.index[0].start or 0, np.asarray(s.data))
        for s in final.imu.p_WI.addressable_shards
    )
    local = np.concatenate([r for _, r in rows], axis=0)
    print(
        f"MULTIHOST process {jax.process_index()}/{jax.process_count()} "
        f"devices={n_global} local_rows={local.shape[0]} "
        f"p_WI={np.array2string(local[0], precision=6, floatmode='fixed')}",
        flush=True,
    )


if __name__ == "__main__":
    main()
