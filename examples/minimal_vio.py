"""Minimal end-to-end VIO example.

Generates a synthetic sequence, runs the whole filter as one on-device scan,
prints trajectory accuracy and consistency, and (optionally) writes plots.

    python examples/minimal_vio.py [--ticks 2400] [--dtype float32]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

# runnable as `python examples/minimal_vio.py` from anywhere, without
# PYTHONPATH (which shadows the environment's TPU plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.utils.consistency import consistency_report
from msckf_tpu.utils.metrics import compute_metrics, results_report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=2400)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    seq = generate_circle_sequence(rng=np.random.default_rng(42))
    cfg = reference_experiment_config(
        dtype=args.dtype, f_max=256, u_max=48, k_max=256, desc_dim=16
    )
    stream = to_device(
        build_stream(
            cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
            seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
            max_ticks=args.ticks,
        ),
        cfg,
    )
    state = make_initial_state(cfg, stream.R_init)
    run = jax.jit(functools.partial(run_sequence, cfg))

    t0 = time.perf_counter()
    final, pre_out, fr_out = run(state, stream.prefix, stream.frames)
    jax.block_until_ready(final.imu.p_WI)
    print(f"compile + first run: {time.perf_counter() - t0:.1f} s")

    def flat(name):
        a = np.asarray(getattr(pre_out, name))
        b = np.asarray(getattr(fr_out, name))
        return np.concatenate([a, b.reshape((-1,) + b.shape[2:])])

    valid = flat("valid").astype(bool)
    est_R, est_t = flat("R_WI")[valid], flat("p_WI")[valid]
    s_rot, s_pos = flat("sigma_rot")[valid], flat("sigma_pos")[valid]
    T = len(est_t)
    m = compute_metrics(seq.poses_R[:T], seq.poses_t[:T], est_R, est_t, s_rot, s_pos)
    print(results_report(m))
    print(consistency_report(seq.poses_R[:T], seq.poses_t[:T], est_R, est_t, s_rot, s_pos))
    err = np.linalg.norm(est_t - seq.poses_t[:T], axis=-1)
    print(f"final drift: {err[-1]*100:.1f} cm over a ~{np.sum(np.linalg.norm(np.diff(seq.poses_t[:T],axis=0),axis=1)):.1f} m path")


if __name__ == "__main__":
    main()
