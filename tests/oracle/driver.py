"""Drive the NumPy oracle through the reference's sequential sensor loop,
including the buffer-then-replay IMU bootstrap (`MSCKF.py:135-145`,
`main.py:261-305`) — the behavior the TPU build restructures into
pre-initialization. Golden-trace parity between this loop and the scan
therefore also validates that restructure."""

from __future__ import annotations

import numpy as np

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.data.stream import gravity_align_numpy
from tests.oracle.numpy_msckf import OracleMSCKF


def run_oracle_loop(
    cfg: MSCKFConfig,
    imu_ts: np.ndarray,
    imu_gyro: np.ndarray,
    imu_acc: np.ndarray,
    cam_ticks: np.ndarray,  # all camera frames (frame 0 included, never consumed)
    cam_kps,
    cam_descs,
    cam_scores,
    max_ticks: int,
):
    o = OracleMSCKF(cfg, R_init=np.eye(3))
    cam_tick_to_frame = {int(t): j for j, t in enumerate(cam_ticks)}

    buffer: list[tuple] = []
    first_arrived = False
    initialized = False

    out = dict(p=[], v=[], R=[], sig_rot=[], sig_pos=[], n_cams=[], n_feats=[])
    T = min(max_ticks, len(imu_ts))
    for i in range(T):
        meas = (float(imu_ts[i]), imu_gyro[i].copy(), imu_acc[i].copy())
        # imu_callback (`MSCKF.py:135-145`)
        if not first_arrived:
            buffer.append(meas)
        else:
            if not initialized:
                mean_acc = np.mean([m[2] for m in buffer], axis=0)
                o.R = gravity_align_numpy(mean_acc, cfg.gravity_np)
                initialized = True
                for m in buffer:
                    o.process_imu(*m)
            o.process_imu(*meas)
        # feature_callback on matched ticks, skipping camera frame 0
        # (`main.py:252,279`)
        j = cam_tick_to_frame.get(i)
        if j is not None and j >= 1:
            if not first_arrived:
                first_arrived = True  # `MSCKF.py:149-150`: set flag, return
            elif initialized:
                o.feature_callback(
                    np.asarray(cam_kps[j], dtype=float),
                    np.asarray(cam_descs[j], dtype=float),
                    np.asarray(cam_scores[j], dtype=float),
                )
        out["p"].append(o.p.copy())
        out["v"].append(o.v.copy())
        out["R"].append(o.R.copy())
        out["sig_rot"].append(np.diag(o.P[0:3, 0:3]).copy())
        out["sig_pos"].append(np.diag(o.P[12:15, 12:15]).copy())
        out["n_cams"].append(len(o.cams))
        out["n_feats"].append(len(o.feats))
    return o, {k: np.asarray(v) for k, v in out.items()}
