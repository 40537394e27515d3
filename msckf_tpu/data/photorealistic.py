"""Synthetic-IMU generation from ground-truth trajectories (TartanAir /
PeringLab formats).

Rebuilds `/root/reference/dataset/tools/dataset_generators/photorealistic_generator.py`:
re-frame camera-frame GT poses into the IMU/world frame, 10x temporal
upsampling (lerp positions, Slerp rotations), accel/gyro by finite differences
and the quaternion-rate formula, white noise plus random-walk biases, and the
camera.csv / imu(.gt).csv / transforms_gt.csv outputs (20 Hz camera with a
3-frame stationary prefix, ~200 Hz IMU). Offline host tooling — NumPy,
vectorized where the math allows.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from scipy.spatial.transform import Rotation, Slerp

from msckf_tpu.data.synthetic import analytic_imu

TRAJECTORY_FORMATS = {
    # columns, separator (`photorealistic_generator.py:22-27`)
    "peringlab": (["timestamp", "x", "y", "z", "qw", "qx", "qy", "qz"], ","),
    "tartanair": (["x", "y", "z", "qx", "qy", "qz", "qw"], " "),
}


def load_raw_trajectory(path: str, source: str) -> tuple[np.ndarray, np.ndarray]:
    """(R (T,3,3), t (T,3)) camera-frame poses from a raw trajectory file."""
    cols, sep = TRAJECTORY_FORMATS[source]
    df = pd.read_csv(path, sep=sep, header=0)
    df.columns = cols
    q = df[["qx", "qy", "qz", "qw"]].to_numpy(dtype=float)
    t = df[["x", "y", "z"]].to_numpy(dtype=float)
    return Rotation.from_quat(q).as_matrix(), t


def reframe_to_world(R_cam: np.ndarray, t_cam: np.ndarray, R_WC: np.ndarray):
    """T_W0_Wi = (T_W_C0 T_WC^-1)^-1 T_W_Ci T_WC^-1
    (`photorealistic_generator.py:69-108`), with a 3-pose identity prefix."""
    T = len(t_cam)
    T_WC = np.eye(4)
    T_WC[:3, :3] = R_WC
    T_WC_inv = np.linalg.inv(T_WC)

    def mat(i):
        M = np.eye(4)
        M[:3, :3] = R_cam[i]
        M[:3, 3] = t_cam[i]
        return M

    T_W_W0 = mat(0) @ T_WC_inv
    T_W_W0_inv = np.linalg.inv(T_W_W0)
    out_R = [np.eye(3)] * 3
    out_t = [np.zeros(3)] * 3
    for i in range(1, T):
        M = T_W_W0_inv @ (mat(i) @ T_WC_inv)
        out_R.append(M[:3, :3])
        out_t.append(M[:3, 3])
    return np.stack(out_R), np.stack(out_t)


def upsample_poses(R: np.ndarray, t: np.ndarray, ts: np.ndarray, factor: int = 10):
    """Lerp positions + Slerp rotations, ``factor`` samples per GT step
    (`photorealistic_generator.py:154-169`). Keeps the first sample of each
    interval only once."""
    out_R = [R[0]]
    out_t = [t[0]]
    out_ts = [ts[0]]
    for i in range(1, len(t)):
        u = np.linspace(0.0, 1.0, factor)
        pos = np.outer(1 - u, t[i - 1]) + np.outer(u, t[i])
        slerp = Slerp([0.0, 1.0], Rotation.from_matrix(np.stack([R[i - 1], R[i]])))
        rots = slerp(u).as_matrix()
        tss = (1 - u) * ts[i - 1] + u * ts[i]
        out_R.extend(rots[1:])
        out_t.extend(pos[1:])
        out_ts.extend(tss[1:])
    return np.stack(out_R), np.stack(out_t), np.asarray(out_ts)


def generate_photorealistic(
    source: str,
    sequence_dir: str,
    accelerometer_noise_density: float = 0.01,
    gyroscope_noise_density: float = 0.001,
    accelerometer_random_walk: float = 0.001,
    gyroscope_random_walk: float = 0.0001,
    R_WC: np.ndarray | None = None,
    camera_dt: float = 0.05,
    upsample: int = 10,
    gravity: np.ndarray | None = None,
    rng: np.random.Generator | None = None,
    write: bool = True,
):
    """Process one sequence directory (with ``trajectory.csv`` and ``cam/``)
    into camera.csv, imu_gt.csv, imu.csv, transforms_gt.csv
    (`photorealistic_generator.py:45-225`). Returns the generated arrays."""
    rng = rng or np.random.default_rng(42)
    if R_WC is None:
        R_WC = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    if gravity is None:
        gravity = np.array([0.0, 0.0, -9.81])

    R_cam, t_cam = load_raw_trajectory(f"{sequence_dir}/trajectory.csv", source)
    R_gt, t_gt = reframe_to_world(R_cam, t_cam, R_WC)
    gt_ts = np.arange(len(t_gt)) * camera_dt  # 3-frame prefix then 20 Hz

    R_up, t_up, ts_up = upsample_poses(R_gt, t_gt, gt_ts, factor=upsample)
    # linspace(0, 1, factor) spans each camera interval with factor-1 steps
    # (`photorealistic_generator.py:154-171`), so the IMU tick is
    # camera_dt / (factor - 1), not camera_dt / factor.
    dt = camera_dt / (upsample - 1)
    gyro_gt, acc_gt = analytic_imu(R_up, t_up, dt, gravity)

    T = len(ts_up)
    acc = acc_gt + accelerometer_noise_density * rng.normal(size=(T, 3))
    gyro = gyro_gt + gyroscope_noise_density * rng.normal(size=(T, 3))
    ba = np.cumsum(accelerometer_random_walk * rng.normal(size=(T, 3)), axis=0)
    bg = np.cumsum(gyroscope_random_walk * rng.normal(size=(T, 3)), axis=0)
    acc = acc + ba
    gyro = gyro + bg
    acc[0] = 0
    gyro[0] = 0

    if write:
        def imu_df(g, a):
            return pd.DataFrame(
                {
                    "timestamp": ts_up,
                    "wx": g[:, 0], "wy": g[:, 1], "wz": g[:, 2],
                    "ax": a[:, 0], "ay": a[:, 1], "az": a[:, 2],
                }
            )

        imu_df(gyro_gt, acc_gt).to_csv(f"{sequence_dir}/imu_gt.csv", index=False)
        imu_df(gyro, acc).to_csv(f"{sequence_dir}/imu.csv", index=False)
        tf = {"timestamp": ts_up}
        for r in range(3):
            for c in range(3):
                tf[f"T{r}{c}"] = R_up[:, r, c]
            tf[f"T{r}3"] = t_up[:, r]
        cols = ["timestamp"] + [f"T{r}{c}" for r in range(3) for c in range(4)]
        pd.DataFrame(tf)[cols].to_csv(f"{sequence_dir}/transforms_gt.csv", index=False)

        cam_dir = f"{sequence_dir}/cam"
        if os.path.isdir(cam_dir):
            paths = sorted(os.listdir(cam_dir))
            rows = [
                {"timestamp": i * camera_dt, "image_path": f"{cam_dir}/{paths[min(i, len(paths) - 1)]}"}
                for i in range(3)
            ]
            rows += [
                {"timestamp": i * camera_dt + rows[2]["timestamp"], "image_path": f"{cam_dir}/{p}"}
                for i, p in enumerate(paths)
                if i >= 1
            ]
            pd.DataFrame(rows).to_csv(f"{sequence_dir}/camera.csv", index=False)

    return dict(
        timestamps=ts_up, poses_R=R_up, poses_t=t_up,
        imu_gyro_gt=gyro_gt, imu_acc_gt=acc_gt, imu_gyro=gyro, imu_acc=acc,
    )
