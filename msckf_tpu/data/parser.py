"""CSV dataset parser, format-compatible with the reference layout.

Rebuilds `/root/reference/dataset/tools/parser.py`: reads ``transforms_gt.csv``
(timestamp + flattened 3x4 pose), ``imu.csv`` / ``imu_gt.csv``
(timestamp, wx..az), ``camera.csv`` (timestamp, image_path) with optional
timestamp windowing, per-frame synthetic measurement CSVs
(x, y, score, descriptor_0..9), and ``world_points.csv``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


class Parser:
    def __init__(
        self,
        source: str,
        sequence: str,
        base_path: str = "./data",
        gt: bool = True,
        initial_time_stamp: float = -1,
        final_time_stamp: float = -1,
    ):
        self.root = f"{base_path}/{source}/{sequence}/"
        self.source = source
        self.gt = gt
        self.t0 = initial_time_stamp
        self.t1 = final_time_stamp
        self.transforms_file = self.root + "transforms_gt.csv"
        self.imu_file = self.root + ("imu_gt.csv" if gt else "imu.csv")
        if source == "synthetic":
            self.cam_file = self.root + ("camera_gt.csv" if gt else "camera.csv")
        else:
            self.cam_file = self.root + "camera.csv"

    def _window(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.t0 != -1:
            df = df[df["timestamp"] >= self.t0]
        if self.t1 != -1:
            df = df[df["timestamp"] <= self.t1]
        return df.reset_index(drop=True)

    def extract_gt_trajectory(self) -> pd.DataFrame:
        return self._window(pd.read_csv(self.transforms_file))

    def extract_imu(self) -> pd.DataFrame:
        return self._window(pd.read_csv(self.imu_file))

    def extract_images(self) -> pd.DataFrame:
        return self._window(pd.read_csv(self.cam_file))

    def extract_synthetic_camera_measurements(self, path: str):
        """Per-frame keypoint CSV (columns: timestamp, id, x, y, score,
        descriptor_0..9). Uses the native mmap parser when built — this is
        the per-frame hot path of dataset loading."""
        from msckf_tpu.data import native_io

        if native_io.have_native():
            a = native_io.read_numeric_csv(path)
            # columns: timestamp, id, x, y, score, descriptor_0..
            kp = a[:, 2:4]
            scores = a[:, 4]
            desc = a[:, 5:15]
            return kp, desc, scores
        df = pd.read_csv(path)
        kp = df[["x", "y"]].to_numpy(dtype=float)
        desc = df[[f"descriptor_{i}" for i in range(10)]].to_numpy(dtype=float)
        scores = df["score"].to_numpy(dtype=float)
        return kp, desc, scores

    def extract_gt_world_points(self) -> np.ndarray:
        df = pd.read_csv(self.root + "world_points.csv")
        return df[["x", "y", "z"]].to_numpy(dtype=float)


def read_camera_info(base_path: str, source: str) -> dict | None:
    """Per-dataset camera intrinsics (`/root/reference/main.py:71-79`):
    ``{base}/{source}/camera_info.csv`` with columns fx, fy, px, py, w, h.
    Returns config overrides (K, width, height) or None if the file is
    absent (the reference would crash; the caller decides how loud to be)."""
    path = f"{base_path}/{source}/camera_info.csv"
    if not os.path.exists(path):
        return None
    row = pd.read_csv(path).iloc[0]
    K = (
        (float(row["fx"]), 0.0, float(row["px"])),
        (0.0, float(row["fy"]), float(row["py"])),
        (0.0, 0.0, 1.0),
    )
    return dict(K=K, width=int(row["w"]), height=int(row["h"]))


def gt_trajectory_arrays(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(timestamps, R (T,3,3), t (T,3)) from a transforms_gt DataFrame."""
    ts = df["timestamp"].to_numpy(dtype=float)
    R = np.stack(
        [
            df[["T00", "T01", "T02"]].to_numpy(dtype=float),
            df[["T10", "T11", "T12"]].to_numpy(dtype=float),
            df[["T20", "T21", "T22"]].to_numpy(dtype=float),
        ],
        axis=1,
    )
    t = df[["T03", "T13", "T23"]].to_numpy(dtype=float)
    return ts, R, t


def imu_arrays(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ts = df["timestamp"].to_numpy(dtype=float)
    gyro = df[["wx", "wy", "wz"]].to_numpy(dtype=float)
    acc = df[["ax", "ay", "az"]].to_numpy(dtype=float)
    return ts, gyro, acc


def save_sequence_csv(seq, folder: str) -> None:
    """Write a generated SyntheticSequence in the reference's on-disk layout
    (`synthetic_generator.py:230-323`): transforms_gt/imu_gt/imu/camera CSVs
    plus per-frame keypoint files."""
    os.makedirs(f"{folder}/cam_noisy", exist_ok=True)
    T = len(seq.timestamps)
    tf = {
        "timestamp": seq.timestamps,
        **{
            f"T{r}{c}": seq.poses_R[:, r, c] for r in range(3) for c in range(3)
        },
        "T03": seq.poses_t[:, 0],
        "T13": seq.poses_t[:, 1],
        "T23": seq.poses_t[:, 2],
    }
    cols = ["timestamp"] + [f"T{r}{c}" for r in range(3) for c in range(4)]
    pd.DataFrame(tf)[cols].to_csv(f"{folder}/transforms_gt.csv", index=False)

    for name, g, a in (
        ("imu_gt.csv", seq.imu_gyro_gt, seq.imu_acc_gt),
        ("imu.csv", seq.imu_gyro, seq.imu_acc),
    ):
        pd.DataFrame(
            {
                "timestamp": seq.timestamps,
                "wx": g[:, 0], "wy": g[:, 1], "wz": g[:, 2],
                "ax": a[:, 0], "ay": a[:, 1], "az": a[:, 2],
            }
        ).to_csv(f"{folder}/{name}", index=False)

    cam_rows = []
    for j, tick in enumerate(seq.cam_frame_ticks):
        path = f"{folder}/cam_noisy/{int(tick):05d}.csv"
        cam_rows.append({"timestamp": seq.timestamps[int(tick)], "image_path": path})
        kp, d, s = seq.cam_keypoints[j], seq.cam_descriptors[j], seq.cam_scores[j]
        rows = {
            "timestamp": np.full(len(kp), seq.timestamps[int(tick)]),
            "id": np.arange(len(kp)),
            "x": kp[:, 0],
            "y": kp[:, 1],
            "score": s,
        }
        for i in range(d.shape[1]):
            rows[f"descriptor_{i}"] = d[:, i]
        pd.DataFrame(rows).to_csv(path, index=False)
    pd.DataFrame(cam_rows).to_csv(f"{folder}/camera.csv", index=False)

    wp = {
        "id": np.arange(len(seq.world_points)),
        "x": seq.world_points[:, 0],
        "y": seq.world_points[:, 1],
        "z": seq.world_points[:, 2],
    }
    for i in range(seq.world_descriptors.shape[1]):
        wp[f"descriptor_{i}"] = seq.world_descriptors[:, i]
    pd.DataFrame(wp).to_csv(f"{folder}/world_points.csv", index=False)


def load_imu_batch(paths, threads=None):
    """Load many imu.csv files concurrently through the native thread pool
    (`native/fastcsv.cpp::csv_read_many`) — the host-side feeder for the
    batched multi-sequence runner, where per-file pandas reads serialize on
    the GIL. Returns a list of (ts, gyro, acc) in input order."""
    from msckf_tpu.data.native_io import read_numeric_csvs

    paths = list(paths)
    headers = []
    for p in paths:
        with open(p) as f:
            headers.append([c.strip() for c in f.readline().strip().split(",")])
    bodies = read_numeric_csvs(paths, threads=threads)
    out = []
    for hdr, arr in zip(headers, bodies):
        ix = {name: i for i, name in enumerate(hdr)}
        out.append((
            arr[:, ix["timestamp"]],
            arr[:, [ix["wx"], ix["wy"], ix["wz"]]],
            arr[:, [ix["ax"], ix["ay"], ix["az"]]],
        ))
    return out
