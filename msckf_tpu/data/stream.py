"""Sensor-stream preparation: padded device arrays for the on-device scan.

Replaces the reference's per-tick Python loop feeding (`/root/reference/main.py:261-305`)
with one host-side pass that:

  * matches camera frames to IMU ticks the way the driver does
    (`main.py:279`: |round(t_imu - t_cam, 3)| < 1e-5, starting from camera
    index 1 — frame 0 is never consumed, `main.py:252`),
  * computes the gravity-aligned initial orientation from the mean
    accelerometer over the pre-vision prefix (`IMU.py:43-58`), which together
    with starting the scan at tick 0 reproduces the reference's
    buffer-then-replay initialization exactly (see ``filter.msckf``),
  * packs IMU ticks into camera-frame blocks (tick 0 of each block carries
    the camera) and pads keypoints/descriptors to static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from msckf_tpu.config import MSCKFConfig


class PreparedStream(NamedTuple):
    R_init: np.ndarray  # (3, 3) gravity-aligned initial orientation
    prefix: dict  # propagate-only ticks before the first processed frame
    frames: dict  # frame blocks for the main scan
    n_ticks: int  # total IMU ticks represented
    # indices into the CALLER's camera arrays (pre-skip) of each processed
    # frame block, aligned with frames' leading axis — lets image-in
    # pipelines (msckf_tpu/pipeline.py) select the matching image stack
    proc_cam_idx: np.ndarray | None = None


def gravity_align_numpy(mean_acc: np.ndarray, gravity: np.ndarray) -> np.ndarray:
    """Host-side mirror of `IMU.py:43-58`."""
    g = gravity / np.linalg.norm(gravity)
    a = mean_acc / np.linalg.norm(mean_acc)
    axis = np.cross(a, g)
    n = np.linalg.norm(axis)
    theta = np.arccos(np.clip(a @ g, -1.0, 1.0))
    if np.isclose(theta, 0.0):
        return np.eye(3)
    if np.isclose(theta, np.pi):
        return -np.eye(3)
    axis = axis / n
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(theta) * Kx + (1 - np.cos(theta)) * (Kx @ Kx)


def match_camera_ticks(imu_ts: np.ndarray, cam_ts: np.ndarray) -> np.ndarray:
    """The driver's sequential timestamp matching (`main.py:269-282`).

    Walks camera index starting at 1; a camera fires on IMU tick i when
    |round(t_i - t_cam, 3)| < 1e-5. Returns the matched tick per camera
    (starting with camera index 1)."""
    ticks = []
    c = 1
    for i in range(len(imu_ts)):
        if c >= len(cam_ts):
            break
        if abs(round(imu_ts[i] - cam_ts[c], 3)) < 1e-5:
            ticks.append(i)
            c += 1
    return np.asarray(ticks, dtype=np.int64)


def build_stream(
    cfg: MSCKFConfig,
    imu_ts: np.ndarray,  # (T,)
    imu_gyro: np.ndarray,  # (T, 3)
    imu_acc: np.ndarray,  # (T, 3)
    cam_ticks: np.ndarray,  # (C,) IMU tick of each considered camera frame;
    #                         cam_ticks[0] is the init trigger (never processed)
    cam_keypoints: Sequence[np.ndarray],  # per frame (n_i, 2) — aligned with cam_ticks
    cam_descriptors: Sequence[np.ndarray],
    cam_scores: Sequence[np.ndarray],
    max_ticks: int | None = None,
    skip_first_frame: bool = True,
) -> PreparedStream:
    orig_cam_idx = np.arange(len(np.asarray(cam_ticks)))
    if skip_first_frame:
        # the driver never consumes camera index 0 (`main.py:252`)
        cam_ticks = np.asarray(cam_ticks)[1:]
        cam_keypoints = list(cam_keypoints)[1:]
        cam_descriptors = list(cam_descriptors)[1:]
        cam_scores = list(cam_scores)[1:]
        orig_cam_idx = orig_cam_idx[1:]
    f64 = np.float64
    imu_ts = np.asarray(imu_ts, f64)
    imu_gyro = np.asarray(imu_gyro, f64)
    imu_acc = np.asarray(imu_acc, f64)
    T = len(imu_ts) if max_ticks is None else min(max_ticks, len(imu_ts))
    cam_ticks = np.asarray(cam_ticks, np.int64)
    keep = cam_ticks < T
    cam_ticks = cam_ticks[keep]
    orig_cam_idx = orig_cam_idx[keep]
    if len(cam_ticks) < 2:
        raise ValueError("need at least two camera frames (init trigger + one)")

    init_tick = int(cam_ticks[0])
    mean_acc = imu_acc[: init_tick + 1].mean(axis=0)
    R_init = gravity_align_numpy(mean_acc, cfg.gravity_np)

    # prefix: ticks [0, cam_ticks[1]) — IMU only (includes the init trigger).
    # Ticks <= init_tick are the reference's buffering phase: it reports the
    # constructor state there (`MSCKF.py:136-138`) while our scan already
    # propagates (the replay equivalence); pre_init masks the *outputs* so
    # per-tick telemetry matches the reference exactly.
    first = int(cam_ticks[1])
    prefix = dict(
        imu_ts=imu_ts[:first],
        imu_gyro=imu_gyro[:first],
        imu_acc=imu_acc[:first],
        imu_valid=np.ones(first, dtype=bool),
        pre_init=np.arange(first) <= init_tick,
    )

    # frame blocks: [cam_ticks[j], next) for j >= 1
    proc_ticks = cam_ticks[1:]
    bounds = np.append(proc_ticks, T)
    lens = np.diff(bounds)
    C = len(proc_ticks)
    B = int(lens.max())
    K, Dd = cfg.k_max, cfg.desc_dim

    fr_ts = np.zeros((C, B), f64)
    fr_gyro = np.zeros((C, B, 3), f64)
    fr_acc = np.zeros((C, B, 3), f64)
    fr_valid = np.zeros((C, B), bool)
    kp = np.zeros((C, K, 2), f64)
    desc = np.zeros((C, K, Dd), f64)
    score = np.zeros((C, K), f64)
    kp_valid = np.zeros((C, K), bool)
    for j in range(C):
        a, b = int(bounds[j]), int(bounds[j + 1])
        n = b - a
        fr_ts[j, :n] = imu_ts[a:b]
        fr_gyro[j, :n] = imu_gyro[a:b]
        fr_acc[j, :n] = imu_acc[a:b]
        fr_valid[j, :n] = True
        kpi = np.asarray(cam_keypoints[j + 1], f64)
        di = np.asarray(cam_descriptors[j + 1], f64)
        si = np.asarray(cam_scores[j + 1], f64)
        nk = min(len(kpi), K)
        kp[j, :nk] = kpi[:nk]
        desc[j, :nk, : di.shape[1]] = di[:nk]
        score[j, :nk] = si[:nk]
        kp_valid[j, :nk] = True

    frames = dict(
        imu_ts=fr_ts,
        imu_gyro=fr_gyro,
        imu_acc=fr_acc,
        imu_valid=fr_valid,
        has_camera=np.ones(C, dtype=bool),
        kp=kp,
        desc=desc,
        score=score,
        kp_valid=kp_valid,
    )
    return PreparedStream(
        R_init=R_init, prefix=prefix, frames=frames, n_ticks=T,
        proc_cam_idx=orig_cam_idx[1:],
    )


def to_device(stream: PreparedStream, cfg: MSCKFConfig) -> PreparedStream:
    """Cast float payloads to the filter dtype and move to device."""
    import jax.numpy as jnp

    dt = cfg.jdtype

    def cast(d):
        out = {}
        for k, v in d.items():
            if v.dtype == np.float64:
                out[k] = jnp.asarray(v, dtype=dt)
            else:
                out[k] = jnp.asarray(v)
        return out

    return PreparedStream(
        R_init=stream.R_init,
        prefix=cast(stream.prefix),
        frames=cast(stream.frames),
        n_ticks=stream.n_ticks,
        proc_cam_idx=stream.proc_cam_idx,
    )


def suggest_capacities(cam_keypoints, max_camera_states: int = 30) -> dict:
    """Heuristic buffer capacities for a dataset (zero-overflow on typical
    track churn; `Diagnostics` counters report if a run ever exceeds them).

    k_max covers the largest per-frame keypoint count; track slots hold the
    live set (~matched + fresh spawns + recently-lost), bounded in practice
    by ~2x the per-frame count.
    """
    max_kp = max((len(k) for k in cam_keypoints), default=0)

    def round_up(x, m):
        return ((int(x) + m - 1) // m) * m

    k_max = max(round_up(max_kp, 128), 128)
    # 3x per-frame keypoints: weak matching regimes (hard textures, imperfect
    # weights) spawn most keypoints as fresh tracks that live 2-3 frames
    # before the lost-counter reaps them; 2x overflowed on the rendered
    # boxes fixture (2443 drops at 640)
    f_max = max(round_up(3 * max_kp, 128), 256)
    return dict(
        k_max=k_max,
        f_max=f_max,
        u_max=48,
        m_max=max_camera_states + 2,
        n_cam_slots=max_camera_states + 2,
    )


IMU_FRAME_KEYS = ("imu_ts", "imu_gyro", "imu_acc", "imu_valid")


def build_image_stream(
    cfg: MSCKFConfig,
    imu_ts: np.ndarray,
    imu_gyro: np.ndarray,
    imu_acc: np.ndarray,
    cam_ticks: np.ndarray,
    max_ticks: int | None = None,
    skip_first_frame: bool = True,
) -> PreparedStream:
    """`build_stream` for the image-in fused pipeline (msckf_tpu/pipeline.py):
    no pre-extracted features — `frames` carries only the IMU block keys, and
    `proc_cam_idx` selects the matching rows of the caller's image stack
    (images[stream.proc_cam_idx] aligns with frames' leading axis)."""
    C = len(np.asarray(cam_ticks))
    empty_kp = [np.zeros((0, 2))] * C
    empty_ds = [np.zeros((0, cfg.desc_dim))] * C
    empty_sc = [np.zeros((0,))] * C
    st = build_stream(
        cfg, imu_ts, imu_gyro, imu_acc, cam_ticks, empty_kp, empty_ds,
        empty_sc, max_ticks=max_ticks, skip_first_frame=skip_first_frame,
    )
    frames = {k: st.frames[k] for k in IMU_FRAME_KEYS}
    return PreparedStream(
        R_init=st.R_init, prefix=st.prefix, frames=frames,
        n_ticks=st.n_ticks, proc_cam_idx=st.proc_cam_idx,
    )
