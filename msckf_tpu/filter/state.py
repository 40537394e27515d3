"""Fixed-size padded filter state.

TPU-native re-expression of ``MSCKFState`` (`/root/reference/src/msckf/MSCKF.py:72-77`)
plus the track store the reference keeps as ``Dict[int, Feature]``
(`FeatureExtractor.py:21-31`, `MSCKF.py:107`). Everything is a flat pytree of
statically-shaped arrays with validity masks so the whole filter loop can live
inside one ``lax.scan``:

  * camera "dict" -> slot arrays compacted at the front (insertion order
    preserved, like the reference's ordered dict); removal is a permutation,
    never a reshape.
  * covariance -> padded (D, D), D = 15 + 6 * n_cam_slots; rows/cols beyond
    the active window are identically zero.
  * feature tracks -> slot arrays with per-observation ring (keypoints,
    descriptors, scores, observing camera ids, observation-time rays).

Null-state note: the reference's OC-EKF "first estimate" states alias the live
state objects (IMU: `MSCKF.py:247-248` binds the same ``Isometry3D``/ndarray,
and ``correct`` mutates them in place `MSCKF.py:635-640`; camera:
`Camera.py:10-11`). Net semantics: *null == state at the start of the current
propagation step* and *camera null == current camera pose*. We therefore store
no null copies at all — propagation snapshots its own inputs. The only
exception is the very first propagation step, where the reference's null pose
is the constructor identity rather than the gravity-aligned initial pose; the
``prop_count == 0`` flag reproduces that.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from msckf_tpu.config import MSCKFConfig


@struct.dataclass
class ImuState:
    R_WI: jnp.ndarray  # (3, 3) current orientation (matrix, like the reference)
    p_WI: jnp.ndarray  # (3,)
    v_WI: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,) gyro bias
    ba: jnp.ndarray  # (3,) accel bias
    timestamp: jnp.ndarray  # () float
    step_id: jnp.ndarray  # () int32 — `IMU.id`, incremented per process_imu (`MSCKF.py:164`)
    prop_count: jnp.ndarray  # () int32 — propagation steps done (first-step null quirk)


@struct.dataclass
class CameraStates:
    R: jnp.ndarray  # (N, 3, 3) R_W_Ci
    t: jnp.ndarray  # (N, 3)
    cam_id: jnp.ndarray  # (N,) int32 — IMU step id at augmentation (`MSCKF.py:255`)
    valid: jnp.ndarray  # (N,) bool
    n: jnp.ndarray  # () int32 active count (active slots are 0..n-1)


# packed per-observation channel layout (one scatter/gather per mutation
# instead of six — the track buffers are the camera step's bandwidth):
#   [kp(2) | score(1) | line_base(3) | line_dir(3) | cam_id(1)
#    | descriptor(desc_dim)]
# cam_id rides as a float channel (ids are exact in f32 up to 2^24, far
# beyond any sequence length) so every obs mutation is ONE scatter and every
# compaction ONE gather — the separate int/bool scatters were three of the
# hottest per-frame ops in the full-shape device profile. Observation
# validity is NOT stored: observations are front-packed by construction
# (spawn writes row 0, extend appends at n_obs, compaction re-packs), so
# valid == (col < n_obs); rows at or beyond n_obs may hold stale channels
# from a recycled slot and every consumer masks through ``obs_valid``.
OBS_KP = slice(0, 2)
OBS_SCORE = 2
OBS_BASE = slice(3, 6)
OBS_DIR = slice(6, 9)
OBS_CAM_ID = 9
OBS_DESC = 10  # start of descriptor channels


def obs_channels(desc_dim: int) -> int:
    return OBS_DESC + desc_dim


def pack_obs(kp, score, line_base, line_dir, desc, cam_id=None):
    """Stack per-observation fields into the packed channel layout."""
    shape = kp.shape[:-1]
    dt = kp.dtype
    cam = (
        jnp.broadcast_to(cam_id, shape).astype(dt)
        if cam_id is not None else jnp.full(shape, -1.0, dt)
    )
    return jnp.concatenate(
        [kp, score[..., None], line_base, line_dir, cam[..., None], desc],
        axis=-1,
    )


@struct.dataclass
class TrackStore:
    obs: jnp.ndarray  # (F, M, C) packed per-observation channels (see above)
    n_obs: jnp.ndarray  # (F,) int32 — observations are packed at the front
    idp_base: jnp.ndarray  # (F, 3) anchor position frozen at creation (`geometry.py:55`)
    idp_m: jnp.ndarray  # (F, 3) unit bearing
    idp_rho: jnp.ndarray  # (F,) inverse depth (init 0.1, `geometry.py:59`)
    tracked: jnp.ndarray  # (F,) int32 tracked_for_n_frames
    lost: jnp.ndarray  # (F,) int32 lost_for_n_frames
    valid: jnp.ndarray  # (F,) bool live track
    track_id: jnp.ndarray  # (F,) int32 creation-order id (`MSCKF.py:109` counter)

    # read views (slices fuse into consumers; writers scatter the packed obs)
    @property
    def kp(self):  # (F, M, 2) pixel observations
        return self.obs[..., OBS_KP]

    @property
    def score(self):  # (F, M)
        return self.obs[..., OBS_SCORE]

    @property
    def line_base(self):  # (F, M, 3) camera center at observation time (`MSCKF.py:305`)
        return self.obs[..., OBS_BASE]

    @property
    def line_dir(self):  # (F, M, 3) world ray at observation time
        return self.obs[..., OBS_DIR]

    @property
    def obs_cam_id(self):  # (F, M) int32 camera id of each observation
        return self.obs[..., OBS_CAM_ID].astype(jnp.int32)

    @property
    def obs_valid(self):  # (F, M) bool — front-packed invariant
        M = self.obs.shape[1]
        return jnp.arange(M)[None, :] < self.n_obs[:, None]

    @property
    def desc(self):  # (F, M, Dd) per-observation descriptors
        return self.obs[..., OBS_DESC:]


@struct.dataclass
class Diagnostics:
    """Measurement-level fault-rejection counters (`MSCKF.py:127-129`) plus
    capacity-overflow counters unique to the fixed-size build."""

    n_homography_rejected: jnp.ndarray  # () int32
    n_epipolar_rejected: jnp.ndarray  # () int32
    n_gating_rejected: jnp.ndarray  # () int32
    n_track_overflow: jnp.ndarray  # () int32 — spawns dropped: f_max exceeded
    n_update_overflow: jnp.ndarray  # () int32 — valid features beyond u_max


@struct.dataclass
class FilterState:
    imu: ImuState
    cams: CameraStates
    P: jnp.ndarray  # (D, D) error-state covariance, D = 15 + 6N
    tracks: TrackStore
    # NOTE: the reference's `last_camera_measurement` (`MSCKF.py:311,436-444`)
    # has no stored counterpart — fused descriptors are recomputed on the fly
    # from the track store (score-weighted average over observations), and
    # "features dict non-empty" (`MSCKF.py:291`) is any(tracks.valid).
    initialized: jnp.ndarray  # () bool — IMU initialized
    next_track_id: jnp.ndarray  # () int32
    diag: Diagnostics


def init_state(cfg: MSCKFConfig) -> FilterState:
    """Fresh filter state: identity pose, zero covariance (`MSCKF.py:76,85`)."""
    dt = cfg.jdtype
    N, F, M, Dd = cfg.n_cam_slots, cfg.f_max, cfg.m_max, cfg.desc_dim
    D = cfg.err_dim
    i32 = jnp.int32
    imu = ImuState(
        R_WI=jnp.eye(3, dtype=dt),
        p_WI=jnp.zeros(3, dtype=dt),
        v_WI=jnp.zeros(3, dtype=dt),
        bg=jnp.zeros(3, dtype=dt),
        ba=jnp.zeros(3, dtype=dt),
        timestamp=jnp.zeros((), dtype=dt),
        step_id=jnp.zeros((), dtype=i32),
        prop_count=jnp.zeros((), dtype=i32),
    )
    cams = CameraStates(
        R=jnp.broadcast_to(jnp.eye(3, dtype=dt), (N, 3, 3)),
        t=jnp.zeros((N, 3), dtype=dt),
        cam_id=jnp.full((N,), -1, dtype=i32),
        valid=jnp.zeros((N,), dtype=bool),
        n=jnp.zeros((), dtype=i32),
    )
    obs0 = jnp.zeros((F, M, obs_channels(Dd)), dtype=dt)
    obs0 = obs0.at[..., OBS_CAM_ID].set(-1.0)
    tracks = TrackStore(
        obs=obs0,
        n_obs=jnp.zeros((F,), dtype=i32),
        idp_base=jnp.zeros((F, 3), dtype=dt),
        idp_m=jnp.zeros((F, 3), dtype=dt),
        idp_rho=jnp.full((F,), 0.1, dtype=dt),
        tracked=jnp.zeros((F,), dtype=i32),
        lost=jnp.zeros((F,), dtype=i32),
        valid=jnp.zeros((F,), dtype=bool),
        track_id=jnp.full((F,), -1, dtype=i32),
    )
    diag = Diagnostics(
        n_homography_rejected=jnp.zeros((), dtype=i32),
        n_epipolar_rejected=jnp.zeros((), dtype=i32),
        n_gating_rejected=jnp.zeros((), dtype=i32),
        n_track_overflow=jnp.zeros((), dtype=i32),
        n_update_overflow=jnp.zeros((), dtype=i32),
    )
    return FilterState(
        imu=imu,
        cams=cams,
        P=jnp.zeros((D, D), dtype=dt),
        tracks=tracks,
        initialized=jnp.zeros((), dtype=bool),
        next_track_id=jnp.zeros((), dtype=jnp.int32),
        diag=diag,
    )
