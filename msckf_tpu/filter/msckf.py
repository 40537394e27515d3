"""Filter orchestration: the per-tick step and the on-device sequence scan.

Rebuilds the reference control flow — ``imu_callback`` / ``feature_callback``
(`/root/reference/src/msckf/MSCKF.py:135-158`) and the driver's sequential
sensor loop (`/root/reference/main.py:261-305`) — as a two-level ``lax.scan``
that keeps the entire VIO loop on device:

  outer scan: camera-frame blocks
  inner scan: the IMU ticks of each block (tick 0 carries the camera)

Initialization restructure (TPU-first, exact): the reference buffers IMU
measurements until the first image, then gravity-aligns the orientation from
the buffer mean and *replays* the buffer through ``process_imu``
(`MSCKF.py:135-145`, `IMU.py:43-58`). Replay is ordinary sequential
propagation of a stream prefix, so starting the scan at tick 0 from the
pre-computed gravity-aligned state — with the first image's camera step
disabled (the reference skips it: IMU not yet initialized at that point,
`MSCKF.py:150`) — produces the identical state trajectory from the
initialization tick onward, without any data-dependent replay loop. The
stream builder (``msckf_tpu.data.stream``) computes the alignment host-side.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.augmentation import state_augmentation
from msckf_tpu.filter.marginalization import (
    cameras_without_features,
    prune_poorest_camera_states,
    remove_cameras,
)
from msckf_tpu.filter.matching import fused_descriptors, mutual_match
from msckf_tpu.filter.propagation import propagate_block
from msckf_tpu.filter.state import FilterState, init_state
from msckf_tpu.filter.tracks import extend_tracks, select_rows, spawn_tracks
from msckf_tpu.filter.update import ekf_update, triage_features
from msckf_tpu.filter.verification import verify_matches
from msckf_tpu.ops.precision import with_f32_matmuls


def add_camera_measurements(
    cfg: MSCKFConfig,
    state: FilterState,
    kp: jnp.ndarray,  # (K, 2)
    desc: jnp.ndarray,  # (K, Dd)
    score: jnp.ndarray,  # (K,)
    kp_valid: jnp.ndarray,  # (K,) bool
) -> FilterState:
    """`MSCKF.py:268-448`: score filter, match, verify, extend/spawn tracks."""
    dt_ = cfg.jdtype
    kp = kp.astype(dt_)
    desc = desc.astype(dt_)
    score = score.astype(dt_)

    # keypoint score filter: keep score >= 0.5 * mean (`MSCKF.py:281-284`)
    n_kp = jnp.sum(kp_valid)
    mean = jnp.sum(jnp.where(kp_valid, score, 0.0)) / jnp.maximum(n_kp, 1)
    keep = kp_valid & (score >= 0.5 * mean)

    cam_slot = state.cams.n - 1  # just augmented
    cam_R = state.cams.R[cam_slot]
    cam_t = state.cams.t[cam_slot]
    cam_id = state.imu.step_id

    # Cond-free: the reference's three early exits — no kept keypoints
    # (`MSCKF.py:286`), first frame (`MSCKF.py:291`), and zero matches
    # (`MSCKF.py:320`) — collapse into ONE activity mask. When matching finds
    # nothing (or there are no tracks yet), verification/extension are
    # already exact no-ops through their own masks; the only data-dependent
    # behaviors are track aging and spawning, both gated on ``act`` below.
    # lax.cond here would copy the multi-MB track buffers at every branch
    # boundary and fence fusion; the masked form is branchless and fuses.
    tr = state.tracks
    dg = state.diag
    fused = fused_descriptors(tr)
    m = mutual_match(fused, tr.valid, desc, keep, cfg.min_cosine_similarity)
    no_tracks = ~jnp.any(tr.valid)
    act = jnp.any(keep) & (m.any_match | no_tracks)

    # per-track matched keypoint/descriptor/score rows by compare+reduce,
    # not gather (`tracks.select_rows` — TPU/vmapped gathers serialize).
    # track_to_kp rows of unmatched tracks are argmax garbage exactly as
    # before; every consumer masks on track_matched/accept.
    kp2 = select_rows(m.track_to_kp, True, kp)  # (F, 2)
    v = verify_matches(cfg, tr, state.cams, m.track_matched, kp2, cam_R, cam_t)
    tr, (ext_colmask, ext_row) = extend_tracks(
        cfg, tr, v.accept, kp2,
        select_rows(m.track_to_kp, True, desc),
        select_rows(m.track_to_kp, True, score),
        cam_R, cam_t, cam_id, defer_obs=True,
    )
    # rejected matches (`MSCKF.py:399-401`) and unmatched tracks
    # (`MSCKF.py:438`) both age by one frame — unless the reference would
    # have early-returned this frame
    bump = ((m.track_matched & ~v.accept) | (tr.valid & ~m.track_matched)) & act
    tr = tr.replace(lost=tr.lost + bump.astype(tr.lost.dtype))
    dg = dg.replace(
        n_homography_rejected=dg.n_homography_rejected + v.n_homo_rejected,
        n_epipolar_rejected=dg.n_epipolar_rejected + v.n_epi_rejected,
    )
    # unmatched kept keypoints spawn new tracks (`MSCKF.py:414-434`; on the
    # first frame every kept keypoint spawns, `MSCKF.py:291-311`)
    tracks, diag, next_id, (sp_written, sp_row) = spawn_tracks(
        cfg, tr, dg, state.next_track_id, kp, desc, score,
        keep & ~m.kp_matched & act, cam_R, cam_t, cam_id, defer_obs=True,
    )
    # ONE materialization of the (F, M, C) observation buffer for both
    # writes (extend: column n_obs of accepted VALID tracks; spawn: column 0
    # of recycled INVALID slots — row-disjoint by construction, so each row
    # carries at most one value row). Writing twice paid the full multi-MB
    # buffer traffic twice per frame (fused-pipeline profile: 256 us for the
    # spawn write alone at full shape).
    col0 = jnp.arange(cfg.m_max) == 0
    wmask = ext_colmask | (sp_written[:, None] & col0[None, :])  # (F, M)
    vals = jnp.where(sp_written[:, None], sp_row, ext_row)  # (F, C)
    tracks = tracks.replace(
        obs=jnp.where(wmask[..., None], vals[:, None, :], tracks.obs)
    )
    return state.replace(tracks=tracks, diag=diag, next_track_id=next_id)


def process_features(cfg: MSCKFConfig, state: FilterState) -> FilterState:
    """`MSCKF.py:450-456`: triage, update, delete lost tracks + empty cameras.

    The reference's ``if len(valid_features) > 0`` guard is reproduced by
    masking rather than lax.cond: with no valid features the update
    accumulates A=0, c=0 — and ``apply_correction`` with zero terms is the
    exact identity (delta = L@0 = 0, I - LA = I, Joseph form = P), so
    ``ekf_update`` needs no branch — no tracks are deleted, and
    ``remove_cameras`` with an empty victim mask is an exact no-op
    (identity permutation). A cond here would copy the full state — the
    covariance included — at the branch boundary every frame.
    """
    tri = triage_features(cfg, state, state.tracks.valid)
    state = state.replace(tracks=tri.tracks)
    any_valid = jnp.any(tri.valid)

    state = ekf_update(cfg, state, tri.valid)
    # remove_features(lost) (`MSCKF.py:739-749`), gated like the reference
    tr = state.tracks
    state = state.replace(tracks=tr.replace(valid=tr.valid & ~(tri.lost & any_valid)))
    empty = cameras_without_features(cfg, state) & any_valid
    return remove_cameras(cfg, state, empty)


@with_f32_matmuls
def camera_step(
    cfg: MSCKFConfig,
    state: FilterState,
    kp: jnp.ndarray,
    desc: jnp.ndarray,
    score: jnp.ndarray,
    kp_valid: jnp.ndarray,
) -> FilterState:
    """``feature_callback`` body (`MSCKF.py:147-158`)."""
    if cfg.only_imu:
        return state
    state = state_augmentation(cfg, state)
    state = add_camera_measurements(cfg, state, kp, desc, score, kp_valid)
    state = process_features(cfg, state)
    saturated = state.cams.n > cfg.max_camera_states
    if cfg.prune_path == "masked":
        # branchless: victims masked off while the window is unsaturated —
        # an exact no-op (see prune_poorest_camera_states); avoids the
        # cond's carried-state copies, and under vmap the cond would run
        # both branches anyway
        state = prune_poorest_camera_states(
            cfg, state, enable=saturated, branchless=True
        )
    else:
        state = lax.cond(
            saturated,
            lambda s: prune_poorest_camera_states(cfg, s),
            lambda s: s,
            state,
        )
    return state


class TickOutput(NamedTuple):
    """Per-IMU-tick telemetry, mirroring what the driver samples each loop
    iteration (`main.py:328-344`)."""

    R_WI: jnp.ndarray  # (3, 3)
    p_WI: jnp.ndarray  # (3,)
    v_WI: jnp.ndarray  # (3,)
    sigma_rot: jnp.ndarray  # (3,) diag P[0:3]
    sigma_pos: jnp.ndarray  # (3,) diag P[12:15]
    n_cams: jnp.ndarray  # () int32
    n_tracks: jnp.ndarray  # () int32
    valid: jnp.ndarray  # () bool — tick existed


def _tick_output(state: FilterState, valid) -> TickOutput:
    return TickOutput(
        R_WI=state.imu.R_WI,
        p_WI=state.imu.p_WI,
        v_WI=state.imu.v_WI,
        sigma_rot=jnp.diagonal(state.P[0:3, 0:3]),
        sigma_pos=jnp.diagonal(state.P[12:15, 12:15]),
        n_cams=state.cams.n,
        n_tracks=jnp.sum(state.tracks.valid).astype(jnp.int32),
        valid=valid,
    )


def _block_outputs(cfg: MSCKFConfig, state: FilterState, outs) -> TickOutput:
    """Wrap propagate_block's raw per-tick outputs as TickOutput (camera/track
    counts are constant across IMU-only ticks)."""
    R, p, v, s_rot, s_pos, valid = outs
    B = valid.shape[0]
    n_cams = jnp.broadcast_to(state.cams.n, (B,))
    n_tracks = jnp.broadcast_to(
        jnp.sum(state.tracks.valid).astype(jnp.int32), (B,)
    )
    return TickOutput(
        R_WI=R, p_WI=p, v_WI=v, sigma_rot=s_rot, sigma_pos=s_pos,
        n_cams=n_cams, n_tracks=n_tracks, valid=valid,
    )


@with_f32_matmuls
def frame_step(cfg: MSCKFConfig, state: FilterState, frame: dict,
               assume_camera: bool = False):
    """One camera-frame block: B IMU ticks, camera on tick 0 (when flagged).

    Tick 0 propagates and runs the vision update (the driver samples metrics
    after both callbacks, `main.py:278-298`); ticks 1..B-1 are IMU-only and
    run as one composed ``propagate_block`` that touches the padded
    covariance once.

    ``assume_camera`` (static): when the caller knows every frame block in
    the stream carries a valid camera (no padding blocks — the stream
    builder reports this), the per-frame has_camera cond — whose branch
    boundary copies the full state — is dropped entirely.
    """
    ts, gyro, acc, valid = (
        frame["imu_ts"], frame["imu_gyro"], frame["imu_acc"], frame["imu_valid"]
    )

    # tick 0 as a 1-tick block (fused kernel on TPU; masked when invalid)
    state, _ = propagate_block(cfg, state, ts[0:1], gyro[0:1], acc[0:1], valid[0:1])

    def cam(s):
        return camera_step(
            cfg, s, frame["kp"], frame["desc"], frame["score"], frame["kp_valid"]
        )

    if assume_camera:
        state = cam(state)
    else:
        state = lax.cond(frame["has_camera"] & valid[0], cam, lambda s: s, state)
    out0 = _tick_output(state, valid[0])

    state, outs = propagate_block(cfg, state, ts[1:], gyro[1:], acc[1:], valid[1:])
    rest = _block_outputs(cfg, state, outs)
    full = jax.tree.map(lambda a, b: jnp.concatenate([a[None], b], axis=0), out0, rest)
    return state, full


@with_f32_matmuls
def run_filter(cfg: MSCKFConfig, state: FilterState, stream: dict,
               assume_camera: bool = False):
    """Scan the filter over a whole prepared sequence on device.

    ``stream`` is the dict produced by ``msckf_tpu.data.stream.build_stream``
    with leading dims (C frames, B ticks). Returns (final_state, TickOutput
    with shape (C, B, ...)).
    """

    def fr(st, frame):
        return frame_step(cfg, st, frame, assume_camera=assume_camera)

    return lax.scan(fr, state, stream)


@with_f32_matmuls
def propagate_prefix(cfg: MSCKFConfig, state: FilterState, prefix: dict):
    """Propagate-only prefix before the first processed camera frame, with
    the reference's buffering-phase output masking (see ``run_sequence``).
    Returns (state, prefix TickOutput (Bp, ...))."""

    state, outs = propagate_block(
        cfg, state, prefix["imu_ts"], prefix["imu_gyro"], prefix["imu_acc"],
        prefix["imu_valid"],
    )
    pre_out = _block_outputs(cfg, state, outs)
    # during the reference's buffering phase it reports the constructor
    # state (identity pose, zero covariance) — see stream.build_stream
    pi = prefix["pre_init"]
    blank = TickOutput(
        R_WI=jnp.eye(3, dtype=cfg.jdtype),
        p_WI=jnp.zeros(3, dtype=cfg.jdtype),
        v_WI=jnp.zeros(3, dtype=cfg.jdtype),
        sigma_rot=jnp.zeros(3, dtype=cfg.jdtype),
        sigma_pos=jnp.zeros(3, dtype=cfg.jdtype),
        n_cams=jnp.zeros((), jnp.int32),
        n_tracks=jnp.zeros((), jnp.int32),
        valid=jnp.zeros((), bool),
    )
    pre_out = jax.tree.map(
        lambda b, o: jnp.where(
            pi.reshape((-1,) + (1,) * (o.ndim - 1)), b[None], o
        ),
        blank, pre_out,
    )
    pre_out = pre_out._replace(valid=prefix["imu_valid"])
    return state, pre_out


@with_f32_matmuls
def run_sequence(cfg: MSCKFConfig, state: FilterState, prefix: dict, frames: dict,
                 assume_camera: bool = False):
    """Full sequence: propagate-only prefix, then camera-frame blocks.

    Returns (final_state, prefix TickOutput (Bp, ...), frame TickOutput
    (C, B, ...)). Jit this whole function with cfg (and assume_camera)
    static.
    """
    state, pre_out = propagate_prefix(cfg, state, prefix)
    state, frame_out = run_filter(cfg, state, frames, assume_camera=assume_camera)
    return state, pre_out, frame_out


def make_initial_state(cfg: MSCKFConfig, R_init=None) -> FilterState:
    """Fresh state, optionally with the gravity-aligned initial orientation
    computed by the stream builder (see module docstring)."""
    state = init_state(cfg)
    if R_init is not None:
        state = state.replace(
            imu=state.imu.replace(R_WI=jnp.asarray(R_init, dtype=cfg.jdtype)),
            initialized=jnp.ones((), dtype=bool),
        )
    return state
