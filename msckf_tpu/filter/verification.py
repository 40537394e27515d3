"""Two-tier geometric match verification, vectorized over (track x observation).

Rebuilds the per-match Python loop at `/root/reference/src/msckf/MSCKF.py:333-401`:
for every matched feature, every historical observation votes — short baseline
(< 0.01 m) uses a rotation-homography symmetric transfer error, long baseline
uses the signed epipolar residual x2^T F x1. One failing observation rejects
the match (the reference breaks on first failure; "any" is equivalent for the
accept/reject outcome, and the first-failure branch decides which rejection
counter increments).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.state import CameraStates, TrackStore
from msckf_tpu.filter.tracks import gather_cam_poses
from msckf_tpu.ops.backend import pallas_interpret, use_pallas
from msckf_tpu.ops.geometry import skew
from msckf_tpu.ops.smallmat import matmul_small, matvec_small, transpose_small


class VerifyResult(NamedTuple):
    accept: jnp.ndarray  # (F,) bool — match survives all observation votes
    n_homo_rejected: jnp.ndarray  # () int32
    n_epi_rejected: jnp.ndarray  # () int32


def verify_matches(
    cfg: MSCKFConfig,
    tracks: TrackStore,
    cams: CameraStates,
    candidate: jnp.ndarray,  # (F,) bool — matched tracks to verify
    kp2: jnp.ndarray,  # (F, 2) matched current-frame keypoint per track
    cam_R: jnp.ndarray,  # (3,3) current camera pose (post-augmentation)
    cam_t: jnp.ndarray,  # (3,)
) -> VerifyResult:
    dt_ = cfg.jdtype
    K = jnp.asarray(cfg.K_np, dtype=dt_)
    Kinv = jnp.asarray(cfg.K_inv_np, dtype=dt_)

    # per-observation camera poses (current estimates, `MSCKF.py:349-350`);
    # one-hot matmul, not a gather (see tracks.gather_cam_poses) — unresolved
    # rows get zero poses, finite through the guards and masked by obs_valid
    R1, t1, _ = gather_cam_poses(tracks.obs_cam_id, cams)  # (F, M, 3, 3), (F, M, 3)
    kp1 = tracks.kp  # (F, M, 2) historical observations

    if use_pallas(cfg):
        # fused plane-algebra kernel (ops/pallas_kernels.py)
        from msckf_tpu.ops.pallas_kernels import verification_scores

        homo_score, epi_score, baseline = verification_scores(
            R1, t1, kp1, kp2, cam_R, cam_t, K, Kinv,
            interpret=pallas_interpret(),
        )
    else:
        # T_C1_C2 = T_W_C1^-1 * T_W_C2 (`MSCKF.py:350`)
        R1t = transpose_small(R1)
        R12 = matmul_small(R1t, jnp.broadcast_to(cam_R, R1.shape))  # (F, M, 3, 3)
        t12 = matvec_small(R1t, cam_t - t1)  # (F, M, 3) == R1^T (t2 - t1)
        baseline = jnp.linalg.norm(t12, axis=-1)

        ones1 = jnp.ones(kp1.shape[:-1] + (1,), dtype=dt_)
        x1 = jnp.concatenate([kp1, ones1], axis=-1)  # (F, M, 3)
        x2 = jnp.concatenate([kp2, jnp.ones((kp2.shape[0], 1), dtype=dt_)], axis=-1)

        # --- homography branch (`MSCKF.py:352-360`): H = K R12 K^-1 ---
        Kb = jnp.broadcast_to(K, R12.shape)
        Kinvb = jnp.broadcast_to(Kinv, R12.shape)
        H = matmul_small(matmul_small(Kb, R12), Kinvb)  # (F, M, 3, 3)
        Hinv = matmul_small(matmul_small(Kb, transpose_small(R12)), Kinvb)
        x1_pred = matvec_small(Hinv, jnp.broadcast_to(x2[:, None, :], H.shape[:2] + (3,)))
        x1_pred = x1_pred[..., :2] / x1_pred[..., 2:3]
        x2_pred = matvec_small(H, x1)
        x2_pred = x2_pred[..., :2] / x2_pred[..., 2:3]
        # NOTE: the reference compares the *current* keypoint against H^-1 x2
        # (`MSCKF.py:358`) — reproduced literally.
        homo_score = 0.5 * (
            jnp.linalg.norm(kp2[:, None, :] - x1_pred, axis=-1)
            + jnp.linalg.norm(kp1 - x2_pred, axis=-1)
        )

        # --- epipolar branch (`MSCKF.py:377-379`): F = K^-T [t]x R K^-1 ---
        KinvT = jnp.broadcast_to(Kinv.T, R12.shape)
        Fm = matmul_small(matmul_small(matmul_small(KinvT, skew(t12)), R12), Kinvb)
        epi_score = jnp.sum(x2[:, None, :] * matvec_small(Fm, x1), axis=-1)

    short = baseline < 0.01
    reject = jnp.where(
        short,
        homo_score > cfg.homography_rejection_threshold,
        epi_score > cfg.epipolar_rejection_threshold,
    )
    reject = reject & tracks.obs_valid & candidate[:, None]

    any_reject = jnp.any(reject, axis=-1)
    accept = candidate & ~any_reject

    # first failing observation decides the counter (`MSCKF.py:362,383`)
    first_fail = jnp.argmax(reject, axis=-1)  # (F,)
    # one-hot compare+reduce, not take_along_axis (batch-varying gathers
    # serialize under vmap on TPU)
    ff_eq = jnp.arange(short.shape[1])[None, :] == first_fail[:, None]
    fail_is_homo = jnp.any(ff_eq & short, axis=1)
    n_homo = jnp.sum(any_reject & fail_is_homo).astype(jnp.int32)
    n_epi = jnp.sum(any_reject & ~fail_is_homo).astype(jnp.int32)
    return VerifyResult(accept=accept, n_homo_rejected=n_homo, n_epi_rejected=n_epi)
