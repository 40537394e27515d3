"""Track-store mutations as masked scatters on fixed-size buffers.

The reference mutates ``Dict[int, Feature]`` with Python list appends/deletes
(`/root/reference/src/msckf/MSCKF.py:291-309, 399-434, 739-779`). Here every
mutation is a static-shape scatter:

  * spawn   — allocate free slots in keypoint-index order (the reference
              inserts new features in enumeration order, `MSCKF.py:414-434`)
  * extend  — append one observation at index ``n_obs`` for accepted matches
  * compact — order-preserving deletion of observations whose camera was
              marginalized (`MSCKF.py:760-769`), via cumsum-rank one-hots
              (no sorts anywhere in the filter: see ``stable_rank``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.state import OBS_CAM_ID, TrackStore, pack_obs
from msckf_tpu.ops.geometry import idp_angles_m


def stable_rank(key: jnp.ndarray) -> jnp.ndarray:
    """``jnp.argsort(jnp.argsort(key))`` without the sorts.

    rank[i] = #{j : key[j] < key[i], or key[j] == key[i] and j < i} — the
    stable ascending rank. Built as one (n, n) broadcast compare + row
    reduce: TPU sorts are multi-pass bitonic networks with high fixed cost
    (the (F,)-sized sorts were ~350 us/frame of the fused-pipeline profile),
    while the quadratic compare fuses into one VPU pass for the n <= ~1k
    vectors the filter ranks.
    """
    n = key.shape[0]
    idx = jnp.arange(n)
    before = (key[None, :] < key[:, None]) | (
        (key[None, :] == key[:, None]) & (idx[None, :] < idx[:, None])
    )
    return jnp.sum(before, axis=1, dtype=jnp.int32)


def spawn_tracks(
    cfg: MSCKFConfig,
    tr: TrackStore,
    diag,
    next_track_id: jnp.ndarray,  # () int32
    kp: jnp.ndarray,  # (K, 2)
    desc: jnp.ndarray,  # (K, Dd)
    score: jnp.ndarray,  # (K,)
    spawn_mask: jnp.ndarray,  # (K,) bool — keypoints that become new tracks
    cam_R: jnp.ndarray,  # (3, 3) current camera pose
    cam_t: jnp.ndarray,  # (3,)
    cam_id: jnp.ndarray,  # () int32
    defer_obs: bool = False,
):
    """New feature creation (`MSCKF.py:291-309` / `:414-434`).

    ``defer_obs`` (static): skip the (F, M, C) observation-buffer write and
    return ``(written (F,), placed_obs0 (F, C))`` as a fourth element so the
    caller can fuse it with extend_tracks' write into ONE full-buffer select
    (each separate write materializes the multi-MB buffer once — the spawn
    write alone was 256 us/frame of the fused-pipeline device profile).

    Each spawned keypoint gets: first observation (kp/desc/score/camera),
    an observation-time world ray Line(cam_t, R_c K^-1 [kp,1])
    (`MSCKF.py:297-305`), and an inverse-depth point anchored at the current
    camera (`MSCKF.py:306`, `geometry.py:53-59`). Operates on (and returns)
    only the state pieces it mutates — (tracks, diag, next_track_id) — so
    callers can thread a slim carry through their lax.cond branches.
    """
    dt_ = cfg.jdtype
    # K from the input, not cfg.k_max: the fused image-in pipeline feeds
    # (top_k, ...) CNN buffers directly (msckf_tpu/pipeline.py); stream-built
    # paths pass k_max-padded buffers as before
    F, K = cfg.f_max, kp.shape[0]

    # the k-th spawner (keypoint order) takes the k-th free slot (slot
    # order): pair the two cumsum ranks directly — no sorted free-slot list
    # (the (F,) sort cost ~90 us/frame on-chip; see stable_rank)
    free_rank = jnp.cumsum(~tr.valid) - 1  # (F,) rank among free slots
    n_free = jnp.sum(~tr.valid)
    rank = jnp.cumsum(spawn_mask) - 1  # (K,) rank among spawners
    overflow = jnp.sum(spawn_mask & (rank >= n_free))

    # bearing ray in world frame: W_v = R_c @ K^-1 [u, v, 1]
    Kinv = jnp.asarray(cfg.K_inv_np, dtype=dt_)
    homog = jnp.concatenate([kp, jnp.ones((K, 1), dtype=dt_)], axis=-1)
    Ci_v = homog @ Kinv.T  # (K, 3)
    W_v = Ci_v @ cam_R.T  # (K, 3)

    obs0 = pack_obs(
        kp, score, jnp.broadcast_to(cam_t, (K, 3)), W_v, desc,
        cam_id=cam_id.astype(dt_),
    )  # (K, C)

    # one-hot placement, not .at[slot]: batch-varying index scatters
    # serialize under vmap on TPU (same rationale as select_rows). Ranks are
    # unique among spawners/free slots, so every output row receives at most
    # one term — the placements are exact; overflow spawners (rank >= n_free)
    # match no free slot because free_rank < n_free everywhere.
    eq = (
        spawn_mask[:, None] & (~tr.valid)[None, :]
        & (rank[:, None] == free_rank[None, :])
    )  # (K, F)
    written = jnp.any(eq, axis=0)  # (F,)
    W = eq.astype(dt_)
    # obs0 and idp_angles_m outputs are raw finite values (measurements /
    # cos-sin terms), so the big placements can ride the MXU as matmuls;
    # track_id stays an integer masked reduce (exact at any magnitude)
    placed_obs0 = jnp.einsum("kf,kc->fc", W, obs0)  # (F, C)
    placed_m = jnp.einsum("kf,kc->fc", W, idp_angles_m(W_v))  # (F, 3)
    new_ids = (next_track_id + 1 + rank).astype(jnp.int32)
    placed_id = jnp.sum(
        jnp.where(eq, new_ids[:, None], 0), axis=0, dtype=jnp.int32
    )
    tracks = tr.replace(
        # only row 0 is written: recycled slots keep stale rows beyond
        # n_obs=1, which the front-packed obs_valid invariant masks out
        # everywhere (writing the whole (K, M, C) block was the larger of
        # the two spawn scatters in the device profile)
        obs=tr.obs if defer_obs else tr.obs.at[:, 0].set(
            jnp.where(written[:, None], placed_obs0, tr.obs[:, 0])
        ),
        n_obs=jnp.where(written, 1, tr.n_obs),
        idp_base=jnp.where(written[:, None], cam_t[None], tr.idp_base),
        idp_m=jnp.where(written[:, None], placed_m, tr.idp_m),
        idp_rho=jnp.where(written, jnp.asarray(0.1, dt_), tr.idp_rho),
        tracked=jnp.where(written, 1, tr.tracked),
        lost=jnp.where(written, 0, tr.lost),
        valid=tr.valid | written,
        track_id=jnp.where(written, placed_id, tr.track_id),
    )
    diag = diag.replace(
        n_track_overflow=diag.n_track_overflow + overflow.astype(jnp.int32)
    )
    next_id = next_track_id + jnp.sum(spawn_mask).astype(jnp.int32)
    if defer_obs:
        return tracks, diag, next_id, (written, placed_obs0)
    return tracks, diag, next_id


def extend_tracks(
    cfg: MSCKFConfig,
    tracks: TrackStore,
    accept: jnp.ndarray,  # (F,) bool — matched & geometrically verified
    kp: jnp.ndarray,  # (F, 2) matched keypoint per track
    desc: jnp.ndarray,  # (F, Dd)
    score: jnp.ndarray,  # (F,)
    cam_R: jnp.ndarray,
    cam_t: jnp.ndarray,
    cam_id: jnp.ndarray,
    defer_obs: bool = False,
):
    """Append an observation to accepted tracks (`MSCKF.py:403-412`).

    ``defer_obs`` (static): skip the (F, M, C) observation write and return
    ``(tracks, (colmask (F, M), new_row (F, C)))`` so the caller can fuse it
    with spawn_tracks' disjoint-row write into one full-buffer select (see
    spawn_tracks)."""
    dt_ = cfg.jdtype
    F, M = cfg.f_max, cfg.m_max
    Kinv = jnp.asarray(cfg.K_inv_np, dtype=dt_)
    homog = jnp.concatenate([kp, jnp.ones((F, 1), dtype=dt_)], axis=-1)
    W_v = (homog @ Kinv.T) @ cam_R.T  # (F, 3)

    # capacity guard: n_obs can never exceed the live camera count in
    # reference semantics (one observation per camera, obs of marginalized
    # cameras are deleted), but misconfigured m_max must not silently
    # overwrite the newest observation
    a = accept & (tracks.n_obs < M)
    cols = jnp.where(a, jnp.clip(tracks.n_obs, 0, M - 1), M)  # M -> dropped
    new_row = pack_obs(
        kp, score, jnp.broadcast_to(cam_t, (F, 3)), W_v, desc,
        cam_id=cam_id.astype(dt_),
    )  # (F, C)
    # per-row one-hot column write, not a 2-D scatter (batch-varying index
    # scatters serialize under vmap on TPU); cols==M matches no column, so
    # dropped rows keep their old observations — exact `mode="drop"` dual
    colmask = jnp.arange(M)[None, :] == cols[:, None]  # (F, M)
    out = tracks.replace(
        obs=tracks.obs if defer_obs else jnp.where(
            colmask[..., None], new_row[:, None, :], tracks.obs
        ),
        n_obs=jnp.where(a, tracks.n_obs + 1, tracks.n_obs),
        tracked=jnp.where(a, tracks.tracked + 1, tracks.tracked),
        lost=jnp.where(a, 0, tracks.lost),
    )
    if defer_obs:
        return out, (colmask, new_row)
    return out


def compact_observations(tracks: TrackStore, obs_keep: jnp.ndarray) -> TrackStore:
    """Order-preserving deletion of observations (`MSCKF.py:760-769`).

    ``obs_keep`` (F, M) marks observations that survive; kept observations
    pack to the front in order, slots beyond the new ``n_obs`` come back
    zeroed (stale either way — the front-packed obs_valid invariant masks
    them everywhere). Tracks left with zero observations are invalidated
    (`MSCKF.py:770-773`).
    """
    F, M = tracks.obs.shape[:2]
    keep = tracks.obs_valid & obs_keep
    # destination of kept obs j = its rank among kept (cumsum), no argsort
    # (the (F, M) argsort cost ~90 us/frame on-chip; see stable_rank)
    kept_rank = jnp.cumsum(keep, axis=1) - 1  # (F, M)

    n_obs = jnp.sum(keep, axis=1).astype(jnp.int32)
    track_alive = tracks.valid & (n_obs > 0)
    # permutation as a one-hot batched matmul (MXU), not a gather: the
    # (F, M, C) take_along_axis was the hottest op of the marginalization
    # path.
    oh = (
        keep[:, None, :] & (kept_rank[:, None, :] == jnp.arange(M)[None, :, None])
    ).astype(tracks.obs.dtype)  # (F, M, M): oh[f, i, j] = obs j lands at row i
    obs = jnp.einsum("fij,fjc->fic", oh, tracks.obs)
    # restore the -1 cam-id padding sentinel on dead slots (the einsum zeroes
    # them, and cam id 0 is a REAL camera early in a run — state.py:189 pins
    # the invariant that unresolvable slots never alias a live camera)
    row_live = jnp.arange(M)[None, :] < n_obs[:, None]  # (F, M)
    # fused elementwise form: the .at[..., OBS_CAM_ID].set variant lowered
    # to a scatter + full-buffer copies under vmap (~0.3 ms/frame at batch
    # 32); this where fuses into the einsum consumer (identical values)
    ch_cam = jnp.arange(obs.shape[-1]) == OBS_CAM_ID
    obs = jnp.where(ch_cam & ~row_live[..., None], -1.0, obs)
    return tracks.replace(obs=obs, n_obs=n_obs, valid=track_alive)


def resolve_cam_slots(obs_cam_id: jnp.ndarray, cam_ids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map per-observation camera ids to current camera slots.

    Returns (slots, found) — slot index into the camera arrays and whether the
    id resolved (it always should for valid observations, since observations
    of marginalized cameras are deleted, `MSCKF.py:760-769`).
    """
    eq = obs_cam_id[..., None] == cam_ids  # (..., N)
    found = jnp.any(eq, axis=-1)
    slots = jnp.argmax(eq, axis=-1).astype(jnp.int32)
    return slots, found


def _select_rows_gather(idx: jnp.ndarray, ok: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Unbatched primal of :func:`select_rows`: a plain row gather.

    Single-sequence gathers with a contiguous output are fast on TPU (it is
    only *batch-varying* gathers under vmap that serialize); rebuilding the
    807 Hz full-shape path means the unbatched filter must keep this form.
    """
    out = x[jnp.clip(idx, 0, x.shape[0] - 1)]
    mask = ok.reshape(ok.shape + (1,) * (x.ndim - 1))
    if x.dtype == jnp.bool_:
        return mask & out
    return jnp.where(mask, out, 0)


def _select_rows_compare(idx: jnp.ndarray, ok: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched form of :func:`select_rows`: broadcast-compare + masked reduce.

    Bit-exact vs the gather for in-range rows — the reduce adds the one
    selected row to zeros, with no one-hot-matmul rounding — and inf-safe
    (``jnp.where``, never multiply-by-zero; see docs/numerics.md on inf*0
    poisoning).
    """
    F = x.shape[0]
    oh = (idx[:, None] == jnp.arange(F)) & ok[:, None]  # (U, F)
    mask = oh.reshape(oh.shape + (1,) * (x.ndim - 1))
    if x.dtype == jnp.bool_:
        return jnp.any(mask & x[None], axis=1)
    # dtype pinned: jnp.sum would promote int32 -> int64 under x64
    return jnp.sum(jnp.where(mask, x[None], 0), axis=1, dtype=x.dtype)


@jax.custom_batching.custom_vmap
def _select_rows(idx, ok, x):
    return _select_rows_gather(idx, ok, x)


@_select_rows.def_vmap
def _select_rows_vmap_rule(axis_size, in_batched, idx, ok, x):
    idx_b, ok_b, x_b = in_batched
    out = jax.vmap(
        _select_rows_compare,
        in_axes=(0 if idx_b else None, 0 if ok_b else None, 0 if x_b else None),
    )(idx, ok, x)
    return out, True


def select_rows(idx: jnp.ndarray, ok, x: jnp.ndarray) -> jnp.ndarray:
    """``x[idx]`` with rows where ``~ok`` zeroed — batching-aware.

    Unbatched this is a plain row gather (fast on TPU: the output is one
    contiguous block). Under ``vmap`` — the batched multi-trajectory filter —
    XLA lowers batch-varying gathers to slow serialized loops (the three
    hottest ops of the batch-32 filter, ~2 ms/frame each), so a
    ``custom_vmap`` rule swaps in the broadcast-compare + masked-reduce form.
    The two are bit-exact for in-range indices (the reduce adds the single
    selected row to zeros); every call site pre-clips ``idx`` and masks
    garbage rows via ``ok`` downstream.

    ``idx``: (U,) int32 row indices into ``x``'s leading axis (F).
    ``ok``: (U,) bool or True; rows with ``ok=False`` come back zero/False.
    """
    if ok is True:
        ok = jnp.ones(idx.shape, dtype=bool)
    return _select_rows(idx, ok, x)


def gather_cam_poses(obs_cam_id: jnp.ndarray, cams) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-observation camera pose lookup as a one-hot matmul.

    Returns (R (..., 3, 3), t (..., 3), onehot (..., N) float). Equivalent to
    ``cams.R[slots]`` for resolvable ids but runs on the MXU — the big
    (F, M)-shaped pose gathers were among the hottest ops in the full-shape
    device profile (XLA lowers TPU gathers to slow serialized loops).
    Unresolvable ids (invalid/padding observations) yield ZERO matrices
    instead of slot 0's pose; every consumer masks those rows out, and the
    zero forms stay finite through the downstream guards.
    """
    w = (obs_cam_id[..., None] == cams.cam_id).astype(cams.R.dtype)  # (..., N)
    N = cams.cam_id.shape[0]
    R = (w @ cams.R.reshape(N, 9)).reshape(obs_cam_id.shape + (3, 3))
    t = w @ cams.t
    return R, t, w
