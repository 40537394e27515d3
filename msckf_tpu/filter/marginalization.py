"""Sliding-window management: camera marginalization and pruning.

Rebuilds `/root/reference/src/msckf/MSCKF.py:710-791`. The reference deletes
covariance rows/columns with ``np.delete`` (a reshape); here removal is a
gather with a compaction permutation over the padded buffers — surviving
cameras keep their insertion order, vacated slots are zeroed.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.state import FilterState
from msckf_tpu.filter.tracks import compact_observations, select_rows, stable_rank
from msckf_tpu.filter.update import ekf_update, triage_features


def remove_cameras(cfg: MSCKFConfig, state: FilterState, victim: jnp.ndarray) -> FilterState:
    """Marginalize the cameras marked in ``victim`` (slot mask).

    Equivalent to `MSCKF.py:751-779`: delete the 6 covariance rows/cols per
    victim (here: permute-compact and zero the tail), drop each victim's
    observations from every track (order-preserving), and delete emptied
    tracks.
    """
    victim = victim & state.cams.valid
    # no cond: with no victims the compaction permutation is the identity
    # (kept_order = active slots in order), the covariance gather copies P
    # unchanged, and observation compaction keeps everything — an exact
    # no-op. The permutation work every frame is cheaper than a lax.cond's
    # state copies at the branch boundary.
    return _remove_cameras_impl(cfg, state, victim)


def _remove_cameras_impl(cfg: MSCKFConfig, state: FilterState, victim: jnp.ndarray) -> FilterState:
    N, D = cfg.n_cam_slots, cfg.err_dim
    cams = state.cams
    keep = cams.valid & ~victim

    # compaction permutation over camera slots (kept slots first, in order):
    # dest i <- the kept slot with cumsum-rank i, sort-free (tracks.stable_rank)
    krank = jnp.cumsum(keep) - 1  # (N,)
    src = jnp.sum(
        jnp.where(
            keep[None, :] & (krank[None, :] == jnp.arange(N)[:, None]),
            jnp.arange(N, dtype=jnp.int32), 0,
        ),
        axis=1, dtype=jnp.int32,
    )  # (N,) — 0 beyond n_new, masked by slot_live below
    n_new = jnp.sum(keep).astype(jnp.int32)
    slot_live = jnp.arange(N) < n_new

    new_cams = cams.replace(
        R=jnp.where(
            slot_live[:, None, None],
            select_rows(src, slot_live, cams.R),
            jnp.eye(3, dtype=cams.R.dtype),
        ),
        t=jnp.where(slot_live[:, None], select_rows(src, slot_live, cams.t), 0.0),
        cam_id=jnp.where(slot_live, select_rows(src, slot_live, cams.cam_id), -1),
        valid=slot_live,
        n=n_new,
    )

    # covariance permutation: rows/cols [0:15] + 6 per kept camera, tail
    # zeroed. Applied per 6-row camera BLOCK as compare+reduce
    # (`tracks.select_rows`) on rows then columns — the (D, D) double
    # fancy-index gather was the hottest op of the batched filter (vmapped
    # covariance-sized gathers serialize, ~2 ms/frame each at batch 32);
    # the block select is bit-exact.
    live_rows = jnp.concatenate(
        [jnp.ones(15, dtype=bool), jnp.repeat(slot_live, 6)]
    )

    def permute_rows(P):
        cam = P[15:].reshape(N, 6, D)
        cam = select_rows(src, slot_live, cam).reshape(D - 15, D)
        return jnp.concatenate([P[:15], cam], axis=0)

    P = permute_rows(permute_rows(state.P).T).T
    P = jnp.where(live_rows[:, None] & live_rows[None, :], P, 0.0)

    # drop observations of victim cameras from every track (`MSCKF.py:760-769`)
    obs_is_victim = _obs_in_cam_mask(state.tracks.obs_cam_id, cams.cam_id, victim)
    tracks = compact_observations(state.tracks, ~obs_is_victim)

    return state.replace(cams=new_cams, P=P, tracks=tracks)


def _obs_in_cam_mask(obs_cam_id, cam_ids, cam_mask) -> jnp.ndarray:
    """(F, M) bool: observation's camera id resolves to a slot with
    ``cam_mask`` set. Equivalent to ``found & cam_mask[slots]`` (ids are
    unique) but compare+any instead of a gather — the (F, M) bool gathers
    serialized under vmap."""
    eq = obs_cam_id[..., None] == cam_ids  # (F, M, N)
    return jnp.any(eq & cam_mask, axis=-1)


def _per_camera_obs_mask(state: FilterState) -> jnp.ndarray:
    """(F, M, N) bool: live observation (f, m) belongs to camera slot n.

    Built as a broadcast compare, NOT a scatter: TPU scatters serialize (the
    (F*M)->N histogram scatter-add was the single hottest op in the full-shape
    device profile at ~215 us/frame), while compare+reduce vectorizes.
    """
    eq = state.tracks.obs_cam_id[..., None] == state.cams.cam_id  # (F, M, N)
    return eq & (state.tracks.valid[:, None] & state.tracks.obs_valid)[..., None]


def cameras_without_features(cfg: MSCKFConfig, state: FilterState) -> jnp.ndarray:
    """Slot mask of active cameras observed by no live track (`MSCKF.py:781-791`)."""
    any_obs = jnp.any(_per_camera_obs_mask(state), axis=(0, 1))  # (N,)
    return state.cams.valid & ~any_obs


def camera_observation_counts(cfg: MSCKFConfig, state: FilterState) -> jnp.ndarray:
    """Features-per-camera histogram (`MSCKF.py:712-716`)."""
    return jnp.sum(_per_camera_obs_mask(state), axis=(0, 1)).astype(jnp.int32)


def camera_first_encounter_rank(cfg: MSCKFConfig, state: FilterState) -> jnp.ndarray:
    """Rank (0..N-1) of each camera slot by the order the reference's
    ``prune_poorest_camera_states`` would first encounter it: iterate
    features in dict-insertion order (== ``track_id`` creation order, which
    survives slot recycling), and each feature's observations chronologically
    (`MSCKF.py:713-716` builds the counts dict in exactly this order; the
    stable ``sorted`` then preserves it among count ties)."""
    tr = state.tracks
    F, M, N = cfg.f_max, cfg.m_max, cfg.n_cam_slots
    per_cam = _per_camera_obs_mask(state)  # (F, M, N)
    BIG = jnp.int32(1 << 30)
    seq = jnp.where(tr.valid, tr.track_id, BIG)
    trank = stable_rank(seq)  # (F,) 0..F-1, sort-free
    enc = trank[:, None] * M + jnp.arange(M, dtype=jnp.int32)[None, :]  # (F, M)
    # min encounter index per camera as a masked reduce (not a scatter-min)
    first = jnp.min(
        jnp.where(per_cam, enc[..., None], jnp.int32(F * M)), axis=(0, 1)
    )
    return stable_rank(first)  # (N,) 0..N-1


def select_prune_victims(cfg: MSCKFConfig, state: FilterState) -> jnp.ndarray:
    """Slot mask of the (up to) two observed cameras with the fewest
    observations, count ties broken by first-encounter order
    (`MSCKF.py:713-723`)."""
    N = cfg.n_cam_slots
    counts = camera_observation_counts(cfg, state)
    eligible = state.cams.valid & (counts > 0)
    BIG = jnp.int32(1 << 24)
    enc_rank = camera_first_encounter_rank(cfg, state)
    key = jnp.where(eligible, counts * N + enc_rank, BIG)
    n_victims = jnp.minimum(jnp.sum(eligible), 2)
    # victims = the n_victims smallest keys == stable-rank < n_victims
    # (sort-free; ineligible slots share key BIG, so their stable ranks are
    # >= n_eligible >= n_victims and can never be selected)
    return stable_rank(key) < n_victims


def prune_poorest_camera_states(
    cfg: MSCKFConfig, state: FilterState, enable=None, branchless: bool = False
) -> FilterState:
    """`MSCKF.py:710-737`: pick the (up to) two observed cameras with the
    fewest feature observations, run a final update over the features that
    observe them, then marginalize.

    Tie-break: the reference's stable sort keeps dict insertion order — the
    order cameras are first encountered while iterating features — which
    ``camera_first_encounter_rank`` reproduces exactly (validated against
    forced-tie fixtures in tests/test_prune_tiebreak.py).

    ``enable`` (traced bool, optional): zero the victim mask when False —
    with no victims the triage subset is empty, the update terms are A=0/c=0
    (exact-identity correction), and ``remove_cameras`` is the identity
    permutation, so the whole call is an exact no-op (modulo the rotation
    re-orthonormalization round-off shared with the cond-free main update).
    ``branchless`` (static): drop the inner ``lax.cond`` on the second
    update by the same identity argument (`cfg.prune_path == "masked"`).
    """
    victim = select_prune_victims(cfg, state)
    if enable is not None:
        victim = victim & enable

    # features observing a victim camera (`MSCKF.py:726-731`)
    in_victim = (
        _obs_in_cam_mask(state.tracks.obs_cam_id, state.cams.cam_id, victim)
        & state.tracks.obs_valid
    )
    subset = state.tracks.valid & jnp.any(in_victim, axis=-1)

    tri = triage_features(cfg, state, subset)
    state = state.replace(tracks=tri.tracks)
    if branchless:
        state = ekf_update(cfg, state, tri.valid)
    else:
        state = lax.cond(
            jnp.any(tri.valid),
            lambda s: ekf_update(cfg, s, tri.valid),
            lambda s: s,
            state,
        )
    return remove_cameras(cfg, state, victim)
