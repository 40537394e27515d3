"""Masked mutual-nearest-neighbor cosine matching.

Rebuilds the XFeat matcher the reference calls through
`/root/reference/src/msckf/FeatureExtractor.py:62-84` (upstream
``XFeat.match``: dense cosine-similarity matrix, mutual argmax, strict
``> min_cossim`` gate on the per-row max). On TPU this is one
(F_MAX x K_MAX) matmul on the MXU plus two masked argmax reductions —
no index compaction; downstream consumers take boolean masks + index maps.

Descriptor fusion: the stored descriptor matched against the next frame is the
score-weighted average over the track's observation history
(`MSCKF.py:437-444`), recomputed here from the track store.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from msckf_tpu.filter.state import TrackStore


class MatchResult(NamedTuple):
    # per-track (input1 = fused track descriptors):
    track_matched: jnp.ndarray  # (F,) bool — track matched to some keypoint
    track_to_kp: jnp.ndarray  # (F,) int32 — matched keypoint index (valid where matched)
    # per-keypoint (input2 = current frame):
    kp_matched: jnp.ndarray  # (K,) bool — keypoint consumed by a match
    any_match: jnp.ndarray  # () bool — `len(matched.keypoints) == 0` guard (`MSCKF.py:320`)


def fused_descriptors(tracks: TrackStore) -> jnp.ndarray:
    """Score-weighted average descriptor per track (`MSCKF.py:439`)."""
    w = jnp.where(tracks.obs_valid, tracks.score, 0.0)  # (F, M)
    num = jnp.einsum("fm,fmd->fd", w, tracks.desc)
    den = jnp.sum(w, axis=-1, keepdims=True)
    return num / jnp.where(den == 0, 1.0, den)


def mutual_match(
    desc1: jnp.ndarray,  # (F, Dd) track descriptors
    valid1: jnp.ndarray,  # (F,) bool
    desc2: jnp.ndarray,  # (K, Dd) current keypoint descriptors
    valid2: jnp.ndarray,  # (K,) bool
    min_cossim: float,
) -> MatchResult:
    """Upstream XFeat.match semantics, masked.

    cossim = d1 @ d2^T; match12 = argmax_k; match21 = argmax_f;
    mutual = match21[match12[f]] == f; good = max_k cossim[f] > min_cossim.
    Ties resolve to the lowest index (torch.max and jnp.argmax agree).
    """
    neg = jnp.asarray(-1e30, dtype=desc1.dtype)
    sim = desc1 @ desc2.T  # (F, K) — raw dot product, descriptors pre-normalized
    sim = jnp.where(valid1[:, None] & valid2[None, :], sim, neg)

    match12 = jnp.argmax(sim, axis=1)  # (F,)
    best12 = jnp.max(sim, axis=1)  # (F,)
    match21 = jnp.argmax(sim, axis=0)  # (K,)

    # one-hot compare+reduce forms of match21[match12], valid2[match12] and
    # the kp_matched scatter — batch-varying gathers/scatters serialize
    # under vmap on TPU; eq12 has exactly one True per row (argmax in range)
    F, K = desc1.shape[0], desc2.shape[0]
    eq12 = match12[:, None] == jnp.arange(K)  # (F, K)
    mutual = jnp.any(eq12 & (match21[None, :] == jnp.arange(F)[:, None]), axis=1)
    if min_cossim > 0:  # upstream skips the similarity gate when <= 0
        good = best12 > jnp.asarray(min_cossim, dtype=desc1.dtype)
    else:
        good = jnp.ones_like(mutual)
    track_matched = valid1 & mutual & good & jnp.any(eq12 & valid2[None, :], axis=1)

    # keypoints consumed by matched tracks
    kp_matched = jnp.any(eq12 & track_matched[:, None], axis=0)
    return MatchResult(
        track_matched=track_matched,
        track_to_kp=match12.astype(jnp.int32),
        kp_matched=kp_matched,
        any_match=jnp.any(track_matched),
    )
