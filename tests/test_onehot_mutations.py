"""One-hot mutation forms vs their scatter duals.

Track-store spawn/extend (and the matching/prune selections) are written as
broadcast-compare + masked-reduce / one-hot placements because batch-varying
index scatters and gathers serialize under vmap on TPU (`tracks.py`).  These
tests pin the placement forms bit-exactly against the straightforward
``.at[]`` scatter implementations on randomized stores — including slot
overflow and the extend capacity guard, edge cases the golden traces rarely
hit.  Reference mutation semantics: `/root/reference/src/msckf/MSCKF.py`
:291-309 (spawn), :403-412 (extend).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from msckf_tpu import reference_experiment_config
from msckf_tpu.filter.state import init_state, pack_obs
from msckf_tpu.filter.tracks import extend_tracks, spawn_tracks
from msckf_tpu.ops.geometry import idp_angles_m


def _cfg():
    return reference_experiment_config(
        dtype="float32", f_max=16, u_max=4, k_max=8, desc_dim=4
    )


def _random_store(cfg, rng, n_valid):
    state = init_state(cfg)
    tr = state.tracks
    F, M = cfg.f_max, cfg.m_max
    C = tr.obs.shape[-1]
    valid = np.zeros(F, bool)
    valid[rng.choice(F, size=n_valid, replace=False)] = True
    n_obs = np.where(valid, rng.integers(1, M + 1, size=F), 0)
    return tr.replace(
        obs=jnp.asarray(rng.normal(size=(F, M, C)).astype(np.float32)),
        n_obs=jnp.asarray(n_obs.astype(np.int32)),
        idp_base=jnp.asarray(rng.normal(size=(F, 3)).astype(np.float32)),
        idp_m=jnp.asarray(rng.normal(size=(F, 3)).astype(np.float32)),
        idp_rho=jnp.asarray(rng.uniform(0.01, 1, size=F).astype(np.float32)),
        tracked=jnp.asarray(rng.integers(1, 9, size=F).astype(np.int32)),
        lost=jnp.asarray(rng.integers(0, 3, size=F).astype(np.int32)),
        valid=jnp.asarray(valid),
        track_id=jnp.asarray(rng.integers(0, 99, size=F).astype(np.int32)),
    ), state.diag


def _spawn_scatter_reference(cfg, tr, diag, next_track_id, kp, desc, score,
                             spawn_mask, cam_R, cam_t, cam_id):
    """The pre-one-hot spawn implementation (masked ``.at[slot]`` scatters)."""
    dt_ = cfg.jdtype
    F, K = cfg.f_max, cfg.k_max
    free_order = jnp.sort(jnp.where(~tr.valid, jnp.arange(F), F))
    n_free = jnp.sum(~tr.valid)
    rank = jnp.cumsum(spawn_mask) - 1
    slot = jnp.where(
        spawn_mask & (rank < n_free), free_order[jnp.clip(rank, 0, F - 1)], F
    )
    overflow = jnp.sum(spawn_mask & (rank >= n_free))
    Kinv = jnp.asarray(cfg.K_inv_np, dtype=dt_)
    homog = jnp.concatenate([kp, jnp.ones((K, 1), dtype=dt_)], axis=-1)
    W_v = (homog @ Kinv.T) @ cam_R.T
    obs0 = pack_obs(
        kp, score, jnp.broadcast_to(cam_t, (K, 3)), W_v, desc,
        cam_id=cam_id.astype(dt_),
    )
    at = lambda a: a.at[slot]
    drop = dict(mode="drop")
    tracks = tr.replace(
        obs=tr.obs.at[slot, 0].set(obs0, **drop),
        n_obs=at(tr.n_obs).set(jnp.ones((K,), jnp.int32), **drop),
        idp_base=at(tr.idp_base).set(jnp.broadcast_to(cam_t, (K, 3)), **drop),
        idp_m=at(tr.idp_m).set(idp_angles_m(W_v), **drop),
        idp_rho=at(tr.idp_rho).set(jnp.full((K,), 0.1, dt_), **drop),
        tracked=at(tr.tracked).set(jnp.ones((K,), jnp.int32), **drop),
        lost=at(tr.lost).set(jnp.zeros((K,), jnp.int32), **drop),
        valid=at(tr.valid).set(jnp.ones((K,), bool), **drop),
        track_id=at(tr.track_id).set(
            (next_track_id + 1 + rank).astype(jnp.int32), **drop
        ),
    )
    return tracks, overflow, next_track_id + jnp.sum(spawn_mask).astype(jnp.int32)


@pytest.mark.parametrize("n_valid,n_spawn", [(3, 5), (14, 6), (16, 4), (0, 8)])
def test_spawn_matches_scatter_dual(n_valid, n_spawn):
    """(14 valid, 6 spawners) overflows 16 slots by 4 — the drop path."""
    cfg = _cfg()
    rng = np.random.default_rng(n_valid * 31 + n_spawn)
    tr, diag = _random_store(cfg, rng, n_valid)
    K = cfg.k_max
    kp = jnp.asarray(rng.uniform(0, 500, size=(K, 2)).astype(np.float32))
    desc = jnp.asarray(rng.normal(size=(K, cfg.desc_dim)).astype(np.float32))
    score = jnp.asarray(rng.uniform(size=K).astype(np.float32))
    spawn_mask = np.zeros(K, bool)
    spawn_mask[rng.choice(K, size=n_spawn, replace=False)] = True
    spawn_mask = jnp.asarray(spawn_mask)
    cam_R = jnp.asarray(np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32))
    cam_t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    cam_id = jnp.asarray(7, jnp.int32)
    next_id = jnp.asarray(41, jnp.int32)

    got_tr, got_diag, got_next = spawn_tracks(
        cfg, tr, diag, next_id, kp, desc, score, spawn_mask, cam_R, cam_t, cam_id
    )
    want_tr, want_overflow, want_next = _spawn_scatter_reference(
        cfg, tr, diag, next_id, kp, desc, score, spawn_mask, cam_R, cam_t, cam_id
    )
    for field in ("obs", "n_obs", "idp_base", "idp_m", "idp_rho", "tracked",
                  "lost", "valid", "track_id"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got_tr, field)),
            np.asarray(getattr(want_tr, field)),
            err_msg=field,
        )
    assert int(got_diag.n_track_overflow) == int(want_overflow)
    assert int(got_next) == int(want_next)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_extend_matches_scatter_dual(seed):
    cfg = _cfg()
    rng = np.random.default_rng(seed)
    tr, _ = _random_store(cfg, rng, n_valid=10)
    F, M = cfg.f_max, cfg.m_max
    # force some rows to the capacity boundary so the guard path executes
    n_obs = np.asarray(tr.n_obs).copy()
    full_rows = rng.choice(F, size=4, replace=False)
    n_obs[full_rows] = M
    tr = tr.replace(n_obs=jnp.asarray(n_obs))

    kp = jnp.asarray(rng.uniform(0, 500, size=(F, 2)).astype(np.float32))
    desc = jnp.asarray(rng.normal(size=(F, cfg.desc_dim)).astype(np.float32))
    score = jnp.asarray(rng.uniform(size=F).astype(np.float32))
    accept = jnp.asarray(rng.uniform(size=F) < 0.6)
    cam_R = jnp.asarray(np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32))
    cam_t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    cam_id = jnp.asarray(9, jnp.int32)

    got = extend_tracks(cfg, tr, accept, kp, desc, score, cam_R, cam_t, cam_id)

    # scatter dual of the one-hot column write
    dt_ = cfg.jdtype
    Kinv = jnp.asarray(cfg.K_inv_np, dtype=dt_)
    homog = jnp.concatenate([kp, jnp.ones((F, 1), dtype=dt_)], axis=-1)
    W_v = (homog @ Kinv.T) @ cam_R.T
    a = accept & (tr.n_obs < M)
    cols = jnp.where(a, jnp.clip(tr.n_obs, 0, M - 1), M)
    new_row = pack_obs(
        kp, score, jnp.broadcast_to(cam_t, (F, 3)), W_v, desc,
        cam_id=cam_id.astype(dt_),
    )
    want_obs = tr.obs.at[jnp.arange(F), cols].set(new_row, mode="drop")
    np.testing.assert_array_equal(np.asarray(got.obs), np.asarray(want_obs))
    np.testing.assert_array_equal(
        np.asarray(got.n_obs), np.asarray(jnp.where(a, tr.n_obs + 1, tr.n_obs))
    )
    # capacity-guarded rows must keep their newest observation untouched
    np.testing.assert_array_equal(
        np.asarray(got.obs)[full_rows], np.asarray(tr.obs)[full_rows]
    )
