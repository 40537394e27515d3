"""Unit-level parity: single filter steps vs the NumPy oracle on randomized
states (complementing the end-to-end golden traces)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from msckf_tpu import reference_experiment_config
from msckf_tpu.filter.augmentation import state_augmentation
from msckf_tpu.filter.marginalization import remove_cameras
from msckf_tpu.filter.propagation import propagate, propagate_block
from msckf_tpu.filter.state import init_state
from tests.oracle.numpy_msckf import OracleMSCKF

CFG = dict(dtype="float64", f_max=64, u_max=16, k_max=32, n_cam_slots=8,
           m_max=8, max_camera_states=6)


def _rand_state(rng, cfg, n_cams=3):
    """A randomized-but-consistent filter state and a matching oracle."""
    state = init_state(cfg)
    o = OracleMSCKF(cfg, R_init=np.eye(3))
    R = Rotation.random(1, random_state=int(rng.integers(1 << 16))).as_matrix()[0]
    p = rng.normal(size=3)
    v = rng.normal(size=3)
    bg = rng.normal(size=3) * 0.01
    ba = rng.normal(size=3) * 0.01
    D = cfg.err_dim
    d = 15 + 6 * n_cams
    Pfull = rng.normal(size=(d, d)) * 0.01
    Pfull = Pfull @ Pfull.T
    P = np.zeros((D, D))
    P[:d, :d] = Pfull

    o.R, o.p, o.v, o.bg, o.ba = R.copy(), p.copy(), v.copy(), bg.copy(), ba.copy()
    o.R_null, o.p_null, o.v_null = R.copy(), p.copy(), v.copy()
    o.P = Pfull.copy()
    o.ts = 1.0
    o.step_id = 10

    camsR = Rotation.random(n_cams, random_state=7).as_matrix()
    camst = rng.normal(size=(n_cams, 3))
    for i in range(n_cams):
        o.cams.append({"id": 3 + i, "R": camsR[i].copy(), "t": camst[i].copy()})

    state = state.replace(
        imu=state.imu.replace(
            R_WI=jnp.asarray(R), p_WI=jnp.asarray(p), v_WI=jnp.asarray(v),
            bg=jnp.asarray(bg), ba=jnp.asarray(ba),
            timestamp=jnp.asarray(1.0), step_id=jnp.asarray(10, jnp.int32),
            prop_count=jnp.asarray(10, jnp.int32),
        ),
        cams=state.cams.replace(
            R=state.cams.R.at[:n_cams].set(jnp.asarray(camsR)),
            t=state.cams.t.at[:n_cams].set(jnp.asarray(camst)),
            cam_id=state.cams.cam_id.at[:n_cams].set(jnp.arange(3, 3 + n_cams)),
            valid=state.cams.valid.at[:n_cams].set(True),
            n=jnp.asarray(n_cams, jnp.int32),
        ),
        P=jnp.asarray(P),
    )
    return state, o


def test_single_propagation_step():
    rng = np.random.default_rng(0)
    cfg = reference_experiment_config(**CFG)
    state, o = _rand_state(rng, cfg)
    gyro = rng.normal(size=3) * 0.2
    acc = rng.normal(size=3) * 2 + np.array([0, 0, 9.8])
    ts = 1.005
    new = jax.jit(lambda s: propagate(cfg, s, jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(ts)))(state)
    o.process_imu(ts, gyro, acc)
    np.testing.assert_allclose(np.asarray(new.imu.R_WI), o.R, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new.imu.p_WI), o.p, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new.imu.v_WI), o.v, atol=1e-12)
    d = o.P.shape[0]
    np.testing.assert_allclose(np.asarray(new.P)[:d, :d], o.P, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new.P)[d:, :], 0.0, atol=0)


def test_propagate_block_equals_sequential():
    rng = np.random.default_rng(1)
    cfg = reference_experiment_config(**CFG)
    state, o = _rand_state(rng, cfg)
    B = 7
    ts = 1.0 + 0.005 * np.arange(1, B + 1)
    gyro = rng.normal(size=(B, 3)) * 0.1
    acc = rng.normal(size=(B, 3)) + np.array([0, 0, 9.8])

    seq = state
    step = jax.jit(lambda s, g, a, t: propagate(cfg, s, g, a, t))
    for i in range(B):
        seq = step(seq, jnp.asarray(gyro[i]), jnp.asarray(acc[i]), jnp.asarray(ts[i]))

    blk, outs = jax.jit(
        lambda s: propagate_block(cfg, s, jnp.asarray(ts), jnp.asarray(gyro),
                                  jnp.asarray(acc), jnp.ones(B, bool))
    )(state)
    np.testing.assert_allclose(np.asarray(blk.imu.R_WI), np.asarray(seq.imu.R_WI), atol=1e-13)
    np.testing.assert_allclose(np.asarray(blk.P), np.asarray(seq.P), atol=1e-13)
    # per-tick outputs = the sequential per-tick states
    np.testing.assert_allclose(np.asarray(outs[1][-1]), np.asarray(seq.imu.p_WI), atol=1e-13)


def test_augmentation_matches_oracle():
    rng = np.random.default_rng(2)
    cfg = reference_experiment_config(**CFG)
    state, o = _rand_state(rng, cfg)
    new = jax.jit(lambda s: state_augmentation(cfg, s))(state)
    o.augment()
    assert int(new.cams.n) == len(o.cams)
    np.testing.assert_allclose(np.asarray(new.cams.R[3]), o.cams[-1]["R"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(new.cams.t[3]), o.cams[-1]["t"], atol=1e-12)
    d = o.P.shape[0]
    np.testing.assert_allclose(np.asarray(new.P)[:d, :d], o.P, atol=1e-12)


def test_remove_cameras_matches_np_delete():
    rng = np.random.default_rng(3)
    cfg = reference_experiment_config(**CFG)
    state, o = _rand_state(rng, cfg, n_cams=5)
    victim = jnp.zeros(cfg.n_cam_slots, bool).at[jnp.asarray([1, 3])].set(True)
    new = jax.jit(lambda s: remove_cameras(cfg, s, victim))(state)
    o.remove_cameras([o.cams[1]["id"], o.cams[3]["id"]])
    assert int(new.cams.n) == 3 == len(o.cams)
    for i, c in enumerate(o.cams):
        np.testing.assert_allclose(np.asarray(new.cams.R[i]), c["R"], atol=0)
        assert int(new.cams.cam_id[i]) == c["id"]
    d = o.P.shape[0]
    np.testing.assert_allclose(np.asarray(new.P)[:d, :d], o.P, atol=0)
    np.testing.assert_allclose(np.asarray(new.P)[d:, :], 0.0, atol=0)
