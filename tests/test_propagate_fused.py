"""Hybrid propagation block (batched Phi/Qd + interpret-mode P-recurrence
kernel) vs the pure-scan form — the TPU production path's parity gate."""


import numpy as np

import jax
import jax.numpy as jnp

from msckf_tpu import reference_experiment_config
from msckf_tpu.filter.propagation import (
    _propagate_block_hybrid,
    _propagate_block_scan,
)
from tests.test_filter_units import CFG, _rand_state


def _block_inputs(rng, B=9, pad=2):
    ts = (1.0 + 0.005 * np.arange(1, B + 1)).astype(np.float64)
    gyro = rng.normal(size=(B, 3)) * 0.1
    acc = rng.normal(size=(B, 3)) + np.array([0, 0, 9.8])
    valid = np.ones(B, bool)
    if pad:
        valid[-pad:] = False  # padding ticks
    return map(jnp.asarray, (ts, gyro, acc, valid))


def _run_both(cfg, state, ts, gyro, acc, valid):
    # the interpret-lane env var is the sanctioned off-TPU switch: the call
    # site passes interpret=pallas_interpret() explicitly, which overrides
    # any functools.partial-style monkeypatch of the kernel wrapper
    import os

    ref_state, ref_outs = jax.jit(
        lambda s: _propagate_block_scan(cfg, s, ts, gyro, acc, valid)
    )(state)
    os.environ["MSCKF_TPU_PALLAS_INTERPRET"] = "1"
    try:
        hyb_state, hyb_outs = jax.jit(
            lambda s: _propagate_block_hybrid(cfg, s, ts, gyro, acc, valid)
        )(state)
    finally:
        del os.environ["MSCKF_TPU_PALLAS_INTERPRET"]
    return (ref_state, ref_outs), (hyb_state, hyb_outs)


def test_hybrid_block_matches_scan():
    rng = np.random.default_rng(4)
    cfg = reference_experiment_config(**{**CFG, "dtype": "float64"})
    state, _ = _rand_state(rng, cfg)
    state = state.replace(
        P=state.P.at[:15, :15].set(jnp.eye(15, dtype=cfg.jdtype) * 1e-4)
    )
    ts, gyro, acc, valid = _block_inputs(rng)
    (s1, o1), (s2, o2) = _run_both(cfg, state, ts, gyro, acc, valid)
    np.testing.assert_allclose(np.asarray(s1.P), np.asarray(s2.P), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s1.imu.R_WI), np.asarray(s2.imu.R_WI), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(s1.imu.p_WI), np.asarray(s2.imu.p_WI), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(s1.imu.v_WI), np.asarray(s2.imu.v_WI), atol=1e-13
    )
    assert int(s1.imu.step_id) == int(s2.imu.step_id)
    assert int(s1.imu.prop_count) == int(s2.imu.prop_count)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_hybrid_first_step_null_quirk():
    """prop_count == 0: the OC fix-up's null states are the constructor
    identity, not the pre-tick state (`IMU.py:38-39`)."""
    rng = np.random.default_rng(11)
    cfg = reference_experiment_config(**{**CFG, "dtype": "float64"})
    state, _ = _rand_state(rng, cfg)
    state = state.replace(
        imu=state.imu.replace(
            prop_count=jnp.zeros((), jnp.int32),
            timestamp=jnp.asarray(0.995, cfg.jdtype),
        )
    )
    ts, gyro, acc, valid = _block_inputs(rng, pad=0)
    (s1, o1), (s2, o2) = _run_both(cfg, state, ts, gyro, acc, valid)
    np.testing.assert_allclose(np.asarray(s1.P), np.asarray(s2.P), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s1.imu.R_WI), np.asarray(s2.imu.R_WI), atol=1e-13
    )
