"""Fused Pallas propagation block (interpret mode) vs the scan form."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from msckf_tpu import reference_experiment_config
from msckf_tpu.filter.propagation import _propagate_block_scan
from msckf_tpu.ops.pallas_kernels import propagate_block_fused
from tests.test_filter_units import CFG, _rand_state


def test_fused_block_matches_scan():
    rng = np.random.default_rng(4)
    cfg = reference_experiment_config(**{**CFG, "dtype": "float32"})
    state, _ = _rand_state(rng, cfg)
    state = jax.tree.map(
        lambda x: x.astype(cfg.jdtype)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        state,
    )
    B = 9
    ts = (1.0 + 0.005 * np.arange(1, B + 1)).astype(np.float32)
    gyro = rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    acc = (rng.normal(size=(B, 3)) + np.array([0, 0, 9.8])).astype(np.float32)
    valid = np.ones(B, bool)
    valid[-2:] = False  # padding ticks

    ref_state, ref_outs = jax.jit(
        lambda s: _propagate_block_scan(cfg, s, jnp.asarray(ts), jnp.asarray(gyro),
                                        jnp.asarray(acc), jnp.asarray(valid))
    )(state)

    imu = state.imu
    dt_ = cfg.jdtype
    outs = propagate_block_fused(
        imu.R_WI, imu.p_WI, imu.v_WI, imu.bg, imu.ba,
        imu.timestamp, imu.prop_count,
        jnp.asarray(ts, dt_), jnp.asarray(gyro, dt_), jnp.asarray(acc, dt_),
        jnp.asarray(valid),
        jnp.asarray(cfg.noise_cov_diag_np, dtype=dt_),
        jnp.asarray(cfg.gravity_np, dtype=dt_),
        state.P[:15, :15],
        interpret=True,
    )
    R, pv, meta, P15, Phi_acc, outR, outp, outv, outsig = outs

    np.testing.assert_allclose(np.asarray(R), np.asarray(ref_state.imu.R_WI), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pv[0]), np.asarray(ref_state.imu.p_WI), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pv[1]), np.asarray(ref_state.imu.v_WI), atol=2e-6)
    assert int(meta[0, 1]) == int(ref_state.imu.prop_count)
    np.testing.assert_allclose(
        np.asarray(P15), np.asarray(ref_state.P[:15, :15]), atol=1e-6
    )
    # per-tick outputs
    np.testing.assert_allclose(np.asarray(outp), np.asarray(ref_outs[1]), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(outsig[:, 0:3]), np.asarray(ref_outs[3]), atol=1e-6
    )
