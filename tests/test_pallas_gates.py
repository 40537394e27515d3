"""Pallas dispatch-gate regressions (round-2 postmortem).

Round 2 shipped a gate (`filter/update.py` triage) that consulted only its
subsystem flag — not the ``cfg.use_pallas`` master — and probed
``jax.default_backend()`` while the computation targeted a CPU mesh: the
driver's 8-device dryrun crashed lowering a Mosaic kernel the entry point
thought it had disabled. These tests pin both properties of the fixed gate
(ops/backend.py) and add the off-TPU interpret lane that exercises the exact
gated kernel paths the real chip runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.filter.msckf import frame_step
from msckf_tpu.ops import backend as bk


def _cfg(**kw):
    kw.setdefault("dtype", "float32")
    kw.setdefault("f_max", 128)
    kw.setdefault("u_max", 16)
    kw.setdefault("k_max", 64)
    kw.setdefault("desc_dim", 10)
    return reference_experiment_config(**kw)


@pytest.fixture(scope="module")
def example_inputs():
    import __graft_entry__ as ge

    # shapes depend only on capacities, which all cfgs here share
    return ge._example_inputs(_cfg())


def _lowered_text(cfg, example_inputs):
    state, frame = example_inputs

    def fn(state, frame):
        new_state, _ = frame_step(cfg, state, frame)
        return new_state.imu.p_WI

    return jax.jit(fn).lower(state, frame).as_text()


def test_master_switch_disables_every_kernel(monkeypatch, example_inputs):
    """use_pallas=False must kill ALL kernels even when every subsystem flag
    is on and the platform probe swears it is a TPU (the round-2 bug: the
    triage gate ignored the master and the CPU dryrun crashed)."""
    monkeypatch.setattr(bk, "target_platform", lambda: "tpu")
    cfg = _cfg(use_pallas=False, use_pallas_triage=True, use_pallas_propagation=True)
    text = _lowered_text(cfg, example_inputs)  # would raise on CPU if gated in
    assert "pallas" not in text.lower()


def test_target_device_beats_default_backend(monkeypatch, example_inputs):
    """The axon-merged driver fiction: default backend reports the tunneled
    TPU while jax_default_device pins host CPUs. The gate must follow the
    actual target devices."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    try:
        assert bk.target_platform() == "cpu"
        cfg = _cfg(use_pallas=True)
        assert not bk.use_pallas(cfg)
        text = _lowered_text(cfg, example_inputs)
        assert "pallas" not in text.lower()
    finally:
        jax.config.update("jax_default_device", None)


def test_gate_opens_on_tpu_target(monkeypatch):
    monkeypatch.setattr(bk, "target_platform", lambda: "tpu")
    cfg = _cfg(use_pallas=True)
    assert bk.use_pallas(cfg)
    assert bk.use_pallas(cfg, cfg.use_pallas_triage)
    assert not bk.use_pallas(cfg, False)  # subsystem flag restricts


def test_interpret_lane_matches_xla_path(monkeypatch, example_inputs):
    """MSCKF_TPU_PALLAS_INTERPRET=1 routes every gated call site through its
    Pallas kernel (interpret mode) off-TPU — the test lane the round-2
    verdict asked for. The kernel path must agree with the XLA path."""
    state, frame = example_inputs

    cfg_xla = _cfg(use_pallas=False)
    ref_state, ref_out = jax.jit(
        lambda s, f: frame_step(cfg_xla, s, f)
    )(state, frame)

    monkeypatch.setenv("MSCKF_TPU_PALLAS_INTERPRET", "1")
    assert bk.pallas_interpret()
    cfg_pl = _cfg(use_pallas=True)
    assert bk.use_pallas(cfg_pl)  # opens even on the CPU backend
    pl_state, pl_out = jax.jit(
        lambda s, f: frame_step(cfg_pl, s, f)
    )(state, frame)

    np.testing.assert_allclose(
        np.asarray(pl_out.p_WI), np.asarray(ref_out.p_WI), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pl_state.P), np.asarray(ref_state.P), rtol=2e-3, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(pl_state.tracks.valid), np.asarray(ref_state.tracks.valid)
    )
