"""Single source of truth for Pallas kernel dispatch.

Every Pallas call site in the filter gates through :func:`use_pallas` —
never through ad-hoc ``jax.default_backend()`` checks. Two hard-won rules
are encoded here (round-2 regression postmortem):

1. ``cfg.use_pallas`` is the MASTER switch. The per-subsystem flags
   (``use_pallas_triage``, ``use_pallas_propagation``) only *further
   restrict* it; they can never re-enable a kernel the master turned off.
   Round 2 shipped a gate that consulted only the subsystem flag and the
   driver's 8-device CPU dryrun crashed lowering a kernel the entry point
   thought it had disabled.

2. The backend probe must reflect the devices the computation actually
   targets, not ``jax.default_backend()`` alone. The harness environment
   pins ``JAX_PLATFORMS=axon`` (a tunneled TPU) and *merges* user values, so
   a CPU-mesh computation can run in a process whose default backend still
   reports the TPU. Callers that retarget to CPU devices set
   ``jax.config.jax_default_device`` (the multichip dryrun does); we honor
   that before falling back to the default backend.

The ``MSCKF_TPU_PALLAS_INTERPRET=1`` environment variable forces every gate
open with kernels in interpret mode — the off-TPU test lane that exercises
the exact gated code paths the driver and the real chip run
(tests/test_pallas_gates.py).
"""

from __future__ import annotations

import os

import jax

_INTERPRET_ENV = "MSCKF_TPU_PALLAS_INTERPRET"


def pallas_interpret() -> bool:
    """True when the interpret-mode test lane is active: Pallas kernels run
    (slowly, anywhere) through the Pallas interpreter instead of Mosaic."""
    return os.environ.get(_INTERPRET_ENV, "") == "1"


def target_platform() -> str:
    """Platform of the devices an un-annotated computation will target.

    ``jax.config.jax_default_device`` wins when set (a process talking to a
    tunneled TPU but computing on host-CPU meshes sets it); otherwise the
    default backend.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        if isinstance(dev, str):
            return dev
        plat = getattr(dev, "platform", None)
        if plat:
            return str(plat)
    return jax.default_backend()


def use_pallas(cfg, subsystem_flag: bool = True) -> bool:
    """Should this call site dispatch to its Pallas kernel?

    ``cfg.use_pallas`` masters everything; ``subsystem_flag`` (e.g.
    ``cfg.use_pallas_triage``) restricts further; the platform probe keeps
    Mosaic kernels off non-TPU lowerings unless the interpret lane is on.
    """
    if not (cfg.use_pallas and subsystem_flag):
        return False
    if pallas_interpret():
        return True
    return target_platform() == "tpu"
