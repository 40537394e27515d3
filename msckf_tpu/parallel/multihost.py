"""Multi-host (pod-slice) scale-out for the batched filter.

Extends the single-host data-parallel mesh (`parallel/batched.py`) to
multi-process JAX: each host feeds its local shard of the trajectory batch,
`jax.make_array_from_process_local_data` assembles the global arrays, and
the jitted batched scan runs SPMD over the global ('data',) mesh. The
filter itself needs ZERO collectives (trajectories are independent,
SURVEY.md §5), so scaling is linear across ICI/DCN — the only cross-host
traffic is XLA's program orchestration.

Single-process use degrades gracefully to the local mesh, which is how the
test suite exercises every code path on a virtual-device CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msckf_tpu.config import MSCKFConfig


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize multi-process JAX (jax.distributed) when configured.

    Returns True when running multi-process. With no arguments and no
    cluster environment (TPU pod metadata, SLURM, ...), stays single-process
    and returns False — callers need no special-casing either way.

    NOTE: must run before anything initializes the XLA backend — even
    ``jax.process_count()``/``jax.devices()`` count (jax.distributed's own
    contract), so this function must not query them first. Exercised by the
    real two-process fixture (`scripts/multihost_demo.py`,
    tests/test_multihost.py).
    """
    if coordinator_address is None and num_processes is None:
        # auto-detection only: in a pod slice jax.distributed.initialize()
        # picks everything up from the TPU metadata; on a plain host (or
        # with the backend already initialized) it raises, which means
        # single-process
        try:
            jax.distributed.initialize()
        except Exception:
            return jax.process_count() > 1
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # tolerate a second call in the same process (idempotent use)
        if "once" not in str(e) and "already" not in str(e):
            raise
    return jax.process_count() > 1


def global_data_mesh() -> Mesh:
    """('data',) mesh over ALL global devices (every process sees the same
    mesh; each host holds its local slice of any array sharded over it)."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def shard_global_batch(tree, mesh: Mesh):
    """Assemble per-process local batch shards into global sharded arrays.

    Each process passes its LOCAL slice of the leading batch axis (the same
    shapes on every process); the result is a pytree of global arrays whose
    leading axis is the concatenation over processes, sharded over 'data'.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, tree)


def multihost_run_sequence(cfg: MSCKFConfig, mesh: Mesh):
    """Jitted batched sequence runner over the global mesh.

    Identical program to `parallel.batched.sharded_run_sequence` — under
    multi-process JAX the same jit executes SPMD across hosts.
    """
    from msckf_tpu.parallel.batched import batched_run_sequence

    batch_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def run(states, prefix, frames):
        states = jax.lax.with_sharding_constraint(states, batch_sharding)
        return batched_run_sequence(cfg, states, prefix, frames)

    return run


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's slice of a global trajectory batch."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide process count {n}"
    )
    per = global_batch // n
    return jax.process_index() * per, per
