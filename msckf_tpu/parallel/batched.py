"""Batched multi-sequence filtering: vmap across trajectories, sharded over a
device mesh.

The reference is strictly single-sequence and single-threaded
(`/root/reference/main.py:261`); the TPU build's scale-out axis is the
trajectory batch (BASELINE.json config 5: "vmap N trajectories per chip").
Trajectories are independent, so the sharding is pure data parallelism over a
``('data',)`` mesh — zero collectives on ICI/DCN, exactly as SURVEY.md §5
prescribes. Each device runs the full fixed-shape filter scan for its shard.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.msckf import frame_step, make_initial_state, run_sequence
from msckf_tpu.filter.state import FilterState
from msckf_tpu.ops.precision import with_f32_matmuls


def batched_dispatch(cfg: MSCKFConfig) -> MSCKFConfig:
    """Kernel-switch overrides for the vmapped path.

    The triage kernel's custom_vmap rule adds a batch GRID dimension, which
    Mosaic executes as a sequential per-trajectory loop, while the XLA
    fallback vectorizes the batch natively — measured at batch 32 on v5e
    (scripts/probe_batched_pallas.py): triage off 1977 agg Hz vs 1839 all-on.
    The propagation kernel's batched form is neutral-to-better (1839 vs 1826
    with it off), so it stays on. The shard_map path (one trajectory per
    device) traces the UNBATCHED program and keeps every kernel.

    Numerics note: on TPU this makes the vmapped path run the XLA triage
    fallback while the unbatched/shard_map paths run the Pallas kernel; the
    two agree only to ~2e-4 (tests/test_triage_fused.py), so batched-vs-
    single trajectories can diverge slightly ON CHIP. The strict
    `test_parallel.py::test_batched_matches_single` contract holds on the
    CPU/f64 lane where every kernel is off; kernel-level vmap equivalence is
    pinned in interpret mode (tests/test_pallas_batched.py), and the
    end-to-end cross-path interpret-lane test
    (tests/test_parallel.py::test_cross_path_interpret_parity) guards the
    dispatch split itself.

    Probing: pass ``dispatch_auto=False`` to the batched entry points to
    bypass these overrides (e.g. to re-probe the batched triage kernel after
    a Mosaic fix — scripts/probe_batched_pallas.py does).

    Correction island (round 5): the compensated double-word island KEEPS
    running under vmap, with its inner solve switched to the Newton-Schulz
    preconditioner (`island_solver="ns"`, `ops/compensated.refined_solve`).
    Round 4 had to degrade the island to plain f32 here because
    refined_solve's 6 LU custom calls serialized across the batch (measured
    309 ms/frame at batch 32 x D=207) and reproducibly crashed the TPU
    worker; the NS path is pure MXU matmuls — custom-call-free, natively
    batched — and the island's (D, D) products are Ozaki-scheme bf16 passes
    (`ozaki_matmul`), so the whole island vmaps. With x64 available (CPU
    lanes) the f64 island is kept, so batched==single parity tests are
    unaffected.
    """
    if cfg.use_pallas and cfg.use_pallas_triage:
        cfg = dataclasses.replace(cfg, use_pallas_triage=False)
    if cfg.gating_solver == "auto":
        # round-5 probe (scripts/probe_batched_r5.py, B=32): the gating
        # kernel's flattened-batch grid pays ~1.3 ms/frame of in-scan
        # grid-step overhead per update under vmap; the Jacobi-scaled
        # Newton-Schulz gamma (12 iterations, bf16-storage early) measured
        # 2868 -> 3324 agg Hz with IDENTICAL gate decisions on the circle
        # fixture. (At B>=128 the kernel wins again — HBM-bound NS — but
        # the per-trajectory optimum is B~32-64.)
        cfg = dataclasses.replace(cfg, gating_solver="ns", gating_ns_iters=12)
    want_island = cfg.correction_dtype == "compensated" or (
        cfg.correction_dtype == "float64" and not jax.config.jax_enable_x64
    )
    if want_island and cfg.jdtype == jnp.dtype("float32") and (
        cfg.island_solver != "ns"
    ):
        cfg = dataclasses.replace(
            cfg, correction_dtype="compensated", island_solver="ns"
        )
    return cfg


# backward-compat alias (pre-round-4 private name)
_batched_dispatch = batched_dispatch


def batched_initial_state(cfg: MSCKFConfig, batch: int, R_init=None) -> FilterState:
    """A batch of fresh filter states (leading axis on every leaf)."""
    one = make_initial_state(cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)
    if R_init is not None:
        R_init = jnp.asarray(R_init, dtype=cfg.jdtype)
        if R_init.ndim == 2:
            R_init = jnp.broadcast_to(R_init, (batch, 3, 3))
        states = states.replace(
            imu=states.imu.replace(R_WI=R_init),
            initialized=jnp.ones((batch,), dtype=bool),
        )
    return states


@with_f32_matmuls
def batched_run_sequence(cfg: MSCKFConfig, states: FilterState, prefix: dict,
                         frames: dict, dispatch_auto: bool = True,
                         assume_camera: bool = False):
    """vmap the full sequence scan across a trajectory batch.

    ``prefix``/``frames`` carry a leading batch axis on every array.
    ``dispatch_auto=False`` skips the vmapped-path kernel overrides
    (``batched_dispatch``) — probe/diagnostic use only.

    ``assume_camera`` matters MORE here than unbatched: under vmap the
    per-frame has_camera ``lax.cond`` becomes run-both-branches + a select
    over every carried leaf — (B, F, M, C) track buffers and the (B, D, D)
    covariance copied every frame. Pass True whenever the stream builder
    reports all-camera frame blocks (build_stream always produces them).
    """
    if dispatch_auto:
        cfg = batched_dispatch(cfg)
    return jax.vmap(
        lambda s, p, f: run_sequence(cfg, s, p, f, assume_camera=assume_camera)
    )(states, prefix, frames)


@with_f32_matmuls
def batched_frame_step(cfg: MSCKFConfig, states: FilterState, frames: dict,
                       dispatch_auto: bool = True, assume_camera: bool = False):
    """One camera-frame block for a batch of independent filters."""
    if dispatch_auto:
        cfg = batched_dispatch(cfg)
    return jax.vmap(
        lambda s, f: frame_step(cfg, s, f, assume_camera=assume_camera)
    )(states, frames)


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with the leading axis sharded over 'data'."""

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shardmap_run_sequence(cfg: MSCKFConfig, mesh: Mesh):
    """One-trajectory-per-device scaling via shard_map (batch == mesh size).

    Unlike the vmapped form (where ``lax.cond`` becomes run-both-branches
    select and Pallas kernels can't lower), each device traces the plain
    single-filter program — native conds, native kernels — so aggregate
    throughput is the single-sequence rate times the device count, with zero
    collectives.
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape["data"]

    def body(state, prefix, frames):
        # local shard has leading dim 1: run the unbatched filter
        state1 = jax.tree.map(lambda x: x[0], state)
        prefix1 = {k: v[0] for k, v in prefix.items()}
        frames1 = {k: v[0] for k, v in frames.items()}
        final, pre_out, fr_out = run_sequence(cfg, state1, prefix1, frames1)
        expand = lambda t: jax.tree.map(lambda x: x[None], t)
        return expand(final), expand(pre_out), expand(fr_out)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_run_sequence(cfg: MSCKFConfig, mesh: Mesh, assume_camera: bool = False):
    """jit-compiled batched sequence runner with batch-axis sharding.

    XLA partitions every per-trajectory op along the batch axis; because
    trajectories never interact, the compiled program contains no
    cross-device collectives — each chip filters its shard at full rate.
    """
    batch_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, static_argnums=())
    def run(states, prefix, frames):
        states = jax.lax.with_sharding_constraint(states, batch_sharding)
        return batched_run_sequence(
            cfg, states, prefix, frames, assume_camera=assume_camera
        )

    return run
