"""Batched-path Pallas dispatch probe (run on the real chip).

The round-3 batched trace shows two pallas_calls at ~1.8 ms/frame-batch each
at batch 32 — the triage and propagation kernels' custom_vmap rules add a
BATCH GRID dimension, which Mosaic executes as a sequential grid loop
(one tiny-shape step per trajectory), while the XLA fallbacks vectorize the
batch natively. Measure batch-32 aggregate Hz for each kernel-switch
combination to decide the batched dispatch defaults.

Usage: python scripts/probe_batched_pallas.py
"""
import os, sys, time, numpy as np, jax, jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from msckf_tpu import reference_experiment_config
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.parallel.batched import batched_initial_state, batched_run_sequence

seq = generate_circle_sequence(rng=np.random.default_rng(0))
BATCH = 32

def probe(label, **kw):
    # correction_dtype pinned: dispatch_auto=False bypasses batched_dispatch,
    # which normally degrades the island under vmap — the compensated island
    # crashes the TPU worker batched (parallel/batched.py round-4 note)
    cfg = reference_experiment_config(
        dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
        correction_dtype="float32", **kw)
    st = build_stream(cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc,
                      seq.cam_frame_ticks, seq.cam_keypoints,
                      seq.cam_descriptors, seq.cam_scores)
    std = to_device(st, cfg)
    n = std.frames["imu_ts"].shape[0]
    states = batched_initial_state(cfg, BATCH, R_init=std.R_init)
    rep = lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape)
    prefix = {k: rep(v) for k, v in std.prefix.items()}
    frames = {k: rep(v) for k, v in std.frames.items()}
    def run(states, prefix, frames):
        # dispatch_auto=False: measure the EXACT kernel-switch combination
        # requested, bypassing batched_dispatch's vmapped-path overrides
        # (otherwise the "all on" / "propagation off" configs would silently
        # measure triage-off and the batched triage kernel could never be
        # re-probed after a Mosaic fix).
        final, _, _ = batched_run_sequence(
            cfg, states, prefix, frames, dispatch_auto=False
        )
        return jnp.max(jnp.linalg.norm(final.imu.p_WI, axis=-1))
    compiled = jax.jit(run).lower(states, prefix, frames).compile()
    jax.device_get(compiled(states, prefix, frames))
    passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            jax.device_get(compiled(states, prefix, frames))
        passes.append((time.perf_counter() - t0) / 3)
    dt = sorted(passes)[1]
    print(f"{label}: {BATCH*n/dt:.0f} agg Hz, {1e3*dt/n:.2f} ms/frame-batch",
          flush=True)

probe("pallas all-on (current default)")
probe("triage off", use_pallas_triage=False)
probe("propagation off", use_pallas_propagation=False)
probe("both off", use_pallas_triage=False, use_pallas_propagation=False)
probe("all off (incl. gating)", use_pallas=False)
