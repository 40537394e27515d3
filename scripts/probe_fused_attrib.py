"""Decompose the fused-headline gap (VERDICT r4 weak #2 / next #2).

BENCH_r04: fused_e2e_hz 354.52 (2.82 ms/frame over the 26-frame rendered
sequence) vs e2e_sum_hz 808.07 (0.112 ms XFeat + 1/888 Hz filter) — a
~1.6 ms/frame loss the fusion thesis says should not exist. Candidate
terms this probe separates:

  A. per-CALL fixed overhead (dispatch + device_get of two scalars through
     the axon tunnel), amortized over only 26 frames in the fused bench vs
     240 in the filter benches;
  B. the batched CNN stage (vmap over the frame stack) being slower
     per-frame than the standalone single-image detect_and_compute;
  C. the filter scan itself on the rendered sequence (same shapes as
     filter_full — any difference is per-call overhead, not content,
     since shapes are identical).

Measurements (all on the real chip, rendered 640x480 sequence):
  1. trivial-program call time (RTT floor);
  2. fused program, fetch-per-call vs dispatch-k-then-fetch-once;
  3. CNN stage alone (batched over the stack), both fetch styles;
  4. filter-only scan on the pre-extracted features, both fetch styles.

Usage: python scripts/probe_fused_attrib.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from msckf_tpu import make_initial_state, reference_experiment_config
from msckf_tpu.data.stream import build_image_stream, to_device
from msckf_tpu.filter.msckf import run_sequence
from msckf_tpu.models.train_xfeat import load_npz_params
from msckf_tpu.models.xfeat import detect_and_compute
from msckf_tpu.pipeline import run_sequence_images

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def t_fetch_each(fn, reps=REPS):
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.device_get(fn())
    return (time.perf_counter() - t0) / reps


def t_fetch_once(fn, reps=REPS):
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def both(tag, fn, n_frames):
    a = min(t_fetch_each(fn) for _ in range(3))
    b = min(t_fetch_once(fn) for _ in range(3))
    print(
        f"{tag:34s} fetch-each {1e3 * a:8.2f} ms ({1e3 * a / n_frames:7.3f} "
        f"ms/fr)   fetch-once {1e3 * b:8.2f} ms ({1e3 * b / n_frames:7.3f} ms/fr)",
        flush=True,
    )
    return a, b


def main():
    data = bench._rendered_bench_sequence()
    params = load_npz_params(bench.WEIGHTS)
    H, W = data["images"].shape[1:]
    fxy = 320.0
    cfg = reference_experiment_config(
        dtype="float32", gain_solver="ns", correction_dtype="float32",
        K=((fxy, 0.0, W / 2.0), (0.0, fxy, H / 2.0), (0.0, 0.0, 1.0)),
        width=W, height=H,
        R_WC=tuple(map(tuple, data["R_WC_extrinsic"])),
    )
    st = build_image_stream(
        cfg, data["timestamps"], data["imu_gyro"], data["imu_acc"],
        data["cam_frame_ticks"],
    )
    std = to_device(st, cfg)
    images = jnp.asarray(data["images"][st.proc_cam_idx])
    state = make_initial_state(cfg, std.R_init)
    C = images.shape[0]
    print(f"n_frames={C}  image stack {images.shape}", flush=True)

    # 1. RTT floor: trivial program
    triv = jax.jit(lambda x: x + 1.0).lower(jnp.float32(0.0)).compile()
    rtt = min(t_fetch_each(lambda: triv(jnp.float32(1.0)), 20) for _ in range(3))
    print(f"trivial-call floor: {1e3 * rtt:.2f} ms", flush=True)

    # 2. fused program
    def run_fused(state, prefix, frames, images):
        final, _, _ = run_sequence_images(
            cfg, params, state, prefix, frames, images, top_k=300
        )
        return (
            jnp.linalg.norm(final.imu.p_WI),
            final.diag.n_track_overflow + final.diag.n_update_overflow,
        )

    fused_c = jax.jit(run_fused).lower(state, std.prefix, std.frames, images).compile()
    jax.device_get(fused_c(state, std.prefix, std.frames, images))
    both("fused (CNN stage + filter scan)",
         lambda: fused_c(state, std.prefix, std.frames, images), C)

    # 3. CNN stage alone, batched over the stack (as inside the fused prog)
    def cnn_stage(images):
        with jax.default_matmul_precision("default"):
            kp, desc, score, valid = jax.vmap(
                lambda im: detect_and_compute(params, im, top_k=300)
            )(images)
        return kp, desc, score, valid

    cnn_c = jax.jit(cnn_stage).lower(images).compile()
    feats = cnn_c(images)
    jax.block_until_ready(feats)
    both("CNN stage (vmapped stack)", lambda: cnn_c(images)[2], C)

    # 3b. standalone single-image CNN for reference
    img1 = images[0]
    one_c = jax.jit(
        lambda im: detect_and_compute(params, im, top_k=300)[2]
    ).lower(img1).compile()
    jax.block_until_ready(one_c(img1))
    a = min(t_fetch_once(lambda: one_c(img1), 20) for _ in range(3))
    print(f"{'CNN single image':34s} {1e3 * a:8.3f} ms/frame", flush=True)

    # 4. filter-only scan on pre-extracted features (same shapes as fused)
    kp, desc, score, valid = jax.tree.map(np.asarray, feats)
    frames = dict(
        std.frames,
        kp=jnp.asarray(kp, cfg.jdtype),
        desc=jnp.asarray(desc, cfg.jdtype),
        score=jnp.asarray(score, cfg.jdtype),
        kp_valid=jnp.asarray(valid),
    )

    def run_filter(state, prefix, frames):
        final, _, _ = run_sequence(cfg, state, prefix, frames, assume_camera=True)
        return (
            jnp.linalg.norm(final.imu.p_WI),
            final.diag.n_track_overflow + final.diag.n_update_overflow,
        )

    filt_c = jax.jit(run_filter).lower(state, std.prefix, frames).compile()
    jax.device_get(filt_c(state, std.prefix, frames))
    both("filter scan (rendered feats)",
         lambda: filt_c(state, std.prefix, frames), C)


if __name__ == "__main__":
    main()
