"""Device-trace profiler for the filter frame step.

Runs the (full- or small-shape) filter scan on the real TPU under
jax.profiler, then aggregates the perfetto trace by HLO op name prefix and
prints the top offenders + thunk counts. Drives the PERF.md optimization
loop (VERDICT r2 #2: dispatch count is the bottleneck).

Usage: python scripts/profile_frame.py [small|full|batched] [--frames N]
("batched": the vmapped 32-trajectory step, aggregated per frame-batch)
"""

import glob
import gzip
import json
import os
import sys

import numpy as np

# repo import without PYTHONPATH (which breaks axon TPU plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(cfg_kind: str):
    import jax

    from msckf_tpu import make_initial_state, reference_experiment_config, run_sequence
    from msckf_tpu.data.stream import build_stream, to_device
    from msckf_tpu.data.synthetic import generate_circle_sequence

    if cfg_kind == "fused":
        # the image-in fused CNN+filter program, exactly as bench_fused
        # builds it (msckf_tpu/pipeline.py)
        import jax.numpy as jnp

        import bench
        from msckf_tpu.data.stream import build_image_stream
        from msckf_tpu.models.train_xfeat import load_npz_params
        from msckf_tpu.pipeline import run_sequence_images

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

        def runf(state, prefix, frames, images):
            final, _, _ = run_sequence_images(
                cfg, params, state, prefix, frames, images, top_k=300
            )
            return final.imu.p_WI

        compiled = (
            jax.jit(runf).lower(state, std.prefix, std.frames, images).compile()
        )
        return compiled, (state, std.prefix, std.frames, images), images.shape[0]

    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    # correction_dtype="float32" everywhere EXCEPT the explicit island kind:
    # the bench's timed configs use the short-sequence island opt-out, and
    # since round 5 the island survives vmap (batched_dispatch keeps
    # compensated+ns), so the default would profile a different program.
    if cfg_kind == "full":
        cfg = reference_experiment_config(
            dtype="float32", correction_dtype="float32"
        )
    else:  # small + batched share the fixture-sized capacities
        cfg = reference_experiment_config(
            dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16,
            correction_dtype=(
                "compensated" if cfg_kind == "batched_island" else "float32"
            ),
        )
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
    )
    std = to_device(st, cfg)
    n_frames = std.frames["imu_ts"].shape[0]

    if cfg_kind in ("batched", "batched_island"):
        import jax.numpy as jnp

        from msckf_tpu.parallel.batched import (
            batched_initial_state, batched_run_sequence,
        )

        B = 32
        states = batched_initial_state(cfg, B, R_init=std.R_init)
        rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        prefix = {k: rep(v) for k, v in std.prefix.items()}
        frames = {k: rep(v) for k, v in std.frames.items()}

        def runb(states, prefix, frames):
            final, _, _ = batched_run_sequence(
                cfg, states, prefix, frames, assume_camera=True
            )
            return final.imu.p_WI

        compiled = jax.jit(runb).lower(states, prefix, frames).compile()
        return compiled, (states, prefix, frames), n_frames

    state = make_initial_state(cfg, std.R_init)

    def run(state, prefix, frames):
        final, _, _ = run_sequence(cfg, state, prefix, frames, assume_camera=True)
        return final.imu.p_WI

    compiled = jax.jit(run).lower(state, std.prefix, std.frames).compile()
    return compiled, (state, std.prefix, std.frames), n_frames


def aggregate(trace_dir, n_frames, reps):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert files, f"no trace in {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = [
        e
        for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and "dur" in e
    ]
    # keep only device-lane events (TensorFlow Op / XLA Ops tracks)
    by_op = {}
    pid_names = {}
    tid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n}
    total = 0.0
    n_events = 0
    for e in events:
        if e["pid"] not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Ops" not in tname and "Steps" not in tname:
            if "XLA" not in tname and "Ops" not in tname:
                continue
        name = e.get("name", "?")
        # strip trailing .N indices and fusion numbering for grouping
        base = name.split(".")[0]
        d = e["dur"]  # us
        rec = by_op.setdefault(base, [0.0, 0])
        rec[0] += d
        rec[1] += 1
        total += d
        n_events += 1
    per_frame = total / (n_frames * reps)
    print(f"\ndevice total: {total/1e3:.2f} ms, {n_events} events "
          f"({n_events/(n_frames*reps):.1f} thunks/frame), "
          f"{per_frame:.1f} us/frame device time")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1][0])
    print(f"{'op':<46}{'us/frame':>10}{'count/frame':>13}")
    for name, (dur, cnt) in rows[:40]:
        print(
            f"{name:<46}{dur/(n_frames*reps):>10.2f}{cnt/(n_frames*reps):>13.2f}"
        )


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "full"
    reps = 3
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    compiled, args, n_frames = build(kind)
    out = compiled(*args)
    jax.block_until_ready(out)  # warm-up

    trace_dir = f"/tmp/trace_{kind}"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = compiled(*args)
        jax.block_until_ready(out)
    aggregate(trace_dir, n_frames, reps)


if __name__ == "__main__":
    main()
