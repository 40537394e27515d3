"""On-chip long-sequence accuracy artifact: `classic` (10,798 ticks) on TPU.

VERDICT r4 missing #2 / next #4a: the compensated island's BENEFIT had no
on-chip artifact — docs/RESULTS.md rows were all backend=cpu. This runs the
reference's `classic` synthetic preset (long zero-acceleration straights,
the scale-unobservable worst case) on the REAL TPU three ways:

  float32     — plain f32 correction chain (the failure mode: the f64
                Joseph chain of `MSCKF.py:604-614` substituted by raw f32)
  compensated — the double-word island (the TPU-native default for long
                sequences; ozaki-scheme bf16 products since round 5)
  [cpu f64]   — reference row from docs/RESULTS.md for comparison (~17 m
                final ATE at mid noise, f64 island on CPU)

Writes a markdown row block to stdout for docs/RESULTS.md.

Usage: python scripts/classic_tpu_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from msckf_tpu.runner import main as run_main


def cell(correction_dtype: str):
    t0 = time.perf_counter()
    m = run_main(
        [
            "--source", "synthetic", "--sequence", "classic",
            "--noise_level", "mid", "--gen_noise", "default",
            "--max_frames", "30000", "--data_root", "/tmp/msckf_classic_tpu",
            "--correction_dtype", correction_dtype,
        ]
    )
    wall = time.perf_counter() - t0
    pos_c, rot_c = m.consistency_fraction()
    ate = np.linalg.norm(m.ate, axis=1)
    return {
        "correction": correction_dtype,
        "ticks": len(m.rte),
        "median_rte_pct": float(np.median(m.rte) * 100),
        "mean_ate_m": float(np.mean(ate)),
        "final_ate_m": float(ate[-1]),
        "ate_3s": pos_c,
        "aoe_3s": rot_c,
        "wall_s": wall,
    }


rows = []
for cd in ("none", "compensated"):
    label = "float32" if cd == "none" else cd
    print(f"=== classic / mid / correction={label} (TPU) ===", flush=True)
    r = cell(cd)
    r["correction"] = label
    rows.append(r)
    print(r, flush=True)

print("\nbackend:", jax.default_backend(), jax.devices()[0].device_kind)
print("\n| correction | ticks | RTE med % | mean ATE [m] | final ATE [m] "
      "| ATE in 3σ | AOE in 3σ |")
print("|---|---|---|---|---|---|---|")
for r in rows:
    print(
        f"| {r['correction']} | {r['ticks']} | {r['median_rte_pct']:.3f} "
        f"| {r['mean_ate_m']:.1f} | {r['final_ate_m']:.1f} "
        f"| {r['ate_3s']:.3f} | {r['aoe_3s']:.3f} |"
    )
