"""Full-shape filter-only throughput probe (the bench.py filter_full_hz
measurement in isolation) — for regression bisection under identical tunnel
conditions. Usage: python scripts/probe_full.py [small|full|both]
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from msckf_tpu import reference_experiment_config
from msckf_tpu.data.synthetic import generate_circle_sequence

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

seq = generate_circle_sequence(rng=np.random.default_rng(0))
which = sys.argv[1] if len(sys.argv) > 1 else "full"
kw = {}
for a in sys.argv[2:]:
    k, v = a.split("=", 1)
    kw[k] = v if not v.replace(".", "").isdigit() else (int(v) if "." not in v else float(v))

if which in ("small", "both"):
    cfg = reference_experiment_config(dtype="float32", f_max=192, u_max=32, k_max=256, desc_dim=16, **kw)
    t0 = time.perf_counter()
    hz, _ = bench.bench_filter(jax, jnp, cfg, seq)
    print(f"small: {hz:.1f} Hz (wall {time.perf_counter()-t0:.0f}s)", flush=True)
if which in ("full", "both"):
    cfg = reference_experiment_config(dtype="float32", **kw)
    t0 = time.perf_counter()
    hz, _ = bench.bench_filter(jax, jnp, cfg, seq)
    print(f"full: {hz:.1f} Hz (wall {time.perf_counter()-t0:.0f}s)", flush=True)
