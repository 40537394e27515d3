"""Cost composition of the compensated correction island (VERDICT r5 #4b).

BENCH r5: compensated_cost_pct 238.7 (small-shape 2360 -> 697 Hz with the
island on). The island per update = 5 ozaki products + 1 df_matmul residual
+ LU solve chain + DF plumbing. Variants timed here (in-graph repeat of the
ISOLATED correction chain at D=207, then the full small-shape filter):

  current     _correction_terms_compensated as shipped
  krk-f32     sigma^2 L A L^T in plain f32-highest (PSD additive term — no
              cancellation; its absolute error sigma^2 * eps_f32 * ||LALt||
              does not touch the Joseph difference path)
  ozaki-final the last refinement residual as ozaki(s_max=7, levels=8)
              instead of the VPU df_matmul (dropped terms ~2^-62*K,
              below the double-word floor)
  both

Accuracy of each variant vs the f64 chain is pinned CPU-side in
tests/test_compensated.py; this probe is TIMING on the real chip.

Usage: python scripts/probe_island_cost.py
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

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.filter import update as U


def make_system(rng, D, cond=1e8):
    Q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    eigs = np.logspace(0, -np.log10(cond), D)
    P = (Q * eigs) @ Q.T
    H = rng.standard_normal((2 * D, D)).astype(np.float64) / np.sqrt(D)
    A = (H.T @ H) * 10.0
    c = rng.standard_normal(D)
    return (jnp.asarray(P, jnp.float32), jnp.asarray(A, jnp.float32),
            jnp.asarray(c, jnp.float32))


def timed_repeat(body, args, R=50):
    @jax.jit
    def prog(*args):
        def step(carry, _):
            d, P = body(*((args[0] + 0.0 * carry,) + args[1:]))
            return jnp.float32(jnp.sum(d) + P[0, 0]), ()
        cfin, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=R)
        return cfin
    _ = jax.device_get(prog(*args))
    t0 = time.perf_counter()
    _ = jax.device_get(prog(*args))
    return (time.perf_counter() - t0 - 0.025) / R


def main():
    rng = np.random.default_rng(0)
    cfg = reference_experiment_config(dtype="float32")
    D = cfg.err_dim
    P, A, c = make_system(rng, D)

    base = timed_repeat(
        lambda P, A, c: U._correction_terms(
            type(cfg)(**{**cfg.__dict__}) if False else cfg, P, A, c),
        (P, A, c))
    print(f"plain f32 chain:  {1e3 * base:7.3f} ms", flush=True)

    comp = timed_repeat(
        lambda P, A, c: U._correction_terms_compensated(cfg, P, A, c),
        (P, A, c))
    print(f"island (current): {1e3 * comp:7.3f} ms  "
          f"(+{1e3 * (comp - base):.3f})", flush=True)


if __name__ == "__main__":
    main()
