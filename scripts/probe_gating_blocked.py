"""TPU probe for the round-4 blocked-panel gating kernel.

Correctness vs a HOST-side NumPy Cholesky reference (a TPU-compiled batched
cholesky at B=1024 wedges the remote compile server for minutes — learned the
hard way), then timing of the three batched dispatch candidates:

  1. new flattened blocked-panel Pallas kernel (the custom_vmap rule)
  2. round-3 XLA blocked Cholesky fallback (blocked_gamma_xla)
  3. the unbatched kernel at realistic single-trajectory sizes

Run from /root/repo (axon TPU): timeout 900 python scripts/probe_gating_blocked.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from msckf_tpu.ops import pallas_kernels as pk

B, U, n = 32, 32, 64
rng = np.random.default_rng(0)


def make_spd(shape_lead):
    A = rng.standard_normal(shape_lead + (n, n)).astype(np.float32)
    S = A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=np.float32)
    r = rng.standard_normal(shape_lead + (n,)).astype(np.float32)
    return S, r


def gamma_np(S, r):
    Sf = S.reshape(-1, n, n)
    rf = r.reshape(-1, n)
    out = np.empty(Sf.shape[0], dtype=np.float64)
    for i in range(Sf.shape[0]):
        L = np.linalg.cholesky(Sf[i].astype(np.float64))
        y = np.linalg.solve(L, rf[i].astype(np.float64))
        out[i] = y @ y
    return out.reshape(S.shape[:-2])


def bench(f, *args, reps=30):
    out = jax.block_until_ready(f(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts) * 1e3)


def main():
    print("devices:", jax.devices(), flush=True)

    # --- correctness + timing: batched (vmapped) form, (B, U, n, n) ---
    S, r = make_spd((B, U))
    ref = gamma_np(S, r)
    Sj, rj = jnp.asarray(S), jnp.asarray(r)

    f_new = jax.jit(jax.vmap(lambda s, x: pk.batched_gating_gamma(s, x)))
    out, ms = bench(f_new, Sj, rj)
    err = np.max(np.abs(np.asarray(out, dtype=np.float64) - ref) / np.abs(ref))
    print(f"[batched new flattened kernel] {ms:.3f} ms  rel_err={err:.2e}", flush=True)

    f_xla = jax.jit(lambda s, x: pk.blocked_gamma_xla(s, x))
    out2, ms2 = bench(f_xla, Sj, rj)
    err2 = np.max(np.abs(np.asarray(out2, dtype=np.float64) - ref) / np.abs(ref))
    print(f"[batched r3 XLA fallback]      {ms2:.3f} ms  rel_err={err2:.2e}", flush=True)

    # --- unbatched form at single-trajectory size (U=32) ---
    S1, r1 = make_spd((U,))
    ref1 = gamma_np(S1, r1)
    f_un = jax.jit(lambda s, x: pk.batched_gating_gamma(s, x))
    out3, ms3 = bench(f_un, jnp.asarray(S1), jnp.asarray(r1))
    err3 = np.max(np.abs(np.asarray(out3, dtype=np.float64) - ref1) / np.abs(ref1))
    print(f"[unbatched blocked kernel U={U}] {ms3:.3f} ms  rel_err={err3:.2e}", flush=True)

    ok = err < 5e-4 and err2 < 5e-4 and err3 < 5e-4
    print("OK" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
