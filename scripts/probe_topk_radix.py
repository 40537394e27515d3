"""Exact radix-select top-k prototype vs lax.top_k (value AND index parity).

The CNN stage's dominant cost is top-k over H*W=307200 scores: the stable
sort (stage 1 of _topk_twostage) and the TopK custom call BOTH measure
~0.31 ms/frame in-graph (batch 102). This prototype replaces the full-width
sort with:

  1. sortable-uint transform (order-preserving f32 -> u32);
  2. radix-16 threshold select: 8 passes of 16-bin histograms (compare +
     reduce, no scatters) -> the k-th largest key T and the tie count;
  3. selected = (u > T) | (first `remaining` lowest-index ties) — exactly
     the set lax.top_k keeps (stable desc sort keeps lowest-index ties);
  4. index-ordered compaction of the k survivors by cumsum-rank,
     digit-factored one-hot MXU matmuls (no batch-varying gathers);
  5. one tiny lax.top_k over the k-buffer: stable desc on an index-ordered
     buffer == lax.top_k's (value desc, index asc) output order.

Usage: python scripts/probe_topk_radix.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def topk_radix(flat, k, r0=32):
    n = flat.shape[0]
    idx_f = jnp.arange(n, dtype=jnp.float32)

    b = lax.bitcast_convert_type(flat, jnp.uint32)
    u = jnp.where((b >> 31) == jnp.uint32(0), b | jnp.uint32(0x80000000), ~b)

    prefix = jnp.uint32(0)
    mask = jnp.uint32(0)
    remaining = jnp.int32(k)
    bins = jnp.arange(16, dtype=jnp.uint32)
    for shift in range(28, -1, -4):
        active = (u & mask) == prefix
        dig = (u >> jnp.uint32(shift)) & jnp.uint32(0xF)
        oh = (dig[None, :] == bins[:, None]) & active[None, :]
        hist = jnp.sum(oh, axis=1, dtype=jnp.int32)  # (16,)
        # elements with digit strictly greater than d (descending order)
        cnt_gt = jnp.cumsum(hist[::-1])[::-1] - hist
        sel = (cnt_gt < remaining) & (remaining <= cnt_gt + hist)
        dsel = jnp.sum(jnp.where(sel, bins, jnp.uint32(0)))
        remaining = remaining - jnp.sum(jnp.where(sel, cnt_gt, 0))
        prefix = prefix | (dsel << jnp.uint32(shift))
        mask = mask | (jnp.uint32(0xF) << jnp.uint32(shift))

    T = prefix
    gt = u > T
    eq = u == T
    take_eq = eq & (jnp.cumsum(eq.astype(jnp.int32)) <= remaining)
    selected = gt | take_eq  # exactly k elements (k <= n)

    rank = jnp.cumsum(selected.astype(jnp.int32)) - 1  # index-ordered
    r1n = (k + r0 - 1) // r0
    kpad = r1n * r0
    d0 = rank % r0
    d1 = rank // r0
    oh0 = ((d0[None, :] == jnp.arange(r0, dtype=jnp.int32)[:, None])
           & selected[None, :]).astype(jnp.float32)  # (r0, N)
    oh1 = ((d1[None, :] == jnp.arange(r1n, dtype=jnp.int32)[:, None])
           & selected[None, :]).astype(jnp.float32)  # (r1, N)
    tv = oh0 * flat[None, :]
    ti = oh0 * idx_f[None, :]
    # (r0, N) @ (N, r1) — each n contributes to exactly one (d0, d1).
    # HIGHEST precision: the one-hot extraction must return the f32 payload
    # bit-exactly (1.0 * v through the 3-term bf16 split is exact); default
    # bf16-input matmul would round values AND indices.
    hp = lax.Precision.HIGHEST
    vals2 = jnp.matmul(tv, oh1.T, precision=hp)  # (r0, r1)
    idx2 = jnp.matmul(ti, oh1.T, precision=hp)
    val_c = vals2.T.reshape(kpad)[:k]
    idx_c = idx2.T.reshape(kpad)[:k]
    # pad slots beyond the true selection count (k > n only) stay 0; callers
    # here always have k << n
    v_out, perm = lax.top_k(val_c, k)
    ohp = (perm[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
    i_out = jnp.matmul(ohp, idx_c[:, None],
                       precision=lax.Precision.HIGHEST)[:, 0]
    return v_out, i_out.astype(jnp.int32)


def timed_repeat(body, x, R=20):
    @jax.jit
    def prog(x):
        def step(c, _):
            v, i = body(x + 0.0 * c)
            return jnp.float32(jnp.sum(v) + jnp.sum(i)), ()
        c, _ = lax.scan(step, jnp.float32(0.0), None, length=R)
        return c
    _ = jax.device_get(prog(x))
    t0 = time.perf_counter()
    _ = jax.device_get(prog(x))
    return (time.perf_counter() - t0 - 0.025) / R


def main():
    k = 300
    B, N = 102, 480 * 640
    rng = np.random.default_rng(0)

    # correctness first (CPU-friendly shapes, adversarial ties)
    cases = {
        "uniform": rng.uniform(-1, 1, 5000).astype(np.float32),
        "quantized": (rng.integers(0, 40, 5000) / 40.0).astype(np.float32),
        "all-equal": np.full(5000, 0.25, np.float32),
        "neg-fill": np.where(rng.uniform(size=5000) < 0.9, -1.0,
                             rng.uniform(0, 1, 5000)).astype(np.float32),
        "with-zeros": np.where(rng.uniform(size=5000) < 0.5, 0.0,
                               rng.uniform(-1, 1, 5000)).astype(np.float32),
    }
    for name, arr in cases.items():
        x = jnp.asarray(arr)
        v0, i0 = lax.top_k(x, k)
        v1, i1 = jax.jit(lambda x: topk_radix(x, k))(x)
        ok_v = np.array_equal(np.asarray(v0), np.asarray(v1))
        ok_i = np.array_equal(np.asarray(i0), np.asarray(i1))
        print(f"{name:10s} values:{'OK' if ok_v else 'FAIL'} "
              f"indices:{'OK' if ok_i else 'FAIL'}", flush=True)
        assert ok_v and ok_i, name

    # batched timing (vmapped, the CNN-stage shape)
    x = jnp.asarray(rng.uniform(-1, 1, (B, N)).astype(np.float32))
    from msckf_tpu.models.xfeat import _topk_twostage

    for name, body in (
        ("twostage (current)", lambda xx: jax.vmap(
            lambda s: _topk_twostage(s, k))(xx)),
        ("lax.top_k", lambda xx: jax.vmap(
            lambda s: lax.top_k(s, k))(xx)),
        ("radix-select", lambda xx: jax.vmap(
            lambda s: topk_radix(s, k))(xx)),
    ):
        dt = timed_repeat(body, x)
        print(f"{name:20s} {1e3 * dt:7.2f} ms/call = "
              f"{1e3 * dt / B:7.4f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
