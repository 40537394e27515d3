"""Isolate the vmapped _topk_twostage cost (probe_cnn_tail: +0.444 ms/frame).

Hypotheses:
  a. the final cross-block index gather ``gidx.reshape(-1)[j]`` is a
     batch-varying gather -> serialized under vmap (the _gather_zeros
     pathology again);
  b. the stage-1/2 sorts themselves batch badly;
  c. the `blocks` shape is wrong for batched sorting.

Times, at B=26 x (480*640) scores:
  twostage          current code under vmap
  twostage-flat     same but final gather batch-flattened by hand
  blocks sweep      32 / 64 / 128 / 256 for the flat variant
  lax.top_k         plain full-width top_k under vmap (reference point)

Usage: python scripts/probe_topk_vmap.py
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

from msckf_tpu.models.xfeat import _topk_twostage


def twostage_flat(flat, k, blocks=64):
    """_topk_twostage with the final gather written batch-free (2-D forms)."""
    n = flat.shape[0]
    pad = (-n) % blocks
    C = (n + pad) // blocks
    x = jnp.pad(flat, (0, pad), constant_values=-jnp.inf).reshape(blocks, C)
    v, i = jax.lax.top_k(x, min(k, C))
    gidx = i + (jnp.arange(blocks, dtype=i.dtype) * C)[:, None]
    v2, j = jax.lax.top_k(v.reshape(-1), k)
    # one-hot matmul instead of gather: exact (single 1 per row)
    oh = (j[:, None] == jnp.arange(gidx.size)[None, :]).astype(jnp.int32)
    idx = jnp.sum(oh * gidx.reshape(-1)[None, :], axis=1)
    return v2, idx


def t_once(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    B, N, k = 26, 480 * 640, 300
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(-1, 1, size=(B, N)).astype(np.float32))

    f_two = jax.jit(jax.vmap(lambda s: _topk_twostage(s, k)))
    f_flat = jax.jit(jax.vmap(lambda s: twostage_flat(s, k)))
    f_plain = jax.jit(jax.vmap(lambda s: jax.lax.top_k(s, k)))

    for name, f in (("twostage", f_two), ("twostage-flat", f_flat),
                    ("lax.top_k", f_plain)):
        v, i = f(scores)
        dt = t_once(f, scores)
        print(f"{name:14s} {1e3 * dt / B:7.3f} ms/frame", flush=True)

    # exactness of the flat variant vs current
    v0, i0 = f_two(scores)
    v1, i1 = f_flat(scores)
    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    print("flat == twostage: exact", flush=True)

    for blocks in (32, 64, 128, 256, 512):
        f = jax.jit(jax.vmap(lambda s: twostage_flat(s, k, blocks=blocks)))
        v, i = f(scores)
        dt = t_once(f, scores)
        print(f"flat blocks={blocks:<4d} {1e3 * dt / B:7.3f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
