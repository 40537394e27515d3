"""TPU probe: exact top-k strategies for the XFeat score map (H*W=307200,
k=300).

lax.top_k lowers to a full variadic stable sort on TPU (value + iota), so
the cost is sort passes over the payload. The two-stage exact form trades
global sort width for per-block sorts + a merge; the block count sets the
width of each stage. approx_max_k (TPU PartialReduce) is the non-exact
speed-of-light reference.

Run from /root/repo: timeout 900 python scripts/probe_topk.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from msckf_tpu.models.xfeat import _topk_twostage

H, W, K = 480, 640, 300
N = H * W
rng = np.random.default_rng(0)
# realistic shape: mostly -1 (non-peaks), ~10k positive peak scores
flat = np.full(N, -1.0, np.float32)
idx = rng.choice(N, 12000, replace=False)
flat[idx] = rng.random(12000).astype(np.float32)
x = jnp.asarray(flat)

ref_v, ref_i = jax.jit(lambda f: jax.lax.top_k(f, K))(x)
ref_v, ref_i = np.asarray(ref_v), np.asarray(ref_i)


def bench(f, reps=50):
    out = jax.block_until_ready(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts) * 1e3)


def check(name, out, ms, exact=True):
    v, i = np.asarray(out[0]), np.asarray(out[1])
    if exact:
        ok = np.array_equal(v, ref_v) and np.array_equal(i, ref_i)
        print(f"{name:<28} {ms:8.3f} ms  exact={ok}", flush=True)
    else:
        recall = len(set(i.tolist()) & set(ref_i.tolist())) / K
        print(f"{name:<28} {ms:8.3f} ms  recall={recall:.3f}", flush=True)


out, ms = bench(jax.jit(lambda f: jax.lax.top_k(f, K)))
check("global top_k", out, ms)

for blocks in (16, 32, 64, 128, 256, 512):
    out, ms = bench(jax.jit(lambda f, b=blocks: _topk_twostage(f, K, blocks=b)))
    check(f"two-stage blocks={blocks}", out, ms)

out, ms = bench(jax.jit(lambda f: jax.lax.approx_max_k(f, K)))
check("approx_max_k r=0.95", out, ms, exact=False)
out, ms = bench(
    jax.jit(lambda f: jax.lax.approx_max_k(f, K, recall_target=0.99))
)
check("approx_max_k r=0.99", out, ms, exact=False)
