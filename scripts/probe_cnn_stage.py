"""Attribute the vmapped CNN stage cost (fused pipeline stage 1).

probe_fused_attrib round-5 rerun: CNN stage 0.631 ms/frame (chunk 26) vs
0.116 ms standalone single-image — a 5.4x batch penalty AFTER the
batch-flattened descriptor-gather fix. This probe separates:

  1. chunk-size sweep (26 / 51 / 102 / None): lax.map chunk overhead vs
     activation footprint;
  2. stage decomposition under vmap at the best chunk: backbone+heads vs
     NMS/top-k vs descriptor sampling — by timing truncated variants;
  3. single-image rate for reference (timed FIRST, clean queue).

Usage: python scripts/probe_cnn_stage.py
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

from msckf_tpu.models.train_xfeat import load_npz_params
from msckf_tpu.models.xfeat import XFeatModel, detect_and_compute

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "weights", "xfeat_selfsup.npz")
CACHE = os.path.join(REPO, ".jax_cache", "bench_rendered_640x480_v2.npz")


def t_once(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    params = load_npz_params(WEIGHTS)
    z = np.load(CACHE)
    images = jnp.asarray(z["images"][:104])  # (104, H, W)
    img1 = images[0]
    C = images.shape[0]
    top_k = 300

    # single image FIRST (clean dispatch queue)
    f1 = jax.jit(lambda im: detect_and_compute(params, im, top_k=top_k)[0])
    dt1 = t_once(lambda: f1(img1), reps=20)
    print(f"single image: {1e3 * dt1:7.3f} ms", flush=True)

    # chunk sweep
    for chunk in (13, 26, 52, 104, None):
        def stage(images, chunk=chunk):
            dc = lambda im: detect_and_compute(params, im, top_k=top_k)
            if chunk is None:
                return jax.vmap(dc)(images)[0]
            ch = images.reshape((C // chunk, chunk) + images.shape[1:])
            return jax.lax.map(jax.vmap(dc), ch)[0]

        fn = jax.jit(stage)
        try:
            compiled = fn.lower(images).compile()
        except Exception as e:  # OOM etc.
            print(f"chunk {str(chunk):>5}: compile failed: {e}", flush=True)
            continue
        dt = t_once(lambda: compiled(images))
        print(f"chunk {str(chunk):>5}: {1e3 * dt / C:7.3f} ms/frame", flush=True)

    # decomposition at chunk 26: forward only, + scores/topk, full
    chunk = 26

    def run_chunked(body, ims):
        ch = ims.reshape((C // chunk, chunk) + ims.shape[1:])
        return jax.lax.map(jax.vmap(body), ch)

    fwd = jax.jit(lambda ims: run_chunked(
        lambda im: XFeatModel().apply(params, im[None, :, :, None])[0], ims
    ))
    dt_f = t_once(lambda: fwd(images))
    print(f"backbone+heads only: {1e3 * dt_f / C:7.3f} ms/frame", flush=True)

    full = jax.jit(lambda ims: run_chunked(
        lambda im: detect_and_compute(params, im, top_k=top_k)[0], ims
    ))
    dt_full = t_once(lambda: full(images))
    print(f"full detect_and_compute: {1e3 * dt_full / C:7.3f} ms/frame",
          flush=True)
    print(f"=> NMS/topk/sampling tail: {1e3 * (dt_full - dt_f) / C:7.3f} "
          f"ms/frame", flush=True)


if __name__ == "__main__":
    main()
