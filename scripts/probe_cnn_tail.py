"""Sub-stage attribution of the vmapped detect_and_compute tail.

probe_cnn_stage: backbone 0.289 ms/frame, tail 0.526 — the tail dominates
the fused pipeline's CNN stage. Stages timed cumulatively (chunk 26, the
bench configuration):

  fwd       backbone + heads only
  +heat     + keypoint softmax heatmap + 5x5 NMS reduce_window + peak mask
  +rel      + full-res reliability upsample + score map
  +topk     + two-stage top-k
  +desc     + bicubic descriptor sampling + normalize (== full)

Usage: python scripts/probe_cnn_tail.py
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
from msckf_tpu.models import xfeat as X

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


def staged(params, image, stage, top_k=300):
    H, W = image.shape
    x = image[None, :, :, None].astype(jnp.float32)
    feats, kp_logits, reliability = X.XFeatModel().apply(params, x)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)
    if stage == "fwd":
        return feats.sum() + kp_logits.sum() + reliability.sum()

    hm = X.keypoint_heatmap(kp_logits)[0]
    local_max = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME"
    )
    is_peak = (hm == local_max) & (hm > 0.05)
    is_peak = is_peak.at[0, 0].set(False)
    is_peak = is_peak.at[H - 1, :].set(False).at[:, W - 1].set(False)
    if stage == "heat":
        return jnp.sum(is_peak)

    rel_up = X._reliability_fullres(reliability[0, :, :, 0], H, W)
    score_map = jnp.where(is_peak, hm * rel_up, -1.0)
    if stage == "rel":
        return jnp.sum(score_map)

    flat = score_map.reshape(-1)
    top_scores, top_idx = X._topk_twostage(flat, top_k)
    if stage == "topk":
        return jnp.sum(top_scores) + jnp.sum(top_idx)

    ky = (top_idx // W).astype(jnp.float32)
    kx = (top_idx % W).astype(jnp.float32)
    kpts = jnp.stack([kx, ky], axis=-1)
    desc = X.interpolate_sparse(feats[0], kpts, H, W, mode="bicubic")
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-12)
    return jnp.sum(desc) + jnp.sum(top_scores)


def main():
    params = load_npz_params(WEIGHTS)
    z = np.load(CACHE)
    images = jnp.asarray(z["images"])  # (104, H, W)
    C = images.shape[0]
    chunk = 26

    prev = 0.0
    for stage in ("fwd", "heat", "rel", "topk", "desc"):
        def run(ims, stage=stage):
            ch = ims.reshape((C // chunk, chunk) + ims.shape[1:])
            return jax.lax.map(
                jax.vmap(lambda im: staged(params, im, stage)), ch
            )

        fn = jax.jit(run)
        compiled = fn.lower(images).compile()
        dt = t_once(lambda: compiled(images)) / C * 1e3
        print(f"{stage:6s} {dt:7.3f} ms/frame  (+{dt - prev:6.3f})", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
