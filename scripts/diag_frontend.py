"""Front-end failure-mode split: repeatability vs descriptor confusion.

For each projected img1 keypoint: is there a detection within 1.5 px in
img2 (repeatability), and — given one — does mutual-NN matching pick a
keypoint within 3 px of the truth (descriptor accuracy)?

Round-3 measurement with the v4 weights (subpixel refinement on):
    mild: repeatability 0.175, mutual-NN-correct-given-detection 0.960
    hard: repeatability 0.159, mutual-NN-correct-given-detection 0.892
=> the detector head's cross-view repeatability is the quality bottleneck;
descriptors are near-saturated. The H-consistent NMS teacher (selfsup.
joint_corner_labels) is the training lever aimed at it.

Usage: python scripts/diag_frontend.py [weights.npz]
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from msckf_tpu.models.selfsup import make_batch
from msckf_tpu.models.train_xfeat import load_npz_params
from msckf_tpu.models.xfeat import detect_and_compute


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "weights/xfeat_selfsup.npz"
    v = load_npz_params(path)
    fn = jax.jit(functools.partial(detect_and_compute, top_k=200,
                                   refine_subpix=True))
    for hard in (False, True):
        rng = np.random.default_rng(999)
        kw = {} if hard else dict(scale=0.08, max_rot=0.1,
                                  scale_range=(0.95, 1.05))
        batch = make_batch(rng, 8, 256, **kw)
        rep, desc_ok = [], []
        for b in range(8):
            k1, d1, s1, v1 = jax.device_get(fn(v, jnp.asarray(batch.img1[b])))
            k2, d2, s2, v2 = jax.device_get(fn(v, jnp.asarray(batch.img2[b])))
            k1, d1 = k1[v1], d1[v1]
            k2, d2 = k2[v2], d2[v2]
            ph = np.concatenate([k1, np.ones((len(k1), 1))], -1)
            q = ph @ batch.H[b].T
            proj = q[:, :2] / q[:, 2:3]
            inside = ((proj[:, 0] >= 0) & (proj[:, 0] < 256)
                      & (proj[:, 1] >= 0) & (proj[:, 1] < 256))
            dist = np.linalg.norm(proj[:, None, :] - k2[None, :, :], axis=-1)
            has_det = dist.min(1) < 1.5
            rep.append(np.mean(has_det[inside]))
            sim = d1 @ d2.T
            m12 = sim.argmax(1)
            m21 = sim.argmax(0)
            mutual = m21[m12] == np.arange(len(k1))
            err = np.linalg.norm(proj - k2[m12], axis=-1)
            good = mutual & (err < 3.0)
            cand = inside & has_det
            desc_ok.append(np.mean(good[cand]) if cand.any() else np.nan)
        print(f"{'hard' if hard else 'mild'}: repeatability@1.5px "
              f"{np.mean(rep):.3f}; mutual-NN-correct given detection "
              f"{np.nanmean(desc_ok):.3f}")


if __name__ == "__main__":
    main()
