"""Feature front-end: extraction + matching wrapper.

Rebuilds `/root/reference/src/msckf/FeatureExtractor.py` around the Flax XFeat
model: ``extract_features`` (detectAndCompute top-k), batch extraction over an
image sequence (the TPU win the reference cannot have: all frames as one
batched CNN forward), and ``match_frames`` (mutual cosine matching between two
raw frames). The filter's track matching itself lives on-device in
``msckf_tpu.filter.matching``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from msckf_tpu.models.xfeat import detect_and_compute, init_params


class FeatureExtractor:
    """XFeat-based extractor (`FeatureExtractor.py:46-84`).

    params: a Flax variable tree (random unless converted from the upstream
    checkpoint with ``convert_torch_state_dict``).
    """

    def __init__(self, params=None, top_k: int = 300, refine_subpix: bool = False):
        self.params = params if params is not None else init_params(jax.random.key(0))
        self.top_k = top_k
        self._jit_extract = jax.jit(
            lambda p, img: detect_and_compute(
                p, img, top_k=top_k, refine_subpix=refine_subpix
            )
        )

    def extract_features(self, image: np.ndarray, top_k: int | None = None):
        """(keypoints, descriptors, scores) with invalid slots dropped,
        mirroring `FeatureExtractor.py:50-60`."""
        img = jnp.asarray(np.asarray(image, dtype=np.float32))
        kpts, desc, scores, valid = self._jit_extract(self.params, img)
        v = np.asarray(valid)
        return np.asarray(kpts)[v], np.asarray(desc)[v], np.asarray(scores)[v]

    def match(self, desc1: np.ndarray, desc2: np.ndarray, min_cossim: float = 0.82):
        """Mutual-NN cosine matching, upstream ``XFeat.match`` semantics.
        Returns (idxs1, idxs2)."""
        sim = np.asarray(desc1) @ np.asarray(desc2).T
        m12 = sim.argmax(axis=1)
        m21 = sim.argmax(axis=0)
        mutual = m21[m12] == np.arange(len(desc1))
        if min_cossim > 0:
            good = sim.max(axis=1) > min_cossim
            keep = mutual & good
        else:
            keep = mutual
        return np.arange(len(desc1))[keep], m12[keep]


def match_frames(extractor: FeatureExtractor, kp1, desc1, scores1, kp2, desc2, scores2):
    """Match two raw frames, returning aligned (kp/desc/score) pairs
    (`FeatureExtractor.py:86-117`; min_cossim defaults to upstream's 0.82)."""
    i1, i2 = extractor.match(desc1, desc2, min_cossim=0.82)
    out1 = (np.asarray(kp1)[i1], np.asarray(desc1)[i1], np.asarray(scores1)[i1])
    out2 = (np.asarray(kp2)[i2], np.asarray(desc2)[i2], np.asarray(scores2)[i2])
    return out1, out2


def draw_matches(image1: np.ndarray, keypoints1: np.ndarray,
                 image2: np.ndarray, keypoints2: np.ndarray) -> np.ndarray:
    """Homography-RANSAC debug visualization (`FeatureExtractor.py:119-139`):
    draw inlier matches and the warped corners of image1 on image2."""
    import cv2

    H, mask = cv2.findHomography(
        keypoints1, keypoints2, cv2.USAC_MAGSAC, 3.5, maxIters=1000, confidence=0.999
    )
    mask = mask.flatten()
    h, w = image1.shape[:2]
    corners = np.array(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], dtype=np.float32
    ).reshape(-1, 1, 2)
    warped = cv2.perspectiveTransform(corners, H)
    img2 = image2.copy()
    for i in range(len(warped)):
        a = tuple(warped[i - 1][0].astype(int))
        b = tuple(warped[i][0].astype(int))
        cv2.line(img2, a, b, (0, 0, 255), 4)
    kp1 = [cv2.KeyPoint(float(p[0]), float(p[1]), 5) for p in keypoints1]
    kp2 = [cv2.KeyPoint(float(p[0]), float(p[1]), 5) for p in keypoints2]
    matches = [cv2.DMatch(i, i, 0) for i in range(len(mask)) if mask[i]]
    return cv2.drawMatches(
        image1, kp1, img2, kp2, matches, None, matchColor=(0, 255, 0), flags=2
    )


def load_image_grayscale(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)


def extract_sequence_features(
    paths: Sequence[str], top_k: int = 300, params=None, batch: int = 8,
    refine_subpix: bool = False,
):
    """Extract features for a whole image sequence.

    The reference runs XFeat one frame at a time inside the filter loop
    (`MSCKF.py:271-274`); here extraction is hoisted out of the loop and
    same-shaped frames run as batched CNN forwards (``batch`` per dispatch,
    last chunk padded) — the TPU-first restructure that amortizes both the
    MXU launch and the host dispatch. Mixed-shape sequences fall back to
    per-frame extraction.
    """
    imgs = [load_image_grayscale(p) for p in paths]
    kps, descs, scores = [], [], []
    same_shape = len({im.shape for im in imgs}) == 1
    if same_shape and len(imgs) > 1:
        from msckf_tpu.parallel.xfeat_sharded import batched_detect_and_compute

        if params is None:
            # same loud warning the runner prints — a silent random-weight
            # CNN would make dataset runs meaningless without any signal
            print(
                "WARNING: extract_sequence_features called without XFeat "
                "weights — the CNN runs with random weights; real-image "
                "accuracy is meaningless"
            )
            params = init_params(jax.random.key(0))
        for i in range(0, len(imgs), batch):
            chunk = imgs[i : i + batch]
            n = len(chunk)
            while len(chunk) < batch and i > 0:  # pad the last chunk
                chunk = chunk + [chunk[-1]]
            arr = jnp.asarray(np.stack(chunk, axis=0))
            k, d, s, v = jax.device_get(
                batched_detect_and_compute(
                    params, arr, top_k=top_k, refine_subpix=refine_subpix
                )
            )
            for j in range(n):
                kps.append(k[j][v[j]])
                descs.append(d[j][v[j]])
                scores.append(s[j][v[j]])
        return kps, descs, scores
    fx = FeatureExtractor(params=params, top_k=top_k, refine_subpix=refine_subpix)
    for im in imgs:
        k, d, s = fx.extract_features(im)
        kps.append(k)
        descs.append(d)
        scores.append(s)
    return kps, descs, scores
