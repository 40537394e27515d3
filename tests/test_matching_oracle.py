"""Mutual-NN matcher vs an independent torch implementation of the upstream
XFeat matching algorithm (dense cosine matrix, mutual argmax, strict
min_cossim gate on the row max) — validating semantics the filter's masked
matcher must reproduce."""

import numpy as np
import pytest

import jax.numpy as jnp

from msckf_tpu.filter.matching import mutual_match


def torch_mutual_match(d1, d2, min_cossim):
    """Upstream algorithm, written directly from its published form."""
    import torch

    f1 = torch.from_numpy(d1)
    f2 = torch.from_numpy(d2)
    cossim = f1 @ f2.t()
    cossim_t = f2 @ f1.t()
    _, match12 = cossim.max(dim=1)
    _, match21 = cossim_t.max(dim=1)
    idx0 = torch.arange(len(match12))
    mutual = match21[match12] == idx0
    if min_cossim > 0:
        best, _ = cossim.max(dim=1)
        good = best > min_cossim
        keep = mutual & good
    else:
        keep = mutual
    return idx0[keep].numpy(), match12[keep].numpy()


@pytest.mark.parametrize("min_cossim", [0.95, 0.82, 0.0])
def test_mutual_match_vs_torch(min_cossim):
    rng = np.random.default_rng(0)
    F, K, D = 40, 55, 16
    d1 = rng.normal(size=(F, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rng.normal(size=(K, D)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    # make some genuinely matching pairs
    d2[5] = d1[3]
    d2[10] = d1[7] + rng.normal(size=D).astype(np.float32) * 0.01
    d2[10] /= np.linalg.norm(d2[10])

    i1, i2 = torch_mutual_match(d1, d2, min_cossim)

    m = mutual_match(
        jnp.asarray(d1), jnp.ones(F, bool), jnp.asarray(d2), jnp.ones(K, bool),
        min_cossim,
    )
    got1 = np.where(np.asarray(m.track_matched))[0]
    got2 = np.asarray(m.track_to_kp)[got1]
    np.testing.assert_array_equal(np.sort(got1), np.sort(i1))
    order = np.argsort(got1)
    np.testing.assert_array_equal(got2[order], i2[np.argsort(i1)])
    # kp_matched marks exactly the consumed keypoints
    np.testing.assert_array_equal(
        np.where(np.asarray(m.kp_matched))[0], np.sort(i2)
    )


def test_mutual_match_masked_rows_excluded():
    rng = np.random.default_rng(1)
    F, K, D = 10, 10, 8
    d = rng.normal(size=(F, D)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    valid1 = np.ones(F, bool)
    valid1[4] = False
    m = mutual_match(jnp.asarray(d), jnp.asarray(valid1), jnp.asarray(d.copy()),
                     jnp.ones(K, bool), 0.9)
    assert not bool(m.track_matched[4])
    # every other identical row matches itself
    assert np.asarray(m.track_matched).sum() == F - 1
