"""Sharded XFeat inference on the virtual (data, model) mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from msckf_tpu.models.xfeat import init_params
from msckf_tpu.parallel.xfeat_sharded import (
    batched_detect_and_compute,
    shard_params,
    xfeat_mesh,
)


def test_sharded_matches_unsharded():
    assert jax.device_count() >= 8
    params = init_params(jax.random.key(0), height=96, width=128)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, size=(4, 96, 128)).astype(np.float32))

    ref = batched_detect_and_compute(params, imgs, top_k=32)

    mesh = xfeat_mesh(4, 2)
    sp = shard_params(params, mesh)
    out = batched_detect_and_compute(sp, imgs, top_k=32, mesh=mesh)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
