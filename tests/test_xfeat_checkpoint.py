"""load_xfeat_checkpoint round trip through an actual torch .pt file."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_load_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")

    from msckf_tpu.models.xfeat import (
        _TORCH_CONVS,
        _TORCH_PREFIXES,
        XFeatModel,
        init_params,
        load_xfeat_checkpoint,
    )

    params = init_params(jax.random.key(1), height=64, width=96)
    sd = {}
    for ours, theirs in _TORCH_PREFIXES.items():
        k = np.asarray(params["params"][ours]["conv"]["kernel"])
        sd[f"net.{theirs}.layer.0.weight"] = torch.from_numpy(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1))
        )
        sd[f"net.{theirs}.layer.1.running_mean"] = torch.from_numpy(
            np.asarray(params["batch_stats"][ours]["bn_mean"])
        )
        sd[f"net.{theirs}.layer.1.running_var"] = torch.from_numpy(
            np.asarray(params["batch_stats"][ours]["bn_var"])
        )
    for ours, theirs in _TORCH_CONVS.items():
        k = np.asarray(params["params"][ours]["kernel"])
        sd[f"net.{theirs}.weight"] = torch.from_numpy(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1))
        )
        sd[f"net.{theirs}.bias"] = torch.from_numpy(
            np.asarray(params["params"][ours]["bias"])
        )
    path = tmp_path / "xfeat.pt"
    torch.save(sd, str(path))

    tree = load_xfeat_checkpoint(str(path))
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 64, 96, 1)).astype(np.float32)
    )
    out_a = XFeatModel().apply(params, x)
    out_b = XFeatModel().apply(tree, x)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
