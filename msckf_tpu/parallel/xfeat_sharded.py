"""Sharded XFeat inference: data-parallel images x tensor-parallel channels.

The filter itself is embarrassingly parallel over trajectories (pure dp, see
``parallel.batched``); the CNN front-end is where a model axis earns its
keep. This module runs batched ``detect_and_compute`` over a 2-D
``('data', 'model')`` mesh:

  * images shard over 'data' (independent frames),
  * activations/weights of the wide trunk blocks shard over 'model'
    (output channels), with XLA/GSPMD inserting the (ICI-resident)
    collectives at the channel-mixing boundaries.

On a single chip the constraints are no-ops; the multi-chip dry run
exercises the partitioned program on the virtual CPU mesh.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msckf_tpu.models.xfeat import detect_and_compute


def xfeat_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    devs = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def shard_params(params, mesh: Mesh):
    """Channel-shard the conv kernels of the wide (64/128-channel) blocks;
    replicate everything else."""

    n_model = mesh.shape["model"]

    def spec_for(x):
        if x.ndim == 4 and x.shape[-1] >= 64 and x.shape[-1] % n_model == 0:
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), params)


def batched_detect_and_compute(params, images: jnp.ndarray, top_k: int = 300,
                               mesh: Mesh | None = None,
                               refine_subpix: bool = False):
    """vmap detect_and_compute over a batch of images, optionally with the
    batch axis sharded over 'data'."""

    fn = jax.vmap(lambda img: detect_and_compute(
        params, img, top_k=top_k, refine_subpix=refine_subpix))
    if mesh is None:
        return jax.jit(fn)(images)

    data_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def run(imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, data_sharding)
        return fn(imgs)

    return run(images)
