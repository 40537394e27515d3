"""Filter-state checkpoint / resume.

The reference never serializes filter state (SURVEY.md §5: "Checkpoint /
resume: none"). The TPU build's state is one flat pytree of fixed-shape
arrays, which makes this trivial — and valuable for long multi-sequence
serving runs: snapshot mid-sequence, restore on another host/chip, continue
the scan bit-exactly.

Two backends: plain ``.npz`` (no dependencies) and Orbax (when installed).
"""

from __future__ import annotations

import numpy as np

import jax

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.state import FilterState, init_state


def _flatten(state: FilterState) -> dict:
    leaves, treedef = jax.tree.flatten(state)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}


def save_state(path: str, state: FilterState) -> None:
    np.savez_compressed(path, **_flatten(state))


def load_state(path: str, cfg: MSCKFConfig) -> FilterState:
    """Restore onto the shapes/dtypes implied by ``cfg`` (must match the
    config the checkpoint was written under)."""
    template = init_state(cfg)
    leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as data:
        loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for i, (t, l) in enumerate(zip(leaves, loaded)):
        if t.shape != l.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {l.shape} != config shape {t.shape}"
            )
    import jax.numpy as jnp

    return jax.tree.unflatten(
        treedef, [jnp.asarray(l, dtype=t.dtype) for t, l in zip(leaves, loaded)]
    )


def save_state_orbax(path: str, state: FilterState) -> None:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def load_state_orbax(path: str, cfg: MSCKFConfig) -> FilterState:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, init_state(cfg))
