"""Matmul precision control.

On TPU, jnp matmuls default to bf16 MXU passes; the filter's covariance
algebra (Joseph updates, 3rd-order Phi chains, information-form gains) is
numerically fragile at bf16 and produces NaN trajectories. Every public filter
entry point traces under ``highest`` matmul precision (fp32 accumulation via
multi-pass MXU). The matrices are tiny (<= 207 x 207), so the 3-6x matmul
cost is invisible next to dispatch/fusion overheads.
"""

from __future__ import annotations

import functools

import jax


def with_f32_matmuls(fn):
    """Decorator: trace ``fn`` under highest (fp32) matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
