"""Small-matrix algebra unrolled for the VPU.

XLA lowers batched tiny matmuls ((N, 3, 3) dot_generals) onto the 128x128 MXU
with catastrophic padding, and batched tiny eigh/svd/lu to expensive
custom-calls (the device trace showed the gating LU at ~1.1 ms/frame and the
triage eigh at ~0.26 ms/frame). Everything here is closed-form / unrolled
element arithmetic over the batch axes — it fuses into a handful of VPU loops.

Key exactness notes:
  * ``tikhonov_apply_sym3(X, y)`` computes (X + eps*tr(X) I)^-1 y. For the
    filter's two uses the right-hand side always lies in range(X) (y = X b
    forms), where the Tikhonov solution converges to pinv(X) y with relative
    error O(eps) — so it matches the reference's np.linalg.pinv /
    scipy null_space formulations within round-off for well-conditioned
    bundles and degrades gracefully (never NaN) for degenerate ones.
  * ``polar_orthonormalize`` (Newton-Schulz) converges quadratically to the
    same U V^T polar factor that SVD re-orthonormalization produces
    (`MSCKF.py:633-634`); inputs are products of orthogonal matrices, i.e.
    within round-off of orthogonal, so 3 iterations reach machine precision.
"""

from __future__ import annotations

import jax.numpy as jnp


def matmul_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(..., m, k) @ (..., k, n) with small static m, k, n — unrolled."""
    m, k = A.shape[-2], A.shape[-1]
    n = B.shape[-1]
    rows = []
    for i in range(m):
        cols = []
        for j in range(n):
            acc = A[..., i, 0] * B[..., 0, j]
            for l in range(1, k):
                acc = acc + A[..., i, l] * B[..., l, j]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def matvec_small(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(..., m, k) @ (..., k) unrolled."""
    m, k = A.shape[-2], A.shape[-1]
    outs = []
    for i in range(m):
        acc = A[..., i, 0] * x[..., 0]
        for l in range(1, k):
            acc = acc + A[..., i, l] * x[..., l]
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def transpose_small(A: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(A, -1, -2)


def inv3(A: jnp.ndarray, det_eps: float = 0.0) -> jnp.ndarray:
    """Closed-form 3x3 inverse via the adjugate. Batched, unrolled."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    det = jnp.where(jnp.abs(det) < det_eps, jnp.where(det < 0, -det_eps, det_eps), det)
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], -1),
            jnp.stack([co10, co11, co12], -1),
            jnp.stack([co20, co21, co22], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def tikhonov_inv_sym3(X: jnp.ndarray, rcond: float) -> jnp.ndarray:
    """(X + rcond*tr(X)*I)^-1 for symmetric PSD X (batched, closed form).

    Trace-normalizes before the adjugate inverse: cofactors square and the
    determinant cubes the entry magnitudes, which overflows f32 for the
    filter's 1/z^2-scaled Gram matrices. After normalization the eigenvalues
    lie in [0, 3], so every intermediate stays O(1).
    """
    tr = X[..., 0, 0] + X[..., 1, 1] + X[..., 2, 2]
    floor = 1e-200 if X.dtype == jnp.float64 else 1e-20
    scale = jnp.maximum(tr / 3.0, floor)[..., None, None]
    Xn = X / scale + (3.0 * rcond) * jnp.eye(3, dtype=X.dtype)
    return inv3(Xn, det_eps=1e-300 if X.dtype == jnp.float64 else 1e-38) / scale


def polar_orthonormalize(R: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Newton-Schulz iteration to the polar factor (== SVD's U V^T).

    X <- 1.5 X - 0.5 X X^T X; quadratic convergence for singular values in
    (0, sqrt(3)). The filter's inputs are near-orthogonal products, so
    ``iters=3`` reaches machine precision in both f32 and f64.
    """
    X = R
    for _ in range(iters):
        XtX = matmul_small(transpose_small(X), X)
        X = 1.5 * X - 0.5 * matmul_small(X, XtX)
    return X


def default_rcond(dtype) -> float:
    return 1e-12 if jnp.dtype(dtype) == jnp.float64 else 1e-6
