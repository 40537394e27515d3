"""Double-word (compensated) f32 arithmetic for the EKF correction island.

This TPU has no float64 (`jax_enable_x64` SIGABRTs Mosaic and f64 HLO fails
to compile), but the information-form correction squares the Jacobian
condition number and plain f32 diverges on long weakly-observable sequences
(see ``MSCKFConfig.correction_dtype``). The reference sidesteps the issue
with float64 NumPy throughout (`/root/reference/src/msckf/MSCKF.py:604-614`).

Here each high-precision number is an unevaluated pair ``(hi, lo)`` of f32
with ``|lo| <= ulp(hi)/2`` — Dekker/Knuth double-word arithmetic giving
~2^-48 effective precision from pure IEEE-f32 adds/muls, which XLA lowers
to exact VPU ops on TPU (no MXU passes, no Mosaic, no x64). Primitives:

  * ``two_sum``  — Knuth's exact a + b = s + err (6 flops)
  * ``two_prod`` — Dekker's exact a * b = p + err via 12-bit splitting
                   (safe without FMA; an FMA-contracted ``a*b - p`` would
                   only make the error term MORE exact)
  * ``df_matmul`` — C = A @ B with two_prod partial products combined by a
                    double-word pairwise (tree) reduction over K

The linear solve uses double-word *iterative refinement*: an f32 LU solve
plus correction steps whose residuals are computed in double-word,
converging to forward error O(cond * 2^-48) — the double-word analog of the
classic mixed-precision refinement loop, without needing a double-word LU.

All functions are shape-polymorphic pure jnp and run identically on CPU
(where tests pin them against float64 NumPy) and TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for the 24-bit f32 mantissa


class DF(NamedTuple):
    """A double-word float: value = hi + lo (unevaluated sum)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def df_from(x) -> DF:
    x = jnp.asarray(x, dtype=jnp.float32)
    return DF(x, jnp.zeros_like(x))


def two_sum(a, b) -> DF:
    """Exact a + b = s + err (Knuth; no magnitude ordering required)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return DF(s, err)


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b) -> DF:
    """Exact a * b = p + err (Dekker splitting)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return DF(p, err)


def df_add(x: DF, y: DF) -> DF:
    """Double-word + double-word (Dekker add, ~11 flops)."""
    s = two_sum(x.hi, y.hi)
    t = two_sum(x.lo, y.lo)
    lo = s.lo + t.hi
    r = two_sum(s.hi, lo)
    lo2 = r.lo + t.lo
    return two_sum(r.hi, lo2)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_scale(x: DF, s) -> DF:
    """Double-word * plain f32 scalar/array (elementwise)."""
    p = two_prod(x.hi, s)
    return two_sum(p.hi, p.lo + x.lo * s)


def df_round(x: DF) -> jnp.ndarray:
    return x.hi + x.lo


def _tree_reduce_df(hi, lo, axis):
    """Sum a DF tensor along ``axis`` (a power-of-2 length; see _pad_pow2)
    with pairwise double-word adds."""
    n = hi.shape[axis]
    assert n & (n - 1) == 0, "tree reduction needs a power-of-2 axis"
    while n > 1:
        half = n // 2
        hi_h = jax.lax.slice_in_dim(hi, 0, half, axis=axis)
        hi_t = jax.lax.slice_in_dim(hi, half, n, axis=axis)
        lo_h = jax.lax.slice_in_dim(lo, 0, half, axis=axis)
        lo_t = jax.lax.slice_in_dim(lo, half, n, axis=axis)
        s = df_add(DF(hi_h, lo_h), DF(hi_t, lo_t))
        hi, lo = s.hi, s.lo
        n = half
    return DF(jnp.squeeze(hi, axis=axis), jnp.squeeze(lo, axis=axis))


def _pad_pow2(x, axis):
    n = x.shape[axis]
    p = 1
    while p < n:
        p *= 2
    if p == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, p - n)
    return jnp.pad(x, pad)


def df_matmul(A, B, A_lo=None, B_lo=None, chunk: int = 64) -> DF:
    """C = A @ B with double-word accumulation.

    A: (n, k) f32, B: (k, m) f32; optional low words ``A_lo``/``B_lo`` make
    either operand a double-word matrix (the A_lo*B_lo cross term at 2^-48
    relative is dropped). Partial products are exact (``two_prod``); the
    K-reduction is a pairwise double-word tree over chunks of ``chunk`` to
    bound the materialized (n, chunk, m) intermediate. Cost is O(n k m) VPU
    flops (~40x a plain matmul) — an accuracy island, not a throughput path.
    """
    A = jnp.asarray(A, jnp.float32)
    B = jnp.asarray(B, jnp.float32)
    n, k = A.shape
    m = B.shape[1]
    acc = DF(jnp.zeros((n, m), jnp.float32), jnp.zeros((n, m), jnp.float32))
    for k0 in range(0, k, chunk):
        k1 = min(k0 + chunk, k)
        Ac = A[:, k0:k1][:, :, None]  # (n, kc, 1)
        Bc = B[k0:k1, :][None, :, :]  # (1, kc, m)
        p = two_prod(Ac, Bc)  # (n, kc, m) exact partial products
        hi, lo = p.hi, p.lo
        # low-word contributions sit at ~2^-24 |A B|; their own rounding is
        # at 2^-48 — plain f32 products suffice
        if A_lo is not None:
            lo = lo + A_lo[:, k0:k1][:, :, None] * Bc
        if B_lo is not None:
            lo = lo + Ac * B_lo[k0:k1, :][None, :, :]
        hi = _pad_pow2(hi, 1)
        lo = _pad_pow2(lo, 1)
        s = _tree_reduce_df(hi, lo, axis=1)
        acc = df_add(acc, s)
    return acc


def df_matvec(A, x, A_lo=None) -> DF:
    """A @ x with double-word accumulation (x: (k,))."""
    r = df_matmul(A, x[:, None], A_lo=A_lo)
    return DF(r.hi[:, 0], r.lo[:, 0])


def _pow2_equilibration(M):
    """Row/column scales for diag(r) M diag(c), rounded to exact powers of 2
    (power-of-2 scaling is EXACT in f32: only the exponent changes)."""

    def scale_of(v):
        v = jnp.where(jnp.isfinite(v) & (v > 0), v, 1.0)
        return jnp.exp2(-jnp.round(jnp.log2(v)))

    r = scale_of(jnp.max(jnp.abs(M), axis=1))
    c = scale_of(jnp.max(jnp.abs(M * r[:, None]), axis=0))
    return r, c


def refined_solve(B: DF, C, iters: int = 3) -> DF:
    """Solve B X = C for X with double-word forward accuracy.

    B is a double-word (n, n) matrix, C an f32 (n, m) right-hand side.
    Power-of-2 row/column equilibration (exact in f32; kills the
    scale-heterogeneity conditioning that dominates filter covariances) +
    f32 LU of the scaled matrix + ``iters`` refinement steps with
    double-word residuals: X_{j+1} = X_j + B^{-1}(C - B X_j). The iteration
    contracts at ~cond(Bs) * 2^-24 per step and its fixed point is the TRUE
    solution up to the double-word residual floor, so the converged forward
    error is O(cond * 2^-48).

    Returns X as a DF pair (hi = refined f32 solution, lo = the running
    sub-ulp tail).
    """
    r, cs = _pow2_equilibration(B.hi)
    Bs = (B.hi * r[:, None]) * cs[None, :]
    lu, piv = jax.scipy.linalg.lu_factor(Bs)

    def scaled_solve(rhs):
        return cs[:, None] * jax.scipy.linalg.lu_solve((lu, piv), r[:, None] * rhs)

    X = scaled_solve(C)
    lo = jnp.zeros_like(X)
    for _ in range(iters):
        BX = df_matmul(B.hi, X, A_lo=B.lo)
        # the B.hi @ lo tail of the full product B (X + lo); explicit f32
        # precision — this module must not depend on a caller's
        # default_matmul_precision context (TPU default is bf16)
        tail = jax.lax.dot(B.hi, lo, precision=jax.lax.Precision.HIGHEST)
        BX = df_add(BX, DF(tail, jnp.zeros_like(X)))
        # res = C - B X  (C exact f32)
        res = df_add(df_from(C), df_neg(BX))
        dX = scaled_solve(res.hi + res.lo)
        # X <- X + dX, keeping the sub-ulp tail
        s = two_sum(X, dX + lo)
        X, lo = s.hi, s.lo
    return DF(X, lo)
