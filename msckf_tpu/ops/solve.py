"""Correction-chain gain solve: Y = Bt^{-1} P, batched without custom calls.

The plain-f32 Kalman gain L = P B^{-1} (information form of `MSCKF.py:604-607`,
see `filter/update._correction_terms`) needs one (D, D) solve with D
right-hand sides per camera frame. XLA lowers `jnp.linalg.solve` to a
LAPACK-style LU custom call, which is fine for one system but (a) serializes
across a vmap batch and (b) forces batch-minor layout relayouts at the
custom-call boundary inside the scan — measured ~5 ms/frame-batch at batch
32, the single hottest op of the batched multi-trajectory filter.

The batched path instead runs **Newton-Schulz inversion** — pure batched MXU
matmuls, which is exactly what vmap parallelizes for free:

    X_0 = I / ||Bt||_inf,   X_{k+1} = X_k (2I - Bt X_k)

B = sigma^2 I + A P with A PSD and P PSD, so B's spectrum is real and
bounded below by sigma^2 > 0 (PA is similar to P^{1/2} A P^{1/2}), which
makes X_0 = I/||Bt||_inf provably contractive: the eigenvalues of Bt X_0 lie
in (0, 1], so ||I - Bt X_k|| -> 0 quadratically, reaching the f32 floor in
~log2(cond) + 4 iterations (cond ~1.2 on oracle-captured filter systems;
probe over 220 real updates). A final correction step Y <- Y + X (P - Bt Y)
polishes the solution below the f32 residual floor.

Robustness: a residual check gates a whole-batch LU fallback through
`lax.cond` — on the rare frame where some system's conditioning exceeds what
the fixed iteration count resolves, the batch pays the serialized custom
call; every other frame runs matmuls only. (The reference never faces this
choice: float64 NumPy `np.linalg.inv`, `MSCKF.py:604-614`.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.custom_batching import custom_vmap


def _ns_inverse(Bt: jnp.ndarray, iters: int, high_iters: int = 2,
                lowp_storage: bool = False) -> jnp.ndarray:
    """Batched Newton-Schulz approximate inverse of (..., D, D) Bt.

    Mixed precision (round 4): Newton's iteration is self-correcting — the
    error after an iteration is set by that iteration's arithmetic, not by
    how X was computed — so every iteration except the last ``high_iters``
    runs at the TPU's native bf16 matmul precision (one MXU pass instead of
    the six passes f32-"highest" costs). The bf16 iterations converge to the
    ~4e-3 bf16 representation floor; the final high-precision iterations
    square that to 1.6e-5 then 2.6e-10 — below the f32 floor the polish step
    in `_ns_solve` and the residual gates then operate at. The gain solve
    was ~1.2 ms/frame of the batched step profile (26 MXU passes at
    highest); this cuts its FLOP cost ~4x with no accuracy change past the
    gate (tests/test_solve.py pins the residual).
    """
    D = Bt.shape[-1]
    eye = jnp.eye(D, dtype=Bt.dtype)
    # seed scale: rho(Bt) <= sqrt(||Bt||_1 ||Bt||_inf) (tighter than the
    # plain inf-norm by up to sqrt(D) on row/col-unbalanced systems), and
    # the spectrum of Bt is real positive (see module docstring), so the
    # eigenvalues of Bt X_0 land in (0, 1] and the iteration is contractive;
    # the tighter bound starts the error lower, worth ~1-2 iterations
    norm_inf = jnp.max(jnp.sum(jnp.abs(Bt), axis=-1), axis=-1)
    norm_1 = jnp.max(jnp.sum(jnp.abs(Bt), axis=-2), axis=-1)
    norm = jnp.sqrt(norm_inf) * jnp.sqrt(norm_1)
    X = eye / norm[..., None, None]
    if lowp_storage and iters > high_iters:
        # bf16 ARRAYS (not just matmul inputs) for the early iterations:
        # halves the HBM traffic of the bandwidth-bound big-batch case. The
        # bf16 chain converges to the bf16 representation floor — the same
        # floor the bf16-precision matmuls already imposed — and the f32
        # finish squares it away identically (self-correction argument in
        # the docstring above).
        b16 = jnp.bfloat16
        Xl = X.astype(b16)
        Btl = Bt.astype(b16)
        eyel = eye.astype(b16)
        for _ in range(iters - high_iters):
            Xl = Xl @ (2.0 * eyel - Btl @ Xl)
        X = Xl.astype(Bt.dtype)
    else:
        with jax.default_matmul_precision("default"):
            for _ in range(max(iters - high_iters, 0)):
                X = X @ (2.0 * eye - Bt @ X)
    for _ in range(min(high_iters, iters)):
        X = X @ (2.0 * eye - Bt @ X)
    return X


def _ns_solve(Bt: jnp.ndarray, P: jnp.ndarray, iters: int) -> jnp.ndarray:
    # bf16 STORAGE for the early iterations (round 5): the batched gain
    # solve was the largest content term of the vmapped frame step
    # (~1.3 ms/frame-batch at batch 32, profile_attrib); bf16 arrays halve
    # its HBM traffic and the f32 finish restores the floor (self-correction
    # argument in _ns_inverse's docstring — same change the chi2 gate made).
    X = _ns_inverse(Bt, iters, lowp_storage=True)
    Y = X @ P
    # one polish step: err <- err * ||I - Bt X||
    return Y + X @ (P - Bt @ Y)


@functools.lru_cache(maxsize=None)
def _gain_solve_cv(iters: int, rel_tol: float):
    @custom_vmap
    def f(Bt, P):
        # single system: the pivoted LU custom call is fast and accurate
        return jnp.linalg.solve(Bt, P)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        Bt, P = (
            a if b else jnp.broadcast_to(jnp.asarray(a), (axis_size,) + jnp.asarray(a).shape)
            for b, a in zip(in_batched, args)
        )
        Y = _ns_solve(Bt, P, iters)
        # worst relative residual across the whole batch; NaN/inf -> fallback
        res = jnp.max(jnp.abs(P - Bt @ Y)) / jnp.maximum(jnp.max(jnp.abs(P)), 1e-30)
        ok = res < rel_tol  # NaN compares False
        Y = lax.cond(
            ok,
            lambda _: Y,
            lambda _: jnp.linalg.solve(Bt, P),
            operand=None,
        )
        return Y, True

    return f


def gain_solve(
    Bt: jnp.ndarray,
    P: jnp.ndarray,
    iters: int = 12,
    rel_tol: float = 1e-4,
) -> jnp.ndarray:
    """Solve Bt @ Y = P (see module docstring).

    Unbatched: LU. Under vmap: Newton-Schulz matmuls with a residual-gated
    whole-batch LU fallback (`lax.cond` — a real branch: the batch axis is
    internal to the rule, so only the chosen side executes).
    """
    return _gain_solve_cv(int(iters), float(rel_tol))(Bt, P)


def _residual_gate(Bt, P, Y, rel_tol):
    """Y if its residual is small, else the LU answer (NaN/inf -> LU)."""
    res = jnp.max(jnp.abs(P - Bt @ Y)) / jnp.maximum(jnp.max(jnp.abs(P)), 1e-30)
    return lax.cond(
        res < rel_tol,  # NaN compares False
        lambda _: Y,
        lambda _: jnp.linalg.solve(Bt, P),
        operand=None,
    )


def ns_solve_direct(
    Bt: jnp.ndarray,
    P: jnp.ndarray,
    iters: int = 12,
    rel_tol: float = 1e-4,
) -> jnp.ndarray:
    """Unconditionally-NS solve of Bt @ Y = P with the residual-gated LU
    fallback — `MSCKFConfig.gain_solver="ns"`: trades the single-sequence LU
    custom call for straight MXU matmuls."""
    return _residual_gate(Bt, P, _ns_solve(Bt, P, iters), rel_tol)


def chol_gain_solve(
    P: jnp.ndarray,
    A: jnp.ndarray,
    sigma2,
    rel_tol: float = 1e-4,
) -> jnp.ndarray:
    """Kalman gain L = P (sigma^2 I + A P)^{-1} via one Cholesky.

    Identity: M = sigma^2 P + P A P = P (sigma^2 I + A P) = P B, so
    L = P B^{-1} = P M^{-1} P — and M is SPD (P SPD, P A P PSD), so the
    pivoted LU custom call becomes a Cholesky one (and L is manifestly
    symmetric, as P B^{-1} must be). cond(M) ~ cond(P) cond(B), so an f32
    loss of positive definiteness is possible on ill-conditioned frames; the
    same residual gate as the NS path falls back to LU on B^T then.
    `MSCKFConfig.gain_solver="chol"`.
    """
    D = P.shape[-1]
    eye = jnp.eye(D, dtype=P.dtype)
    PA = P @ A
    Bt = sigma2 * eye + PA  # B^T (P, A symmetric)
    M = sigma2 * P + PA @ P
    Lc = jnp.linalg.cholesky(M)
    Y = jax.scipy.linalg.cho_solve((Lc, True), P)  # M^{-1} P
    L = P @ Y
    # gate on the original system: B^T L^T = P  (L^T = L candidate here)
    return _residual_gate(Bt, P, L.T, rel_tol).T
