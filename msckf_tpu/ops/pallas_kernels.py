"""Pallas TPU kernels for the filter's remaining custom-call hot spots.

``batched_gating_gamma`` fuses the per-feature chi-square statistic
gamma_j = r_j^T (S_j)^{-1} r_j over the update batch into ONE kernel:
an in-VMEM batched Cholesky (masked right-looking outer-product form, all
(U, 2M, 2M) work vectorized across the batch) followed by a batched forward
substitution, so gamma = ||L^{-1} r||^2. XLA lowers the same computation to a
CholeskyExpander custom-call plus triangular-solve calls that the device
trace showed at ~0.5 ms/frame; the fused kernel keeps S resident in VMEM and
runs the 2M-step recurrences without per-step HLO thunks.

Padding rows of S carry sigma^2 on the diagonal (the caller builds
S = H P H^T + sigma^2 I), so the factorization never sees a zero pivot;
degenerate/inf rows produce NaN gamma, which the caller's gate treats as
"fail" exactly like the reference's behavior with singular residual systems.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gating_kernel(S_ref, r_ref, gamma_ref):
    U, n, _ = S_ref.shape
    A = S_ref[:]  # (U, n, n) resident in VMEM
    r = r_ref[:]  # (U, n)

    row = jax.lax.broadcasted_iota(jnp.int32, (U, n), dimension=1)
    gamma = jnp.zeros((U,), dtype=S_ref.dtype)
    # right-looking Cholesky + fused forward substitution, batched across U.
    # Static unroll over the (small, fixed) residual dimension. Full-size
    # masked updates: uniform (U, n, n) shapes keep Mosaic layouts stable
    # (trailing-submatrix shrinking forces per-step relayouts on TPU).
    for j in range(n):
        d = A[:, j, j]  # (U,)
        inv_sqrt_d = jax.lax.rsqrt(d)
        col = A[:, :, j] * inv_sqrt_d[:, None]  # (U, n) = L[:, :, j] for rows >= j
        lcol = jnp.where(row >= j, col, 0.0)
        # trailing update A -= l l^T (masked column already zeroes rows < j)
        A = A - lcol[:, :, None] * lcol[:, None, :]
        # forward substitution step: y_j = r_j / L[j, j]; r -= L[:, j] y_j
        yj = r[:, j] * inv_sqrt_d
        r = r - jnp.where(row > j, lcol, 0.0) * yj[:, None]
        gamma = gamma + yj * yj
    gamma_ref[:] = gamma


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_gating_gamma(S: jnp.ndarray, r: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """gamma_j = r_j^T S_j^{-1} r_j for a batch of SPD systems.

    S: (U, n, n) SPD (sigma^2-regularized), r: (U, n). Returns (U,).
    """
    U, n, _ = S.shape
    return pl.pallas_call(
        _gating_kernel,
        out_shape=jax.ShapeDtypeStruct((U,), S.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(S, r)


def gating_gamma_reference(S: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA reference: Cholesky solve (what the kernel replaces)."""
    L = jnp.linalg.cholesky(S)
    sol = jax.scipy.linalg.cho_solve((L, True), r[..., None])[..., 0]
    return jnp.sum(r * sol, axis=-1)


# --------------------------------------------------------------------------
# Fused IMU-block propagation: B sequential OC-EKF ticks in one kernel.
# Replaces the inner lax.scan of propagate_block (the per-tick 15x15 math ran
# as ~10 HLO thunks per tick). All state lives in VMEM for the whole block;
# the big padded covariance is still touched once outside (filter/propagation).
# --------------------------------------------------------------------------


def _skew_k(w):
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], z, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], z], -1),
        ],
        -2,
    )


def _propagate_block_kernel(
    nticks: int,
    # inputs
    R0_ref, p0v0_ref, biases_ref, meta_ref, ts_ref, gyro_ref, acc_ref,
    valid_ref, qc_ref, grav_ref, P15_ref,
    # outputs
    R_out, pv_out, ts_out, P15_out, phi_out, outR_ref, outp_ref, outv_ref,
    outsig_ref,
):
    dt_ = R0_ref.dtype
    R = R0_ref[:]
    p = p0v0_ref[0, :]
    v = p0v0_ref[1, :]
    bg = biases_ref[0, :]
    ba = biases_ref[1, :]
    last_ts = meta_ref[0, 0]
    prop_count = meta_ref[0, 1]
    gravity = grav_ref[0, :]
    qc = qc_ref[0, :]  # (12,) diagonal
    P15 = P15_ref[:]
    Phi_acc = jnp.eye(15, dtype=dt_)
    I3 = jnp.eye(3, dtype=dt_)

    for i in range(nticks):
        ts = ts_ref[0, i]
        gyro = gyro_ref[i, :] - bg
        acc = acc_ref[i, :] - ba
        valid = valid_ref[0, i] > 0
        dt = ts - last_ts

        first = prop_count == 0
        R_null = jnp.where(first, I3, R)
        v_null = jnp.where(first, jnp.zeros(3, dtype=dt_), v)
        p_null = jnp.where(first, jnp.zeros(3, dtype=dt_), p)

        # nominal integration (`IMU.py:78-100`)
        w_norm = jnp.sqrt(jnp.sum(gyro * gyro))
        theta = w_norm * dt
        axis = gyro / jnp.where(w_norm < 1e-30, 1.0, w_norm)
        Kx = _skew_k(axis)
        dR = I3 + jnp.sin(theta) * Kx + (1.0 - jnp.cos(theta)) * (Kx @ Kx)
        dR = jnp.where(theta > 0, dR, I3)
        R_new = R @ dR
        a_w = R @ acc - gravity
        p_new = p + v * dt + 0.5 * a_w * dt * dt
        v_new = v + a_w * dt

        # continuous F, G; 3rd-order Taylor Phi; OC fix-up (`MSCKF.py:179-233`)
        F = jnp.zeros((15, 15), dtype=dt_)
        F = F.at[0:3, 0:3].set(-_skew_k(gyro))
        F = F.at[0:3, 3:6].set(-I3)
        F = F.at[6:9, 0:3].set(-(R_new @ _skew_k(acc)))
        F = F.at[6:9, 9:12].set(-R_new)
        F = F.at[12:15, 6:9].set(I3)
        Fdt = F * dt
        Fdt2 = Fdt @ Fdt
        Phi = jnp.eye(15, dtype=dt_) + Fdt + 0.5 * Fdt2 + (1.0 / 6.0) * (Fdt2 @ Fdt)
        Phi = Phi.at[0:3, 0:3].set(R_new @ R_null.T)
        u = R_null @ gravity
        s = u / jnp.sum(u * u)
        A_vel = Phi[6:9, 0:3]
        A_pos = Phi[12:15, 0:3]
        w1 = _skew_k(v_null - v_new) @ gravity
        w2 = _skew_k(dt * v_null + p_null - p_new) @ gravity
        Phi = Phi.at[6:9, 0:3].set(A_vel - (A_vel @ u - w1)[:, None] * s[None, :])
        Phi = Phi.at[12:15, 0:3].set(A_pos - (A_pos @ u - w2)[:, None] * s[None, :])

        # G Qc G^T with diagonal Qc and G's +-identity / -R blocks
        # (`MSCKF.py:194-212`): PG = Phi @ G computed blockwise.
        PG = jnp.concatenate(
            [
                -Phi[:, 0:3],
                Phi[:, 3:6],
                -(Phi[:, 6:9] @ R_new),
                Phi[:, 9:12],
            ],
            axis=1,
        )  # (15, 12)
        Q = (PG * qc[None, :]) @ PG.T * dt

        P15_new = Phi @ P15 @ Phi.T + Q
        P15_new = 0.5 * (P15_new + P15_new.T)
        Phi_acc_new = Phi @ Phi_acc

        # masked commit for padding ticks
        R = jnp.where(valid, R_new, R)
        p = jnp.where(valid, p_new, p)
        v = jnp.where(valid, v_new, v)
        last_ts = jnp.where(valid, ts, last_ts)
        prop_count = jnp.where(valid, prop_count + 1, prop_count)
        P15 = jnp.where(valid, P15_new, P15)
        Phi_acc = jnp.where(valid, Phi_acc_new, Phi_acc)

        outR_ref[i, :, :] = R
        outp_ref[i, :] = p
        outv_ref[i, :] = v
        outsig_ref[i, 0:3] = jnp.stack([P15[0, 0], P15[1, 1], P15[2, 2]])
        outsig_ref[i, 3:6] = jnp.stack([P15[12, 12], P15[13, 13], P15[14, 14]])

    R_out[:] = R
    pv_out[0, :] = p
    pv_out[1, :] = v
    ts_out[0, 0] = last_ts
    ts_out[0, 1] = prop_count
    P15_out[:] = P15
    phi_out[:] = Phi_acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def propagate_block_fused(
    R0, p0, v0, bg, ba, last_ts, prop_count,
    ts, gyro, acc, valid, qc_diag, gravity, P15,
    interpret: bool = False,
):
    """One kernel for a block of B OC-EKF propagation ticks.

    Returns (R, p, v, new_last_ts, new_prop_count, P15, Phi_acc,
    per-tick (R (B,3,3), p (B,3), v (B,3), sig (B,6))).
    """
    B = ts.shape[0]
    dt_ = R0.dtype
    kernel = functools.partial(_propagate_block_kernel, B)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, 3), dt_),
            jax.ShapeDtypeStruct((2, 3), dt_),
            jax.ShapeDtypeStruct((1, 2), dt_),
            jax.ShapeDtypeStruct((15, 15), dt_),
            jax.ShapeDtypeStruct((15, 15), dt_),
            jax.ShapeDtypeStruct((B, 3, 3), dt_),
            jax.ShapeDtypeStruct((B, 3), dt_),
            jax.ShapeDtypeStruct((B, 3), dt_),
            jax.ShapeDtypeStruct((B, 6), dt_),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9),
        interpret=interpret,
    )(
        R0,
        jnp.stack([p0, v0]),
        jnp.stack([bg, ba]),
        jnp.stack([last_ts, prop_count.astype(dt_)]).reshape(1, 2),
        ts.reshape(1, B),
        gyro,
        acc,
        valid.astype(jnp.int32).reshape(1, B),
        qc_diag.reshape(1, 12),
        gravity.reshape(1, 3),
        P15,
    )
    return outs
