"""IMU nominal-state integration and OC-EKF error-state propagation.

Rebuilds `/root/reference/src/msckf/IMU.py:78-100` (Rodrigues + explicit Euler
integration) and `/root/reference/src/msckf/MSCKF.py:160-248` (F/G
construction, 3rd-order Taylor Phi, observability-constrained fix-up,
covariance propagation) as one pure jit-able step over the padded covariance.

TPU notes:
  * the 15x15 / 15x(D-15) covariance chains are dense matmuls — tiny for the
    MXU; the win comes from fusing the whole step under jit inside lax.scan
    rather than round-tripping per-tick like the reference's Python loop.
  * planet_angular_velocity is identically zero in the reference
    (`IMU.py:36`), so the F rows that consume it (`MSCKF.py:187-189`) drop
    out; we omit them and document the simplification here.
  * null states: see the aliasing analysis in ``state.py`` — null is the
    pre-integration state, except on the very first step where it is the
    constructor identity (`IMU.py:38-39`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.state import FilterState, ImuState
from msckf_tpu.ops.backend import pallas_interpret, use_pallas
from msckf_tpu.ops.geometry import rodrigues_unit, skew
from msckf_tpu.ops.precision import with_f32_matmuls


def integrate_nominal(imu: ImuState, acc: jnp.ndarray, gyro: jnp.ndarray,
                      dt: jnp.ndarray, gravity: jnp.ndarray):
    """Nominal-state integration (`IMU.py:78-100`).

    acc/gyro are bias-corrected body-frame measurements. Rotation by the
    closed-form Rodrigues increment about the (unit) gyro axis; velocity and
    position by explicit Euler with the 1/2 a dt^2 term.
    """
    w_norm = jnp.linalg.norm(gyro)
    theta = w_norm * dt
    axis = gyro / jnp.where(w_norm < 1e-30, 1.0, w_norm)
    dR = rodrigues_unit(axis, theta)
    dR = jnp.where(theta > 0, dR, jnp.eye(3, dtype=dR.dtype))
    R_new = imu.R_WI @ dR

    a_world = imu.R_WI @ acc - gravity
    p_new = imu.p_WI + imu.v_WI * dt + 0.5 * a_world * dt * dt
    v_new = imu.v_WI + a_world * dt
    return R_new, p_new, v_new


@with_f32_matmuls
def propagate(cfg: MSCKFConfig, state: FilterState,
              gyro: jnp.ndarray, acc: jnp.ndarray, timestamp: jnp.ndarray) -> FilterState:
    """One ``process_imu`` step (`MSCKF.py:160-248`).

    Error-state ordering is the reference's (non-standard):
    [dtheta 0:3, dbg 3:6, dv 6:9, dba 9:12, dp 12:15] (`MSCKF.py:171`).
    """
    imu_new, Phi, Q = _phi_q_for_tick(cfg, state.imu, gyro, acc, timestamp)

    # covariance propagation on the padded buffer (`MSCKF.py:235-244`);
    # invalid camera rows/cols of P are identically zero, so the padded
    # cross-covariance product is exact.
    P = state.P
    P_ii_new = Phi @ P[:15, :15] @ Phi.T + Q
    P_ic_new = Phi @ P[:15, 15:]
    P = P.at[:15, :15].set(P_ii_new)
    P = P.at[:15, 15:].set(P_ic_new)
    P = P.at[15:, :15].set(P_ic_new.T)
    P = 0.5 * (P + P.T)
    return state.replace(imu=imu_new, P=P)


def _phi_q_for_tick(cfg: MSCKFConfig, imu: ImuState, gyro, acc, timestamp):
    """Shared per-tick math: nominal integration + OC-constrained Phi and
    discrete Q (15x15). Returns (imu_new, Phi, Q, dt)."""
    dt_ = cfg.jdtype
    dt = (timestamp - imu.timestamp).astype(dt_)
    gyro = gyro.astype(dt_) - imu.bg
    acc = acc.astype(dt_) - imu.ba
    gravity = jnp.asarray(cfg.gravity_np, dtype=dt_)

    first = imu.prop_count == 0
    R_null = jnp.where(first, jnp.eye(3, dtype=dt_), imu.R_WI)
    v_null = jnp.where(first, jnp.zeros(3, dtype=dt_), imu.v_WI)
    p_null = jnp.where(first, jnp.zeros(3, dtype=dt_), imu.p_WI)

    R_new, p_new, v_new = integrate_nominal(imu, acc, gyro, dt, gravity)

    Z3 = jnp.zeros((3, 3), dtype=dt_)
    I3 = jnp.eye(3, dtype=dt_)
    F = jnp.block([
        [-skew(gyro), -I3, Z3, Z3, Z3],
        [Z3, Z3, Z3, Z3, Z3],
        [-R_new @ skew(acc), Z3, Z3, -R_new, Z3],
        [Z3, Z3, Z3, Z3, Z3],
        [Z3, Z3, I3, Z3, Z3],
    ])
    G = jnp.block([
        [-I3, Z3, Z3, Z3],
        [Z3, I3, Z3, Z3],
        [Z3, Z3, -R_new, Z3],
        [Z3, Z3, Z3, I3],
        [Z3, Z3, Z3, Z3],
    ])
    Fdt = F * dt
    Fdt2 = Fdt @ Fdt
    Phi = jnp.eye(15, dtype=dt_) + Fdt + 0.5 * Fdt2 + (1.0 / 6.0) * (Fdt2 @ Fdt)
    Phi = Phi.at[0:3, 0:3].set(R_new @ R_null.T)
    u = R_null @ gravity
    s = u / (u @ u)
    A_vel = Phi[6:9, 0:3]
    A_pos = Phi[12:15, 0:3]
    w1 = skew(v_null - v_new) @ gravity
    w2 = skew(dt * v_null + p_null - p_new) @ gravity
    Phi = Phi.at[6:9, 0:3].set(A_vel - (A_vel @ u - w1)[:, None] * s[None, :])
    Phi = Phi.at[12:15, 0:3].set(A_pos - (A_pos @ u - w2)[:, None] * s[None, :])

    Qc = jnp.diag(jnp.asarray(cfg.noise_cov_diag_np, dtype=dt_))
    PG = Phi @ G
    Q = PG @ Qc @ PG.T * dt

    imu_new = imu.replace(
        R_WI=R_new, p_WI=p_new, v_WI=v_new,
        timestamp=timestamp.astype(dt_),
        step_id=imu.step_id + 1,
        prop_count=imu.prop_count + 1,
    )
    return imu_new, Phi, Q


@with_f32_matmuls
def propagate_block(cfg: MSCKFConfig, state: FilterState,
                    ts_b, gyro_b, acc_b, valid_b):
    if use_pallas(cfg, cfg.use_pallas_propagation):
        B = ts_b.shape[0]
        # tiny blocks: the monolithic kernel's single dispatch beats the
        # hybrid's handful of batched XLA ops; longer blocks amortize them.
        # Very long blocks (a long pre-image IMU prefix) fall back to the
        # scan — the P-recurrence kernels unroll B iterations in Mosaic and
        # compile time grows with the unroll.
        if B <= 2:
            return _propagate_block_fused(cfg, state, ts_b, gyro_b, acc_b, valid_b)
        if B <= 64:
            return _propagate_block_hybrid(cfg, state, ts_b, gyro_b, acc_b, valid_b)
    return _propagate_block_scan(cfg, state, ts_b, gyro_b, acc_b, valid_b)


def _phi_q_block(cfg: MSCKFConfig, imu: ImuState, ts_b, gyro_b, acc_b, valid_b):
    """Per-tick Phi/Qd for a whole block, built as BATCHED XLA ops.

    The sequential part of propagation is only the nominal-state recurrence
    (tiny 3-vector/3x3 work) and the covariance recurrence; everything else
    — F construction, the 3rd-order Taylor Phi, the OC fix-up, and the
    discrete noise Qd — depends on per-tick nominal states alone and
    vectorizes over the block. (The round-1 fused kernel computed all of it
    sequentially in-kernel; its dozens of tiny per-tick MXU passes made it
    the hottest op of the small-shape profile at ~289 us/frame.)

    Returns (imu_new, Phi (B,15,15) with invalid ticks forced to I,
    Qd (B,15,15) forced to 0, per-tick R/p/v stacks).
    """
    dt_ = cfg.jdtype
    B = ts_b.shape[0]
    gravity = jnp.asarray(cfg.gravity_np, dtype=dt_)
    gyro_b = gyro_b.astype(dt_) - imu.bg  # biases constant within a block
    acc_b = acc_b.astype(dt_) - imu.ba

    # --- vectorized nominal integration ---
    # The only sequential dependence is the rotation composition, expressed
    # as an associative prefix product (log2(B) batched matmul levels);
    # velocity/position are exclusive-prefix cumsums of per-tick increments.
    # A lax.scan here costs more in per-iteration dispatch than the whole
    # rest of propagation. Invalid (padding) ticks get dt = 0, which freezes
    # the state exactly (dR = I, zero increments); padding is only ever a
    # block suffix.
    ts_prev = jnp.concatenate([imu.timestamp[None], ts_b[:-1].astype(dt_)])
    dt_s = jnp.where(valid_b, ts_b.astype(dt_) - ts_prev, 0.0)

    w_norm = jnp.linalg.norm(gyro_b, axis=-1)
    theta = w_norm * dt_s
    axis = gyro_b / jnp.where(w_norm < 1e-30, 1.0, w_norm)[:, None]
    dR = jax.vmap(rodrigues_unit)(axis, theta)
    dR = jnp.where(
        (theta > 0)[:, None, None], dR,
        jnp.broadcast_to(jnp.eye(3, dtype=dt_), (B, 3, 3)),
    )
    Q_pref = jax.lax.associative_scan(jnp.matmul, dR)  # (B,3,3) dR_0..dR_j
    R_s = imu.R_WI @ Q_pref  # R after each tick
    R_prev = jnp.concatenate([imu.R_WI[None], R_s[:-1]], axis=0)

    a_world = jnp.einsum("bij,bj->bi", R_prev, acc_b) - gravity
    dv = a_world * dt_s[:, None]
    v_s = imu.v_WI + jnp.cumsum(dv, axis=0)
    v_prev = jnp.concatenate([imu.v_WI[None], v_s[:-1]], axis=0)
    dp = v_prev * dt_s[:, None] + 0.5 * a_world * (dt_s * dt_s)[:, None]
    p_s = imu.p_WI + jnp.cumsum(dp, axis=0)
    p_prev = jnp.concatenate([imu.p_WI[None], p_s[:-1]], axis=0)

    # null states: pre-tick values, constructor identity on the very first
    # propagation step of the filter (`IMU.py:38-39`)
    first = (imu.prop_count + jnp.arange(B, dtype=jnp.int32)) == 0
    # note: arange counts VALID prior ticks only when padding is a suffix,
    # which the stream builder guarantees
    Rn_s = jnp.where(
        first[:, None, None],
        jnp.broadcast_to(jnp.eye(3, dtype=dt_), (B, 3, 3)), R_prev,
    )
    vn_s = jnp.where(first[:, None], jnp.zeros(3, dt_), v_prev)
    pn_s = jnp.where(first[:, None], jnp.zeros(3, dt_), p_prev)

    n_valid = jnp.sum(valid_b).astype(jnp.int32)
    R_f, p_f, v_f = R_s[-1], p_s[-1], v_s[-1]  # frozen through padding
    ts_f = jnp.where(
        n_valid > 0, ts_b[jnp.maximum(n_valid - 1, 0)].astype(dt_),
        imu.timestamp,
    )
    pc_f = imu.prop_count + n_valid

    # --- batched F / Taylor-3 Phi / OC fix-up / Qd (`MSCKF.py:179-238`) ---
    Z = jnp.zeros((B, 3, 3), dt_)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dt_), (B, 3, 3))
    sk_g = skew(gyro_b)  # (B, 3, 3)
    Rska = R_s @ skew(acc_b)
    row0 = jnp.concatenate([-sk_g, -I3, Z, Z, Z], axis=-1)
    row1 = jnp.zeros((B, 3, 15), dt_)
    row2 = jnp.concatenate([-Rska, Z, Z, -R_s, Z], axis=-1)
    row3 = jnp.zeros((B, 3, 15), dt_)
    row4 = jnp.concatenate([Z, Z, I3, Z, Z], axis=-1)
    F = jnp.concatenate([row0, row1, row2, row3, row4], axis=-2)  # (B, 15, 15)

    Fdt = F * dt_s[:, None, None]
    Fdt2 = Fdt @ Fdt
    I15 = jnp.broadcast_to(jnp.eye(15, dtype=dt_), (B, 15, 15))
    Phi = I15 + Fdt + 0.5 * Fdt2 + (1.0 / 6.0) * (Fdt2 @ Fdt)
    Phi = Phi.at[:, 0:3, 0:3].set(R_s @ jnp.swapaxes(Rn_s, -1, -2))
    u = jnp.einsum("bij,j->bi", Rn_s, gravity)  # (B, 3)
    s = u / jnp.sum(u * u, axis=-1, keepdims=True)
    A_vel = Phi[:, 6:9, 0:3]
    A_pos = Phi[:, 12:15, 0:3]
    w1 = jnp.einsum("bij,j->bi", skew(vn_s - v_s), gravity)
    w2 = jnp.einsum(
        "bij,j->bi", skew(dt_s[:, None] * vn_s + pn_s - p_s), gravity
    )
    Au = jnp.einsum("bij,bj->bi", A_vel, u)
    Ap = jnp.einsum("bij,bj->bi", A_pos, u)
    Phi = Phi.at[:, 6:9, 0:3].set(A_vel - (Au - w1)[..., None] * s[:, None, :])
    Phi = Phi.at[:, 12:15, 0:3].set(A_pos - (Ap - w2)[..., None] * s[:, None, :])

    # PG = Phi @ G computed blockwise (G's sparsity, `MSCKF.py:194-212`)
    PG = jnp.concatenate(
        [-Phi[:, :, 0:3], Phi[:, :, 3:6], -(Phi[:, :, 6:9] @ R_s),
         Phi[:, :, 9:12]], axis=-1,
    )  # (B, 15, 12)
    qc = jnp.asarray(cfg.noise_cov_diag_np, dtype=dt_)
    Qd = (PG * qc) @ jnp.swapaxes(PG, -1, -2) * dt_s[:, None, None]

    # invalid ticks: identity transition, zero noise (exact recurrence no-op)
    vmask = valid_b[:, None, None]
    Phi = jnp.where(vmask, Phi, I15)
    Qd = jnp.where(vmask, Qd, 0.0)

    n_done = jnp.sum(valid_b).astype(jnp.int32)
    imu_new = imu.replace(
        R_WI=R_f, p_WI=p_f, v_WI=v_f, timestamp=ts_f,
        step_id=imu.step_id + n_done, prop_count=pc_f,
    )
    # per-tick telemetry must report the carried (masked) state
    R_tel = jnp.where(valid_b[:, None, None], R_s, R_f)
    p_tel = jnp.where(valid_b[:, None], p_s, p_f)
    v_tel = jnp.where(valid_b[:, None], v_s, v_f)
    return imu_new, Phi, Qd, (R_tel, p_tel, v_tel)


def _propagate_block_hybrid(cfg: MSCKFConfig, state: FilterState,
                            ts_b, gyro_b, acc_b, valid_b):
    """Batched Phi/Qd (XLA) + slim sequential P-recurrence Pallas kernel."""
    from msckf_tpu.ops.pallas_kernels import p15_recurrence_fused

    imu_new, Phi, Qd, (R_tel, p_tel, v_tel) = _phi_q_block(
        cfg, state.imu, ts_b, gyro_b, acc_b, valid_b
    )
    P15, Phi_acc, sig = p15_recurrence_fused(
        state.P[:15, :15], Phi, Qd, interpret=pallas_interpret()
    )
    P = state.P
    P_ic = Phi_acc @ P[:15, 15:]
    P = P.at[:15, :15].set(P15)
    P = P.at[:15, 15:].set(P_ic)
    P = P.at[15:, :15].set(P_ic.T)
    outs = (R_tel, p_tel, v_tel, sig[:, 0:3], sig[:, 3:6], valid_b)
    return state.replace(imu=imu_new, P=P), outs


def _propagate_block_fused(cfg: MSCKFConfig, state: FilterState,
                           ts_b, gyro_b, acc_b, valid_b):
    """Single-kernel form of the block (ops/pallas_kernels.py)."""
    from msckf_tpu.ops.pallas_kernels import propagate_block_fused

    dt_ = cfg.jdtype
    imu = state.imu
    (R, pv, meta, P15, Phi_acc, outR, outp, outv, outsig) = propagate_block_fused(
        imu.R_WI, imu.p_WI, imu.v_WI, imu.bg, imu.ba,
        imu.timestamp, imu.prop_count,
        ts_b, gyro_b, acc_b, valid_b,
        jnp.asarray(cfg.noise_cov_diag_np, dtype=dt_),
        jnp.asarray(cfg.gravity_np, dtype=dt_),
        state.P[:15, :15],
        interpret=pallas_interpret(),
    )
    n_done = jnp.sum(valid_b).astype(jnp.int32)
    imu_new = imu.replace(
        R_WI=R, p_WI=pv[0], v_WI=pv[1],
        timestamp=meta[0, 0],
        step_id=imu.step_id + n_done,
        prop_count=meta[0, 1].astype(jnp.int32),
    )
    P = state.P
    P_ic = Phi_acc @ P[:15, 15:]
    P = P.at[:15, :15].set(P15)
    P = P.at[:15, 15:].set(P_ic)
    P = P.at[15:, :15].set(P_ic.T)
    outs = (outR, outp, outv, outsig[:, 0:3], outsig[:, 3:6], valid_b)
    return state.replace(imu=imu_new, P=P), outs


def _propagate_block_scan(cfg: MSCKFConfig, state: FilterState,
                          ts_b, gyro_b, acc_b, valid_b):
    """Propagate a block of B IMU ticks touching the padded covariance ONCE.

    TPU-first restructure of B consecutive ``process_imu`` calls: the inner
    scan runs only the 15x15 math per tick (nominal state, Phi_i, Q_i, and
    the IMU-block covariance P_ii with the reference's per-tick
    symmetrization), composing Phi_total = Phi_B ... Phi_1. The big padded
    cross-covariance block is then updated once:

        P_ic <- Phi_total P_ic       ( == per-tick Phi_i applications,
                                       associativity of matmul )

    The reference's per-tick whole-P symmetrization (`MSCKF.py:244`) only
    changes the IMU block (cross blocks are exact transposes by
    construction), so doing it on P_ii inside the scan is exact.

    Per-tick telemetry (pose, velocity, IMU-block sigma diagonals) comes out
    of the scan; the camera-block diag is untouched by propagation.
    """
    dt_ = cfg.jdtype
    P15_0 = state.P[:15, :15]

    def tick(carry, x):
        imu, P15, Phi_acc = carry
        ts, gyro, acc, valid = x
        imu_new, Phi, Q = _phi_q_for_tick(cfg, imu, gyro, acc, ts)
        P15_new = Phi @ P15 @ Phi.T + Q
        P15_new = 0.5 * (P15_new + P15_new.T)
        Phi_acc_new = Phi @ Phi_acc
        # masked select for padding ticks
        imu = jax.tree.map(lambda a, b: jnp.where(valid, a, b), imu_new, imu)
        P15 = jnp.where(valid, P15_new, P15)
        Phi_acc = jnp.where(valid, Phi_acc_new, Phi_acc)
        out = (imu.R_WI, imu.p_WI, imu.v_WI,
               jnp.diagonal(P15[0:3, 0:3]), jnp.diagonal(P15[12:15, 12:15]), valid)
        return (imu, P15, Phi_acc), out

    init = (state.imu, P15_0, jnp.eye(15, dtype=dt_))
    (imu, P15, Phi_acc), outs = jax.lax.scan(
        tick, init, (ts_b, gyro_b, acc_b, valid_b)
    )

    P = state.P
    P_ic = Phi_acc @ P[:15, 15:]
    P = P.at[:15, :15].set(P15)
    P = P.at[:15, 15:].set(P_ic)
    P = P.at[15:, :15].set(P_ic.T)
    return state.replace(imu=imu, P=P), outs
