"""Camera-state augmentation on the padded covariance.

Rebuilds `/root/reference/src/msckf/MSCKF.py:250-265`. The reference grows the
covariance with a vstack ``M = [I; J]``; here the window is pre-allocated, so
augmentation is a masked write into camera slot ``n`` plus a rank-6 expansion
of the padded P computed in place:

  P[new, :]  = J_a P[active, :]      (J_a is the 6 x D sparse Jacobian)
  P[new,new] = J_a P J_a^T

J's only nonzero blocks are at columns 0:3 and 12:15 (`MSCKF.py:259-261`), so
the products reduce to two 6x3-by-3xD matmuls — no D x D rebuild.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.state import FilterState
from msckf_tpu.ops.geometry import skew


def state_augmentation(cfg: MSCKFConfig, state: FilterState) -> FilterState:
    dt_ = cfg.jdtype
    imu = state.imu
    D = cfg.err_dim

    # T_I_C = T_W_I^-1 * T_W_C with T_W_I = identity in every reference run
    # (`IMU.py:15`, never set otherwise) — kept general here anyway.
    R_IC = jnp.asarray(cfg.R_WC_np, dtype=dt_)
    t_IC = jnp.asarray(cfg.t_WC_np, dtype=dt_)

    # T_W_Ci = T_W_Ii * T_I_C (`MSCKF.py:253`)
    R_WC = imu.R_WI @ R_IC
    t_WC = imu.R_WI @ t_IC + imu.p_WI

    # one-hot masked writes, not .at[n].set: under vmap a batch-varying
    # index write lowers to a serialized scatter/while (measured ~0.37
    # ms/frame across the three augmentation writes at batch 32)
    n = state.cams.n
    cams = state.cams
    slot = jnp.arange(cfg.n_cam_slots) == n  # (N,)
    cams = cams.replace(
        R=jnp.where(slot[:, None, None], R_WC[None], cams.R),
        t=jnp.where(slot[:, None], t_WC[None], cams.t),
        cam_id=jnp.where(slot, imu.step_id, cams.cam_id),
        valid=cams.valid | slot,
        n=n + 1,
    )

    # J rows (6 x D), nonzero only at cols 0:3 and 12:15 (`MSCKF.py:258-261`)
    J_theta = jnp.zeros((6, 3), dtype=dt_).at[0:3].set(R_IC.T)
    J_p = jnp.zeros((6, 3), dtype=dt_).at[3:6].set(jnp.eye(3, dtype=dt_))
    J_theta = J_theta.at[3:6].set(skew(imu.R_WI @ t_IC))

    P = state.P
    # new block row: J P = J_theta P[0:3, :] + J_p P[12:15, :]
    new_row = J_theta @ P[0:3, :] + J_p @ P[12:15, :]  # (6, D)
    # new diagonal block: J P J^T
    new_diag = new_row[:, 0:3] @ J_theta.T + new_row[:, 12:15] @ J_p.T  # (6, 6)

    # rank-6 placement by one-hot matmul + where (exact: single 1.0 per
    # row), not dynamic_update_slice — batch-varying slice starts serialize
    # under vmap (see the camera-slot write above)
    r0 = (15 + 6 * n).astype(jnp.int32)  # start row of the new camera block
    rows = jnp.arange(D)
    rowmask = (rows >= r0) & (rows < r0 + 6)  # (D,)
    E = (rows[:, None] == r0 + jnp.arange(6)[None, :]).astype(dt_)  # (D, 6)
    placed = E @ new_row  # (D, D): new_row at rows r0..r0+5, zero elsewhere
    P = jnp.where(rowmask[:, None], placed, P)
    P = jnp.where(rowmask[None, :], placed.T, P)
    placed_diag = E @ new_diag @ E.T
    P = jnp.where(rowmask[:, None] & rowmask[None, :], placed_diag, P)
    P = 0.5 * (P + P.T)  # `MSCKF.py:265`

    return state.replace(cams=cams, P=P)
