"""Masked multi-view triangulation.

Two triangulators:
  * ``intersect_lines`` — the reference's confidence-weighted least-squares
    line intersection (`/root/reference/src/utils/geometry.py:274-303`),
    vectorized over a fixed-size padded observation axis with a validity mask
    instead of a Python loop over ``Line`` objects.
  * ``refine_inverse_depth_gn`` — a Gauss-Newton inverse-depth refinement
    (anchored [theta, phi, rho] parameterization) that the TPU build adds for
    the IDP-vs-3D-point ablation config. Fixed iteration count so it lives
    happily inside ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_tpu.ops.geometry import idp_angles_m
from msckf_tpu.ops.smallmat import (
    default_rcond,
    matvec_small,
    tikhonov_inv_sym3,
)


def pinv_sym3(X: jax.Array, rcond: float = 1e-15) -> jax.Array:
    """Moore-Penrose pseudo-inverse of a symmetric PSD 3x3 via eigh.

    Matches ``np.linalg.pinv`` semantics (cut singular values below
    rcond * max) for the symmetric matrices produced by line intersection
    (`geometry.py:299`). Batched over leading dims.
    """
    w, V = jnp.linalg.eigh(X)
    wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    keep = jnp.abs(w) > rcond * wmax
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    return (V * winv[..., None, :]) @ jnp.swapaxes(V, -1, -2)


def intersect_lines(
    bases: jax.Array,  # (M, 3) line base points (camera centers at obs time)
    directions: jax.Array,  # (M, 3) line directions (need not be unit)
    confidences: jax.Array,  # (M,)
    mask: jax.Array,  # (M,) bool — valid observations
) -> jax.Array:
    """Weighted LS intersection point of a masked bundle of 3D lines.

    X = sum_i w_i (I - d_i d_i^T), y = sum_i w_i (I - d_i d_i^T) b_i,
    p = pinv(X) y  — exactly `geometry.py:285-299`, with invalid rows
    contributing zero.
    """
    d = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True).clip(1e-30)
    w = jnp.where(mask, confidences, 0.0)
    I = jnp.eye(3, dtype=bases.dtype)
    P = I - d[..., :, None] * d[..., None, :]  # (M, 3, 3)
    Pw = P * w[..., None, None]
    X = jnp.sum(Pw, axis=-3)
    y = jnp.sum(matvec_small(Pw, bases), axis=-2)
    # y lies in range(X) by construction (a sum of X-range terms), so the
    # closed-form Tikhonov solve equals pinv(X) y to O(rcond) — no eigh.
    Xi = tikhonov_inv_sym3(X, default_rcond(bases.dtype))
    return matvec_small(Xi, y)


def refine_inverse_depth_gn(
    anchor_base: jax.Array,  # (3,) IDP anchor position (creation-time camera center)
    m0: jax.Array,  # (3,) initial unit bearing
    rho0: jax.Array,  # () initial inverse depth
    cam_R: jax.Array,  # (M, 3, 3) observing camera rotations R_W_Ci
    cam_t: jax.Array,  # (M, 3) observing camera centers
    z: jax.Array,  # (M, 2) normalized-image observations (K^-1 pix)
    mask: jax.Array,  # (M,) bool
    iters: int = 5,
    damping: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Gauss-Newton refinement of (theta, phi, rho) for an anchored IDP.

    Measurement model matches the filter's (`MSCKF.py:516-522`):
      Ci_f = R_Ci_W (rho (base - t_WCi) + m(theta, phi)),  zhat = Ci_f[:2]/Ci_f[2]

    Returns refined (m, rho). This is the TPU build's addition for the
    triangulation ablation; the parity path uses ``intersect_lines``.
    """
    x0, y0, z0 = m0[0], m0[1], m0[2]
    theta = jnp.arctan2(x0, z0)
    phi = jnp.arctan2(-y0, jnp.sqrt(x0 * x0 + z0 * z0))
    params = jnp.stack([theta, phi, rho0])

    Rt = jnp.swapaxes(cam_R, -1, -2)  # R_Ci_W
    base_minus_t = anchor_base[None, :] - cam_t  # (M, 3)
    wvalid = mask.astype(anchor_base.dtype)

    def residual_and_jac(p):
        th, ph, rho = p[0], p[1], p[2]
        cth, sth, cph, sph = jnp.cos(th), jnp.sin(th), jnp.cos(ph), jnp.sin(ph)
        m = jnp.stack([cph * sth, -sph, cph * cth])
        dm_dth = jnp.stack([cph * cth, jnp.zeros_like(cph), -cph * sth])
        dm_dph = jnp.stack([-sph * sth, -cph, -sph * cth])
        pw = rho * base_minus_t + m[None, :]  # (M, 3) world-scaled point
        pc = (Rt @ pw[..., None])[..., 0]  # (M, 3) camera frame
        zc = pc[..., 2:3]
        zc_safe = jnp.where(jnp.abs(zc) < 1e-12, 1e-12, zc)
        zhat = pc[..., :2] / zc_safe
        r = (z - zhat) * wvalid[..., None]  # (M, 2)
        # d zhat / d pc  (2x3 per obs)
        inv_z = 1.0 / zc_safe[..., 0]
        Jproj = jnp.stack(
            [
                jnp.stack([inv_z, jnp.zeros_like(inv_z), -pc[..., 0] * inv_z * inv_z], -1),
                jnp.stack([jnp.zeros_like(inv_z), inv_z, -pc[..., 1] * inv_z * inv_z], -1),
            ],
            axis=-2,
        )  # (M, 2, 3)
        dpw = jnp.stack(
            [
                jnp.broadcast_to(dm_dth, base_minus_t.shape),
                jnp.broadcast_to(dm_dph, base_minus_t.shape),
                base_minus_t,
            ],
            axis=-1,
        )  # (M, 3, 3) columns: d/dtheta, d/dphi, d/drho
        J = -(Jproj @ Rt @ dpw) * wvalid[..., None, None]  # (M, 2, 3), d r / d p
        return r, J

    def gn_step(p, _):
        r, J = residual_and_jac(p)
        Jf = J.reshape(-1, 3)
        rf = r.reshape(-1)
        H = Jf.T @ Jf + damping * jnp.eye(3, dtype=p.dtype)
        g = Jf.T @ rf
        dp = jnp.linalg.solve(H, -g)
        return p + dp, None

    params, _ = jax.lax.scan(gn_step, params, None, length=iters)
    th, ph, rho = params[0], params[1], params[2]
    m = idp_angles_m(
        jnp.stack([jnp.cos(ph) * jnp.sin(th), -jnp.sin(ph), jnp.cos(ph) * jnp.cos(th)])
    )
    return m, jnp.maximum(rho, 1e-8)
