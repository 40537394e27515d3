"""Pinhole camera model as pure, batched JAX functions.

Public-API rebuild of `/root/reference/src/msckf/Camera.py`: projection with
behind-camera and field-of-view validity (instead of the reference's
``(bool, None)`` early returns, which cannot trace), inverse projection to a
camera-frame ray, frame transforms, and the measurement Jacobians. The filter
inlines these formulas in its fused paths (`filter/update.py`,
`filter/verification.py`); this module is the user-facing surface and the
ground truth the unit tests pin both against.
"""

from __future__ import annotations

import jax.numpy as jnp

from msckf_tpu.ops.geometry import skew
from msckf_tpu.ops.smallmat import matmul_small, matvec_small, transpose_small


def project_point(K: jnp.ndarray, width: int, height: int, Ci_p: jnp.ndarray):
    """(valid, pixel): pinhole projection with z>0 and FOV checks
    (`Camera.py:13-28`). Batched over leading dims; invalid entries still
    carry the (meaningless) projected coordinates — mask with ``valid``."""
    z = Ci_p[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-30, 1e-30, z)
    uvw = matvec_small(jnp.broadcast_to(K, Ci_p.shape[:-1] + (3, 3)), Ci_p)
    uv = uvw[..., :2] / z_safe
    valid = (
        (Ci_p[..., 2] > 0)
        & (uv[..., 0] >= 0)
        & (uv[..., 0] < width)
        & (uv[..., 1] >= 0)
        & (uv[..., 1] < height)
    )
    return valid, uv


def inverse_project_point(K_inv: jnp.ndarray, Im_p: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> camera-frame ray K^-1 [u, v, 1] (`Camera.py:30-36`)."""
    ones = jnp.ones(Im_p.shape[:-1] + (1,), dtype=Im_p.dtype)
    homog = jnp.concatenate([Im_p, ones], axis=-1)
    return matvec_small(jnp.broadcast_to(K_inv, homog.shape[:-1] + (3, 3)), homog)


def cam_to_world(R_WC: jnp.ndarray, t_WC: jnp.ndarray, Ci_n: jnp.ndarray,
                 is_versor: bool = False) -> jnp.ndarray:
    """`Camera.py:38-44`."""
    out = matvec_small(R_WC, Ci_n)
    return out if is_versor else out + t_WC


def world_to_cam(R_WC: jnp.ndarray, t_WC: jnp.ndarray, W_n: jnp.ndarray,
                 is_versor: bool = False) -> jnp.ndarray:
    """`Camera.py:46-52`."""
    Rt = transpose_small(R_WC)
    return matvec_small(Rt, W_n if is_versor else W_n - t_WC)


def measurement_jacobians(R_WC: jnp.ndarray, Ci_f: jnp.ndarray):
    """(H_x (...,2,6), H_f (...,2,3)) about a camera-frame point
    (`Camera.py:54-68`): J = d(normalized image point)/d(Ci_f),
    H_x = [J [Ci_f]_x, -J R_CW], H_f = J R_CW."""
    z = Ci_f[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-30, 1e-30, z)
    inv_z = 1.0 / z_safe
    zero = jnp.zeros_like(inv_z)
    J = jnp.stack(
        [
            jnp.stack([inv_z, zero, -Ci_f[..., 0] * inv_z * inv_z], -1),
            jnp.stack([zero, inv_z, -Ci_f[..., 1] * inv_z * inv_z], -1),
        ],
        axis=-2,
    )
    R_CW = transpose_small(R_WC)
    H_f = matmul_small(J, R_CW)
    H_x = jnp.concatenate([matmul_small(J, skew(Ci_f)), -H_f], axis=-1)
    return H_x, H_f
