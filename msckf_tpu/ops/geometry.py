"""SO(3)/SE(3) primitives as pure JAX functions.

TPU-native rebuild of the reference geometry layer
(`/root/reference/src/utils/geometry.py`). Where the reference wraps mutable
``Isometry3D`` objects and scipy ``Rotation``, everything here is a pure,
vmappable function over plain arrays so it traces cleanly under ``jit`` /
``lax.scan`` and batches over feature/camera axes.

Conventions match the reference:
  - rotations are 3x3 matrices (the reference filter composes raw matrices and
    re-orthonormalizes with SVD, `MSCKF.py:633-634`; we keep matrices for
    bit-level parity rather than switching to quaternions)
  - quaternions are scalar-last ``[x, y, z, w]`` (scipy convention,
    `geometry.py:145-194`)
  - isometries are ``(R, t)`` tuples; composition/inverse are closed-form
    (the reference inverts the full 4x4 with LU, `geometry.py:35-37`; the
    closed form is exact and cheaper)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector. Ref: `geometry.py:222-235`.

    Batched: accepts ``(..., 3)`` and returns ``(..., 3, 3)``.
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues_unit(axis: jax.Array, theta: jax.Array) -> jax.Array:
    """R = I + sin(theta) [axis]_x + (1-cos(theta)) [axis]_x^2 for unit axis.

    The closed form the reference uses for its rotation increments
    (`IMU.py:86-88`, `IMU.py:56-58`). Batched over leading dims.
    """
    K = skew(axis)
    I = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    s = jnp.sin(theta)[..., None, None]
    c = (1.0 - jnp.cos(theta))[..., None, None]
    return I + s * K + c * (K @ K)


def so3_exp(rotvec: jax.Array, eps: float = 0.0) -> jax.Array:
    """Exponential map with the reference's exact zero-angle guard.

    The reference computes ``sin(n)/n`` and ``(1-cos(n))/n^2`` directly and
    branches to identity only when ``np.isclose(n, 0)`` (`MSCKF.py:625-628`).
    We evaluate both branches and select, which is trace-safe. For very small
    but nonzero angles we use the series expansion to avoid 0/0 in f32.
    """
    theta = jnp.linalg.norm(rotvec, axis=-1)
    K = skew(rotvec)  # note: un-normalized rotvec, matching MSCKF.py:625
    I = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    t2 = theta * theta
    small = theta < 1e-8
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    return I + a[..., None, None] * K + b[..., None, None] * (K @ K)


def iso_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb). Ref: `geometry.py:31-33`."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def iso_inverse(R, t):
    """Closed-form SE(3) inverse. Ref semantics: `geometry.py:35-37`."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def iso_apply(R, t, p):
    """Transform point(s) p by (R, t). Ref: `geometry.py:43-45`."""
    return (R @ p[..., None])[..., 0] + t


def iso_rotate(R, p):
    return (R @ p[..., None])[..., 0]


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def angle_between_directions(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """Angle between direction vectors. Ref: `geometry.py:237-256`."""
    d1 = normalize(d1)
    d2 = normalize(d2)
    dot = jnp.clip(jnp.sum(d1 * d2, axis=-1), -1.0, 1.0)
    return jnp.arccos(dot)


def gravity_align_rotation(mean_acc: jax.Array, w_gravity: jax.Array) -> jax.Array:
    """R_W_I aligning the body-frame mean accelerometer with world gravity.

    Reproduces `IMU.py:43-58`: axis = cross(acc_dir, g_dir) normalized, angle
    from the dot product, Rodrigues form, with identity / -identity guards at
    theta ~ {0, pi}.
    """
    g_dir = w_gravity / jnp.linalg.norm(w_gravity)
    a_dir = mean_acc / jnp.linalg.norm(mean_acc)
    axis = jnp.cross(a_dir, g_dir)
    axis_norm = jnp.linalg.norm(axis)
    safe_axis = axis / jnp.where(axis_norm < 1e-12, 1.0, axis_norm)
    theta = jnp.arccos(jnp.clip(jnp.dot(a_dir, g_dir), -1.0, 1.0))
    R = rodrigues_unit(safe_axis, theta)
    I = jnp.eye(3, dtype=mean_acc.dtype)
    R = jnp.where(jnp.isclose(theta, 0.0), I, R)
    R = jnp.where(jnp.isclose(theta, jnp.pi), -I, R)
    return R


def svd_orthonormalize(R: jax.Array) -> jax.Array:
    """Project to the nearest (in Frobenius norm) orthogonal matrix via SVD.

    Ref: `MSCKF.py:633-634, 657-658` (numerical hygiene after exp-map
    corrections). Batched over leading dims.
    """
    U, _, Vt = jnp.linalg.svd(R)
    return U @ Vt


# --- rotation <-> quaternion/euler conversions (scipy-compatible, [x,y,z,w]) ---


def quat_to_R(q: jax.Array) -> jax.Array:
    """Scalar-last quaternion to rotation matrix. Ref: `geometry.py:170-181`."""
    q = normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def R_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix to scalar-last quaternion (w >= 0 branch-stable).

    Shepperd's method evaluated branch-free so it traces under jit.
    Ref: `geometry.py:183-194`.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick the numerically strongest.
    qw = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, 1e-24))
    case = jnp.argmax(qw, axis=-1)

    def mk(i):
        s = qw[..., i] * 2.0
        if i == 0:
            return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, s / 4.0], -1)
        if i == 1:
            return jnp.stack([s / 4.0, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)
        if i == 2:
            return jnp.stack([(m01 + m10) / s, s / 4.0, (m12 + m21) / s, (m02 - m20) / s], -1)
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, s / 4.0, (m10 - m01) / s], -1)

    cands = jnp.stack([mk(0), mk(1), mk(2), mk(3)], axis=-2)
    q = jnp.take_along_axis(cands, case[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = normalize(q)
    # canonical sign: w >= 0 (scipy returns either; we pin for determinism)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def euler_xyz_intrinsic_to_R(euler: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler -> R, matching scipy 'XYZ'. Ref: `geometry.py:119-130`."""
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]

    def rx(t):
        o, z = jnp.ones_like(t), jnp.zeros_like(t)
        return jnp.stack(
            [
                jnp.stack([o, z, z], -1),
                jnp.stack([z, jnp.cos(t), -jnp.sin(t)], -1),
                jnp.stack([z, jnp.sin(t), jnp.cos(t)], -1),
            ],
            -2,
        )

    def ry(t):
        o, z = jnp.ones_like(t), jnp.zeros_like(t)
        return jnp.stack(
            [
                jnp.stack([jnp.cos(t), z, jnp.sin(t)], -1),
                jnp.stack([z, o, z], -1),
                jnp.stack([-jnp.sin(t), z, jnp.cos(t)], -1),
            ],
            -2,
        )

    def rz(t):
        o, z = jnp.ones_like(t), jnp.zeros_like(t)
        return jnp.stack(
            [
                jnp.stack([jnp.cos(t), -jnp.sin(t), z], -1),
                jnp.stack([jnp.sin(t), jnp.cos(t), z], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )

    # intrinsic XYZ == extrinsic zyx composition: R = Rx(a) @ Ry(b) @ Rz(c)
    return rx(a) @ ry(b) @ rz(c)


def R_to_euler_xyz_intrinsic(R: jax.Array) -> jax.Array:
    """R -> intrinsic XYZ euler angles, matching scipy 'XYZ'.

    Ref: `geometry.py:132-143` (used by the driver's AOE metric,
    `main.py:385-389`).
    """
    # R = Rx(a) Ry(b) Rz(c):
    #   R[0,2] = sin(b); R[1,2] = -cos(b) sin(a); R[2,2] = cos(b) cos(a)
    #   R[0,1] = -cos(b) sin(c); R[0,0] = cos(b) cos(c)
    b = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    c = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


# --- inverse-depth parameterization (ref: geometry.py:53-71) ---


def idp_angles_m(direction: jax.Array) -> jax.Array:
    """Azimuth/elevation re-parameterized unit bearing m from a direction.

    m = [cos(phi) sin(theta), -sin(phi), cos(phi) cos(theta)] with
    theta = atan2(x, z), phi = atan2(-y, sqrt(x^2+z^2)). Ref: `geometry.py:56-58`.
    Scale-invariant in ``direction``.
    """
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    theta = jnp.arctan2(x, z)
    phi = jnp.arctan2(-y, jnp.sqrt(x * x + z * z))
    return jnp.stack(
        [jnp.cos(phi) * jnp.sin(theta), -jnp.sin(phi), jnp.cos(phi) * jnp.cos(theta)],
        axis=-1,
    )
