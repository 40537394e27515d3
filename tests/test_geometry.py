"""Geometry primitives vs scipy/NumPy oracles (`geometry.py` parity)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from msckf_tpu.ops import geometry as geo

rng = np.random.default_rng(7)


def random_R(n=1):
    return Rotation.random(n, random_state=3).as_matrix()


def test_skew():
    w = rng.normal(size=3)
    expected = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    np.testing.assert_allclose(geo.skew(jnp.asarray(w)), expected)
    # batched
    wb = rng.normal(size=(5, 3))
    out = np.asarray(geo.skew(jnp.asarray(wb)))
    for i in range(5):
        np.testing.assert_allclose(out[i], np.asarray(geo.skew(jnp.asarray(wb[i]))))


def test_so3_exp_vs_scipy():
    for scale in [1e-12, 1e-8, 1e-3, 1.0, 3.0]:
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v) * scale
        R = np.asarray(geo.so3_exp(jnp.asarray(v)))
        R_ref = Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_rodrigues_unit():
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    theta = 0.7
    R = np.asarray(geo.rodrigues_unit(jnp.asarray(axis), jnp.asarray(theta)))
    np.testing.assert_allclose(R, Rotation.from_rotvec(axis * theta).as_matrix(), atol=1e-12)


def test_iso_ops():
    Ra, Rb = random_R(2)
    ta, tb = rng.normal(size=(2, 3))
    Rc, tc = geo.iso_compose(jnp.asarray(Ra), jnp.asarray(ta), jnp.asarray(Rb), jnp.asarray(tb))
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = Ra, ta
    T2 = np.eye(4)
    T2[:3, :3], T2[:3, 3] = Rb, tb
    Tc = T @ T2
    np.testing.assert_allclose(Rc, Tc[:3, :3], atol=1e-12)
    np.testing.assert_allclose(tc, Tc[:3, 3], atol=1e-12)
    Ri, ti = geo.iso_inverse(jnp.asarray(Ra), jnp.asarray(ta))
    Ti = np.linalg.inv(T)
    np.testing.assert_allclose(Ri, Ti[:3, :3], atol=1e-12)
    np.testing.assert_allclose(ti, Ti[:3, 3], atol=1e-12)


def test_quat_roundtrip_vs_scipy():
    Rm = Rotation.random(50, random_state=11).as_matrix()
    q = np.asarray(geo.R_to_quat(jnp.asarray(Rm)))
    q_ref = Rotation.from_matrix(Rm).as_quat()
    # sign-canonicalize scipy's output for comparison
    q_ref = q_ref * np.where(q_ref[:, 3:4] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q, q_ref, atol=1e-12)
    R_back = np.asarray(geo.quat_to_R(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, Rm, atol=1e-12)


def test_euler_xyz_vs_scipy():
    e = rng.uniform(-1.2, 1.2, size=(20, 3))
    R = np.asarray(geo.euler_xyz_intrinsic_to_R(jnp.asarray(e)))
    R_ref = Rotation.from_euler("XYZ", e).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)
    e_back = np.asarray(geo.R_to_euler_xyz_intrinsic(jnp.asarray(R)))
    e_ref = Rotation.from_matrix(R_ref).as_euler("XYZ")
    np.testing.assert_allclose(e_back, e_ref, atol=1e-10)


def test_gravity_align():
    g = np.array([0.0, 0.0, -9.81])
    acc = np.array([0.3, -0.2, 9.7])
    R = np.asarray(geo.gravity_align_rotation(jnp.asarray(acc), jnp.asarray(g)))
    aligned = R @ (acc / np.linalg.norm(acc))
    np.testing.assert_allclose(aligned, g / np.linalg.norm(g), atol=1e-12)
    # identity when already aligned
    R2 = np.asarray(geo.gravity_align_rotation(jnp.asarray(g), jnp.asarray(g)))
    np.testing.assert_allclose(R2, np.eye(3), atol=1e-12)


def test_svd_orthonormalize():
    R = random_R(1)[0] + 1e-4 * rng.normal(size=(3, 3))
    Ro = np.asarray(geo.svd_orthonormalize(jnp.asarray(R)))
    np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-12)
    U, _, Vt = np.linalg.svd(R)
    np.testing.assert_allclose(Ro, U @ Vt, atol=1e-12)


def test_idp_angles_m_matches_reference_formula():
    d = rng.normal(size=(10, 3))
    m = np.asarray(geo.idp_angles_m(jnp.asarray(d)))
    for i in range(10):
        x, y, z = d[i]
        th = np.arctan2(x, z)
        ph = np.arctan2(-y, np.sqrt(x * x + z * z))
        ref = np.array([np.cos(ph) * np.sin(th), -np.sin(ph), np.cos(ph) * np.cos(th)])
        np.testing.assert_allclose(m[i], ref, atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(m[i]), 1.0, atol=1e-12)
