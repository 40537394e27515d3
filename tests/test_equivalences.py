"""Numerical proofs of the TPU build's exact re-formulations.

The TPU filter replaces two reference formulations with algebraically equal
fixed-shape ones (see ``msckf_tpu/filter/update.py`` docstring). These tests
validate the equalities on random instances, independent of the filter.
"""

import numpy as np
from scipy.linalg import null_space

rng = np.random.default_rng(0)


def _random_spd(n, scale=1.0):
    A = rng.normal(size=(n, n))
    return scale * (A @ A.T) + 1e-3 * np.eye(n)


def test_projector_equals_nullspace_basis():
    """Pi = I - Hf (Hf^T Hf)^-1 Hf^T gives the same H^T H, H^T r, and
    chi-square statistic as the explicit left-nullspace basis."""
    M, D = 7, 33  # 2M rows
    rows = 2 * M
    Hf = rng.normal(size=(rows, 3))
    Hx = rng.normal(size=(rows, D))
    r = rng.normal(size=(rows, 1))
    P = _random_spd(D, 0.1)
    sigma2 = 0.01

    A = null_space(Hf.T)  # (rows, rows-3)
    r_o = A.T @ r
    H_o = A.T @ Hx

    Pi = np.eye(rows) - Hf @ np.linalg.inv(Hf.T @ Hf) @ Hf.T
    r_t = Pi @ r
    H_t = Pi @ Hx

    np.testing.assert_allclose(H_t.T @ H_t, H_o.T @ H_o, atol=1e-10)
    np.testing.assert_allclose(H_t.T @ r_t, H_o.T @ r_o, atol=1e-10)

    g_basis = float(r_o.T @ np.linalg.inv(H_o @ P @ H_o.T + sigma2 * np.eye(rows - 3)) @ r_o)
    g_proj = float(r_t.T @ np.linalg.inv(H_t @ P @ H_t.T + sigma2 * np.eye(rows)) @ r_t)
    np.testing.assert_allclose(g_proj, g_basis, rtol=1e-9)


def test_information_form_equals_qr_compression_update():
    """delta_x and the Joseph-form posterior from the reference's
    QR-compression path equal the information-form expressions
    L = P (s^2 I + A P)^-1, delta = L c, P+ = (I-LA)P(I-LA)^T + s^2 L A L^T."""
    D, rows = 21, 80
    H = rng.normal(size=(rows, D))
    r = rng.normal(size=(rows, 1))
    P = _random_spd(D, 0.05)
    s2 = 0.01

    # reference path (`MSCKF.py:587-614`)
    Q_, R_ = np.linalg.qr(H, mode="reduced")
    TH = R_
    rn = Q_.T @ r
    Rn = Q_.T @ (s2 * np.eye(rows)) @ Q_
    S = TH @ P @ TH.T + Rn
    K = P @ TH.T @ np.linalg.inv(S)
    dx_ref = K @ rn
    I = np.eye(D)
    P_ref = (I - K @ TH) @ P @ (I - K @ TH).T + K @ Rn @ K.T

    # information form (TPU path)
    A = H.T @ H
    c = H.T @ r
    L = P @ np.linalg.inv(s2 * I + A @ P)
    dx = L @ c
    P_new = (I - L @ A) @ P @ (I - L @ A).T + s2 * (L @ A @ L.T)

    np.testing.assert_allclose(dx, dx_ref, atol=1e-9)
    np.testing.assert_allclose(P_new, P_ref, atol=1e-9)


def test_information_form_equals_uncompressed_update():
    """With rows < cols the reference skips QR (`MSCKF.py:599-602`); the
    information form still matches."""
    D, rows = 33, 12
    H = rng.normal(size=(rows, D))
    r = rng.normal(size=(rows, 1))
    P = _random_spd(D, 0.05)
    s2 = 0.01

    S = H @ P @ H.T + s2 * np.eye(rows)
    K = P @ H.T @ np.linalg.inv(S)
    dx_ref = K @ r
    I = np.eye(D)
    P_ref = (I - K @ H) @ P @ (I - K @ H).T + s2 * (K @ K.T)

    A = H.T @ H
    c = H.T @ r
    L = P @ np.linalg.inv(s2 * I + A @ P)
    np.testing.assert_allclose(L @ c, dx_ref, atol=1e-10)
    P_new = (I - L @ A) @ P @ (I - L @ A).T + s2 * (L @ A @ L.T)
    np.testing.assert_allclose(P_new, P_ref, atol=1e-10)


def test_zero_row_padding_invariance():
    """Padding H, r with zero rows leaves the information-form update
    unchanged — the property that makes static shapes exact."""
    D, rows, pad = 15, 20, 13
    H = rng.normal(size=(rows, D))
    r = rng.normal(size=(rows, 1))
    Hp = np.vstack([H, np.zeros((pad, D))])
    rp = np.vstack([r, np.zeros((pad, 1))])
    np.testing.assert_allclose(Hp.T @ Hp, H.T @ H, atol=0)
    np.testing.assert_allclose(Hp.T @ rp, H.T @ r, atol=0)
