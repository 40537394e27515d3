"""Fused update-terms kernel (interpret mode) vs the XLA projector path."""

import numpy as np

import jax.numpy as jnp

from msckf_tpu.ops.pallas_kernels import update_terms_fused
from msckf_tpu.ops.smallmat import tikhonov_inv_sym3


def _xla_reference(H, Hf, r, P, crit, sel_ok, sigma2, rcond):
    HtH = jnp.einsum("uri,urj->uij", Hf, Hf)
    W = tikhonov_inv_sym3(HtH, rcond)
    Hf_r = jnp.einsum("uri,ur->ui", Hf, r)
    r_t = r - jnp.einsum("uri,uij,uj->ur", Hf, W, Hf_r)
    Hf_H = jnp.einsum("uri,urd->uid", Hf, H)
    H_t = H - jnp.einsum("uri,uij,ujd->urd", Hf, W, Hf_H)
    R2 = H.shape[1]
    S = jnp.einsum("urd,de,use->urs", H_t, P, H_t) + sigma2 * jnp.eye(R2, dtype=H.dtype)
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(S)
    sol = jsl.cho_solve((L, True), r_t[..., None])[..., 0]
    gamma = jnp.sum(r_t * sol, axis=-1)
    passed = sel_ok & (gamma <= crit)
    H_w = jnp.where(passed[:, None, None], H_t, 0.0)
    r_w = jnp.where(passed[:, None], r_t, 0.0)
    A = jnp.einsum("urd,ure->de", H_w, H_w)
    c = jnp.einsum("urd,ur->d", H_w, r_w)
    return A, c, passed


def test_fused_update_terms_matches_xla():
    rng = np.random.default_rng(0)
    U, R2, D = 6, 12, 27
    f32 = np.float32
    # realistic structure: Hf rank-3-ish per track, some zero (padding) rows
    Hf = rng.normal(size=(U, R2, 3)).astype(f32)
    H = rng.normal(size=(U, R2, D)).astype(f32) * 0.5
    r = rng.normal(size=(U, R2)).astype(f32) * 0.1
    Hf[:, 8:, :] = 0.0  # padded observation rows
    H[:, 8:, :] = 0.0
    r[:, 8:] = 0.0
    Pm = rng.normal(size=(D, D)).astype(f32) * 0.05
    P = Pm @ Pm.T
    sigma2 = 0.01
    rcond = 1e-6
    # mixed thresholds: some pass, some fail, one NaN (dof-0 sentinel)
    crit = np.full(U, 50.0, f32)
    crit[1] = 1e-6
    crit[2] = np.nan
    sel_ok = np.ones(U, bool)
    sel_ok[5] = False

    args = (jnp.asarray(H), jnp.asarray(Hf), jnp.asarray(r), jnp.asarray(P),
            jnp.asarray(crit), jnp.asarray(sel_ok))
    A_ref, c_ref, p_ref = _xla_reference(*args, sigma2, rcond)
    A, c, p = update_terms_fused(*args, sigma2, rcond, interpret=True)

    np.testing.assert_array_equal(np.asarray(p), np.asarray(p_ref))
    assert not bool(p[2]) and not bool(p[5])  # NaN crit and padding fail
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref), rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=2e-3, atol=5e-5)
