"""vmap dispatch of the Pallas kernels (interpret mode): every production
kernel must produce per-element results identical to a Python loop over the
unbatched kernel when vmapped (the custom_vmap batch-grid path used by
`parallel/batched.py` and `runner --batch`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msckf_tpu.ops import pallas_kernels as pk

B, F, M = 3, 16, 8


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.fixture(scope="module")
def K():
    return jnp.asarray([[180.0, 0, 320], [0, 180, 240], [0, 0, 1]], jnp.float32)


def test_update_terms_vmap(rng):
    U, R2, D = 12, 16, 63
    H = jnp.asarray(rng.normal(size=(B, U, R2, D)), jnp.float32)
    Hf = jnp.asarray(rng.normal(size=(B, U, R2, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(B, U, R2)), jnp.float32)
    P = jnp.asarray(rng.normal(size=(B, D, D)), jnp.float32)
    P = P @ jnp.swapaxes(P, -1, -2)
    crit = jnp.abs(jnp.asarray(rng.normal(size=(B, U)), jnp.float32)) * 1000
    sel = jnp.ones((B, U), bool)

    def f(h, hf, rr, p, c, s):
        return pk.update_terms_fused(h, hf, rr, p, c, s, 0.01, 1e-6, interpret=True)

    Av, cv, pv = jax.vmap(f)(H, Hf, r, P, crit, sel)
    for b in range(B):
        A1, c1, p1 = f(H[b], Hf[b], r[b], P[b], crit[b], sel[b])
        np.testing.assert_allclose(np.asarray(Av[b]), np.asarray(A1), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cv[b]), np.asarray(c1), rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(pv[b]), np.asarray(p1))


def test_update_terms_tile_padding(rng):
    """U not divisible by the tile size exercises the sel_ok padding path."""
    U, R2, D = 10, 16, 63
    H = jnp.asarray(rng.normal(size=(U, R2, D)), jnp.float32)
    Hf = jnp.asarray(rng.normal(size=(U, R2, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(U, R2)), jnp.float32)
    P = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
    P = P @ P.T
    crit = jnp.full((U,), 1e6, jnp.float32)
    sel = jnp.ones((U,), bool)
    A, c, passed = pk.update_terms_fused(H, Hf, r, P, crit, sel, 0.01, 1e-6, interpret=True)
    assert passed.shape == (U,)
    # reference accumulation through the projector (same math as the kernel)
    HtH = np.einsum("uri,urj->uij", np.asarray(Hf), np.asarray(Hf))
    for u in range(U):
        W = np.linalg.pinv(HtH[u])
        Pi = np.eye(R2) - np.asarray(Hf)[u] @ W @ np.asarray(Hf)[u].T
        Ht = Pi @ np.asarray(H)[u]
        if u == 0:
            A_ref = Ht.T @ Ht
        else:
            A_ref += Ht.T @ Ht
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-3, atol=1e-2)


def test_verification_vmap(rng, K):
    Kinv = jnp.linalg.inv(K)
    R1 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, F, M, 3, 3))
    t1 = jnp.asarray(rng.normal(size=(B, F, M, 3)), jnp.float32)
    kp1 = jnp.asarray(rng.normal(size=(B, F, M, 2)) * 100 + 200, jnp.float32)
    kp2 = jnp.asarray(rng.normal(size=(B, F, 2)) * 100 + 200, jnp.float32)
    camR = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    camt = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)

    def f(*a):
        return pk.verification_scores(*a, K, Kinv, interpret=True)

    hv, ev, bv = jax.vmap(f)(R1, t1, kp1, kp2, camR, camt)
    for b in range(B):
        h1, e1, b1 = f(R1[b], t1[b], kp1[b], kp2[b], camR[b], camt[b])
        np.testing.assert_allclose(np.asarray(hv[b]), np.asarray(h1), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ev[b]), np.asarray(e1), rtol=1e-5, atol=1e-2)
        np.testing.assert_allclose(np.asarray(bv[b]), np.asarray(b1), rtol=1e-6)


def test_triage_vmap(rng, K):
    Kinv = jnp.linalg.inv(K)
    lb = jnp.asarray(rng.normal(size=(B, F, M, 3)), jnp.float32)
    ld = jnp.asarray(rng.normal(size=(B, F, M, 3)), jnp.float32)
    w = jnp.abs(jnp.asarray(rng.normal(size=(B, F, M)), jnp.float32))
    aR = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, F, 3, 3))
    at = jnp.asarray(rng.normal(size=(B, F, 3)), jnp.float32)

    def g(*a):
        return pk.triage_refresh_fused(*a, K, Kinv, 1e-6, 640.0, 480.0, interpret=True)

    mv, rv, ov = jax.vmap(g)(lb, ld, w, aR, at)
    for b in range(B):
        m1, r1, o1 = g(lb[b], ld[b], w[b], aR[b], at[b])
        np.testing.assert_allclose(np.asarray(mv[b]), np.asarray(m1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rv[b]), np.asarray(r1), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ov[b]), np.asarray(o1))


def test_propagate_block_vmap(rng):
    nt = 6
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    z3 = jnp.zeros((B, 3), jnp.float32)
    lts = jnp.zeros((B,), jnp.float32)
    pc = jnp.zeros((B,), jnp.int32)
    ts = jnp.broadcast_to(jnp.arange(1, nt + 1, dtype=jnp.float32) * 0.005, (B, nt))
    gy = jnp.asarray(rng.normal(size=(B, nt, 3)) * 0.01, jnp.float32)
    ac = jnp.asarray(
        rng.normal(size=(B, nt, 3)) * 0.01 + np.array([0, 0, 9.81]), jnp.float32
    )
    vl = jnp.ones((B, nt), bool)
    qc = jnp.ones((B, 12), jnp.float32) * 1e-6
    gv = jnp.broadcast_to(jnp.asarray([0.0, 0, -9.81], jnp.float32), (B, 3))
    P15 = jnp.broadcast_to(jnp.eye(15, dtype=jnp.float32) * 1e-4, (B, 15, 15))

    def h(*a):
        return pk.propagate_block_fused(*a, interpret=True)

    outs_v = jax.vmap(h)(R0, z3, z3, z3, z3, lts, pc, ts, gy, ac, vl, qc, gv, P15)
    for b in range(B):
        outs_1 = h(
            R0[b], z3[b], z3[b], z3[b], z3[b], lts[b], pc[b], ts[b], gy[b],
            ac[b], vl[b], qc[b], gv[b], P15[b],
        )
        for i, (xv, x1) in enumerate(zip(outs_v, outs_1)):
            np.testing.assert_allclose(
                np.asarray(xv[b]), np.asarray(x1), rtol=1e-5, atol=1e-6,
                err_msg=f"output {i}",
            )
