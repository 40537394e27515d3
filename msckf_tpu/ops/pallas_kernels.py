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
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# Batch support: every production kernel accepts an optional leading batch
# axis, implemented as an extra (leading) grid dimension with squeezed blocks
# — the kernel bodies are shared between the single and batched forms. A
# custom_vmap rule on each public wrapper dispatches jax.vmap to the batched
# grid instead of jax's default pallas batching (whose auto-inserted leading
# block dims violate Mosaic's tiling rules for these layouts), so the
# vmapped multi-trajectory paths (`parallel/batched.py`, `runner --batch`)
# run the same kernels as the single-sequence filter.
# ---------------------------------------------------------------------------


def _vspec(shape, batched: bool, grid_rank: int = 1):
    """BlockSpec for one input/output: whole-array block, optionally sliced
    along a squeezed leading batch axis by grid dim 0. ``grid_rank`` is the
    total number of grid dimensions (trailing ones are ignored by the map)."""
    if not batched:
        if grid_rank == 0:
            return pl.BlockSpec(memory_space=pltpu.VMEM)
        zeros = (0,) * len(shape)
        return pl.BlockSpec(
            shape, lambda *g: zeros, memory_space=pltpu.VMEM
        )
    zeros = (0,) * len(shape)
    return pl.BlockSpec(
        (None,) + tuple(shape), lambda *g: (g[0],) + zeros, memory_space=pltpu.VMEM
    )


def _broadcast_unbatched(axis_size, in_batched, args):
    """Give every argument a leading batch axis (materializing B copies of
    the unbatched ones — all small constants here)."""
    out = []
    for b, a in zip(in_batched, args):
        a = jnp.asarray(a)
        out.append(a if b else jnp.broadcast_to(a, (axis_size,) + a.shape))
    return out


def _gating_kernel(S_ref, r_ref, gamma_ref):
    U, n, _ = S_ref.shape  # U = one tile of the update batch
    A = S_ref[:]  # (U, n, n) resident in VMEM
    r = r_ref[:]  # (U, n)

    row = jax.lax.broadcasted_iota(jnp.int32, (U, n), dimension=1)
    gamma = jnp.zeros((U,), dtype=S_ref.dtype)
    # right-looking Cholesky + fused forward substitution, batched across U.
    # Static unroll over the (small, fixed) residual dimension: Mosaic
    # software-pipelines the unrolled straight-line code to ~3 us/call at
    # tile 8 — rolled fori_loop forms (value- or scratch-ref-based, with or
    # without manual partial unroll) measured 250-1000x slower (~12-20 us
    # PER PIVOT STEP of loop/dynamic-slice overhead), so the unroll is
    # load-bearing. Its cost is Mosaic scoped-VMEM stack (~20 MB at tile 32,
    # over the 16 MB limit) and compile time, which bound the tile size.
    # Full-size masked updates: uniform (U, n, n) shapes keep Mosaic layouts
    # stable (trailing-submatrix shrinking forces per-step relayouts on TPU).
    # The pivot column is read as the pivot ROW A[:, j, :] — equal by the
    # symmetry the update preserves — because extracting along the minor
    # (lane) axis forces a per-step cross-lane relayout on TPU while a
    # sublane row extraction is near-free (measured ~30% frame cost).
    for j in range(n):
        rowj = A[:, j, :]  # (U, n) == A[:, :, j] by symmetry
        d = rowj[:, j]  # (U,)
        inv_sqrt_d = jax.lax.rsqrt(d)
        col = rowj * inv_sqrt_d[:, None]  # (U, n) = L[:, :, j] for rows >= j
        lcol = jnp.where(row >= j, col, 0.0)
        # trailing update A -= l l^T (masked column already zeroes rows < j)
        A = A - lcol[:, :, None] * lcol[:, None, :]
        # forward substitution step: y_j = r_j / L[j, j]; r -= L[:, j] y_j
        yj = r[:, j] * inv_sqrt_d
        r = r - jnp.where(row > j, lcol, 0.0) * yj[:, None]
        gamma = gamma + yj * yj
    gamma_ref[:, 0] = gamma


def _gating_kernel_blocked(S_ref, r_ref, gamma_ref, *, nb: int):
    """Panel-blocked variant of ``_gating_kernel`` (round 4).

    The rank-1 right-looking form above makes n full passes over the
    (U, n, n) trailing matrix — VMEM-bandwidth-bound (it was the reason the
    batched path fell back to XLA in round 3). This version factors nb
    columns at a time: per column only O(U*n) row work (pivot-row correction
    by the panel's earlier columns + fused forward substitution), then ONE
    masked trailing update A -= sum_j l_j l_j^T per panel — n/nb full-matrix
    passes instead of n (6-8x less VMEM traffic at n=64, nb=8). Same
    pivot-ROW-by-symmetry and uniform-shape masking tricks as above; same
    NaN-poisoning semantics (rsqrt of a non-positive pivot poisons that
    system's gamma -> gate fail).
    """
    U, n, _ = S_ref.shape
    A = S_ref[:]  # (U, n, n) resident in VMEM
    r = r_ref[:]  # (U, n)

    row = jax.lax.broadcasted_iota(jnp.int32, (U, n), dimension=1)
    gamma = jnp.zeros((U,), dtype=S_ref.dtype)
    for k0 in range(0, n, nb):
        w = min(nb, n - k0)
        panel = []
        for j in range(w):
            jj = k0 + j
            # raw pivot row from A (A only carries panel-boundary updates);
            # corrections by this panel's earlier columns applied here as
            # O(U*n) vector ops — A[:, jj, :] == A[:, :, jj] by symmetry
            rowj = A[:, jj, :]
            for k in range(j):
                rowj = rowj - panel[k] * panel[k][:, jj][:, None]
            inv_sqrt_d = jax.lax.rsqrt(rowj[:, jj])
            lcol = jnp.where(row >= jj, rowj * inv_sqrt_d[:, None], 0.0)
            panel.append(lcol)
            # forward substitution (r kept current every column)
            yj = r[:, jj] * inv_sqrt_d
            r = r - jnp.where(row > jj, lcol, 0.0) * yj[:, None]
            gamma = gamma + yj * yj
        # one trailing pass per panel: A -= sum_j l_j l_j^T (masked columns
        # zero rows < jj, so the factored upper-left region is untouched)
        upd = panel[0][:, :, None] * panel[0][:, None, :]
        for j in range(1, w):
            upd = upd + panel[j][:, :, None] * panel[j][:, None, :]
        A = A - upd
    gamma_ref[:, 0] = gamma


# tile of the update batch per grid step (env-overridable for perf probes).
# Grid steps carry ~12 us of in-context overhead each inside the big filter
# scan, so bigger tiles win — but the unrolled kernel's Mosaic scoped-VMEM
# stack grows with the tile: a (32, 64, 64) block allocates ~20 MB of stack,
# over the default 16 MB scoped-VMEM limit (compilable only with
# xla_tpu_scoped_vmem_limit_kib raised), and measured no faster than 16
# in-scan once the pivot row/column reads were made sublane-extractions
# (803.9 vs 812.8 Hz full-shape, docs/PERF.md round 3). 16 fits everywhere.
import os as _os

_GATING_TILE_ENV = _os.environ.get("MSCKF_TPU_GATING_TILE", "")
_GATING_NB = int(_os.environ.get("MSCKF_TPU_GATING_NB", "8"))


def _gating_tile(U: int) -> int:
    if _GATING_TILE_ENV:
        return min(int(_GATING_TILE_ENV), U)
    return min(16, U)


def _gating_call(S, r, interpret, batched=False):
    """Gating statistic over a flat batch of systems. Any leading batch axis
    (``batched=True`` legacy form, or the custom_vmap rule below) is
    FLATTENED into the system axis — one kernel, a bigger tile grid — rather
    than given its own grid dimension (the round-3 batched grid serialized
    B x U/tile small steps; flat tiles keep each grid step full)."""
    lead = S.shape[:-2]
    n = S.shape[-1]
    U = 1
    for d in lead:
        U *= d
    S = S.reshape(U, n, n)
    r = r.reshape(U, n)
    Ut = _gating_tile(U)
    Up = -(-U // Ut) * Ut
    if Up != U:
        # zero-pad rows: rsqrt(0) -> inf/NaN confined to the (discarded)
        # padding batch elements (per-element independent arithmetic)
        S = jnp.pad(S, [(0, Up - U), (0, 0), (0, 0)])
        r = jnp.pad(r, [(0, Up - U), (0, 0)])

    def spec(shape, index):
        return pl.BlockSpec(
            shape,
            lambda i, index=index: tuple(i if x == "t" else 0 for x in index),
            memory_space=pltpu.VMEM,
        )

    gamma = pl.pallas_call(
        functools.partial(_gating_kernel_blocked, nb=min(_GATING_NB, n)),
        grid=(Up // Ut,),
        out_shape=jax.ShapeDtypeStruct((Up, 1), S.dtype),
        in_specs=[
            spec((Ut, n, n), ("t", 0, 0)),
            spec((Ut, n), ("t", 0)),
        ],
        out_specs=spec((Ut, 1), ("t", 0)),
        interpret=interpret,
    )(S, r)
    return gamma[:U, 0].reshape(lead)


def blocked_gamma_xla(S: jnp.ndarray, r: jnp.ndarray, nb: int = 8) -> jnp.ndarray:
    """gamma = r^T S^{-1} r by panel-blocked Cholesky in plain XLA.

    The batched form of the gating statistic: the Mosaic gating kernel
    serializes one U-tile per grid step (64 grid steps at batch 32 x 2
    U-tiles, ~1.8 ms/frame — VMEM-bandwidth-bound: rank-1 right-looking
    Cholesky makes n passes over the n^2 trailing matrix). This version
    (a) flattens every leading axis into one big batch that XLA keeps fully
    data-parallel, and (b) blocks the factorization into nb-column panels so
    the trailing matrix is touched n/nb times via one batched MXU product
    per panel instead of n times. Forward substitution is fused into the
    panel pass exactly like the kernel. NaN/rsqrt(0) semantics match the
    kernel: degenerate rows poison gamma, which the gate treats as "fail".
    """
    n = S.shape[-1]
    lead = S.shape[:-2]
    A = S.reshape((-1, n, n))
    yrem = r.reshape((-1, n))
    gamma = jnp.zeros(A.shape[:1], S.dtype)
    for k0 in range(0, n, nb):
        w = min(nb, n - k0)
        m = n - k0  # remaining rows
        panel = A[:, :, :w]  # (BU, m, w) — panel columns, all remaining rows
        rows = jnp.arange(m)
        Lcols = []
        for j in range(w):
            d = jax.lax.rsqrt(panel[:, j, j])  # (BU,)
            col = jnp.where(rows >= j, panel[:, :, j] * d[:, None], 0.0)
            Lcols.append(col)
            # eliminate from the remaining panel columns
            cols = jnp.arange(w)
            panel = panel - jnp.where(
                cols[None, None, :] > j, col[:, :, None] * col[:, None, :w], 0.0
            )
            # fused forward substitution: y_j = r_j / L[j,j]; r -= L[:,j] y_j
            yj = yrem[:, j] * d
            yrem = yrem - jnp.where(rows > j, col, 0.0) * yj[:, None]
            gamma = gamma + yj * yj
        if k0 + w < n:
            L21 = jnp.stack([c[:, w:] for c in Lcols], axis=-1)  # (BU, m-w, w)
            A = A[:, w:, w:] - jnp.einsum("bik,bjk->bij", L21, L21)
            yrem = yrem[:, w:]
    return gamma.reshape(lead)


@functools.lru_cache(maxsize=None)
def _gating_cv(interpret: bool):
    @custom_vmap
    def f(S, r):
        return _gating_call(S, r, interpret, batched=False)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        S, r = _broadcast_unbatched(axis_size, in_batched, args)
        # batched: flatten (B, U) into one big system axis and run the SAME
        # blocked kernel — one custom call vs the round-3 alternatives (the
        # batched GRID form serialized B x U/tile steps at ~1.8 ms/frame;
        # the plain-XLA blocked-Cholesky fallback emitted ~490 small thunks
        # at ~1.45 ms/frame, a third of the batched path's thunk count)
        return _gating_call(S, r, interpret, batched=True), True

    return f


def batched_gating_gamma(S: jnp.ndarray, r: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """gamma_j = r_j^T S_j^{-1} r_j for a batch of SPD systems.

    S: (U, n, n) SPD (sigma^2-regularized), r: (U, n). Returns (U,).
    Grids over U-tiles of 16 (VMEM + Mosaic-compile bounded); vmap
    dispatches to the plain-XLA blocked-Cholesky form (`blocked_gamma_xla`),
    which stays fully data-parallel across the batch.
    """
    return _gating_cv(bool(interpret))(S, r)


def gating_gamma_reference(S: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA reference: Cholesky solve (what the kernel replaces)."""
    L = jnp.linalg.cholesky(S)
    sol = jax.scipy.linalg.cho_solve((L, True), r[..., None])[..., 0]
    return jnp.sum(r * sol, axis=-1)


# --------------------------------------------------------------------------
# Fused update terms: nullspace projector -> gating statistic -> masked
# information accumulation, one kernel over the whole update batch.
# Replaces ~10 medium HLO thunks (einsums, cholesky custom-calls, masked
# reductions) per EKF update. H (the stacked OC Jacobians) is built outside
# (cheap broadcast work); everything that touches it repeatedly lives here.
# --------------------------------------------------------------------------


def _update_terms_kernel(
    rcond: float,
    tile_dim: int,  # grid dimension that walks the U tiles (1 when batched)
    H_ref,      # (Ut, 2M, D) stacked OC-projected Jacobian rows (pre-nullspace)
    Hf_ref,     # (Ut, 2M, 3) feature-position Jacobian rows
    r_ref,      # (Ut, 2M) residual rows
    P_ref,      # (D, D) covariance
    crit_ref,   # (Ut, 1) chi2 critical values (NaN -> fail)
    selok_ref,  # (Ut, 1) int mask of real (non-padding) tracks
    sig_ref,    # (1, 1) sigma^2
    A_ref,      # out (D, D) — accumulated across the U-tile grid
    c_ref,      # out (1, D)
    passed_ref, # out (Ut, 1) int
    Ht_scr,     # scratch (Ut, 2M, D)
    S_scr,      # scratch (Ut, 2M, 2M)
):
    """One U-tile of the fused update-terms pipeline.

    Grid dimension 0 walks tiles of the update batch; A/c outputs map to the
    same (D, D)/(1, D) block every step and accumulate (TPU grids execute
    sequentially), keeping VMEM bounded by the tile size instead of the whole
    batch (VMEM is ~16 MB/core; the full reference-shaped batch U=128,
    2M=64, D=207 would need ~3x that resident at once)."""
    dt_ = H_ref.dtype
    U, R2, D = H_ref.shape
    H = H_ref[:]
    Hf = Hf_ref[:]
    r = r_ref[:]
    P = P_ref[:]
    sigma2 = sig_ref[0, 0]

    # --- Pi = I - Hf (Hf^T Hf + eps I)^-1 Hf^T applied to r and H ---
    # 3x3 grams per track via lane reductions (channel-sliced 2-D ops)
    def gram(i, j):
        return jnp.sum(Hf[:, :, i] * Hf[:, :, j], axis=1)  # (U,)

    g00, g01, g02 = gram(0, 0), gram(0, 1), gram(0, 2)
    g11, g12, g22 = gram(1, 1), gram(1, 2), gram(2, 2)
    tr = g00 + g11 + g22
    scale = jnp.maximum(tr / 3.0, 1e-20)
    eps = 3.0 * rcond
    a = g00 / scale + eps
    b = g01 / scale
    cc = g02 / scale
    d = g11 / scale + eps
    e = g12 / scale
    f = g22 / scale + eps
    co00 = d * f - e * e
    co01 = cc * e - b * f
    co02 = b * e - cc * d
    co11 = a * f - cc * cc
    co12 = cc * b - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + cc * co02
    det = jnp.where(jnp.abs(det) < 1e-38, 1e-38, det)
    inv_det = 1.0 / (det * scale)
    # W = (HtH + eps)^+ entries (symmetric), scaled back
    W00 = co00 * inv_det
    W01 = co01 * inv_det
    W02 = co02 * inv_det
    W11 = co11 * inv_det
    W12 = co12 * inv_det
    W22 = co22 * inv_det

    Hf0, Hf1, Hf2 = Hf[:, :, 0], Hf[:, :, 1], Hf[:, :, 2]  # (U, 2M)

    # r~ = r - Hf W Hf^T r
    t0 = jnp.sum(Hf0 * r, axis=1)  # (U,)
    t1 = jnp.sum(Hf1 * r, axis=1)
    t2 = jnp.sum(Hf2 * r, axis=1)
    w0 = W00 * t0 + W01 * t1 + W02 * t2
    w1 = W01 * t0 + W11 * t1 + W12 * t2
    w2 = W02 * t0 + W12 * t1 + W22 * t2
    r_t = r - (Hf0 * w0[:, None] + Hf1 * w1[:, None] + Hf2 * w2[:, None])

    # H~ = H - Hf W (Hf^T H); Hf^T H via per-channel weighted row sums
    B0 = jnp.sum(Hf0[:, :, None] * H, axis=1)  # (U, D)
    B1 = jnp.sum(Hf1[:, :, None] * H, axis=1)
    B2 = jnp.sum(Hf2[:, :, None] * H, axis=1)
    C0 = W00[:, None] * B0 + W01[:, None] * B1 + W02[:, None] * B2
    C1 = W01[:, None] * B0 + W11[:, None] * B1 + W12[:, None] * B2
    C2 = W02[:, None] * B0 + W12[:, None] * B1 + W22[:, None] * B2
    H_t = H - (
        Hf0[:, :, None] * C0[:, None, :]
        + Hf1[:, :, None] * C1[:, None, :]
        + Hf2[:, :, None] * C2[:, None, :]
    )

    # --- gating: gamma_u = r~^T (H~ P H~^T + sigma^2 I)^-1 r~ ---
    # per-track MXU matmuls, statically unrolled. Slices must go through a
    # VMEM scratch ref: integer-indexing a ref yields a clean 2-D block,
    # while squeezing an in-register rank-3 value is an unsupported Mosaic
    # shape cast.
    Ht_scr[:] = H_t
    eyeR = jnp.eye(R2, dtype=dt_)
    for u in range(U):
        Hu = Ht_scr[u]  # (R2, D)
        S_scr[u] = (Hu @ P) @ Hu.T + sigma2 * eyeR
    S = S_scr[:]  # (U, R2, R2)
    # batched Cholesky + forward substitution (same recurrence as the
    # standalone gating kernel), vectorized across tracks
    rv = r_t
    Au = S
    row2 = jax.lax.broadcasted_iota(jnp.int32, (U, R2), dimension=1)
    gamma = jnp.zeros((U,), dtype=dt_)
    for j in range(R2):
        # pivot row == pivot column by preserved symmetry; the row read is a
        # cheap sublane extraction (see _gating_kernel)
        rowj = Au[:, j, :]
        dj = rowj[:, j]
        inv_sqrt = jax.lax.rsqrt(dj)
        colj = rowj * inv_sqrt[:, None]
        lcol = jnp.where(row2 >= j, colj, 0.0)
        Au = Au - lcol[:, :, None] * lcol[:, None, :]
        yj = rv[:, j] * inv_sqrt
        rv = rv - jnp.where(row2 > j, lcol, 0.0) * yj[:, None]
        gamma = gamma + yj * yj

    # crit/selok/passed are column-major (Ut, 1): the U-tile axis must sit on
    # sublanes (divisible by 8) — lane-axis tiles below 128 are illegal
    crit = crit_ref[:, 0]
    selok = selok_ref[:, 0] > 0
    passed = selok & (gamma <= crit)  # NaN crit / NaN gamma -> fail

    # --- masked accumulation A = sum H~^T H~, c = sum H~^T r~ ---
    # (U,1,1) where-broadcasts are unsupported Mosaic shape casts; expand the
    # mask to (U, R2) first, then broadcast along lanes only
    # bool minor-dim insertion is unsupported in Mosaic: expand a 32-bit
    # mask and compare at the target rank instead
    passed_f = passed.astype(dt_)  # (U,)
    pr_f = passed_f[:, None] * jnp.ones((U, R2), dtype=dt_)  # (U, R2)
    H_w = jnp.where(pr_f[:, :, None] > 0.5, H_t, 0.0)
    r_w = jnp.where(pr_f > 0.5, r_t, 0.0)
    Ht_scr[:] = H_w
    A_acc = jnp.zeros((D, D), dtype=dt_)
    for u in range(U):
        Hu = Ht_scr[u]
        A_acc = A_acc + Hu.T @ Hu
    cx = jnp.sum(r_w[:, :, None] * H_w, axis=0)  # (R2, D)
    c_acc = jnp.sum(cx, axis=0, keepdims=True)  # (1, D)
    passed_ref[:, 0] = passed.astype(jnp.int32)

    # A/c map to the same block for every grid step: init on the first tile,
    # accumulate on the rest (TPU grid steps run sequentially, innermost
    # dimension fastest, so all tiles of one batch element are consecutive)
    @pl.when(pl.program_id(tile_dim) == 0)
    def _():
        A_ref[:] = A_acc
        c_ref[:] = c_acc

    @pl.when(pl.program_id(tile_dim) > 0)
    def _():
        A_ref[:] = A_ref[:] + A_acc
        c_ref[:] = c_ref[:] + c_acc


# 8 is a measured optimum: 16/32 fall off a ~300x VMEM/scheduling cliff
# (107 us -> 29 ms standalone at U=32, R2=64, D=207)
_UPDATE_TILE_U = 8


def _update_terms_call(H, Hf, r, P, crit, sel_ok, sigma2, rcond, interpret, batched):
    """Shared single/batched pallas_call. Batched inputs carry a leading B
    axis; the grid gains a leading (squeezed-block) batch dimension."""
    if batched:
        B, U, R2, D = H.shape
    else:
        U, R2, D = H.shape
    dt_ = H.dtype
    Ut = min(_UPDATE_TILE_U, U)
    Up = -(-U // Ut) * Ut
    if Up != U:
        # padding tracks carry sel_ok=0 -> gate fails -> zero contribution
        nb = int(batched)
        pad = [(0, 0)] * nb + [(0, Up - U)]
        H = jnp.pad(H, pad + [(0, 0), (0, 0)])
        Hf = jnp.pad(Hf, pad + [(0, 0), (0, 0)])
        r = jnp.pad(r, pad + [(0, 0)])
        crit = jnp.pad(crit, pad, constant_values=jnp.nan)
        sel_ok = jnp.pad(sel_ok, pad)
    nt = Up // Ut
    grid = (B, nt) if batched else (nt,)
    gr = len(grid)
    kernel = functools.partial(_update_terms_kernel, rcond, gr - 1)

    def spec(shape, index):
        """index: tile-indexed dims marked 't', broadcast dims 0."""
        if batched:
            return pl.BlockSpec(
                (None,) + shape,
                lambda b, i, index=index: (b,) + tuple(
                    i if x == "t" else 0 for x in index
                ),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            shape,
            lambda i, index=index: tuple(i if x == "t" else 0 for x in index),
            memory_space=pltpu.VMEM,
        )

    lead = (B,) if batched else ()
    A, c, passed = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(lead + (D, D), dt_),
            jax.ShapeDtypeStruct(lead + (1, D), dt_),
            jax.ShapeDtypeStruct(lead + (Up, 1), jnp.int32),
        ),
        in_specs=[
            spec((Ut, R2, D), ("t", 0, 0)),
            spec((Ut, R2, 3), ("t", 0, 0)),
            spec((Ut, R2), ("t", 0)),
            spec((D, D), (0, 0)),
            spec((Ut, 1), ("t", 0)),
            spec((Ut, 1), ("t", 0)),
            spec((1, 1), (0, 0)),
        ],
        out_specs=(
            spec((D, D), (0, 0)),
            spec((1, D), (0, 0)),
            spec((Ut, 1), ("t", 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((Ut, R2, D), dt_),
            pltpu.VMEM((Ut, R2, R2), dt_),
        ],
        interpret=interpret,
    )(
        H, Hf, r, P,
        crit.reshape(lead + (Up, 1)),
        sel_ok.astype(jnp.int32).reshape(lead + (Up, 1)),
        jnp.asarray(sigma2, dt_).reshape(lead + (1, 1)),
    )
    if batched:
        return A, c[:, 0], passed[:, :U, 0] > 0
    return A, c[0], passed[:U, 0] > 0


@functools.lru_cache(maxsize=None)
def _update_terms_cv(rcond: float, interpret: bool):
    @custom_vmap
    def f(H, Hf, r, P, crit, sel_ok, sigma2):
        return _update_terms_call(
            H, Hf, r, P, crit, sel_ok, sigma2, rcond, interpret, batched=False
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = _broadcast_unbatched(axis_size, in_batched, args)
        out = _update_terms_call(*args, rcond, interpret, batched=True)
        return out, (True, True, True)

    return f


def update_terms_fused(H, Hf, r, P, crit, sel_ok, sigma2, rcond, interpret=False):
    """Fused projector + gate + accumulation. Returns (A, c, passed).

    Grids over tiles of the update batch so VMEM residency is O(tile), not
    O(U) — required for the reference-shaped batch (u_max=128). vmap
    dispatches to an explicit batch grid dimension (see module note)."""
    return _update_terms_cv(float(rcond), bool(interpret))(
        H, Hf, r, P, crit, sel_ok, jnp.asarray(sigma2, H.dtype)
    )


# --------------------------------------------------------------------------
# Fused geometric-verification scores: the two-tier homography/epipolar
# residuals for every (track, observation) pair in one kernel.
# Representation: every 3x3 matrix field over (F, M) is nine (F, M) "planes"
# (channel slices of a rank-3 input), every constant matrix a scalar grid —
# all arithmetic is plane * plane or plane * scalar, the Mosaic-safe subset.
# --------------------------------------------------------------------------


def _mm_pp_sc(Ap, B, transpose_a=False):
    """plane-matrix @ scalar-matrix -> plane-matrix (row-major plane lists)."""
    out = []
    for i in range(3):
        for j in range(3):
            acc = None
            for k in range(3):
                a = Ap[k * 3 + i] if transpose_a else Ap[i * 3 + k]
                term = a * B[k][j]
                acc = term if acc is None else acc + term
            out.append(acc)
    return out


def _mm_sc_pp(A, Bp):
    out = []
    for i in range(3):
        for j in range(3):
            acc = None
            for k in range(3):
                term = Bp[k * 3 + j] * A[i][k]
                acc = term if acc is None else acc + term
            out.append(acc)
    return out


def _mm_pp_pp(Ap, Bp):
    out = []
    for i in range(3):
        for j in range(3):
            acc = None
            for k in range(3):
                term = Ap[i * 3 + k] * Bp[k * 3 + j]
                acc = term if acc is None else acc + term
            out.append(acc)
    return out


def _mv_pp(Ap, x):
    """plane-matrix @ plane-vector (3 planes) -> 3 planes."""
    return [
        Ap[i * 3 + 0] * x[0] + Ap[i * 3 + 1] * x[1] + Ap[i * 3 + 2] * x[2]
        for i in range(3)
    ]


def _verification_kernel(
    R1_ref,   # (9, Nr, 128) rotation planes, channel-first (N = F*M padded)
    t1_ref,   # (3, Nr, 128) center planes
    kp1_ref,  # (2, Nr, 128) historical keypoint planes
    kp2_ref,  # (2, Nr, 128) matched keypoint planes (repeated per observation)
    camR_ref,  # (3, 3) current camera rotation
    camt_ref,  # (1, 3) current camera center
    K_ref,     # (3, 3)
    Kinv_ref,  # (3, 3)
    homo_ref,  # out (Nr, 128)
    epi_ref,   # out (Nr, 128)
    base_ref,  # out (Nr, 128)
):
    # channel-first layout: every plane is a dense (Nr, 128) tile — both the
    # lane and sublane axes carry real data, keeping VMEM within budget
    # (lane-padding (N, 1) columns or (F, M=32) planes to 128 lanes blew it).
    R1p = [R1_ref[c] for c in range(9)]
    t1 = [t1_ref[c] for c in range(3)]
    kp1x = kp1_ref[0]
    kp1y = kp1_ref[1]
    kp2x = kp2_ref[0]
    kp2y = kp2_ref[1]
    camR = [[camR_ref[i, j] for j in range(3)] for i in range(3)]
    camt = [camt_ref[0, i] for i in range(3)]
    K = [[K_ref[i, j] for j in range(3)] for i in range(3)]
    Kinv = [[Kinv_ref[i, j] for j in range(3)] for i in range(3)]
    KinvT = [[Kinv[j][i] for j in range(3)] for i in range(3)]
    one = jnp.ones_like(kp1x)

    # T_C1_C2 = T1^-1 T2: R12 = R1^T camR, t12 = R1^T (camt - t1)
    R12 = _mm_pp_sc(R1p, camR, transpose_a=True)
    d = [camt[i] - t1[i] for i in range(3)]
    t12 = [
        R1p[0 * 3 + i] * d[0] + R1p[1 * 3 + i] * d[1] + R1p[2 * 3 + i] * d[2]
        for i in range(3)
    ]
    base_ref[:] = jnp.sqrt(t12[0] * t12[0] + t12[1] * t12[1] + t12[2] * t12[2])


    # homography branch: H = K R12 Kinv, Hinv = K R12^T Kinv (`MSCKF.py:352-358`)
    H = _mm_pp_sc(_mm_sc_pp(K, R12), Kinv)
    R12T = [R12[j * 3 + i] for i in range(3) for j in range(3)]
    Hinv = _mm_pp_sc(_mm_sc_pp(K, R12T), Kinv)
    x2h = [kp2x, kp2y, one]
    x1h = [kp1x, kp1y, one]
    x1p = _mv_pp(Hinv, x2h)
    x2p = _mv_pp(H, x1h)
    z1 = jnp.where(jnp.abs(x1p[2]) < 1e-30, 1e-30, x1p[2])
    z2 = jnp.where(jnp.abs(x2p[2]) < 1e-30, 1e-30, x2p[2])
    e1x = kp2x - x1p[0] / z1
    e1y = kp2y - x1p[1] / z1
    e2x = kp1x - x2p[0] / z2
    e2y = kp1y - x2p[1] / z2
    homo_ref[:] = 0.5 * (
        jnp.sqrt(e1x * e1x + e1y * e1y) + jnp.sqrt(e2x * e2x + e2y * e2y)
    )

    # epipolar branch: Fm = Kinv^T [t12]x R12 Kinv; score = x2^T Fm x1, signed
    # (`MSCKF.py:377-379`)
    zero = jnp.zeros_like(kp1x)
    skew_t = [zero, -t12[2], t12[1], t12[2], zero, -t12[0], -t12[1], t12[0], zero]
    Fm = _mm_pp_sc(_mm_sc_pp(KinvT, _mm_pp_pp(skew_t, R12)), Kinv)
    Fx1 = _mv_pp(Fm, x1h)
    epi_ref[:] = x2h[0] * Fx1[0] + x2h[1] * Fx1[1] + x2h[2] * Fx1[2]


def _verification_call(R1, t1, kp1, kp2, camR, camt, K, Kinv, interpret, batched):
    lead = t1.shape[:1] if batched else ()
    F, M = t1.shape[-3], t1.shape[-2]
    N = F * M
    Np = -(-N // 128) * 128
    Nr = Np // 128
    dt_ = t1.dtype

    def planes(x, C):
        flat = x.reshape(lead + (N, C))
        flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, Np - N), (0, 0)])
        return jnp.swapaxes(flat, -1, -2).reshape(lead + (C, Nr, 128))

    in_shapes = [(9, Nr, 128), (3, Nr, 128), (2, Nr, 128), (2, Nr, 128),
                 (3, 3), (1, 3), (3, 3), (3, 3)]
    kw = {}
    if batched:
        kw["grid"] = lead
        in_specs = [_vspec(s, True) for s in in_shapes]
        out_specs = tuple(_vspec((Nr, 128), True) for _ in range(3))
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
        out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3)
    out_shape = tuple(jax.ShapeDtypeStruct(lead + (Nr, 128), dt_) for _ in range(3))
    homo, epi, base = pl.pallas_call(
        _verification_kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        **kw,
    )(
        planes(R1, 9), planes(t1, 3), planes(kp1, 2),
        planes(jnp.broadcast_to(kp2[..., None, :], lead + (F, M, 2)), 2),
        camR.astype(dt_), camt.reshape(lead + (1, 3)).astype(dt_),
        K.astype(dt_), Kinv.astype(dt_),
    )

    def unplane(x):
        return x.reshape(lead + (Np,))[..., :N].reshape(lead + (F, M))

    return unplane(homo), unplane(epi), unplane(base)


@functools.lru_cache(maxsize=None)
def _verification_cv(interpret: bool):
    @custom_vmap
    def f(R1, t1, kp1, kp2, camR, camt, K, Kinv):
        return _verification_call(
            R1, t1, kp1, kp2, camR, camt, K, Kinv, interpret, batched=False
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = _broadcast_unbatched(axis_size, in_batched, args)
        return _verification_call(*args, interpret, batched=True), (True,) * 3

    return f


def verification_scores(R1, t1, kp1, kp2, camR, camt, K, Kinv, interpret=False):
    """(homography symmetric transfer error, signed epipolar residual,
    baseline norm) for every (track, observation) pair.

    R1: (F, M, 3, 3) (flattened to (F*M, 9) planes internally), t1: (F, M, 3),
    kp1: (F, M, 2), kp2: (F, 2). Returns three (F, M) arrays. vmap adds a
    batch grid dimension (see module note).
    """
    return _verification_cv(bool(interpret))(R1, t1, kp1, kp2, camR, camt, K, Kinv)


# --------------------------------------------------------------------------
# Fused triage triangulation + inverse-depth refresh: the weighted
# line-intersection normal equations, closed-form Tikhonov 3x3 solve, anchor
# re-projection checks and bearing re-parameterization for every track in one
# kernel (`MSCKF.py:480-491`, `geometry.py:274-303`).
# --------------------------------------------------------------------------


def _triage_kernel(
    rcond: float,
    width: float,
    height: float,
    base_ref,   # (3, F, M) line base planes
    dir_ref,    # (3, F, M) line direction planes
    w_ref,      # (F, M) confidence weights (zeroed where invalid)
    Ra_ref,     # (9, F) anchor rotation channels (row-major)
    ta_ref,     # (3, F) anchor center channels
    K_ref,      # (3, 3)
    Kinv_ref,   # (3, 3)
    m_ref,      # out (3, F) refreshed bearing channels
    rho_ref,    # out (1, F) refreshed inverse depth
    ok_ref,     # out (1, F) int: anchor re-projection succeeded
):
    dt_ = base_ref.dtype
    b = [base_ref[c] for c in range(3)]  # (F, M) planes
    d = [dir_ref[c] for c in range(3)]
    w = w_ref[:]
    n = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    n = jnp.where(n < 1e-30, 1e-30, n)
    dn = [d[i] / n for i in range(3)]

    # X = sum w (I - d d^T), y = sum w (I - d d^T) b  (reduce over obs lanes)
    def red(x):
        return jnp.sum(x, axis=1)  # (F,)

    X = {}
    for i in range(3):
        for j in range(i, 3):
            delta = 1.0 if i == j else 0.0
            X[(i, j)] = red(w * (delta - dn[i] * dn[j]))
    db = dn[0] * b[0] + dn[1] * b[1] + dn[2] * b[2]
    y = [red(w * (b[i] - dn[i] * db)) for i in range(3)]

    # closed-form trace-normalized Tikhonov 3x3 inverse on (F,) channels
    tr = X[(0, 0)] + X[(1, 1)] + X[(2, 2)]
    scale = jnp.maximum(tr / 3.0, 1e-20)
    eps = 3.0 * rcond
    a_ = X[(0, 0)] / scale + eps
    b_ = X[(0, 1)] / scale
    c_ = X[(0, 2)] / scale
    d_ = X[(1, 1)] / scale + eps
    e_ = X[(1, 2)] / scale
    f_ = X[(2, 2)] / scale + eps
    co00 = d_ * f_ - e_ * e_
    co01 = c_ * e_ - b_ * f_
    co02 = b_ * e_ - c_ * d_
    co11 = a_ * f_ - c_ * c_
    co12 = c_ * b_ - a_ * e_
    co22 = a_ * d_ - b_ * b_
    det = a_ * co00 + b_ * co01 + c_ * co02
    det = jnp.where(jnp.abs(det) < 1e-38, 1e-38, det)
    inv_det = 1.0 / (det * scale)
    Wp0 = (co00 * y[0] + co01 * y[1] + co02 * y[2]) * inv_det
    Wp1 = (co01 * y[0] + co11 * y[1] + co12 * y[2]) * inv_det
    Wp2 = (co02 * y[0] + co12 * y[1] + co22 * y[2]) * inv_det

    # anchor camera frame: Ci = Ra^T (Wp - ta)  (`Camera.py:46-52`)
    Ra = [Ra_ref[c] for c in range(9)]  # (F,) channels, row-major
    ta = [ta_ref[c] for c in range(3)]
    dx = Wp0 - ta[0]
    dy = Wp1 - ta[1]
    dz = Wp2 - ta[2]
    Ci0 = Ra[0] * dx + Ra[3] * dy + Ra[6] * dz
    Ci1 = Ra[1] * dx + Ra[4] * dy + Ra[7] * dz
    Ci2 = Ra[2] * dx + Ra[5] * dy + Ra[8] * dz

    # pinhole projection + FOV validity (`Camera.py:13-28`)
    K = [[K_ref[i, j] for j in range(3)] for i in range(3)]
    Kinv = [[Kinv_ref[i, j] for j in range(3)] for i in range(3)]
    z_safe = jnp.where(jnp.abs(Ci2) < 1e-30, 1e-30, Ci2)
    u = (K[0][0] * Ci0 + K[0][1] * Ci1 + K[0][2] * Ci2) / z_safe
    v = (K[1][0] * Ci0 + K[1][1] * Ci1 + K[1][2] * Ci2) / z_safe
    ok = (Ci2 > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)

    # bearing refresh: W_v = Ra @ Kinv [u, v, 1]; m from (theta, phi)
    # (`geometry.py:56-71`)
    cx = Kinv[0][0] * u + Kinv[0][1] * v + Kinv[0][2]
    cy = Kinv[1][0] * u + Kinv[1][1] * v + Kinv[1][2]
    cz = Kinv[2][0] * u + Kinv[2][1] * v + Kinv[2][2]
    Wv0 = Ra[0] * cx + Ra[1] * cy + Ra[2] * cz
    Wv1 = Ra[3] * cx + Ra[4] * cy + Ra[5] * cz
    Wv2 = Ra[6] * cx + Ra[7] * cy + Ra[8] * cz
    # the reference's angle roundtrip theta=atan2(x,z), phi=atan2(-y,rxz),
    # m=[cos(phi)sin(theta), -sin(phi), cos(phi)cos(theta)] is algebraically
    # m = Wv / ||Wv|| — computed directly (Mosaic has no atan2 lowering)
    nrm = jnp.sqrt(Wv0 * Wv0 + Wv1 * Wv1 + Wv2 * Wv2)
    nrm = jnp.where(nrm < 1e-30, 1e-30, nrm)
    m_ref[0] = Wv0 / nrm
    m_ref[1] = Wv1 / nrm
    m_ref[2] = Wv2 / nrm
    rho_ref[0] = 1.0 / z_safe
    ok_ref[0] = ok.astype(jnp.int32)


def _triage_call(
    line_base, line_dir, weights, anchor_R, anchor_t, K, Kinv,
    rcond, width, height, interpret, batched,
):
    lead = weights.shape[:1] if batched else ()
    F, M = weights.shape[-2:]
    dt_ = weights.dtype
    kernel = functools.partial(_triage_kernel, rcond, float(width), float(height))
    in_shapes = [(3, F, M), (3, F, M), (F, M), (9, F), (3, F), (3, 3), (3, 3)]
    kw = {}
    if batched:
        kw["grid"] = lead
        in_specs = [_vspec(s, True) for s in in_shapes]
        out_specs = tuple(_vspec(s, True) for s in [(3, F), (1, F), (1, F)])
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3)
    m, rho, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(lead + (3, F), dt_),
            jax.ShapeDtypeStruct(lead + (1, F), dt_),
            jax.ShapeDtypeStruct(lead + (1, F), jnp.int32),
        ),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        **kw,
    )(
        jnp.moveaxis(line_base, -1, -3),
        jnp.moveaxis(line_dir, -1, -3),
        weights,
        jnp.swapaxes(anchor_R.reshape(lead + (F, 9)), -1, -2),
        jnp.swapaxes(anchor_t, -1, -2),
        K.astype(dt_), Kinv.astype(dt_),
    )
    return (
        jnp.swapaxes(m, -1, -2),
        rho[..., 0, :],
        ok[..., 0, :] > 0,
    )


@functools.lru_cache(maxsize=None)
def _triage_cv(rcond: float, width: float, height: float, interpret: bool):
    @custom_vmap
    def f(line_base, line_dir, weights, anchor_R, anchor_t, K, Kinv):
        return _triage_call(
            line_base, line_dir, weights, anchor_R, anchor_t, K, Kinv,
            rcond, width, height, interpret, batched=False,
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = _broadcast_unbatched(axis_size, in_batched, args)
        return (
            _triage_call(*args, rcond, width, height, interpret, batched=True),
            (True,) * 3,
        )

    return f


def triage_refresh_fused(
    line_base, line_dir, weights, anchor_R, anchor_t, K, Kinv,
    rcond, width, height, interpret=False,
):
    """(new_m (F,3), new_rho (F,), proj_ok (F,)) — triangulate every track by
    weighted line intersection and re-parameterize its inverse-depth bearing
    through the anchor camera. vmap adds a batch grid dimension."""
    return _triage_cv(float(rcond), float(width), float(height), bool(interpret))(
        line_base, line_dir, weights, anchor_R, anchor_t, K, Kinv
    )


# --------------------------------------------------------------------------
# Slim covariance recurrence: P <- Phi_i P Phi_i^T + Qd_i (+ symmetrize) over
# a block of ticks, with Phi/Qd precomputed as batched XLA ops outside
# (filter/propagation._phi_q_block). Replaces the round-1 monolithic
# propagation kernel whose in-kernel tiny-matrix skew/outer matmuls cost an
# MXU pass each (~289 us/frame at the small shape).
# --------------------------------------------------------------------------


def _p15_recurrence_kernel(nticks, P0_ref, Phi_ref, Qd_ref,
                           P_out, acc_out, sig_out):
    dt_ = P0_ref.dtype
    P = P0_ref[:]
    I15 = jnp.eye(15, dtype=dt_)
    Acc = I15
    for i in range(nticks):
        Phi = Phi_ref[i]
        P = Phi @ P @ Phi.T + Qd_ref[i]
        P = 0.5 * (P + P.T)
        Acc = Phi @ Acc
        diag_row = jnp.sum(P * I15, axis=0, keepdims=True)  # (1, 15)
        sig_out[i : i + 1, 0:3] = diag_row[:, 0:3]
        sig_out[i : i + 1, 3:6] = diag_row[:, 12:15]
    P_out[:] = P
    acc_out[:] = Acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def p15_recurrence_fused(P0, Phi, Qd, interpret: bool = False):
    """(P_final (15,15), Phi_acc (15,15), per-tick sigma diags (B, 6))."""
    B = Phi.shape[0]
    dt_ = P0.dtype
    kernel = functools.partial(_p15_recurrence_kernel, B)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((15, 15), dt_),
            jax.ShapeDtypeStruct((15, 15), dt_),
            jax.ShapeDtypeStruct((B, 6), dt_),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        interpret=interpret,
    )(P0, Phi, Qd)


# --------------------------------------------------------------------------
# Fused IMU-block propagation: B sequential OC-EKF ticks in one kernel.
# Replaces the inner lax.scan of propagate_block (the per-tick 15x15 math ran
# as ~10 HLO thunks per tick). All state lives in VMEM for the whole block;
# the big padded covariance is still touched once outside (filter/propagation).
# --------------------------------------------------------------------------


# skew(w) as one (1,3) @ (3,9) matmul + reshape: Mosaic rejects tiny
# stacked-from-scalar vector builds and (1,3) broadcasts, so every 3-vector
# in the kernel lives as an explicit 2-D row (1,3) or column (3,1) and all
# outer products / skews are matmuls.
import numpy as _np

# row i of skew(w) equals w_row @ _E_SKEW[3i:3i+3] — three tiny matmuls and a
# concat, no reshapes (Mosaic rejects (1,9)->(3,3) shape casts in-kernel)
_E_SKEW = _np.zeros((9, 3))
_E_SKEW[1, 2] = 1.0   # row0 = (0, -wz, wy)
_E_SKEW[2, 1] = -1.0
_E_SKEW[3, 2] = -1.0  # row1 = (wz, 0, -wx)
_E_SKEW[5, 0] = 1.0
_E_SKEW[6, 1] = 1.0   # row2 = (-wy, wx, 0)
_E_SKEW[7, 0] = -1.0


def _skew_row(w_row, E):
    """(1,3) row -> (3,3) skew matrix via three row matmuls."""
    return jnp.concatenate(
        [w_row @ E[0:3], w_row @ E[3:6], w_row @ E[6:9]], axis=0
    )


def _propagate_block_kernel(
    nticks: int,
    # inputs
    R0_ref, p0v0_ref, meta_ref, ts_ref, gyro_ref, acc_ref,
    valid_ref, qc_ref, grav_ref, gravcol_ref, P15_ref, E_ref,
    # outputs
    R_out, pv_out, ts_out, P15_out, phi_out, outR_ref, outp_ref, outv_ref,
    outsig_ref,
):
    dt_ = R0_ref.dtype
    R = R0_ref[:]
    p = p0v0_ref[0:1, :]  # (1, 3) rows throughout
    v = p0v0_ref[1:2, :]
    bg = p0v0_ref[2:3, :]
    ba = p0v0_ref[3:4, :]
    last_ts = meta_ref[0, 0]
    prop_count = meta_ref[0, 1]
    grav_row = grav_ref[:]  # (1, 3)
    grav_col = gravcol_ref[:]  # (3, 1)
    qc_tiled = qc_ref[:]  # (15, 12) rows all equal to the Qc diagonal
    P15 = P15_ref[:]
    Phi_acc = jnp.eye(15, dtype=dt_)
    I3 = jnp.eye(3, dtype=dt_)
    I15 = jnp.eye(15, dtype=dt_)
    E = E_ref[:]
    Z13 = jnp.zeros((1, 3), dtype=dt_)

    for i in range(nticks):
        ts = ts_ref[0, i]
        gyro = gyro_ref[i : i + 1, :] - bg  # (1, 3)
        acc = acc_ref[i : i + 1, :] - ba
        valid = valid_ref[0, i] > 0
        dt = ts - last_ts

        first = prop_count == 0
        R_null = jnp.where(first, I3, R)
        v_null = jnp.where(first, Z13, v)
        p_null = jnp.where(first, Z13, p)

        # nominal integration (`IMU.py:78-100`)
        w_norm = jnp.sqrt(jnp.sum(gyro * gyro))
        theta = w_norm * dt
        axis = gyro / jnp.where(w_norm < 1e-30, 1.0, w_norm)
        Kx = _skew_row(axis, E)
        dR = I3 + jnp.sin(theta) * Kx + (1.0 - jnp.cos(theta)) * (Kx @ Kx)
        dR = jnp.where(theta > 0, dR, I3)
        R_new = R @ dR
        a_w = acc @ R.T - grav_row  # (1,3): row form of R @ acc - g
        p_new = p + v * dt + 0.5 * a_w * dt * dt
        v_new = v + a_w * dt

        # continuous F; 3rd-order Taylor Phi; OC fix-up (`MSCKF.py:179-233`)
        Z3 = jnp.zeros((3, 3), dtype=dt_)
        Z3x15 = jnp.zeros((3, 15), dtype=dt_)
        F = jnp.concatenate(
            [
                jnp.concatenate([-_skew_row(gyro, E), -I3, Z3, Z3, Z3], axis=1),
                Z3x15,
                jnp.concatenate(
                    [-(R_new @ _skew_row(acc, E)), Z3, Z3, -R_new, Z3], axis=1
                ),
                Z3x15,
                jnp.concatenate([Z3, Z3, I3, Z3, Z3], axis=1),
            ],
            axis=0,
        )
        Fdt = F * dt
        Fdt2 = Fdt @ Fdt
        Phi = I15 + Fdt + 0.5 * Fdt2 + (1.0 / 6.0) * (Fdt2 @ Fdt)

        # u in both orientations without transposing tiny tensors
        u_col = R_null @ grav_col  # (3, 1)
        u_row = grav_row @ R_null.T  # (1, 3)
        s_row = u_row / jnp.sum(u_row * u_row)
        A_vel = Phi[6:9, 0:3]
        A_pos = Phi[12:15, 0:3]
        w1_col = _skew_row(v_null - v_new, E) @ grav_col  # (3, 1)
        w2_col = _skew_row(dt * v_null + p_null - p_new, E) @ grav_col
        corr_vel = (A_vel @ u_col - w1_col) @ s_row  # (3,1)@(1,3) outer
        corr_pos = (A_pos @ u_col - w2_col) @ s_row
        Phi = jnp.concatenate(
            [
                jnp.concatenate([R_new @ R_null.T, Phi[0:3, 3:]], axis=1),
                Phi[3:6],
                jnp.concatenate([A_vel - corr_vel, Phi[6:9, 3:]], axis=1),
                Phi[9:12],
                jnp.concatenate([A_pos - corr_pos, Phi[12:15, 3:]], axis=1),
            ],
            axis=0,
        )

        # Q = Phi G Qc G^T Phi^T dt with diagonal Qc and G's blocks
        # (`MSCKF.py:194-212`): PG = Phi @ G computed blockwise.
        PG = jnp.concatenate(
            [-Phi[:, 0:3], Phi[:, 3:6], -(Phi[:, 6:9] @ R_new), Phi[:, 9:12]],
            axis=1,
        )  # (15, 12)
        Q = (PG * qc_tiled) @ PG.T * dt

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
        outp_ref[i : i + 1, :] = p
        outv_ref[i : i + 1, :] = v
        diag_row = jnp.sum(P15 * I15, axis=0, keepdims=True)  # (1, 15)
        outsig_ref[i : i + 1, 0:3] = diag_row[:, 0:3]
        outsig_ref[i : i + 1, 3:6] = diag_row[:, 12:15]

    R_out[:] = R
    pv_out[0:1, :] = p
    pv_out[1:2, :] = v
    e2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1).astype(dt_)  # [[0, 1]]
    ts_out[:] = last_ts * (1.0 - e2) + prop_count * e2
    P15_out[:] = P15
    phi_out[:] = Phi_acc


def _propagate_block_call(
    R0, p0, v0, bg, ba, last_ts, prop_count,
    ts, gyro, acc, valid, qc_diag, gravity, P15,
    interpret, batched,
):
    lead = ts.shape[:1] if batched else ()
    nt = ts.shape[-1]
    dt_ = R0.dtype
    kernel = functools.partial(_propagate_block_kernel, nt)
    in_shapes = [
        (3, 3), (4, 3), (1, 2), (1, nt), (nt, 3), (nt, 3), (1, nt),
        (15, 12), (1, 3), (3, 1), (15, 15), (9, 3),
    ]
    out_shapes = [
        (3, 3), (2, 3), (1, 2), (15, 15), (15, 15),
        (nt, 3, 3), (nt, 3), (nt, 3), (nt, 6),
    ]
    kw = {}
    if batched:
        kw["grid"] = lead
        in_specs = [_vspec(s, True) for s in in_shapes]
        out_specs = tuple(_vspec(s, True) for s in out_shapes)
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct(lead + s, dt_) for s in out_shapes),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        **kw,
    )(
        R0,
        jnp.stack([p0, v0, bg, ba], axis=-2),
        jnp.stack([last_ts, prop_count.astype(dt_)], axis=-1).reshape(lead + (1, 2)),
        ts.reshape(lead + (1, nt)),
        gyro,
        acc,
        valid.astype(jnp.int32).reshape(lead + (1, nt)),
        jnp.broadcast_to(qc_diag.reshape(lead + (1, 12)), lead + (15, 12)),
        gravity.reshape(lead + (1, 3)),
        gravity.reshape(lead + (3, 1)),
        P15,
        jnp.broadcast_to(jnp.asarray(_E_SKEW, dtype=dt_), lead + (9, 3)),
    )


@functools.lru_cache(maxsize=None)
def _propagate_block_cv(interpret: bool):
    @custom_vmap
    def f(R0, p0, v0, bg, ba, last_ts, prop_count, ts, gyro, acc, valid, qc_diag, gravity, P15):
        return _propagate_block_call(
            R0, p0, v0, bg, ba, last_ts, prop_count, ts, gyro, acc, valid,
            qc_diag, gravity, P15, interpret, batched=False,
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = _broadcast_unbatched(axis_size, in_batched, args)
        return (
            _propagate_block_call(*args, interpret, batched=True),
            (True,) * 9,
        )

    return f


def propagate_block_fused(
    R0, p0, v0, bg, ba, last_ts, prop_count,
    ts, gyro, acc, valid, qc_diag, gravity, P15,
    interpret: bool = False,
):
    """One kernel for a block of B OC-EKF propagation ticks.

    Returns (R, p, v, new_last_ts, new_prop_count, P15, Phi_acc,
    per-tick (R (B,3,3), p (B,3), v (B,3), sig (B,6))). vmap adds a batch
    grid dimension (see module note).
    """
    return _propagate_block_cv(bool(interpret))(
        R0, p0, v0, bg, ba, last_ts, prop_count, ts, gyro, acc, valid,
        qc_diag, gravity, P15,
    )
