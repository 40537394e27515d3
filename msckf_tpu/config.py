"""Filter configuration.

TPU-native equivalent of ``MSCKFParameters`` (`/root/reference/src/msckf/MSCKF.py:14-68`).
The config is a frozen, hashable dataclass so it can be passed as a static
argument to ``jax.jit``: numeric matrices (K, extrinsics, gravity) are stored
as nested tuples and materialized to arrays on demand (XLA constant-folds
them). Buffer capacities (camera slots, track slots, observation window) are
part of the config because they fix every array shape in the filter state.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _t3x3(m) -> Tuple[Tuple[float, ...], ...]:
    a = np.asarray(m, dtype=np.float64)
    return tuple(tuple(float(x) for x in row) for row in a)


def _t3(v) -> Tuple[float, ...]:
    return tuple(float(x) for x in np.asarray(v, dtype=np.float64))


# Reference default camera extrinsics (`MSCKF.py:18-20`): camera z forward,
# x right, y down, expressed in the world/IMU frame.
_DEFAULT_R_WC = ((0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), (0.0, -1.0, 0.0))
_DEFAULT_K = ((180.0, 0.0, 320.0), (0.0, 180.0, 240.0), (0.0, 0.0, 1.0))


@dataclasses.dataclass(frozen=True)
class MSCKFConfig:
    # --- camera (`MSCKF.py:17-26`) ---
    R_WC: Tuple[Tuple[float, ...], ...] = _DEFAULT_R_WC
    t_WC: Tuple[float, ...] = (0.0, 0.0, 0.0)
    K: Tuple[Tuple[float, ...], ...] = _DEFAULT_K
    width: int = 640
    height: int = 480
    sigma_image: float = 0.2

    # --- IMU (`MSCKF.py:28-34`) ---
    only_imu: bool = False
    accelerometer_noise_density: float = 0.001
    accelerometer_random_walk: float = 0.00001
    gyroscope_noise_density: float = 0.0001
    gyroscope_random_walk: float = 0.000001
    gravity: Tuple[float, ...] = (0.0, 0.0, -9.81)
    # The reference consumes the noise numbers as CONTINUOUS densities
    # (Q = sigma^2 dt, `MSCKF.py:99-104,237`) while its generators inject
    # them as PER-SAMPLE standard deviations — underestimating the injected
    # variance by 1/dt (~200x at 200 Hz), which makes the filter
    # overconfident on preset-noise data (docs/RESULTS.md Mode B). Setting
    # ``noise_input_rate`` to the IMU sample rate declares the configured
    # numbers to be per-sample sigmas; the filter converts them to true
    # densities (sigma * sqrt(dt)) internally. 0 keeps the reference's
    # literal behavior (the parity default).
    noise_input_rate: float = 0.0

    # --- features (`MSCKF.py:36-45`) ---
    number_of_extracted_features: int = 256
    min_cosine_similarity: float = 0.82
    use_parallax: bool = True
    min_parallax_deg: float = 20.0
    epipolar_rejection_threshold: float = 5.0
    homography_rejection_threshold: float = 5.0
    min_frames_to_be_lost: int = 1  # clamped >= 1 (`MSCKF.py:119`)
    min_frames_to_be_tracked: int = 5  # clamped >= 2 (`MSCKF.py:120`)
    max_camera_states: int = 30

    # --- TPU build: fixed buffer capacities (shape-defining, static) ---
    # Camera slots: the window transiently holds max_camera_states + 1 poses
    # (augmentation precedes pruning, `MSCKF.py:153-158`), so slots must be
    # at least max+1. 32 keeps the covariance dimension 15 + 6*32 = 207.
    n_cam_slots: int = 32
    # Observations per track: one per live camera, <= n_cam_slots.
    m_max: int = 32
    # Live track slots. Reference track churn tops out well below this for
    # 300 keypoints/frame; overflow is counted, never silently dropped.
    f_max: int = 768
    # Extracted keypoints per frame (>= number_of_extracted_features).
    k_max: int = 512
    # Descriptor dim (64 for XFeat, 10 for the synthetic fixture; padded
    # with zeros, which leaves dot-product cosine similarity unchanged).
    desc_dim: int = 64
    # Max features gathered into one EKF update batch (reference has no cap;
    # overflow is counted).
    u_max: int = 128

    # --- TPU build: triangulation ablation (BASELINE.json config 4) ---
    # "lines": the reference's confidence-weighted line intersection
    #          (`geometry.py:274-303`) — the parity path.
    # "gn":    Gauss-Newton refinement of the anchored inverse-depth
    #          parameters, seeded by the line intersection.
    triangulation: str = "lines"
    gn_iters: int = 5
    # use Pallas kernels for TPU hot spots (falls back to XLA off-TPU)
    use_pallas: bool = True
    use_pallas_triage: bool = True
    use_pallas_propagation: bool = True
    # correction-chain (D, D) solve strategy for the f32 island under vmap
    # (`ops/solve.py`): "ns" = Newton-Schulz matmuls with a residual-gated
    # whole-batch LU fallback (the LU custom call serializes across the
    # batch — the hottest op of the batched multi-trajectory filter);
    # "lu" = always the LU custom call. Unbatched solves always use LU.
    batched_solver: str = "ns"
    solver_ns_iters: int = 12
    # UNBATCHED correction-solve strategy (single-sequence f32 island):
    # "lu":   jnp.linalg.solve on B^T Y = P (the LU custom call; default).
    # "ns":   Newton-Schulz matmul iteration with the same residual-gated LU
    #         fallback as the batched path — trades the serialized custom
    #         call for MXU matmuls.
    # "chol": L = P M^{-1} P with M = sigma^2 P + P A P (SPD, so one
    #         Cholesky custom call instead of LU; exact identity
    #         M = P (sigma^2 I + A P) = P B, hence P M^{-1} P = P B^{-1}).
    #         Residual-gated LU fallback guards f32 loss of positive
    #         definiteness (cond(M) ~ cond(P) cond(B)).
    gain_solver: str = "lu"
    # EKF update-terms strategy (build_update_terms):
    # "hybrid": stacked-row MXU matmuls in XLA + one un-tiled batched-
    #           Cholesky gating kernel over the whole update batch (fastest
    #           measured at full shape — the round-2 fused kernel serialized
    #           16 U-tiles x (8 small matmuls + a 64-step Cholesky) each).
    # "fused":  the round-2 monolithic U-tiled kernel (kept for comparison).
    # "xla":    pure XLA (batched cholesky custom-call) — the off-TPU path.
    update_kernel: str = "hybrid"
    # chi-square gate solve of gamma = r~^T S^{-1} r~ (build_update_terms):
    # "auto": the update_kernel's own path (gating kernel under
    #         hybrid+pallas, batched-Cholesky custom call otherwise).
    # "ns":   batched Newton-Schulz inverse of S (SPD, sigma^2-regularized)
    #         + one polish step — pure MXU matmuls. Under vmap the gating
    #         kernel's flattened-batch grid pays ~1.3 ms/frame of in-scan
    #         grid-step overhead at batch 32 (profiled round 5); the NS form
    #         vectorizes natively.
    # "xla":  force the batched-Cholesky custom call.
    gating_solver: str = "auto"
    # Newton-Schulz iteration count for gating_solver="ns". 16 covers
    # cond(S) to ~1e4 at <=2e-6 relative gamma error (CPU-measured vs f64;
    # S = sigma^2 I + H P H^T has spectrum floored at sigma^2). All but the
    # last 2 iterations run in bf16 STORAGE (self-correcting chain), so the
    # big-batch cost is ~half f32 HBM traffic per iteration.
    gating_ns_iters: int = 16
    # prune-path dispatch when the camera window saturates (camera_step):
    # "cond":   lax.cond on n > max_camera_states (the reference's control
    #           flow; the branch boundary copies every carried leaf, and
    #           under vmap both branches execute anyway).
    # "masked": always run the prune computation with the victim mask zeroed
    #           while n <= max_camera_states — an exact no-op by the same
    #           identity algebra as the cond-free main update (A=0, c=0
    #           correction is the identity; remove_cameras with no victims is
    #           the identity permutation). Saves the cond's state copies on
    #           the single-sequence path and the run-both-branches select
    #           under vmap. Trajectories agree with "cond" to round-off (the
    #           no-op frames still re-orthonormalize rotations, like the main
    #           update — docs/numerics.md).
    prune_path: str = "cond"

    # --- numerics ---
    dtype: str = "float32"
    # Precision island for the EKF correction (the (D, D) solve + Joseph
    # covariance chain). The information form squares the Jacobian condition
    # number (A = H^T H), and on long weakly-observable sequences (e.g. the
    # "classic" preset's zero-acceleration straights) plain f32 diverges
    # (classic, 10798 ticks: f32 588 m final ATE vs f64 7 m; f32 with the
    # f64 island: 11.8 m). Options:
    #   "float64":     cast the chain to f64 when jax_enable_x64 is on
    #                  (CPU-only: this TPU has no f64 and x64 SIGABRTs
    #                  Mosaic). Without x64 it SAFE-DEGRADES to the
    #                  compensated island below (round 4; it used to fall
    #                  through to plain f32 silently — the exact failure
    #                  mode the island exists for).
    #   "compensated": double-word (two-float Dekker/Knuth) f32 arithmetic
    #                  (`ops/compensated.py`) — the TPU-native equivalent,
    #                  ~2^-48 effective precision under plain XLA-TPU.
    #   "float32":     plain ``dtype`` — the explicit fast-path opt-out for
    #                  short/well-conditioned sequences (bench-measured cost
    #                  of the island: extra.compensated_cost_pct).
    correction_dtype: str = "float64"
    # Inner f32 solve of the compensated island's double-word refinement
    # (`ops/compensated.refined_solve`):
    #   "lu": pivoted LU custom call (fastest unbatched; serializes across a
    #         vmap batch and crashes the TPU worker at batch scale).
    #   "ns": Newton-Schulz approximate-inverse preconditioner — pure MXU
    #         matmuls, custom-call-free, vmappable (parallel/batched.py
    #         switches to this instead of degrading the island to plain f32).
    island_solver: str = "lu"

    def __post_init__(self):
        object.__setattr__(self, "R_WC", _t3x3(self.R_WC))
        object.__setattr__(self, "t_WC", _t3(self.t_WC))
        object.__setattr__(self, "K", _t3x3(self.K))
        object.__setattr__(self, "gravity", _t3(self.gravity))
        # reference clamps (`MSCKF.py:119-120`)
        object.__setattr__(
            self, "min_frames_to_be_lost", max(self.min_frames_to_be_lost, 1)
        )
        object.__setattr__(
            self, "min_frames_to_be_tracked", max(self.min_frames_to_be_tracked, 2)
        )
        assert self.n_cam_slots > self.max_camera_states
        assert self.m_max <= self.n_cam_slots

    # --- derived (static python ints / numpy consts) ---

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def err_dim(self) -> int:
        """Padded error-state dimension: 15 IMU + 6 per camera slot."""
        return 15 + 6 * self.n_cam_slots

    @cached_property
    def K_np(self) -> np.ndarray:
        return np.asarray(self.K, dtype=np.float64)

    @cached_property
    def K_inv_np(self) -> np.ndarray:
        return np.linalg.inv(self.K_np)

    @cached_property
    def R_WC_np(self) -> np.ndarray:
        return np.asarray(self.R_WC, dtype=np.float64)

    @cached_property
    def t_WC_np(self) -> np.ndarray:
        return np.asarray(self.t_WC, dtype=np.float64)

    @cached_property
    def gravity_np(self) -> np.ndarray:
        return np.asarray(self.gravity, dtype=np.float64)

    @cached_property
    def noise_cov_diag_np(self) -> np.ndarray:
        """Diagonal of the 12x12 continuous noise covariance (`MSCKF.py:99-104`):
        [sigma_g^2 I, sigma_bg^2 I, sigma_a^2 I, sigma_ba^2 I]. With
        ``noise_input_rate`` set, the configured per-sample sigmas convert to
        densities first (variance scales by dt = 1/rate)."""
        d = np.array(
            [
                self.gyroscope_noise_density**2,
                self.gyroscope_random_walk**2,
                self.accelerometer_noise_density**2,
                self.accelerometer_random_walk**2,
            ]
        )
        if self.noise_input_rate > 0:
            # white-noise sigmas: discrete variance sigma_d^2 == q / dt
            # -> density q = sigma_d^2 / f. Random-walk step sigmas:
            # per-step variance sigma_rw^2 == q_b * dt -> q_b = sigma_rw^2 * f.
            f = self.noise_input_rate
            d = d * np.array([1.0 / f, f, 1.0 / f, f])
        return np.repeat(d, 3)

    @cached_property
    def chi2_table_np(self) -> np.ndarray:
        """chi2.ppf(0.95, dof) for dof = 0..2*m_max (`MSCKF.py:561-568`).

        dof=0 entry is NaN, matching scipy — which makes the reference's
        gating test fail for rank-deficient single-observation tracks
        (0 <= nan is False); our projector-form update makes those features
        contribute exactly zero either way.
        """
        from scipy.stats import chi2

        dof = np.arange(0, 2 * self.m_max + 1)
        with np.errstate(invalid="ignore"):
            t = chi2.ppf(0.95, dof)
        return t


def reference_experiment_config(**overrides) -> MSCKFConfig:
    """The driver's experiment configuration (`/root/reference/main.py:182-208`)."""
    base = dict(
        sigma_image=0.1,
        number_of_extracted_features=300,
        min_cosine_similarity=0.95,
        use_parallax=True,
        min_parallax_deg=45.0,
        epipolar_rejection_threshold=0.005,
        homography_rejection_threshold=5.0,
        min_frames_to_be_tracked=4,
        min_frames_to_be_lost=2,
        max_camera_states=30,
    )
    base.update(overrides)
    return MSCKFConfig(**base)


NOISE_PRESETS = {
    # (accel_nd, gyro_nd, accel_rw, gyro_rw)  (`main.py:139-160`)
    "high": (0.01, 0.001, 0.001, 0.0001),
    "mid": (0.005, 0.0005, 0.0005, 0.00005),
    "low": (0.001, 0.0001, 0.0001, 0.00001),
}
