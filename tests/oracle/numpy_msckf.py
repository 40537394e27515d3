"""Float64 NumPy oracle for golden-trace parity tests.

An independent implementation of the reference MSCKF semantics
(`/root/reference/src/msckf/` — see SURVEY.md §2.a for the numbered numerics
contract), written from the contract in plain functional NumPy. It
deliberately uses the reference's *formulations* where the TPU build uses
re-derived equivalents, so parity tests validate the equivalences:

  * explicit scipy ``null_space`` basis + chi2 gate    (TPU: projector form)
  * stacked rows + thin QR compression + Joseph update (TPU: information form)
  * dynamically grown covariance via np.delete         (TPU: permutations)

Null-state semantics are modeled exactly as the reference's object aliasing
implies: IMU null <- current at the end of every propagation, and corrections
apply to the aliased null too; camera null is always the current camera pose.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import null_space
from scipy.stats import chi2

from msckf_tpu.config import MSCKFConfig


def _skew(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], dtype=float)


def _exp_map(rotvec):
    n = np.linalg.norm(rotvec)
    if np.isclose(n, 0):
        return np.eye(3)
    K = _skew(rotvec)
    return np.eye(3) + (np.sin(n) / n) * K + ((1 - np.cos(n)) / n**2) * (K @ K)


def _idp_m(direction):
    x, y, z = direction
    th = np.arctan2(x, z)
    ph = np.arctan2(-y, np.sqrt(x * x + z * z))
    return np.array([np.cos(ph) * np.sin(th), -np.sin(ph), np.cos(ph) * np.cos(th)])


class OracleMSCKF:
    def __init__(self, cfg: MSCKFConfig, R_init: np.ndarray):
        self.cfg = cfg
        self.K = cfg.K_np
        self.Kinv = cfg.K_inv_np
        self.g = cfg.gravity_np
        self.R_WC = cfg.R_WC_np
        self.t_WC = cfg.t_WC_np
        self.Qc = np.diag(cfg.noise_cov_diag_np)
        self.sigma2 = cfg.sigma_image**2

        # IMU state
        self.R = R_init.copy()
        self.p = np.zeros(3)
        self.v = np.zeros(3)
        self.bg = np.zeros(3)
        self.ba = np.zeros(3)
        self.ts = 0.0
        self.step_id = 0
        # aliased nulls: ctor identity until first propagation completes
        self.R_null = np.eye(3)
        self.p_null = np.zeros(3)
        self.v_null = np.zeros(3)

        self.P = np.zeros((15, 15))
        self.cams: list[dict] = []  # insertion-ordered {id, R, t}
        self.feats: dict[int, dict] = {}
        self.next_fid = 0

        self.n_epi_rej = 0
        self.n_homo_rej = 0
        self.n_gate_rej = 0

    # ------------------------------------------------------------- propagation
    def process_imu(self, ts, gyro, acc):
        dt = ts - self.ts
        self.ts = ts
        self.step_id += 1
        w = gyro - self.bg
        a = acc - self.ba

        # nominal integration
        wn = np.linalg.norm(w)
        th = wn * dt
        dR = _exp_map((w / wn) * th) if th > 0 else np.eye(3)
        R_new = self.R @ dR
        a_w = self.R @ a - self.g
        p_new = self.p + self.v * dt + 0.5 * a_w * dt * dt
        v_new = self.v + a_w * dt

        F = np.zeros((15, 15))
        F[0:3, 0:3] = -_skew(w)
        F[0:3, 3:6] = -np.eye(3)
        F[6:9, 0:3] = -R_new @ _skew(a)
        F[6:9, 9:12] = -R_new
        F[12:15, 6:9] = np.eye(3)
        G = np.zeros((15, 12))
        G[0:3, 0:3] = -np.eye(3)
        G[3:6, 3:6] = np.eye(3)
        G[6:9, 6:9] = -R_new
        G[9:12, 9:12] = np.eye(3)

        Fdt = F * dt
        Phi = np.eye(15) + Fdt + 0.5 * Fdt @ Fdt + (Fdt @ Fdt @ Fdt) / 6.0

        Phi[0:3, 0:3] = R_new @ self.R_null.T
        u = self.R_null @ self.g
        s = u / (u @ u)
        A_vel = Phi[6:9, 0:3].copy()
        A_pos = Phi[12:15, 0:3].copy()
        w1 = _skew(self.v_null - v_new) @ self.g
        w2 = _skew(dt * self.v_null + self.p_null - p_new) @ self.g
        Phi[6:9, 0:3] = A_vel - np.outer(A_vel @ u - w1, s)
        Phi[12:15, 0:3] = A_pos - np.outer(A_pos @ u - w2, s)

        Q = Phi @ G @ self.Qc @ G.T @ Phi.T * dt
        self.P[:15, :15] = Phi @ self.P[:15, :15] @ Phi.T + Q
        self.P[:15, 15:] = Phi @ self.P[:15, 15:]
        self.P[15:, :15] = self.P[:15, 15:].T
        self.P = 0.5 * (self.P + self.P.T)

        self.R, self.p, self.v = R_new, p_new, v_new
        self.R_null, self.p_null, self.v_null = R_new.copy(), p_new.copy(), v_new.copy()

    # ------------------------------------------------------------ augmentation
    def augment(self):
        R_c = self.R @ self.R_WC
        t_c = self.R @ self.t_WC + self.p
        self.cams.append({"id": self.step_id, "R": R_c, "t": t_c})
        D = self.P.shape[0]
        J = np.zeros((6, D))
        J[0:3, 0:3] = self.R_WC.T
        J[3:6, 0:3] = _skew(self.R @ self.t_WC)
        J[3:6, 12:15] = np.eye(3)
        M = np.vstack([np.eye(D), J])
        P = M @ self.P @ M.T
        self.P = 0.5 * (P + P.T)

    # ---------------------------------------------------------------- matching
    @staticmethod
    def _mutual_match(d1, d2, min_cossim):
        sim = d1 @ d2.T
        m12 = sim.argmax(axis=1)
        m21 = sim.argmax(axis=0)
        mutual = m21[m12] == np.arange(len(d1))
        good = sim.max(axis=1) > min_cossim
        i1 = np.arange(len(d1))[mutual & good]
        return i1, m12[mutual & good]

    def _spawn(self, kp, desc, score, cam):
        Ci_v = self.Kinv @ np.append(kp, 1.0)
        W_v = cam["R"] @ Ci_v
        self.next_fid += 1
        self.feats[self.next_fid] = dict(
            kps=[kp.copy()], descs=[desc.copy()], scores=[float(score)],
            cam_ids=[cam["id"]], bases=[cam["t"].copy()], dirs=[W_v],
            idp_base=cam["t"].copy(), idp_m=_idp_m(W_v), idp_rho=0.1,
            tracked=1, lost=0,
        )

    def _verify(self, f, kp2, cam):
        """Two-tier check over the track history; True = accept."""
        for j in range(len(f["kps"])):
            c1 = next(c for c in self.cams if c["id"] == f["cam_ids"][j])
            R12 = c1["R"].T @ cam["R"]
            t12 = c1["R"].T @ (cam["t"] - c1["t"])
            kp1 = f["kps"][j]
            if np.linalg.norm(t12) < 0.01:
                H = self.K @ R12 @ self.Kinv
                x1p = np.linalg.inv(H) @ np.append(kp2, 1.0)
                x1p = x1p[:2] / x1p[2]
                x2p = H @ np.append(kp1, 1.0)
                x2p = x2p[:2] / x2p[2]
                sc = 0.5 * (np.linalg.norm(kp2 - x1p) + np.linalg.norm(kp1 - x2p))
                if sc > self.cfg.homography_rejection_threshold:
                    self.n_homo_rej += 1
                    return False
            else:
                Fm = self.Kinv.T @ _skew(t12) @ R12 @ self.Kinv
                sc = np.append(kp2, 1.0) @ Fm @ np.append(kp1, 1.0)
                if sc > self.cfg.epipolar_rejection_threshold:
                    self.n_epi_rej += 1
                    return False
        return True

    def add_measurements(self, kps, descs, scores):
        mean = scores.mean()
        keep = scores >= 0.5 * mean
        kps, descs, scores = kps[keep], descs[keep], scores[keep]
        if len(kps) == 0:
            return
        cam = self.cams[-1]
        if not self.feats:
            for i in range(len(kps)):
                self._spawn(kps[i], descs[i], scores[i], cam)
            return

        fids = np.array(list(self.feats.keys()))
        fused = np.stack(
            [np.average(f["descs"], axis=0, weights=f["scores"]) for f in self.feats.values()]
        )
        i1, i2 = self._mutual_match(fused, descs, self.cfg.min_cosine_similarity)
        if len(i1) == 0:
            return
        matched_fids = set(fids[i1].tolist())

        for a, b in zip(i1, i2):
            f = self.feats[int(fids[a])]
            kp2, d2, s2 = kps[b], descs[b], scores[b]
            if not self._verify(f, kp2, cam):
                f["lost"] += 1
                continue
            Ci_v = self.Kinv @ np.append(kp2, 1.0)
            W_v = cam["R"] @ Ci_v
            f["kps"].append(kp2.copy())
            f["descs"].append(d2.copy())
            f["scores"].append(float(s2))
            f["cam_ids"].append(cam["id"])
            f["bases"].append(cam["t"].copy())
            f["dirs"].append(W_v)
            f["tracked"] += 1
            f["lost"] = 0

        unmatched2 = np.setdiff1d(np.arange(len(kps)), i2)
        for b in unmatched2:
            self._spawn(kps[b], descs[b], scores[b], cam)
        # unmatched pre-existing tracks age by one frame (`MSCKF.py:438`)
        unmatched1 = np.setdiff1d(np.arange(len(fids)), i1)
        for fid in fids[unmatched1]:
            self.feats[int(fid)]["lost"] += 1

    # ------------------------------------------------------------------ triage
    def _triangulate(self, f):
        X = np.zeros((3, 3))
        y = np.zeros(3)
        for b, d, w in zip(f["bases"], f["dirs"], f["scores"]):
            dn = d / np.linalg.norm(d)
            Pm = np.eye(3) - np.outer(dn, dn)
            X += w * Pm
            y += w * (Pm @ b)
        return np.linalg.pinv(X) @ y

    def get_valid_features(self, fids):
        valid, lost = [], []
        for fid in fids:
            f = self.feats[fid]
            is_lost = f["lost"] >= self.cfg.min_frames_to_be_lost
            if is_lost and f["tracked"] < self.cfg.min_frames_to_be_tracked:
                lost.append(fid)
                continue
            enough_par = False
            if self.cfg.use_parallax and len(f["dirs"]) > 1:
                d0 = f["dirs"][0] / np.linalg.norm(f["dirs"][0])
                d1 = f["dirs"][-1] / np.linalg.norm(f["dirs"][-1])
                ang = np.degrees(np.arccos(np.clip(d0 @ d1, -1, 1)))
                enough_par = ang > self.cfg.min_parallax_deg
            if is_lost or enough_par:
                Wp = self._triangulate(f)
                c0 = next(c for c in self.cams if c["id"] == f["cam_ids"][0])
                Cp = c0["R"].T @ (Wp - c0["t"])
                m_seed, rho_seed = f["idp_m"], f["idp_rho"]
                refreshed = False
                if Cp[2] > 0:
                    uv = (self.K @ Cp)[:2] / Cp[2]
                    if 0 <= uv[0] < self.cfg.width and 0 <= uv[1] < self.cfg.height:
                        W_v = c0["R"] @ (self.Kinv @ np.append(uv, 1.0))
                        m_seed, rho_seed = _idp_m(W_v), 1.0 / Cp[2]
                        refreshed = True
                if self.cfg.triangulation == "gn":
                    # ablation path: GN refinement of the anchored IDP,
                    # seeded by the line intersection (mirrors
                    # ops/triangulation.refine_inverse_depth_gn — applied to
                    # every valid track, refreshed seed or not)
                    f["idp_m"], f["idp_rho"] = self._gn_refine(
                        f, m_seed, rho_seed
                    )
                elif refreshed:
                    f["idp_m"], f["idp_rho"] = m_seed, rho_seed
                valid.append(fid)
                if is_lost:
                    lost.append(fid)
        return valid, lost

    def _gn_refine(self, f, m0, rho0):
        """Gauss-Newton refinement of (theta, phi, rho) about the anchor —
        float64 oracle for `ops/triangulation.py::refine_inverse_depth_gn`
        (same damping, clamps, iteration count, and final re-normalization)."""
        cam_of = {c["id"]: c for c in self.cams}
        base = f["idp_base"]
        theta = np.arctan2(m0[0], m0[2])
        phi = np.arctan2(-m0[1], np.sqrt(m0[0] ** 2 + m0[2] ** 2))
        p = np.array([theta, phi, rho0])
        obs = [
            (cam_of[cid], self.Kinv @ np.append(kp, 1.0))
            for cid, kp in zip(f["cam_ids"], f["kps"])
        ]
        for _ in range(self.cfg.gn_iters):
            th, ph, rho = p
            cth, sth, cph, sph = np.cos(th), np.sin(th), np.cos(ph), np.sin(ph)
            m = np.array([cph * sth, -sph, cph * cth])
            dm_dth = np.array([cph * cth, 0.0, -cph * sth])
            dm_dph = np.array([-sph * sth, -cph, -sph * cth])
            H = 1e-6 * np.eye(3)
            g = np.zeros(3)
            for c, zh_full in obs:
                z = zh_full[:2] / zh_full[2]
                Rt = c["R"].T
                pw = rho * (base - c["t"]) + m
                pc = Rt @ pw
                zc = pc[2] if abs(pc[2]) >= 1e-12 else 1e-12
                zhat = pc[:2] / zc
                r = z - zhat
                inv_z = 1.0 / zc
                Jproj = np.array(
                    [[inv_z, 0.0, -pc[0] * inv_z * inv_z],
                     [0.0, inv_z, -pc[1] * inv_z * inv_z]]
                )
                dpw = np.stack([dm_dth, dm_dph, base - c["t"]], axis=-1)
                J = -(Jproj @ Rt @ dpw)
                H += J.T @ J
                g += J.T @ r
            p = p + np.linalg.solve(H, -g)
        th, ph, rho = p
        m = _idp_m(
            np.array([np.cos(ph) * np.sin(th), -np.sin(ph), np.cos(ph) * np.cos(th)])
        )
        return m, max(rho, 1e-8)

    # ------------------------------------------------------------------ update
    def _residual_jacobian(self, f):
        D = self.P.shape[0]
        cam_index_of = {c["id"]: i for i, c in enumerate(self.cams)}
        rows_r, rows_Hx, rows_Hf = [], [], []
        for i, cid in enumerate(f["cam_ids"]):
            c = self.cams[cam_index_of[cid]]
            R_CW = c["R"].T
            Cf = R_CW @ (f["idp_rho"] * (f["idp_base"] - c["t"]) + f["idp_m"])
            Wf = c["R"] @ Cf + c["t"]
            z = self.Kinv @ np.append(f["kps"][i], 1.0)
            z = z[:2] / z[2]
            zh = np.array([Cf[0] / Cf[2], Cf[1] / Cf[2]])
            r = (z - zh).reshape(2, 1)
            Jp = np.array([[1 / Cf[2], 0, -Cf[0] / Cf[2] ** 2],
                           [0, 1 / Cf[2], -Cf[1] / Cf[2] ** 2]])
            Hx6 = np.hstack([Jp @ _skew(Cf), -Jp @ R_CW])
            u = np.concatenate([R_CW @ self.g, _skew(Wf - c["t"]) @ self.g])
            A = Hx6.copy()
            den = u @ u
            if den > 1e-6:
                A = A - np.outer(A @ u, u) / den
            Hf = -Hx6[:, 3:]
            Hx = np.zeros((2, D))
            k = cam_index_of[cid]
            Hx[:, 15 + 6 * k : 21 + 6 * k] = A
            rows_r.append(r)
            rows_Hx.append(Hx)
            rows_Hf.append(Hf)
        r = np.vstack(rows_r)
        Hx = np.vstack(rows_Hx)
        Hf = np.vstack(rows_Hf)
        # explicit left-nullspace basis (the formulation the TPU build replaces)
        Ab = null_space(Hf.T)
        return Ab.T @ r, Ab.T @ Hx

    def update(self, fids):
        HX, RO = [], []
        for fid in fids:
            r_o, H_o = self._residual_jacobian(self.feats[fid])
            S = H_o @ self.P @ H_o.T + self.sigma2 * np.eye(H_o.shape[0])
            gamma = (r_o.T @ np.linalg.inv(S) @ r_o).item() if r_o.size else 0.0
            crit = chi2.ppf(0.95, r_o.shape[0])
            if not (gamma <= crit):
                self.n_gate_rej += 1
                continue
            HX.append(H_o)
            RO.append(r_o)
        if not HX:
            return
        H = np.vstack(HX)
        r = np.vstack(RO)
        Ro = self.sigma2 * np.eye(len(r))
        if H.shape[0] > H.shape[1]:
            Q_, R_ = np.linalg.qr(H, mode="reduced")
            TH, rn, Rn = R_, Q_.T @ r, Q_.T @ Ro @ Q_
        else:
            TH, rn, Rn = H, r, Ro
        P = self.P
        S = TH @ P @ TH.T + Rn
        Kk = P @ TH.T @ np.linalg.inv(S)
        dx = (Kk @ rn).flatten()
        I = np.eye(P.shape[0])
        P = (I - Kk @ TH) @ P @ (I - Kk @ TH).T + Kk @ Rn @ Kk.T
        self.P = 0.5 * (P + P.T)

        # corrections (aliasing: nulls move with the live state)
        self.R = self._svd_orth(self.R @ _exp_map(dx[0:3]).T)
        self.bg = self.bg + dx[3:6]
        self.v = self.v + dx[6:9]
        self.ba = self.ba + dx[9:12]
        self.p = self.p + dx[12:15]
        self.R_null, self.p_null, self.v_null = self.R.copy(), self.p.copy(), self.v.copy()
        for i, c in enumerate(self.cams):
            d = dx[15 + 6 * i : 21 + 6 * i]
            c["R"] = self._svd_orth(c["R"] @ _exp_map(d[0:3]).T)
            c["t"] = c["t"] + d[3:6]

    @staticmethod
    def _svd_orth(R):
        U, _, Vt = np.linalg.svd(R)
        return U @ Vt

    # ----------------------------------------------------------- house-keeping
    def remove_cameras(self, cam_ids):
        for cid in cam_ids:
            idx = [c["id"] for c in self.cams].index(cid)
            self.P = np.delete(self.P, slice(15 + 6 * idx, 21 + 6 * idx), axis=0)
            self.P = np.delete(self.P, slice(15 + 6 * idx, 21 + 6 * idx), axis=1)
            del self.cams[idx]
        dead = []
        for fid, f in self.feats.items():
            for cid in cam_ids:
                if cid in f["cam_ids"]:
                    j = f["cam_ids"].index(cid)
                    for key in ("kps", "descs", "scores", "cam_ids", "bases", "dirs"):
                        del f[key][j]
            if not f["cam_ids"]:
                dead.append(fid)
        for fid in dead:
            del self.feats[fid]

    def remove_features(self, fids):
        for fid in fids:
            if fid in self.feats:
                del self.feats[fid]
        live_cams = set()
        for f in self.feats.values():
            live_cams.update(f["cam_ids"])
        empty = [c["id"] for c in self.cams if c["id"] not in live_cams]
        self.remove_cameras(empty)

    def prune_poorest(self):
        counts: dict[int, int] = {}
        for f in self.feats.values():
            for cid in f["cam_ids"]:
                counts[cid] = counts.get(cid, 0) + 1
        # stable sort by count only: ties keep dict-insertion (first-encounter)
        # order, exactly like the reference (`MSCKF.py:718`)
        victims = [cid for cid, _ in sorted(counts.items(), key=lambda kv: kv[1])[:2]]
        subset = [fid for fid, f in self.feats.items() if any(c in f["cam_ids"] for c in victims)]
        valid, _ = self.get_valid_features(subset)
        if valid:
            self.update(valid)
        self.remove_cameras(victims)

    # -------------------------------------------------------------- frame step
    def feature_callback(self, kps, descs, scores):
        if self.cfg.only_imu:
            return
        self.augment()
        self.add_measurements(kps, descs, scores)
        valid, lost = self.get_valid_features(list(self.feats.keys()))
        if valid:
            self.update(valid)
            self.remove_features(lost)
        if len(self.cams) > self.cfg.max_camera_states:
            self.prune_poorest()
