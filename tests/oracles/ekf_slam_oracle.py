"""NumPy float64 oracle of the EKF-SLAM tick (MBES path).

Independent transcription of the semantics in
``smarc_navigation_tpu/models/ekf_slam.py`` (which rebuilds
``ekf_slam_core.cpp``): absolute-odometry predict with zeroed orientation
rows, candidate back-projection, χ²-gated Mahalanobis cost table with
fixed-cost candidate diagonal, exact Hungarian assignment (scipy), and
sequential updates in measurement order using batch-stage H/S⁻¹/ν with
fresh covariance gathers. Supports both covariance writeback modes:
``full`` (our default, consistent cross-covariances) and ``marginal``
(the reference's 9×9 block writeback).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment
from scipy.stats import chi2


def rotmat(rpy):
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def wrap(a):
    return np.mod(a + np.pi, 2 * np.pi) - np.pi


def numeric_jac(f, x, eps=1e-7):
    y0 = f(x)
    J = np.zeros((len(y0), len(x)))
    for i in range(len(x)):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        J[:, i] = (f(xp) - f(xm)) / (2 * eps)
    return J


class OracleSLAM:
    def __init__(self, cfg, update_mode="full"):
        self.cfg = cfg
        self.L = cfg.max_landmarks
        D = 6 + 3 * self.L
        self.mu = np.zeros(D)
        self.Sigma = np.zeros((D, D))
        self.Sigma[:6, :6] = np.diag(cfg.sigma0_diag)
        self.active = np.zeros(self.L, bool)
        self.n_active = 0
        self.mu_auv_odom = np.zeros(3)
        self.R = np.diag(cfg.r_diag)
        self.Q = np.diag(cfg.q_mbes_diag)
        self.lam = chi2.ppf(cfg.delta_outlier_reject, 3)
        self.update_mode = update_mode

    def h(self, pose, lm):
        return rotmat(pose[3:6]).T @ (lm - pose[0:3])

    def predict(self, odom_pose):
        u = odom_pose[0:3] - self.mu_auv_odom
        self.mu[0:3] += u
        self.mu[3:6] = wrap(odom_pose[3:6])
        self.mu_auv_odom += u
        g = numeric_jac(lambda a: rotmat(a) @ u, self.mu[3:6].copy())
        A = np.zeros((6, 6))
        A[0:3, 0:3] = np.eye(3)
        A[0:3, 3:6] = g
        S = self.Sigma
        S11 = A @ S[0:6, 0:6] @ A.T + self.R
        S1L = A @ S[0:6, 6:]
        S[0:6, 0:6] = S11
        S[0:6, 6:] = S1L
        S[6:, 0:6] = S1L.T

    def _idx9(self, slot):
        return np.concatenate([np.arange(6), 6 + 3 * slot + np.arange(3)])

    def da_update(self, z_t, z_mask):
        cfg, L = self.cfg, self.L
        pose = self.mu[0:6]
        M = len(z_t)

        H_all, Sinv_all, nu_all = {}, {}, {}
        cost = np.full((L + M, M), cfg.outlier_cost)
        for j in range(L):
            lm = self.mu[6 + 3 * j : 9 + 3 * j]
            zh = self.h(pose, lm)
            Hp = numeric_jac(lambda p: self.h(p, lm), pose.copy())
            Hl = numeric_jac(lambda l: self.h(pose, l), lm.copy())
            H = np.concatenate([Hp, Hl], axis=1)
            idx = self._idx9(j)
            Sig9 = self.Sigma[np.ix_(idx, idx)]
            S = H @ Sig9 @ H.T + self.Q
            Sinv = np.linalg.inv(S)
            H_all[j], Sinv_all[j] = H, Sinv
            for i in range(M):
                nu = z_t[i] - zh
                nu_all[(j, i)] = nu
                if self.active[j] and z_mask[i]:
                    d = nu @ Sinv @ nu
                    if d < self.lam:
                        cost[j, i] = d

        cands, H_c, Sinv_c, nu_c = [], [], [], []
        for i in range(M):
            c = rotmat(pose[3:6]) @ z_t[i] + pose[0:3]
            cands.append(c)
            Hp = numeric_jac(lambda p: self.h(p, c), pose.copy())
            Hl = numeric_jac(lambda l: self.h(pose, l), c.copy())
            H = np.concatenate([Hp, Hl], axis=1)
            Sig9 = np.zeros((9, 9))
            Sig9[0:6, 0:6] = self.Sigma[0:6, 0:6]
            Sig9[6:9, 6:9] = np.diag(cfg.new_lm_cov_mbes)
            S = H @ Sig9 @ H.T + self.Q
            H_c.append(H)
            Sinv_c.append(np.linalg.inv(S))
            nu_c.append(z_t[i] - self.h(pose, c))
            cost[L + i, i] = cfg.mhl_dist_mbes

        rows, cols = linear_sum_assignment(cost)
        col_to_row = np.full(M, -1)
        col_to_row[cols] = rows

        matched = np.full(M, -1)
        for i in range(M):
            if not z_mask[i]:
                continue
            r = col_to_row[i]
            is_new = r >= L
            if is_new:
                if self.n_active >= L:
                    continue
                slot = self.n_active
                ix = 6 + 3 * slot
                self.mu[ix : ix + 3] = cands[i]
                self.Sigma[ix : ix + 3, :] = 0.0
                self.Sigma[:, ix : ix + 3] = 0.0
                self.Sigma[ix : ix + 3, ix : ix + 3] = np.diag(cfg.new_lm_cov_mbes)
                self.active[slot] = True
                self.n_active += 1
                H, Sinv, nu = H_c[i], Sinv_c[i], nu_c[i]
            else:
                slot = r
                H, Sinv, nu = H_all[r], Sinv_all[r], nu_all[(r, i)]

            idx = self._idx9(slot)
            if self.update_mode == "marginal":
                Sig9 = self.Sigma[np.ix_(idx, idx)]
                K = Sig9 @ H.T @ Sinv
                delta = K @ nu
                self.mu[0:6] += delta[0:6]
                self.mu[3:6] = wrap(self.mu[3:6])
                self.mu[idx[6:]] += delta[6:9]
                Sig9n = (np.eye(9) - K @ H) @ Sig9
                self.Sigma[np.ix_(idx, idx)] = Sig9n
            else:
                Sig_cols = self.Sigma[:, idx]
                K = Sig_cols @ (H.T @ Sinv)
                delta = K @ nu
                self.mu += delta
                self.mu[3:6] = wrap(self.mu[3:6])
                HS = H @ Sig_cols.T
                self.Sigma = self.Sigma - K @ HS
                self.Sigma = 0.5 * (self.Sigma + self.Sigma.T)
            matched[i] = slot
        return matched

    def step(self, odom_pose, odom_valid, z_t, z_mask):
        if not odom_valid:
            return self.mu[0:6].copy(), np.full(len(z_t), -1)
        self.predict(odom_pose)
        matched = (
            self.da_update(z_t, z_mask)
            if np.any(z_mask)
            else np.full(len(z_t), -1)
        )
        return self.mu[0:6].copy(), matched


def run_oracle(cfg, timeline_np, update_mode="full"):
    o = OracleSLAM(cfg, update_mode)
    T = len(timeline_np["ticks"])
    mus = np.zeros((T, 6))
    matched = []
    for k in range(T):
        mu, m = o.step(
            timeline_np["odom_value"][k][0:6],
            timeline_np["odom_valid"][k],
            timeline_np["det_value"][k],
            timeline_np["det_mask"][k],
        )
        mus[k] = mu
        matched.append(m)
    return mus, np.stack(matched), o
