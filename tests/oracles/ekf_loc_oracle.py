"""NumPy float64 oracle of the EKF-localization tick.

Independent re-implementation of the reference semantics
(``ekf_localization.cpp:547-624`` tick: Bézier DVL staleness handling,
motion predict with absolute-orientation G, greedy-ML data association with
pre-gate + χ² rejection + stone offset, sequential updates in measurement
order). Used by the golden-track equivalence tests (SURVEY.md §4): the
jitted f32 implementation must produce the same association decisions and
matching pose tracks.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.stats import chi2


def rotmat_from_rpy(rpy):
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = (
        np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y),
    )
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def rpy_from_quat(q):
    x, y, z, w = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    pitch = math.asin(max(-1.0, min(1.0, -R[2, 0])))
    roll = math.atan2(R[2, 1], R[2, 2])
    yaw = math.atan2(R[1, 0], R[0, 0])
    return np.array([roll, pitch, yaw])


def wrap(a):
    return np.mod(a + np.pi, 2 * np.pi) - np.pi


def bezier(values, stamps, t):
    W = len(stamps)
    n = W - 1
    span = stamps[-1] - stamps[0]
    if abs(span) < 1e-9:
        return values[-1]
    x = (t - stamps[-1]) / span
    out = np.zeros(values.shape[-1])
    for l in range(W):
        c = math.comb(n, l) * (1 - x) ** (n - l) * x**l
        out += c * values[n - l]
    return out


def numeric_jac(f, x, eps=1e-7):
    y0 = f(x)
    J = np.zeros((len(y0), len(x)))
    for i in range(len(x)):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        J[:, i] = (f(xp) - f(xm)) / (2 * eps)
    return J


class OracleEKFLoc:
    def __init__(self, cfg, map_pos, r_base_dvl=None, mu0=None):
        self.cfg = cfg
        self.map = np.asarray(map_pos, np.float64)
        self.r_base_dvl = np.eye(3) if r_base_dvl is None else r_base_dvl
        self.mu = np.zeros(6) if mu0 is None else np.asarray(mu0, np.float64)
        self.Sigma = np.diag(cfg.sigma0_diag).astype(np.float64)
        self.Q = np.diag(cfg.q_diag).astype(np.float64)
        self.R = np.diag(cfg.r_diag).astype(np.float64)
        self.lam = chi2.ppf(cfg.delta_outlier_reject, 3)
        self.t_prev = 0.0

    def h(self, mu, lm):
        return rotmat_from_rpy(mu[3:6]).T @ (lm - mu[0:3])

    def step(self, t_now, imu_quat, imu_valid, dvl_vals, dvl_stamps, dvl_count,
             dets, det_mask):
        cfg = self.cfg
        if not (imu_valid and dvl_count > 0):
            return self.mu.copy(), np.full(len(dets), -1, np.int64)

        stale = (t_now - dvl_stamps[-1]) > (0.5 / cfg.system_freq)
        v = bezier(dvl_vals, dvl_stamps, t_now) if stale else dvl_vals[-1]

        # predict
        dt = max(t_now - self.t_prev, 0.0)
        disp_base = self.r_base_dvl @ (v * dt)
        rpy_t = rpy_from_quat(imu_quat)
        disp_odom = rotmat_from_rpy(rpy_t) @ disp_base
        u = np.concatenate([disp_odom, wrap(rpy_t - self.mu[3:6])])
        mu = self.mu + u
        mu[3:6] = wrap(mu[3:6])
        G = np.zeros((6, 6))
        G[0:3, 0:3] = np.eye(3)
        G[0:3, 3:6] = numeric_jac(
            lambda a: rotmat_from_rpy(a) @ disp_base, rpy_t.copy()
        )
        Sigma = G @ self.Sigma @ G.T + self.R

        # data association, sequential
        matches = np.full(len(dets), -1, np.int64)
        for i, (z_raw, valid) in enumerate(zip(dets, det_mask)):
            if not valid:
                continue
            z = z_raw - np.array([0.0, cfg.stone_offset, cfg.stone_offset])
            best_psi, best = -np.inf, -1
            best_K = best_H = best_nu = None
            for j, lm in enumerate(self.map):
                tanv = np.tan(wrap(np.pi / 2 + mu[5]))
                if not (cfg.epsilon > abs((lm[0] - mu[0]) + (mu[1] - lm[1]) / tanv)):
                    continue
                z_hat = self.h(mu, lm)
                H = numeric_jac(lambda m: self.h(m, lm), mu.copy())
                S = H @ Sigma @ H.T + self.Q
                nu = z - z_hat
                Sinv = np.linalg.inv(S)
                d_m = nu @ Sinv @ nu
                if d_m >= self.lam:
                    continue
                psi = np.exp(-0.5 * d_m) / np.sqrt(np.linalg.det(np.pi * S))
                if psi > best_psi:
                    best_psi, best = psi, j
                    best_K = Sigma @ H.T @ Sinv
                    best_H, best_nu = H, nu
            if best >= 0:
                mu = mu + best_K @ best_nu
                mu[3:6] = wrap(mu[3:6])
                Sigma = (np.eye(6) - best_K @ best_H) @ Sigma
                matches[i] = best

        self.mu, self.Sigma, self.t_prev = mu, Sigma, t_now
        return mu.copy(), matches


def run_oracle(cfg, map_pos, timeline_np, r_base_dvl=None):
    """timeline_np: dict of numpy views of the Timeline channels."""
    o = OracleEKFLoc(cfg, map_pos, r_base_dvl)
    T = len(timeline_np["ticks"])
    mus = np.zeros((T, 6))
    matches = []
    for k in range(T):
        mu, m = o.step(
            t_now=timeline_np["ticks"][k],
            imu_quat=timeline_np["imu_value"][k][0:4],
            imu_valid=timeline_np["imu_valid"][k],
            dvl_vals=timeline_np["dvl_wvalue"][k],
            dvl_stamps=timeline_np["dvl_wstamp"][k],
            dvl_count=timeline_np["dvl_wcount"][k],
            dets=timeline_np["det_value"][k],
            det_mask=timeline_np["det_mask"][k],
        )
        mus[k] = mu
        matches.append(m)
    return mus, np.stack(matches)
