"""NumPy float64 oracle of the 15-state (robot_localization-style) EKF.

Independent transcription of the dual-EKF estimator configured by
``/root/reference/sam_dead_reckoning/launch/dual_ekf_test.launch`` and
``params/ekf_sam.yaml``: omega-kinematics transition over
[x y z, r p y, vx vy vz, vr vp vy, ax ay az] (robot_localization's
documented motion model), numeric transition Jacobian, per-sensor masked
identity measurement updates applied in launch order, and the
gain-and-clamp control shaping of the ``use_control`` block (launch
:212-227). No jax anywhere — this file exists to catch jax-side bugs.
"""

from __future__ import annotations

import numpy as np


def wrap(a):
    return np.mod(a + np.pi, 2 * np.pi) - np.pi


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


def euler_rate_matrix(rpy):
    r, p = rpy[0], rpy[1]
    sr, cr, cp, tp = np.sin(r), np.cos(r), np.cos(p), np.tan(p)
    return np.array([[1.0, sr * tp, cr * tp], [0.0, cr, -sr], [0.0, sr / cp, cr / cp]])


def transition(x, dt, accel_cmd=None):
    pos, rpy, v, w, a = x[0:3], x[3:6], x[6:9], x[9:12], x[12:15]
    a_eff = a if accel_cmd is None else a + accel_cmd
    pos_n = pos + rotmat(rpy) @ (v * dt + 0.5 * a_eff * dt * dt)
    rpy_n = wrap(rpy + euler_rate_matrix(rpy) @ (w * dt))
    v_n = v + a_eff * dt
    return np.concatenate([pos_n, rpy_n, v_n, w, a])


def numeric_F(x, dt, accel_cmd, eps=1e-6):
    F = np.zeros((15, 15))
    for i in range(15):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        d = transition(xp, dt, accel_cmd) - transition(xm, dt, accel_cmd)
        d[3:6] = wrap(d[3:6])
        F[:, i] = d / (2 * eps)
    return F


class Oracle15:
    def __init__(self, process_noise_diag, initial_cov_diag,
                 control_gains=(0.1, 0.1, 0.0), control_limits=(0.1, 0.1, 0.0)):
        self.x = np.zeros(15)
        self.P = np.diag(np.asarray(initial_cov_diag, np.float64))
        self.Q = np.diag(np.asarray(process_noise_diag, np.float64))
        self.g = np.asarray(control_gains, np.float64)
        self.lim = np.asarray(control_limits, np.float64)
        self.t_prev = 0.0

    def control_accel(self, cmd_vel):
        return np.clip(self.g * (cmd_vel - self.x[6:9]), -self.lim, self.lim)

    def predict(self, dt, accel_cmd):
        F = numeric_F(self.x, dt, accel_cmd)
        self.x = transition(self.x, dt, accel_cmd)
        self.P = F @ self.P @ F.T + self.Q * dt
        self.P = 0.5 * (self.P + self.P.T)

    def update(self, z15, mask, noise_diag):
        big = 1e12
        r = np.where(mask, np.maximum(noise_diag, 1e-9), big)
        nu = z15 - self.x
        nu[3:6] = wrap(nu[3:6])
        nu = np.where(mask, nu, 0.0)
        S = self.P + np.diag(r)
        K = np.linalg.solve(S, self.P).T  # P S⁻¹ (H = I)
        self.x = self.x + K @ nu
        self.x[3:6] = wrap(self.x[3:6])
        self.P = (np.eye(15) - K) @ self.P
        self.P = 0.5 * (self.P + self.P.T)

    def step(self, t_now, sensors, cmd=None, use_control=True):
        """sensors: list of (z15, mask15, noise15, apply) in launch order."""
        dt = max(t_now - self.t_prev, 0.0)
        accel_cmd = None
        if use_control and cmd is not None:
            accel_cmd = self.control_accel(cmd)
        self.predict(dt, accel_cmd)
        for z15, mask, noise, apply in sensors:
            if apply:
                self.update(np.asarray(z15, np.float64), np.asarray(mask, bool),
                            np.asarray(noise, np.float64))
        self.t_prev = t_now
        return self.x.copy()
