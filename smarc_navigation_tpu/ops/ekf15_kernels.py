"""Missions-in-lanes Pallas kernel for the 15-state (robot_localization)
EKF fleet.

Same backend economics as ``loc_kernels``: the dense vmapped tick is ~70
XLA ops x ~8 us of dispatch overhead (~570 us per fleet tick at any width).
This kernel runs the whole tick — omega-kinematics predict with the
analytic 15x15 Jacobian, control-shaped acceleration, and one masked
identity update per configured sensor — componentwise with missions in the
VPU lanes: x as (16, B), P as (225, B) rows.

The masked identity update (``ekf_15state.update``: H = I with 1e12 noise
on unmeasured components) is realized as the exact subspace limit: for the
k measured components m, S = P[m,m] + diag(r_m), K = P[:,m] S^-1,
x += K nu_m, P -= K P[m,:] — identical up to the O(1e-12) gain the big-
noise trick leaves on unmeasured rows (below f32 resolution). S^-1 runs as
a componentwise k x k Cholesky solve (k <= 6, static per sensor).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586
_ANGLES = (3, 4, 5)


def _wrap(a):
    return jnp.mod(a + jnp.pi, _TWO_PI) - jnp.pi


def _chol_solve_cols(S, RHS, k, n_rhs):
    """Componentwise SPD solve: returns X (n_rhs x k) with X = RHS S^-1.

    S: k x k nested list of (1,B) rows; RHS: n_rhs x k (rows of P at the
    measured columns). Cholesky S = L L^T, then two triangular solves per
    RHS row. All unrolled; k <= 6."""
    L = [[None] * k for _ in range(k)]
    for j in range(k):
        d = S[j][j] - sum(L[j][p] * L[j][p] for p in range(j))
        L[j][j] = jnp.sqrt(jnp.maximum(d, 1e-20))
        inv_ljj = 1.0 / L[j][j]
        for i in range(j + 1, k):
            off = S[i][j] - sum(L[i][p] * L[j][p] for p in range(j))
            L[i][j] = off * inv_ljj
    X = []
    for r in range(n_rhs):
        # solve L y = RHS[r], then L^T x = y  (x = RHS[r] S^-1 by symmetry)
        y = [None] * k
        for i in range(k):
            y[i] = (RHS[r][i] - sum(L[i][p] * y[p] for p in range(i))) / L[i][i]
        x = [None] * k
        for i in reversed(range(k)):
            x[i] = (y[i] - sum(L[j][i] * x[j] for j in range(i + 1, k))) / L[i][i]
        X.append(x)
    return X


def _make_ekf15_kernel(sensor_idx: Tuple[Tuple[int, ...], ...],
                       sensor_noise: Tuple[Tuple[float, ...], ...],
                       q_diag: Tuple[float, ...],
                       control_gains: Tuple[float, ...],
                       control_limits: Tuple[float, ...],
                       use_control: bool):
    """Kernel factory; everything about the sensor wiring is static.

    tick layout (rows, B): row 0 dt; rows 1-3 cmd (ax-shaping inputs x,y +
    valid); then per sensor s: k_s measured values followed by its apply
    flag. x (16,B) rows 0-14 state; P (225,B) row 15*i+j."""

    n_sens = len(sensor_idx)

    def kernel(x_in, p_in, tick_ref, x_ref, p_ref):
        x = [x_in[i:i + 1, :] for i in range(15)]
        P = [[p_in[i * 15 + j:i * 15 + j + 1, :] for j in range(15)]
             for i in range(15)]
        dt = tick_ref[0:1, :]

        # ---- control shaping (gain*(cmd - v) clamped; launch :212-227) ----
        a_cmd = [x[0] * 0.0 for _ in range(3)]
        if use_control:
            cmd_ok = tick_ref[3:4, :] > 0.5
            for i in range(2):
                g, lim = control_gains[i], control_limits[i]
                raw = g * (tick_ref[1 + i:2 + i, :] - x[6 + i])
                raw = jnp.clip(raw, -lim, lim)
                a_cmd[i] = jnp.where(cmd_ok, raw, 0.0)

        a_eff = [x[12 + i] + a_cmd[i] for i in range(3)]
        v = [x[6 + i] for i in range(3)]
        w = [x[9 + i] for i in range(3)]

        sr, cr = jnp.sin(x[3]), jnp.cos(x[3])
        sp, cp = jnp.sin(x[4]), jnp.cos(x[4])
        sy, cy = jnp.sin(x[5]), jnp.cos(x[5])
        from .loc_kernels import _drot_entries, _rot_entries
        R = _rot_entries(sr, cr, sp, cp, sy, cy)
        dR = _drot_entries(sr, cr, sp, cp, sy, cy)

        # Euler rate matrix E and its roll/pitch derivatives
        tp = sp / cp
        inv_cp = 1.0 / cp
        E = [[cy * 0.0 + 1.0, sr * tp, cr * tp],
             [cy * 0.0, cr, -sr],
             [cy * 0.0, sr * inv_cp, cr * inv_cp]]
        dE_dr = [[cy * 0.0, cr * tp, -sr * tp],
                 [cy * 0.0, -sr, -cr],
                 [cy * 0.0, cr * inv_cp, -sr * inv_cp]]
        sec2 = inv_cp * inv_cp
        dE_dp = [[cy * 0.0, sr * sec2, cr * sec2],
                 [cy * 0.0, cy * 0.0, cy * 0.0],
                 [cy * 0.0, sr * tp * inv_cp, cr * tp * inv_cp]]

        # displacement d = v dt + a dt^2/2 (body), pos' = pos + R d
        half_dt2 = 0.5 * dt * dt
        d = [v[i] * dt + a_eff[i] * half_dt2 for i in range(3)]
        x_new = [None] * 15
        for i in range(3):
            x_new[i] = x[i] + sum(R[i][j] * d[j] for j in range(3))
        wdt = [w[i] * dt for i in range(3)]
        for i in range(3):
            x_new[3 + i] = _wrap(x[3 + i] + sum(E[i][j] * wdt[j]
                                                for j in range(3)))
        for i in range(3):
            x_new[6 + i] = v[i] + a_eff[i] * dt
            x_new[9 + i] = w[i]
            x_new[12 + i] = x[12 + i]

        # ---- Jacobian blocks (A = F - I, sparse) --------------------------
        # rows 0-2: A1 (d/drpy) cols 3-5, A2 = R dt cols 6-8, A3 = R dt^2/2
        A1 = [[sum(dR[k][i][j] * d[j] for j in range(3)) for k in range(3)]
              for i in range(3)]
        A2 = [[R[i][j] * dt for j in range(3)] for i in range(3)]
        A3 = [[R[i][j] * half_dt2 for j in range(3)] for i in range(3)]
        # rows 3-5: B1 (d(E w dt)/drpy) cols 3-5, B2 = E dt cols 9-11
        dE = [dE_dr, dE_dp, None]
        B1 = [[(sum(dE[k][i][j] * wdt[j] for j in range(3))
                if k < 2 else cy * 0.0) for k in range(3)] for i in range(3)]
        B2 = [[E[i][j] * dt for j in range(3)] for i in range(3)]

        def Arow(i):  # list of (col, coeff) for row i of A
            if i < 3:
                return ([(3 + j, A1[i][j]) for j in range(3)]
                        + [(6 + j, A2[i][j]) for j in range(3)]
                        + [(12 + j, A3[i][j]) for j in range(3)])
            if i < 6:
                return ([(3 + j, B1[i - 3][j]) for j in range(3)]
                        + [(9 + j, B2[i - 3][j]) for j in range(3)])
            if i < 9:
                return [(12 + (i - 6), dt)]
            return []

        # AP rows (only rows 0-8 nonzero)
        AP = [[sum(c * P[col][j] for col, c in Arow(i)) if Arow(i) else None
               for j in range(15)] for i in range(9)]

        # (AP) A^T: [i][j] = sum_col AP[i][col] * A[j][col]
        def APA(i, j):
            return sum(AP[i][col] * c for col, c in Arow(j))

        Pn = [[None] * 15 for _ in range(15)]
        for i in range(15):
            for j in range(i, 15):
                val = P[i][j]
                if i < 9 and AP[i][0] is not None:
                    val = val + AP[i][j]
                if j < 9 and AP[j][0] is not None:
                    val = val + AP[j][i]
                if i < 9 and j < 9 and AP[i][0] is not None and AP[j][0] is not None:
                    val = val + APA(i, j)
                if i == j:
                    val = val + q_diag[i] * dt
                Pn[i][j] = val
                Pn[j][i] = val

        x = x_new
        P = Pn

        # ---- sensor updates (masked identity -> exact subspace) ----------
        row = 4
        for s in range(n_sens):
            idx = sensor_idx[s]
            k = len(idx)
            z = [tick_ref[row + i:row + i + 1, :] for i in range(k)]
            apply_f = tick_ref[row + k:row + k + 1, :] > 0.5
            row += k + 1

            nu = []
            for i, c in enumerate(idx):
                d_ = z[i] - x[c]
                if c in _ANGLES:
                    d_ = _wrap(d_)
                nu.append(d_)
            S = [[P[idx[a]][idx[b]] + (sensor_noise[s][a] if a == b else 0.0)
                  for b in range(k)] for a in range(k)]
            RHS = [[P[r_][idx[b]] for b in range(k)] for r_ in range(15)]
            K = _chol_solve_cols(S, RHS, k, 15)      # (15 x k) gain

            x2 = [x[i] + sum(K[i][b] * nu[b] for b in range(k))
                  for i in range(15)]
            for c in _ANGLES:
                x2[c] = _wrap(x2[c])
            # P' = P - K P[m,:], symmetrized like the dense path
            P2 = [[None] * 15 for _ in range(15)]
            for i in range(15):
                for j in range(i, 15):
                    dij = sum(K[i][b] * P[idx[b]][j] for b in range(k))
                    dji = sum(K[j][b] * P[idx[b]][i] for b in range(k))
                    val = P[i][j] - 0.5 * (dij + dji)
                    P2[i][j] = val
                    P2[j][i] = val
            x = [jnp.where(apply_f, x2[i], x[i]) for i in range(15)]
            for i in range(15):
                for j in range(15):
                    P[i][j] = jnp.where(apply_f, P2[i][j], P[i][j])

        for i in range(15):
            x_ref[i:i + 1, :] = x[i]
        x_ref[15:16, :] = dt
        for i in range(15):
            for j in range(15):
                p_ref[i * 15 + j:i * 15 + j + 1, :] = P[i][j]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "sensor_idx", "sensor_noise", "timeouts", "channels", "q_diag",
    "gains", "limits", "use_control", "use_cmd"))
def _run_fleet15_jit(tl, x0, P0, sensor_idx, sensor_noise, timeouts,
                     channels, q_diag, gains, limits, use_control, use_cmd):
    B, T = tl.ticks.shape
    f32 = jnp.float32
    Bp = max(128, ((B + 127) // 128) * 128)
    rows = 4 + sum(len(ix) + 1 for ix in sensor_idx)

    parts = []
    dts = jnp.diff(tl.ticks, axis=1, prepend=jnp.zeros((B, 1), tl.ticks.dtype))
    parts.append(dts[..., None])
    if use_cmd:
        cmd = tl.channels["cmd_vel"]
        parts.append(cmd.value[..., 0:2])
        parts.append(cmd.valid[..., None].astype(f32))
    else:
        parts.append(jnp.zeros((B, T, 3), f32))
    for name, ix, to in zip(channels, sensor_idx, timeouts):
        ch = tl.channels[name]
        parts.append(ch.value[..., list(ix)])
        apply_f = ch.fresh & (ch.age < to)
        parts.append(apply_f[..., None].astype(f32))
    tick_bt = jnp.concatenate([p.astype(f32) for p in parts], axis=2)
    tick_t = jnp.zeros((T, rows, Bp), f32)
    tick_t = tick_t.at[:, :, :B].set(jnp.moveaxis(tick_bt, 0, 2))

    x_l = jnp.zeros((16, Bp), f32).at[0:15, :B].set(x0[:, None])
    p_l = jnp.zeros((225, Bp), f32).at[:, :B].set(P0.reshape(225)[:, None])

    call = pl.pallas_call(
        _make_ekf15_kernel(sensor_idx, sensor_noise, q_diag, gains, limits,
                           use_control),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((16, Bp), f32),
            jax.ShapeDtypeStruct((225, Bp), f32),
        ],
    )

    def body(carry, t_in):
        xc, pc = carry
        xo, po = call(xc, pc, t_in)
        diag = jnp.stack([po[i * 15 + i] for i in range(15)])
        return (xo, po), (xo[0:15], diag)

    (xf, pfin), (x_t, pd_t) = jax.lax.scan(body, (x_l, p_l), tick_t)
    return (xf[0:15, :B].T, pfin[:, :B].T.reshape(B, 15, 15)), {
        "x": jnp.moveaxis(x_t[:, :, :B], 1, 2),
        "p_diag": jnp.moveaxis(pd_t[:, :, :B], 1, 2),
    }


def run_fleet15(batched_timeline, cfg, x0=None):
    """Fleet replay of the 15-state EKF through the lanes kernel.

    ``batched_timeline`` leaves are (B, T, ...) as from
    ``fleet.batch_timelines`` of ``ekf_15state.ekf15_timeline`` outputs.
    Returns (final (x (B,15), P (B,15,15)), out {"x": (T,B,15),
    "p_diag": (T,B,15)}). Sensor wiring, process noise, and control shaping
    are read from ``cfg`` exactly as the dense ``ekf_15state.run``; the
    whole staging + scan is one jitted program."""
    from ..models import ekf_15state as e15

    tl = batched_timeline
    sensors = [s for s in cfg.sensors if s.channel in tl.channels]
    sensor_idx = tuple(
        tuple(int(i) for i in np.where(np.asarray(s.mask))[0]) for s in sensors)
    sensor_noise = tuple(
        tuple(float(max(np.asarray(s.noise_diag)[i], 1e-9))
              for i in np.where(np.asarray(s.mask))[0]) for s in sensors)
    timeouts = tuple(float(s.timeout_s) for s in sensors)
    channels = tuple(s.channel for s in sensors)
    use_cmd = bool(cfg.use_control) and "cmd_vel" in tl.channels

    s0 = e15.init_state(cfg, x0=x0)
    return _run_fleet15_jit(
        tl, s0.x, s0.P, sensor_idx, sensor_noise, timeouts, channels,
        tuple(float(q) for q in cfg.process_noise_diag),
        tuple(float(g) for g in cfg.control_gains),
        tuple(float(l) for l in cfg.control_limits),
        bool(cfg.use_control), use_cmd)
