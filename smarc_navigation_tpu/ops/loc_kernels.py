"""Whole-tick Pallas TPU kernel for the EKF-localization fleet.

The localization filter's state is tiny (6-DOF mean + 6x6 covariance) so a
vmapped-XLA fleet tick is bound by per-op dispatch overhead (~8 us per
elementwise op on this backend regardless of operand size — measured): the
~400-op tick costs ~3.6 ms whether the fleet is 1 or 256 missions wide.

This kernel runs the ENTIRE tick — motion predict, the M-measurement
greedy-ML association loop (batched over all map slots) and the sequential
updates — in one Mosaic program with the *mission axis in the VPU lanes*:

  mu    as an (8, B) block   (state components in sublanes, missions in lanes)
  Sigma as a (36, B) block   (covariance entries in sublanes)
  per-slot quantities as (N, B) blocks (map slots x missions)

Every 3x3/3x6/6x6 product is expanded componentwise into fused row ops, so
the whole tick is a few thousand single-cycle VPU ops over all missions at
once instead of a few hundred XLA dispatches.

Semantics match ``models.ekf_localization.step`` (itself pinned to
``ekf_localization.cpp:479-545``): absolute-attitude motion predict with the
zero-orientation-row G, per-measurement batched correspondence with the
landmark pre-gate heuristic, chi^2(3) Mahalanobis gate, greedy best pick by
likelihood (argmax of log psi — same ranking as the reference's
det(pi S)^-1/2 exp(-d/2)), sequential updates in measurement order, and the
no-input rebroadcast gate. Association decisions are bit-compatible up to
f32 reassociation; the interpret-mode equivalence test pins them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38
_TWO_PI = 6.283185307179586


def _rot_entries(sr, cr, sp, cp, sy, cy):
    """Entries of R = Rz(y) Ry(p) Rx(r) as a 3x3 nested list of row vectors."""
    return [
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ]


def _drot_entries(sr, cr, sp, cp, sy, cy):
    """dR/d(roll), dR/d(pitch), dR/d(yaw) — analytic (matches jacfwd of
    ``utils.geometry.rotmat_from_rpy``; unit-tested)."""
    zero = sr * 0.0
    dR_dr = [
        [zero, cy * sp * cr + sy * sr, -cy * sp * sr + sy * cr],
        [zero, sy * sp * cr - cy * sr, -sy * sp * sr - cy * cr],
        [zero, cp * cr, -cp * sr],
    ]
    dR_dp = [
        [-cy * sp, cy * cp * sr, cy * cp * cr],
        [-sy * sp, sy * cp * sr, sy * cp * cr],
        [-cp, -sp * sr, -sp * cr],
    ]
    dR_dy = [
        [-sy * cp, -sy * sp * sr - cy * cr, -sy * sp * cr + cy * sr],
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [zero, zero, zero],
    ]
    return [dR_dr, dR_dp, dR_dy]


def _wrap(a):
    return jnp.mod(a + jnp.pi, _TWO_PI) - jnp.pi


def _make_tick_kernel(M: int, N: int):
    """Kernel factory (M measurements, N map slots; both static)."""

    def kernel(par_ref, tick_ref, z_ref, map_ref, mu_in, sig_in,
               mu_ref, sig_ref, match_ref):
        # par (SMEM, 16): [q0,q1,q2, r0..r5, lambda_m, epsilon, ...]
        # tick (8, B): rows 0-2 rpy_t, 3-5 disp_base, 6 have
        # z (M*8, B): per measurement rows [z0, z1, z2, valid, 0...]
        # map (N, 8): cols 0-2 xyz, col 3 mask
        # mu (8, B): rows 0-5 state; sig (36, B): row i*6+j = Sigma[i,j]
        B = mu_in.shape[1]
        qd = [par_ref[0, 0], par_ref[0, 1], par_ref[0, 2]]
        rd = [par_ref[0, 3 + i] for i in range(6)]
        lam = par_ref[0, 9]
        eps = par_ref[0, 10]

        have = tick_ref[6:7, :] > 0.5                       # (1,B)
        havef = tick_ref[6:7, :]

        # ---- motion predict (ekf_localization.cpp:360-437) ----------------
        rpy = [tick_ref[i:i + 1, :] for i in range(3)]
        db = [tick_ref[3 + i:4 + i, :] for i in range(3)]
        sr, cr = jnp.sin(rpy[0]), jnp.cos(rpy[0])
        sp, cp = jnp.sin(rpy[1]), jnp.cos(rpy[1])
        sy, cy = jnp.sin(rpy[2]), jnp.cos(rpy[2])
        R = _rot_entries(sr, cr, sp, cp, sy, cy)
        dR = _drot_entries(sr, cr, sp, cp, sy, cy)

        mu = [mu_in[i:i + 1, :] for i in range(6)]
        sig = [[sig_in[i * 6 + j:i * 6 + j + 1, :] for j in range(6)]
               for i in range(6)]

        # mu' = [pos + R(rpy_t) disp_base, rpy_t] (orientation absolute)
        mu_p = [mu[i] + sum(R[i][j] * db[j] for j in range(3)) for i in range(3)]
        mu_a = [_wrap(rpy[i]) for i in range(3)]
        # J = d(R(rpy) disp_base)/d rpy  (3x3)
        J = [[sum(dR[k][i][j] * db[j] for j in range(3)) for k in range(3)]
             for i in range(3)]
        # Sigma' = [[Spp + J Sap + (J Sap)^T + J Saa J^T, 0],[0,0]] + diag(R)
        T = [[sum(J[i][k] * sig[3 + k][j] for k in range(3)) for j in range(3)]
             for i in range(3)]
        U = [[sum(J[i][k] * sig[3 + k][3 + j] for k in range(3)) for j in range(3)]
             for i in range(3)]
        UJt = [[sum(U[i][k] * J[j][k] for k in range(3)) for j in range(3)]
               for i in range(3)]
        new_sig = [[None] * 6 for _ in range(6)]
        for i in range(3):
            for j in range(3):
                new_sig[i][j] = sig[i][j] + T[i][j] + T[j][i] + UJt[i][j]
                new_sig[i][3 + j] = sig[i][j] * 0.0
                new_sig[3 + i][j] = sig[i][j] * 0.0
                new_sig[3 + i][3 + j] = sig[i][j] * 0.0
        for i in range(6):
            new_sig[i][i] = new_sig[i][i] + rd[i]

        # commit the (ungated) predict into the working refs; like the dense
        # path, predict+DA run unconditionally and the no-input gate discards
        # the whole tick at the end (ekf_localization.cpp:618-622)
        mu6 = mu_p + mu_a
        for i in range(6):
            mu_ref[i:i + 1, :] = mu6[i]
        mu_ref[6:7, :] = havef
        mu_ref[7:8, :] = havef
        for i in range(6):
            for j in range(6):
                sig_ref[i * 6 + j:i * 6 + j + 1, :] = new_sig[i][j]

        # map columns as (N,1) broadcastable blocks
        mx = map_ref[:, 0:1]
        my = map_ref[:, 1:2]
        mz = map_ref[:, 2:3]
        mmask = map_ref[:, 3:4] > 0.5                         # (N,1)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).astype(jnp.float32)

        # ---- M sequential greedy-ML updates (cpp:479-545) ------------------
        def body(m, _):
            # measurement rows are 8-strided: Mosaic requires dynamic
            # sublane starts provably divisible by the (8,128) tile
            zrows = z_ref[pl.ds(pl.multiple_of(m * 8, 8), 8), :]   # (8,B)
            z = [zrows[i:i + 1, :] for i in range(3)]              # (1,B)
            zvalid = zrows[3:4, :] > 0.5

            mu = [mu_ref[i:i + 1, :] for i in range(6)]
            sig = [[sig_ref[i * 6 + j:i * 6 + j + 1, :] for j in range(6)]
                   for i in range(6)]
            sr, cr = jnp.sin(mu[3]), jnp.cos(mu[3])
            sp, cp = jnp.sin(mu[4]), jnp.cos(mu[4])
            sy, cy = jnp.sin(mu[5]), jnp.cos(mu[5])
            R = _rot_entries(sr, cr, sp, cp, sy, cy)
            dR = _drot_entries(sr, cr, sp, cp, sy, cy)

            # diff_n = lm_n - mu_pos : (N,B)
            diff = [mx - mu[0], my - mu[1], mz - mu[2]]
            # z_hat = R^T diff ; H = [-R^T | dR^T/da . diff]
            zh = [sum(R[j][i] * diff[j] for j in range(3)) for i in range(3)]
            Ha = [[sum(dR[k][j][i] * diff[j] for j in range(3)) for k in range(3)]
                  for i in range(3)]                           # (3x3) of (N,B)
            Hp = [[-R[j][i] for j in range(3)] for i in range(3)]  # (1,B)

            # W = H Sigma (3x6); S = W H^T + Q (3x3 symmetric)
            def Hcol(a, c):
                return Hp[a][c] if c < 3 else Ha[a][c - 3]

            W = [[sum(Hcol(a, c) * sig[c][d] for c in range(6)) for d in range(6)]
                 for a in range(3)]
            S = [[None] * 3 for _ in range(3)]
            for a in range(3):
                for b in range(a, 3):
                    s = sum(W[a][d] * Hcol(b, d) for d in range(6))
                    if a == b:
                        s = s + qd[a]
                    S[a][b] = s
                    S[b][a] = s

            # closed-form symmetric 3x3 inverse (utils.linalg.inv_det_small3)
            c00 = S[1][1] * S[2][2] - S[1][2] * S[1][2]
            c01 = S[0][2] * S[1][2] - S[0][1] * S[2][2]
            c02 = S[0][1] * S[1][2] - S[0][2] * S[1][1]
            det = S[0][0] * c00 + S[0][1] * c01 + S[0][2] * c02
            det = jnp.maximum(det, 1e-30)
            inv_det = 1.0 / det
            Si = [[None] * 3 for _ in range(3)]
            Si[0][0] = c00 * inv_det
            Si[0][1] = c01 * inv_det
            Si[0][2] = c02 * inv_det
            Si[1][1] = (S[0][0] * S[2][2] - S[0][2] * S[0][2]) * inv_det
            Si[1][2] = (S[0][1] * S[0][2] - S[0][0] * S[1][2]) * inv_det
            Si[2][2] = (S[0][0] * S[1][1] - S[0][1] * S[0][1]) * inv_det
            Si[1][0] = Si[0][1]
            Si[2][0] = Si[0][2]
            Si[2][1] = Si[1][2]

            nu = [z[i] - zh[i] for i in range(3)]              # (N,B)
            dm = sum(nu[a] * Si[a][b] * nu[b] for a in range(3) for b in range(3))
            # greedy rank by log psi = -(d_m + log det)/2 (same order as
            # det(pi S)^-1/2 exp(-d_m/2), cpp:80-97)
            logpsi = -0.5 * (dm + jnp.log(det))

            # landmark pre-gate heuristic (cpp:508)
            t = jnp.tan(_wrap(jnp.pi / 2.0 + mu[5]))
            pregate = eps > jnp.abs((mx - mu[0]) + (mu[1] - my) / t)
            ok = mmask & pregate & (dm < lam) & zvalid          # (N,B)
            score = jnp.where(ok, logpsi, _NEG)

            best_score = jnp.max(score, axis=0, keepdims=True)          # (1,B)
            any_ok = best_score > 0.5 * _NEG
            # first slot achieving the max (argmax semantics)
            is_best = score == best_score
            best_ix = jnp.min(jnp.where(is_best, iota_n, float(N)), axis=0,
                              keepdims=True)                            # (1,B)
            onehot = (iota_n == best_ix).astype(jnp.float32)            # (N,B)

            def pick(q):
                return jnp.sum(q * onehot, axis=0, keepdims=True)       # (1,B)

            Hb = [[Hp[a][c] if c < 3 else pick(Ha[a][c - 3]) for c in range(6)]
                  for a in range(3)]
            Sib = [[pick(Si[a][b]) for b in range(3)] for a in range(3)]
            nub = [pick(nu[a]) for a in range(3)]

            # K = Sigma H^T Si  (6x3)
            HS = [[sum(Hb[a][c] * Sib[a][b] for a in range(3)) for b in range(3)]
                  for c in range(6)]
            K = [[sum(sig[i][c] * HS[c][b] for c in range(6)) for b in range(3)]
                 for i in range(6)]
            upd = any_ok
            dmu = [sum(K[i][b] * nub[b] for b in range(3)) for i in range(6)]
            mu_new = [mu[i] + jnp.where(upd, dmu[i], 0.0) for i in range(6)]
            for i in range(3, 6):
                mu_new[i] = jnp.where(upd, _wrap(mu_new[i]), mu_new[i])

            # Sigma' = (I - K H) Sigma
            KH = [[sum(K[i][b] * Hb[b][j] for b in range(3)) for j in range(6)]
                  for i in range(6)]
            for i in range(6):
                for j in range(6):
                    delta = sum(KH[i][c] * sig[c][j] for c in range(6))
                    sig_ref[i * 6 + j:i * 6 + j + 1, :] = (
                        sig[i][j] - jnp.where(upd, delta, 0.0))
            for i in range(6):
                mu_ref[i:i + 1, :] = mu_new[i]

            match_ref[pl.ds(m, 1), :] = jnp.where(upd, best_ix, -1.0)
            return 0

        jax.lax.fori_loop(0, M, body, 0)

        # no-input rebroadcast: the whole tick is discarded
        for i in range(6):
            mu_ref[i:i + 1, :] = jnp.where(have, mu_ref[i:i + 1, :],
                                           mu_in[i:i + 1, :])
        for r in range(36):
            sig_ref[r:r + 1, :] = jnp.where(have, sig_ref[r:r + 1, :],
                                            sig_in[r:r + 1, :])

    return kernel


@functools.partial(jax.jit, static_argnames=())
def fleet_tick(
    mu: jnp.ndarray,        # (B, 6)
    Sigma: jnp.ndarray,     # (B, 6, 6)
    rpy_t: jnp.ndarray,     # (B, 3) absolute IMU attitude
    disp_base: jnp.ndarray, # (B, 3) base-frame displacement this tick
    have: jnp.ndarray,      # (B,) bool IMU+DVL contact
    z: jnp.ndarray,         # (B, M, 3) detections (offset applied)
    z_valid: jnp.ndarray,   # (B, M) bool
    map_pos: jnp.ndarray,   # (N, 3)
    map_mask: jnp.ndarray,  # (N,)
    q_diag: jnp.ndarray,    # (3,)
    r_diag: jnp.ndarray,    # (6,)
    lambda_m: jnp.ndarray,
    epsilon,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One whole fleet tick -> (mu', Sigma', matches (B, M))."""
    B, M = z.shape[0], z.shape[1]
    N = map_pos.shape[0]
    f32 = jnp.float32
    Bp = max(128, ((B + 127) // 128) * 128)

    def lanes(x, rows):  # (B, rows) -> (rows, Bp)
        out = jnp.zeros((rows, Bp), f32)
        return out.at[:, :B].set(x.astype(f32).T)

    mu_in = lanes(mu, 6)
    mu_in = jnp.concatenate([mu_in, jnp.zeros((2, Bp), f32)], axis=0)
    sig_in = lanes(Sigma.reshape(B, 36), 36)
    tick_in = jnp.zeros((8, Bp), f32)
    tick_in = tick_in.at[0:3, :B].set(rpy_t.astype(f32).T)
    tick_in = tick_in.at[3:6, :B].set(disp_base.astype(f32).T)
    tick_in = tick_in.at[6, :B].set(have.astype(f32))
    zmix = jnp.zeros((B, M, 8), f32)
    zmix = zmix.at[:, :, 0:3].set(z.astype(f32))
    zmix = zmix.at[:, :, 3].set(z_valid.astype(f32))
    z_in = jnp.zeros((M * 8, Bp), f32)
    z_in = z_in.at[:, :B].set(zmix.reshape(B, M * 8).T)
    Np = ((N + 7) // 8) * 8
    map_in = jnp.zeros((Np, 8), f32)
    map_in = map_in.at[:N, 0:3].set(map_pos.astype(f32))
    map_in = map_in.at[:N, 3].set(map_mask.astype(f32))
    par = jnp.zeros((1, 16), f32)
    par = par.at[0, 0:3].set(q_diag.astype(f32))
    par = par.at[0, 3:9].set(r_diag.astype(f32))
    par = par.at[0, 9].set(jnp.asarray(lambda_m, f32))
    par = par.at[0, 10].set(jnp.asarray(epsilon, f32))

    mu_o, sig_o, match_o = pl.pallas_call(
        _make_tick_kernel(M, Np),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), f32),
            jax.ShapeDtypeStruct((36, Bp), f32),
            jax.ShapeDtypeStruct((M, Bp), f32),
        ],
    )(par, tick_in, z_in, map_in, mu_in, sig_in)

    mu_out = mu_o[0:6, :B].T
    sig_out = sig_o[:, :B].T.reshape(B, 6, 6)
    matches = match_o[:, :B].T.astype(jnp.int32)
    return mu_out, sig_out, matches
