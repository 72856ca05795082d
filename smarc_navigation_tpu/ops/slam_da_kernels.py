"""Missions-in-lanes Pallas kernels for the SLAM data-association stage.

The SLAM fleet tick is bound by per-op dispatch overhead (~8 us/XLA op on
this backend): the Jonker-Volgenant assignment alone costs ~1.1 ms per
fleet tick as a vmapped while_loop of tiny ops. This module re-expresses it
as one Mosaic program with the mission axis in the VPU lanes.

``hungarian_lanes`` is the EXACT JV shortest-augmenting-path algorithm of
``ops.assignment.hungarian`` (same duals, same tie behavior through the
same min-reduction order), restructured for lockstep lanes:

* every per-lane data-dependent access (p[j0], cost column i0) becomes a
  one-hot mask + reduction — 2-3 row ops instead of a gather;
* the per-column Dijkstra loop is unrolled to its EXACT worst case: when
  augmenting column c, only the c previously-assigned rows can be
  non-terminal, so at most c+1 row expansions happen — 36 total for 8
  columns (the dense-XLA while_loop runs the same bound in the worst lane);
* lanes that reach a free row early freeze their state behind `done` masks
  (identical semantics to exiting the loop).

Cost layout: (R, C) per mission -> lane-major (C, R, B) blocks so each
column's slack update is a full-sublane (R, B) row op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30


def _jv_lanes(costblks, R, C):
    """In-lanes JV. costblks: list of C arrays (R, B) — cost[:, c] per block.

    Returns col_to_row: list of C (1, B) f32 row indices (-1 never occurs:
    every column has a candidate row by construction of the SLAM table).
    All quantities are jnp values (pure; runs inside a kernel trace)."""
    B = costblks[0].shape[1]
    f32 = jnp.float32
    R1 = R + 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R1, 1), 0).astype(f32)
    iota_top = iota_r[:R]

    # p[r]: column assigned to row r (-1 free); row R is the virtual root.
    # p is the ONLY (R1,B) array: the root rows of minv/way/used/v are
    # write-only (their init values are never read back), so those live at
    # (R,B) — no sublane concatenation anywhere (Mosaic cannot relayout
    # i1 vregs when R is not a multiple of 8; r05 fix).
    p = jnp.full((R1, B), -1.0, f32)
    v = jnp.zeros((R, B), f32)
    u = [jnp.zeros((1, B), f32) for _ in range(C)]

    def onehot(j):                       # (1,B) row index -> (R1,B) mask
        return iota_r == j

    def onehot_top(j):                   # same, top R rows only
        return iota_top == j

    def pick(rows, j):                   # rows (R1,B) gathered at per-lane j
        return jnp.sum(jnp.where(onehot(j), rows, 0.0), axis=0, keepdims=True)

    col_to_row = []
    for c in range(C):
        p = jnp.where(onehot(float(R)), float(c), p)
        minv = jnp.full((R, B), _INF, f32)
        way = jnp.full((R, B), float(R), f32)
        used = jnp.zeros((R, B), bool)
        # col_used[c']: column c' sits on a used row (drives the u update)
        col_used = [jnp.zeros((1, B), bool) for _ in range(C)]
        col_used[c] = jnp.ones((1, B), bool)      # root carries column c
        j0 = jnp.full((1, B), float(R), f32)
        done = jnp.zeros((1, B), bool)

        for _it in range(c + 1):
            i0 = pick(p, j0)                               # (1,B) col at j0
            has = i0 >= 0.0
            eq0 = [i0 == float(cc) for cc in range(C)]     # hoisted masks
            u_i0 = sum(jnp.where(eq0[cc], u[cc], 0.0) for cc in range(C))
            cur = sum(jnp.where(eq0[cc], costblks[cc], 0.0)
                      for cc in range(C))                  # (R,B)
            cur = cur - u_i0 - v
            cur = jnp.where(has, cur, _INF)
            better = (cur < minv) & (~used) & (~done)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)

            masked = jnp.where(used, _INF, minv)
            delta = jnp.min(masked, axis=0, keepdims=True)          # (1,B)
            is_min = masked == delta
            j1 = jnp.min(jnp.where(is_min, iota_top, float(R)),
                         axis=0, keepdims=True)                     # (1,B)

            # dual update (frozen lanes keep their state)
            act = ~done
            for cc in range(C):
                u[cc] = jnp.where(act & col_used[cc], u[cc] + delta, u[cc])
            v = jnp.where(act & used, v - delta, v)
            minv = jnp.where(act & ~used, minv - delta, minv)

            used = used | (onehot_top(j1) & act)
            i1 = pick(p, j1)
            for cc in range(C):
                col_used[cc] = col_used[cc] | (act & (i1 == float(cc)))
            reached_free = i1 < 0.0
            j0 = jnp.where(act, j1, j0)
            done = done | reached_free

        # augment: walk the predecessor chain from j0 back to the root
        fin = jnp.zeros((1, B), bool)
        j = j0
        for _k in range(c + 2):
            at_root = j == float(R)
            # way is (R,B): at the root j==R no row matches and j1 reads
            # 0.0 — harmless, those lanes are frozen by fin|at_root below
            j1 = jnp.sum(jnp.where(onehot_top(j), way, 0.0),
                         axis=0, keepdims=True)
            pj1 = pick(p, j1)
            write = onehot(j) & (~fin) & (~at_root)
            p = jnp.where(write, pj1, p)
            fin = fin | at_root
            j = jnp.where(fin, j, j1)
        p = jnp.where(onehot(float(R)), -1.0, p)

    for c in range(C):
        hit = p[:R] == float(c)                              # (R,B)
        col_to_row.append(
            jnp.sum(jnp.where(hit, iota_r[:R], 0.0), axis=0, keepdims=True))
    return col_to_row


def _make_jv_kernel(R: int, C: int):
    def kernel(cost_ref, out_ref):
        # cost (C*R, B): column c's block at rows [cR, (c+1)R)
        costblks = [cost_ref[c * R:(c + 1) * R, :] for c in range(C)]
        ctr = _jv_lanes(costblks, R, C)
        for c in range(C):
            out_ref[c:c + 1, :] = ctr[c]
    return kernel


# ===========================================================================
# whole-DA kernel: correspondence + cost + JV + selection, MBES + FLS
# ===========================================================================

_FLS_SCALE = 400.0 / 17.0   # px per metre (correspondence_obj_fls.cpp:27)


def _make_da_kernel(L: int, M: int, fls: bool = False, predict: bool = False):
    """Factory for the full data-association stage in one program:
    batched correspondence over the landmark bank, candidate back-
    projections, the (L+M, M) cost table, the exact in-lanes JV, and the
    per-measurement selection + slot bookkeeping — everything between the
    motion predict and the sequential-update kernel, with missions in the
    VPU lanes.

    ``fls=False`` — MBES: 3-D point measurements in the base frame.
    ``fls=True`` — FLS pixel measurements (dim=2): h chains the base-frame
    point through the sensor extrinsic and the polar pixel projection
    (``correspondence_obj_fls.cpp:25-41``); H = h₂·R_fls_base·h₁ with h₁
    the shared 3×9 point Jacobian (:61-135). The back-projection's polar
    roundtrip collapses to scale⁻¹·(z₀, −z₁, 0) in the FLS frame — rho·
    (cosθ, sinθ) = s⁻¹·(x, y) identically — so no trig is needed.

    Inputs (lane-major, B = padded mission lanes):
      par  (1,32) SMEM: [q0,q1,q2, lam, outlier, mh_dist, nl0,nl1,nl2,
                         rsb00..rsb22 (9-17), tsb0..2 (18-20)]
           (rsb/tsb = fls<-base rotation/translation; FLS only)
      pose (8,B): rows 0-5 mu pose, row 6 n_active
      act  (L,B): active mask
      lm   (3L,B): landmark positions, blocks [a*L + l]
      spp  (36,B); spl (18L,B) blocks [(i*3+k)*L + l]; sll (9L,B)
      z    (M*8,B): per m rows [z0,z1,z2,mask,0,0,0,0]

    Output (M*64,B) per measurement m (base = 64m), dim = 2 (FLS) or 3:
      rows 0..9dim-1 H_sel (dim x 9 row-major), 27..27+9dim-1 SinvH,
      54..54+dim-1 nu_sel, 57-59 cand, 60 col_to_row, 61 do, 62 add,
      63 slot

    Semantics pinned to ``ekf_slam.da_stage`` + the selection prologue of
    the pallas branch in ``ekf_slam.da_commit`` (itself cited to
    ``ekf_slam_core.cpp:184-340``)."""
    from .loc_kernels import _drot_entries, _rot_entries

    dim = 2 if fls else 3

    def kernel(par_ref, pose_ref, act_ref, lm_ref, spp_ref, spl_ref, sll_ref,
               z_ref, out_ref):
        qd = [par_ref[0, 0], par_ref[0, 1], par_ref[0, 2]][:dim]
        lam = par_ref[0, 3]
        outl = par_ref[0, 4]
        mh = par_ref[0, 5]
        nl = [par_ref[0, 6], par_ref[0, 7], par_ref[0, 8]]
        if fls:
            rsb = [[par_ref[0, 9 + 3 * i + j] for j in range(3)]
                   for i in range(3)]
            tsb = [par_ref[0, 18 + i] for i in range(3)]

        mu = [pose_ref[i:i + 1, :] for i in range(6)]
        n_act = pose_ref[6:7, :]
        active = act_ref[:, :] > 0.5                              # (L,B)

        sr, cr = jnp.sin(mu[3]), jnp.cos(mu[3])
        sp, cp = jnp.sin(mu[4]), jnp.cos(mu[4])
        sy, cy = jnp.sin(mu[5]), jnp.cos(mu[5])
        Rm = _rot_entries(sr, cr, sp, cp, sy, cy)
        dR = _drot_entries(sr, cr, sp, cp, sy, cy)

        lm = [lm_ref[a * L:(a + 1) * L, :] for a in range(3)]     # (L,B)
        Spp = [[spp_ref[i * 6 + j:i * 6 + j + 1, :] for j in range(6)]
               for i in range(6)]
        Spl = [[spl_ref[(i * 3 + k) * L:(i * 3 + k) * L + L, :]
                for k in range(3)] for i in range(6)]             # (L,B)
        Sll = [[sll_ref[(a * 3 + c) * L:(a * 3 + c) * L + L, :]
                for c in range(3)] for a in range(3)]

        if predict:
            # in-lanes motion predict of the Σ slabs this kernel consumes
            # (Σ' = A Σ Aᵀ + R̃ on the pose block; Σ_ll is untouched by
            # the predict) — the raw carry Σ is passed in and no XLA op
            # has to write the full Σ per tick. A arrives gated to the
            # exact identity (and R̃ to zero) for invalid-odom lanes,
            # making the tick a semantic no-op (single-term sums are
            # exact). R̃ is a FULL per-mission 6×6 (rows 48:84): the
            # event-compacted replay's composed segment noise
            # Σₜ A..R..Aᵀ is not diagonal.
            Am = [[pose_ref[8 + 6 * i + j:9 + 6 * i + j, :]
                   for j in range(6)] for i in range(6)]
            Rf = [[pose_ref[48 + 6 * i + j:49 + 6 * i + j, :]
                   for j in range(6)] for i in range(6)]
            tmp = [[sum(Spp[k][l] * Am[j][l] for l in range(6))
                    for j in range(6)] for k in range(6)]
            Spp = [[sum(Am[i][k] * tmp[k][j] for k in range(6))
                    + Rf[i][j]
                    for j in range(6)] for i in range(6)]
            Spl = [[sum(Am[i][j] * Spl[j][k] for j in range(6))
                    for k in range(3)] for i in range(6)]

        # --- correspondence for every slot (h = R^T(lm - p)) ---------------
        diff = [lm[a] - mu[a] for a in range(3)]                  # (L,B)
        zh = [sum(Rm[j][i] * diff[j] for j in range(3)) for i in range(3)]
        # H = [Hp | Hl]: Hp = [-R^T | dR^T/da . diff], Hl = R^T
        Ha = [[sum(dR[k][j][i] * diff[j] for j in range(3)) for k in range(3)]
              for i in range(3)]                                  # (L,B)
        Hp = [[-Rm[j][i] for j in range(3)] for i in range(3)]    # (1,B)
        Hl = [[Rm[j][i] for j in range(3)] for i in range(3)]     # (1,B)

        def Hcol(a, c):     # column c of the (3,9) point-H for the bank slots
            if c < 3:
                return Hp[a][c]
            if c < 6:
                return Ha[a][c - 3]
            return Hl[a][c - 6]

        if fls:
            # FLS chain: v = R_fls_base·h_base + t (sensor frame), pixel
            # z_hat = s·(‖(v0,v2)‖, −v1); H row d = Σⱼ w_d[j]·Hcol(j,·)
            # with w the rows of h₂·R_fls_base (h₂ at the expected v)
            v = [sum(rsb[i][j] * zh[j] for j in range(3)) + tsb[i]
                 for i in range(3)]                               # (L,B)
            n = jnp.sqrt(v[0] * v[0] + v[2] * v[2] + 1e-12)
            inv_n = 1.0 / n
            zh_d = [_FLS_SCALE * n, -_FLS_SCALE * v[1]]
            w0 = [_FLS_SCALE * (v[0] * rsb[0][j] + v[2] * rsb[2][j]) * inv_n
                  for j in range(3)]                              # (L,B)
            w1 = [-_FLS_SCALE * rsb[1][j] for j in range(3)]      # scalar

            def HcolD(a, c):
                w = w0 if a == 0 else w1
                return sum(w[j] * Hcol(j, c) for j in range(3))
        else:
            zh_d = zh
            HcolD = Hcol

        # W = H Sigma9 (dim x 9), S = W H^T + Q — Sigma9 blockwise:
        # cols 0-5 pose, 6-8 landmark; Spl rows are pose-major
        def Sig9(c, d):
            if c < 6 and d < 6:
                return Spp[c][d]
            if c < 6:
                return Spl[c][d - 6]
            if d < 6:
                return Spl[d][c - 6]
            return Sll[c - 6][d - 6]

        W = [[sum(HcolD(a, c) * Sig9(c, d) for c in range(9)) for d in range(9)]
             for a in range(dim)]
        S = [[None] * dim for _ in range(dim)]
        for a in range(dim):
            for b in range(a, dim):
                s = sum(W[a][d] * HcolD(b, d) for d in range(9))
                if a == b:
                    s = s + qd[a]
                S[a][b] = s
                S[b][a] = s

        def inv2(S):
            det = S[0][0] * S[1][1] - S[0][1] * S[0][1]
            inv_det = 1.0 / det
            return [[S[1][1] * inv_det, -S[0][1] * inv_det],
                    [-S[0][1] * inv_det, S[0][0] * inv_det]]

        def inv3(S):
            c00 = S[1][1] * S[2][2] - S[1][2] * S[1][2]
            c01 = S[0][2] * S[1][2] - S[0][1] * S[2][2]
            c02 = S[0][1] * S[1][2] - S[0][2] * S[1][1]
            det = S[0][0] * c00 + S[0][1] * c01 + S[0][2] * c02
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
            return Si

        inv_s = inv2 if fls else inv3
        Si = inv_s(S)                                             # (L,B) comps

        # --- per measurement: innovation, gate, candidates, cost -----------
        z = []
        zmask = []
        nu_all = []
        costblks = []
        cands = []
        Hc_all = []
        Sic_all = []
        nuc_all = []
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0).astype(jnp.float32)
        for m in range(M):
            zr = z_ref[m * 8:(m + 1) * 8, :]
            zm = [zr[i:i + 1, :] for i in range(3)]
            valid = zr[3:4, :] > 0.5
            z.append(zm)
            zmask.append(valid)
            nu_m = [zm[a] - zh_d[a] for a in range(dim)]           # (L,B)
            nu_all.append(nu_m)
            dm = sum(nu_m[a] * Si[a][b] * nu_m[b]
                     for a in range(dim) for b in range(dim))
            gate = (dm < lam) & active & valid
            known = jnp.where(gate, dm, outl)                     # (L,B)
            crow = jnp.where(iota_m == float(m), mh, outl)        # (M,1)->(M,B)
            crow = jnp.broadcast_to(crow, (M, known.shape[1]))
            costblks.append(jnp.concatenate([known, crow], axis=0))

            # candidate back-projection and its correspondence. MBES:
            # c = R z + p. FLS: pixels -> FLS-frame point s⁻¹·(z0,-z1,0)
            # (the polar roundtrip is the identity) -> base -> map.
            if fls:
                pf = [zm[0] / _FLS_SCALE, -zm[1] / _FLS_SCALE,
                      jnp.zeros_like(zm[0])]
                pb = [sum(rsb[i][a] * (pf[i] - tsb[i]) for i in range(3))
                      for a in range(3)]                           # (1,B)
                cm = [sum(Rm[a][j] * pb[j] for j in range(3)) + mu[a]
                      for a in range(3)]
            else:
                cm = [sum(Rm[a][j] * zm[j] for j in range(3)) + mu[a]
                      for a in range(3)]                           # (1,B)
            cands.append(cm)
            diff_c = [cm[a] - mu[a] for a in range(3)]
            zh_c3 = [sum(Rm[j][i] * diff_c[j] for j in range(3)) for i in range(3)]
            Ha_c = [[sum(dR[k][j][i] * diff_c[j] for j in range(3))
                     for k in range(3)] for i in range(3)]

            def Hcol_c(a, c, Ha_c=Ha_c):
                if c < 3:
                    return Hp[a][c]
                if c < 6:
                    return Ha_c[a][c - 3]
                return Hl[a][c - 6]

            if fls:
                v_c = [sum(rsb[i][j] * zh_c3[j] for j in range(3)) + tsb[i]
                       for i in range(3)]
                n_c = jnp.sqrt(v_c[0] * v_c[0] + v_c[2] * v_c[2] + 1e-12)
                inv_nc = 1.0 / n_c
                zh_c = [_FLS_SCALE * n_c, -_FLS_SCALE * v_c[1]]
                w0_c = [_FLS_SCALE * (v_c[0] * rsb[0][j] + v_c[2] * rsb[2][j])
                        * inv_nc for j in range(3)]

                def HcolD_c(a, c, Hcol_c=Hcol_c, w0_c=w0_c):
                    w = w0_c if a == 0 else w1
                    return sum(w[j] * Hcol_c(j, c) for j in range(3))
            else:
                zh_c = zh_c3
                HcolD_c = Hcol_c

            def Sig9c(c, d):
                if c < 6 and d < 6:
                    return Spp[c][d]
                if c >= 6 and d >= 6 and c == d:
                    return nl[c - 6]
                return 0.0

            Wc = [[sum(HcolD_c(a, c) * Sig9c(c, d) for c in range(9))
                   for d in range(9)] for a in range(dim)]
            Sc = [[None] * dim for _ in range(dim)]
            for a in range(dim):
                for b in range(a, dim):
                    s = sum(Wc[a][d] * HcolD_c(b, d) for d in range(9))
                    if a == b:
                        s = s + qd[a]
                    Sc[a][b] = s
                    Sc[b][a] = s
            Sic = inv_s(Sc)
            nuc = [zm[a] - zh_c[a] for a in range(dim)]
            Hc_all.append(HcolD_c)
            Sic_all.append(Sic)
            nuc_all.append(nuc)

        # --- exact JV over (L+M, M) ----------------------------------------
        ctr = _jv_lanes(costblks, L + M, M)                        # M x (1,B)

        # --- selection + slot bookkeeping ----------------------------------
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).astype(jnp.float32)
        cum_can_add = jnp.zeros_like(n_act)
        for m in range(M):
            r = ctr[m]                                             # (1,B)
            is_new = r >= float(L)
            r_clip = jnp.minimum(r, float(L - 1))
            oh = (iota_l == r_clip).astype(jnp.float32)            # (L,B)

            def pickl(q):
                return jnp.sum(q * oh, axis=0, keepdims=True)

            can_add = zmask[m] & is_new & (n_act + cum_can_add < float(L))
            do = zmask[m] & (can_add | ~is_new)
            new_slot = n_act + cum_can_add
            slot = jnp.where(is_new, new_slot, r_clip)
            cum_can_add = cum_can_add + jnp.where(can_add, 1.0, 0.0)

            def bank_sel(a, c):
                # slot-independent bank-H entries are (1,B) rows; the rest
                # are (L,B) and need the one-hot slot pick
                q = HcolD(a, c)
                return q if q.shape[0] == 1 else pickl(q)

            Hsel = [[jnp.where(is_new, Hc_all[m](a, c), bank_sel(a, c))
                     for c in range(9)] for a in range(dim)]
            Sisel = [[jnp.where(is_new, Sic_all[m][a][b], pickl(Si[a][b]))
                      for b in range(dim)] for a in range(dim)]
            nusel = [jnp.where(is_new, nuc_all[m][a], pickl(nu_all[m][a]))
                     for a in range(dim)]
            SinvH = [[sum(Sisel[a][b] * Hsel[b][c] for b in range(dim))
                      for c in range(9)] for a in range(dim)]

            base = m * 64
            for a in range(dim):
                for c in range(9):
                    out_ref[base + a * 9 + c:base + a * 9 + c + 1, :] = Hsel[a][c]
                    out_ref[base + 27 + a * 9 + c:base + 28 + a * 9 + c, :] = SinvH[a][c]
                out_ref[base + 54 + a:base + 55 + a, :] = nusel[a]
            for a in range(3):
                out_ref[base + 57 + a:base + 58 + a, :] = cands[m][a]
            out_ref[base + 60:base + 61, :] = ctr[m]
            out_ref[base + 61:base + 62, :] = jnp.where(do, 1.0, 0.0)
            out_ref[base + 62:base + 63, :] = jnp.where(can_add, 1.0, 0.0)
            out_ref[base + 63:base + 64, :] = slot

    return kernel


@functools.partial(jax.jit, static_argnames=("sensor",))
def da_lanes(
    pose6: jnp.ndarray,     # (B, 6)
    n_active: jnp.ndarray,  # (B,)
    active: jnp.ndarray,    # (B, L) bool
    lm_pos: jnp.ndarray,    # (B, L, 3)
    Sigma: jnp.ndarray,     # (B, D, D), D = 6 + 3L
    z: jnp.ndarray,         # (B, M, 3)
    z_mask: jnp.ndarray,    # (B, M) bool
    q_diag: jnp.ndarray,    # (dim,)
    lam, outlier, mh_dist,
    new_lm_cov: jnp.ndarray,  # (3,)
    sensor: str = "mbes",
    r_sb: jnp.ndarray = None,  # (3,3) fls<-base rotation (FLS only)
    t_sb: jnp.ndarray = None,  # (3,)  fls<-base translation (FLS only)
    A: jnp.ndarray = None,     # (B,6,6) motion Jacobian (identity-gated);
                               #   triggers the in-lanes Σ-slab predict
    valid: jnp.ndarray = None,  # (B,) odom-valid gate (kept for callers;
                               #   the R gate is folded into r_full)
    r_full: jnp.ndarray = None,  # (B,6,6) full motion-noise block R̃·valid
    band: jnp.ndarray = None,   # (B, 24, L) landmark block-diag band carry
                                #   maintained by the fleet update kernel
                                #   (ops.slam_kernels): band[b, a*8+d, l] =
                                #   Σ[b, 6+3l+a, 6+3l+a+d]. Replaces the
                                #   strided block-diag gather from the full
                                #   Σ (measured 3.6 ms/tick at L=256
                                #   fleet-128) with static slices.
    pose_rows: jnp.ndarray = None,  # (B, 8, D) pose rows Σ[0:6, :] — the
                                #   marginal fleet's covariance state
                                #   (r05). When given, ``Sigma`` may be
                                #   None: spp/spl slabs come from the rows
                                #   (requires ``band`` for sll). The DA
                                #   kernel itself is unchanged — it only
                                #   ever consumed these three slabs.
):
    """Whole DA stage (MBES or FLS) for a fleet -> per-measurement tensors.

    Returns (col_to_row (B,M) i32, H_sel (B,M,dim,9), SinvH (B,M,dim,9),
    nu_sel (B,M,dim), cand (B,M,3), do (B,M) bool, add (B,M) bool,
    slot (B,M) i32).

    With ``A``/``r_full`` given, Σ is interpreted as the RAW
    (pre-predict) covariance and the kernel applies the motion predict
    Σ' = A Σ Aᵀ + R̃ to the slabs it reads (``ekf_slam_core.cpp:41-121``);
    R̃ is a full per-mission 6×6 so composed multi-tick segment noise
    (event-compacted replay) rides the same path."""
    B, M = z.shape[0], z.shape[1]
    L = active.shape[1]
    dim = 2 if sensor == "fls" else 3
    f32 = jnp.float32
    Bp = max(128, ((B + 127) // 128) * 128)
    predict = A is not None

    def lanes(x, rows):
        out = jnp.zeros((rows, Bp), f32)
        return out.at[:, :B].set(x.astype(f32).T)

    pose_in_rows = 84 if predict else 8
    pose_in = jnp.zeros((pose_in_rows, Bp), f32)
    pose_in = pose_in.at[0:6, :B].set(pose6.astype(f32).T)
    pose_in = pose_in.at[6, :B].set(n_active.astype(f32))
    if predict:
        pose_in = pose_in.at[8:44, :B].set(
            A.astype(f32).reshape(B, 36).T)
        pose_in = pose_in.at[48:84, :B].set(
            r_full.astype(f32).reshape(B, 36).T)
    act_in = lanes(active, L)
    lm_in = lanes(lm_pos.transpose(0, 2, 1).reshape(B, 3 * L), 3 * L)
    if pose_rows is not None:
        if band is None:
            raise ValueError("pose_rows requires the band carry for sll")
        prow = pose_rows[:, 0:6, :]
        spp_in = lanes(prow[:, :, 0:6].reshape(B, 36), 36)
        spl = prow[:, :, 6:].reshape(B, 6, L, 3)
    else:
        spp_in = lanes(Sigma[:, 0:6, 0:6].reshape(B, 36), 36)
        # spl blocks [(i*3+k)*L + l] = Sigma[b, i, 6+3l+k]
        spl = Sigma[:, 0:6, 6:].reshape(B, 6, L, 3)
    spl_in = lanes(spl.transpose(0, 1, 3, 2).reshape(B, 18 * L), 18 * L)
    # sll blocks [(a*3+c)*L + l] = Sigma[b, 6+3l+a, 6+3l+c]
    if band is not None:
        # symmetric band -> all 9 components by static slices (no gather)
        sll_src = jnp.stack(
            [band[:, min(a, c) * 8 + abs(c - a), :L]
             for a in range(3) for c in range(3)], axis=1)      # (B, 9, L)
        sll_in = lanes(sll_src.reshape(B, 9 * L), 9 * L)
    else:
        sll = jnp.einsum(
            "blalc->blac", Sigma[:, 6:, 6:].reshape(B, L, 3, L, 3))
        sll_in = lanes(sll.transpose(0, 2, 3, 1).reshape(B, 9 * L), 9 * L)
    z_in = jnp.zeros((M * 8, Bp), f32)
    zmix = jnp.zeros((B, M, 8), f32)
    zmix = zmix.at[:, :, 0:3].set(z.astype(f32))
    zmix = zmix.at[:, :, 3].set(z_mask.astype(f32))
    z_in = z_in.at[:, :B].set(zmix.reshape(B, M * 8).T)
    par = jnp.zeros((1, 32), f32)
    par = par.at[0, 0:dim].set(q_diag.astype(f32)[:dim])
    par = par.at[0, 3].set(jnp.asarray(lam, f32))
    par = par.at[0, 4].set(jnp.asarray(outlier, f32))
    par = par.at[0, 5].set(jnp.asarray(mh_dist, f32))
    par = par.at[0, 6:9].set(new_lm_cov.astype(f32))
    if sensor == "fls":
        par = par.at[0, 9:18].set(r_sb.astype(f32).reshape(9))
        par = par.at[0, 18:21].set(t_sb.astype(f32))
    # every operation in the DA kernel is lane-local (missions in lanes,
    # componentwise rows), so large fleets grid over 128-lane mission
    # blocks — the whole-fleet block form blows VMEM past ~900 lanes at
    # L=64 (measured: B=1024 exceeds the 16 MB scoped limit by 444 KB)
    lane_grid = Bp // 128
    ins = [pose_in, act_in, lm_in, spp_in, spl_in, sll_in, z_in]
    out = pl.pallas_call(
        _make_da_kernel(L, M, fls=(sensor == "fls"), predict=predict),
        grid=(lane_grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((x.shape[0], 128), lambda g, x=x: (0, g))
           for x in ins],
        out_specs=pl.BlockSpec((M * 64, 128), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((M * 64, Bp), jnp.float32),
    )(par, *ins)

    o = out[:, :B].T.reshape(B, M, 64)
    H_sel = o[:, :, 0:9 * dim].reshape(B, M, dim, 9)
    SinvH = o[:, :, 27:27 + 9 * dim].reshape(B, M, dim, 9)
    nu_sel = o[:, :, 54:54 + dim]
    cand = o[:, :, 57:60]
    ctr = jnp.round(o[:, :, 60]).astype(jnp.int32)
    do = o[:, :, 61] > 0.5
    add = o[:, :, 62] > 0.5
    slot = jnp.round(o[:, :, 63]).astype(jnp.int32)
    return ctr, H_sel, SinvH, nu_sel, cand, do, add, slot


@functools.partial(jax.jit, static_argnames=())
def hungarian_lanes(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact JV assignment for a fleet: cost (B, R, C) -> col_to_row (B, C).

    Same optimum as ``assignment.hungarian`` per mission; one Mosaic
    program for the whole fleet instead of B vmapped while_loops."""
    B, R, C = cost.shape
    f32 = jnp.float32
    Bp = max(128, ((B + 127) // 128) * 128)
    cost_l = jnp.full((C * R, Bp), _INF, f32)
    cost_l = cost_l.at[:, :B].set(
        jnp.moveaxis(cost.astype(f32), 0, 2).transpose(1, 0, 2).reshape(C * R, B)
    )
    out = pl.pallas_call(
        _make_jv_kernel(R, C),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max(C, 8), Bp), f32),
    )(cost_l)
    return jnp.round(out[:C, :B]).astype(jnp.int32).T
