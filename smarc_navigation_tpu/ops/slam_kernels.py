"""Pallas TPU kernel for the EKF-SLAM sequential measurement update.

The SLAM fleet's throughput is capped by the M-measurement sequential
update: expressed in jax, each of the 8 update iterations compiles to ~25
small XLA ops inside a scan-inside-vmap, and fixed per-op overhead (~tens
of µs regardless of operand size — measured by ablation, see CLAUDE.md)
dominates everything: Σ traffic, assignment, layouts all ablate to noise.

This kernel runs the WHOLE update loop for one mission inside VMEM: Σ
(D×D ≤ 198² f32 = 157 KB) is loaded once, the M iterations run as an
in-kernel ``fori_loop`` whose body is a handful of small MXU matmuls, and
Σ+μ are written back once. vmap adds the mission grid dimension.

Semantics identical to models.ekf_slam's dense full-covariance path:
activation (additive diag block on the zero-rows invariant) before the
update, batch-stage H/S⁻¹/ν, measurement-order sequence, final symmetrize.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_DIM = 8    # measurement dim (2/3) padded to the sublane tile
_PAD9 = 16      # the 9-wide (pose+lm) index set padded to 16 sublanes
_PRED_ROWS = 24  # factor rows reserved for the in-kernel motion predict
#                  (3x 8-row blocks: B·V3, V3ᵀ·Bᵀ, diag-R)

# General (value x value) matmuls need the 6-pass f32 emulation — bf16 MXU
# passes corrupt covariance updates (CLAUDE.md). One-hot SELECTION matmuls
# do not: with the selector exact in bf16 (entries 0/1) and the value
# operand split hi+mid+lo (== x exactly), three DEFAULT passes accumulate
# the exact f32 row — half the MXU work of HIGHEST. (Mosaic has no HIGH.)
_DOTH = dict(preferred_element_type=jnp.float32,
             precision=jax.lax.Precision.HIGHEST)
_DOTD = dict(preferred_element_type=jnp.float32,
             precision=jax.lax.Precision.DEFAULT)


def _split3(x):
    """hi+mid+lo bf16 split with hi+mid+lo == x exactly (f32 24-bit
    mantissa = 3 x bf16 8-bit mantissas)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_dot(E_bf16, parts3, dims):
    """Exact one-hot x f32 product as three DEFAULT-precision dots."""
    hi, mid, lo = parts3
    return (
        jax.lax.dot_general(E_bf16, hi, dimension_numbers=dims, **_DOTD)
        + jax.lax.dot_general(E_bf16, mid, dimension_numbers=dims, **_DOTD)
        + jax.lax.dot_general(E_bf16, lo, dimension_numbers=dims, **_DOTD)
    )


def _update_kernel(
    lmix_ref,    # (M,) int32 SMEM: landmark state offset per update
    do_ref,      # (M,) int32 SMEM
    add_ref,     # (M,) int32 SMEM
    sigma_in,    # (D, D) VMEM
    mu_in,       # (8, D) VMEM (row 0 = mu)
    hsel_ref,    # (M*_PAD_DIM, _PAD9) VMEM
    gsel_ref,    # (M*_PAD_DIM, _PAD9) VMEM: (S⁻¹H)_j
    cov_ref,     # (_PAD9, 128) VMEM: col 0 rows 4..6 = sqrt(new_lm_cov),
                 #                    col 1 rows 6..8 = new_lm_cov
    nu_ref,      # (M*_PAD_DIM, 128) VMEM: col 0 rows j*8+d = ν_j[d]
    sigma_ref,   # (D, D) VMEM out
    mu_ref,      # (8, D) VMEM out
    eall,        # (M*_PAD9, D) VMEM scratch: all row selectors (bf16 would
                 #   do; kept f32 for the prologue writes)
    base,        # (M*_PAD9, D) VMEM scratch: E_all @ Σ0
    ubuf,        # (M*_PAD_DIM, D) VMEM scratch: gains rows 0..2 +
                 #   activation factors rows 4..6 per measurement
    vbuf,        # (M*_PAD_DIM, D) VMEM scratch: (HΣ) rows + act factors
):
    """Low-rank sequential update, v2: NOTHING touches Σ or μ inside the
    measurement loop.

    * Landmark **activations** ride in the U/V factor buffers as rank-3
      pairs (u = −√cov·E_lm, v = +√cov·E_lm) sharing the measurement's
      8-row block with its gain rows (gains 0..2, acts 4..6 — one combined
      write per buffer per iteration). The measurement's OWN activation is
      applied directly to its rows9 as a masked diag add (no matmul);
      later measurements pick it up through the running A-chain
      correction, exactly like the in-place sequence (correct even for
      repeated slots, though production's JV is one-to-one).
    * With Σ0 constant, all M row extractions collapse to ONE MXU matmul
      ``base = E_all @ Σ0`` before the loop (the per-iteration (16,D)×(D,D)
      row-read was the dominant in-loop op), run as an exact one-hot
      selection at DEFAULT precision (3 bf16 passes, bit-exact).
    * δμ = Σⱼ νⱼᵀKⱼᵀ is one end-of-loop matvec against the U buffer
      (batch-stage gains don't depend on μ), with a single angle wrap —
      wrap(wrap(a)+b) == wrap(a+b), so one wrap at the end is the same map.

    Algebraically identical to the dense in-place sequence (additions
    commute; ``upd_lowrank`` proves the same algebra in XLA)."""
    D = sigma_in.shape[1]
    M = lmix_ref.shape[0]

    row16 = jax.lax.broadcasted_iota(jnp.int32, (_PAD9, D), 0)
    colD = jax.lax.broadcasted_iota(jnp.int32, (_PAD9, D), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_DIM, D), 0)
    colD8 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_DIM, D), 1)
    sq8 = cov_ref[0:_PAD_DIM, 0:1]                             # (8,1) √cov
    cov16 = cov_ref[:, 1:2]                                    # (16,1) cov

    # --- static prologue: row selectors per measurement + zeroed factors --
    for m in range(M):
        lm = lmix_ref[m]
        sel = jnp.where(row16 < 6, row16, lm + (row16 - 6))
        E = jnp.where((colD == sel) & (row16 < 9), 1.0, 0.0)    # (16,D)
        eall[m * _PAD9:(m + 1) * _PAD9, :] = E
    ubuf[:, :] = jnp.zeros_like(ubuf)
    vbuf[:, :] = jnp.zeros_like(vbuf)

    sig3 = _split3(sigma_in[:, :])
    base[:, :] = _onehot_dot(
        eall[:, :].astype(jnp.bfloat16), sig3, (((1,), (0,)), ((), ())))

    def body(j, _):
        do = do_ref[j] != 0
        add = add_ref[j] != 0
        lm = lmix_ref[j]

        @pl.when(do)
        def _():
            Ej = eall[pl.ds(j * _PAD9, _PAD9), :]               # (16,D)
            # rows of the CURRENT Σ = Σ0 rows − accumulated U/V corrections
            A = jax.lax.dot_general(
                Ej, ubuf[:, :], dimension_numbers=(((1,), (1,)), ((), ())),
                **_DOTH)                                        # (16, M*8)
            rows9 = base[pl.ds(j * _PAD9, _PAD9), :] - jnp.dot(
                A, vbuf[:, :], **_DOTH)
            # own activation: += cov diag block (masked add, no matmul)
            act_own = (row16 >= 6) & (row16 < 9) & (colD == lm + (row16 - 6))
            rows9 = rows9 + jnp.where(act_own & add, cov16, 0.0)

            Hj = hsel_ref[pl.ds(j * _PAD_DIM, _PAD_DIM), :]     # (8,16)
            Gj = gsel_ref[pl.ds(j * _PAD_DIM, _PAD_DIM), :]     # (8,16)
            Kt = jnp.dot(Gj, rows9, **_DOTH)                    # (8,D)
            Vt = jnp.dot(Hj, rows9, **_DOTH)                    # (8,D)

            # combined write: gain rows 0..2 (rows 3..7 of Kt/Vt are zero:
            # H/G are zero-padded past dim) + activation factor rows 4..6
            act_rows = (row8 >= 4) & (row8 < 7)
            Ea = jnp.where(
                act_rows & (colD8 == lm + (row8 - 4)) & add, 1.0, 0.0) * sq8
            ubuf[pl.ds(j * _PAD_DIM, _PAD_DIM), :] = Kt - Ea
            vbuf[pl.ds(j * _PAD_DIM, _PAD_DIM), :] = Vt + Ea

        return 0

    jax.lax.fori_loop(0, M, body, 0)

    # δμ: one matvec over the gain rows (ν is zero on activation/pad rows)
    delta = jax.lax.dot_general(
        nu_ref[:, 0:1], ubuf[:, :], dimension_numbers=(((0,), (0,)), ((), ())),
        **_DOTH)                                                # (1,D)
    angle_mask = (colD8 >= 3) & (colD8 < 6) & (row8 == 0)
    mu_new = mu_in[:, :] + jnp.where(row8 == 0, delta, 0.0)
    wrapped = jnp.mod(mu_new + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    mu_ref[:, :] = jnp.where(angle_mask, wrapped, mu_new)

    # one rank-(M·8) downdate (gains + activations), one final symmetrize
    s = sigma_in[:, :] - jax.lax.dot_general(
        ubuf[:, :], vbuf[:, :], dimension_numbers=(((0,), (0,)), ((), ())),
        **_DOTH)
    sigma_ref[:, :] = 0.5 * (s + s.T)


@jax.jit
def sequential_update(
    Sigma: jnp.ndarray,    # (D, D)
    mu: jnp.ndarray,       # (D,)
    H_sel: jnp.ndarray,    # (M, dim, 9) batch-stage Jacobians (selected row)
    SinvH: jnp.ndarray,    # (M, dim, 9) S⁻¹H per update
    nu_sel: jnp.ndarray,   # (M, dim)
    lm_ix: jnp.ndarray,    # (M,) int32 state offsets (6 + 3·slot)
    do: jnp.ndarray,       # (M,) bool
    add: jnp.ndarray,      # (M,) bool
    new_lm_cov: jnp.ndarray,  # (3,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run all M sequential updates in one kernel -> (Sigma, mu).

    ``add`` entries must imply ``do`` (they do in the DA commit paths: an
    add is a gated, capacity-checked new-landmark update)."""
    D = Sigma.shape[0]
    M, dim = nu_sel.shape
    f32 = jnp.float32

    def pad(x):  # (M, dim, 9) -> (M*_PAD_DIM, _PAD9)
        out = jnp.zeros((M, _PAD_DIM, _PAD9), f32)
        out = out.at[:, :dim, :9].set(x.astype(f32))
        return out.reshape(M * _PAD_DIM, _PAD9)

    nu_col = jnp.zeros((M, _PAD_DIM, 128), f32)
    nu_col = nu_col.at[:, :dim, 0].set(nu_sel.astype(f32))
    nu_col = nu_col.reshape(M * _PAD_DIM, 128)
    cov = jnp.zeros((_PAD9, 128), f32)
    cov = cov.at[4:7, 0].set(jnp.sqrt(new_lm_cov.astype(f32)))
    cov = cov.at[6:9, 1].set(new_lm_cov.astype(f32))
    mu_pad = jnp.zeros((8, D), f32).at[0, :].set(mu.astype(f32))

    sig_o, mu_o = pl.pallas_call(
        _update_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((M * _PAD9, D), f32),
                pltpu.VMEM((M * _PAD9, D), f32),
                pltpu.VMEM((M * _PAD_DIM, D), f32),
                pltpu.VMEM((M * _PAD_DIM, D), f32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((8, D), f32),
        ],
    )(
        lm_ix.astype(jnp.int32),
        do.astype(jnp.int32),
        add.astype(jnp.int32),
        Sigma.astype(f32),
        mu_pad,
        pad(H_sel),
        pad(SinvH),
        cov,
        nu_col,
    )
    return sig_o, mu_o[0, :]


# ===========================================================================
# fleet variant: MB missions per grid step (explicit instruction parallelism)
# ===========================================================================
#
# vmapping ``sequential_update`` gives one mission per grid step: each step
# is ONE serial dependency chain of ~34 small MXU/VPU ops, so the whole
# call is bound by per-instruction latency (measured 759 us at fleet-128).
# Processing MB=4 independent missions inside one grid step gives the
# scheduler 4 independent chains to interleave — same math, same VMEM
# residency rules (4 Sigmas <= 630 KB at L=64).


def _make_update_kernel_fleet(MB: int, M: int, predict: bool = False,
                              slabs: bool = False, tiled_ep: bool = False,
                              streamed: bool = False):
    def kernel(pk_all,                         # (G, MB*M) int32 SMEM packed
               #   prefetch: lm_ix | do<<14 | add<<15 — ONE flat array
               #   because each prefetched SMEM operand's minor dims are
               #   padded to (8,128) tiles: three (G,MB,M) operands cost
               #   3*G*MB*512 B and blow the 1 MB SMEM at B=1024 (measured)
               sigma_in,                       # (MB, D, D)
               mu_in,                          # (MB, 8, D)
               ghsel_ref,                      # (MB, M*16, 16): per meas.
                                               #   rows 0..7 G, 8..15 H
               cov_ref,                        # (16, 128)
               nu_ref,                         # (MB, M*8, 128)
               *rest):                         # [a8_ref,] [band_in,] outs,
                                               #   scratch
        rest = list(rest)
        a8_ref = rest.pop(0) if predict else None
        band_in_ref = rest.pop(0) if slabs else None  # (MB, 24, L)
        if streamed:
            # phase 1 of the two-call streamed variant: Σ is read-only
            # (factors + μ + band come out; the downdate runs in the
            # separate tile-streamed phase-2 kernel) — no Σ output stream
            # and no (D,D) temporaries, so the Σ INPUT stream
            # double-buffers even at D >= 512
            sigma_ref = None
            mu_ref = rest.pop(0)
            ubuf = rest.pop(0)                        # (MB, K, D) out
            vbuf = rest.pop(0)                        # (MB, K, D) out
            band_ref = rest.pop(0) if slabs else None
            eall, base = rest
        else:
            sigma_ref, mu_ref = rest.pop(0), rest.pop(0)
            band_ref = rest.pop(0) if slabs else None  # (MB, 24, L) out
            eall, base, ubuf, vbuf = rest
        g = pl.program_id(0)

        def lmix_of(b, m):
            return pk_all[g, b * M + m] & 0x3FFF

        def do_of(b, m):
            return (pk_all[g, b * M + m] >> 14) & 1

        def add_of(b, m):
            return pk_all[g, b * M + m] >> 15

        D = sigma_in.shape[2]
        row16 = jax.lax.broadcasted_iota(jnp.int32, (_PAD9, D), 0)
        colD = jax.lax.broadcasted_iota(jnp.int32, (_PAD9, D), 1)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_DIM, D), 0)
        colD8 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_DIM, D), 1)
        cv8 = cov_ref[0:_PAD_DIM, 0:1]       # rows 4..6 = new_lm_cov
        cov16 = cov_ref[:, 1:2]

        POFF = _PRED_ROWS if predict else 0

        for b in range(MB):
            for m in range(M):
                lm = lmix_of(b, m)
                sel = jnp.where(row16 < 6, row16, lm + (row16 - 6))
                E = jnp.where((colD == sel) & (row16 < 9), 1.0, 0.0)
                eall[b, m * _PAD9:(m + 1) * _PAD9, :] = E
        ubuf[:, :, :] = jnp.zeros_like(ubuf)
        vbuf[:, :, :] = jnp.zeros_like(vbuf)

        if predict:
            # in-kernel motion predict AS FACTOR ROWS: Ã = I + N with
            # N = B·C rank-3 (B = (Ã−I) cols 3:6, C = rows-3:6 selector),
            # so Σ' = Σ + B·T + TᵀBᵀ + B·S33·Bᵀ + R̃·valid (T = Σ rows
            # 3:6, S33 = T cols 3:6). That is a rank-≤12 symmetric update
            # riding the SAME U/V buffers as the measurement downdates —
            # rows [0:24): block0 (−Bt, V3), block1 (−V3, Bt),
            # block2 (−r·E_diag, E_diag), with V3 = T + ½·S33·Bt. Every
            # later consumer (A-chain row corrections, final downdate)
            # picks the predict up automatically; nothing materializes a
            # (D,D) intermediate, and an identity Ã (invalid odom) gives
            # all-zero u or v rows -> bit-exact no-op. XLA-side slab
            # writes of the predicted Σ measured 430+ us/tick of full-Σ
            # copies on the fleet carry; the earlier in-kernel (D,D)
            # spread version still cost ~135 us/call.
            i8 = jnp.where(row8 == colD8, 1.0, 0.0)          # (8,D) one-hot
            r88 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_DIM, _PAD_DIM), 0)
            c88 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_DIM, _PAD_DIM), 1)
            i88 = jnp.where(r88 == c88, 1.0, 0.0)
            for b in range(MB):
                a8b = a8_ref[b][:, 0:_PAD_DIM]               # (8,8)
                r88v = a8_ref[b][:, _PAD_DIM:2 * _PAD_DIM]   # (8,8) R̃ block
                n8 = a8b - i88                               # Ã − I
                n8 = jnp.where((c88 >= 3) & (c88 < 6), n8, 0.0)  # keep B cols
                # Bt rows 3:6 = Bᵀ (row 3+c holds B[:,3+c] of Ã−I)
                bt8 = jax.lax.dot_general(
                    n8, i8, dimension_numbers=(((0,), (0,)), ((), ())),
                    **_DOTH)                                 # (8,D)
                t8 = sigma_in[b][0:8, :]                     # Σ rows 0:8
                # rows 3:6 of Σ shifted onto themselves: T lives at 3:6
                tmask = (row8 >= 3) & (row8 < 6)
                t8 = jnp.where(tmask, t8, 0.0)
                # S33 in an (8,8) frame: S33[c,c'] at rows/cols 3:6
                s33 = jax.lax.dot_general(
                    t8, i8, dimension_numbers=(((1,), (1,)), ((), ())),
                    **_DOTH)                                 # (8,8)
                v3 = t8 + 0.5 * jnp.dot(s33, bt8, **_DOTH)   # (8,D)
                ubuf[b, 0:_PAD_DIM, :] = -bt8
                vbuf[b, 0:_PAD_DIM, :] = v3
                ubuf[b, _PAD_DIM:2 * _PAD_DIM, :] = -v3
                vbuf[b, _PAD_DIM:2 * _PAD_DIM, :] = bt8
                # noise factor rows: u = −E_unit, v = the rows of the FULL
                # R̃ block (a8 cols 8:16; validity gated upstream), so the
                # pair contributes +Σᵣ eᵣ⊗R̃[r,:] = +R̃ exactly — a full
                # 6×6 R̃ (needed by the event-compacted replay, whose
                # composed segment noise Σₜ A..R..Aᵀ is not diagonal) at
                # the same rank-6 cost as the old diagonal column
                ediag = jnp.where((row8 == colD8) & (row8 < 6), 1.0, 0.0)
                r8d = jax.lax.dot_general(
                    r88v, i8, dimension_numbers=(((1,), (0,)), ((), ())),
                    **_DOTH)                                 # (8,D)
                ubuf[b, 2 * _PAD_DIM:3 * _PAD_DIM, :] = -ediag
                vbuf[b, 2 * _PAD_DIM:3 * _PAD_DIM, :] = r8d

        for b in range(MB):
            if tiled_ep or streamed:
                # contraction-tiled base: split3 over 128-row slices of Σ
                # keeps the bf16 hi/mid/lo temporaries at (128, D) instead
                # of three (D, D) planes — the VMEM this frees is what lets
                # the Σ input stream double-buffer at D >= 512
                eb = eall[b].astype(jnp.bfloat16)
                acc = jnp.zeros((M * _PAD9, D), jnp.float32)
                for r0 in range(0, D, 128):
                    r1 = min(r0 + 128, D)
                    acc = acc + _onehot_dot(
                        eb[:, r0:r1], _split3(sigma_in[b][r0:r1, :]),
                        (((1,), (0,)), ((), ())))
                base[b, :, :] = acc
            else:
                sig3 = _split3(sigma_in[b])
                base[b, :, :] = _onehot_dot(
                    eall[b].astype(jnp.bfloat16), sig3,
                    (((1,), (0,)), ((), ())))

        # STATIC unroll over measurements: j static makes the A-chain
        # TRIANGULAR (iteration j only contracts the j·8 factor rows that
        # exist yet — j=0 skips the correction entirely), and the stacked
        # [G;H] operand computes Kt and Vt in one matmul
        for j in range(M):
            for b in range(MB):
                do = do_of(b, j) != 0
                add = add_of(b, j) != 0
                lm = lmix_of(b, j)

                @pl.when(do)
                def _(b=b, j=j, lm=lm, add=add):
                    rows9 = base[b, j * _PAD9:(j + 1) * _PAD9, :]
                    if POFF + j > 0:
                        Ej = eall[b, j * _PAD9:(j + 1) * _PAD9, :]
                        A = jax.lax.dot_general(
                            Ej, ubuf[b, 0:POFF + j * _PAD_DIM, :],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            **_DOTH)                     # (16, POFF+j*8)
                        rows9 = rows9 - jnp.dot(
                            A, vbuf[b, 0:POFF + j * _PAD_DIM, :], **_DOTH)
                    act_own = ((row16 >= 6) & (row16 < 9)
                               & (colD == lm + (row16 - 6)))
                    rows9 = rows9 + jnp.where(act_own & add, cov16, 0.0)
                    GH = ghsel_ref[b, _PAD9 * j:_PAD9 * (j + 1), :]
                    KV = jnp.dot(GH, rows9, **_DOTH)     # (16,D): Kt;Vt
                    # asymmetric activation factors: u row = -E (unit
                    # one-hot), v row = +cov.E — each factor ROW is an
                    # independent rank-1 outer product, so Sigma still
                    # gets +cov.E'E, and the unit u row makes the cand
                    # mu-init in the end matvec exact (cand * 1)
                    act_rows = (row8 >= 4) & (row8 < 7)
                    E1 = jnp.where(
                        act_rows & (colD8 == lm + (row8 - 4)) & add,
                        1.0, 0.0)
                    o = POFF + j * _PAD_DIM
                    ubuf[b, o:o + _PAD_DIM, :] = KV[0:_PAD_DIM] - E1
                    vbuf[b, o:o + _PAD_DIM, :] = (
                        KV[_PAD_DIM:2 * _PAD_DIM] + E1 * cv8)

        angle_mask = (colD8 >= 3) & (colD8 < 6) & (row8 == 0)
        if slabs:
            # landmark block-diag BAND carry: band[a*8+d, l] tracks
            # Σ[6+3l+a, 6+3l+a+d] (d = 0..2; symmetric lower half derived
            # by the consumer). Maintained as band_in − blockdiag of the
            # SYMMETRIZED rank downdate ½(UVᵀ+VUᵀ): per diagonal offset d,
            # q_d[i] = Σ_r ½(U[r,i]V[r,i+d] + V[r,i]U[r,i+d]) via lane
            # rolls + a sublane reduce, then a one-hot stride-3 lane
            # decimation on the MXU (exact: one product per output). The
            # predict factor rows are identically zero on landmark lanes,
            # so the band needs no predict transform (Σ_ll is untouched by
            # the motion predict, ``ekf_slam_core.cpp:110-118``). This
            # spares the DA stage its (B,L,3,L,3) block-diag gather from
            # the full Σ — measured 3.6 ms/tick at L=256 fleet-128.
            Lsz = band_in_ref.shape[2]
            rowDL = jax.lax.broadcasted_iota(jnp.int32, (D, Lsz), 0)
            colL = jax.lax.broadcasted_iota(jnp.int32, (D, Lsz), 1)
            dsel = [jnp.where(rowDL == 6 + 3 * colL + a, 1.0, 0.0)
                    for a in range(3)]                       # (D, L) one-hot
        for b in range(MB):
            delta = jax.lax.dot_general(
                nu_ref[b][:, 0:1], ubuf[b, POFF:, :],
                dimension_numbers=(((0,), (0,)), ((), ())), **_DOTH)
            mu_new = mu_in[b] + jnp.where(row8 == 0, delta, 0.0)
            wrapped = jnp.mod(mu_new + jnp.pi, 2.0 * jnp.pi) - jnp.pi
            mu_ref[b, :, :] = jnp.where(angle_mask, wrapped, mu_new)
            if streamed:
                pass                   # Σ downdate runs in phase 2
            elif tiled_ep:
                # row-tiled symmetric downdate: Σ − ½(UᵀV + VᵀU) written
                # tile-by-tile. No (D, D) stack temporaries and no (D, D)
                # transpose relayout — cutting those is what re-enables the
                # double-buffered Σ input stream at D >= 512 (ROOFLINE: the
                # single-buffered Σ DMA serialized ~12 µs of the ~30 µs
                # grid step). The result is exactly symmetric without a
                # final symmetrize: A1[i,j] = (UᵀV)[i,j] and A2[i,j] =
                # (VᵀU)[i,j] satisfy A1[i,j] == A2[j,i] BITWISE (same
                # products, same contraction order), and a single f32 add
                # is commutative — so out[i,j] == out[j,i] exactly. (The
                # dense epilogue's 0.5(s+sᵀ) additionally averaged any
                # input asymmetry; kernel outputs are exactly symmetric
                # either way, so the invariant is preserved tick-to-tick.)
                for r0 in range(0, D, 128):
                    r1 = min(r0 + 128, D)
                    A1 = jax.lax.dot_general(
                        ubuf[b][:, r0:r1], vbuf[b],
                        dimension_numbers=(((0,), (0,)), ((), ())), **_DOTH)
                    A2 = jax.lax.dot_general(
                        vbuf[b][:, r0:r1], ubuf[b],
                        dimension_numbers=(((0,), (0,)), ((), ())), **_DOTH)
                    sigma_ref[b, r0:r1, :] = (
                        sigma_in[b][r0:r1, :] - 0.5 * (A1 + A2))
            else:
                s = sigma_in[b] - jax.lax.dot_general(
                    ubuf[b], vbuf[b],
                    dimension_numbers=(((0,), (0,)), ((), ())), **_DOTH)
                sigma_ref[b, :, :] = 0.5 * (s + s.T)
            if slabs:
                ub, vb = ubuf[b], vbuf[b]
                qs = []
                for d in range(3):
                    # roll by (D - d) == roll by -d: vr[r, i] = v[r, i + d]
                    # (pltpu.roll wants non-negative shifts; wrapped lanes
                    # only land at band positions no consumer reads)
                    vr = pltpu.roll(vb, D - d, 1) if d else vb
                    ur = pltpu.roll(ub, D - d, 1) if d else ub
                    qs.append(jnp.sum(ub * vr + vb * ur, axis=0,
                                      keepdims=True))        # (1, D)
                qstack = jnp.concatenate(
                    qs + [jnp.zeros_like(qs[0])] * 5, axis=0)  # (8, D)
                for a in range(3):
                    bd = jnp.dot(qstack, dsel[a], **_DOTH)     # (8, L)
                    band_ref[b, a * 8:(a + 1) * 8, :] = (
                        band_in_ref[b, a * 8:(a + 1) * 8, :] - 0.5 * bd)

    return kernel


def _make_downdate_kernel(MB: int):
    """Phase 2 of the streamed update: Σ' = Σ − ½(UᵀV + VᵀU), written in
    128-row tiles (no (D,D) temporaries, exactly symmetric by construction
    — same algebra as the tiled epilogue, see that comment). Both Σ
    streams double-buffer; the kernel is HBM-bandwidth-bound and the two
    HIGHEST-precision tile matmuls hide under the DMA."""

    def kernel(sigma_in, u_ref, v_ref, sigma_ref):
        D = sigma_in.shape[2]
        for b in range(MB):
            for r0 in range(0, D, 128):
                r1 = min(r0 + 128, D)
                A1 = jax.lax.dot_general(
                    u_ref[b][:, r0:r1], v_ref[b],
                    dimension_numbers=(((0,), (0,)), ((), ())), **_DOTH)
                A2 = jax.lax.dot_general(
                    v_ref[b][:, r0:r1], u_ref[b],
                    dimension_numbers=(((0,), (0,)), ((), ())), **_DOTH)
                sigma_ref[b, r0:r1, :] = (
                    sigma_in[b][r0:r1, :] - 0.5 * (A1 + A2))

    return kernel


@functools.partial(jax.jit, static_argnames=("tiled_ep", "streamed"))
def sequential_update_fleet(
    Sigma: jnp.ndarray,    # (B, D, D)
    mu: jnp.ndarray,       # (B, D)
    H_sel: jnp.ndarray,    # (B, M, dim, 9)
    SinvH: jnp.ndarray,    # (B, M, dim, 9)
    nu_sel: jnp.ndarray,   # (B, M, dim)
    lm_ix: jnp.ndarray,    # (B, M) int32
    do: jnp.ndarray,       # (B, M) bool
    add: jnp.ndarray,      # (B, M) bool
    new_lm_cov: jnp.ndarray,  # (3,)
    cand: jnp.ndarray = None,  # (B, M, 3) new-landmark positions (optional)
    a8: jnp.ndarray = None,    # (B, 8, 16): cols 0:8 = Ã8 (motion Jacobian
                               #   blockdiag(A6, I2)), cols 8:16 = the full
                               #   R̃ 6×6 noise block (validity-gated; rows
                               #   0:6 × cols 8:14 live)
    band: jnp.ndarray = None,  # (B, 24, L) landmark block-diag band carry
                               #   (see the kernel's slabs note); when given
                               #   the updated band is returned as a third
                               #   output
    tiled_ep: bool = False,    # row-tiled prologue/epilogue (D >= 512 only;
                               #   see the VMEM note below)
    mb: int | None = None,     # mission-block override (None = auto ladder);
                               #   values > 8 raise the Mosaic scoped-VMEM
                               #   limit (the 16 MB default is a soft cap —
                               #   v5e VMEM is far larger; the streamed
                               #   variant already rides 24 MB)
    streamed: bool | None = None,  # two-call variant (D >= 512): phase 1
                               #   emits U/V factors + μ + band with a
                               #   double-buffered read-only Σ stream;
                               #   phase 2 streams the symmetric downdate
                               #   in 128-row tiles. OPT-IN only (None =
                               #   off): measured SLOWER than the dense
                               #   epilogue at D=774 (866 vs 796 µs,
                               #   docs/ROOFLINE.md r04) — kept as a
                               #   tested building block for larger-VMEM
                               #   parts / multi-core Σ-tile splits.
) -> tuple:
    """Fleet-batched sequential update: same math as ``sequential_update``
    per mission, MB missions per grid step for instruction parallelism.
    Returns ``(Sigma, mu)`` — or ``(Sigma, mu, band)`` when ``band`` is
    given.

    When ``cand`` is given, added landmarks' μ rows are initialised
    in-kernel: the activation factor rows of ubuf are −E_lm (unit), so
    loading ν's activation rows with −candᵢ makes the end-of-loop δμ
    matvec contribute +candᵢ exactly on the landmark columns (the
    inactive-slot μ rows are zero by invariant, so add == set).

    When ``a8`` is given, the motion predict's Σ transform
    (Σ' = Ã Σ Ãᵀ + R̃, ``ekf_slam_core.cpp:41-121``) runs in-kernel before
    the update loop, so no XLA op ever writes the full Σ (the slab
    dynamic-update-slices cost 400+ us/tick of whole-Σ copies)."""
    B, D = Sigma.shape[0], Sigma.shape[1]
    M, dim = nu_sel.shape[1], nu_sel.shape[2]
    f32 = jnp.float32
    # VMEM-aware mission block: grid in/out blocks are DOUBLE-buffered
    # (2x Σin + 2x Σout + small ins/outs) + single-buffered scratch +
    # ~2 (D,D) stack temporaries (the final downdate's s and its
    # transpose — measured: MB=2 at D=774 blows the 16 MB scoped limit by
    # 10 MB even with single-buffered Σ streams), all within ~16 MB VMEM
    # (L=64 -> MB=8; L=256 -> MB=1).
    #
    # Row-TILED variant (tiled_ep; D >= 512 shapes): the prologue/epilogue
    # (D,D) stack temporaries are cut to (128, D) tiles, which frees enough
    # VMEM to DOUBLE-buffer the Σ input stream. Measured r04 at D=774
    # B=32: 843 µs/fleet-tick vs 796 µs for the dense epilogue — the
    # symmetric-by-construction tiled downdate costs 2x the epilogue MXU
    # passes (A1 and A2) and the Σ-in overlap doesn't pay for it, so the
    # dense epilogue stays the default. The tiled path is kept (tested)
    # as the building block for a row-STREAMED grid variant: whole-plane
    # Σ windows are why MB=2 at D=774 still OOMs (18.51M vs 16M scoped
    # VMEM even with these temporaries cut and both streams at 1 buffer).
    # streamed stays OFF by default: measured r04 at D=774 B=32 it LOSES to
    # the dense epilogue (866 us/fleet-tick MB=1, 1007 us MB=2-interleaved
    # vs 796 us dense) — the grid step is serial A-chain COMPUTE, not Σ
    # DMA, phase 2 re-pays a full Σ read+write, and Mosaic extracts no
    # cross-mission ILP from the MB=2 interleave. Kept as a tested option
    # (test_fleet_kernel_streamed_two_phase_large_state): it is the shape
    # a >16M-VMEM part or a multi-core Σ-tile split would want.
    if streamed is None:
        streamed = False
    streamed = streamed and D >= 512
    if streamed:
        tiled_ep = False
    tiled_ep = tiled_ep and D >= 512
    poff_k = (_PRED_ROWS if a8 is not None else 0) + M * _PAD_DIM
    if streamed:
        # phase 1 runs MB=2 with SINGLE-buffered Σ-in and U/V streams when
        # it fits: interleaving two missions' serial A-chains is the point
        # of the split (the compiler's scoped accounting charged 23.53M for
        # MB=2 with double-buffered streams at D=774 — single-buffering
        # brings it under the 16M limit)
        per_mission = 4 * (
            1 * D * D + 2 * 2 * 8 * D                   # Σ in x1, μ
            + 2 * (M * _PAD9 * _PAD9 + M * _PAD_DIM * 128)
            + 2 * poff_k * D                            # U/V outs x1
            + 2 * M * _PAD9 * D                         # eall+base scratch
            + 6 * 128 * D)                              # loop/tile temps
    elif tiled_ep:
        per_mission = 4 * (
            3 * D * D + 2 * 2 * 8 * D                   # Σ in x2 + out x1, μ
            + 2 * (M * _PAD9 * _PAD9 + M * _PAD_DIM * 128)
            + 2 * M * _PAD9 * D
            + 2 * (_PRED_ROWS + M * _PAD_DIM) * D       # scratch
            + 6 * 128 * D)                              # tile temporaries
    else:
        per_mission = 4 * (
            2 * 2 * D * D + 2 * 2 * 8 * D               # Σ/μ in+out
            + 2 * (M * _PAD9 * _PAD9 + M * _PAD_DIM * 128)  # gh/nu in, x2
            + 2 * M * _PAD9 * D
            + 2 * (_PRED_ROWS + M * _PAD_DIM) * D       # scratch
            + 2 * D * D)                                # stack temporaries
    MB = 1
    if mb is not None:
        if B % mb:
            raise ValueError(f"mb={mb} must divide B={B}")
        MB = mb
    else:
        # deeper-than-8 interleaves measured r05 at L=64 B=128: MB=16 wins
        # (the grid step is MXU-latency-bound — 16 independent serial
        # A-chains hide it better than 8); MB=32 regresses (VMEM block
        # sizes crowd out double-buffering). >8 rides a raised scoped-VMEM
        # limit (see cparams below).
        for cand_mb in (16, 8, 4, 2):
            budget = (44 if cand_mb > 8 else 14) * 2 ** 20
            if B % cand_mb == 0 and cand_mb * per_mission <= budget:
                MB = cand_mb
                break
    G = B // MB

    # stacked [G;H] blocks: rows 0..7 = S⁻¹H (gain operand), 8..15 = H
    gh = jnp.zeros((B, M, _PAD9, _PAD9), f32)
    gh = gh.at[:, :, :dim, :9].set(SinvH.astype(f32))
    gh = gh.at[:, :, _PAD_DIM:_PAD_DIM + dim, :9].set(H_sel.astype(f32))
    gh = gh.reshape(B, M * _PAD9, _PAD9)

    nu_col = jnp.zeros((B, M, _PAD_DIM, 128), f32)
    nu_col = nu_col.at[:, :, :dim, 0].set(nu_sel.astype(f32))
    if cand is not None:
        nu_col = nu_col.at[:, :, 4:7, 0].set(
            jnp.where(add[:, :, None], -cand.astype(f32), 0.0))
    nu_col = nu_col.reshape(B, M * _PAD_DIM, 128)
    cov = jnp.zeros((_PAD9, 128), f32)
    cov = cov.at[4:7, 0].set(new_lm_cov.astype(f32))
    cov = cov.at[6:9, 1].set(new_lm_cov.astype(f32))
    mu_pad = jnp.zeros((B, 8, D), f32).at[:, 0, :].set(mu.astype(f32))

    predict = a8 is not None
    slabs = band is not None
    poff = _PRED_ROWS if predict else 0
    # MB=2 at D=774 measured r04: even with the (D,D) prologue/epilogue
    # temporaries cut to (128,D) tiles AND both Σ streams single-buffered,
    # the scoped VMEM allocation is 18.51M vs the 16.00M limit (+2.51M) —
    # whole-plane Σ windows cannot host two missions. Interleaving needs
    # the row-streamed grid variant (Σ tiles over a second grid axis).
    #
    # Buffering: dense path at D >= 512 single-buffers BOTH Σ streams (the
    # (D,D) epilogue temporaries leave no room — r03 measurement); the
    # tiled path affords a double-buffered Σ-in (out stays single: its
    # flush completes inside the next step's prologue).
    if streamed:
        # single-buffer the read-only Σ stream: the freed VMEM is what
        # lets MB=2 interleave two missions' serial chains per grid step
        sig_in_buf = pl.Buffered(buffer_count=1) if MB > 1 else None
    elif tiled_ep:
        sig_in_buf = None
        sig_out_buf = pl.Buffered(buffer_count=1)
    else:
        one = pl.Buffered(buffer_count=1) if D >= 512 else None
        sig_in_buf = sig_out_buf = one
    in_specs = [
        pl.BlockSpec((MB, D, D), lambda g, *_: (g, 0, 0),
                     pipeline_mode=sig_in_buf),
        pl.BlockSpec((MB, 8, D), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec((MB, M * _PAD9, _PAD9), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec((_PAD9, 128), lambda g, *_: (0, 0)),
        pl.BlockSpec((MB, M * _PAD_DIM, 128), lambda g, *_: (g, 0, 0)),
    ]
    packed = (
        lm_ix.astype(jnp.int32)
        | (do.astype(jnp.int32) << 14)
        | (add.astype(jnp.int32) << 15)
    )
    args = [
        packed.reshape(G, MB * M),
        Sigma.astype(f32),
        mu_pad,
        gh,
        cov,
        nu_col,
    ]
    if predict:
        in_specs.append(pl.BlockSpec((MB, 8, 16), lambda g, *_: (g, 0, 0)))
        args.append(a8.astype(f32))
    if streamed:
        uv_buf = pl.Buffered(buffer_count=1) if MB > 1 else None
        out_specs = [
            pl.BlockSpec((MB, 8, D), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((MB, poff_k, D), lambda g, *_: (g, 0, 0),
                         pipeline_mode=uv_buf),
            pl.BlockSpec((MB, poff_k, D), lambda g, *_: (g, 0, 0),
                         pipeline_mode=uv_buf),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, 8, D), f32),
            jax.ShapeDtypeStruct((B, poff_k, D), f32),
            jax.ShapeDtypeStruct((B, poff_k, D), f32),
        ]
        scratch_shapes = [
            pltpu.VMEM((MB, M * _PAD9, D), f32),
            pltpu.VMEM((MB, M * _PAD9, D), f32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((MB, D, D), lambda g, *_: (g, 0, 0),
                         pipeline_mode=sig_out_buf),
            pl.BlockSpec((MB, 8, D), lambda g, *_: (g, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, D, D), f32),
            jax.ShapeDtypeStruct((B, 8, D), f32),
        ]
        scratch_shapes = [
            pltpu.VMEM((MB, M * _PAD9, D), f32),
            pltpu.VMEM((MB, M * _PAD9, D), f32),
            pltpu.VMEM((MB, poff + M * _PAD_DIM, D), f32),
            pltpu.VMEM((MB, poff + M * _PAD_DIM, D), f32),
        ]
    if slabs:
        Lb = band.shape[2]
        in_specs.append(pl.BlockSpec((MB, 24, Lb), lambda g, *_: (g, 0, 0)))
        args.append(band.astype(f32))
        out_specs.append(pl.BlockSpec((MB, 24, Lb), lambda g, *_: (g, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, 24, Lb), f32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    # streamed MB=2 at D=774 sits at 17.6M scoped vs the compiler's 16M
    # default soft limit; raise it (v5e VMEM is far larger) so two
    # missions' serial A-chains interleave per grid step
    cparams = None
    if streamed and MB > 1:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=24 * 2 ** 20)
    elif MB > 8:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=56 * 2 ** 20)
    outs = pl.pallas_call(
        _make_update_kernel_fleet(MB, M, predict=predict, slabs=slabs,
                                  tiled_ep=tiled_ep, streamed=streamed),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=cparams,
    )(*args)
    if not streamed:
        if slabs:
            return outs[0], outs[1][:, 0, :], outs[2]
        return outs[0], outs[1][:, 0, :]

    # ---- phase 2: tile-streamed symmetric downdate Σ' = Σ − ½(UᵀV+VᵀU) --
    mu_out, u_out, v_out = outs[0], outs[1], outs[2]
    MB2 = 1
    G2 = B // MB2
    sig_new = pl.pallas_call(
        _make_downdate_kernel(MB2),
        grid=(G2,),
        in_specs=[
            pl.BlockSpec((MB2, D, D), lambda g: (g, 0, 0)),
            pl.BlockSpec((MB2, poff_k, D), lambda g: (g, 0, 0)),
            pl.BlockSpec((MB2, poff_k, D), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((MB2, D, D), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, D), f32),
    )(Sigma.astype(f32), u_out, v_out)
    if slabs:
        return sig_new, mu_out[:, 0, :], outs[3]
    return sig_new, mu_out[:, 0, :]


# ---------------------------------------------------------------------------
# reference-semantics MARGINAL writeback fleet kernel (r05, VERDICT #2)
# ---------------------------------------------------------------------------

def _make_marginal_kernel_fleet(MB: int, M: int, predict: bool = False):
    """Fleet update kernel for the reference's OWN covariance semantics:
    each measurement updates only the 9x9 (pose, matched-landmark) marginal
    (``ekf_slam_core.cpp:351-371``, ``utils/ekf_utils.cpp:18-23``) — no
    O(D^2) downdate exists in the reference at all.

    Under marginal semantics the cross-LANDMARK covariance blocks stay
    exactly zero forever (the predict touches only pose rows/cols,
    activation writes one diag block, and the 9x9 writeback touches pose
    x pose, pose x own-landmark and own-landmark x own-landmark), so the
    COMPLETE covariance state is:

      * P  (8, D):  the pose rows Sigma[0:6, :] (sublane-padded), and
      * band (24, L): the landmark block-diag band the full kernel already
        carries (band[a*8+d, l] = Sigma[6+3l+a, 6+3l+a+d]).

    Nothing (D, D)-shaped is ever read, written, or carried — at L=256
    (D=774) the full-update kernel's grid step IS the Sigma stream
    (~30 us/mission); here a mission's whole state is ~50 KB.

    Per measurement j (sequential, measurement order — matching the dense
    ``upd2`` path in models/ekf_slam.py): assemble Sigma9 from P cols
    (one-hot MXU select) + band slot (one-hot column extract); for adds
    use diag(new_lm_cov) and the zero-cross invariant; K^T = SinvH Sigma9,
    V = H Sigma9, Sigma9' = Sigma9 - K^T^T V (= (I - K H) Sigma9, which is
    symmetric in exact arithmetic); write Sigma9' back into P (rows 0:6,
    lanes {0:6, lm:lm+3}) and the band slot (SET semantics), and mu +=
    embed(nu K^T) + add*cand with per-measurement angle wrap (upd2
    behavior). Known ulp-level divergence vs the dense upd2: the landmark
    ROW block Sigma[lm, 0:6] is read as the transpose of the pose-row
    cross (Sigma9' is only symmetric up to rounding); documented in
    README "Known divergences"."""
    def kernel(pk_all,                 # (G, MB*M) int32 SMEM packed
               p_in,                   # (MB, 8, D) pose rows (rows 6:8 zero)
               mu_in,                  # (MB, 8, D) row 0 = mu
               ghsel_ref,              # (MB, M*16, 16) rows j*16+[0:8)=SinvH,
                                       #   [8:16)=H (dim live rows each)
               cov_ref,                # (16, 128) col 1 rows 6:9 new_lm_cov
               nu_ref,                 # (MB, M*8, 128) col0 rows 0:dim = nu,
                                       #   col1 rows 0:3 = cand*add
               *rest):                 # [a8_ref,] band_in, p_out, mu_out,
                                       #   band_out
        rest = list(rest)
        a8_ref = rest.pop(0) if predict else None
        band_in_ref, p_out, mu_out, band_out = rest
        g = pl.program_id(0)
        D = p_in.shape[2]
        Lsz = band_in_ref.shape[2]

        def lmix_of(b, m):
            return pk_all[g, b * M + m] & 0x3FFF

        def do_of(b, m):
            return (pk_all[g, b * M + m] >> 14) & 1

        def add_of(b, m):
            return pk_all[g, b * M + m] >> 15

        row16D = jax.lax.broadcasted_iota(jnp.int32, (16, D), 0)
        colD16 = jax.lax.broadcasted_iota(jnp.int32, (16, D), 1)
        row8D = jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)
        colD8 = jax.lax.broadcasted_iota(jnp.int32, (8, D), 1)
        r16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        c16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        r24L = jax.lax.broadcasted_iota(jnp.int32, (24, Lsz), 0)
        c24L = jax.lax.broadcasted_iota(jnp.int32, (24, Lsz), 1)
        r16L = jax.lax.broadcasted_iota(jnp.int32, (16, Lsz), 0)
        c16L = jax.lax.broadcasted_iota(jnp.int32, (16, Lsz), 1)
        r24_16 = jax.lax.broadcasted_iota(jnp.int32, (24, 16), 0)
        c24_16 = jax.lax.broadcasted_iota(jnp.int32, (24, 16), 1)
        i8D = jnp.where(row8D == colD8, 1.0, 0.0)        # (8,D) diag one-hot
        eye8 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1), 1.0, 0.0)
        e16_8 = jnp.where(r16 == c16, 1.0, 0.0)[:, 0:8]  # (16,8) row embed
        cov16 = cov_ref[:, 1:2]                          # (16,1) rows 6:9
        angle_mask = (colD8 >= 3) & (colD8 < 6) & (row8D == 0)

        # ---- init + in-kernel motion predict on the pose rows ------------
        for b in range(MB):
            mu_out[b, :, :] = mu_in[b]
            band_out[b, :, :] = band_in_ref[b]
            if predict:
                a8b = a8_ref[b][:, 0:8]                  # blockdiag(A6, I2)
                r88 = a8_ref[b][:, 8:16]                 # gated 6x6 R-tilde
                P = p_in[b]
                # left multiply: Sigma'[0:6, 6:] = A6 Sigma[0:6, 6:]
                P1 = jnp.dot(a8b, P, **_DOTH)
                # pose block: A6 Sigma66 A6^T + R (lanes 0:6 only; an
                # identity a8 with zero R reproduces P bitwise)
                s66 = P[:, 0:8]
                t2 = jax.lax.dot_general(
                    jnp.dot(a8b, s66, **_DOTH), a8b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    **_DOTH) + r88
                emb = jnp.dot(t2, i8D, **_DOTH)          # t2 at lanes 0:8
                p_out[b, :, :] = jnp.where(colD8 < 6, emb, P1)
            else:
                p_out[b, :, :] = p_in[b]

        # ---- sequential marginal updates (j outer for MB interleave) -----
        for j in range(M):
            for b in range(MB):
                do = do_of(b, j) != 0
                add = add_of(b, j) != 0
                lm = lmix_of(b, j)

                @pl.when(do)
                def _(b=b, j=j, lm=lm, add=add):
                    slot = (lm - 6) // 3
                    sel = jnp.where(row16D < 6, row16D, lm + (row16D - 6))
                    E = jnp.where((colD16 == sel) & (row16D < 9), 1.0, 0.0)
                    P = p_out[b]                                   # (8, D)
                    # Sigma9 pose rows: cols {0:6, lm:lm+3} selected
                    s9r = jax.lax.dot_general(
                        P, E, dimension_numbers=(((1,), (1,)), ((), ())),
                        **_DOTH)                                   # (8,16)
                    # band slot column -> 3x3 block at rows/cols 6:9
                    ohs = jnp.where((c16L == slot) & (r16L == 0), 1.0, 0.0)
                    bcol = jax.lax.dot_general(
                        band_out[b], ohs,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        **_DOTH)                                   # (24,16)
                    # symmetric band -> 3x3 block, one column at a time:
                    # b3[6+a, 6+c] = bcol[min(a,c)*8 + |a-c|, 0]
                    b3 = jnp.zeros((16, 16), jnp.float32)
                    r16_24 = jax.lax.broadcasted_iota(jnp.int32, (16, 24), 0)
                    c16_24 = jax.lax.broadcasted_iota(jnp.int32, (16, 24), 1)
                    for c in range(3):
                        g24 = jnp.where(
                            (r16_24 >= 6) & (r16_24 < 9)
                            & (c16_24 == (jnp.minimum(r16_24 - 6, c) * 8
                                          + jnp.abs(r16_24 - 6 - c))),
                            1.0, 0.0)                          # (16,24)
                        vc = jnp.dot(g24, bcol, **_DOTH)       # (16,16)
                        b3 = b3 + jnp.where(c16 == 6 + c, vc[:, 0:1], 0.0)
                    init_blk = jnp.where(
                        (r16 == c16) & (r16 >= 6) & (r16 < 9), cov16, 0.0)
                    lmblk = jnp.where(add, init_blk, b3)
                    # assemble Sigma9 (16,16)
                    s9p = jnp.dot(e16_8, s9r, **_DOTH)         # rows 0:8
                    s9rT = jax.lax.dot_general(
                        s9r, eye8,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        **_DOTH)                               # (16,8)
                    s9tT16 = jax.lax.dot_general(
                        s9rT, e16_8,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        **_DOTH)                               # (16,16)
                    sig9 = (jnp.where(r16 < 6, s9p, 0.0)
                            + jnp.where((r16 >= 6) & (r16 < 9) & (c16 < 6),
                                        s9tT16, 0.0)
                            + jnp.where((r16 >= 6) & (r16 < 9)
                                        & (c16 >= 6) & (c16 < 9),
                                        lmblk, 0.0))
                    GH = ghsel_ref[b, _PAD9 * j:_PAD9 * (j + 1), :]
                    KV = jnp.dot(GH, sig9, **_DOTH)            # (16,16)
                    dl = jax.lax.dot_general(
                        KV[0:8, :], KV[8:16, :],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        **_DOTH)                               # (16,16)
                    sig9n = sig9 - dl
                    # mu += embed(nu Kt) + add*cand (cand pre-gated, col 1)
                    nucol = nu_ref[b][_PAD_DIM * j:_PAD_DIM * (j + 1), 0:1]
                    cd3 = nu_ref[b][_PAD_DIM * j:_PAD_DIM * (j + 1), 1:2]
                    delta9 = jax.lax.dot_general(
                        nucol, KV[0:8, :],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        **_DOTH)                               # (1,16)
                    sel36 = jnp.where(
                        (jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1)
                         == jax.lax.broadcasted_iota(
                             jnp.int32, (8, 16), 0) + 6)
                        & (jax.lax.broadcasted_iota(
                            jnp.int32, (8, 16), 0) < 3), 1.0, 0.0)
                    cdrow = jax.lax.dot_general(
                        cd3, sel36,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        **_DOTH)                               # (1,16)
                    dmu = delta9 + cdrow
                    mu_emb = jax.lax.dot_general(
                        dmu, E, dimension_numbers=(((1,), (0,)), ((), ())),
                        **_DOTH)                               # (1, D)
                    munew = mu_out[b] + jnp.where(row8D == 0, mu_emb, 0.0)
                    wrapped = jnp.mod(munew + jnp.pi, 2.0 * jnp.pi) - jnp.pi
                    mu_out[b, :, :] = jnp.where(angle_mask, wrapped, munew)
                    # P writeback: rows 0:6, lanes {0:6, lm:lm+3}
                    pemb = jax.lax.dot_general(
                        sig9n[0:8, :], E,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        **_DOTH)                               # (8, D)
                    mask9 = (colD8 < 6) | ((colD8 >= lm) & (colD8 < lm + 3))
                    p_out[b, :, :] = jnp.where(
                        (row8D < 6) & mask9, pemb, p_out[b])
                    # band slot writeback (SET): band[a*8+d, slot] =
                    #   sig9n[6+a, 6+min(a+d, 2)] (rows a+d>2 are never
                    #   consumed; the clamp only keeps the select in range)
                    rsel = jnp.where(
                        (c24_16 == 6 + r24_16 // 8) & (r24_16 // 8 < 3),
                        1.0, 0.0)                              # (24,16)
                    t1 = jnp.dot(rsel, sig9n, **_DOTH)         # (24,16)
                    cmask = jnp.where(
                        c24_16 == 6 + jnp.minimum(
                            r24_16 // 8 + r24_16 % 8, 2), 1.0, 0.0)
                    vals = jnp.sum(t1 * cmask, axis=1,
                                   keepdims=True)              # (24,1)
                    band_out[b, :, :] = jnp.where(
                        c24L == slot, vals, band_out[b])

    return kernel


def sequential_update_marginal_fleet(
    P: jnp.ndarray,        # (B, 8, D) pose rows Sigma[0:6,:] (rows 6:8 zero)
    mu: jnp.ndarray,       # (B, D)
    H_sel: jnp.ndarray,    # (B, M, dim, 9)
    SinvH: jnp.ndarray,    # (B, M, dim, 9)
    nu_sel: jnp.ndarray,   # (B, M, dim)
    lm_ix: jnp.ndarray,    # (B, M) int32
    do: jnp.ndarray,       # (B, M) bool
    add: jnp.ndarray,      # (B, M) bool
    new_lm_cov: jnp.ndarray,   # (3,)
    cand: jnp.ndarray,     # (B, M, 3) new-landmark positions
    band: jnp.ndarray,     # (B, 24, L) landmark block-diag band
    a8: jnp.ndarray = None,    # (B, 8, 16) motion Jacobian + R-tilde block
) -> tuple:
    """Fleet-batched MARGINAL sequential update (reference covariance
    semantics, ``ekf_slam_core.cpp:351-371``): returns (P', mu', band').
    See ``_make_marginal_kernel_fleet``. The covariance state is pose rows
    + band only — nothing (D, D)-shaped exists on this path."""
    B, D = P.shape[0], P.shape[2]
    M, dim = nu_sel.shape[1], nu_sel.shape[2]
    Lsz = band.shape[2]
    f32 = jnp.float32
    # VMEM per mission: P/mu in+out (4 x 8D), band in+out (2 x 24L), gh/nu,
    # all double-buffered; tiny vs the full kernel's Sigma planes
    per_mission = 4 * 2 * (
        4 * 8 * D + 2 * 24 * Lsz
        + M * _PAD9 * _PAD9 + M * _PAD_DIM * 128 + 8 * 16)
    MB = 1
    for cand_mb in (16, 8, 4, 2):
        if B % cand_mb == 0 and cand_mb * per_mission <= 12 * 2 ** 20:
            MB = cand_mb
            break
    G = B // MB

    gh = jnp.zeros((B, M, _PAD9, _PAD9), f32)
    gh = gh.at[:, :, :dim, :9].set(SinvH.astype(f32))
    gh = gh.at[:, :, _PAD_DIM:_PAD_DIM + dim, :9].set(H_sel.astype(f32))
    gh = gh.reshape(B, M * _PAD9, _PAD9)

    nu_col = jnp.zeros((B, M, _PAD_DIM, 128), f32)
    nu_col = nu_col.at[:, :, :dim, 0].set(nu_sel.astype(f32))
    nu_col = nu_col.at[:, :, 0:3, 1].set(
        jnp.where(add[:, :, None], cand.astype(f32), 0.0))
    nu_col = nu_col.reshape(B, M * _PAD_DIM, 128)
    cov = jnp.zeros((_PAD9, 128), f32)
    cov = cov.at[6:9, 1].set(new_lm_cov.astype(f32))
    mu_pad = jnp.zeros((B, 8, D), f32).at[:, 0, :].set(mu.astype(f32))

    predict = a8 is not None
    packed = (
        lm_ix.astype(jnp.int32)
        | (do.astype(jnp.int32) << 14)
        | (add.astype(jnp.int32) << 15)
    )
    in_specs = [
        pl.BlockSpec((MB, 8, D), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec((MB, 8, D), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec((MB, M * _PAD9, _PAD9), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec((_PAD9, 128), lambda g, *_: (0, 0)),
        pl.BlockSpec((MB, M * _PAD_DIM, 128), lambda g, *_: (g, 0, 0)),
    ]
    args = [packed.reshape(G, MB * M), P.astype(f32), mu_pad, gh, cov,
            nu_col]
    if predict:
        in_specs.append(pl.BlockSpec((MB, 8, 16), lambda g, *_: (g, 0, 0)))
        args.append(a8.astype(f32))
    in_specs.append(pl.BlockSpec((MB, 24, Lsz), lambda g, *_: (g, 0, 0)))
    args.append(band.astype(f32))
    out_specs = [
        pl.BlockSpec((MB, 8, D), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec((MB, 8, D), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec((MB, 24, Lsz), lambda g, *_: (g, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 8, D), f32),
        jax.ShapeDtypeStruct((B, 8, D), f32),
        jax.ShapeDtypeStruct((B, 24, Lsz), f32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    p_new, mu_new, band_new = pl.pallas_call(
        _make_marginal_kernel_fleet(MB, M, predict=predict),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(*args)
    return p_new, mu_new[:, 0, :], band_new
