"""Pallas TPU kernel for the EKF-SLAM sequential measurement update.

The SLAM fleet's throughput is capped by the M-measurement sequential
update: expressed in jax, each of the 8 update iterations compiles to ~25
small XLA ops inside a scan-inside-vmap, and fixed per-op overhead (~tens
of µs regardless of operand size — measured by ablation, see CLAUDE.md)
dominates everything: Σ traffic, assignment, layouts all ablate to noise.

This kernel runs the WHOLE update loop for one mission inside VMEM: Σ
(D×D ≤ 198² f32 = 157 KB) is loaded once, the M iterations run as an
in-kernel ``fori_loop`` whose body is a handful of small MXU matmuls —
row extraction via a one-hot selector (arbitrary-offset sublane slicing is
not Mosaic-legal; a (16, D) one-hot matmul is), gain/innovation products,
and the rank-dim downdate — and Σ+μ are written back once. vmap adds the
mission grid dimension.

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


def _update_kernel(
    lmix_ref,    # (M,) int32 SMEM: landmark state offset per update
    do_ref,      # (M,) int32 SMEM
    add_ref,     # (M,) int32 SMEM
    nu_ref,      # (M * _PAD_DIM,) f32 SMEM: ν_j padded
    sigma_in,    # (D, D) VMEM
    mu_in,       # (8, D) VMEM (row 0 = mu)
    hsel_ref,    # (M*_PAD_DIM, _PAD9) VMEM
    gsel_ref,    # (M*_PAD_DIM, _PAD9) VMEM: (S⁻¹H)_j
    sqcov_ref,   # (_PAD9, 128) VMEM: col 0 rows 6..8 = sqrt(new_lm_cov)
    sigma_ref,   # (D, D) VMEM out — Σ0 + activations during the loop
    mu_ref,      # (8, D) VMEM out
    ubuf,        # (M*_PAD_DIM, D) VMEM scratch: K_jᵀ rows
    vbuf,        # (M*_PAD_DIM, D) VMEM scratch: (HΣ)_j rows
):
    """Low-rank form of the sequential update: the per-measurement rank-dim
    Σ downdates are carried as U/V factors (one (16,D) correction per gain
    computation) and applied as ONE rank-(M·dim) downdate at the end — the
    eight full (D,D) VPU passes were the measured wall of the SLAM fleet
    tick (docs/ROOFLINE.md). Additions commute, so the result is
    algebraically identical to the in-place sequence (the dense
    ``upd_lowrank`` path proves the same algebra in XLA)."""
    D = sigma_in.shape[1]
    M = lmix_ref.shape[0]
    sigma_ref[:, :] = sigma_in[:, :]
    mu_ref[:, :] = mu_in[:, :]
    ubuf[:, :] = jnp.zeros_like(ubuf)
    vbuf[:, :] = jnp.zeros_like(vbuf)

    col = jax.lax.broadcasted_iota(jnp.int32, (_PAD9, D), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_PAD9, D), 0)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (8, D), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)
    angle_mask = (col8 >= 3) & (col8 < 6) & (row8 == 0)
    sqcov = sqcov_ref[:, 0:1]                                   # (16,1)

    def body(j, _):
        lm_ix = lmix_ref[j]
        do = do_ref[j] != 0
        add = add_ref[j] != 0

        # one-hot row selector for (pose 0..5, lm_ix..lm_ix+2)
        sel = jnp.where(row < 6, row, lm_ix + (row - 6))
        E = jnp.where((col == sel) & (row < 9), 1.0, 0.0)       # (16,D)

        # activation: Σ += (√cov·E_lm)ᵀ(√cov·E_lm) (inactive rows are zero;
        # rare after the early mission — stays an in-place add)
        @pl.when(add)
        def _():
            E_s = jnp.where((row >= 6) & (row < 9), E, 0.0) * sqcov
            sigma_ref[:, :] += jnp.dot(
                E_s.T, E_s, preferred_element_type=jnp.float32
            )

        @pl.when(do)
        def _():
            # rows of the CURRENT Σ = (Σ0+acts) rows − accumulated U/V
            rows9 = jnp.dot(E, sigma_ref[:, :], preferred_element_type=jnp.float32)
            A = jax.lax.dot_general(
                E, ubuf[:, :], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (16, M*8)
            rows9 = rows9 - jnp.dot(A, vbuf[:, :],
                                    preferred_element_type=jnp.float32)
            Hj = hsel_ref[pl.ds(j * _PAD_DIM, _PAD_DIM), :]     # (8,16)
            Gj = gsel_ref[pl.ds(j * _PAD_DIM, _PAD_DIM), :]     # (8,16)
            Kt = jnp.dot(Gj, rows9, preferred_element_type=jnp.float32)  # (8,D)
            Vt = jnp.dot(Hj, rows9, preferred_element_type=jnp.float32)  # (8,D)

            # δμ = Σ_d ν_d · Ktᵀ[d,:] (dim ≤ 3; padded entries are zero)
            delta = (
                nu_ref[j * _PAD_DIM + 0] * Kt[0:1, :]
                + nu_ref[j * _PAD_DIM + 1] * Kt[1:2, :]
                + nu_ref[j * _PAD_DIM + 2] * Kt[2:3, :]
            )                                                   # (1,D)
            mu_new = mu_ref[:, :] + jnp.where(row8 == 0, delta, 0.0)
            wrapped = jnp.mod(mu_new + jnp.pi, 2.0 * jnp.pi) - jnp.pi
            mu_ref[:, :] = jnp.where(angle_mask, wrapped, mu_new)

            ubuf[pl.ds(j * _PAD_DIM, _PAD_DIM), :] = Kt
            vbuf[pl.ds(j * _PAD_DIM, _PAD_DIM), :] = Vt

        return 0

    jax.lax.fori_loop(0, M, body, 0)
    # one rank-(M*dim) downdate, then the single final symmetrize
    sigma_ref[:, :] -= jax.lax.dot_general(
        ubuf[:, :], vbuf[:, :], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = sigma_ref[:, :]
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
    """Run all M sequential updates in one kernel -> (Sigma, mu)."""
    D = Sigma.shape[0]
    M, dim = nu_sel.shape
    f32 = jnp.float32

    def pad(x):  # (M, dim, 9) -> (M*_PAD_DIM, _PAD9)
        out = jnp.zeros((M, _PAD_DIM, _PAD9), f32)
        out = out.at[:, :dim, :9].set(x.astype(f32))
        return out.reshape(M * _PAD_DIM, _PAD9)

    nu_pad = (
        jnp.zeros((M, _PAD_DIM), f32).at[:, :dim].set(nu_sel.astype(f32)).reshape(-1)
    )
    sqcov = jnp.zeros((_PAD9, 128), f32)
    sqcov = sqcov.at[6:9, 0].set(jnp.sqrt(new_lm_cov.astype(f32)))
    mu_pad = jnp.zeros((8, D), f32).at[0, :].set(mu.astype(f32))

    sig_o, mu_o = pl.pallas_call(
        _update_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
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
        nu_pad,
        Sigma.astype(f32),
        mu_pad,
        pad(H_sel),
        pad(SinvH),
        sqcov,
    )
    return sig_o, mu_o[0, :]
