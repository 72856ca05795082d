"""Pallas TPU kernels for the particle filter hot path.

The pure-JAX PF tick at 10⁶ particles costs ~1.1 ms: XLA materializes the
noise bank, the motion trig, and the moment reductions as separate HBM
passes. This kernel fuses *predict + pose-moment accumulation* into a single
pass over the particle bank held in VMEM:

  read (6, CHUNK) block → on-chip PRNG (Box-Muller over pltpu.prng bits) →
  motion update (same math as models.particle_filter.motion_model_batch) →
  write block + per-block partial sums (Σx, Σy, Σx², Σy², Σxy, Σsin yaw,
  Σcos yaw)

so the bank is touched exactly once (48 MB of HBM traffic at 10⁶ particles
≈ 60 µs on v5e) and the estimate() reduction collapses to a tiny cross-block
sum. Semantics match the reference PF motion model (``auv_particle.py:
38-70``): yaw-rate integration + per-particle x/y/yaw noise, absolute
roll/pitch/z — only the PRNG stream differs (hardware PRNG vs threefry).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586
N_SUMS = 8  # sx, sy, sxx, syy, sxy, s_sin, s_cos, count


# ===========================================================================
# fused systematic resample + gather
# ===========================================================================
#
# The XLA formulation of systematic resampling plateaus at ~14 ms per
# resample at 2^20 particles: the ancestor expansion needs either a random
# scatter (~8 ms) or a sort (~18 ms), and the bank gather by random column
# indices costs ~4 ms. But systematic ancestors are MONOTONE: output block
# [cK, (c+1)K) draws from a contiguous input window of at most K ancestors.
# So each grid step DMAs its (6, W) particle window + (1, W) count-prefix
# window into VMEM, builds the block's one-hot expansion from two shifted
# comparisons (monotone rows), and gathers via one (6, W) @ (W, K) MXU
# matmul. No scatter, no sort, no HBM random access.


def _resample_kernel(scalars_ref, mcum_ref, parts_ref, out_ref, mwin, pwin, sems):
    c = pl.program_id(0)
    K = out_ref.shape[1]
    W = mwin.shape[1]
    s_eff = pl.multiple_of(scalars_ref[c], 128)  # host pre-aligns to the lane tile

    cp_m = pltpu.make_async_copy(mcum_ref.at[:, pl.ds(s_eff, W)], mwin, sems.at[0])
    cp_p = pltpu.make_async_copy(parts_ref.at[:, pl.ds(s_eff, W)], pwin, sems.at[1])
    cp_m.start()
    cp_p.start()
    cp_m.wait()
    cp_p.wait()

    # A[i, j] = (m_cum[s+i] > j_global[j]); monotone in i (m_cum sorted)
    j_global = c * K + jax.lax.broadcasted_iota(jnp.int32, (W, K), 1)
    mw = mwin[0, :]
    A = (mw[:, None] > j_global).astype(jnp.float32)               # (W,K)
    A_prev = jnp.concatenate([jnp.zeros((1, K), jnp.float32), A[:-1, :]], axis=0)
    onehot = A - A_prev                                            # (W,K) 0/1

    out_ref[:, :] = jnp.dot(pwin[:, :], onehot, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block",))
def systematic_resample_gather(
    parts: jnp.ndarray,    # (6, N)
    weights: jnp.ndarray,  # (N,) normalized
    key,
    block: int = 512,
) -> jnp.ndarray:
    """Systematic resample + ancestor gather in one fused pass -> (6, N)."""
    n = parts.shape[1]
    # window: ≤ block+1 distinct ancestors per output block, +127 alignment
    # slack (Mosaic requires lane-tile-aligned DMA starts)
    W = block + 256
    if n % block or n < W:
        raise ValueError(f"particle count {n} must be divisible by {block} and > {W}")
    grid = n // block

    u = jax.random.uniform(key, (), jnp.float32)
    cdf = jnp.cumsum(weights)
    cdf = cdf.at[-1].set(1.0)
    m_cum = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)

    # per-block window starts (ancestor of the block's first slot), aligned
    # down to the 128-lane tile and clamped into range
    starts = jnp.searchsorted(
        m_cum, jnp.arange(0, n, block, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    starts = jnp.clip((starts // 128) * 128, 0, n - W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # m_cum (1, N) in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # parts (6, N) in HBM
        ],
        out_specs=pl.BlockSpec(
            (8, block), lambda c, s: (0, c), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((8, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # pad the 6 state rows to the sublane tile (8) for aligned DMA windows
    parts8 = jnp.concatenate(
        [parts.astype(jnp.float32), jnp.zeros((2, n), jnp.float32)], axis=0
    )
    out8 = pl.pallas_call(
        _resample_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
    )(starts, m_cum[None, :], parts8)
    return out8[0:6]


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> (0,1) float32 uniforms (24-bit mantissa, never 0).

    Mosaic lacks a uint32->f32 cast; drop to 24 bits via int32 first."""
    b24 = jax.lax.shift_right_logical(bits, jnp.uint32(8)).astype(jnp.int32)
    return b24.astype(jnp.float32) * (1.0 / 16777216.0) + (0.5 / 16777216.0)


# Degree-9 odd least-squares fit of sin(2*pi*v) on |v| <= 0.25; f32 Horner
# max abs error 1.9e-7. Mosaic's libm cos/sin cost ~50 VPU cycles/element
# (measured +23 us per 10^6 elements on v5e); this folded quarter-wave
# polynomial is ~12 one-cycle ops and hides entirely under the block DMA.
_S1 = 6.2831852
_S3 = -41.34166466
_S5 = 81.60163217
_S7 = -76.56468158
_S9 = 39.65291712
_INV_TWO_PI = 0.15915494309189535


def _sin2pi(t: jnp.ndarray) -> jnp.ndarray:
    """sin(2*pi*t) for t in turns, any range (range-reduced + quarter-folded)."""
    u = t - jnp.round(t)                      # [-0.5, 0.5]
    u = jnp.where(u > 0.25, 0.5 - u, u)       # fold right quarter
    u = jnp.where(u < -0.25, -0.5 - u, u)     # fold left quarter
    w = u * u
    return u * (_S1 + w * (_S3 + w * (_S5 + w * (_S7 + w * _S9))))


def _sincos(theta: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sin, cos) of theta [rad] via the folded polynomial."""
    t = theta * _INV_TWO_PI
    return _sin2pi(t), _sin2pi(t + 0.25)


def _kernel(params_ref, parts_ref, out_ref, sums_ref):
    # params (SMEM): [vdt_x, vdt_y, vdt_z, wz_dt, roll, pitch, z_odom,
    #                 sd_x, sd_y, sd_yaw, seed, do_noise]
    pid = pl.program_id(0)
    pltpu.prng_seed(params_ref[0, 10].astype(jnp.int32) + pid)

    x = parts_ref[0, :]
    y = parts_ref[1, :]
    yaw = parts_ref[5, :]
    n = x.shape[0]

    # Box-Muller normals for x, y, yaw noise (uniforms are already in turns:
    # the poly sincos skips the 2*pi product AND the range reduction)
    u = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((4, n)), jnp.uint32))
    r1 = jnp.sqrt(-2.0 * jnp.log(u[0]))
    r2 = jnp.sqrt(-2.0 * jnp.log(u[2]))
    nx = r1 * _sin2pi(u[1] + 0.25)
    ny = r1 * _sin2pi(u[1])
    nyaw = r2 * _sin2pi(u[3] + 0.25)
    scale = params_ref[0, 11]
    nx = nx * params_ref[0, 7] * scale
    ny = ny * params_ref[0, 8] * scale
    nyaw = nyaw * params_ref[0, 9] * scale

    vdt_x, vdt_y, vdt_z = params_ref[0, 0], params_ref[0, 1], params_ref[0, 2]
    roll, pitch = params_ref[0, 4], params_ref[0, 5]

    yaw_n = yaw + params_ref[0, 3] + nyaw
    yaw_n = jnp.mod(yaw_n + jnp.pi, _TWO_PI) - jnp.pi

    cr, sr = jnp.cos(roll), jnp.sin(roll)    # scalars: libm is fine
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    sy, cy = _sincos(yaw_n)
    step_x = (cy * cp) * vdt_x + (cy * sp * sr - sy * cr) * vdt_y + (cy * sp * cr + sy * sr) * vdt_z
    step_y = (sy * cp) * vdt_x + (sy * sp * sr + cy * cr) * vdt_y + (sy * sp * cr - cy * sr) * vdt_z

    x_n = x + step_x + nx
    y_n = y + step_y + ny
    z_n = jnp.full_like(x_n, params_ref[0, 6])

    out_ref[0, :] = x_n
    out_ref[1, :] = y_n
    out_ref[2, :] = z_n
    out_ref[3, :] = jnp.full_like(x_n, roll)
    out_ref[4, :] = jnp.full_like(x_n, pitch)
    out_ref[5, :] = yaw_n

    # accumulate lane-wide partial moments across the (sequential) grid into
    # one (8, 128) block; the final 128-lane reduction happens outside
    @pl.when(pid == 0)
    def _():
        sums_ref[:, :] = jnp.zeros_like(sums_ref)

    def lanes(v):
        return jnp.sum(v.reshape(-1, 128), axis=0)

    sums_ref[0, :] += lanes(x_n)
    sums_ref[1, :] += lanes(y_n)
    sums_ref[2, :] += lanes(x_n * x_n)
    sums_ref[3, :] += lanes(y_n * y_n)
    sums_ref[4, :] += lanes(x_n * y_n)
    sums_ref[5, :] += lanes(sy)
    sums_ref[6, :] += lanes(cy)
    sums_ref[7, :] += jnp.full((128,), n / 128.0, jnp.float32)


@functools.partial(jax.jit, static_argnames=("chunk",))
def fused_predict_moments(
    parts: jnp.ndarray,       # (6, N)
    odom: jnp.ndarray,        # (13,) [pos3, quat4, v3, w3]
    dt,                       # scalar
    motion_sd: jnp.ndarray,   # (6,) per-component noise std
    seed,                     # int32 scalar (per-tick)
    do_noise=True,
    chunk: int = 64 * 1024,  # 6-row f32 blocks + RNG temps fit v5e's 16 MB VMEM
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused PF predict pass. Returns (new_parts, mean6, cov3x3)."""
    from ..utils.geometry import rpy_from_quat

    n = parts.shape[1]
    chunk = min(chunk, n)
    if n % chunk:
        raise ValueError(f"particle count {n} must be divisible by chunk {chunk}")
    grid = n // chunk

    abs_rpy = rpy_from_quat(odom[3:7])
    vdt = odom[7:10] * dt
    params = jnp.stack(
        [
            vdt[0], vdt[1], vdt[2],
            odom[12] * dt,
            abs_rpy[0], abs_rpy[1],
            odom[2],
            motion_sd[0], motion_sd[1], motion_sd[5],
            jnp.asarray(seed, jnp.float32),
            jnp.asarray(do_noise, jnp.float32),
        ]
    )[None, :].astype(jnp.float32)

    out, sums = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((6, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_SUMS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((N_SUMS, 128), jnp.float32),
        ],
    )(params, parts.astype(jnp.float32))

    tot = jnp.sum(sums, axis=1)
    count = tot[7]
    mx, my = tot[0] / count, tot[1] / count
    yaw = jnp.arctan2(tot[5] / count, tot[6] / count)
    mean = jnp.stack([mx, my, odom[2], abs_rpy[0], abs_rpy[1], yaw])
    cov = jnp.zeros((3, 3), jnp.float32)
    cov = cov.at[0, 0].set(tot[2] / count - mx * mx)
    cov = cov.at[1, 1].set(tot[3] / count - my * my)
    cov = cov.at[0, 1].set(tot[4] / count - mx * my)
    cov = cov.at[1, 0].set(tot[4] / count - mx * my)
    return out, mean, cov
