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

from .slam_kernels import _split3

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


_WSLACK = 384    # ancestor-window slack beyond the block width (see guard)


def _moment_block(x, y, sy, cy, count):
    """The 8 lane-partial moment rows (the layout of ``moment_sums``/
    ``finalize_moments``) as one (8, 128) block — shared by the per-tick
    predict, the multi-tick predict, and the fused resample-jitter tail so
    the row order cannot silently diverge."""
    def lanes(v):
        return jnp.sum(v.reshape(-1, 128), axis=0)

    return jnp.stack(
        [lanes(x), lanes(y), lanes(x * x), lanes(y * y), lanes(x * y),
         lanes(sy), lanes(cy), jnp.full((128,), count, jnp.float32)])


def _accum_moments(sums_ref, base, x, y, sy, cy, count):
    """Accumulate the moment rows at sums_ref[base:base+8] (static base)."""
    sums_ref[base:base + N_SUMS, :] += _moment_block(x, y, sy, cy, count)


def _make_resample_kernel(batch: int, W: int, jitter: bool = False):
    """Kernel factory: `batch` consecutive output blocks per grid step share
    ONE merged ancestor window (consecutive blocks' windows overlap heavily
    — systematic block spans partition the input), so the grid step issues
    2 DMAs instead of 2·batch and the per-step overhead (~0.6 µs) amortizes
    `batch`-fold. Each block slices its own (W,) sub-window at a 128-aligned
    offset; the caller guarantees starts[b] − head ≤ BW − W (its `fits`
    guard routes violations to the exact fallback).

    With ``jitter``, the x/y/yaw resample jitter (hardware-PRNG Box-Muller,
    the predict kernel's stream machinery) and the post-resample lane-
    partial moment sums ride the output write — the XLA tail (a (3,N)
    threefry + 3 bank passes + a moment pass) measured ~0.3 ms/call of the
    GPS update at 2^20."""

    def kernel(starts_ref, heads_ref, off_ref, *rest):
        if jitter:
            jp_ref, seed_ref, mcum_ref, parts_ref, out_ref, sums_ref, \
                mwin, pwin, sems = rest
        else:
            mcum_ref, parts_ref, out_ref, mwin, pwin, sems = rest
        c = pl.program_id(0)
        K = out_ref.shape[1] // batch
        hs = pl.multiple_of(heads_ref[c], 128)
        cp_m = pltpu.make_async_copy(
            mcum_ref.at[:, pl.ds(hs, mwin.shape[1])], mwin, sems.at[0])
        cp_p = pltpu.make_async_copy(
            parts_ref.at[:, pl.ds(hs, pwin.shape[1])], pwin, sems.at[1])
        cp_m.start()
        cp_p.start()
        cp_m.wait()
        cp_p.wait()

        off = off_ref[0]                    # global slot of local output 0
        jg0 = jax.lax.broadcasted_iota(jnp.int32, (W, K), 1)   # hoisted

        if jitter:
            @pl.when(c == 0)
            def _():
                sums_ref[:, :] = jnp.zeros_like(sums_ref)

        for b in range(batch):
            # A[i, j] = (m_cum[s+i] > j_global[j]); monotone in i. The cell
            # array is the VPU cost: build it in bf16 (one-hot entries are
            # exactly 0/1) and recover exact f32 particle values through a
            # 3-way bf16 split of the window (hi+mid+lo == x exactly; each
            # output column hits exactly one 1 in the one-hot). The global
            # output offset folds into the (1, W) count row, not the (W, K)
            # iota — one row op instead of a full-cell-array add.
            sb = pl.multiple_of(starts_ref[c * batch + b] - hs, 128)
            mw = mwin[0, pl.ds(sb, W)] - (off + (c * batch + b) * K)  # (W,)
            A = (mw[:, None] > jg0).astype(jnp.bfloat16)           # (W,K)
            A_prev = jnp.concatenate(
                [jnp.zeros((1, K), jnp.bfloat16), A[:-1, :]], axis=0)
            onehot = A - A_prev                                    # 0/1 in bf16

            pw = pwin[:, pl.ds(sb, W)]                             # (8, W) f32
            # DEFAULT precision: the package-wide "highest" would ask for a
            # 3-pass f32 emulation that Mosaic rejects for bf16 operands;
            # bf16 x {0,1} products accumulated in f32 are already exact.
            # The hi/mid/lo passes are STACKED on the sublane axis into ONE
            # (24, W) dot — the kernel is dominated by per-block fixed cost
            # (~270 ns/block from the block sweep), so one dot beats three;
            # folding r[0:8]+r[8:16]+r[16:24] keeps the exact same f32 adds
            dot = functools.partial(
                jnp.dot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            hml = jnp.concatenate(_split3(pw), axis=0)             # (24, W)
            r = dot(hml, onehot)                                   # (24, K)
            out_ref[:, b * K:(b + 1) * K] = r[0:8] + r[8:16] + r[16:24]

        if jitter:
            # x/y/yaw jitter (auv_pf.py:193-198) + lane-partial moment
            # sums, ONCE over the whole grid step. Noise blocks are
            # (8, batch·K/8) like the predict kernel's; the rows are
            # READ BACK from out_ref so the reshaped noise meets a clean
            # native-layout operand (adding it to concatenated matmul
            # outputs makes Mosaic's layout inference reject the reshape
            # — "unsupported shape cast").
            nK = batch * K
            pltpu.prng_seed(seed_ref[0, 0] + c)
            u = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits((32, nK // 8)), jnp.uint32))
            r1 = jnp.sqrt(-2.0 * _fast_ln(u[0:8]))
            r2 = jnp.sqrt(-2.0 * _fast_ln(u[16:24]))
            x_n = out_ref[0, :] + (r1 * _sin2pi(u[8:16] + 0.25)).reshape(nK) \
                * jp_ref[0, 0]
            y_n = out_ref[1, :] + (r1 * _sin2pi(u[8:16])).reshape(nK) \
                * jp_ref[0, 1]
            yaw_n = out_ref[5, :] + (r2 * _sin2pi(u[24:32] + 0.25)).reshape(nK) \
                * jp_ref[0, 2]
            out_ref[0, :] = x_n
            out_ref[1, :] = y_n
            out_ref[5, :] = yaw_n

            sy, cy = _sincos(yaw_n)
            _accum_moments(sums_ref, 0, x_n, y_n, sy, cy, nK / 128.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("block",))
def systematic_resample_gather(
    parts: jnp.ndarray,    # (6, N)
    weights: jnp.ndarray,  # (N,) normalized
    key,
    block: int = 256,
    jitter_sd: jnp.ndarray = None,  # (3,) x/y/yaw stds: fuse the resample
                                    #   jitter + moment sums into the
                                    #   kernel's output write; returns
                                    #   (parts, (8,128) sums) instead
    seed=None,                      # i32 PRNG seed (with jitter_sd)
):
    """Systematic resample + ancestor gather in one fused pass -> (6, N).

    Ancestors are bit-identical to ``resampling.systematic_resample`` under
    the same key (both derive counts as cummax(clip(ceil(N*cdf - u)))).
    Monotone ancestors mean output block [cK,(c+1)K) draws from a contiguous
    window, DMA'd to VMEM and expanded through a one-hot onto the MXU — no
    scatter, no sort, no HBM random access.

    A block's ancestor *index* span averages exactly the block width (block
    spans partition the input) but is unbounded under degenerate weights
    (long zero-count runs). A per-call guard measures the true max
    window requirement in XLA and routes the rare oversized case to an
    exact scatter+cummax+gather fallback, so the result is exact for every
    weight vector. r05: the fallback was ``jnp.searchsorted`` + take
    (~179 ms at 2^20); healthy-filter span outliers fire it ~2-3% of
    updates (measured: 2/64 at 2^18 with the old 768-wide top tier), and
    ONE firing inside a bench window poisons the whole slope — so the W
    ladder now tops out at block+1280 (``_w_tiers``; probe max need 1152
    over 64 chained updates) and the fallback ancestors come from
    ``resampling._expand_blocks`` (scatter + running max, ~12 ms at 2^20,
    same ancestors by definition: slot j belongs to the smallest i with
    m_cum[i] > j).

    The one-hot cell build is O(N·W) VPU work (W adaptive, see Ws below),
    which favors small blocks; per-block MXU latency favors large ones.
    Swept at 2^20 (merged batch window, 32 blocks / 2 DMAs per grid step;
    whole-call numbers INCLUDING the pre-r04 XLA prep): block 128 ->
    3.46 ms, 256 -> 2.32 ms, 512 -> 2.54 ms, 1024 -> 4.28 ms; 256 is the
    knee. Kernel-only at block=256 (r04, chained slope): 1.28 ms at
    W=512, 1.21 ms at W=384 — the cells are only mildly W-bound."""
    from . import resampling

    n = parts.shape[1]
    BATCH = 32
    # block must be a multiple of 128: the clipped window starts/heads are
    # asserted 128-aligned to the kernel (pl.multiple_of) — a non-aligned
    # W or n-W clip bound would make that hint FALSE and the DMA windows
    # silently wrong, not slow
    if block % 128:
        raise ValueError(f"block ({block}) must be a multiple of 128")
    # ADAPTIVE window width: the one-hot cell build is the resample's wall
    # and costs ∝ W, while the width a call actually needs is the measured
    # max per-block ancestor span + 128-alignment waste — near block+128
    # for healthy weights, larger only under skew. Compile ascending
    # variants and lax.switch on the measured requirement (the old fixed
    # W = block + _wslack wasted ~25% of the cell passes on typical calls);
    # anything beyond the widest variant still routes to the exact gather.
    Ws = [w for w in _w_tiers(block) if w <= n]
    Ws = sorted(set(Ws))
    if n % block or not Ws:
        if n == block:
            Ws = [n]  # single-step small-bank case: window = whole bank
        else:
            raise ValueError(
                f"particle count {n} must be divisible by {block} and "
                f">= {block + 128}"
            )
    n_blocks = n // block

    u = jax.random.uniform(key, (), jnp.float32)
    m_cum = resampling.systematic_counts(weights, u)

    # per-block window starts (first ancestor of the block), 128-aligned
    # down and clamped into range; window must reach the block's last
    # ancestor (bounded by the next block's first).
    #
    # The starts only need 128-granularity (they are floored to the lane
    # tile anyway), so the old jnp.searchsorted over the full m_cum —
    # measured 700 us/call at 2^20, a third of the whole GPS update — is
    # replaced by a compare-reduce over the 128-DECIMATED prefix: with
    # md[j] = m_cum[128(j+1)-1] (group maxima; m_cum is monotone),
    # (ts//128)·128 == 128 · #{j: md[j] <= boundary} EXACTLY (a group is
    # full iff its max crossed; the partial group contributes < 128).
    # Window starts — and therefore ancestors and outputs — are bitwise
    # unchanged; only the `fits` guard uses the 128-granular UPPER bound
    # ts_next <= 128·(G[k+1]+1) - 1, which is conservative by at most 127
    # (it can route a borderline call one W variant wider, never wrong).
    md = m_cum[127::128]                                      # (n/128,)
    bounds = jnp.arange(0, n + block, block,
                        dtype=m_cum.dtype)                    # (n/block+1,)
    G = jnp.sum(md[None, :] <= bounds[:, None], axis=1,
                dtype=jnp.int32)                              # (n/block+1,)
    base_starts = 128 * G[:-1]
    need_ub = 128 * (G[1:] + 1) - base_starts                 # (n/block,)

    # pad the 6 state rows to the sublane tile (8) for aligned DMA windows
    parts8 = jnp.concatenate(
        [parts.astype(jnp.float32), jnp.zeros((2, n), jnp.float32)], axis=0
    )

    jitter = jitter_sd is not None

    def make_fast(W):
        # merged-window size: see _merged_bw — margin must cover the
        # within-batch window-start drift under post-update weight skew
        # or the `fits` check trips on ordinary weight spread and routes
        # healthy updates to the ~12 ms exact fallback
        batch = BATCH if (n_blocks % BATCH == 0
                          and n >= _merged_bw(BATCH, block, W)) else 1
        BW = _merged_bw(batch, block, W) if batch > 1 else W
        starts = jnp.clip(base_starts, 0, n - W)
        heads = jnp.clip(starts[::batch], 0, n - BW)
        if W == n:
            # whole-bank window: every ancestor is in range by construction
            # (the generic guard would wrongly demand ts[0] >= n - W + 1
            # via the boundary-n sentinel and route every call to the
            # fallback)
            fits = jnp.asarray(True)
        else:
            fits = jnp.max(need_ub) <= W
            # merged-window condition: every block's window must sit
            # inside its batch head's (BW,) window
            fits = fits & (jnp.max(
                starts - jnp.repeat(heads, batch)) <= BW - W)

        # the fused jitter path generates noise in (8, batch·block/8)
        # blocks; Mosaic accepts the (8, m) -> (8m,) relayout only for
        # m >= 1024 (probed on-chip: 512 is an "unsupported shape cast"),
        # so fuse only when the grid step spans >= 8192 outputs —
        # production 2^20 banks run batch == 32 at block == 256; small
        # banks jitter the plain kernel's output in XLA
        fuse = jitter and batch * block >= 8192

        def fast(_):
            r = expand_gather_call(m_cum, parts8, starts,
                                   jnp.zeros((1,), jnp.int32), n, block, W,
                                   batch=batch, heads=heads,
                                   jitter_sd=jitter_sd if fuse else None,
                                   seed=seed)
            if fuse:
                return (r[0], r[1])
            if jitter:
                if jax.default_backend() == "tpu" and n % 8192 == 0:
                    return jitter_moments_call(r, jitter_sd, seed)
                return _xla_jitter_moments(r, jitter_sd, seed)
            return r

        return fast, fits

    def exact(_):
        anc = resampling._expand_blocks(m_cum)
        out = jnp.take(parts8, anc, axis=1)
        if not jitter:
            return out
        if jax.default_backend() == "tpu" and n % 8192 == 0:
            # same hardware-PRNG stream as the fused branch (r05): the
            # jitter no longer depends on which branch the switch took
            return jitter_moments_call(out, jitter_sd, seed)
        return _xla_jitter_moments(out, jitter_sd, seed)

    branches, fit_flags = [], []
    for W in Ws:
        fast, fits = make_fast(W)
        branches.append(fast)
        fit_flags.append(fits)
    branches.append(exact)

    # smallest variant that fits; the exact fallback past the widest
    idx = jnp.asarray(len(Ws), jnp.int32)
    for k in range(len(Ws) - 1, -1, -1):
        idx = jnp.where(fit_flags[k], jnp.asarray(k, jnp.int32), idx)
    res = jax.lax.switch(idx, branches, None)
    if jitter:
        return res[0][0:6], res[1]
    return res[0:6]


def _w_tiers(block: int):
    """Adaptive window-width ladder for ``systematic_resample_gather``.

    Healthy-filter spans sit near block+128..block+256 (probe med 512 at
    block=256), but ~3% of real GPS updates need 768-1152 (probe max 1152
    over 64 chained updates at 2^20) — each such call on the exact
    fallback costs ~12 ms vs ~3.8 ms on a W=1536 kernel pass, and one
    firing inside a bench window moves the whole slope. Tiers beyond the
    ladder still route to the exact scatter+cummax gather."""
    return (block + 128, block + _wslack(block), block + 768,
            block + 1280)


def _merged_bw(batch: int, block: int, W: int) -> int:
    """Merged-window size: the last block's start sits ~(batch-1)*block past
    the head, plus the head's 128-alignment waste and within-batch span
    drift. r05 probe (64 chained real GPS updates): drift beyond the batch
    span reaches 4096 at 2^20 (2304 at 2^18) — the old 768 margin tripped
    the `fits` guard on ~3% of healthy updates and fired the ~12 ms exact
    fallback. Margin 6144 (1.5x observed max) costs +22 MB DMA per call
    (~+53 us by the 115 us / 48 MB law) and keeps every probed update on
    the kernel; a one-block margin made batch=32 fall back on MOST calls."""
    return batch * block + W + 6144


def _wslack(block: int) -> int:
    """Ancestor-window slack beyond the block width: 128-alignment waste
    (≤127) + within-block span fluctuation (~√(2·block), budgeted at ≥8σ)."""
    return 256 if block <= 256 else _WSLACK


def _xla_jitter_moments(out8, jitter_sd, seed):
    """XLA x/y/yaw jitter + moment sums for the non-fused resample paths
    (weight-collapse fallback, batch==1 small banks). Draws threefry noise
    — the fused kernel draws from the TPU hardware PRNG; the streams
    legitimately differ (both are documented fast-path divergences)."""
    n = out8.shape[1]
    kj = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32))
    n3 = jax.random.normal(kj, (3, n), out8.dtype)
    out8 = out8.at[0].add(n3[0] * jitter_sd[0])
    out8 = out8.at[1].add(n3[1] * jitter_sd[1])
    out8 = out8.at[5].add(n3[2] * jitter_sd[2])
    return out8, moment_sums(out8)


def _jitter_kernel(jp_ref, seed_ref, parts_ref, out_ref, sums_ref):
    """Standalone form of the fused resample tail (``_make_resample_kernel``
    with ``jitter``): same per-chunk hardware-PRNG seeding, draw shape and
    op order, so its x/y/yaw jitter values are BITWISE the fused kernel's
    for the same (seed, global chunk index). seed_ref (1,2) SMEM i32 =
    [seed, global chunk offset] — a particle shard passes its shard's
    first global chunk index as the offset and reproduces the unsharded
    stream exactly (VERDICT r04 #3)."""
    c = pl.program_id(0)
    n = out_ref.shape[1]

    @pl.when(c == 0)
    def _():
        sums_ref[:, :] = jnp.zeros_like(sums_ref)

    pltpu.prng_seed(seed_ref[0, 0] + (seed_ref[0, 1] + c))
    u = _uniform_from_bits(pltpu.bitcast(
        pltpu.prng_random_bits((32, n // 8)), jnp.uint32))
    r1 = jnp.sqrt(-2.0 * _fast_ln(u[0:8]))
    r2 = jnp.sqrt(-2.0 * _fast_ln(u[16:24]))
    x_n = parts_ref[0, :] + (r1 * _sin2pi(u[8:16] + 0.25)).reshape(n) \
        * jp_ref[0, 0]
    y_n = parts_ref[1, :] + (r1 * _sin2pi(u[8:16])).reshape(n) \
        * jp_ref[0, 1]
    yaw_n = parts_ref[5, :] + (r2 * _sin2pi(u[24:32] + 0.25)).reshape(n) \
        * jp_ref[0, 2]
    out_ref[0, :] = x_n
    out_ref[1, :] = y_n
    out_ref[2, :] = parts_ref[2, :]
    out_ref[3, :] = parts_ref[3, :]
    out_ref[4, :] = parts_ref[4, :]
    out_ref[5, :] = yaw_n
    out_ref[6, :] = parts_ref[6, :]
    out_ref[7, :] = parts_ref[7, :]

    sy, cy = _sincos(yaw_n)
    _accum_moments(sums_ref, 0, x_n, y_n, sy, cy, n / 128.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def jitter_moments_call(
    parts: jnp.ndarray,       # (6, N) or (8, N) resampled bank
    jitter_sd: jnp.ndarray,   # (3,) x/y/yaw stds
    seed,                     # i32 scalar (the fused path's randint seed)
    seed_off=0,               # i32: global chunk index of local chunk 0
    chunk: int = 8192,
):
    """x/y/yaw resample jitter + lane-partial moment sums as one standalone
    Pallas pass — the EXACT noise stream of the fused resample-kernel tail
    (chunk c of the bank seeds the hardware PRNG with
    ``seed + seed_off + c`` and draws one (32, chunk/8) block).

    Two users: (a) the particle-sharded fast update
    (``particle_filter._update_resample_fast_shard``) passes
    ``seed_off = shard_index * (Ns // 8192)`` so ``pf.run(use_pallas=True,
    pmesh=...)`` banks are bitwise the unsharded fast path's at any shard
    count; (b) the unsharded weight-collapse exact fallback, so every TPU
    fast-path branch shares ONE jitter stream definition (the stream no
    longer depends on which window variant/fallback the resample took).
    Returns (parts with input's row count, (8, 128) sums)."""
    rows, n = parts.shape
    if n % chunk:
        raise ValueError(f"bank width {n} must be divisible by chunk {chunk}")
    if chunk % 8192:
        # (8, m) -> (8m,) noise relayout needs m >= 1024 (probed on-chip)
        raise ValueError(f"chunk {chunk} must be a multiple of 8192")
    parts8 = parts.astype(jnp.float32)
    if rows == 6:
        parts8 = jnp.concatenate(
            [parts8, jnp.zeros((2, n), jnp.float32)], axis=0)
    grid = n // chunk
    jp = jnp.zeros((1, 8), jnp.float32).at[0, 0:3].set(
        jitter_sd.astype(jnp.float32))
    sd2 = jnp.stack([jnp.asarray(seed, jnp.int32),
                     jnp.asarray(seed_off, jnp.int32)]).reshape(1, 2)
    out, sums = pl.pallas_call(
        _jitter_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_SUMS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((N_SUMS, 128), jnp.float32),
        ],
    )(jp, sd2, parts8)
    return out[0:rows], sums


def expand_gather_call(
    m_cum: jnp.ndarray,    # (Nw,) monotone cumulative counts (window space)
    parts8: jnp.ndarray,   # (8, Nw) particle window (sublane-padded)
    starts: jnp.ndarray,   # (n_out/block,) 128-aligned window starts
    out_off: jnp.ndarray,  # (1,) i32: global output slot of local output 0
    n_out: int,
    block: int,
    W: int,
    batch: int = 1,
    heads: jnp.ndarray = None,  # (n_out/block/batch,) merged-window starts
                                #   (required for batch > 1; caller must
                                #   guarantee starts[b] - heads[b//batch]
                                #   <= batch*block — see the `fits` guard)
    jitter_sd: jnp.ndarray = None,  # (3,) x/y/yaw jitter stds: fuse the
                                    #   resample jitter + lane-partial
                                    #   moment sums into the output write
    seed=None,                      # i32 PRNG seed (required with jitter)
):
    """The fused one-hot/MXU ancestor expansion over a particle window.

    Factored out of ``systematic_resample_gather`` so the distributed
    resample (``parallel.resample_dist``) can run the same kernel on a
    halo-extended shard window with a nonzero output offset (batch=1:
    per-block windows, no merged-window precondition). Returns the (8,
    n_out) bank — plus the (8, 128) moment sums when ``jitter_sd`` is
    given."""
    jitter = jitter_sd is not None
    grid = n_out // block
    if batch == 1 or grid % batch:
        batch = 1
        heads = starts
    BW = _merged_bw(batch, block, W) if batch > 1 else W
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),   # m_cum (1, Nw) in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),   # parts (8, Nw) in HBM
    ]
    out_specs = pl.BlockSpec(
        (8, block * batch), lambda c, s, h, o: (0, c),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((8, n_out), jnp.float32)
    args = [starts, heads, out_off, m_cum[None, :], parts8]
    if jitter:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1, 8) f32 jitter sds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1, 1) i32 seed
        ] + in_specs
        out_specs = [out_specs, pl.BlockSpec(
            (N_SUMS, 128), lambda c, s, h, o: (0, 0),
            memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((N_SUMS, 128), jnp.float32)]
        jp = jnp.zeros((1, 8), jnp.float32).at[0, 0:3].set(
            jitter_sd.astype(jnp.float32))
        args = [starts, heads, out_off, jp,
                jnp.asarray(seed, jnp.int32).reshape(1, 1),
                m_cum[None, :], parts8]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid // batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((1, BW), jnp.int32),
             pltpu.VMEM((8, BW), jnp.float32),
             pltpu.SemaphoreType.DMA((2,))]
        ),
    )
    return pl.pallas_call(
        _make_resample_kernel(batch, W, jitter=jitter),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(*args)


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


_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951


def _fast_ln(u: jnp.ndarray) -> jnp.ndarray:
    """ln(u) for positive normal f32 via exponent/mantissa split.

    Mosaic's libm log costs ~50 VPU cycles/element; this is ~20 one-cycle
    ops: fold the mantissa into [sqrt(1/2), sqrt(2)) and evaluate the
    degree-7 atanh series (max abs err 3e-8)."""
    bits = pltpu.bitcast(u, jnp.int32)
    e = jax.lax.shift_right_logical(bits, jnp.int32(23)).astype(jnp.float32) - 127.0
    m = pltpu.bitcast(
        jax.lax.bitwise_or(
            jax.lax.bitwise_and(bits, jnp.int32(0x7FFFFF)), jnp.int32(0x3F800000)
        ),
        jnp.float32,
    )  # [1, 2)
    big = m > _SQRT2
    m = jnp.where(big, m * 0.5, m)
    e = jnp.where(big, e + 1.0, e)
    s = (m - 1.0) / (m + 1.0)
    w = s * s
    ln_m = 2.0 * s * (1.0 + w * (1 / 3 + w * (1 / 5 + w * (1 / 7))))
    return e * _LN2 + ln_m


def _kernel(params_ref, seed_ref, parts_ref, out_ref, sums_ref):
    # params (SMEM f32): [vdt_x, vdt_y, vdt_z, wz_dt, roll, pitch, z_odom,
    #                     sd_x, sd_y, sd_yaw, (unused), do_noise, subst, 0,0,0]
    # seed (SMEM i32): per-tick PRNG seed (exact int — f32 params would
    # quantize seeds above 2^24 and alias tick streams)
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0] + pid)

    x = parts_ref[0, :]
    y = parts_ref[1, :]
    yaw = parts_ref[5, :]
    n = x.shape[0]

    # Box-Muller normals for x, y, yaw noise (uniforms are already in turns:
    # the poly sincos skips the 2*pi product AND the range reduction).
    # All noise math runs on (8, n/8) blocks — a (1,n) row would use one of
    # the VPU's 8 sublanes (measured 11x slower); the row-major reshape back
    # to (n,) matches the native 1-D layout and is free.
    n8 = n // 8
    u = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((32, n8)), jnp.uint32))
    r1 = jnp.sqrt(-2.0 * _fast_ln(u[0:8]))
    r2 = jnp.sqrt(-2.0 * _fast_ln(u[16:24]))
    scale = params_ref[0, 11]
    nx = (r1 * _sin2pi(u[8:16] + 0.25)).reshape(n) * (params_ref[0, 7] * scale)
    ny = (r1 * _sin2pi(u[8:16])).reshape(n) * (params_ref[0, 8] * scale)
    nyaw = (r2 * _sin2pi(u[24:32] + 0.25)).reshape(n) * (params_ref[0, 9] * scale)

    vdt_x, vdt_y, vdt_z = params_ref[0, 0], params_ref[0, 1], params_ref[0, 2]
    roll, pitch = params_ref[0, 4], params_ref[0, 5]

    yaw_n = yaw + params_ref[0, 3] + nyaw
    yaw_n = jnp.mod(yaw_n + jnp.pi, _TWO_PI) - jnp.pi

    cr, sr = jnp.cos(roll), jnp.sin(roll)    # scalars: libm is fine
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    sy, cy = _sincos(yaw_n)
    # accumulation order matches _make_kernel_multi exactly so the per-tick
    # and multi-tick paths stay BITWISE identical (an ULP difference here
    # can flip a resample ancestor at a stratum boundary)
    x_n = x + (cy * cp) * vdt_x + (cy * sp * sr - sy * cr) * vdt_y \
        + (cy * sp * cr + sy * sr) * vdt_z + nx
    y_n = y + (sy * cp) * vdt_x + (sy * sp * sr + cy * cr) * vdt_y \
        + (sy * sp * cr - cy * sr) * vdt_z + ny

    # before any odometry has arrived (subst=0) z/roll/pitch keep their init
    # distribution instead of collapsing to a stale channel fill value
    subst = params_ref[0, 12] > 0.5
    out_ref[0, :] = x_n
    out_ref[1, :] = y_n
    out_ref[2, :] = jnp.where(subst, jnp.full_like(x_n, params_ref[0, 6]), parts_ref[2, :])
    out_ref[3, :] = jnp.where(subst, jnp.full_like(x_n, roll), parts_ref[3, :])
    out_ref[4, :] = jnp.where(subst, jnp.full_like(x_n, pitch), parts_ref[4, :])
    out_ref[5, :] = yaw_n

    # accumulate lane-wide partial moments across the (sequential) grid into
    # one (8, 128) block; the final 128-lane reduction happens outside
    @pl.when(pid == 0)
    def _():
        sums_ref[:, :] = jnp.zeros_like(sums_ref)

    _accum_moments(sums_ref, 0, x_n, y_n, sy, cy, n / 128.0)


def _make_kernel_multi(nxy: bool, nyaw_on: bool):
    """Kernel factory: up to K predict ticks over one VMEM-resident chunk.

    nticks (1,1) SMEM i32: number of REAL ticks this call — the tick loop is
    a dynamic ``fori_loop`` so the (K - nticks) pad slots never execute
    (round-3 plan padded every segment to K=12 slots and ran the pads as
    multiplied-by-zero work: ~18% of the predict kernel's VPU time).
    params (K,16) SMEM f32 rows as in ``_kernel``; seeds (1,K) SMEM i32.
    The bank chunk is read and written ONCE for all K ticks; per-tick moment
    partials land in sums rows [8t, 8t+8); pad rows stay zero (the caller's
    flat_slot gather never reads them).

    nxy / nyaw_on are trace-time flags: noise rows whose std is exactly 0
    compile out entirely. The reference's default motion covariance is
    (0,0,0,0,0,1e-12) (``auv_pf.launch:18``) — x/y motion noise is zero and
    bank diversity comes from the resample jitter — so the default-config
    kernel skips 2 of 4 PRNG rows, one Box-Muller radius, and two
    quarter-wave polys (VPU-bound: ~35% of the per-tick cost).

    Yaw noise uses BOTH Box-Muller outputs (x/y always did: nx = r·cos,
    ny = r·sin): the 8 PRNG rows split along lanes into n/2 radii + n/2
    angles giving n normals — half the PRNG bits, half the _fast_ln work of
    the discarded-twin form. Requires the lane halves to stay 128-aligned
    (n ≥ 2048); smaller chunks keep the two-row form."""

    def kernel(nt_ref, params_ref, seeds_ref, parts_ref, out_ref, sums_ref):
        pid = pl.program_id(0)
        n = parts_ref.shape[1]
        n8 = n // 8
        twin = n8 % 256 == 0
        yaw_rows = (8 if twin else 16) if nyaw_on else 0
        nrows = (16 if nxy else 0) + yaw_rows

        @pl.when(pid == 0)
        def _():
            sums_ref[:, :] = jnp.zeros_like(sums_ref)

        # Noise math runs on (8, n/8) blocks: a (1,n)-shaped row uses one of
        # the VPU's 8 sublanes (measured 11x slower); full-sublane blocks +
        # one free row-major reshape to (n,) at the end fix the layout.
        def tick(t, carry):
            x, y, z, roll_v, pitch_v, yaw = carry
            scale = params_ref[t, 11]
            if nrows:
                pltpu.prng_seed(seeds_ref[0, t] + pid)
                u = _uniform_from_bits(
                    pltpu.bitcast(pltpu.prng_random_bits((nrows, n8)), jnp.uint32))
            nx = ny = nyaw = 0.0
            if nxy:
                r1 = jnp.sqrt(-2.0 * _fast_ln(u[0:8]))
                nx = (r1 * _sin2pi(u[8:16] + 0.25)).reshape(n) * (params_ref[t, 7] * scale)
                ny = (r1 * _sin2pi(u[8:16])).reshape(n) * (params_ref[t, 8] * scale)
            if nyaw_on:
                v = u[nrows - yaw_rows:nrows]
                if twin:
                    n16 = n8 // 2
                    r2 = jnp.sqrt(-2.0 * _fast_ln(v[:, :n16]))
                    va = v[:, n16:]
                    zz = jnp.concatenate(
                        [r2 * _sin2pi(va + 0.25), r2 * _sin2pi(va)], axis=1)
                    nyaw = zz.reshape(n) * (params_ref[t, 9] * scale)
                else:
                    r2 = jnp.sqrt(-2.0 * _fast_ln(v[0:8]))
                    nyaw = (r2 * _sin2pi(v[8:16] + 0.25)).reshape(n) * (
                        params_ref[t, 9] * scale)

            roll, pitch = params_ref[t, 4], params_ref[t, 5]
            yaw = yaw + params_ref[t, 3] + nyaw
            yaw = jnp.mod(yaw + jnp.pi, _TWO_PI) - jnp.pi
            cr, sr = jnp.cos(roll), jnp.sin(roll)
            cp, sp = jnp.cos(pitch), jnp.sin(pitch)
            sy, cy = _sincos(yaw)
            vdt_x, vdt_y, vdt_z = params_ref[t, 0], params_ref[t, 1], params_ref[t, 2]
            x = x + (cy * cp) * vdt_x + (cy * sp * sr - sy * cr) * vdt_y \
                + (cy * sp * cr + sy * sr) * vdt_z + nx
            y = y + (sy * cp) * vdt_x + (sy * sp * sr + cy * cr) * vdt_y \
                + (sy * sp * cr - cy * sr) * vdt_z + ny
            subst = params_ref[t, 12] > 0.5
            z = jnp.where(subst, jnp.full_like(x, params_ref[t, 6]), z)
            roll_v = jnp.where(subst, jnp.full_like(x, roll), roll_v)
            pitch_v = jnp.where(subst, jnp.full_like(x, pitch), pitch_v)

            row = pl.multiple_of(t * N_SUMS, N_SUMS)
            sums_ref[pl.ds(row, N_SUMS), :] += _moment_block(
                x, y, sy, cy, n / 128.0)
            return x, y, z, roll_v, pitch_v, yaw

        carry0 = (parts_ref[0, :], parts_ref[1, :], parts_ref[2, :],
                  parts_ref[3, :], parts_ref[4, :], parts_ref[5, :])
        x, y, z, roll_v, pitch_v, yaw = jax.lax.fori_loop(
            0, nt_ref[0, 0], tick, carry0)

        out_ref[0, :] = x
        out_ref[1, :] = y
        out_ref[2, :] = z
        out_ref[3, :] = roll_v
        out_ref[4, :] = pitch_v
        out_ref[5, :] = yaw

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "nxy", "nyaw"))
def predict_call_multi(
    parts: jnp.ndarray,      # (6, N) f32
    par16: jnp.ndarray,      # (K, 16) f32 per-tick params
    seeds: jnp.ndarray,      # (K,) int32
    chunk: int = 64 * 1024,
    nxy: bool = True,
    nyaw: bool = True,
    nticks=None,             # i32 scalar: real ticks (<= K); None = all K
):
    """Up to K fused predict ticks -> (new_parts, per-tick sums (K, 8, 128)).

    ``nticks`` bounds the in-kernel tick loop: slots [nticks, K) are never
    executed and their sums rows stay zero (the segmented fast path pads
    every segment to K slots; see ``_make_kernel_multi``)."""
    n = parts.shape[1]
    K = par16.shape[0]
    chunk = min(chunk, n)
    if n % chunk:
        raise ValueError(f"particle count {n} must be divisible by chunk {chunk}")
    grid = n // chunk
    if nticks is None:
        nticks = K

    out, sums = pl.pallas_call(
        _make_kernel_multi(nxy, nyaw),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((6, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * N_SUMS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((K * N_SUMS, 128), jnp.float32),
        ],
    )(
        jnp.asarray(nticks, jnp.int32).reshape(1, 1),
        par16.astype(jnp.float32),
        jnp.asarray(seeds, jnp.int32)[None, :],
        parts.astype(jnp.float32),
    )
    return out, sums.reshape(K, N_SUMS, 128)


@functools.partial(jax.jit, static_argnames=("chunk",))
def predict_call(
    parts: jnp.ndarray,      # (6, N) f32
    par16: jnp.ndarray,      # (16,) f32 tick params (see _kernel)
    seed: jnp.ndarray,       # () int32
    chunk: int = 64 * 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw fused predict pass -> (new_parts, lane-partial sums (8,128)).

    The minimal per-tick dispatch for scanned hot loops: all tick math
    (dt, rpy, freshness gating) is precomputed vectorized over the whole
    timeline (``particle_filter.run_fast``), so the scan body is just this
    call."""
    n = parts.shape[1]
    chunk = min(chunk, n)
    if n % chunk:
        raise ValueError(f"particle count {n} must be divisible by chunk {chunk}")
    grid = n // chunk

    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
    )(
        par16[None, :].astype(jnp.float32),
        jnp.asarray(seed, jnp.int32)[None, None],
        parts.astype(jnp.float32),
    )


def make_par16(odom, dt, motion_sd, do_noise=1.0, subst=1.0) -> jnp.ndarray:
    """Tick parameter row for ``predict_call`` from a 13-dim odom sample."""
    from ..utils.geometry import rpy_from_quat

    abs_rpy = rpy_from_quat(odom[3:7])
    vdt = odom[7:10] * dt
    z = jnp.zeros((), jnp.float32)
    return jnp.stack(
        [
            vdt[0], vdt[1], vdt[2],
            odom[12] * dt,
            abs_rpy[0], abs_rpy[1],
            odom[2],
            motion_sd[0], motion_sd[1], motion_sd[5],
            z,
            jnp.asarray(do_noise, jnp.float32),
            jnp.asarray(subst, jnp.float32),
            z, z, z,
        ]
    ).astype(jnp.float32)


def finalize_moments(sums, z, roll, pitch):
    """Lane-partial sums (..., 8, 128) -> (mean6, cov3x3); broadcast-safe
    over leading time axes (z/roll/pitch substituted from odometry, as the
    fused path has always done)."""
    tot = jnp.sum(sums, axis=-1)
    count = tot[..., 7]
    mx, my = tot[..., 0] / count, tot[..., 1] / count
    yaw = jnp.arctan2(tot[..., 5] / count, tot[..., 6] / count)
    mean = jnp.stack(
        [mx, my, jnp.broadcast_to(z, mx.shape),
         jnp.broadcast_to(roll, mx.shape), jnp.broadcast_to(pitch, mx.shape),
         yaw], axis=-1)
    zero = jnp.zeros_like(mx)
    cxx = tot[..., 2] / count - mx * mx
    cyy = tot[..., 3] / count - my * my
    cxy = tot[..., 4] / count - mx * my
    row0 = jnp.stack([cxx, cxy, zero], axis=-1)
    row1 = jnp.stack([cxy, cyy, zero], axis=-1)
    row2 = jnp.stack([zero, zero, zero], axis=-1)
    cov = jnp.stack([row0, row1, row2], axis=-2)
    return mean, cov


def moment_sums(parts: jnp.ndarray) -> jnp.ndarray:
    """Lane-partial (8,128) moment sums of a (6,N) bank — the same layout
    the kernel accumulates, for post-resample refreshes outside the kernel."""
    def lanes(v):
        return jnp.sum(v.reshape(-1, 128), axis=0)

    x, y, yaw = parts[0], parts[1], parts[5]
    n = parts.shape[1]
    return jnp.stack(
        [lanes(x), lanes(y), lanes(x * x), lanes(y * y), lanes(x * y),
         lanes(jnp.sin(yaw)), lanes(jnp.cos(yaw)),
         jnp.full((128,), n / 128.0, jnp.float32)])


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

    par16 = make_par16(odom, dt, motion_sd,
                       do_noise=jnp.asarray(do_noise, jnp.float32))
    out, sums = predict_call(parts, par16, jnp.asarray(seed, jnp.int32),
                             chunk=chunk)
    abs_rpy = rpy_from_quat(odom[3:7])
    mean, cov = finalize_moments(sums, odom[2], abs_rpy[0], abs_rpy[1])
    return out, mean, cov
