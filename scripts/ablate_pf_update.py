"""Decompose the PF GPS update call (round-5 VERDICT #5 / #1): the k-chip
north-star projection is capped by the update's N-independent fixed cost
(~0.5-0.6 ms/call of XLA prep around the 1.28 ms expansion kernel at 2^20).
This ablation times the update's stages CUMULATIVELY inside a chained scan
(same dispatch regime as the production segment scan) so the per-call cost
of each stage is the difference between consecutive variants.

Stages (cumulative):
  base     scan glue only (1 elementwise op on the bank)
  weights  + logw chain + normalize_weights_det (2 halving-tree sums)
  counts   + blocked_cdf + ceil/clip + blockwise cummax
  starts   + 128-decimated window starts + fits guards
  resample + the one-hot/MXU expansion kernel (no jitter fusion)
  full     + fused jitter tail (= production _update_resample_fast)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/ablate_pf_update.py [N_log2 ...]
"""

import sys
import time

import numpy as np


def _force(x):
    return float(np.asarray(x))


def timed(fn, *args, reps=3):
    _force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.configs import PFConfig
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.ops import pf_kernels, resampling

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    ns = [int(a) for a in sys.argv[1:]] or [20, 17]
    R_S, R_B = 16, 64

    for nlog in ns:
        N = 1 << nlog
        cfg = PFConfig(particle_count=N)
        params = pf.make_params(cfg)
        key = jax.random.PRNGKey(0)
        s0 = pf.init_state(N, params, key)
        gps = jnp.asarray([5.0, -3.0], jnp.float32)

        def make(variant):
            @jax.jit
            def run(parts, keys):
                def body(p, k):
                    kr, kn = jax.random.split(k)
                    if variant == "base":
                        return p * 0.999 + 0.001, 0.0
                    pos_map = params.r_m2o @ p[0:3] + params.t_m2o[:, None]
                    dx = gps[0] - pos_map[0]
                    dy = gps[1] - pos_map[1]
                    logw = -0.5 * (dx * dx + dy * dy) / params.meas_var
                    logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
                    w = resampling.normalize_weights_det(logw)
                    if variant == "weights":
                        return p + w[0] * 1e-30, 0.0
                    u = jax.random.uniform(kr, (), jnp.float32)
                    m_cum = resampling.systematic_counts(w, u)
                    if variant == "counts":
                        return p + m_cum[0].astype(jnp.float32) * 1e-30, 0.0
                    block = 256
                    md = m_cum[127::128]
                    bounds = jnp.arange(0, N + block, block,
                                        dtype=m_cum.dtype)
                    G = jnp.sum(md[None, :] <= bounds[:, None], axis=1,
                                dtype=jnp.int32)
                    base_starts = 128 * G[:-1]
                    need_ub = 128 * (G[1:] + 1) - base_starts
                    if variant == "starts":
                        return (p + (jnp.max(need_ub)
                                     + base_starts[0]).astype(jnp.float32)
                                * 1e-30, 0.0)
                    if variant == "resample":
                        p2 = pf_kernels.systematic_resample_gather(p, w, kr)
                        return p2, 0.0
                    p2, _s = pf._update_resample_fast(p, gps, kr, kn, params)
                    return p2, 0.0

                pout, _ = jax.lax.scan(body, parts, keys)
                return jnp.sum(pout[0, 0:128])
            return run

        keys_s = jax.random.split(jax.random.PRNGKey(1), R_S)
        keys_b = jax.random.split(jax.random.PRNGKey(1), R_B)
        prev = 0.0
        for variant in ("base", "weights", "counts", "starts",
                        "resample", "full"):
            run = make(variant)
            t_s = timed(run, s0.particles, keys_s)
            t_b = timed(run, s0.particles, keys_b)
            per = max(t_b - t_s, 1e-9) / (R_B - R_S)
            print(f"N=2^{nlog} {variant:9s}: {per*1e6:8.1f} us/call "
                  f"(+{(per - prev)*1e6:7.1f})", flush=True)
            prev = per


if __name__ == "__main__":
    main()
