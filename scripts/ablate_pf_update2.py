"""Isolate the PF GPS update's per-call pieces at shard-relevant sizes
(round 5): the k-chip projection needs full-tick(N/k) small, and ablation 1
(ablate_pf_update.py) showed big non-proportional kernel costs at 2^17.

Variants (each its own chained scan, NON-cumulative):
  prep      logw -> normalize -> counts -> starts/fits (scalar consumed)
  kernel    expand_gather_call alone, fixed plan from uniform weights
  jitter    jitter_moments_call alone
  kerjit    expansion with fused jitter tail (production fuse path)
  full      _update_resample_fast (prep + switch + kernel + jitter)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/ablate_pf_update2.py [N_log2 ...]
"""

import sys
import time

import numpy as np


def _force(x):
    return float(np.asarray(x))


def timed(fn, *args, reps=5):
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

    ns = [int(a) for a in sys.argv[1:]] or [17, 18, 20]
    R_S, R_B = 16, 64
    block, BATCH = 256, 32

    for nlog in ns:
        N = 1 << nlog
        cfg = PFConfig(particle_count=N)
        params = pf.make_params(cfg)
        key = jax.random.PRNGKey(0)
        s0 = pf.init_state(N, params, key)
        gps = jnp.asarray([5.0, -3.0], jnp.float32)

        # fixed expansion plan from uniform weights (typical-case windows)
        w_u = jnp.full((N,), 1.0 / N, jnp.float32)
        m_cum = resampling.systematic_counts(w_u, jnp.float32(0.5))
        W = block + 256
        md = m_cum[127::128]
        bounds = jnp.arange(0, N + block, block, dtype=m_cum.dtype)
        G = jnp.sum(md[None, :] <= bounds[:, None], axis=1, dtype=jnp.int32)
        base_starts = 128 * G[:-1]
        n_blocks = N // block
        batch = BATCH if (n_blocks % BATCH == 0
                          and N >= pf_kernels._merged_bw(BATCH, block, W)) \
            else 1
        BW = pf_kernels._merged_bw(batch, block, W) if batch > 1 else W
        starts = jnp.clip(base_starts, 0, N - W)
        heads = jnp.clip(starts[::batch], 0, N - BW)
        sd = jnp.sqrt(params.res_noise_cov)
        jsd = jnp.stack([sd[0], sd[1], sd[5]])

        def make(variant):
            @jax.jit
            def run(parts, keys):
                def body(p, k):
                    kr, kn = jax.random.split(k)
                    if variant == "prep":
                        pos_map = params.r_m2o @ p[0:3] \
                            + params.t_m2o[:, None]
                        dx = gps[0] - pos_map[0]
                        dy = gps[1] - pos_map[1]
                        logw = -0.5 * (dx * dx + dy * dy) / params.meas_var
                        logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
                        w = resampling.normalize_weights_det(logw)
                        u = jax.random.uniform(kr, (), jnp.float32)
                        mc = resampling.systematic_counts(w, u)
                        mdv = mc[127::128]
                        Gv = jnp.sum(mdv[None, :] <= bounds[:, None], axis=1,
                                     dtype=jnp.int32)
                        bs = 128 * Gv[:-1]
                        nub = 128 * (Gv[1:] + 1) - bs
                        return (p + (jnp.max(nub) + bs[0]).astype(jnp.float32)
                                * 1e-30, 0.0)
                    if variant == "kernel":
                        p8 = jnp.concatenate(
                            [p, jnp.zeros((2, N), jnp.float32)], axis=0)
                        r = pf_kernels.expand_gather_call(
                            m_cum, p8, starts, jnp.zeros((1,), jnp.int32),
                            N, block, W, batch=batch, heads=heads)
                        return r[0:6], 0.0
                    if variant == "jitter":
                        seed = jax.random.randint(
                            kn, (), 0, jnp.int32(2**31 - 1), dtype=jnp.int32)
                        p2, _s = pf_kernels.jitter_moments_call(p, jsd, seed)
                        return p2, 0.0
                    if variant == "kerjit":
                        p8 = jnp.concatenate(
                            [p, jnp.zeros((2, N), jnp.float32)], axis=0)
                        seed = jax.random.randint(
                            kn, (), 0, jnp.int32(2**31 - 1), dtype=jnp.int32)
                        r, _s = pf_kernels.expand_gather_call(
                            m_cum, p8, starts, jnp.zeros((1,), jnp.int32),
                            N, block, W, batch=batch, heads=heads,
                            jitter_sd=jsd, seed=seed)
                        return r[0:6], 0.0
                    p2, _s = pf._update_resample_fast(p, gps, kr, kn, params)
                    return p2, 0.0

                pout, _ = jax.lax.scan(body, parts, keys)
                return jnp.sum(pout[0, 0:128])
            return run

        keys_s = jax.random.split(jax.random.PRNGKey(1), R_S)
        keys_b = jax.random.split(jax.random.PRNGKey(1), R_B)
        for variant in ("prep", "kernel", "jitter", "kerjit", "full"):
            run = make(variant)
            t_s = timed(run, s0.particles, keys_s)
            t_b = timed(run, s0.particles, keys_b)
            per = max(t_b - t_s, 1e-9) / (R_B - R_S)
            print(f"N=2^{nlog} {variant:7s}: {per*1e6:8.1f} us/call "
                  f"(batch={batch})", flush=True)


if __name__ == "__main__":
    main()
