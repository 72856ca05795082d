"""Probe which adaptive-W branch the PF resample switch takes during a
chained sequence of real GPS updates (round 5: 'full' at 2^18 measured
~3x its parts; hypothesis: wide-W variants or the exact fallback fire).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/probe_pf_switch.py [N_log2 ...]
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.configs import PFConfig
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.ops import pf_kernels, resampling

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    ns = [int(a) for a in sys.argv[1:]] or [17, 18, 19]
    R = 64
    block, BATCH = 256, 32

    for nlog in ns:
        N = 1 << nlog
        cfg = PFConfig(particle_count=N)
        params = pf.make_params(cfg)
        key = jax.random.PRNGKey(0)
        s0 = pf.init_state(N, params, key)
        gps = jnp.asarray([5.0, -3.0], jnp.float32)

        Ws = sorted(set(
            w for w in pf_kernels._w_tiers(block) if w <= N))

        @jax.jit
        def probe(parts, keys):
            def body(p, k):
                kr, kn = jax.random.split(k)
                pos_map = params.r_m2o @ p[0:3] + params.t_m2o[:, None]
                dx = gps[0] - pos_map[0]
                dy = gps[1] - pos_map[1]
                logw = -0.5 * (dx * dx + dy * dy) / params.meas_var
                logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
                w = resampling.normalize_weights_det(logw)
                u = jax.random.uniform(kr, (), jnp.float32)
                mc = resampling.systematic_counts(w, u)
                md = mc[127::128]
                bounds = jnp.arange(0, N + block, block, dtype=mc.dtype)
                G = jnp.sum(md[None, :] <= bounds[:, None], axis=1,
                            dtype=jnp.int32)
                bs = 128 * G[:-1]
                nub = 128 * (G[1:] + 1) - bs
                mx = jnp.max(nub)
                # merged-window condition per W
                flags = []
                for W in Ws:
                    batch = BATCH if (N // block % BATCH == 0 and
                                      N >= pf_kernels._merged_bw(
                                          BATCH, block, W)) else 1
                    BW = pf_kernels._merged_bw(batch, block, W) \
                        if batch > 1 else W
                    st = jnp.clip(bs, 0, N - W)
                    hd = jnp.clip(st[::batch], 0, N - BW)
                    f = (mx <= W) & (jnp.max(
                        st - jnp.repeat(hd, batch)) <= BW - W)
                    flags.append(f)
                idx = jnp.asarray(len(Ws), jnp.int32)
                for kk in range(len(Ws) - 1, -1, -1):
                    idx = jnp.where(flags[kk], jnp.asarray(kk, jnp.int32),
                                    idx)
                p2, _s = pf._update_resample_fast(p, gps, kr, kn, params)
                return p2, (idx, mx)

            pout, (idxs, mxs) = jax.lax.scan(body, parts, keys)
            return idxs, mxs

        keys = jax.random.split(jax.random.PRNGKey(1), R)
        idxs, mxs = probe(s0.particles, keys)
        idxs = np.asarray(idxs)
        mxs = np.asarray(mxs)
        counts = {f"W{Ws[i]}": int((idxs == i).sum()) for i in range(len(Ws))}
        counts["exact"] = int((idxs == len(Ws)).sum())
        print(f"N=2^{nlog} Ws={Ws} branch counts {counts} "
              f"need_ub max: med {np.median(mxs):.0f} max {mxs.max()}",
              flush=True)


if __name__ == "__main__":
    main()
