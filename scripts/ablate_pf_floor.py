"""Decompose the PF-1M segmented fast path's non-update floor (round-3
verdict #7 follow-up): full tick = predict kernel (~40 us) + GPS update
(~200 us amortized) + an unexplained ~73 us/tick residual. Variants strip
the segment-scan body one layer at a time, all on the EXACT production
plan (particle_filter._segment_arrays + _segment_inputs), on the combined
north-star PF timeline (io.workloads.combined_workload).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_pf_floor.py
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
    from smarc_navigation_tpu.io import workloads
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.ops import pf_kernels

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    N = 1 << 20
    cfg = PFConfig(particle_count=N)
    params = pf.make_params(cfg)
    scfg = workloads.combined_slam_cfg()

    def pf_tl(duration):
        return workloads.combined_workload(scfg, duration)[1]

    tl_s, tl_b = pf_tl(15.0), pf_tl(60.0)
    T_s, T_b = int(tl_s.ticks.shape[0]), int(tl_b.ticks.shape[0])

    mc = np.asarray(params.motion_cov)
    nxy = bool(mc[0] > 0 or mc[1] > 0)
    nyaw_on = bool(mc[5] > 0)
    k_max = 12
    print(f"# nxy={nxy} nyaw={nyaw_on} ticks {T_s}/{T_b}", file=sys.stderr)

    def make_runner(variant):
        import functools

        @functools.partial(jax.jit, static_argnames=())
        def _run(timeline, key, s0_particles, idx_j, valid_j, upd_seg_j,
                 upd_tick_j, upd_slot_j, flat_slot_j):
            (seg_par, seg_seeds, seg_gps, seg_kr, seg_kn,
             vals, rpy, lf, key) = pf._segment_inputs(
                timeline, params, key, idx_j, valid_j, upd_tick_j)
            S, K = idx_j.shape

            def body(parts, xs):
                p16, sds, upd, gxy, kr, kn, uslot = xs
                if variant == "empty":
                    return parts, jnp.zeros(
                        (K, pf_kernels.N_SUMS, 128), jnp.float32
                    ) + 1e-30 * p16[0, 0]
                parts, sums = pf_kernels.predict_call_multi(
                    parts, p16, sds, nxy=nxy, nyaw=nyaw_on, nticks=uslot + 1)
                if variant == "no-upd":
                    return parts, sums
                if variant == "cond-id":
                    parts, sums = jax.lax.cond(
                        upd, lambda a: (a[0] + 1e-30, a[1]), lambda a: a,
                        (parts, sums))
                    return parts, sums
                def do_upd(args):
                    p, s = args
                    p2, s2 = pf._update_resample_fast(p, gxy, kr, kn, params)
                    return p2, s.at[uslot].set(s2)
                parts, sums = jax.lax.cond(upd, do_upd, lambda a: a,
                                           (parts, sums))
                return parts, sums

            if variant == "no-scan":
                final_parts = s0_particles
                sums_sk = jnp.zeros(
                    (S, K, pf_kernels.N_SUMS, 128), jnp.float32
                ) + 1e-30 * jnp.sum(seg_par)
            else:
                final_parts, sums_sk = jax.lax.scan(
                    body, s0_particles,
                    (seg_par, seg_seeds, upd_seg_j, seg_gps, seg_kr, seg_kn,
                     upd_slot_j))
            sums_t = sums_sk.reshape(
                S * K, pf_kernels.N_SUMS, 128)[flat_slot_j]
            mean, _cov = pf_kernels.finalize_moments(
                sums_t, vals[:, 2], rpy[:, 0], rpy[:, 1])
            return jnp.sum(jnp.where(jnp.isfinite(mean), mean, 0.0)) \
                + jnp.sum(final_parts[0, 0:128])

        def run(tl):
            upd_host = np.asarray(
                tl.channels["gps"].fresh
                & (tl.channels["diving"].value[:, 0] < 0.5))
            idx, valid, upd_seg, upd_tick, upd_slot, flat_slot = \
                pf._segment_arrays(upd_host, k_max)
            key = jax.random.PRNGKey(0)
            s0 = pf.init_state(N, params, key)
            return _run(tl, key, s0.particles, jnp.asarray(idx),
                        jnp.asarray(valid), jnp.asarray(upd_seg),
                        jnp.asarray(upd_tick), jnp.asarray(upd_slot),
                        jnp.asarray(flat_slot))

        return run

    # cross-check: the public production path
    pub = lambda t: jnp.sum(pf.run(  # noqa: E731
        t, params, cfg, n_particles=N, scheme="systematic",
        use_pallas=True)[1]["mean"])
    t_s, t_b = timed(pub, tl_s), timed(pub, tl_b)
    per = max(t_b - t_s, 1e-9) / (T_b - T_s)
    print(f"public-run: {per*1e6:.1f} us/tick ({0.1/per:,.0f}x)", flush=True)

    for variant in ("full", "no-upd", "cond-id", "empty", "no-scan"):
        run = make_runner(variant)
        t_s, t_b = timed(run, tl_s), timed(run, tl_b)
        if t_b - t_s <= 0:
            print("# WARN: non-positive slope, measurement unreliable",
                  file=sys.stderr)
        per = max(t_b - t_s, 1e-9) / (T_b - T_s)
        print(f"{variant}: {per*1e6:.1f} us/tick", flush=True)


if __name__ == "__main__":
    main()
