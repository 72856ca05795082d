"""Decompose the combined north-star tick: PF-alone vs SLAM-B=1-alone vs
combined, slope protocol (docs/ROOFLINE.md). Foreground TPU script.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_combined.py
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


def slope(fn, a_s, a_b, u_s, u_b, reps=3):
    t_s = timed(fn, *a_s, reps=reps)
    t_b = timed(fn, *a_b, reps=reps)
    print(f"#   t_small={t_s*1e3:.1f} ms  t_big={t_b*1e3:.1f} ms", file=sys.stderr)
    if t_b - t_s <= 0:
        # on this backend a single measurement is untrustworthy; a
        # non-positive slope means the measurement failed — flag it instead
        # of printing an absurdly fast us/tick (round-3 advisor finding)
        print("# WARN: non-positive slope, measurement unreliable",
              file=sys.stderr)
    return max(t_b - t_s, 1e-9) / (u_b - u_s)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.configs import PFConfig
    from smarc_navigation_tpu.io import workloads
    from smarc_navigation_tpu.models import ekf_slam as slam
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.parallel import fleet

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # the EXACT workload bench.py's combined section times (io.workloads is
    # the single source — a drift there changes both measurements together)
    cfg = workloads.combined_slam_cfg()
    slam_params = slam.make_params(cfg)
    n_particles = 1_048_576
    pf_cfg = PFConfig(particle_count=n_particles)
    pf_params = pf.make_params(pf_cfg)

    def mk(duration):
        return workloads.combined_workload(cfg, duration)

    a_s, a_b = mk(15.0), mk(60.0)
    T_s, T_b = int(a_s[1].ticks.shape[0]), int(a_b[1].ticks.shape[0])

    # --- (a) SLAM B=1 alone (the event-compacted path run_combined uses) ---
    def run_slam(ts, tp):
        final_s, _ = slam.run_fleet_compact(ts, slam_params, cfg)
        return jnp.sum(final_s.mu[:, 0:6]) + jnp.sum(final_s.n_active)

    per = slope(run_slam, a_s, a_b, T_s, T_b)
    print(f"# slam B=1 alone (compacted): {per*1e6:.0f} us/tick", file=sys.stderr)

    # --- (a') the dense fleet path, for the compaction delta ---
    slam_jit = fleet._slam_fleet_jit(cfg)

    def run_slam_dense(ts, tp):
        final_s, _ = slam_jit(ts, slam_params)
        return jnp.sum(final_s.mu[:, 0:6]) + jnp.sum(final_s.n_active)

    per = slope(run_slam_dense, a_s, a_b, T_s, T_b)
    print(f"# slam B=1 alone (dense):     {per*1e6:.0f} us/tick", file=sys.stderr)

    # --- (b) PF alone, same path as combined ---
    def run_pf(ts, tp):
        _, out_pf = pf.run(tp, pf_params, pf_cfg, n_particles=n_particles,
                           scheme="systematic", use_pallas=True)
        return jnp.sum(out_pf["mean"])

    per = slope(run_pf, a_s, a_b, T_s, T_b)
    print(f"# pf 1M alone:    {per*1e6:.0f} us/tick", file=sys.stderr)

    # --- (c) combined ---
    def run_c(ts, tp):
        return fleet.run_combined(ts, tp, slam_params, cfg, pf_params,
                                  pf_cfg, n_particles)

    per = slope(run_c, a_s, a_b, T_s, T_b)
    print(f"# combined:       {per*1e6:.0f} us/tick -> {0.1/per:,.0f}x",
          file=sys.stderr)


if __name__ == "__main__":
    main()
