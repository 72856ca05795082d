"""Decompose the combined north-star tick: PF-alone vs SLAM-B=1-alone vs
combined, slope protocol (docs/ROOFLINE.md). Foreground TPU script.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_combined.py
"""
import dataclasses
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
    return max(t_b - t_s, 1e-9) / (u_b - u_s)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.configs import EKFSlamConfig, PFConfig
    from smarc_navigation_tpu.io import sim
    from smarc_navigation_tpu.models import ekf_slam as slam
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.ops.timeline import build_timeline
    from smarc_navigation_tpu.parallel import fleet
    from smarc_navigation_tpu.utils.geometry import quat_from_rpy

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    cfg = dataclasses.replace(
        EKFSlamConfig(), max_landmarks=64, max_obs=8,
        mhl_dist_mbes=1.0, q_mbes_diag=(0.1, 0.1, 0.1), r_diag=(1e-3,) * 6,
    )
    slam_params = slam.make_params(cfg)
    n_particles = 1_048_576
    pf_cfg = PFConfig(particle_count=n_particles)
    pf_params = pf.make_params(pf_cfg)

    def slam_tl(duration):
        m = sim.simulate(sim.MissionSpec(
            duration_s=duration, num_landmarks=20, mbes_std=0.05,
            landmark_area_m=60.0, mbes_range_m=30.0, gps_surface_z=-100.0,
            gps_std=0.3, seed=0))
        ticks = np.arange(0, duration + 1e-9, 1.0 / cfg.system_freq)
        gt = m.gt_at(ticks)
        quat = np.asarray(quat_from_rpy(jnp.asarray(gt[:, 3:6])))
        k = np.clip((ticks * m.spec.sim_hz).astype(int), 0, len(m.t) - 1)
        odom13 = np.concatenate([gt[:, 0:3], quat, m.vel_body[k], m.gyro[k]], axis=1)
        det = m.streams["mbes_detections"]
        gps = m.streams["gps"]
        return build_timeline(
            t0=0.0, t1=duration, freq_hz=cfg.system_freq,
            channels={"odom": (ticks, odom13), "gps": (gps["stamps"], gps["values"]),
                      "diving": (ticks, np.zeros((len(ticks), 1)))},
            events={"mbes": (det["stamps"], det["values"], det["burst"], cfg.max_obs)})

    def mk(duration):
        tl_slam = fleet.batch_timelines([slam_tl(duration)])
        m = sim.simulate(sim.MissionSpec(duration_s=duration, seed=3,
                                         gps_surface_z=-100.0))
        tl_pf = pf.pf_timeline(m, freq_hz=10.0)
        return tl_slam, tl_pf

    a_s, a_b = mk(15.0), mk(60.0)
    T_s, T_b = int(a_s[1].ticks.shape[0]), int(a_b[1].ticks.shape[0])

    # --- (a) SLAM B=1 alone (the fleet path the combined workload uses) ---
    slam_jit = fleet._slam_fleet_jit(cfg)

    def run_slam(ts, tp):
        final_s, _ = slam_jit(ts, slam_params)
        return jnp.sum(final_s.mu[:, 0:6]) + jnp.sum(final_s.n_active)

    per = slope(run_slam, a_s, a_b, T_s, T_b)
    print(f"# slam B=1 alone: {per*1e6:.0f} us/tick", file=sys.stderr)

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
