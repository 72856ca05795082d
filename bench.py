"""Benchmark: EKF-SLAM fleet steps/sec + 1M-particle MCL updates/sec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference's EKF-SLAM runs at a fixed 10 Hz wall-clock
tick on CPU (``auv_ekf_slam/launch/ekf_slam.launch:23``) — one mission, one
process. vs_baseline is therefore (aggregate filter steps/sec) / 10: how
many reference-node-seconds of work one chip does per second.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import smarc_navigation_tpu  # noqa: F401  (sets matmul precision)
    from smarc_navigation_tpu.configs import EKFSlamConfig, PFConfig
    from smarc_navigation_tpu.io import sim
    from smarc_navigation_tpu.models import ekf_slam as slam
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.parallel import fleet

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # ---- mission + timelines ------------------------------------------------
    duration = 60.0
    cfg = dataclasses.replace(
        EKFSlamConfig(),
        max_landmarks=64,
        max_obs=8,
        mhl_dist_mbes=1.0,
        q_mbes_diag=(0.1, 0.1, 0.1),
        r_diag=(1e-3,) * 6,
    )
    B = 128  # fleet width (missions per chip; throughput saturates ~here)

    tls = []
    for b in range(min(B, 16)):  # 16 distinct missions, tiled to B
        m = sim.simulate(
            sim.MissionSpec(
                duration_s=duration,
                num_landmarks=20,
                mbes_std=0.05,
                landmark_area_m=60.0,
                mbes_range_m=30.0,
                gps_surface_z=-100.0,
                gps_std=0.3,
                seed=b,
            )
        )
        ticks = np.arange(0, duration + 1e-9, 1.0 / cfg.system_freq)
        gt = m.gt_at(ticks)
        from smarc_navigation_tpu.utils.geometry import quat_from_rpy

        quat = np.asarray(quat_from_rpy(jnp.asarray(gt[:, 3:6])))
        k = np.clip((ticks * m.spec.sim_hz).astype(int), 0, len(m.t) - 1)
        odom13 = np.concatenate([gt[:, 0:3], quat, m.vel_body[k], m.gyro[k]], axis=1)
        det = m.streams["mbes_detections"]
        gps = m.streams["gps"]
        from smarc_navigation_tpu.ops.timeline import build_timeline

        tls.append(
            build_timeline(
                t0=0.0,
                t1=duration,
                freq_hz=cfg.system_freq,
                channels={
                    "odom": (ticks, odom13),
                    "gps": (gps["stamps"], gps["values"]),
                    "diving": (ticks, np.zeros((len(ticks), 1))),
                },
                events={"mbes": (det["stamps"], det["values"], det["burst"], cfg.max_obs)},
            )
        )
    tls = (tls * ((B + len(tls) - 1) // len(tls)))[:B]
    batched = fleet.batch_timelines(tls)
    T = int(batched.ticks.shape[1])

    slam_params = slam.make_params(cfg)
    pf_cfg = PFConfig(particle_count=1024)
    pf_params = pf.make_params(pf_cfg)

    # ---- EKF-SLAM fleet -----------------------------------------------------
    def run_slam_fleet(t):
        def one(tl):
            final, out = slam.run(tl, slam_params, cfg)
            return final.mu[0:6], final.n_active

        return jax.vmap(one)(t)

    run1 = jax.jit(run_slam_fleet)
    mus, nact = run1(batched)
    jax.block_until_ready(mus)
    t0 = time.perf_counter()
    mus, nact = run1(batched)
    jax.block_until_ready(mus)
    dt_slam = time.perf_counter() - t0
    slam_steps_per_sec = B * T / dt_slam
    print(
        f"# ekf-slam fleet: {B} missions x {T} ticks in {dt_slam:.3f}s "
        f"-> {slam_steps_per_sec:,.0f} steps/s "
        f"({slam_steps_per_sec / cfg.system_freq:,.0f}x real-time aggregate); "
        f"mean landmarks {float(np.mean(np.asarray(nact))):.1f}",
        file=sys.stderr,
    )

    # ---- 1M-particle MCL (fused Pallas predict, systematic resampling) ------
    n_particles = 1_048_576
    tl0 = tls[0]
    run_pf = jax.jit(
        lambda t: pf.run(
            t, pf_params, pf_cfg, n_particles=n_particles,
            scheme="systematic", use_pallas=True,
        )[1]["mean"]
    )
    mean = run_pf(tl0)
    jax.block_until_ready(mean)
    t0 = time.perf_counter()
    mean = run_pf(tl0)
    jax.block_until_ready(mean)
    dt_pf = time.perf_counter() - t0
    pf_updates_per_sec = n_particles * T / dt_pf
    print(
        f"# pf: {n_particles:,} particles x {T} ticks in {dt_pf:.3f}s "
        f"-> {pf_updates_per_sec:,.3g} particle-updates/s "
        f"({T / cfg.system_freq / dt_pf:,.0f}x real-time)",
        file=sys.stderr,
    )

    # ---- EKF localization fleet ----------------------------------------------
    from smarc_navigation_tpu.configs import EKFLocConfig
    from smarc_navigation_tpu.models import ekf_localization as loc

    cfg_loc = dataclasses.replace(
        EKFLocConfig(), stone_offset=0.0, r_diag=(1e-4,) * 3 + (1e-6,) * 3,
        q_diag=(0.25,) * 3,
    )
    m_loc = sim.simulate(
        sim.MissionSpec(duration_s=duration, num_landmarks=16, dvl_std=0.05,
                        mbes_std=0.05, seed=7)
    )
    tl_loc = loc.loc_timeline(m_loc, cfg_loc)
    params_loc = loc.make_params(m_loc.landmarks, cfg_loc)
    B_loc = 64
    batched_loc = fleet.batch_timelines([tl_loc] * B_loc)
    T_loc = int(batched_loc.ticks.shape[1])
    run_loc = jax.jit(
        lambda t: jax.vmap(lambda x: loc.run(x, params_loc, cfg_loc)[1]["mu"][-1, 0])(t)
    )
    r = run_loc(batched_loc)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run_loc(batched_loc)
    jax.block_until_ready(r)
    dt_loc = time.perf_counter() - t0
    loc_steps = B_loc * T_loc / dt_loc
    print(
        f"# ekf-localization fleet: {B_loc} x {T_loc} ticks in {dt_loc:.3f}s -> "
        f"{loc_steps:,.0f} steps/s ({loc_steps / cfg_loc.system_freq:,.0f}x the 50 Hz node)",
        file=sys.stderr,
    )

    # ---- closed-loop Monte-Carlo raycast fleet -------------------------------
    from smarc_navigation_tpu.ops import raycast
    from smarc_navigation_tpu.parallel.fleet import run_raycast_fleet

    B_rc = 256
    T_rc = 301  # 30 s at 10 Hz
    rng = np.random.default_rng(0)
    ticks_rc = np.arange(T_rc) / cfg.system_freq
    base_m = sim.simulate(sim.MissionSpec(duration_s=30.0, seed=1))
    gt_one = base_m.gt_at(ticks_rc).astype(np.float32)
    gt_tracks = jnp.asarray(np.tile(gt_one, (B_rc, 1, 1)))
    lms = jnp.asarray(
        rng.uniform([0, -20, -16], [40, 20, -12], (B_rc, 16, 3)), jnp.float32
    )
    lmm = jnp.ones((B_rc, 16), bool)
    spec = raycast.MBESSpec(num_beams=64, floor_z=-16.0, rock_radius=1.2,
                            swath_rad=2.4, max_range=40.0)
    cfg_rc = dataclasses.replace(cfg, max_landmarks=32)
    params_rc = slam.make_params(cfg_rc)
    run_rc = jax.jit(
        lambda g, l, m_: run_raycast_fleet(g, l, m_, cfg_rc, params_rc, spec)[1][0]
    )
    mus_rc = run_rc(gt_tracks, lms, lmm)
    jax.block_until_ready(mus_rc)
    t0 = time.perf_counter()
    mus_rc = run_rc(gt_tracks, lms, lmm)
    jax.block_until_ready(mus_rc)
    dt_rc = time.perf_counter() - t0
    rc_steps = B_rc * T_rc / dt_rc
    print(
        f"# raycast fleet: {B_rc} missions x {T_rc} ticks (render+perceive+slam) "
        f"in {dt_rc:.3f}s -> {rc_steps:,.0f} closed-loop steps/s",
        file=sys.stderr,
    )

    value = slam_steps_per_sec
    print(
        json.dumps(
            {
                "metric": "ekf_slam_filter_steps_per_sec_fleet128",
                "value": round(value, 1),
                "unit": "steps/s",
                "vs_baseline": round(value / 10.0, 1),
                "secondary": {
                    "pf_particle_updates_per_sec_1M": round(pf_updates_per_sec, 1),
                    "pf_realtime_factor_1M_particles": round(T / cfg.system_freq / dt_pf, 1),
                    "slam_realtime_factor_aggregate": round(value / cfg.system_freq, 1),
                    "raycast_fleet_closed_loop_steps_per_sec_256": round(rc_steps, 1),
                    "ekf_localization_steps_per_sec_fleet64": round(loc_steps, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
