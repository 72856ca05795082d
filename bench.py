"""Benchmark: EKF-SLAM fleet steps/sec + 1M-particle MCL on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference's EKF-SLAM runs at a fixed 10 Hz wall-clock
tick on CPU (``auv_ekf_slam/launch/ekf_slam.launch:23``) — one mission, one
process. vs_baseline is therefore (aggregate filter steps/sec) / 10: how
many reference-node-seconds of work one chip does per second.

Timing protocol (this backend): ``jax.block_until_ready`` does not reliably
synchronize through the axon tunnel and a fixed ~24 ms dispatch+fetch
round-trip dominates single calls. Every workload is therefore measured as
the SLOPE between a short and a long run of the same jitted program (same
shapes except the time axis), each forced by fetching a jnp.sum scalar —
fixed costs cancel, and the number is work actually executed.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def _force(x):
    return float(np.asarray(x))


def timed(fn, *args, reps=3):
    """Best-of-reps wall time of fn(*args) forced via a scalar fetch."""
    _force(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn, args_small, args_big, units_small, units_big, reps=3):
    """Marginal seconds per work unit between two run lengths."""
    t_small = timed(fn, *args_small, reps=reps)
    t_big = timed(fn, *args_big, reps=reps)
    return max(t_big - t_small, 1e-9) / (units_big - units_small)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import smarc_navigation_tpu  # noqa: F401  (sets matmul precision)
    from smarc_navigation_tpu.configs import EKFSlamConfig, PFConfig
    from smarc_navigation_tpu.io import sim
    from smarc_navigation_tpu.models import ekf_slam as slam
    from smarc_navigation_tpu.models import particle_filter as pf
    from smarc_navigation_tpu.ops.timeline import build_timeline
    from smarc_navigation_tpu.parallel import fleet
    from smarc_navigation_tpu.utils.geometry import quat_from_rpy

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    def slam_timelines(cfg, duration, B):
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
            quat = np.asarray(quat_from_rpy(jnp.asarray(gt[:, 3:6])))
            k = np.clip((ticks * m.spec.sim_hz).astype(int), 0, len(m.t) - 1)
            odom13 = np.concatenate(
                [gt[:, 0:3], quat, m.vel_body[k], m.gyro[k]], axis=1
            )
            det = m.streams["mbes_detections"]
            gps = m.streams["gps"]
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
                    events={
                        "mbes": (det["stamps"], det["values"], det["burst"], cfg.max_obs)
                    },
                )
            )
        tls = (tls * ((B + len(tls) - 1) // len(tls)))[:B]
        return fleet.batch_timelines(tls)

    # ---- EKF-SLAM fleet (headline: L=64 working shapes) ----------------------
    cfg = dataclasses.replace(
        EKFSlamConfig(),
        max_landmarks=64,
        max_obs=8,
        mhl_dist_mbes=1.0,
        q_mbes_diag=(0.1, 0.1, 0.1),
        r_diag=(1e-3,) * 6,
    )
    B = 128
    slam_params = slam.make_params(cfg)

    def run_slam_fleet(t):
        # fleet path: in-lanes JV assignment kernel (ops/slam_da_kernels.py)
        final, out = slam.run_fleet(t, slam_params, cfg)
        return jnp.sum(final.mu[:, 0:6]) + jnp.sum(final.n_active)

    run1 = jax.jit(run_slam_fleet)
    b_small = slam_timelines(cfg, 15.0, B)
    b_big = slam_timelines(cfg, 60.0, B)
    T_s, T_b = int(b_small.ticks.shape[1]), int(b_big.ticks.shape[1])
    per_tick = slope(run1, (b_small,), (b_big,), T_s, T_b)
    slam_steps_per_sec = B / per_tick
    print(
        f"# ekf-slam fleet (L=64): {B} x ({T_s}->{T_b}) ticks, "
        f"{per_tick*1e6:.0f} us/fleet-tick -> {slam_steps_per_sec:,.0f} steps/s "
        f"({slam_steps_per_sec / cfg.system_freq:,.0f}x real-time aggregate)",
        file=sys.stderr,
    )

    # ---- EKF-SLAM fleet at reference-advertised shapes ------------------------
    # padded 256-landmark state, reference launch tunings
    # (ekf_slam.launch:23-30: mhl_mbes 0.12, Q_mbes diag 200, R 1e-3)
    cfg256 = dataclasses.replace(
        EKFSlamConfig(),
        max_landmarks=256,
        max_obs=8,
    )
    B256 = 32
    params256 = slam.make_params(cfg256)

    def run_slam_fleet256(t):
        final, out = slam.run_fleet(t, params256, cfg256)
        return jnp.sum(final.mu[:, 0:6]) + jnp.sum(final.n_active)

    run256 = jax.jit(run_slam_fleet256)
    b256_small = slam_timelines(cfg256, 15.0, B256)
    b256_big = slam_timelines(cfg256, 60.0, B256)
    per_tick256 = slope(run256, (b256_small,), (b256_big,), T_s, T_b)
    slam256_steps = B256 / per_tick256
    print(
        f"# ekf-slam fleet (L=256 ref-tuned): {B256} missions, "
        f"{per_tick256*1e6:.0f} us/fleet-tick -> {slam256_steps:,.0f} steps/s",
        file=sys.stderr,
    )

    # ---- 1M-particle MCL (fused Pallas predict, systematic resampling) -------
    n_particles = 1_048_576
    pf_cfg = PFConfig(particle_count=n_particles)
    pf_params = pf.make_params(pf_cfg)

    def pf_tl(duration):
        m = sim.simulate(
            sim.MissionSpec(duration_s=duration, seed=3, gps_surface_z=-100.0)
        )
        return pf.pf_timeline(m, freq_hz=10.0)

    # NOT wrapped in jax.jit: a concrete timeline lets pf.run segment the
    # mission on host and use the multi-tick kernel (jits internally)
    run_pf = lambda t: jnp.sum(  # noqa: E731
        pf.run(
            t, pf_params, pf_cfg, n_particles=n_particles,
            scheme="systematic", use_pallas=True,
        )[1]["mean"]
    )
    tl_pf_small, tl_pf_big = pf_tl(15.0), pf_tl(60.0)
    Tp_s, Tp_b = int(tl_pf_small.ticks.shape[0]), int(tl_pf_big.ticks.shape[0])
    pf_per_tick = slope(run_pf, (tl_pf_small,), (tl_pf_big,), Tp_s, Tp_b)
    pf_updates_per_sec = n_particles / pf_per_tick
    pf_rt = 0.1 / pf_per_tick  # ticks are 10 Hz
    print(
        f"# pf: {n_particles:,} particles, {pf_per_tick*1e6:.0f} us/tick -> "
        f"{pf_updates_per_sec:,.3g} particle-updates/s ({pf_rt:,.0f}x real-time)",
        file=sys.stderr,
    )

    # ---- EKF localization fleet ----------------------------------------------
    from smarc_navigation_tpu.configs import EKFLocConfig
    from smarc_navigation_tpu.models import ekf_localization as loc

    cfg_loc = dataclasses.replace(
        EKFLocConfig(), stone_offset=0.0, r_diag=(1e-4,) * 3 + (1e-6,) * 3,
        q_diag=(0.25,) * 3,
    )
    B_loc = 64

    def loc_batch(duration):
        m_loc = sim.simulate(
            sim.MissionSpec(duration_s=duration, num_landmarks=16, dvl_std=0.05,
                            mbes_std=0.05, seed=7)
        )
        tl_loc = loc.loc_timeline(m_loc, cfg_loc)
        return fleet.batch_timelines([tl_loc] * B_loc), m_loc

    bl_small, m_small = loc_batch(15.0)
    bl_big, m_big = loc_batch(60.0)
    params_loc = loc.make_params(m_big.landmarks, cfg_loc)
    # whole-tick missions-in-lanes Pallas kernel (ops/loc_kernels.py)
    run_loc = jax.jit(
        lambda t: jnp.sum(loc.run_fleet(t, params_loc, cfg_loc)[1]["mu"])
    )
    Tl_s, Tl_b = int(bl_small.ticks.shape[1]), int(bl_big.ticks.shape[1])
    loc_per_tick = slope(run_loc, (bl_small,), (bl_big,), Tl_s, Tl_b)
    loc_steps = B_loc / loc_per_tick
    print(
        f"# ekf-localization fleet: {B_loc} missions, {loc_per_tick*1e6:.1f} "
        f"us/fleet-tick -> {loc_steps:,.0f} steps/s "
        f"({loc_steps / cfg_loc.system_freq:,.0f}x the 50 Hz node)",
        file=sys.stderr,
    )

    # ---- 15-state dual EKF fleet (lanes kernel) ------------------------------
    from smarc_navigation_tpu.models import ekf_15state as e15
    from smarc_navigation_tpu.ops import ekf15_kernels

    cfg15 = e15.Ekf15Config(frequency=50.0)
    r15 = {}
    T15 = {}
    for dur, key in ((15.0, "s"), (240.0, "b")):
        m15 = sim.simulate(sim.MissionSpec(duration_s=dur, seed=5))
        tl15 = e15.ekf15_timeline(m15, cfg15, include_gps=True)
        bt15 = fleet.batch_timelines([tl15] * 64)
        T15[key] = int(bt15.ticks.shape[1])
        fn15 = lambda t: jnp.sum(ekf15_kernels.run_fleet15(t, cfg15)[1]["x"])
        r15[key] = timed(fn15, bt15)
    per15 = max(r15["b"] - r15["s"], 1e-9) / (T15["b"] - T15["s"])
    e15_steps = 64 / per15
    print(
        f"# ekf15 fleet (lanes kernel): 64 missions, {per15*1e6:.2f} us/fleet-tick"
        f" -> {e15_steps:,.0f} steps/s",
        file=sys.stderr,
    )

    # ---- closed-form SAM dead-reckoning fleet --------------------------------
    from smarc_navigation_tpu.models import dead_reckoning as dr_mod

    # a single replay is below timing resolution (~0.3 us per 256-mission
    # tick) — chain 32 data-dependent replays so the slope is measurable
    REPS_DR = 32

    @jax.jit
    def fndr(t):
        def body(acc, _):
            t2 = jax.tree_util.tree_map(
                lambda x: x + acc.astype(x.dtype) * 1e-30
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            return acc + jnp.sum(dr_mod.run_sam_dr_vectorized(t2)), None
        acc, _ = jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32), None, length=REPS_DR)
        return acc

    rdr = {}
    Tdr = {}
    for dur, key in ((15.0, "s"), (240.0, "b")):
        mdr = sim.simulate(sim.MissionSpec(duration_s=dur, seed=9))
        btdr = fleet.batch_timelines([dr_mod.sam_timeline(mdr)] * 256)
        Tdr[key] = int(btdr.ticks.shape[1])
        rdr[key] = timed(fndr, btdr)
    perdr = max(rdr["b"] - rdr["s"], 1e-9) / (Tdr["b"] - Tdr["s"]) / REPS_DR
    dr_ticks = 256 / perdr
    print(
        f"# sam-dr fleet (closed form): 256 missions, {perdr*1e6:.3f} "
        f"us/fleet-tick -> {dr_ticks:,.3g} ticks/s",
        file=sys.stderr,
    )

    # ---- closed-loop Monte-Carlo raycast fleet (BASELINE config: 1024) -------
    from smarc_navigation_tpu.ops import raycast
    from smarc_navigation_tpu.parallel.fleet import run_raycast_fleet

    B_rc = 1024
    rng = np.random.default_rng(0)
    base_m = sim.simulate(sim.MissionSpec(duration_s=30.0, seed=1))
    spec = raycast.MBESSpec(num_beams=64, floor_z=-16.0, rock_radius=1.2,
                            swath_rad=2.4, max_range=40.0)
    cfg_rc = dataclasses.replace(cfg, max_landmarks=32)
    params_rc = slam.make_params(cfg_rc)
    lms = jnp.asarray(
        rng.uniform([0, -20, -16], [40, 20, -12], (B_rc, 16, 3)), jnp.float32
    )
    lmm = jnp.ones((B_rc, 16), bool)
    run_rc = jax.jit(
        lambda g, l, m_: jnp.sum(run_raycast_fleet(g, l, m_, cfg_rc, params_rc, spec)[1][0])
    )

    def rc_args(T_rc):
        ticks_rc = np.arange(T_rc) / cfg.system_freq
        gt_one = base_m.gt_at(ticks_rc).astype(np.float32)
        return (jnp.asarray(np.tile(gt_one, (B_rc, 1, 1))), lms, lmm)

    Tr_s, Tr_b = 76, 301
    rc_per_tick = slope(run_rc, rc_args(Tr_s), rc_args(Tr_b), Tr_s, Tr_b)
    rc_steps = B_rc / rc_per_tick
    print(
        f"# raycast fleet: {B_rc} missions (render+perceive+slam), "
        f"{rc_per_tick*1e6:.0f} us/fleet-tick -> {rc_steps:,.0f} closed-loop steps/s",
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
                    "pf_realtime_factor_1M_particles": round(pf_rt, 1),
                    "slam_realtime_factor_aggregate": round(value / cfg.system_freq, 1),
                    "ekf_slam_steps_per_sec_fleet32_L256_reftuned": round(slam256_steps, 1),
                    "raycast_fleet_closed_loop_steps_per_sec_1024": round(rc_steps, 1),
                    "ekf_localization_steps_per_sec_fleet64": round(loc_steps, 1),
                    "ekf15_steps_per_sec_fleet64": round(e15_steps, 1),
                    "sam_dr_ticks_per_sec_fleet256": round(dr_ticks, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
