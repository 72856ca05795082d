"""Shared benchmark workload builders.

Single source for the mission timelines that ``bench.py`` times and that
``scripts/probe_combined.py`` decomposes — the probe must measure EXACTLY
the workload whose number bench.py publishes (round-3 advisor finding: the
probe hand-duplicated ~40 lines of config + timeline construction, so a
config drift in one file would silently decompose a different workload).

The shapes here mirror the reference's operating envelope: SLAM missions at
the 10 Hz ``ekf_slam.launch:23`` tick with simulated MBES detections, and
the PF mission at the ``auv_pf.py`` GPS-update cadence.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..configs import EKFSlamConfig


def combined_slam_cfg() -> EKFSlamConfig:
    """The SLAM config of the combined north-star workload (bench section 3
    and the L=64 headline section share it)."""
    return dataclasses.replace(
        EKFSlamConfig(),
        max_landmarks=64,
        max_obs=8,
        mhl_dist_mbes=1.0,
        q_mbes_diag=(0.1, 0.1, 0.1),
        r_diag=(1e-3,) * 6,
    )


def slam_mission_timeline(cfg: EKFSlamConfig, duration: float, seed: int):
    """One simulated SLAM mission -> Timeline (odom + gps + diving channels,
    MBES detection events). Identical to what bench.py has always timed."""
    import jax.numpy as jnp

    from ..io import sim
    from ..ops.timeline import build_timeline
    from ..utils.geometry import quat_from_rpy_np

    m = sim.simulate(
        sim.MissionSpec(
            duration_s=duration,
            num_landmarks=20,
            mbes_std=0.05,
            landmark_area_m=60.0,
            mbes_range_m=30.0,
            gps_surface_z=-100.0,
            gps_std=0.3,
            seed=seed,
        )
    )
    ticks = np.arange(0, duration + 1e-9, 1.0 / cfg.system_freq)
    gt = m.gt_at(ticks)
    quat = quat_from_rpy_np(gt[:, 3:6])
    k = np.clip((ticks * m.spec.sim_hz).astype(int), 0, len(m.t) - 1)
    odom13 = np.concatenate(
        [gt[:, 0:3], quat, m.vel_body[k], m.gyro[k]], axis=1
    )
    det = m.streams["mbes_detections"]
    gps = m.streams["gps"]
    return build_timeline(
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


def slam_fleet_timelines(cfg: EKFSlamConfig, duration: float, B: int):
    """B-mission batched SLAM Timeline: 16 distinct missions tiled to B."""
    from ..parallel import fleet

    tls = [slam_mission_timeline(cfg, duration, seed=b) for b in range(min(B, 16))]
    tls = (tls * ((B + len(tls) - 1) // len(tls)))[:B]
    return fleet.batch_timelines(tls)


def combined_workload(slam_cfg: EKFSlamConfig, duration: float, pf_seed: int = 3):
    """The BASELINE.json north-star inputs: (B=1 SLAM timeline, PF timeline)
    for one mission replayed through BOTH estimators (bench section 3)."""
    from ..io import sim
    from ..models import particle_filter as pf

    tl_slam = slam_fleet_timelines(slam_cfg, duration, 1)
    m = sim.simulate(
        sim.MissionSpec(duration_s=duration, seed=pf_seed, gps_surface_z=-100.0)
    )
    tl_pf = pf.pf_timeline(m, freq_hz=10.0)
    return tl_slam, tl_pf
