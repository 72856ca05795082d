"""Slope-measure the SLAM fleet tick with the band carry (L=256 + L=64)."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import ekf_slam as slam
from smarc_navigation_tpu.ops.timeline import build_timeline
from smarc_navigation_tpu.parallel import fleet
from smarc_navigation_tpu.utils.geometry import quat_from_rpy

print("# device:", jax.devices()[0], file=sys.stderr, flush=True)


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


def slam_timelines(cfg, duration, B):
    tls = []
    for b in range(min(B, 16)):
        m = sim.simulate(sim.MissionSpec(
            duration_s=duration, num_landmarks=20, mbes_std=0.05,
            landmark_area_m=60.0, mbes_range_m=30.0, gps_surface_z=-100.0,
            gps_std=0.3, seed=b))
        ticks = np.arange(0, duration + 1e-9, 1.0 / cfg.system_freq)
        gt = m.gt_at(ticks)
        quat = np.asarray(quat_from_rpy(jnp.asarray(gt[:, 3:6])))
        k = np.clip((ticks * m.spec.sim_hz).astype(int), 0, len(m.t) - 1)
        odom13 = np.concatenate([gt[:, 0:3], quat, m.vel_body[k], m.gyro[k]], 1)
        det = m.streams["mbes_detections"]
        tls.append(build_timeline(
            t0=0.0, t1=duration, freq_hz=cfg.system_freq,
            channels={"odom": (ticks, odom13)},
            events={"mbes": (det["stamps"], det["values"], det["burst"],
                             cfg.max_obs)}))
    tls = (tls * ((B + len(tls) - 1) // len(tls)))[:B]
    return fleet.batch_timelines(tls)


def measure(tag, cfg, B):
    params = slam.make_params(cfg)
    run = jax.jit(lambda t: jnp.sum(slam.run_fleet(t, params, cfg)[0].mu[:, 0:6]))
    b_s = slam_timelines(cfg, 15.0, B)
    b_b = slam_timelines(cfg, 60.0, B)
    T_s, T_b = int(b_s.ticks.shape[1]), int(b_b.ticks.shape[1])
    per = max(timed(run, b_b) - timed(run, b_s), 1e-9) / (T_b - T_s)
    print(f"{tag}: {per*1e6:.0f} us/fleet-tick ({B/per:,.0f} steps/s)",
          flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which == "1024":
    cfg64 = dataclasses.replace(
        EKFSlamConfig(), max_landmarks=64, max_obs=8, mhl_dist_mbes=1.0,
        q_mbes_diag=(0.1, 0.1, 0.1), r_diag=(1e-3,) * 6)
    measure("L64-B1024", cfg64, 1024)
    measure("L64-B512", cfg64, 512)
if which in ("all", "256"):
    cfg256 = dataclasses.replace(EKFSlamConfig(), max_landmarks=256, max_obs=8)
    measure("L256-B128", cfg256, 128)
    measure("L256-B32", cfg256, 32)
if which in ("all", "64"):
    cfg64 = dataclasses.replace(
        EKFSlamConfig(), max_landmarks=64, max_obs=8, mhl_dist_mbes=1.0,
        q_mbes_diag=(0.1, 0.1, 0.1), r_diag=(1e-3,) * 6)
    measure("L64-B128", cfg64, 128)
