"""Where does the bench headline section's wall time go? Phase-timed:
timeline build (host) vs first call (compile) vs steady-state reps.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bench_time.py
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

t00 = time.perf_counter()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.models import ekf_slam as slam
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.ops.timeline import build_timeline
from smarc_navigation_tpu.parallel import fleet
from smarc_navigation_tpu.utils.geometry import quat_from_rpy

print(f"# import: {time.perf_counter()-t00:.1f}s  device: {jax.devices()[0]}",
      flush=True)
B = 128
cfg = dataclasses.replace(
    EKFSlamConfig(), max_landmarks=64, max_obs=8, mhl_dist_mbes=1.0,
    q_mbes_diag=(0.1, 0.1, 0.1), r_diag=(1e-3,) * 6)
params = slam.make_params(cfg)


def slam_timelines(duration):
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


t0 = time.perf_counter()
b_s = slam_timelines(15.0)
t1 = time.perf_counter()
b_b = slam_timelines(60.0)
t2 = time.perf_counter()
print(f"# timelines: short {t1-t0:.1f}s  long {t2-t1:.1f}s", flush=True)

run = jax.jit(lambda t: jnp.sum(slam.run_fleet(t, params, cfg)[0].mu[:, 0:6]))
t3 = time.perf_counter()
float(np.asarray(run(b_s)))
t4 = time.perf_counter()
print(f"# first short call (compile+run): {t4-t3:.1f}s", flush=True)
float(np.asarray(run(b_b)))
t5 = time.perf_counter()
print(f"# first long call (compile+run): {t5-t4:.1f}s", flush=True)
for tag, arg in (("short", b_s), ("long", b_b)):
    best = float("inf")
    for _ in range(3):
        ta = time.perf_counter()
        float(np.asarray(run(arg)))
        best = min(best, time.perf_counter() - ta)
    print(f"# steady {tag}: {best*1000:.0f} ms", flush=True)
print(f"# total: {time.perf_counter()-t00:.1f}s", flush=True)
