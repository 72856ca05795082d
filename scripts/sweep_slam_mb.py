"""Sweep the update-kernel mission-block depth MB at L=64 B=128 (slope
protocol): the grid step is MXU-latency-bound, so deeper interleaves give
the scheduler more independent serial A-chains (VERDICT r04 #8).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_slam_mb.py [MB ...]
"""
import dataclasses
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.models import ekf_slam as slam
from smarc_navigation_tpu.ops import slam_kernels
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.ops.timeline import build_timeline
from smarc_navigation_tpu.parallel import fleet
from smarc_navigation_tpu.utils.geometry import quat_from_rpy

print("# device:", jax.devices()[0], file=sys.stderr, flush=True)
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


b_s = slam_timelines(15.0)
b_b = slam_timelines(60.0)
T_s, T_b = int(b_s.ticks.shape[1]), int(b_b.ticks.shape[1])
real = slam_kernels.sequential_update_fleet

mbs = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
ref = None
for mb in mbs:
    slam_kernels.sequential_update_fleet = functools.partial(real, mb=mb)
    slam.slam_kernels = slam_kernels
    run = jax.jit(
        lambda t: jnp.sum(slam.run_fleet(t, params, cfg)[0].mu[:, 0:6]))
    try:
        per = max(timed(run, b_b) - timed(run, b_s), 1e-9) / (T_b - T_s)
    except Exception as e:  # noqa: BLE001 — report compile failures per MB
        print(f"MB={mb}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    chk = _force(run(b_b))
    if ref is None:
        ref = chk
    print(f"MB={mb}: {per*1e6:.0f} us/fleet-tick ({B/per:,.0f} steps/s)  "
          f"checksum {chk:.6f} (d={abs(chk-ref):.2e})", flush=True)
slam_kernels.sequential_update_fleet = real
