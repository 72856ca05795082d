"""Ablate the L=256 fleet tick (band path): full vs update-kernel stubbed
vs DA stubbed."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import smarc_navigation_tpu  # noqa
from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import ekf_slam as slam
from smarc_navigation_tpu.ops import slam_kernels, slam_da_kernels
from smarc_navigation_tpu.ops.timeline import build_timeline
from smarc_navigation_tpu.parallel import fleet
from smarc_navigation_tpu.utils.geometry import quat_from_rpy

print("# device:", jax.devices()[0], file=sys.stderr, flush=True)
B = 128
cfg = dataclasses.replace(EKFSlamConfig(), max_landmarks=256, max_obs=8)
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

real_upd = slam_kernels.sequential_update_fleet
real_da = slam_da_kernels.da_lanes


def stub_upd(Sigma, mu, H_sel, SinvH, nu_sel, lm_ix, do, add, new_lm_cov,
             cand=None, a8=None, band=None):
    mu2 = mu + 1e-12 * jnp.sum(nu_sel, axis=(1, 2))[:, None]
    if band is not None:
        return Sigma, mu2, band
    return Sigma, mu2


def stub_da(pose6, n_active, active, lm_pos, Sigma, z, z_mask, q_diag,
            lam, outlier, mh_dist, new_lm_cov, sensor="mbes", r_sb=None,
            t_sb=None, A=None, valid=None, r_diag=None, band=None):
    Bz, M = z.shape[0], z.shape[1]
    dim = 2 if sensor == "fls" else 3
    eps = 1e-12 * (jnp.sum(Sigma[:, 0, 0]) + jnp.sum(z[:, 0, 0]))
    zf = jnp.zeros((Bz, M), jnp.float32) + eps
    return (jnp.zeros((Bz, M), jnp.int32),
            jnp.zeros((Bz, M, dim, 9), jnp.float32) + eps[..., None, None],
            jnp.zeros((Bz, M, dim, 9), jnp.float32),
            jnp.zeros((Bz, M, dim), jnp.float32),
            jnp.zeros((Bz, M, 3), jnp.float32), zf > 1.0, zf > 1.0,
            jnp.zeros((Bz, M), jnp.int32))


for tag, patch in (("full", None), ("no-upd", "upd"), ("no-da", "da")):
    slam_kernels.sequential_update_fleet = stub_upd if patch == "upd" else real_upd
    slam.slam_kernels = slam_kernels
    slam_da_kernels.da_lanes = stub_da if patch == "da" else real_da
    run = jax.jit(lambda t: jnp.sum(slam.run_fleet(t, params, cfg)[0].mu[:, 0:6]))
    per = max(timed(run, b_b) - timed(run, b_s), 1e-9) / (T_b - T_s)
    print(f"{tag}: {per*1e6:.0f} us/fleet-tick ({B/per:,.0f} steps/s)",
          flush=True)
