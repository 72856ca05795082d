"""Decompose the combined tick's SLAM B=1 leg (round-3 verdict #7): event
occupancy of the workload, then the fleet path with DA / update kernels
stubbed one at a time — same ablation protocol as ablate_slam_fleet.py but
at B=1 on the EXACT north-star workload (io.workloads.combined_workload).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_slam_b1.py
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
        best = min(best, time.perf_counter() - t0) if False else best
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.io import workloads
    from smarc_navigation_tpu.models import ekf_slam as slam
    from smarc_navigation_tpu.ops import slam_da_kernels, slam_kernels

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    cfg = workloads.combined_slam_cfg()
    params = slam.make_params(cfg)

    def mk(duration):
        return workloads.combined_workload(cfg, duration)[0]

    a_s, a_b = mk(15.0), mk(60.0)
    T_s, T_b = int(a_s.ticks.shape[1]), int(a_b.ticks.shape[1])

    ev = a_b.events["mbes"]
    occ = np.asarray(jnp.any(ev.mask[0], axis=-1)).mean()
    nz = np.asarray(ev.mask[0]).sum(axis=-1)
    print(f"# mbes event occupancy: {occ*100:.1f}% of {T_b} ticks; "
          f"mean detections/occupied tick = "
          f"{nz[nz > 0].mean():.2f} (max_obs={cfg.max_obs})", file=sys.stderr)

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

    for tag, patch in (("full", None), ("no-upd", "upd"), ("no-da", "da"),
                       ("neither", "both")):
        slam_kernels.sequential_update_fleet = (
            stub_upd if patch in ("upd", "both") else real_upd)
        slam_da_kernels.da_lanes = (
            stub_da if patch in ("da", "both") else real_da)
        run = jax.jit(
            lambda t: jnp.sum(slam.run_fleet(t, params, cfg)[0].mu[:, 0:6]))
        t_s, t_b = timed(run, a_s), timed(run, a_b)
        if t_b - t_s <= 0:
            print("# WARN: non-positive slope, measurement unreliable",
                  file=sys.stderr)
        per = max(t_b - t_s, 1e-9) / (T_b - T_s)
        print(f"{tag}: {per*1e6:.1f} us/tick", flush=True)
    slam_kernels.sequential_update_fleet = real_upd
    slam_da_kernels.da_lanes = real_da


if __name__ == "__main__":
    main()
