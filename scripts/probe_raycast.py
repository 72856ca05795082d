"""Decompose the closed-loop raycast fleet tick (round-3 verdict #6):
full loop vs SLAM-only vs render-only vs render+extract, slope protocol
(docs/ROOFLINE.md). Foreground TPU script.

The workload is pinned to bench.py's `sec_raycast` (B=1024, 64 beams,
16 rocks, L=32 — keep the two in sync); the stage bodies replicate
`fleet.run_raycast_fleet`'s kernel-path scan body with individual legs
stubbed, so the deltas attribute the fleet tick to render / peak-extract
/ SLAM legs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_raycast.py
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
    print(f"#   t_small={t_s*1e3:.1f} ms  t_big={t_b*1e3:.1f} ms",
          file=sys.stderr)
    if t_b - t_s <= 0:
        print("# WARN: non-positive slope, measurement unreliable",
              file=sys.stderr)
    return max(t_b - t_s, 1e-9) / (u_b - u_s)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.configs import EKFSlamConfig
    from smarc_navigation_tpu.io import sim
    from smarc_navigation_tpu.models import ekf_slam as slam
    from smarc_navigation_tpu.ops import raycast
    from smarc_navigation_tpu.parallel import fleet

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    cfg = dataclasses.replace(
        EKFSlamConfig(), max_landmarks=32, max_obs=8,
        mhl_dist_mbes=1.0, q_mbes_diag=(0.1, 0.1, 0.1), r_diag=(1e-3,) * 6,
    )
    B = 1024
    rng = np.random.default_rng(0)
    base_m = sim.simulate(sim.MissionSpec(duration_s=30.0, seed=1))
    spec = raycast.MBESSpec(num_beams=64, floor_z=-16.0, rock_radius=1.2,
                            swath_rad=2.4, max_range=40.0)
    params = slam.make_params(cfg)
    lms = jnp.asarray(
        rng.uniform([0, -20, -16], [40, 20, -12], (B, 16, 3)), jnp.float32)
    lmm = jnp.ones((B, 16), bool)

    def mk(T):
        ticks = np.arange(T) / cfg.system_freq
        gt_one = base_m.gt_at(ticks).astype(np.float32)
        return (jnp.asarray(np.tile(gt_one, (B, 1, 1))), lms, lmm)

    a_s, a_b = mk(76), mk(301)
    T_s, T_b = 76, 301

    # --- (a) full closed loop (the bench number) ---------------------------
    run_full = jax.jit(lambda g, l, m_: jnp.sum(
        fleet.run_raycast_fleet(g, l, m_, cfg, params, spec)[1][0]))
    per = slope(run_full, a_s, a_b, T_s, T_b)
    print(f"# full closed loop: {per*1e6:.0f} us/fleet-tick "
          f"-> {B/per:,.0f} steps/s", file=sys.stderr)

    # shared scan scaffolding replicating run_raycast_fleet's kernel path
    L = cfg.max_landmarks
    s0 = slam.init_state(cfg)
    s0_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s0)
    band0_b = jnp.broadcast_to(slam.initial_band(s0.Sigma, L), (B, 24, L))

    def scan_of(body):
        def run(g, l, m_):
            (final, _), (mu_t, _) = jax.lax.scan(
                body, (s0_b, band0_b), jnp.moveaxis(g, 0, 1))
            return jnp.sum(mu_t)
        return jax.jit(run)

    # --- (b) SLAM-only: perception stubbed to constant detections ----------
    pts_c = jnp.tile(jnp.asarray([[0.0, 1.0, -14.0]], jnp.float32),
                     (cfg.max_obs, 1))
    pts_c = jnp.broadcast_to(pts_c, (B, cfg.max_obs, 3))
    msk_c = jnp.broadcast_to(
        jnp.arange(cfg.max_obs) < 2, (B, cfg.max_obs))

    def body_slam(carry, pose_b):
        state_b, band = carry
        pred = jax.vmap(lambda s, p: slam.predict(s, p, params))(
            state_b, pose_b)
        st, _m, band = slam.da_lanes_pass(pred, pts_c, msk_c, params, cfg,
                                          band=band)
        return (st, band), (st.mu[:, 0:6], st.n_active)

    per = slope(scan_of(body_slam), a_s, a_b, T_s, T_b)
    print(f"# slam leg only:    {per*1e6:.0f} us/fleet-tick", file=sys.stderr)

    # --- (c) render only: no extract, no slam ------------------------------
    def body_render(carry, pose_b):
        r, i = jax.vmap(
            lambda p, l, m_: raycast.render_ping(p, l, m_, spec)
        )(pose_b, lms, lmm)
        st, band = carry
        mu = st.mu[:, 0:6] + jnp.sum(r + i, axis=1)[:, None]
        return (st._replace(mu=st.mu.at[:, 0].add(jnp.sum(r))), band), (
            mu, st.n_active)

    per = slope(scan_of(body_render), a_s, a_b, T_s, T_b)
    print(f"# render leg only:  {per*1e6:.0f} us/fleet-tick", file=sys.stderr)

    # --- (d) render + extract (full perception), no slam -------------------
    def body_perc(carry, pose_b):
        pts, mask = jax.vmap(
            lambda p, l, m_: raycast.ping_detections(
                p, l, m_, spec, max_detections=cfg.max_obs)
        )(pose_b, lms, lmm)
        st, band = carry
        return (st._replace(mu=st.mu.at[:, 0].add(jnp.sum(pts))), band), (
            st.mu[:, 0:6] + jnp.sum(mask, 1)[:, None], st.n_active)

    per = slope(scan_of(body_perc), a_s, a_b, T_s, T_b)
    print(f"# render+extract:   {per*1e6:.0f} us/fleet-tick", file=sys.stderr)


if __name__ == "__main__":
    main()
