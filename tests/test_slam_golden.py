"""Golden-track equivalence: jitted f32 EKF-SLAM vs independent f64 numpy
oracle (SURVEY.md §4): same association decisions, matching pose tracks and
landmark maps."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import ekf_slam as slam
from tests.oracles import ekf_slam_oracle as oracle

CFG = dataclasses.replace(
    EKFSlamConfig(),
    max_landmarks=32,
    max_obs=8,
    mhl_dist_mbes=1.0,
    q_mbes_diag=(0.1, 0.1, 0.1),
    r_diag=(1e-3,) * 6,
)


def _timeline_np(tl):
    od, ev = tl.channels["odom"], tl.events["mbes"]
    return {
        "ticks": np.asarray(tl.ticks, np.float64),
        "odom_value": np.asarray(od.value, np.float64),
        "odom_valid": np.asarray(od.valid),
        "det_value": np.asarray(ev.value, np.float64),
        "det_mask": np.asarray(ev.mask),
    }


def test_slam_golden_track_vs_oracle():
    m = sim.simulate(
        sim.MissionSpec(duration_s=30.0, num_landmarks=15, mbes_std=0.02,
                        landmark_area_m=40.0, mbes_range_m=30.0)
    )
    ticks = np.arange(0, 30.0 + 1e-9, 1.0 / CFG.system_freq)
    odom = m.gt_at(ticks)
    tl = slam.slam_timeline(m, odom.astype(np.float32), ticks, CFG)
    params = slam.make_params(CFG)

    final, out = jax.jit(lambda t: slam.run(t, params, CFG))(tl)
    mu_jax = np.asarray(out["mu"])
    matched_jax = np.asarray(out["matched_mbes"])

    mus_o, matched_o, o = oracle.run_oracle(CFG, _timeline_np(tl), "full")

    # identical landmark counts and IDENTICAL association decisions
    # (BASELINE fidelity bar; the f32 filter and f64 oracle must agree on
    # every (measurement -> slot) decision over the whole mission)
    assert int(final.n_active) == o.n_active
    agree = (matched_jax == matched_o).mean()
    assert agree == 1.0, f"association agreement {agree}"

    # pose tracks match to f32 filter tolerance
    err = np.linalg.norm(mu_jax[:, :3] - mus_o[:, :3], axis=-1)
    assert err.max() < 5e-2, err.max()

    # landmark maps match slot-for-slot
    lm_jax = np.asarray(final.mu[6:]).reshape(-1, 3)[: o.n_active]
    lm_o = o.mu[6 : 6 + 3 * o.n_active].reshape(-1, 3)
    np.testing.assert_allclose(lm_jax, lm_o, atol=5e-2)


def test_slam_marginal_mode_matches_oracle():
    """Reference-fidelity writeback mode agrees with its oracle too."""
    cfg = dataclasses.replace(EKFSlamConfig(), max_landmarks=32, max_obs=8)
    m = sim.simulate(
        sim.MissionSpec(duration_s=20.0, num_landmarks=10, mbes_std=0.05,
                        landmark_area_m=40.0, mbes_range_m=30.0)
    )
    ticks = np.arange(0, 20.0 + 1e-9, 1.0 / cfg.system_freq)
    odom = m.gt_at(ticks)
    tl = slam.slam_timeline(m, odom.astype(np.float32), ticks, cfg)
    params = slam.make_params(cfg)

    final, out = slam.run(tl, params, cfg, update_mode="marginal")
    mus_o, matched_o, o = oracle.run_oracle(cfg, _timeline_np(tl), "marginal")

    assert int(final.n_active) == o.n_active
    agree = (np.asarray(out["matched_mbes"]) == matched_o).mean()
    assert agree == 1.0, agree
    err = np.linalg.norm(np.asarray(out["mu"])[:, :3] - mus_o[:, :3], axis=-1)
    assert err.max() < 5e-2, err.max()


def test_slam_golden_track_multi_seed():
    """Association agreement holds at 100% across distinct missions."""
    params = slam.make_params(CFG)
    for seed in (1, 2, 3):
        m = sim.simulate(
            sim.MissionSpec(duration_s=30.0, num_landmarks=15, mbes_std=0.02,
                            landmark_area_m=40.0, mbes_range_m=30.0, seed=seed)
        )
        ticks = np.arange(0, 30.0 + 1e-9, 1.0 / CFG.system_freq)
        odom = m.gt_at(ticks)
        tl = slam.slam_timeline(m, odom.astype(np.float32), ticks, CFG)
        final, out = jax.jit(lambda t: slam.run(t, params, CFG))(tl)
        mus_o, matched_o, o = oracle.run_oracle(CFG, _timeline_np(tl), "full")
        assert int(final.n_active) == o.n_active
        agree = (np.asarray(out["matched_mbes"]) == matched_o).mean()
        assert agree == 1.0, f"seed {seed}: agreement {agree}"
