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


# ---------------------------------------------------------------------------
# FLS golden track (VERDICT r2 item 4: same fidelity bar as MBES)
# ---------------------------------------------------------------------------

# base <- fls mount: 0.5 m forward, 0.3 m below, pitched down 0.1 rad
_FLS_RPY = np.array([0.0, 0.1, 0.0])
_FLS_TRANS = np.array([0.5, 0.0, -0.3])

FLS_CFG = dataclasses.replace(
    EKFSlamConfig(),
    max_landmarks=32,
    max_obs=8,
    # mhl 3.0 keeps genuine matches (d ~ 0.1-0.5 at q=4 px^2) well clear of
    # the new-landmark boundary: a d that lands ON mhl is a measure-zero
    # f32/f64 knife-edge, not an association-semantics difference (observed
    # at mhl=1.0: oracle d=1.002 vs jax d=0.9996 flipped one decision)
    mhl_dist_fls=3.0,
    q_fls_diag=(4.0, 4.0),
    r_diag=(1e-3,) * 6,
)


def _fls_mission(seed):
    """Forward run past scattered seafloor rocks; f64 pixel detections are
    synthesized with the ORACLE's measurement math (independent of the JAX
    model) + Gaussian pixel noise."""
    rng = np.random.default_rng(seed)
    r_bs = oracle.rotmat(_FLS_RPY)
    o_probe = oracle.OracleSLAM(FLS_CFG, sensor="fls",
                                r_base_fls=r_bs, t_base_fls=_FLS_TRANS)
    true_lms = np.column_stack([
        rng.uniform(5.0, 55.0, 12),
        rng.uniform(-6.0, 6.0, 12),
        rng.uniform(-2.0, -1.0, 12),
    ])
    T = 300
    ticks = (np.arange(T) + 1) / FLS_CFG.system_freq
    poses = np.zeros((T, 6))
    poses[:, 0] = 0.15 * np.arange(T)                   # ~0.15 m/tick forward
    poses[:, 2] = -1.5
    poses[:, 5] = 0.15 * np.sin(0.05 * np.arange(T))    # gentle yaw weave

    det_stamps, det_vals, det_burst = [], [], []
    for k, t in enumerate(ticks):
        for lm in true_lms:
            v = o_probe.h_fls_m(poses[k], lm)
            rng_m = np.hypot(v[0], v[2])
            if v[0] > 0.5 and rng_m < 12.0:             # forward, in range
                z = o_probe.h(poses[k], lm) + rng.normal(0.0, 0.5, 2)
                det_stamps.append(t)
                det_vals.append([z[0], z[1], 0.0])
                det_burst.append(k)

    from smarc_navigation_tpu.ops.timeline import build_timeline

    tl = build_timeline(
        0.0, T / FLS_CFG.system_freq, FLS_CFG.system_freq,
        channels={"odom": (ticks, poses.astype(np.float32))},
        events={"fls": (np.asarray(det_stamps), np.asarray(det_vals, np.float32),
                        np.asarray(det_burst), FLS_CFG.max_obs)},
    )
    return tl, r_bs


def _timeline_np_fls(tl):
    od, ev = tl.channels["odom"], tl.events["fls"]
    return {
        "ticks": np.asarray(tl.ticks, np.float64),
        "odom_value": np.asarray(od.value, np.float64),
        "odom_valid": np.asarray(od.valid),
        "det_value": np.asarray(ev.value, np.float64)[:, :, :2],
        "det_mask": np.asarray(ev.mask),
    }


def test_slam_fls_golden_track_vs_oracle():
    """FLS pixel-measurement path vs the f64 oracle transcription of
    ``correspondence_obj_fls.cpp:25-150``: exact association agreement,
    matching tracks and maps — the same bar the MBES path meets."""
    from smarc_navigation_tpu.utils.geometry import Transform

    tl, r_bs = _fls_mission(seed=0)
    params = slam.make_params(
        FLS_CFG,
        tf_base_fls=Transform(rot=jnp.asarray(r_bs, jnp.float32),
                              trans=jnp.asarray(_FLS_TRANS, jnp.float32)),
    )
    final, out = jax.jit(lambda t: slam.run(t, params, FLS_CFG))(tl)

    mus_o, matched_o, o = oracle.run_oracle(
        FLS_CFG, _timeline_np_fls(tl), "full", sensor="fls",
        r_base_fls=r_bs, t_base_fls=_FLS_TRANS,
    )

    assert int(final.n_active) == o.n_active
    agree = (np.asarray(out["matched_fls"]) == matched_o).mean()
    assert agree == 1.0, f"association agreement {agree}"

    err = np.linalg.norm(np.asarray(out["mu"])[:, :3] - mus_o[:, :3], axis=-1)
    assert err.max() < 5e-2, err.max()

    lm_jax = np.asarray(final.mu[6:]).reshape(-1, 3)[: o.n_active]
    lm_o = o.mu[6 : 6 + 3 * o.n_active].reshape(-1, 3)
    np.testing.assert_allclose(lm_jax, lm_o, atol=5e-2)


def test_slam_fls_golden_multi_seed():
    from smarc_navigation_tpu.utils.geometry import Transform

    for seed in (1, 2):
        tl, r_bs = _fls_mission(seed=seed)
        params = slam.make_params(
            FLS_CFG,
            tf_base_fls=Transform(rot=jnp.asarray(r_bs, jnp.float32),
                                  trans=jnp.asarray(_FLS_TRANS, jnp.float32)),
        )
        final, out = jax.jit(lambda t: slam.run(t, params, FLS_CFG))(tl)
        mus_o, matched_o, o = oracle.run_oracle(
            FLS_CFG, _timeline_np_fls(tl), "full", sensor="fls",
            r_base_fls=r_bs, t_base_fls=_FLS_TRANS,
        )
        assert int(final.n_active) == o.n_active
        agree = (np.asarray(out["matched_fls"]) == matched_o).mean()
        assert agree == 1.0, f"seed {seed}: agreement {agree}"
