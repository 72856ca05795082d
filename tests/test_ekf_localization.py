import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smarc_navigation_tpu.configs import EKFLocConfig
from smarc_navigation_tpu.io import metrics, sim
from smarc_navigation_tpu.models import ekf_localization as loc
from tests.oracles import ekf_loc_oracle as oracle

# The reference's launch defaults (R position 1 m²/tick at 50 Hz, Q=40 m²)
# are tuned for its Gazebo world and are chaotic on generic missions: Σ
# inflates so fast that association picks amplify any f32/f64 difference.
# Tests run a numerically stable tuning; the default config is still the
# reference's (verified in configs tests).
CFG_SIM = dataclasses.replace(
    EKFLocConfig(),
    stone_offset=0.0,
    r_diag=(1e-4, 1e-4, 1e-4, 1e-6, 1e-6, 1e-6),
    q_diag=(0.25, 0.25, 0.25),
)


def mission(**kw):
    kw.setdefault("duration_s", 20.0)
    kw.setdefault("num_landmarks", 12)
    return sim.simulate(sim.MissionSpec(**kw))


def test_meas_jacobian_matches_numeric():
    rng = np.random.default_rng(0)
    for _ in range(5):
        mu = rng.normal(size=6)
        mu[3:5] *= 0.3
        lm = rng.normal(size=3) * 10
        H = np.asarray(loc.meas_jacobian(jnp.asarray(mu, jnp.float32), jnp.asarray(lm, jnp.float32)))
        H_num = oracle.numeric_jac(lambda m: oracle.rotmat_from_rpy(m[3:6]).T @ (lm - m[0:3]), mu)
        np.testing.assert_allclose(H, H_num, atol=2e-4)
        # position block is exactly -R^T (correspondence_obj.cpp:21-40 structure)
        np.testing.assert_allclose(
            H[:, 0:3], -oracle.rotmat_from_rpy(mu[3:6]).T, atol=1e-5
        )


def test_motion_jacobian_matches_numeric():
    rng = np.random.default_rng(1)
    for _ in range(5):
        rpy = rng.normal(size=3) * 0.7
        disp = rng.normal(size=3)
        G = np.asarray(loc.motion_jacobian(jnp.asarray(rpy, jnp.float32), jnp.asarray(disp, jnp.float32)))
        J_num = oracle.numeric_jac(lambda a: oracle.rotmat_from_rpy(a) @ disp, rpy.copy())
        np.testing.assert_allclose(G[0:3, 3:6], J_num, atol=2e-4)
        np.testing.assert_allclose(G[0:3, 0:3], np.eye(3), atol=0)
        assert np.all(G[3:6, :] == 0.0)  # absolute-orientation rows


def _timeline_np(tl):
    ch, w, ev = tl.channels["imu"], tl.windows["dvl"], tl.events["mbes_detections"]
    return {
        "ticks": np.asarray(tl.ticks, np.float64),
        "imu_value": np.asarray(ch.value, np.float64),
        "imu_valid": np.asarray(ch.valid),
        "dvl_wvalue": np.asarray(w.value, np.float64),
        "dvl_wstamp": np.asarray(w.stamp, np.float64),
        "dvl_wcount": np.asarray(w.count),
        "det_value": np.asarray(ev.value, np.float64),
        "det_mask": np.asarray(ev.mask),
    }


def test_golden_track_vs_numpy_oracle():
    """f32 jitted filter vs independent f64 numpy oracle: identical
    association decisions, matching pose track (SURVEY.md §4)."""
    m = mission(dvl_std=0.02, imu_rpy_std=0.002, mbes_std=0.05)
    cfg = CFG_SIM
    tl = loc.loc_timeline(m, cfg)
    params = loc.make_params(m.landmarks, cfg)

    _, out = jax.jit(lambda t: loc.run(t, params, cfg))(tl)
    mu_jax = np.asarray(out["mu"])
    matches_jax = np.asarray(out["matches"])

    mus_o, matches_o = oracle.run_oracle(cfg, params.map_pos, _timeline_np(tl))

    # BASELINE.md:34: identical association decisions — EXACT agreement,
    # same bar as SLAM (test_slam_golden). Verified across seeds
    # {0,1,2,5,7,11} in round 3; any future disagreement is a regression
    # to diagnose, not tolerance to re-add.
    agree = (matches_jax == matches_o).mean()
    assert agree == 1.0, f"association agreement {agree}"
    err = np.linalg.norm(mu_jax[:, :3] - mus_o[:, :3], axis=-1)
    assert err.max() < 5e-2, err.max()


def test_ekf_beats_open_loop_under_noise():
    """Landmark updates must bound the drift that velocity noise induces."""
    m = mission(duration_s=40.0, dvl_std=0.05, mbes_std=0.05)
    cfg = CFG_SIM
    tl = loc.loc_timeline(m, cfg)
    params = loc.make_params(m.landmarks, cfg)
    _, out = loc.run(tl, params, cfg)
    gt = m.gt_at(np.asarray(tl.ticks, np.float64))
    rep = metrics.summarize(out["mu"], jnp.asarray(gt))
    assert rep["rmse_pos"] < 1.0, rep
    assert int(jnp.sum(out["num_matched"])) > 50

    # no-detection ablation drifts more
    params_nomap = loc.make_params(np.zeros((0, 3)), cfg)
    _, out_nd = loc.run(tl, params_nomap, cfg)
    rep_nd = metrics.summarize(out_nd["mu"], jnp.asarray(gt))
    assert rep_nd["rmse_pos"] > rep["rmse_pos"]


def test_sigma_stays_symmetric_psd():
    m = mission(dvl_std=0.05, mbes_std=0.1)
    cfg = CFG_SIM
    tl = loc.loc_timeline(m, cfg)
    params = loc.make_params(m.landmarks, cfg)
    final, out = loc.run(tl, params, cfg)
    S = np.asarray(final.Sigma)
    np.testing.assert_allclose(S, S.T, atol=1e-4)
    assert np.all(np.linalg.eigvalsh(S.astype(np.float64)) > -1e-5)
    assert np.all(np.asarray(out["sigma_diag"]) > -1e-6)


def test_outlier_rejection_gates_far_detections():
    """A detection kilometres away from every landmark must be rejected."""
    m = mission()
    cfg = CFG_SIM
    tl = loc.loc_timeline(m, cfg)
    params = loc.make_params(m.landmarks, cfg)
    state = loc.init_state(cfg)
    mu, Sigma, matched = loc.update_one(
        state.mu, state.Sigma, jnp.asarray([500.0, 500.0, -100.0]),
        jnp.asarray(True), params, cfg,
    )
    assert int(matched) == -1
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(state.mu))
