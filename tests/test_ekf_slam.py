import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import ekf_slam as slam
from smarc_navigation_tpu.ops import assignment

CFG = dataclasses.replace(
    EKFSlamConfig(),
    max_landmarks=32,
    max_obs=8,
    mhl_dist_mbes=1.0,
    q_mbes_diag=(0.1, 0.1, 0.1),
    r_diag=(1e-3,) * 6,
)


def make_case(duration=30.0, **kw):
    kw.setdefault("num_landmarks", 15)
    kw.setdefault("mbes_std", 0.02)
    kw.setdefault("landmark_area_m", 40.0)
    kw.setdefault("mbes_range_m", 30.0)
    m = sim.simulate(sim.MissionSpec(duration_s=duration, **kw))
    ticks = np.arange(0, duration + 1e-9, 1.0 / CFG.system_freq)
    odom = m.gt_at(ticks)
    tl = slam.slam_timeline(m, odom.astype(np.float32), ticks, CFG)
    return m, ticks, odom, tl


# ---------------------------------------------------------------------------
# assignment solver
# ---------------------------------------------------------------------------

def test_hungarian_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(8):
        cost = np.full((30, 6), 10000.0)
        for c in range(6):
            rows = rng.choice(24, size=3, replace=False)
            cost[rows, c] = rng.uniform(0, 5, 3)
            cost[24 + c, c] = 1.0
        a = np.asarray(assignment.hungarian(jnp.asarray(cost, jnp.float32)))
        s = assignment._scipy_solve(cost)
        ca = cost[a, np.arange(6)].sum()
        cs = cost[s, np.arange(6)].sum()
        assert abs(ca - cs) < 1e-3, (a, s)
        assert len(set(a.tolist())) == 6  # distinct rows


def test_hungarian_dense_and_square():
    rng = np.random.default_rng(1)
    for shape in [(12, 12), (20, 7), (9, 9)]:
        cost = rng.uniform(0, 1, shape)
        a = np.asarray(assignment.hungarian(jnp.asarray(cost, jnp.float32)))
        s = assignment._scipy_solve(cost)
        ca = cost[a, np.arange(shape[1])].sum()
        cs = cost[s, np.arange(shape[1])].sum()
        assert abs(ca - cs) < 1e-4


def test_hungarian_vmap():
    rng = np.random.default_rng(2)
    costs = rng.uniform(0, 1, (5, 15, 6)).astype(np.float32)
    outs = np.asarray(jax.vmap(assignment.hungarian)(jnp.asarray(costs)))
    for b in range(5):
        s = assignment._scipy_solve(costs[b].astype(np.float64))
        ca = costs[b][outs[b], np.arange(6)].sum()
        cs = costs[b][s, np.arange(6)].sum()
        assert abs(ca - cs) < 1e-4


# ---------------------------------------------------------------------------
# sensor models
# ---------------------------------------------------------------------------

def test_mbes_roundtrip():
    params = slam.make_params(CFG)
    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
    lm = jnp.asarray(rng.normal(size=3) * 10, jnp.float32)
    z = slam.h_mbes(pose, lm, params)
    lm2 = slam.backproject_mbes(z, pose, params)
    np.testing.assert_allclose(np.asarray(lm2), np.asarray(lm), atol=1e-4)


def test_fls_roundtrip_forward_px():
    """h_fls(backproject_fls(z)) == z for forward-looking pixels (x>0)."""
    params = slam.make_params(CFG)
    pose = jnp.asarray([1.0, -2.0, 0.5, 0.05, -0.02, 0.8], jnp.float32)
    for z_px in [[120.0, 30.0, 0.0], [200.0, -80.0, 0.0], [50.0, 0.0, 0.0]]:
        z = jnp.asarray(z_px, jnp.float32)
        lm = slam.backproject_fls(z, pose, params)
        z2 = slam.h_fls(pose, lm, params)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z[:2]), atol=0.5)


def test_candidate_innovation_is_zero_mbes():
    """A back-projected candidate predicts its own measurement exactly."""
    params = slam.make_params(CFG)
    pose = jnp.asarray([3.0, 1.0, -5.0, 0.1, -0.05, 1.2], jnp.float32)
    z = jnp.asarray([4.0, -2.0, -6.0], jnp.float32)
    cand = slam.backproject_mbes(z, pose, params)
    z_hat = slam.h_mbes(pose, cand, params)
    np.testing.assert_allclose(np.asarray(z_hat), np.asarray(z), atol=1e-4)


# ---------------------------------------------------------------------------
# predict semantics
# ---------------------------------------------------------------------------

def test_predict_orientation_cov_resets_to_R():
    params = slam.make_params(CFG)
    st = slam.init_state(CFG, beacons=np.array([[5.0, 5.0, -10.0]]))
    # inflate covariance artificially
    st = st._replace(Sigma=st.Sigma.at[3:6, 3:6].set(jnp.eye(3) * 7.0))
    pred = slam.predict(st, jnp.asarray([1.0, 0.5, -0.2, 0.1, 0.0, 0.3]), params)
    np.testing.assert_allclose(
        np.asarray(pred.Sigma[3:6, 3:6]), np.asarray(params.R[3:6, 3:6]), atol=1e-6
    )
    # landmark block untouched
    np.testing.assert_allclose(
        np.asarray(pred.Sigma[6:9, 6:9]), np.diag(CFG.beacon_cov), atol=1e-6
    )
    # position becomes odom increment
    np.testing.assert_allclose(np.asarray(pred.mu[0:3]), [1.0, 0.5, -0.2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred.mu_auv_odom), [1.0, 0.5, -0.2], atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------

def test_slam_maps_all_observed_landmarks():
    m, ticks, odom, tl = make_case(duration=60.0, num_landmarks=20)
    params = slam.make_params(CFG)
    final, out = jax.jit(lambda t: slam.run(t, params, CFG))(tl)

    assert bool(jnp.isfinite(final.mu).all())
    # count distinct true landmarks that produced detections
    det = m.streams["mbes_detections"]
    R = sim._rotmat_from_rpy(m.rpy)
    ids = set()
    for s_, v in zip(det["stamps"], det["values"]):
        k = int(s_ * m.spec.sim_hz)
        ids.add(int(np.argmin(np.linalg.norm(m.landmarks - (R[k] @ v + m.pos[k]), axis=-1))))
    n_obs = len(ids)
    n_act = int(final.n_active)
    assert abs(n_act - n_obs) <= 2, (n_act, n_obs)

    lm, act = slam.landmarks_map(final, CFG)
    est = np.asarray(lm)[np.asarray(act)]
    d = np.linalg.norm(est[:, None, :] - m.landmarks[None, :, :], axis=-1).min(axis=1)
    assert d.mean() < 0.2, d.mean()

    pe = np.linalg.norm(np.asarray(out["mu"])[:, :3] - odom[:, :3], axis=-1)
    assert pe.max() < 0.5, pe.max()


def test_slam_sigma_stays_psd_full_mode():
    m, ticks, odom, tl = make_case(duration=30.0)
    params = slam.make_params(CFG)
    final, _ = slam.run(tl, params, CFG)
    D = 6 + 3 * int(final.n_active)
    S = np.asarray(final.Sigma, np.float64)[:D, :D]
    assert np.linalg.eigvalsh(0.5 * (S + S.T)).min() > -1e-4


def test_slam_marginal_mode_matches_reference_style_tuning():
    """The reference's own gentle tuning keeps the marginal-writeback mode
    finite (it is structurally inconsistent under aggressive tunings)."""
    cfg = dataclasses.replace(
        EKFSlamConfig(), max_landmarks=32, max_obs=8
    )  # reference defaults: Q=200, mhl 0.12
    m, ticks, odom, _ = make_case(duration=30.0)
    tl = slam.slam_timeline(m, odom.astype(np.float32), ticks, cfg)
    params = slam.make_params(cfg)
    final, out = slam.run(tl, params, cfg, update_mode="marginal")
    assert bool(jnp.isfinite(final.mu).all())


def test_slam_with_beacon_prior():
    m, ticks, odom, tl = make_case(duration=20.0)
    params = slam.make_params(CFG)
    beacons = m.landmarks[:3]
    st0 = slam.init_state(CFG, beacons=beacons)
    final, _ = slam.run(tl, params, CFG, state0=st0)
    assert int(final.n_active) >= 3
    lm, act = slam.landmarks_map(final, CFG)
    np.testing.assert_allclose(
        np.asarray(lm)[:3], beacons, atol=1.0
    )  # beacons refined, not lost


def test_map_to_odom_correction_identity_when_consistent():
    mu = jnp.asarray([1.0, 2.0, -3.0, 0.1, 0.0, 0.7])
    tf = slam.map_to_odom_correction(mu, mu)
    np.testing.assert_allclose(np.asarray(tf.trans), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf.rot), np.eye(3), atol=1e-5)


def test_fls_detections_end_to_end():
    """FLS pixel detections (second sensor pass) drive landmark mapping."""
    params = slam.make_params(CFG)
    # landmarks in the vehicle's FLS plane (z ~ vehicle depth), ahead of it
    true_lms = np.array([[8.0, 2.0, -1.0], [12.0, -3.0, -1.0]])
    T = 40
    ticks = (np.arange(T) + 1) / CFG.system_freq
    poses = np.zeros((T, 6), np.float32)
    poses[:, 0] = 0.2 * np.arange(T)   # drive forward
    poses[:, 2] = -1.0

    # synthesize pixel measurements with the model itself
    det_stamps, det_vals, det_burst = [], [], []
    for k, t in enumerate(ticks):
        for lm in true_lms:
            z_px = np.asarray(slam.h_fls(jnp.asarray(poses[k]), jnp.asarray(lm, jnp.float32), params))
            if z_px[0] > 0:
                det_stamps.append(t)
                det_vals.append([z_px[0], z_px[1], 0.0])
                det_burst.append(k)

    from smarc_navigation_tpu.ops.timeline import build_timeline

    tl = build_timeline(
        0.0, T / CFG.system_freq, CFG.system_freq,
        channels={"odom": (ticks, poses)},
        events={"fls": (np.asarray(det_stamps), np.asarray(det_vals),
                        np.asarray(det_burst), CFG.max_obs)},
    )
    final, out = jax.jit(lambda t: slam.run(t, params, CFG))(tl)
    assert int(final.n_active) == 2, int(final.n_active)
    lm_est, act = slam.landmarks_map(final, CFG)
    est = np.asarray(lm_est)[np.asarray(act)]
    d = np.linalg.norm(est[:, None, :2] - true_lms[None, :, :2], axis=-1).min(axis=1)
    assert d.max() < 1.0, (est, d)
