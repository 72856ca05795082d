import jax
import jax.numpy as jnp
import numpy as np

from smarc_navigation_tpu.configs import DRConfig, OdomProviderConfig
from smarc_navigation_tpu.io import metrics, sim
from smarc_navigation_tpu.models import dead_reckoning as dr
from smarc_navigation_tpu.ops import bezier, oned_kf


def short_mission(**kw):
    spec = sim.MissionSpec(duration_s=30.0, **kw)
    return sim.simulate(spec)


def test_bernstein_weights_sum_to_one():
    stamps = jnp.asarray(np.array([0.0, 0.1, 0.2, 0.3, 0.4]))
    for t in [0.4, 0.45, 0.41]:
        w = bezier.bernstein_weights(stamps, jnp.asarray(t))
        assert abs(float(jnp.sum(w)) - 1.0) < 1e-5
    # exactly at the newest stamp: all weight on newest reading
    w = bezier.bernstein_weights(stamps, jnp.asarray(0.4))
    np.testing.assert_allclose(np.asarray(w), [0, 0, 0, 0, 1], atol=1e-6)


def test_bezier_linear_signal_reference_semantics():
    """On a linear signal v(t)=2t the reference's Bernstein weighting yields
    E[v] = v(s_n - x·span): as t moves past the newest stamp the weight mass
    shifts toward *older* readings (weights index reading n-l with
    coefficient C(n,l)(1-x)^{n-l} x^l) — i.e. it smooths into the window's
    past rather than extrapolating forward. At t=0.45 over stamps 0..0.4:
    x=0.125, E[l]=n·x=0.5, result = 2·(0.4 - 0.1·0.5) = 0.7."""
    stamps = jnp.asarray(np.linspace(0.0, 0.4, 5))
    vals = jnp.asarray((np.linspace(0.0, 0.4, 5) * 2.0)[:, None])
    out = bezier.bezier_interpolate(vals, stamps, jnp.asarray(0.45))
    np.testing.assert_allclose(np.asarray(out), [0.7], atol=1e-5)


def test_oned_kf_converges_to_constant():
    zs = jnp.full((200,), 3.0)
    state, path = oned_kf.smooth(zs, mu0=0.0, sigma0=1.0, r=10.0, q=20.0)
    assert abs(float(state.mu) - 3.0) < 1e-3
    # monotone-ish approach
    assert float(path[0]) < float(path[-1])


def test_oned_kf_oracle():
    # numpy transcription of noise_oneD_kf.cpp:26-37
    rng = np.random.default_rng(3)
    zs = rng.normal(size=20).astype(np.float32)
    mu, sigma = 0.0, 1.0
    for z in zs:
        sig_hat = sigma + 10.0
        k = sig_hat / (sig_hat + 20.0)
        mu = mu + k * (z - mu)
        sigma = (1 - k) * sig_hat
    state, _ = oned_kf.smooth(jnp.asarray(zs), 0.0, 1.0, 10.0, 20.0)
    assert abs(float(state.mu) - mu) < 1e-5
    assert abs(float(state.sigma) - sigma) < 1e-5


def test_sam_dr_tracks_ideal_sensors():
    """With noiseless IMU/DVL/depth the DR chain must track ground truth."""
    m = short_mission()
    tl = dr.sam_timeline(m)
    out = np.asarray(jax.jit(dr.run_sam_dr)(tl))
    gt = m.gt_at(np.asarray(tl.ticks, dtype=np.float64))

    rep = metrics.summarize(jnp.asarray(out[:, :6]), jnp.asarray(gt))
    # DR drift with ideal sensors is only discretization error
    assert rep["rmse_pos"] < 0.6, rep
    assert rep["final_error"] < 1.2, rep
    assert rep["rmse_att"] < 0.05, rep
    # depth channel is substituted directly -> near-exact (skip the pre-first-
    # message transient in the first second)
    assert np.max(np.abs(out[60:, 2] - gt[60:, 2])) < 0.1


def test_sam_dr_dvl_dropout_falls_back():
    """DVL dropout mid-mission: motion-model fallback keeps pose bounded."""
    m = short_mission(dvl_dropout=(10.0, 15.0))
    tl = dr.sam_timeline(m)
    out = np.asarray(dr.run_sam_dr(tl))
    gt = m.gt_at(np.asarray(tl.ticks, dtype=np.float64))
    err = np.linalg.norm(out[:, :2] - gt[:, :2], axis=-1)
    assert np.isfinite(out).all()
    # bounded error during/after dropout (fallback is crude but sane)
    assert err.max() < 8.0, err.max()


def test_odom_provider_tracks_ideal_sensors():
    m = short_mission()
    tl = dr.odom_timeline(m)
    out = np.asarray(jax.jit(dr.run_odom_provider)(tl))
    gt = m.gt_at(np.asarray(tl.ticks, dtype=np.float64))
    rep = metrics.summarize(jnp.asarray(out), jnp.asarray(gt))
    # the 1-D KF smoothing lags velocity ramps -> small drift is expected
    assert rep["rmse_pos"] < 1.5, rep
    assert rep["rmse_att"] < 0.05, rep


def test_runs_are_deterministic():
    m = short_mission()
    tl = dr.sam_timeline(m)
    a = np.asarray(dr.run_sam_dr(tl))
    b = np.asarray(dr.run_sam_dr(tl))
    np.testing.assert_array_equal(a, b)


def test_vectorized_sam_dr_matches_scan():
    """The closed-form (cumsum) replay must reproduce the scanned recurrence
    exactly (the recurrence is associative; wrap commutes mod 2*pi)."""
    from smarc_navigation_tpu.models import dead_reckoning as dr

    m = sim.simulate(sim.MissionSpec(duration_s=12.0, seed=9))
    tl = dr.sam_timeline(m)
    out_scan = np.asarray(dr.run_sam_dr(tl))
    out_vec = np.asarray(dr.run_sam_dr_vectorized(tl))
    np.testing.assert_allclose(out_vec, out_scan, atol=5e-4)

    # dropout mission (DVL gaps exercise the gating + fallback)
    m2 = sim.simulate(sim.MissionSpec(duration_s=12.0, seed=10,
                                      dvl_dropout=(4.0, 7.0)))
    tl2 = dr.sam_timeline(m2)
    np.testing.assert_allclose(
        np.asarray(dr.run_sam_dr_vectorized(tl2)),
        np.asarray(dr.run_sam_dr(tl2)), atol=5e-4)
