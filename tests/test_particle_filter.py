import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smarc_navigation_tpu.configs import PFConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import particle_filter as pf
from smarc_navigation_tpu.ops import resampling


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------

def _check_counts(scheme, atol_frac=0.15):
    key = jax.random.PRNGKey(0)
    n = 4000
    w = np.zeros(n)
    w[10] = 0.5
    w[20] = 0.3
    w[30] = 0.2
    idx = np.asarray(resampling.SCHEMES[scheme](key, jnp.asarray(w, jnp.float32)))
    assert idx.shape == (n,)
    counts = np.bincount(idx, minlength=n)
    assert set(np.nonzero(counts)[0]) <= {10, 20, 30}
    for i, frac in [(10, 0.5), (20, 0.3), (30, 0.2)]:
        assert abs(counts[i] / n - frac) < atol_frac, (scheme, i, counts[i] / n)


def test_resampling_schemes_target_distribution():
    for scheme in ["systematic", "stratified", "multinomial", "residual"]:
        _check_counts(scheme)


def test_residual_deterministic_part_exact():
    """⌊N·w⌋ copies are allocated deterministically (filterpy semantics)."""
    key = jax.random.PRNGKey(1)
    w = jnp.asarray([0.5, 0.25, 0.25, 0.0], jnp.float32)
    idx = np.asarray(resampling.residual_resample(key, w))
    counts = np.bincount(idx, minlength=4)
    # exact: 2,1,1,0 (all mass deterministic)
    np.testing.assert_array_equal(counts, [2, 1, 1, 0])


def test_uniform_weights_systematic_is_identity_like():
    key = jax.random.PRNGKey(2)
    n = 64
    w = jnp.full((n,), 1.0 / n)
    idx = np.asarray(resampling.systematic_resample(key, w))
    np.testing.assert_array_equal(np.sort(idx), np.arange(n))


# ---------------------------------------------------------------------------
# particle filter
# ---------------------------------------------------------------------------

def make_case(duration=40.0, n=500, meas_std=1.0, **kw):
    kw.setdefault("gps_std", 0.3)
    kw.setdefault("dvl_std", 0.02)
    # the PF's GPS weighting is exercised on surface vehicles (floatsam);
    # keep fixes available throughout
    kw.setdefault("gps_surface_z", -100.0)
    m = sim.simulate(sim.MissionSpec(duration_s=duration, **kw))
    cfg = dataclasses.replace(
        PFConfig(),
        particle_count=n,
        measurement_std=meas_std,
        motion_cov=(1e-4, 1e-4, 0.0, 0.0, 0.0, 1e-6),
    )
    tl = pf.pf_timeline(m)
    params = pf.make_params(cfg)
    return m, cfg, tl, params


def test_pf_tracks_mission():
    m, cfg, tl, params = make_case()
    final, out = jax.jit(lambda t: pf.run(t, params, cfg))(tl)
    ticks = np.asarray(tl.ticks, np.float64)
    gt = m.gt_at(ticks)
    est = np.asarray(out["mean"])
    err = np.linalg.norm(est[:, :2] - gt[:, :2], axis=-1)
    assert np.isfinite(est).all()
    assert err[len(err) // 2 :].mean() < 1.5, err.mean()
    # depth is read directly from odometry
    assert np.abs(est[20:, 2] - gt[20:, 2]).max() < 0.2
    assert int(jnp.sum(out["updated"])) > 10


def test_pf_dive_gates_gps():
    """While diving, no GPS updates happen."""
    m, cfg, tl, params = make_case(duration=20.0)
    # force diving the whole mission
    div = tl.channels["diving"]
    tl2 = tl.replace(channels={**tl.channels, "diving": div.replace(value=jnp.ones_like(div.value))})
    _, out = pf.run(tl2, params, cfg)
    assert int(jnp.sum(out["updated"])) == 0


def test_pf_gps_reduces_drift():
    m, cfg, tl, params = make_case(duration=60.0)
    # with GPS
    _, out = pf.run(tl, params, cfg)
    # without GPS (all diving)
    div = tl.channels["diving"]
    tl_nog = tl.replace(channels={**tl.channels, "diving": div.replace(value=jnp.ones_like(div.value))})
    cfg_noisy = dataclasses.replace(cfg, motion_cov=(1e-2, 1e-2, 0, 0, 0, 1e-4))
    params_noisy = pf.make_params(cfg_noisy)
    _, out_nog = pf.run(tl_nog, params_noisy, cfg_noisy)
    gt = m.gt_at(np.asarray(tl.ticks, np.float64))
    e_gps = np.linalg.norm(np.asarray(out["mean"])[:, :2] - gt[:, :2], axis=-1).mean()
    e_nog = np.linalg.norm(np.asarray(out_nog["mean"])[:, :2] - gt[:, :2], axis=-1).mean()
    assert np.isfinite(e_nog)
    assert e_gps <= e_nog + 0.5


def test_estimate_yaw_circular_mean():
    parts = jnp.zeros((6, 4)).at[5, :].set(jnp.asarray([3.1, -3.1, 3.14, -3.14]))
    mean, _ = pf.estimate(parts)
    # near ±pi seam the circular mean stays at the seam, not at 0
    assert abs(abs(float(mean[5])) - np.pi) < 0.05


def test_pf_scales_to_100k_particles():
    m, cfg, tl, params = make_case(duration=10.0, n=100_000)
    final, out = jax.jit(lambda t: pf.run(t, params, cfg, n_particles=100_000))(tl)
    assert final.particles.shape == (6, 100_000)
    assert bool(jnp.isfinite(out["mean"]).all())
