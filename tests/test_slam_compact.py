"""Event-compacted SLAM replay (``run_fleet_compact``) vs the dense fleet.

The compacted path composes per-tick (A_t, R_t) predicts outside the scan
(segmented associative scan) and runs the kernel scan over EVENT ticks
only. That re-associates f32 sums (odometry increments; covariance
products), so tracks are pinned with tolerances — but association
decisions and the landmark bank must match EXACTLY, and per-tick outputs
must be reconstructed at every tick (including event-free ones).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.models import ekf_slam as slam
from smarc_navigation_tpu.parallel import fleet

from test_slam_fleet import _slam_tls


@pytest.fixture(autouse=True)
def interpret_pallas():
    with pltpu.force_tpu_interpret_mode():
        yield


def _cfg():
    return dataclasses.replace(
        EKFSlamConfig(), max_landmarks=16, max_obs=4,
        mhl_dist_mbes=1.0, q_mbes_diag=(0.1,) * 3, r_diag=(1e-3,) * 6)


def test_compact_matches_dense_fleet():
    cfg = _cfg()
    params = slam.make_params(cfg)
    batched = fleet.batch_timelines(_slam_tls(cfg, 6.0, [1]))

    ev_occ = np.asarray(batched.events["mbes"].mask).any(axis=(0, 2)).mean()
    assert ev_occ < 0.95, "workload has no event-free ticks to compact"

    final_d, out_d = slam.run_fleet(batched, params, cfg)
    final_c, out_c = slam.run_fleet_compact(batched, params, cfg)

    # association decisions and bank evolution: EXACT
    np.testing.assert_array_equal(
        np.asarray(out_c["matched_mbes"]), np.asarray(out_d["matched_mbes"]))
    np.testing.assert_array_equal(
        np.asarray(out_c["n_active"]), np.asarray(out_d["n_active"]))
    assert int(final_c.n_active[0]) == int(final_d.n_active[0])
    np.testing.assert_array_equal(
        np.asarray(final_c.active), np.asarray(final_d.active))

    # per-tick pose track (event AND event-free ticks): f32 re-association
    np.testing.assert_allclose(
        np.asarray(out_c["mu"]), np.asarray(out_d["mu"]), atol=1e-3)
    # final state
    np.testing.assert_allclose(
        np.asarray(final_c.mu), np.asarray(final_d.mu), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(final_c.Sigma), np.asarray(final_d.Sigma),
        atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(final_c.mu_auv_odom), np.asarray(final_d.mu_auv_odom),
        atol=1e-4)


def test_compact_falls_back_on_invalid_odom():
    cfg = _cfg()
    params = slam.make_params(cfg)
    batched = fleet.batch_timelines(_slam_tls(cfg, 3.0, [2]))
    od = batched.channels["odom"]
    valid = np.asarray(od.valid).copy()
    valid[:, valid.shape[1] // 2] = False
    batched = batched.replace(channels={
        **batched.channels, "odom": od.replace(valid=jnp.asarray(valid))})

    final_d, out_d = slam.run_fleet(batched, params, cfg)
    final_c, out_c = slam.run_fleet_compact(batched, params, cfg)
    # fallback == dense path, bitwise
    np.testing.assert_array_equal(
        np.asarray(out_c["mu"]), np.asarray(out_d["mu"]))
    np.testing.assert_array_equal(
        np.asarray(final_c.Sigma), np.asarray(final_d.Sigma))
