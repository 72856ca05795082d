"""Whole-tick EKF-localization fleet kernel vs the dense scan path.

The kernel re-expresses every 3x3/6x6 product componentwise with missions in
the VPU lanes; this test pins its filter semantics (association decisions
and state evolution) to the dense ``ekf_localization.step`` path in
interpreter mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from smarc_navigation_tpu.configs import EKFLocConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import ekf_localization as loc
from smarc_navigation_tpu.parallel import fleet


@pytest.fixture(autouse=True)
def interpret_pallas():
    with pltpu.force_tpu_interpret_mode():
        yield


def _setup(duration=6.0, B=2):
    cfg = dataclasses.replace(
        EKFLocConfig(), stone_offset=0.0,
        r_diag=(1e-4,) * 3 + (1e-6,) * 3, q_diag=(0.25,) * 3,
    )
    tls = []
    for seed in range(B):
        m = sim.simulate(
            sim.MissionSpec(duration_s=duration, num_landmarks=12,
                            dvl_std=0.05, mbes_std=0.05, seed=7 + seed)
        )
        tls.append(loc.loc_timeline(m, cfg))
    params = loc.make_params(m.landmarks, cfg)
    return cfg, params, tls, m


def test_fleet_kernel_matches_dense_path():
    cfg, params, tls, m = _setup()
    batched = fleet.batch_timelines(tls)

    final_k, out_k = loc.run_fleet(batched, params, cfg)

    for b, tl in enumerate(tls):
        final_d, out_d = loc.run(tl, params, cfg)
        mu_k = np.asarray(out_k["mu"][:, b])
        mu_d = np.asarray(out_d["mu"])
        np.testing.assert_allclose(mu_k, mu_d, atol=2e-3)
        # association decisions must agree
        mk = np.asarray(out_k["matches"][:, b])
        md = np.asarray(out_d["matches"])
        agree = (mk == md).mean()
        assert agree == 1.0, f"mission {b}: association agreement {agree}"
        np.testing.assert_allclose(
            np.asarray(out_k["sigma_diag"][:, b]),
            np.asarray(out_d["sigma_diag"]), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(final_k.mu[b]), np.asarray(final_d.mu), atol=2e-3)


def test_fleet_kernel_tracks_ground_truth():
    cfg, params, tls, m = _setup(duration=6.0, B=1)
    batched = fleet.batch_timelines(tls)
    _, out = loc.run_fleet(batched, params, cfg)
    ticks = np.arange(0, 6.0 + 1e-9, 1.0 / cfg.system_freq)
    gt = m.gt_at(ticks)
    err = np.linalg.norm(np.asarray(out["mu"])[:, 0, 0:3] - gt[:, 0:3], axis=1)
    assert err[-1] < 1.0
    assert np.isfinite(np.asarray(out["sigma_diag"])).all()


def test_fleet_kernel_no_input_rebroadcast():
    """Ticks without IMU+DVL contact must leave the state untouched."""
    cfg, params, tls, _ = _setup(duration=4.0, B=1)
    tl = tls[0]
    # kill the imu validity after 2 s
    cut = np.asarray(tl.ticks[0] if tl.ticks.ndim > 1 else tl.ticks) > 2.0
    imu = tl.channels["imu"]
    tl2 = tl.replace(
        channels={**tl.channels,
                  "imu": imu.replace(valid=imu.valid & jnp.asarray(~cut))}
    )
    batched = fleet.batch_timelines([tl2])
    _, out = loc.run_fleet(batched, params, cfg)
    mu = np.asarray(out["mu"][:, 0])
    k = int(np.argmax(cut))
    np.testing.assert_array_equal(mu[k], mu[-1])
