"""15-state EKF lanes kernel vs the dense scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import ekf_15state as e15
from smarc_navigation_tpu.ops import ekf15_kernels
from smarc_navigation_tpu.parallel import fleet


@pytest.fixture(autouse=True)
def interpret_pallas():
    with pltpu.force_tpu_interpret_mode():
        yield


def _fleet(cfg, include_gps, B=2, duration=4.0):
    tls = []
    for s in range(B):
        m = sim.simulate(sim.MissionSpec(duration_s=duration, seed=5 + s))
        tls.append(e15.ekf15_timeline(m, cfg, include_gps=include_gps))
    return tls, fleet.batch_timelines(tls)


def test_fleet15_matches_dense_local():
    cfg = e15.Ekf15Config(frequency=50.0)
    tls, batched = _fleet(cfg, include_gps=True)
    (xf, Pf), out = ekf15_kernels.run_fleet15(batched, cfg)
    for b, tl in enumerate(tls):
        final_d, out_d = e15.run(tl, cfg)
        xk = np.asarray(out["x"][:, b])
        xd = np.asarray(out_d["x"])
        np.testing.assert_allclose(xk, xd, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(out["p_diag"][:, b]), np.asarray(out_d["p_diag"]),
            rtol=0.05, atol=2e-2)
        np.testing.assert_allclose(np.asarray(xf[b]), np.asarray(final_d.x),
                                   atol=2e-2)


def test_fleet15_matches_dense_global():
    cfg = e15.global_config(frequency=50.0)
    tls, batched = _fleet(cfg, include_gps=True, B=1)
    (xf, Pf), out = ekf15_kernels.run_fleet15(batched, cfg)
    final_d, out_d = e15.run(tls[0], cfg)
    np.testing.assert_allclose(
        np.asarray(out["x"][:, 0]), np.asarray(out_d["x"]), atol=5e-2)


def test_dual_fleet_matches_run_dual():
    """run_dual_fleet (both filters through the lanes kernel) reproduces
    the dense run_dual per mission, including the map->odom corrections."""
    cfg_l = e15.Ekf15Config(frequency=50.0)
    cfg_g = e15.global_config(frequency=50.0)
    tls, batched = _fleet(cfg_l, include_gps=True, B=2)
    (fl, ol), (fg, og), map_odom = e15.run_dual_fleet(
        batched, batched, cfg_l, cfg_g)
    for b, tl in enumerate(tls):
        (fl_d, ol_d), (fg_d, og_d), mo_d = e15.run_dual(tl, tl, cfg_l, cfg_g)
        np.testing.assert_allclose(
            np.asarray(ol["x"][:, b]), np.asarray(ol_d["x"]), atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(og["x"][:, b]), np.asarray(og_d["x"]), atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(map_odom.trans[:, b]), np.asarray(mo_d.trans),
            atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(map_odom.rot[:, b]), np.asarray(mo_d.rot), atol=5e-2)
