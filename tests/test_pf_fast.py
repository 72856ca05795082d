"""Equivalence + tracking tests for the PF TPU fast paths.

ADVICE r02 (medium): ``run(use_pallas=True, scheme="systematic")`` routes
through ``run_fast`` / ``run_fast_segmented`` (vectorized tick precompute,
host-side segmentation, multi-tick kernel) — these pin them to each other
and to the dense ``run(use_pallas=False)`` scan, mirroring the
test_loc_kernels / test_slam_fleet coverage pattern.

All kernel PRNG draws are zeroed by construction (sd=0 rows multiply the
Box-Muller output by 0), so the comparisons are exact and independent of
the interpreter's degenerate pltpu PRNG; resample keys come from threefry
(identical across paths by construction of ``_tick_precompute``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smarc_navigation_tpu.configs import PFConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import particle_filter as pf


@pytest.fixture(autouse=True)
def interpret_pallas():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _timeline(duration=15.0, seed=3):
    m = sim.simulate(
        sim.MissionSpec(duration_s=duration, seed=seed, gps_surface_z=-100.0)
    )
    return pf.pf_timeline(m, freq_hz=10.0), m


N = 2048


def test_fast_segmented_matches_fast_exactly():
    """run_fast and run_fast_segmented consume identical per-tick params,
    seeds, and update keys (_tick_precompute); with the noise stds zeroed
    the banks evolve bit-identically, so the segmented bookkeeping (segment
    idx, pad kill-mask, flat_slot moment gather, update-slot sums) must
    reproduce run_fast's outputs exactly."""
    tl, _m = _timeline()
    cfg = PFConfig(
        particle_count=N,
        init_cov=(4.0, 4.0, 0.0, 0.0, 0.0, 0.04),
        motion_cov=(0.0,) * 6,
        res_noise_cov=(0.0,) * 6,
    )
    params = pf.make_params(cfg)
    key = jax.random.PRNGKey(42)

    f1, o1 = pf.run_fast(tl, params, cfg, key=key)
    f2, o2 = pf.run_fast_segmented(tl, params, cfg, key=key, k_max=5)

    # x/y/yaw must be BITWISE equal — they feed the weights, and any ULP
    # drift flips resample ancestors at stratum boundaries (caught a real
    # op-order mismatch between _kernel and _make_kernel_multi in r03)
    p1, p2 = np.asarray(f1.particles), np.asarray(f2.particles)
    for row in (0, 1, 5):
        np.testing.assert_array_equal(p1[row], p2[row])
    # z/roll/pitch are substituted absolutely each fresh tick; ULP tolerance
    np.testing.assert_allclose(p1, p2, atol=1e-8)
    np.testing.assert_allclose(np.asarray(o1["mean"]), np.asarray(o2["mean"]),
                               atol=1e-5)
    # cov is sxx/n - mx^2 with mx^2 ~ 1e2-1e3: f32 cancellation amplifies
    # reduction-order ULPs (different fusion contexts) to ~1e-5
    np.testing.assert_allclose(np.asarray(o1["cov"]), np.asarray(o2["cov"]),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(o1["updated"]),
                                  np.asarray(o2["updated"]))
    # the public entry points route to these paths
    _, o3 = pf.run(tl, params, cfg, key=key, scheme="systematic",
                   use_pallas=True, segmented=False)
    np.testing.assert_array_equal(np.asarray(o1["mean"]), np.asarray(o3["mean"]))
    _, o4 = pf.run(tl, params, cfg, key=key, scheme="systematic",
                   use_pallas=True)  # auto -> segmented (concrete timeline)
    np.testing.assert_allclose(np.asarray(o2["mean"]), np.asarray(o4["mean"]),
                               atol=1e-6)


def test_fast_paths_match_dense_scan_deterministic():
    """Zeroed noise + zero init spread: every particle is the single
    reference trajectory, resampling is the identity on the bank, and all
    three paths (dense scan, per-tick kernel, segmented kernel) must report
    the same mean track — pinning dt/cummax staleness handling, the
    z/roll/pitch substitution gating, and moment finalization."""
    tl, _m = _timeline()
    cfg = PFConfig(
        particle_count=N,
        init_cov=(0.0,) * 6,
        motion_cov=(0.0,) * 6,
        res_noise_cov=(0.0,) * 6,
    )
    params = pf.make_params(cfg)
    key = jax.random.PRNGKey(7)

    dense = jax.jit(
        lambda t: pf.run(t, params, cfg, key=key, scheme="systematic",
                         use_pallas=False)[1]
    )(tl)
    _, fast = pf.run_fast(tl, params, cfg, key=key)
    _, seg = pf.run_fast_segmented(tl, params, cfg, key=key, k_max=7)

    for out in (fast, seg):
        np.testing.assert_allclose(np.asarray(dense["mean"]),
                                   np.asarray(out["mean"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dense["cov"]),
                                   np.asarray(out["cov"]), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(dense["updated"]),
                                      np.asarray(out["updated"]))


def test_gps_updates_contract_the_bank():
    """GPS-update tracking: with a wide init spread and no motion noise, the
    resampling at GPS ticks must contract the bank around the (GT-derived)
    fixes — position variance collapses vs the no-update (diving) replay and
    the mean tracks ground truth."""
    tl, m = _timeline(duration=20.0)
    cfg = PFConfig(
        particle_count=N,
        init_cov=(25.0, 25.0, 0.0, 0.0, 0.0, 1e-4),
        motion_cov=(0.0, 0.0, 0.0, 0.0, 0.0, 1e-12),
        res_noise_cov=(0.04, 0.04, 0.0, 0.0, 0.0, 1e-6),
    )
    params = pf.make_params(cfg)
    key = jax.random.PRNGKey(0)

    for runner in (
        lambda: pf.run_fast(tl, params, cfg, key=key),
        lambda: pf.run_fast_segmented(tl, params, cfg, key=key, k_max=6),
    ):
        final, out = runner()
        assert bool(np.asarray(out["updated"]).any())
        gt_end = m.gt_at(np.asarray([float(tl.ticks[-1])]))[0]
        mean_end = np.asarray(out["mean"])[-1]
        # updates pull the wide bank onto the GT track
        assert np.linalg.norm(mean_end[0:2] - gt_end[0:2]) < 1.5
        cov_end = np.asarray(out["cov"])[-1]
        assert cov_end[0, 0] < 2.0 and cov_end[1, 1] < 2.0  # from 25.0

    # control: diving the whole mission disables updates; spread persists
    tl_dive = tl.replace(
        channels={
            **tl.channels,
            "diving": tl.channels["diving"].replace(
                value=jnp.ones_like(tl.channels["diving"].value)
            ),
        }
    )
    _, out_d = pf.run_fast(tl_dive, params, cfg, key=key)
    assert not bool(np.asarray(out_d["updated"]).any())
    cov_d = np.asarray(out_d["cov"])[-1]
    assert cov_d[0, 0] > 10.0 and cov_d[1, 1] > 10.0


def test_update_tick_moments_are_post_resample():
    """ADVICE r02 (low): the segmented path must report update-tick moments
    post-resample, matching run_fast — a GPS fix far from the bank mean
    shifts that tick's reported mean toward the fix in BOTH paths."""
    tl, _m = _timeline(duration=15.0)
    cfg = PFConfig(
        particle_count=N,
        init_cov=(16.0, 16.0, 0.0, 0.0, 0.0, 1e-4),
        motion_cov=(0.0,) * 6,
        res_noise_cov=(0.0,) * 6,
    )
    params = pf.make_params(cfg)
    key = jax.random.PRNGKey(5)

    _, o_fast = pf.run_fast(tl, params, cfg, key=key)
    _, o_seg = pf.run_fast_segmented(tl, params, cfg, key=key, k_max=9)
    upd = np.asarray(o_fast["updated"])
    assert upd.any()
    ts = np.nonzero(upd)[0]
    np.testing.assert_allclose(
        np.asarray(o_fast["mean"])[ts], np.asarray(o_seg["mean"])[ts],
        atol=1e-5,
    )
    # and they genuinely moved: pre-resample mean (previous tick) differs
    t0 = ts[0]
    if t0 > 0:
        pre = np.asarray(o_seg["mean"])[t0 - 1][0:2]
        post = np.asarray(o_seg["mean"])[t0][0:2]
        assert np.linalg.norm(post - pre) > 1e-3
