import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smarc_navigation_tpu.io import metrics, sim
from smarc_navigation_tpu.models import ekf_15state as e15


def test_transition_jacobian_vs_numeric():
    rng = np.random.default_rng(0)
    x = rng.normal(size=15) * 0.5
    dt = 0.01
    F = np.asarray(jax.jacfwd(lambda s: e15.transition(s, dt))(jnp.asarray(x, jnp.float32)))
    eps = 1e-4
    F_num = np.zeros((15, 15))
    for i in range(15):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        fp = np.asarray(e15.transition(jnp.asarray(xp), dt))
        fm = np.asarray(e15.transition(jnp.asarray(xm), dt))
        d = fp - fm
        d[3:6] = (d[3:6] + np.pi) % (2 * np.pi) - np.pi
        F_num[:, i] = d / (2 * eps)
    np.testing.assert_allclose(F, F_num, atol=5e-3)


def test_depth_only_update_fixes_z():
    cfg = e15.Ekf15Config()
    st = e15.init_state(cfg)
    st = st._replace(P=st.P.at[2, 2].set(1.0))  # uncertain depth prior
    z = jnp.zeros(15).at[2].set(-7.0)
    mask = jnp.asarray([False, False, True] + [False] * 12)
    noise = jnp.full(15, 0.001)
    st = e15.update(st, z, mask, noise, jnp.asarray(True))
    assert abs(float(st.x[2]) + 7.0) < 0.05
    # x untouched
    assert abs(float(st.x[0])) < 1e-5


def test_update_respects_apply_gate():
    cfg = e15.Ekf15Config()
    st = e15.init_state(cfg)
    z = jnp.zeros(15).at[2].set(-7.0)
    mask = jnp.asarray([False, False, True] + [False] * 12)
    st2 = e15.update(st, z, mask, jnp.full(15, 0.001), jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(st.x))


def test_local_filter_tracks_mission():
    m = sim.simulate(sim.MissionSpec(duration_s=30.0, dvl_std=0.02, imu_rpy_std=0.002,
                                     depth_std=0.02))
    cfg = e15.Ekf15Config(frequency=50.0)
    tl = e15.ekf15_timeline(m, cfg)
    final, out = jax.jit(lambda t: e15.run(t, cfg))(tl)
    ticks = np.asarray(tl.ticks, np.float64)
    gt = m.gt_at(ticks)
    x = np.asarray(out["x"])
    assert np.isfinite(x).all()
    rep = metrics.summarize(jnp.asarray(x[:, :6]), jnp.asarray(gt))
    assert rep["rmse_att"] < 0.05, rep
    # depth fused directly
    assert np.abs(x[200:, 2] - gt[200:, 2]).max() < 0.3
    # velocity-integrated position: bounded drift
    assert rep["rmse_pos"] < 2.0, rep


def test_dual_adds_gps_and_reduces_xy_drift():
    # a biased, noisy DVL makes the GPS-denied local filter drift; the
    # global filter's GPS fixes (always available: surface threshold -100)
    # must keep the map-frame estimate bounded
    m = sim.simulate(sim.MissionSpec(duration_s=120.0, dvl_std=0.3, gps_std=0.3,
                                     dvl_bias=(0.05, 0.02, 0.0),
                                     gps_surface_z=-100.0))
    cfg_l = e15.Ekf15Config(frequency=50.0)
    cfg_g = e15.global_config(frequency=50.0)
    tl_l = e15.ekf15_timeline(m, cfg_l)  # GPS-denied local replay
    tl_g = e15.ekf15_timeline(m, cfg_g, include_gps=True)
    (fl, ol), (fg, og), map_odom = e15.run_dual(tl_l, tl_g, cfg_l, cfg_g)
    gt = m.gt_at(np.asarray(tl_l.ticks, np.float64))
    e_local = np.linalg.norm(np.asarray(ol["x"])[:, :2] - gt[:, :2], axis=-1).mean()
    e_global = np.linalg.norm(np.asarray(og["x"])[:, :2] - gt[:, :2], axis=-1).mean()
    assert e_global < e_local + 1e-6, (e_global, e_local)
    assert e_global < 1.0, e_global
    # map->odom correction: per-tick transforms, consistent with the two
    # pose tracks (T_map_odom applied to the local pose == the global pose)
    T = len(np.asarray(tl_l.ticks))
    assert map_odom.trans.shape == (T, 3)
    reproj = np.asarray(map_odom.apply(jnp.asarray(np.asarray(ol["x"])[:, 0:3])))
    np.testing.assert_allclose(reproj, np.asarray(og["x"])[:, 0:3], atol=1e-4)


def test_sensor_timeout_skips_stale():
    """A sensor channel that stops mid-mission is ignored after timeout_s."""
    m = sim.simulate(sim.MissionSpec(duration_s=20.0, dvl_dropout=(8.0, 20.0)))
    cfg = e15.Ekf15Config(frequency=50.0)
    tl = e15.ekf15_timeline(m, cfg)
    final, out = e15.run(tl, cfg)
    x = np.asarray(out["x"])
    assert np.isfinite(x).all()
    # covariance of vx grows again after DVL dies
    p = np.asarray(out["p_diag"])
    t = np.asarray(tl.ticks)
    before = p[(t > 6) & (t < 8), 6].mean()
    after = p[t > 15, 6].mean()
    assert after > before


def test_golden_vs_numpy_oracle():
    """Jitted f32 15-state filter vs the independent f64 numpy oracle
    (tests/oracles/ekf15_oracle.py) on the same mission timeline: identical
    sensor schedule, control shaping, and noise config."""
    from tests.oracles import ekf15_oracle as o15

    m = sim.simulate(sim.MissionSpec(duration_s=10.0, dvl_std=0.02,
                                     imu_rpy_std=0.002, depth_std=0.02))
    cfg = e15.Ekf15Config(frequency=50.0)
    tl = e15.ekf15_timeline(m, cfg)
    final, out = jax.jit(lambda t: e15.run(t, cfg))(tl)
    x_jax = np.asarray(out["x"])

    ticks = np.asarray(tl.ticks, np.float64)
    chans = {
        name: {
            "value": np.asarray(c.value, np.float64),
            "fresh": np.asarray(c.fresh),
            "age": np.asarray(c.age, np.float64),
            "valid": np.asarray(c.valid),
        }
        for name, c in tl.channels.items()
    }
    oracle = o15.Oracle15(cfg.process_noise_diag, cfg.initial_cov_diag,
                          cfg.control_gains, cfg.control_limits)
    xs = np.zeros((len(ticks), 15))
    for k in range(len(ticks)):
        cmdch = chans["cmd_vel"]
        cmd = cmdch["value"][k][0:3] if cmdch["valid"][k] else None
        sensors = []
        for spec in cfg.sensors:
            if spec.channel not in chans:
                continue
            ch = chans[spec.channel]
            apply = bool(ch["fresh"][k]) and ch["age"][k] < spec.timeout_s
            sensors.append((ch["value"][k][0:15], spec.mask, spec.noise_diag, apply))
        xs[k] = oracle.step(ticks[k], sensors, cmd=cmd, use_control=cfg.use_control)

    # f32 filter vs f64 oracle: same track to filter tolerance
    err_pos = np.linalg.norm(x_jax[:, 0:3] - xs[:, 0:3], axis=-1)
    err_att = np.abs((x_jax[:, 3:6] - xs[:, 3:6] + np.pi) % (2 * np.pi) - np.pi)
    assert err_pos.max() < 2e-2, err_pos.max()
    assert err_att.max() < 2e-3, err_att.max()
