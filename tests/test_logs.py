"""Recorded-log ingestion (io/logs.py + io/bag_convert.py): the rosbag
replay workflow of the reference (rosbag_handler.py) without ROS."""

import json
import os
import types

import jax
import numpy as np
import pytest

from smarc_navigation_tpu.io import bag_convert, logs, sim


def _mission(duration=20.0, seed=0):
    return sim.simulate(
        sim.MissionSpec(duration_s=duration, num_landmarks=12, mbes_std=0.05,
                        landmark_area_m=40.0, mbes_range_m=30.0, seed=seed)
    )


def _odom13(m, ticks):
    import jax.numpy as jnp
    from smarc_navigation_tpu.utils.geometry import quat_from_rpy

    gt = m.gt_at(ticks)
    quat = np.asarray(quat_from_rpy(jnp.asarray(gt[:, 3:6])))
    k = np.clip((ticks * m.spec.sim_hz).astype(int), 0, len(m.t) - 1)
    return np.concatenate([gt[:, 0:3], quat, m.vel_body[k], m.gyro[k]], axis=1)


def test_save_load_roundtrip(tmp_path):
    m = _mission()
    streams = logs.mission_to_log(m)
    path = str(tmp_path / "mission.npz")
    logs.save_log(path, streams, meta={"vehicle": "lolo"})
    loaded, meta = logs.load_log(path)
    assert meta["vehicle"] == "lolo" and meta["schema_version"] == 1
    assert set(loaded) == set(streams)
    np.testing.assert_allclose(
        loaded["dvl"]["values"], np.atleast_2d(np.asarray(streams["dvl"]["values"]))
    )
    np.testing.assert_array_equal(
        loaded["mbes_detections"]["burst"], streams["mbes_detections"]["burst"]
    )


def test_csv_stream(tmp_path):
    path = str(tmp_path / "depth.csv")
    rows = np.column_stack([np.arange(5.0), -np.arange(5.0) * 0.1])
    np.savetxt(path, rows, delimiter=",")
    s = logs.load_csv_stream(path)
    np.testing.assert_allclose(s["stamps"], np.arange(5.0))
    assert s["values"].shape == (5, 1)


def test_log_timeline_matches_direct_build(tmp_path):
    """Timeline built from a saved+loaded log == timeline built directly
    from the in-memory mission (same binning, same values)."""
    from smarc_navigation_tpu.configs import EKFSlamConfig
    from smarc_navigation_tpu.models import ekf_slam as slam

    cfg = EKFSlamConfig(max_landmarks=16, max_obs=8)
    m = _mission()
    ticks = np.arange(0, m.spec.duration_s + 1e-9, 1.0 / cfg.system_freq)
    odom13 = _odom13(m, ticks)
    tl_direct = slam.slam_timeline(m, odom13.astype(np.float32), ticks, cfg)

    streams = logs.mission_to_log(m)
    streams["odom"] = {"stamps": ticks, "values": odom13}
    det = streams.pop("mbes_detections")
    streams["mbes"] = det
    path = str(tmp_path / "m.npz")
    logs.save_log(path, streams)
    loaded, _ = logs.load_log(path)
    tl_log = logs.log_to_timeline(
        loaded, freq_hz=cfg.system_freq, channels=("odom",),
        events={"mbes": cfg.max_obs},
    )
    np.testing.assert_allclose(
        np.asarray(tl_log.channels["odom"].value),
        np.asarray(tl_direct.channels["odom"].value), atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(tl_log.events["mbes"].mask),
        np.asarray(tl_direct.events["mbes"].mask),
    )
    np.testing.assert_allclose(
        np.asarray(tl_log.events["mbes"].value),
        np.asarray(tl_direct.events["mbes"].value), atol=1e-6,
    )


def test_log_timeline_rejects_unbound_event_stream():
    with pytest.raises(ValueError, match="max_per_tick"):
        logs.log_to_timeline(
            {"mbes": {"stamps": np.arange(3.0), "values": np.zeros((3, 3)),
                      "burst": np.zeros(3, np.int64)}},
            freq_hz=10.0,
        )


# --------------------------------------------------------------------------
# bag_convert flatteners on duck-typed stubs
# --------------------------------------------------------------------------

def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _stamp(sec, nsec=0):
    return _ns(header=_ns(stamp=_ns(secs=sec, nsecs=nsec)))


def test_flatteners_and_accumulate():
    odom = _ns(
        pose=_ns(pose=_ns(position=_ns(x=1.0, y=2.0, z=3.0),
                          orientation=_ns(x=0.0, y=0.0, z=0.0, w=1.0))),
        twist=_ns(twist=_ns(linear=_ns(x=0.5, y=0.0, z=0.0),
                            angular=_ns(x=0.0, y=0.0, z=0.1))),
    )
    assert bag_convert.flatten_odometry(odom) == [
        1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.1
    ]

    imu = _ns(orientation=_ns(x=0.0, y=0.0, z=0.7, w=0.7),
              angular_velocity=_ns(x=0.01, y=0.02, z=0.03),
              linear_acceleration=_ns(x=0.0, y=0.0, z=-9.8))
    assert bag_convert.flatten_imu(imu)[3] == 0.7

    twist_cov = _ns(twist=_ns(twist=_ns(linear=_ns(x=1.0, y=2.0, z=3.0),
                                        angular=_ns(x=0.0, y=0.0, z=0.0))))
    assert bag_convert.flatten_twist(twist_cov)[:3] == [1.0, 2.0, 3.0]

    navsat = _ns(latitude=59.35, longitude=18.07, status=_ns(status=0))
    assert bag_convert.flatten_navsat(navsat) == [59.35, 18.07, 0.0]

    pa = _ns(poses=[_ns(position=_ns(x=1.0, y=2.0, z=3.0)),
                    _ns(position=_ns(x=4.0, y=5.0, z=6.0))])
    assert bag_convert.flatten_pose_array(pa) == [[1, 2, 3], [4, 5, 6]]

    streams = {}
    bag_convert.accumulate(streams, "detections", 1.5, pa)
    bag_convert.accumulate(streams, "detections", 2.5, pa)
    bag_convert.accumulate(streams, "odom", 1.0, odom)
    final = bag_convert.finalize(streams)
    assert final["mbes"]["values"].shape == (4, 3)
    np.testing.assert_array_equal(final["mbes"]["burst"], [0, 0, 1, 1])
    assert final["odom"]["values"].shape == (1, 13)

    msg = _stamp(100, 500_000_000)
    assert bag_convert.stamp_seconds(msg) == pytest.approx(100.5)


def test_convert_requires_rosbag(tmp_path):
    with pytest.raises(RuntimeError, match="rosbag is not installed"):
        bag_convert.convert("x.bag", str(tmp_path / "x.npz"), {"/odom": "odom"})


def test_replay_cli_end_to_end(tmp_path):
    """`run.py replay --log mission.npz` over a recorded log -> report with
    RMSE vs the recorded ground truth."""
    from smarc_navigation_tpu import run as cli

    m = _mission(duration=20.0, seed=3)
    ticks = np.arange(0, 20.0 + 1e-9, 0.1)
    streams = logs.mission_to_log(m)
    streams["odom"] = {"stamps": ticks, "values": _odom13(m, ticks)}
    streams["mbes"] = streams.pop("mbes_detections")
    log_path = str(tmp_path / "mission.npz")
    logs.save_log(log_path, streams, meta={"vehicle": "lolo"})

    out_dir = str(tmp_path / "rep")
    cli.main(["replay", "--log", log_path, "--out", out_dir])
    rep = json.load(open(os.path.join(out_dir, "report.json")))
    assert rep["n_landmarks_mapped"] > 0
    assert rep["rmse_pos"] < 0.5, rep
    assert os.path.exists(os.path.join(out_dir, "dashboard.png"))


def test_committed_sample_log_replay(tmp_path):
    """The in-repo recorded log (data/sample_mission.npz, generated by
    data/make_sample_log.py in the io/logs.py schema) replays through the
    exact CLI path a user with a converted rosbag would run, and tracks the
    recorded ground truth."""
    from smarc_navigation_tpu import run as cli

    log_path = os.path.join(os.path.dirname(__file__), "..",
                            "data", "sample_mission.npz")
    assert os.path.exists(log_path), "committed sample log missing"
    out_dir = str(tmp_path / "rep")
    cli.main(["replay", "--log", log_path, "--out", out_dir])
    rep = json.load(open(os.path.join(out_dir, "report.json")))
    assert rep["n_landmarks_mapped"] >= 10, rep
    assert rep["rmse_pos"] < 0.5, rep
    assert os.path.exists(os.path.join(out_dir, "dashboard.png"))
