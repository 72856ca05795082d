"""Execution evidence for the rosbag converter (VERDICT r04 missing #2).

No rosbag exists on this image, so ``convert()`` runs against a fake
``rosbag`` module injected into ``sys.modules`` and duck-typed message
stubs (the flatteners only touch ``.pose``/``.twist``/``.header``/...
attributes — ``io/bag_convert.py:29-99``). Covers:

* topic-role mapping (mapped topics land in the right streams, unmapped
  topics are filtered out by the ``topics=`` list like the real
  ``rosbag.Bag.read_messages``),
* stamp fallbacks (zero header stamp and headerless messages fall back
  to the bag receive time; ROS2-style ``sec/nanosec`` stamps parse),
* detection bursts (one PoseArray = one burst id over its rows),
* the replay handoff: convert() -> npz -> ``run.py replay --log`` end
  to end, producing a report (the reference workflow of
  ``auv_ekf_localization/rosbags/rosbag_handler.py:7-49``).
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np
import pytest

from smarc_navigation_tpu.io import bag_convert, logs


# --------------------------------------------------------------------------
# duck-typed ROS stand-ins
# --------------------------------------------------------------------------

def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _v3(x, y, z):
    return _ns(x=float(x), y=float(y), z=float(z))


def _quat(x=0.0, y=0.0, z=0.0, w=1.0):
    return _ns(x=float(x), y=float(y), z=float(z), w=float(w))


def _header(t):
    """ROS1-style header stamp; t=None -> zero stamp (forces bag-time
    fallback, like unstamped sim topics in real bags)."""
    if t is None:
        return _ns(stamp=_ns(secs=0, nsecs=0))
    sec = int(t)
    return _ns(stamp=_ns(secs=sec, nsecs=int(round((t - sec) * 1e9))))


def _header_ros2(t):
    sec = int(t)
    return _ns(stamp=_ns(sec=sec, nanosec=int(round((t - sec) * 1e9))))


def _odom(t, pos, vel=(0.0, 0.0, 0.0), gyro=(0.0, 0.0, 0.0), quat=None,
          header=_header):
    return _ns(
        header=header(t),
        pose=_ns(pose=_ns(position=_v3(*pos), orientation=quat or _quat())),
        twist=_ns(twist=_ns(linear=_v3(*vel), angular=_v3(*gyro))),
    )


def _navsat(t, lat, lon, status=0):
    return _ns(header=_header(t), latitude=float(lat), longitude=float(lon),
               status=_ns(status=status))


def _depth(t, z):
    return _ns(header=_header(t),
               pose=_ns(pose=_ns(position=_v3(0.0, 0.0, z))))


def _pose_array(points):
    """geometry_msgs/PoseArray — deliberately NO header (PoseArray has one
    in ROS but detection republishers often leave it zero): exercises the
    bag-receive-time fallback."""
    return _ns(poses=[_ns(position=_v3(*p)) for p in points])


class _BagTime:
    def __init__(self, t):
        self._t = float(t)

    def to_sec(self):
        return self._t


class _FakeBag:
    """Minimal rosbag.Bag: an in-memory (topic, msg, t) store with the
    real API's ``topics=`` filtering."""

    store: list = []

    def __init__(self, path, mode="r"):
        self.path = path

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def read_messages(self, topics=None):
        for topic, msg, t in type(self).store:
            if topics is None or topic in topics:
                yield topic, msg, t


@pytest.fixture
def fake_rosbag(monkeypatch):
    mod = types.ModuleType("rosbag")
    mod.Bag = _FakeBag
    monkeypatch.setitem(sys.modules, "rosbag", mod)
    _FakeBag.store = []
    return _FakeBag


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_topic_roles_stamps_and_bursts(fake_rosbag, tmp_path):
    bag = fake_rosbag
    bag.store = [
        # odom with a real header stamp (bag time deliberately different:
        # header wins)
        ("/lolo/ekf_odom",
         _odom(10.5, (1.0, 2.0, -3.0), vel=(0.7, 0.0, 0.0),
               gyro=(0.0, 0.0, 0.1)), _BagTime(99.0)),
        # odom with a ZERO header stamp -> bag receive time
        ("/lolo/ekf_odom", _odom(None, (1.5, 2.0, -3.0)), _BagTime(11.0)),
        # ROS2-style stamp fields parse too
        ("/lolo/ekf_odom",
         _odom(11.5, (2.0, 2.0, -3.0), header=_header_ros2), _BagTime(99.0)),
        # gps role on a NavSatFix
        ("/sam/gps", _navsat(10.6, 59.35, 18.07, status=1), _BagTime(99.0)),
        # depth role
        ("/sam/depth", _depth(10.7, -2.5), _BagTime(99.0)),
        # two PoseArrays -> two bursts sharing the mbes stream;
        # headerless -> bag time
        ("/lolo/rocks", _pose_array([(5.0, 1.0, -4.0), (6.0, -1.0, -4.5)]),
         _BagTime(10.8)),
        ("/lolo/rocks", _pose_array([(7.0, 0.5, -4.2)]), _BagTime(11.8)),
        # unmapped topic: must be filtered out (never flattened)
        ("/lolo/unrelated", _ns(), _BagTime(12.0)),
    ]
    out = tmp_path / "mission.npz"
    counts = bag_convert.convert(
        str(tmp_path / "fake.bag"), str(out),
        topic_roles={
            "/lolo/ekf_odom": "odom",
            "/sam/gps": "gps",
            "/sam/depth": "depth",
            "/lolo/rocks": "detections",
        })
    assert counts == {"odom": 3, "gps": 1, "depth": 1, "mbes": 3}

    streams, meta = logs.load_log(str(out))
    assert meta["source_bag"].endswith("fake.bag")
    assert meta["topics"]["/lolo/rocks"] == "detections"
    assert sorted(streams) == ["depth", "gps", "mbes", "odom"]

    od = streams["odom"]
    np.testing.assert_allclose(od["stamps"], [10.5, 11.0, 11.5], atol=1e-9)
    assert od["values"].shape == (3, 13)
    np.testing.assert_allclose(
        od["values"][0],
        [1.0, 2.0, -3.0, 0, 0, 0, 1, 0.7, 0, 0, 0, 0, 0.1], atol=1e-12)

    np.testing.assert_allclose(streams["gps"]["values"],
                               [[59.35, 18.07, 1.0]], atol=1e-12)
    np.testing.assert_allclose(streams["depth"]["values"], [[-2.5]])

    mb = streams["mbes"]
    np.testing.assert_allclose(mb["stamps"], [10.8, 10.8, 11.8], atol=1e-9)
    np.testing.assert_array_equal(mb["burst"], [0, 0, 1])
    np.testing.assert_allclose(
        mb["values"],
        [[5.0, 1.0, -4.0], [6.0, -1.0, -4.5], [7.0, 0.5, -4.2]], atol=1e-12)


def test_stamp_seconds_requires_some_stamp():
    with pytest.raises(ValueError):
        bag_convert.stamp_seconds(_ns(), bag_time=None)
    assert bag_convert.stamp_seconds(_ns(), _BagTime(3.25)) == 3.25


def test_convert_errors_without_rosbag(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "rosbag", None)  # force ImportError
    with pytest.raises(RuntimeError, match="ROS host"):
        bag_convert.convert(str(tmp_path / "x.bag"), str(tmp_path / "x.npz"),
                            {"/t": "odom"})


def test_convert_then_replay_cli(fake_rosbag, tmp_path):
    """The full recorded-bag workflow without ROS: a synthetic straight-line
    mission 'recorded' as bag messages -> convert() -> npz ->
    ``run.py replay --log`` -> report.json."""
    bag = fake_rosbag
    rng = np.random.default_rng(7)
    t0 = 1700000000.0  # realistic absolute epoch stamps
    store = []
    # 6 s of 10 Hz odometry, straight line at 0.5 m/s
    for k in range(61):
        t = t0 + 0.1 * k
        store.append(("/odom",
                      _odom(t, (0.05 * k, 0.0, -1.0), vel=(0.5, 0.0, 0.0)),
                      _BagTime(t + 0.01)))
    # landmark detections ahead of the vehicle every 2 s
    for k in range(1, 4):
        t = t0 + 2.0 * k
        x = 0.5 * 2.0 * k
        pts = [(2.0 + rng.normal(0, 0.02), 1.5 + rng.normal(0, 0.02), -2.0)]
        store.append(("/rocks", _pose_array(pts), _BagTime(t)))
    # gt topic (same pose track; replay slices [:, :6])
    for k in range(0, 61, 5):
        t = t0 + 0.1 * k
        store.append(("/gt", _odom(t, (0.05 * k, 0.0, -1.0)), _BagTime(t)))
    bag.store = store

    npz = tmp_path / "recorded.npz"
    counts = bag_convert.convert(
        str(tmp_path / "rec.bag"), str(npz),
        topic_roles={"/odom": "odom", "/rocks": "detections", "/gt": "gt"})
    assert counts["odom"] == 61 and counts["mbes"] == 3

    from smarc_navigation_tpu import run as run_cli

    out = tmp_path / "replay"
    run_cli.main(["replay", "--log", str(npz), "--out", str(out),
                  "--max-landmarks", "8", "--max-obs", "4"])
    rep = json.loads((out / "report.json").read_text())
    assert rep["ticks"] == 61
    assert rep["n_landmarks_mapped"] >= 1
    assert os.path.exists(out / "dashboard.png")
