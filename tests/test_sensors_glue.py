import numpy as np
import jax.numpy as jnp
import pytest

from smarc_navigation_tpu.io import uw_gps
from smarc_navigation_tpu.models import sensors
from smarc_navigation_tpu.utils import geodesy
from smarc_navigation_tpu.utils.geometry import quat_from_rpy


def test_gps_to_utm_drops_no_fix():
    lats = np.array([59.35, 59.351, 59.352])
    lons = np.array([18.07, 18.071, 18.072])
    status = np.array([0, -1, 0])
    odo = sensors.gps_to_utm_odometry(lats, lons, 34, status)
    assert odo.easting.shape == (2,)


def test_dual_antenna_heading():
    # antennas 2 m apart, vehicle pointing due north: prt west, stb east
    zone = 34
    lat0, lon0 = 59.35, 18.07
    e0, n0 = geodesy.latlon_to_utm(lat0, lon0, zone, xp=np)
    # build lat/lon 1 m west/east of center
    lat_w, lon_w = geodesy.utm_to_latlon(e0 - 1.0, n0, zone, xp=np)
    lat_e, lon_e = geodesy.utm_to_latlon(e0 + 1.0, n0, zone, xp=np)
    fix = sensors.dual_antenna_fix(lat_w, lon_w, lat_e, lon_e, zone)
    np.testing.assert_allclose(fix.easting, e0, atol=1e-3)
    np.testing.assert_allclose(fix.northing, n0, atol=1e-3)
    # prt-stb = west-east => diff east = -2: heading = atan2(-2,0) - pi/2 = -pi
    assert abs(abs(float(fix.heading)) - np.pi) < 1e-3


def test_bootstrap_transforms():
    t_um = sensors.bootstrap_utm_map(333000.0, 6582000.0)
    p = np.asarray(t_um.inverse().apply(jnp.asarray([333010.0, 6582020.0, 0.0])))
    np.testing.assert_allclose(p, [10.0, 20.0, 0.0], atol=1e-3)

    q = quat_from_rpy(jnp.asarray([0.0, 0.0, 1.2]))
    t_mo = sensors.bootstrap_map_odom(np.array([5.0, -3.0]), np.asarray(q))
    np.testing.assert_allclose(np.asarray(t_mo.trans), [5.0, -3.0, 0.0], atol=1e-5)


def test_yaw_to_heading():
    np.testing.assert_allclose(sensors.yaw_to_heading_deg(np.pi / 2), 0.0, atol=1e-6)
    np.testing.assert_allclose(sensors.yaw_to_heading_deg(0.0), 90.0, atol=1e-6)
    np.testing.assert_allclose(sensors.yaw_to_heading_deg(np.pi), 360.0 - 90.0, atol=1e-4)


def test_spoof_heading_from_track():
    e = np.array([0.0, 1.0, 2.0, 2.001, 2.0, 1.0])
    n = np.array([0.0, 0.0, 0.0, 0.0, 1.0, 2.0])
    yaw = sensors.spoof_heading_from_track(e, n)
    assert abs(yaw[1]) < 1e-6                    # east
    assert abs(yaw[3] - yaw[2]) < 1e-6           # sub-threshold step holds
    assert abs(yaw[4] - np.pi / 2) < 0.01        # ~due north
    assert abs(yaw[5] - 3 * np.pi / 4) < 0.01    # north-west diagonal


def test_waterlinked_client_gated():
    c = uw_gps.WaterlinkedClient()
    with pytest.raises(RuntimeError, match="no network transport"):
        c.get_acoustic_position()
    # injected transport
    c2 = uw_gps.WaterlinkedClient(transport=lambda url: {"url": url, "x": 1.0})
    assert "acoustic" in c2.get_acoustic_position()["url"]


def test_master_enu_yaw_and_acoustic_to_map():
    # master pointing NED-north => ENU yaw pi/2
    assert abs(uw_gps.master_enu_yaw({"yaw": 0.0}) - np.pi / 2) < 1e-6
    utm_map = sensors.bootstrap_utm_map(1000.0, 2000.0)
    p = uw_gps.acoustic_to_map(
        {"x": 3.0, "y": 0.0, "z": 5.0}, master_utm_e=1000.0, master_utm_n=2000.0,
        master_yaw_enu=0.0, utm_map=utm_map,
    )
    np.testing.assert_allclose(p, [3.0, 0.0, -5.0], atol=1e-3)


def test_aux_dr_track():
    stamps = np.array([0.0, 1.0, 2.0, 3.0])
    fixes = np.array([[100.0, 200.0], [101.0, 200.0], [102.0, 200.0], [103.0, 200.0]])
    q = quat_from_rpy(jnp.zeros(3))
    t, odom_xy, utm_map, map_odom = uw_gps.aux_dr_track(stamps, fixes, np.asarray(q),
                                                        dr_period=0.5)
    assert odom_xy.shape[0] == len(t)
    # track moves east 1 m/s in odom frame (zero heading bootstrap)
    np.testing.assert_allclose(odom_xy[-1], [3.0, 0.0], atol=1e-3)


def test_latlon_markers_to_map():
    utm_map = sensors.bootstrap_utm_map(333411.0, 6582690.0)
    pts = sensors.latlon_markers_to_map([59.35], [18.07], 34, utm_map)
    assert pts.shape == (1, 3)
    assert np.linalg.norm(pts[0][:2]) < 100.0  # near the map origin


def test_utm_origin_math_stays_f64_at_baltic_scale():
    """Absolute-UTM -> map must not round-trip through f32: at a Baltic
    northing (~6.5e6 m) f32 resolution is ~0.4 m, larger than GPS noise.
    Verify mm-scale offsets survive both aux_dr_track and acoustic_to_map."""
    e0, n0 = 333411.123456, 6582690.654321
    utm_map = sensors.bootstrap_utm_map(e0, n0)
    assert utm_map.trans.dtype == np.float64

    # 1 mm step east per fix must reconstruct exactly in the map frame
    steps = np.arange(4) * 1e-3
    fixes = np.stack([e0 + steps, np.full(4, n0)], -1)
    stamps = np.arange(4.0)
    q = quat_from_rpy(jnp.zeros(3))
    t, odom_xy, _, _ = uw_gps.aux_dr_track(
        stamps, fixes, np.asarray(q), dr_period=1.0)
    np.testing.assert_allclose(odom_xy[:, 0], steps, atol=1e-9)

    # acoustic fix 1 mm east of the master box
    p = uw_gps.acoustic_to_map(
        {"x": 1e-3, "y": 0.0, "z": 2.0}, master_utm_e=e0, master_utm_n=n0,
        master_yaw_enu=0.0, utm_map=utm_map,
    )
    np.testing.assert_allclose(p, [1e-3, 0.0, -2.0], atol=1e-9)
