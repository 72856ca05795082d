import jax.numpy as jnp
import numpy as np

from smarc_navigation_tpu.utils import geodesy as gd
from smarc_navigation_tpu.utils import geometry as geo


def test_utm_roundtrip_stockholm_host_f64():
    # KTH / Baltic operating area (zone 34 around Stockholm ~ 18.07 E)
    lat, lon = 59.3498, 18.0707
    zone = gd.utm_zone(lat, lon)
    assert zone == 34
    e, n = gd.latlon_to_utm(lat, lon, zone, xp=np)
    lat2, lon2 = gd.utm_to_latlon(e, n, zone, xp=np)
    # host path is f64: nanometre-level roundtrip
    assert abs(float(lat2) - lat) < 1e-11
    assert abs(float(lon2) - lon) < 1e-11


def test_utm_roundtrip_device_f32():
    lat, lon = 59.3498, 18.0707
    e, n = gd.latlon_to_utm(lat, lon, 34)
    lat2, lon2 = gd.utm_to_latlon(e, n, 34)
    # device path is f32: absolute UTM northing ~6.6e6 m limits roundtrip
    # to ~100 m equivalent; in-graph use operates on local offsets instead
    assert abs(float(lat2) - lat) < 2e-3
    assert abs(float(lon2) - lon) < 2e-3


def _snyder_utm(lat_deg, lon_deg, zone):
    """Independent oracle: Snyder (USGS PP 1395) transverse Mercator series."""
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    lon0 = np.deg2rad((zone - 1) * 6 - 180 + 3)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = ep2 * np.cos(lat) ** 2
    A = np.cos(lat) * (lon - lon0)
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * lat)
        - (35 * e2**3 / 3072) * np.sin(6 * lat)
    )
    easting = k0 * N * (
        A + (1 - T + C) * A**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    ) + 500000.0
    northing = k0 * (
        M
        + N
        * np.tan(lat)
        * (
            A**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return easting, northing


def test_utm_vs_snyder_oracle():
    for lat, lon in [(59.35, 18.07), (58.2, 17.5), (60.0, 19.9), (45.0, 16.0)]:
        zone = gd.utm_zone(lat, lon)
        e, n = gd.latlon_to_utm(lat, lon, zone, xp=np)
        e_ref, n_ref = _snyder_utm(lat, lon, zone)
        # Both series are sub-mm accurate in f64; Snyder truncation dominates
        assert abs(float(e) - e_ref) < 0.01, (lat, lon)
        assert abs(float(n) - n_ref) < 0.01, (lat, lon)


def test_utm_batch_shapes():
    lats = jnp.linspace(58.0, 60.0, 16)
    lons = jnp.linspace(17.0, 19.0, 16)
    e, n = gd.latlon_to_utm(lats, lons, 34)
    assert e.shape == (16,) and n.shape == (16,)


def test_ned_enu_orientation_involution():
    # NED->ENU applied twice with the same sandwich is identity on headings:
    # check a pure-north NED heading maps to ENU yaw=pi/2 (east-north-up x=east)
    q_ned_north = geo.quat_from_rpy(jnp.array([0.0, 0.0, 0.0]))  # facing north in NED
    q_enu = gd.ned_to_enu_orientation(q_ned_north)
    rpy = np.asarray(geo.rpy_from_quat(q_enu))
    assert abs(rpy[2] - np.pi / 2) < 1e-5  # north == +90deg yaw in ENU


def test_sbg_to_enu():
    q_sbg = geo.quat_from_rpy(jnp.array([0.0, 0.0, 0.3]))
    q = gd.sbg_to_enu_orientation(q_sbg)
    assert q.shape == (4,)
    n = float(jnp.linalg.norm(q))
    assert abs(n - 1.0) < 1e-5
    rates = gd.sbg_to_enu_rates(jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(rates), [2.0, 1.0, -3.0], atol=1e-6)


def test_pressure_to_depth():
    depth, valid = gd.pressure_to_depth(jnp.array([100000.0, 117000.0, 50000.0, 600000.0]))
    np.testing.assert_allclose(np.asarray(depth)[:2], [0.0, -1.7], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False])


def test_latlon_odometry_to_map_roundtrip():
    import jax.numpy as jnp
    from smarc_navigation_tpu.utils.geometry import quat_from_rpy

    zone = 34
    e0, n0 = gd.latlon_to_utm(59.35, 18.07, zone, xp=np)
    q_ned = quat_from_rpy(jnp.zeros(3))
    pos, q_enu = gd.latlon_odometry_to_map(59.35, 18.07, q_ned, zone, float(e0), float(n0))
    np.testing.assert_allclose(np.asarray(pos), 0.0, atol=1.0)  # f32 device path
    lat, lon = gd.pose_to_geopoint(np.zeros(3), zone, float(e0), float(n0), xp=np)
    assert abs(float(lat) - 59.35) < 1e-9 and abs(float(lon) - 18.07) < 1e-9
