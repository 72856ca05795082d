import jax
import jax.numpy as jnp
import numpy as np

from smarc_navigation_tpu.ops import sonar


def make_scan(B=128, peaks=((40, 8.0), (90, 12.0)), width=4, base=1.0, amp=10.0):
    intens = np.full(B, base)
    ranges = np.full(B, 20.0)
    for beam, rng in peaks:
        intens[beam - width // 2 : beam + width // 2 + 1] += amp
        ranges[beam - width // 2 : beam + width // 2 + 1] = rng
    return jnp.asarray(intens, jnp.float32), jnp.asarray(ranges, jnp.float32)


def test_extract_peaks_finds_clusters():
    intens, ranges = make_scan()
    det = sonar.extract_peaks(intens, ranges, angle_min=-1.0, angle_increment=2.0 / 128,
                              range_max=50.0, max_detections=8)
    n = int(jnp.sum(det.mask))
    assert n == 2, n
    pts = np.asarray(det.points)[np.asarray(det.mask)]
    # both detections at their cluster ranges
    np.testing.assert_allclose(np.linalg.norm(pts[:, :2], axis=1), [8.0, 12.0], atol=0.1)


def test_extract_peaks_flat_scan_yields_nothing():
    intens = jnp.full((128,), 5.0)
    ranges = jnp.full((128,), 20.0)
    det = sonar.extract_peaks(intens, ranges, -1.0, 2.0 / 128, 50.0)
    assert int(jnp.sum(det.mask)) == 0


def test_extract_peaks_single_spike_smoothed_into_one_cluster():
    # the 5-tap smoother spreads a single hot beam into a 5-beam run, so a
    # lone spike yields exactly one detection (same as the reference, which
    # also smooths before clustering)
    intens = np.ones(128)
    intens[60] = 100.0
    det = sonar.extract_peaks(jnp.asarray(intens, jnp.float32),
                              jnp.full((128,), 10.0), -1.0, 2.0 / 128, 50.0)
    assert int(jnp.sum(det.mask)) == 1


def test_extract_peaks_oracle_loop():
    """Cross-check against a direct python transcription of the clustering
    semantics (middle-of-run pick, >1 length, beam-0 sentinel)."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        intens = rng.uniform(0, 1, 128)
        hot_spots = rng.choice(np.arange(4, 124), 3, replace=False)
        for h in hot_spots:
            intens[h : h + rng.integers(2, 5)] += 8.0
        ranges = rng.uniform(5, 30, 128)
        intens_j = jnp.asarray(intens, jnp.float32)
        det = sonar.extract_peaks(intens_j, jnp.asarray(ranges, jnp.float32),
                                  -1.0, 0.01, 50.0, max_detections=8)

        # python oracle
        sm = np.asarray(sonar.smooth_intensities(intens_j), np.float64)
        mean = sm.mean()
        mx = sm.max()
        thr = 500.0 if (mean >= 0.9 * mx and mean <= 1.1 * mx) else mean
        marks = [i if sm[i] >= 1.05 * thr else 0 for i in range(128)]
        clusters, cur = [], []
        for i, m in enumerate(marks):
            if m != 0:
                cur.append(m)
            else:
                if len(cur) > 1:
                    clusters.append(cur[len(cur) // 2 if len(cur) % 2 == 0 else (len(cur) + 1) // 2])
                cur = []
        got = np.sort(np.asarray(sonar_det_beams(det, ranges)))
        want = np.sort(np.asarray(clusters))
        np.testing.assert_array_equal(got, want)


def sonar_det_beams(det, ranges):
    """Recover beam indices from detections via their range values."""
    pts = np.asarray(det.points)[np.asarray(det.mask)]
    beams = []
    for p in pts:
        r = np.linalg.norm(p[:2])
        beams.append(int(np.argmin(np.abs(ranges - r))))
    return beams


def test_scans_to_base():
    intens, ranges = make_scan()
    det = sonar.extract_peaks(intens, ranges, -1.0, 2.0 / 128, 50.0)
    eye = jnp.eye(3)
    t_l = jnp.asarray([0.0, 1.0, 0.0])
    t_r = jnp.asarray([0.0, -1.0, 0.0])
    merged = sonar.scans_to_base(det, det, eye, t_l, eye, t_r)
    assert int(jnp.sum(merged.mask)) == 4
    pts = np.asarray(merged.points)
    mask = np.asarray(merged.mask)
    assert pts[mask].shape == (4, 3)


def test_detect_blobs():
    img = np.zeros((128, 128), np.float32)
    img[30:65, 40:75] += 1.0   # ~1225 px blob
    img[90:100, 90:100] += 1.0 # 100 px blob (below min_area)
    cent, area, mask = sonar.detect_blobs(jnp.asarray(img), threshold=0.5,
                                          min_area=600, max_area=5000)
    assert int(jnp.sum(mask)) == 1
    c = np.asarray(cent)[np.asarray(mask)][0]
    assert abs(c[0] - 57.0) < 3.0 and abs(c[1] - 47.0) < 3.0  # centroid (x,y)
    fls = sonar.blobs_to_fls_frame(jnp.asarray(cent), 128, 128)
    f = np.asarray(fls)[np.asarray(mask)][0]
    np.testing.assert_allclose(f, [128 - c[1] - 1, c[0] - 64.0, 0.0], atol=1e-3)


def test_fuse_submap_roundtrip():
    rng = np.random.default_rng(1)
    P, B = 5, 16
    pts = jnp.asarray(rng.normal(size=(P, B, 3)), jnp.float32)
    mask = jnp.ones((P, B), bool)
    # all pings share the same pose -> fused cloud equals raw beams
    rot = jnp.broadcast_to(jnp.eye(3), (P, 3, 3))
    trans = jnp.zeros((P, 3))
    fused, m = sonar.fuse_submap(pts, mask, rot, trans)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(pts).reshape(-1, 3), atol=1e-6)


def test_blob_circularity_gate_rejects_elongated():
    """FLS circularity filter (fls_rock_detector.cpp:95-97): a thin bar and
    a compact disc of similar area — only the disc survives a strict gate."""
    H, W = 120, 120
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W), np.float32)
    img[(yy - 35) ** 2 + (xx - 35) ** 2 <= 15 ** 2] = 1.0     # disc, A≈707
    img[80:86, 5:115] = 1.0                                   # 6x110 bar, A=660
    args = dict(threshold=0.5, min_area=300, max_area=2000, max_blobs=4)

    c_all, a_all, m_all = sonar.detect_blobs(jnp.asarray(img),
                                             min_circularity=0.0, **args)
    assert int(np.asarray(m_all).sum()) == 2  # both pass without the gate

    c, a, m = sonar.detect_blobs(jnp.asarray(img), min_circularity=0.5, **args)
    assert int(np.asarray(m).sum()) == 1
    got = np.asarray(c)[np.asarray(m)][0]
    np.testing.assert_allclose(got, [35.0, 35.0], atol=1.5)  # the disc
