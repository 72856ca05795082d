"""Property-based tests (hypothesis) for the numerical substrate."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from smarc_navigation_tpu.ops import assignment, resampling
from smarc_navigation_tpu.utils import geometry as geo
from smarc_navigation_tpu.utils import linalg as la

finite_angles = st.floats(-50.0, 50.0, allow_nan=False, allow_infinity=False)


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_angles, min_size=1, max_size=8))
def test_wrap_angle_range_and_idempotence(angles):
    a = jnp.asarray(angles, jnp.float32)
    w = np.asarray(geo.wrap_angle(a), np.float64)
    assert (w >= -np.pi - 1e-5).all() and (w < np.pi + 1e-5).all()
    np.testing.assert_allclose(np.asarray(geo.wrap_angle(jnp.asarray(w, jnp.float32))), w, atol=1e-5)
    # congruent mod 2π (distance to the nearest multiple of 2π)
    d = np.mod(w - np.asarray(angles), 2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    np.testing.assert_allclose(d, 0.0, atol=2e-4)


@settings(max_examples=20, deadline=None)
@given(
    st.floats(-3.1, 3.1), st.floats(-1.5, 1.5), st.floats(-3.1, 3.1),
)
def test_rotation_roundtrip_property(r, p, y):
    rpy = jnp.asarray([r, p, y], jnp.float32)
    R = geo.rotmat_from_rpy(rpy)
    # orthonormality
    eye = np.asarray(R @ R.T)
    np.testing.assert_allclose(eye, np.eye(3), atol=1e-5)
    # quat path agrees with matrix path
    q = geo.quat_from_rpy(rpy)
    np.testing.assert_allclose(np.asarray(geo.rotmat_from_quat(q)), np.asarray(R), atol=1e-5)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(8, 64))
def test_resampling_preserves_expectation(seed, n):
    rng = np.random.default_rng(seed)
    w = rng.dirichlet(np.ones(n)).astype(np.float32)
    key = jax.random.PRNGKey(seed)
    for scheme in ["systematic", "residual"]:
        idx = np.asarray(resampling.SCHEMES[scheme](key, jnp.asarray(w)))
        counts = np.bincount(idx, minlength=n)
        assert counts.sum() == n
        # both guarantee at least the deterministic floor ⌊N·w⌋ copies
        assert np.all(counts >= np.floor(n * w.astype(np.float64)) - 1e-6), scheme
        if scheme == "systematic":
            # systematic additionally bounds each count within 1 of N·w
            assert np.all(np.abs(counts - n * w) <= 1.0 + 1e-4)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 6), st.integers(6, 24))
def test_hungarian_optimal_property(seed, C, R):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 1, (R, C))
    a = np.asarray(assignment.hungarian(jnp.asarray(cost, jnp.float32)))
    s = assignment._scipy_solve(cost)
    assert len(set(a.tolist())) == C
    assert abs(cost[a, np.arange(C)].sum() - cost[s, np.arange(C)].sum()) < 1e-4


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1), st.sampled_from([2, 3]))
def test_inv_small_matches_factorized(seed, n):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    S = A @ A.T + np.eye(n) * 0.1
    inv1 = np.asarray(la.inv_small(jnp.asarray(S, jnp.float32)), np.float64)
    np.testing.assert_allclose(inv1 @ S, np.eye(n), atol=1e-3)
