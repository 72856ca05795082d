import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smarc_navigation_tpu.utils import geometry as geo

rng = np.random.default_rng(0)


def random_rpy(n=64):
    return np.stack(
        [
            rng.uniform(-np.pi, np.pi, n),
            rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float64)


def test_wrap_angle():
    a = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, -3 * np.pi / 2, 10 * np.pi + 0.1])
    w = geo.wrap_angle(a)
    assert np.all(np.asarray(w) >= -np.pi - 1e-6)
    assert np.all(np.asarray(w) < np.pi + 1e-6)
    np.testing.assert_allclose(np.asarray(geo.wrap_angle(jnp.array(3 * np.pi / 2))), -np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(geo.wrap_angle(jnp.array(-3 * np.pi / 2))), np.pi / 2, atol=1e-6)


def test_rpy_rotmat_roundtrip():
    rpy = random_rpy()
    R = geo.rotmat_from_rpy(jnp.asarray(rpy))
    back = geo.rpy_from_rotmat(R)
    np.testing.assert_allclose(np.asarray(back), rpy, atol=1e-5)


def test_rotmat_orthonormal():
    rpy = random_rpy()
    R = np.asarray(geo.rotmat_from_rpy(jnp.asarray(rpy)))
    eye = np.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_quat_matches_rotmat():
    rpy = random_rpy()
    q = geo.quat_from_rpy(jnp.asarray(rpy))
    R_q = geo.rotmat_from_quat(q)
    R = geo.rotmat_from_rpy(jnp.asarray(rpy))
    np.testing.assert_allclose(np.asarray(R_q), np.asarray(R), atol=1e-5)


def test_quat_roundtrips():
    rpy = random_rpy()
    q = geo.quat_from_rpy(jnp.asarray(rpy))
    np.testing.assert_allclose(np.asarray(geo.rpy_from_quat(q)), rpy, atol=1e-5)
    # rotmat -> quat -> rotmat (sign-invariant)
    R = geo.rotmat_from_rpy(jnp.asarray(rpy))
    q2 = geo.quat_from_rotmat(R)
    np.testing.assert_allclose(np.asarray(geo.rotmat_from_quat(q2)), np.asarray(R), atol=1e-5)


def test_quat_multiply_is_rotation_compose():
    rpy1, rpy2 = random_rpy(8), random_rpy(8)
    q1, q2 = geo.quat_from_rpy(jnp.asarray(rpy1)), geo.quat_from_rpy(jnp.asarray(rpy2))
    R12 = geo.rotmat_from_quat(geo.quat_multiply(q1, q2))
    R_ref = jnp.einsum("...ij,...jk->...ik", geo.rotmat_from_quat(q1), geo.rotmat_from_quat(q2))
    np.testing.assert_allclose(np.asarray(R12), np.asarray(R_ref), atol=1e-5)


def test_transform_compose_inverse():
    rpy = random_rpy(4)
    t = rng.normal(size=(4, 3))
    tf = geo.Transform.from_rpy_trans(jnp.asarray(rpy), jnp.asarray(t))
    v = jnp.asarray(rng.normal(size=(4, 3)))
    v2 = tf.inverse().apply(tf.apply(v))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)

    a = geo.Transform.from_rpy_trans(jnp.asarray(rpy[0]), jnp.asarray(t[0]))
    b = geo.Transform.from_rpy_trans(jnp.asarray(rpy[1]), jnp.asarray(t[1]))
    lhs = a.compose(b).apply(v[0])
    rhs = a.apply(b.apply(v[0]))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_transform_is_pytree():
    tf = geo.Transform.identity()
    leaves = jax.tree_util.tree_leaves(tf)
    assert len(leaves) == 2

    @jax.jit
    def f(tf: geo.Transform):
        return tf.apply(jnp.ones(3))

    np.testing.assert_allclose(np.asarray(f(tf)), np.ones(3), atol=1e-6)


def test_frame_graph():
    g = geo.FrameGraph()
    g.add("map", "odom", geo.Transform.from_rpy_trans(jnp.array([0.0, 0.0, np.pi / 2]), jnp.array([1.0, 2.0, 0.0])))
    g.add("odom", "base", geo.Transform.from_rpy_trans(jnp.array([0.0, 0.0, 0.0]), jnp.array([5.0, 0.0, -1.0])))
    g.add("base", "dvl", geo.Transform.from_rpy_trans(jnp.array([0.0, 0.0, np.pi]), jnp.array([0.0, 0.0, -0.2])))

    t_map_dvl = g.get("map", "dvl")
    expected = (
        g.get("map", "odom").compose(g.get("odom", "base")).compose(g.get("base", "dvl"))
    )
    v = jnp.array([1.0, -1.0, 0.5])
    np.testing.assert_allclose(np.asarray(t_map_dvl.apply(v)), np.asarray(expected.apply(v)), atol=1e-5)

    # reverse direction
    t_dvl_map = g.get("dvl", "map")
    np.testing.assert_allclose(
        np.asarray(t_dvl_map.apply(t_map_dvl.apply(v))), np.asarray(v), atol=1e-5
    )

    with pytest.raises(KeyError):
        g.get("map", "unknown_frame")
