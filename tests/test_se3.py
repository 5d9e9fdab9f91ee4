"""Unit tests for closed-form SE(3) exp/log (vs reference SE3.cpp:4-26
semantics: exp/log round-trip, group composition)."""

import jax
import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.geometry import se3


def random_twists(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


def test_exp_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_exp_pure_translation():
    xi = jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 0.0])
    T = se3.exp(xi)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-6)


def test_exp_rotation_90deg():
    # 90 degrees about z
    xi = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2])
    T = se3.exp(xi)
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(T[:3, :3], expected, atol=1e-6)


def test_exp_log_roundtrip():
    for scale in (1e-6, 1e-3, 0.1, 1.0):
        xi = random_twists(32, scale=scale)
        T = jax.vmap(se3.exp)(xi)
        xi_back = jax.vmap(se3.log)(T)
        np.testing.assert_allclose(xi_back, xi, atol=5e-5 * max(scale, 1e-2))


def test_log_exp_roundtrip_matrix():
    xi = random_twists(16, scale=0.5, seed=3)
    T = jax.vmap(se3.exp)(xi)
    T2 = jax.vmap(se3.exp)(jax.vmap(se3.log)(T))
    np.testing.assert_allclose(T2, T, atol=1e-5)


def test_inverse():
    xi = random_twists(8, scale=0.8, seed=1)
    T = jax.vmap(se3.exp)(xi)
    TI = jax.vmap(se3.inverse)(T)
    eye = jnp.broadcast_to(jnp.eye(4), T.shape)
    np.testing.assert_allclose(T @ TI, eye, atol=1e-5)


def test_rotation_matrices_orthonormal():
    xi = random_twists(8, scale=2.0, seed=2)
    R = jax.vmap(se3.exp)(xi)[:, :3, :3]
    RtR = jnp.einsum("nij,nik->njk", R, R)
    eye = jnp.broadcast_to(jnp.eye(3), RtR.shape)
    np.testing.assert_allclose(RtR, eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


def test_apply():
    xi = jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, np.pi / 2])
    T = se3.exp(xi)
    p = jnp.array([[1.0, 0.0, 0.0]])
    q = se3.apply(T, p)
    # compare against homogeneous multiply
    expected = (np.asarray(T) @ np.array([1.0, 0.0, 0.0, 1.0]))[:3]
    np.testing.assert_allclose(q[0], expected, atol=1e-6)


def test_apply_rotation_no_translation():
    T = se3.exp(jnp.array([5.0, 5.0, 5.0, 0.0, 0.0, np.pi / 4]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = se3.apply_rotation(T, n)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), 1.0, atol=1e-6
    )
    # translation must not affect direction vectors
    T2 = se3.exp(jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 4]))
    np.testing.assert_allclose(out, se3.apply_rotation(T2, n), atol=1e-6)


def test_rotation_angle():
    for ang in (0.0, 0.3, 1.5):
        T = se3.exp(jnp.array([0.0, 0.0, 0.0, 0.0, ang, 0.0]))
        np.testing.assert_allclose(se3.rotation_angle(T), ang, atol=1e-5)
