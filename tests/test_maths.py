"""Quaternion/transform math unit tests (reference converter.cpp semantics)."""

import jax.numpy as jnp
import numpy as np

from evomotion_tpu.physics import maths


def _rand_quat(rng, n=8):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = jnp.asarray(_rand_quat(rng))
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    m = maths.quat_to_mat3(q)
    np.testing.assert_allclose(
        np.asarray(maths.quat_rotate(q, v)),
        np.einsum("bij,bj->bi", np.asarray(m), np.asarray(v)),
        atol=1e-5,
    )


def test_mat3_quat_roundtrip():
    rng = np.random.default_rng(1)
    q = _rand_quat(rng, 32)
    q2 = np.asarray(maths.mat3_to_quat(maths.quat_to_mat3(jnp.asarray(q))))
    # q and -q are the same rotation
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_mul_is_composition():
    rng = np.random.default_rng(2)
    q1 = jnp.asarray(_rand_quat(rng))
    q2 = jnp.asarray(_rand_quat(rng))
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    a = maths.quat_rotate(maths.quat_mul(q1, q2), v)
    b = maths.quat_rotate(q1, maths.quat_rotate(q2, v))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_euler_zyx_simple_axes():
    # rotation about Z by 0.3: yaw = 0.3
    qz = maths.quat_from_axis_angle(jnp.array([0.0, 0, 1]), 0.3)
    yaw, pitch, roll = maths.quat_to_euler_zyx(qz)
    assert abs(float(yaw) - 0.3) < 1e-5 and abs(float(pitch)) < 1e-5 and abs(float(roll)) < 1e-5
    qy = maths.quat_from_axis_angle(jnp.array([0.0, 1, 0]), 0.4)
    yaw, pitch, roll = maths.quat_to_euler_zyx(qy)
    assert abs(float(pitch) - 0.4) < 1e-5
    qx = maths.quat_from_axis_angle(jnp.array([1.0, 0, 0]), -0.2)
    yaw, pitch, roll = maths.quat_to_euler_zyx(qx)
    assert abs(float(roll) + 0.2) < 1e-5


def test_quat_angle():
    q = maths.quat_from_axis_angle(jnp.array([0.0, 0, 1]), 0.7)
    assert abs(float(maths.quat_angle(q)) - 0.7) < 1e-5


def test_quat_integrate_constant_omega():
    # integrating omega_z = 1 rad/s for 1s in small steps -> ~1 rad about z
    q = jnp.array([0.0, 0, 0, 1])
    omega = jnp.array([0.0, 0, 1.0])
    dt = 1 / 60
    for _ in range(60):
        q = maths.quat_integrate(q, omega, dt)
    assert abs(float(maths.quat_angle(q)) - 1.0) < 1e-3
