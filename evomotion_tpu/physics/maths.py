"""Batched quaternion / rigid-transform math for the TPU physics engine.

All functions are pure jnp, float32, and broadcast over arbitrary leading batch
dimensions; the trailing axis holds the vector/quaternion components.

Quaternion convention: ``[x, y, z, w]`` (Bullet's storage order). The reference
round-trips between GLM and Bullet types (evo_motion_model/src/converter.cpp);
here there is a single convention.

Semantics-parity notes (reference files):
- rotation integration matches ``btTransformUtil::integrateTransform``
  (exponential map with angular-motion clamp) so trajectories track Bullet's.
- ``quat_to_euler_zyx`` matches ``btMatrix3x3::getEulerZYX`` (used by the
  proprioception state, evo_motion_model/src/robot/proprioception_state.cpp:26).
- ``quat_angle`` matches ``btQuaternion::getAngle`` (used by cartpole's
  observation, evo_motion_model/src/env/cartpole.cpp:113).
"""

from __future__ import annotations

import jax.numpy as jnp

# Bullet's ANGULAR_MOTION_THRESHOLD = 0.5 * SIMD_HALF_PI
_ANGULAR_MOTION_THRESHOLD = 0.5 * (jnp.pi * 0.5)

IDENTITY_QUAT = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2, [..., 4] in xyzw order."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4]."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    half = 0.5 * jnp.asarray(angle)
    s = jnp.sin(half)[..., None]
    c = jnp.cos(half)[..., None]
    return jnp.concatenate([axis * s, c], axis=-1)


def quat_to_mat3(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] from quaternion [..., 4]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat3_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] xyzw from rotation matrix [..., 3, 3].

    Branch-free variant of the Shepperd method: computes all four candidate
    solutions and selects by the largest pivot, so it vmaps/jits cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 - 1 pivots
    qw2 = tr
    qx2 = m00 - m11 - m22
    qy2 = m11 - m00 - m22
    qz2 = m22 - m00 - m11

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-20))

    # case w largest
    sw = _safe_sqrt(qw2 + 1.0) * 2.0
    cand_w = jnp.stack(
        [(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw], axis=-1
    )
    # case x largest
    sx = _safe_sqrt(qx2 + 1.0) * 2.0
    cand_x = jnp.stack(
        [0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1
    )
    # case y largest
    sy = _safe_sqrt(qy2 + 1.0) * 2.0
    cand_y = jnp.stack(
        [(m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1
    )
    # case z largest
    sz = _safe_sqrt(qz2 + 1.0) * 2.0
    cand_z = jnp.stack(
        [(m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz], axis=-1
    )

    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    return quat_normalize(q[..., 0, :])


def quat_to_euler_zyx(q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(yaw, pitch, roll) as in ``btMatrix3x3::getEulerZYX`` (solution 1).

    yaw is rotation about Z, pitch about Y, roll about X of the row-major
    rotation matrix. Gimbal-lock branches use jnp.where.
    """
    m = quat_to_mat3(q)
    m00, m10 = m[..., 0, 0], m[..., 1, 0]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    locked = jnp.abs(m20) >= 1.0 - 1e-7
    pitch_free = -jnp.arcsin(jnp.clip(m20, -1.0, 1.0))
    yaw_free = jnp.arctan2(m10, m00)
    roll_free = jnp.arctan2(m21, m22)

    # Bullet's gimbal handling: roll = 0, yaw/pitch from remaining terms
    m01, m02 = m[..., 0, 1], m[..., 0, 2]
    pitch_lock = jnp.where(m20 < 0, jnp.pi / 2, -jnp.pi / 2)
    yaw_lock = jnp.where(m20 < 0, jnp.arctan2(m01, m02), jnp.arctan2(-m01, -m02))

    yaw = jnp.where(locked, yaw_lock, yaw_free)
    pitch = jnp.where(locked, pitch_lock, pitch_free)
    roll = jnp.where(locked, jnp.zeros_like(roll_free), roll_free)
    return yaw, pitch, roll


def quat_angle(q: jnp.ndarray) -> jnp.ndarray:
    """``btQuaternion::getAngle``: 2 * acos(|w| clamped)."""
    return 2.0 * jnp.arccos(jnp.clip(q[..., 3], -1.0, 1.0))


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Advance orientation by angular velocity over dt.

    Mirrors ``btTransformUtil::integrateTransform``: exponential map with the
    angular-motion clamp (|omega|*dt limited to 0.5*pi/2) and small-angle
    Taylor expansion of sin(theta/2)/theta.
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    limit = _ANGULAR_MOTION_THRESHOLD / dt
    angle = jnp.minimum(angle, limit)
    half = angle * (dt * 0.5)
    small = angle * dt < 0.001
    # sin(half)/angle, with Taylor fallback: dt/2 - dt^3*angle^2/48
    factor = jnp.where(
        small,
        0.5 * dt - (dt * dt * dt) * (1.0 / 48.0) * angle * angle,
        jnp.sin(half) / jnp.maximum(angle, 1e-12),
    )
    axis = omega * factor
    dorn = jnp.concatenate([axis, jnp.cos(half)], axis=-1)
    return quat_normalize(quat_mul(dorn, q))


# --- rigid transforms: (pos [..., 3], quat [..., 4]) pairs ---


def transform_point(pos: jnp.ndarray, quat: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return pos + quat_rotate(quat, p)


def transform_inv_point(pos: jnp.ndarray, quat: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate_inv(quat, p - pos)


def transform_mul(
    pos_a: jnp.ndarray, quat_a: jnp.ndarray, pos_b: jnp.ndarray, quat_b: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compose transforms: result applies B then A (A * B as matrices)."""
    return transform_point(pos_a, quat_a, pos_b), quat_normalize(quat_mul(quat_a, quat_b))


def mat4_to_pos_quat_scale(m) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decompose a column-major-semantics 4x4 model matrix (as numpy/jnp
    [4,4] with translation in m[:3, 3]) into (pos, quat, scale).

    Mirrors ``decompose_model_matrix`` (evo_motion_model/src/converter.cpp).
    """
    m = jnp.asarray(m, dtype=jnp.float32)
    pos = m[:3, 3]
    basis = m[:3, :3]
    scale = jnp.linalg.norm(basis, axis=0)
    rot = basis / jnp.maximum(scale[None, :], 1e-12)
    return pos, mat3_to_quat(rot), scale
