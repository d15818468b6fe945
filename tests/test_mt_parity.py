"""Strict mt19937 reset parity with the reference's std::mt19937 streams.

The reference draws reset randomization from a per-env ``std::mt19937`` +
``std::uniform_real_distribution<float>(0,1)`` (robot_walk.cpp:21,82-84;
cartpole.cpp:15,171; cartpole3d.cpp:22,308-309). These tests pin our stream
to golden values recorded from real libstdc++ (generator:
tools/gen_mt_goldens.cpp, g++ 13 / libstdc++; the C++11 standard mandates the
engine, and libstdc++'s generate_canonical<float,24> fixes the distribution),
then assert the envs consume the draws in the reference's order and produce
the exact teleport pose / impulse.
"""

import numpy as np
import pytest

from evomotion_tpu.utils.mt19937 import MT19937, reset_draw_table

# first 8 draws of uniform_real_distribution<float>(0,1)(mt19937(seed)),
# recorded from libstdc++ (tools/gen_mt_goldens.cpp) as exact float bits
GOLDEN = {
    1234: [0x3E441DAD, 0x3EFECDC6, 0x3F1F4285, 0x3F515DDC,
           0x3EE01DDA, 0x3F1CB35D, 0x3F490D43, 0x3F4577D8],
    42: [0x3EBFC3B9, 0x3F4BEA3E, 0x3F736203, 0x3E3BD654],
}


def _bits(f: float) -> int:
    return int(np.float32(f).view(np.uint32))


def test_stream_matches_libstdcxx():
    for seed, golden in GOLDEN.items():
        rng = MT19937(seed)
        for i, expect in enumerate(golden):
            assert _bits(rng.uniform_float()) == expect, (seed, i)


def test_reset_draw_table_layout():
    tab = reset_draw_table(1234, 3, n_resets=4)
    flat = [MT19937(1234).uniform_float() for _ in range(12)]
    rng = MT19937(1234)
    flat = [rng.uniform_float() for _ in range(12)]
    assert tab.shape == (4, 3)
    np.testing.assert_array_equal(tab.reshape(-1), np.array(flat, np.float32))


def _euler_yxz_quat(yaw, pitch, roll):
    """glm::eulerAngleYXZ(yaw, pitch, roll) = RY(yaw) RX(pitch) RZ(roll)."""

    def aa(axis, ang):
        axis = np.asarray(axis, np.float64)
        s = np.sin(ang / 2)
        return np.array([axis[0] * s, axis[1] * s, axis[2] * s, np.cos(ang / 2)])

    def qmul(a, b):
        ax, ay, az, aw = a
        bx, by, bz, bw = b
        return np.array(
            [
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
                aw * bw - ax * bx - ay * by - az * bz,
            ]
        )

    return qmul(aa([0, 1, 0], yaw), qmul(aa([1, 0, 0], pitch), aa([0, 0, 1], roll)))


def test_robot_walk_reset_pose_seed_1234():
    """The first reset teleports the root exactly as the reference would:
    draws (yaw, roll, pitch) from mt19937(1234) in robot_walk.cpp:82-84 order,
    pose = translate(1, .25, 2) * eulerAngleYXZ(yaw, pitch, roll) * first."""
    import jax
    import jax.numpy as jnp

    from evomotion_tpu.envs.robot import RobotWalkFactory
    from evomotion_tpu.physics.engine import init_state

    env = RobotWalkFactory({}).make(1234)
    assert env._mt_table is not None

    phys = env._teleported(init_state(env.model), jax.random.PRNGKey(0), jnp.int32(0))

    rng = MT19937(1234)
    limit = np.float64(np.pi) * 2.0 / 3.0
    yaw = rng.uniform_float() * limit - limit / 2
    roll = rng.uniform_float() * limit - limit / 2
    pitch = rng.uniform_float() * limit - limit / 2
    q = _euler_yxz_quat(yaw, pitch, roll)

    def rotate(q, v):
        x, y, z, w = q
        u = np.array([x, y, z])
        return 2 * (u @ v) * u + (w * w - u @ u) * v + 2 * w * np.cross(u, v)

    root = env.meta.root_body
    expect_pos = np.array([1.0, 0.25, 2.0]) + rotate(q, env.model.init_pos[root])
    got = np.asarray(phys.pos[root])
    np.testing.assert_allclose(got, expect_pos, atol=1e-5)

    # second reset consumes the next 3 draws
    phys2 = env._teleported(init_state(env.model), jax.random.PRNGKey(0), jnp.int32(1))
    yaw2 = rng.uniform_float() * limit - limit / 2
    roll2 = rng.uniform_float() * limit - limit / 2
    pitch2 = rng.uniform_float() * limit - limit / 2
    q2 = _euler_yxz_quat(yaw2, pitch2, roll2)
    expect_pos2 = np.array([1.0, 0.25, 2.0]) + rotate(q2, env.model.init_pos[root])
    np.testing.assert_allclose(np.asarray(phys2.pos[root]), expect_pos2, atol=1e-5)
    # a non-root member (offset from the spawn point) also lands exactly where
    # the reference's model_matrix * first_transform would put it — and the
    # two resets' tilts differ
    leg = env.meta.non_root_bodies[0]
    expect_leg = np.array([1.0, 0.25, 2.0]) + rotate(q, env.model.init_pos[leg])
    expect_leg2 = np.array([1.0, 0.25, 2.0]) + rotate(q2, env.model.init_pos[leg])
    np.testing.assert_allclose(np.asarray(phys.pos[leg]), expect_leg, atol=1e-5)
    np.testing.assert_allclose(np.asarray(phys2.pos[leg]), expect_leg2, atol=1e-5)
    assert not np.allclose(expect_leg, expect_leg2, atol=1e-3)


def test_cartpole_reset_impulse_seed_1234():
    """cartpole.cpp:171: rand_force = u * push * 2 - push, applied as a
    central impulse on the chariot."""
    import jax
    import jax.numpy as jnp

    from evomotion_tpu.envs.cartpole import CartPoleFactory
    from evomotion_tpu.physics.engine import init_state

    env = CartPoleFactory({}).make(1234)
    phys = env._teleported(init_state(env.model), jax.random.PRNGKey(7), jnp.int32(0))
    u = MT19937(1234).uniform_float()
    push = env.params.chariot_push_force
    expect = (u * push * 2.0 - push) / env.params.chariot_mass
    np.testing.assert_allclose(
        float(phys.lin_vel[env.chariot, 0]), expect, rtol=1e-6
    )


def test_cartpole3d_reset_impulse_seed_42():
    """cartpole3d.cpp:308-316: angle = u1*2pi, force = u2*push, planar
    impulse on cart_z."""
    import jax
    import jax.numpy as jnp

    from evomotion_tpu.envs.cartpole3d import CartPole3dFactory
    from evomotion_tpu.physics.engine import init_state

    env = CartPole3dFactory({}).make(42)
    phys = env._teleported(init_state(env.model), jax.random.PRNGKey(7), jnp.int32(0))
    rng = MT19937(42)
    angle = rng.uniform_float() * 2.0 * np.pi
    force = rng.uniform_float() * env.params.chariot_push_force
    expect = np.array([np.cos(angle) * force, 0.0, np.sin(angle) * force])
    expect = expect / env.params.cart_z_mass
    np.testing.assert_allclose(
        np.asarray(phys.lin_vel[env.cart_z]), expect, atol=1e-6
    )


def test_batched_tier_keeps_jax_random():
    """mt_parity=False (the vmapped trainer) must keep per-key diversity."""
    import jax

    from evomotion_tpu.envs.cartpole import CartPoleFactory

    env = CartPoleFactory({}).make(1234, mt_parity=False)
    assert env._mt_table is None
    import jax.numpy as jnp

    from evomotion_tpu.physics.engine import init_state

    v1 = env._teleported(init_state(env.model), jax.random.PRNGKey(1))
    v2 = env._teleported(init_state(env.model), jax.random.PRNGKey(2))
    assert float(v1.lin_vel[env.chariot, 0]) != float(v2.lin_vel[env.chariot, 0])
