"""Physics-engine unit tests: free fall, resting contact, joints, motors.

The reference ships no physics tests (SURVEY §4); these are the golden-value
tests the rebuild adds: analytic expectations for integration, contact rest,
constraint holding, and slider-motor drive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evomotion_tpu.physics.engine import init_state, physics_step
from evomotion_tpu.physics.model import ModelBuilder
from evomotion_tpu.physics.shapes import get_shape

DT = 1.0 / 60.0


def _step_n(model, state, n, targets=None, enabled=None):
    ns = model.n_slider
    targets = jnp.zeros((ns,)) if targets is None else targets
    enabled = jnp.ones((ns,), bool) if enabled is None else enabled

    @jax.jit
    def run(state):
        def body(state, _):
            state, diag = physics_step(model, state, targets, enabled, DT)
            return state, diag

        return jax.lax.scan(body, state, None, length=n)

    return run(state)


def test_free_fall():
    b = ModelBuilder()
    b.add_body("box", get_shape("cube").hull_verts, (1, 1, 1), 1.0, (0, 10, 0), (0, 0, 0, 1))
    model = b.finalize()
    state, _ = _step_n(model, init_state(model), 60)
    # semi-implicit Euler for 1s: v = -9.8, y = 10 - 9.8*dt*sum(1..60)/60
    expect_v = -9.8
    expect_y = 10 - 9.8 * DT * DT * (60 * 61 / 2)
    assert np.allclose(state.lin_vel[0, 1], expect_v, atol=1e-3)
    assert np.allclose(state.pos[0, 1], expect_y, atol=1e-3)


def test_box_rests_on_floor():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    b.add_body("floor", cube, (100, 1, 100), 0.0, (0, -1, 0), (0, 0, 0, 1))
    b.add_body("box", cube, (0.5, 0.5, 0.5), 1.0, (0, 1.0, 0), (0, 0, 0, 1))
    model = b.finalize()
    state, _ = _step_n(model, init_state(model), 240)
    # convex-hull margins (0.04 each) expand both surfaces: box rests at
    # 0.5 + 0.08, exactly as Bullet hulls do
    assert abs(float(state.pos[1, 1]) - 0.58) < 0.03
    assert abs(float(state.lin_vel[1, 1])) < 0.05
    # and it does not drift sideways
    assert abs(float(state.pos[1, 0])) < 1e-3
    assert abs(float(state.pos[1, 2])) < 1e-3


def test_p2p_pendulum_conserves_length():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    anchor = b.add_body("anchor", cube, (0.1, 0.1, 0.1), 0.0, (0, 0, 0), (0, 0, 0, 1))
    bob = b.add_body("bob", cube, (0.1, 0.1, 0.1), 1.0, (1.0, 0, 0), (0, 0, 0, 1))
    b.set_ignore_collision(anchor, bob)
    b.add_p2p(anchor, bob, (0, 0, 0), (-1.0, 0, 0))
    model = b.finalize()
    state, _ = _step_n(model, init_state(model), 120)
    # pivot of bob stays near the anchor origin
    from evomotion_tpu.physics import maths

    pivot_world = state.pos[1] + maths.quat_rotate(state.quat[1], jnp.array([-1.0, 0, 0]))
    assert np.linalg.norm(np.asarray(pivot_world)) < 0.05
    # bob swings (has moved from initial pose)
    assert float(state.pos[1, 1]) < -0.3


def test_hinge_keeps_axis():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    base = b.add_body("base", cube, (0.1, 0.1, 0.1), 0.0, (0, 0, 0), (0, 0, 0, 1))
    arm = b.add_body("arm", cube, (0.5, 0.1, 0.1), 1.0, (1.0, 0, 0), (0, 0, 0, 1))
    b.set_ignore_collision(base, arm)
    b.add_hinge(base, arm, (0, 0, 0), (-1.0, 0, 0), (0, 0, 1), (0, 0, 1))
    model = b.finalize()
    state, _ = _step_n(model, init_state(model), 180)
    # motion stays in the XY plane (hinge axis = z)
    assert abs(float(state.pos[1, 2])) < 0.01
    assert abs(float(state.ang_vel[1, 0])) < 0.05
    assert abs(float(state.ang_vel[1, 1])) < 0.05
    # arm fell below the horizontal
    assert float(state.pos[1, 1]) < -0.3


def test_hinge_limit_blocks():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    base = b.add_body("base", cube, (0.1, 0.1, 0.1), 0.0, (0, 0, 0), (0, 0, 0, 1))
    arm = b.add_body("arm", cube, (0.5, 0.1, 0.1), 1.0, (1.0, 0, 0), (0, 0, 0, 1))
    b.set_ignore_collision(base, arm)
    # allow only +/- 0.3 rad about z
    b.add_hinge(base, arm, (0, 0, 0), (-1.0, 0, 0), (0, 0, 1), (0, 0, 1), -0.3, 0.3)
    model = b.finalize()
    state, _ = _step_n(model, init_state(model), 240)
    # arm should hang at roughly the -0.3 rad limit, not straight down
    angle = np.arctan2(float(state.pos[1, 1]), float(state.pos[1, 0]))
    assert -0.45 < angle < -0.15


def test_slider_motor_drives_body():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    base = b.add_body("base", cube, (0.1, 0.1, 0.1), 0.0, (0, 0, 0), (0, 0, 0, 1))
    cart = b.add_body("cart", cube, (0.2, 0.2, 0.2), 1.0, (0, 0, 0), (0, 0, 0, 1))
    b.set_ignore_collision(base, cart)
    b.add_slider(
        base, cart, (0, 0, 0), (0, 0, 0, 1), (0, 0, 0), (0, 0, 0, 1),
        lin_lo=-10.0, lin_hi=10.0, max_motor_force=64.0, motor_index=0,
    )
    model = b.finalize()
    state, diags = _step_n(model, init_state(model), 60, targets=jnp.array([2.0]))
    # slider axis = +x of frame A; target velocity 2 m/s reached quickly
    assert abs(float(state.lin_vel[1, 0]) - 2.0) < 0.05
    assert 1.5 < float(state.pos[1, 0]) < 2.1
    # gravity is canceled by the perpendicular rows
    assert abs(float(state.pos[1, 1])) < 0.01
    # diagnostics expose linear position
    assert abs(float(diags.slider_lin_pos[-1, 0]) - float(state.pos[1, 0])) < 0.05


def test_slider_limit_stops_motion():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    base = b.add_body("base", cube, (0.1, 0.1, 0.1), 0.0, (0, 0, 0), (0, 0, 0, 1))
    cart = b.add_body("cart", cube, (0.2, 0.2, 0.2), 1.0, (0, 0, 0), (0, 0, 0, 1))
    b.set_ignore_collision(base, cart)
    b.add_slider(
        base, cart, (0, 0, 0), (0, 0, 0, 1), (0, 0, 0), (0, 0, 0, 1),
        lin_lo=-1.0, lin_hi=1.0, max_motor_force=64.0, motor_index=0,
    )
    model = b.finalize()
    state, _ = _step_n(model, init_state(model), 240, targets=jnp.array([2.0]))
    assert float(state.pos[1, 0]) < 1.1


def test_batched_vmap_matches_single():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    b.add_body("floor", cube, (100, 1, 100), 0.0, (0, -1, 0), (0, 0, 0, 1))
    b.add_body("box", cube, (0.5, 0.5, 0.5), 1.0, (0, 1.0, 0), (0, 0, 0, 1))
    model = b.finalize()

    s0 = init_state(model)
    batched = jax.tree.map(lambda x: jnp.stack([x, x]), s0)
    targets = jnp.zeros((2, 0))
    enabled = jnp.ones((2, 0), bool)

    step1 = jax.jit(lambda s: physics_step(model, s, jnp.zeros((0,)), jnp.ones((0,), bool), DT)[0])
    vstep = jax.jit(
        jax.vmap(lambda s, t, e: physics_step(model, s, t, e, DT)[0], in_axes=(0, 0, 0))
    )
    single = step1(s0)
    multi = vstep(batched, targets, enabled)
    np.testing.assert_allclose(np.asarray(multi.pos[0]), np.asarray(single.pos), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(multi.pos[1]), np.asarray(single.pos), rtol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


@pytest.mark.parametrize("solver", ["xla", "pallas"])
def test_box_rests_on_member_stack(solver):
    """A box resting ON a dynamic member must sit still for 300 steps.

    This needs a multi-point member-member manifold: a single contact point
    leaves the torque about that point unconstrained and the box rocks/tips
    (Bullet keeps up-to-4-point persistent manifolds per convex pair,
    item.cpp:17-52). Exercises the K=member_manifold_k SAT manifold on both
    backends (pallas runs interpret-mode on CPU via one vmapped env)."""
    import dataclasses

    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    ident = (0.0, 0.0, 0.0, 1.0)
    b.add_body("floor", cube, (100, 1, 100), 0.0, (0, -1, 0), ident, friction=0.7)
    # slab member on the floor: top face at 0.25 + 2*margin
    b.add_body("slab", cube, (1.5, 0.125, 1.5), 4.0, (0, 0.205, 0), ident, friction=0.6)
    # box centered slightly off the slab's middle, resting on the slab
    b.add_body("box", cube, (0.25, 0.25, 0.25), 1.0, (0.2, 0.785, 0.1), ident, friction=0.6)
    model = dataclasses.replace(b.finalize(), solver=solver)
    assert model.member_manifold_k >= 4  # default manifold size under test

    if solver == "pallas":
        state0 = jax.tree.map(lambda x: x[None], init_state(model))
        tgt = jnp.zeros((1, 0))
        en = jnp.ones((1, 0), bool)

        @jax.jit
        def run(state):
            def body(state, _):
                state, _ = jax.vmap(
                    lambda s, t, e: physics_step(model, s, t, e, DT)
                )(state, tgt, en)
                return state, None

            return jax.lax.scan(body, state, None, length=300)[0]

        state = jax.tree.map(lambda x: x[0], run(state0))
    else:
        state, _ = _step_n(model, init_state(model), 300)

    pos = np.asarray(state.pos)
    quat = np.asarray(state.quat)
    lin = np.asarray(state.lin_vel)
    ang = np.asarray(state.ang_vel)
    # box (body 2) is still on top of the slab, upright, at rest
    # (rest height: slab top 0.33 + two hull margins 0.08 + half-extent 0.25)
    assert 0.60 < pos[2, 1] < 0.72, pos[2]
    assert abs(pos[2, 0] - 0.2) < 0.05 and abs(pos[2, 2] - 0.1) < 0.05, pos[2]
    assert abs(quat[2, 3]) > 0.995, quat[2]  # no tipping
    assert np.all(np.abs(lin[2]) < 0.05), lin[2]
    assert np.all(np.abs(ang[2]) < 0.2), ang[2]
    # slab stayed put too
    assert abs(pos[1, 0]) < 0.05 and abs(pos[1, 2]) < 0.05, pos[1]
    assert abs(quat[1, 3]) > 0.995, quat[1]


def test_dyn_pair_pruning_conservative():
    """Compile-time unreachable-pair pruning: a tightly limited chain's
    distal pair prunes; free bodies and reachable pairs never do."""
    from evomotion_tpu.physics.model import ModelBuilder
    from evomotion_tpu.physics.shapes import get_shape

    cube = get_shape("cube").hull_verts

    # chain: a - b - c with +-0.05 rad hinges; a and c sit 3 apart -> the
    # (a, c) pair can never close the gap and must prune; (a, b) stays
    b = ModelBuilder()
    ba = b.add_body("a", cube, (0.7, 0.2, 0.2), 1.0, (0, 1, 0), (0, 0, 0, 1))
    bb = b.add_body("b", cube, (0.7, 0.2, 0.2), 1.0, (1.5, 1, 0), (0, 0, 0, 1))
    bc = b.add_body("c", cube, (0.2, 0.2, 0.2), 1.0, (3.2, 1, 0), (0, 0, 0, 1))
    b.add_hinge(ba, bb, (0.75, 0, 0), (-0.75, 0, 0), (0, 0, 1), (0, 0, 1), -0.05, 0.05)
    b.add_hinge(bb, bc, (0.75, 0, 0), (-0.75, 0, 0), (0, 0, 1), (0, 0, 1), -0.05, 0.05)
    m = b.finalize()
    pairs = {tuple(p) for p in m.dyn_pair_body.tolist()}
    assert (ba, bb) in pairs or (bb, ba) in pairs
    assert (ba, bc) not in pairs and (bc, ba) not in pairs, pairs

    # two unconnected boxes: no kinematic bound -> never pruned
    b2 = ModelBuilder()
    x = b2.add_body("x", cube, (0.2, 0.2, 0.2), 1.0, (0, 1, 0), (0, 0, 0, 1))
    y = b2.add_body("y", cube, (0.2, 0.2, 0.2), 1.0, (5, 1, 0), (0, 0, 0, 1))
    m2 = b2.finalize()
    assert len(m2.dyn_pair_body) == 1

    # the spider: every pair is (conservatively) reachable; none pruned
    from evomotion_tpu.envs.robot import RobotWalk

    assert len(RobotWalk().model.dyn_pair_body) == 120
