"""Golden-value physics tests: analytic expectations and determinism.

The reference ships no physics tests (SURVEY §4); these pin the engine to
physics ground truth instead of Bullet goldens (no Bullet build exists in
this environment — see PARITY.md known gaps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evomotion_tpu.physics.engine import init_state, physics_step
from evomotion_tpu.physics.model import ModelBuilder
from evomotion_tpu.physics.shapes import get_shape

DT = 1.0 / 60.0


def _scan(model, state, n, targets=None):
    ns = model.n_slider
    t = jnp.zeros((ns,)) if targets is None else targets

    @jax.jit
    def run(state):
        def body(s, _):
            s, d = physics_step(model, s, t, jnp.ones((ns,), bool), DT)
            return s, s.pos

        return jax.lax.scan(body, state, None, length=n)

    return run(state)


def test_pendulum_period_matches_theory():
    """Hinge pendulum small-oscillation period T = 2*pi*sqrt(I/(m*g*d))."""
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    anchor = b.add_body("anchor", cube, (0.05, 0.05, 0.05), 0.0, (0, 0, 0), (0, 0, 0, 1))
    # small bob on a 1m arm, deflected 0.1 rad from vertical
    theta0 = 0.1
    pos = (np.sin(theta0), -np.cos(theta0), 0.0)
    bob = b.add_body("bob", cube, (0.05, 0.05, 0.05), 1.0, pos, (0, 0, 0, 1))
    b.set_ignore_collision(anchor, bob)
    b.add_hinge(anchor, bob, (0, 0, 0), (-pos[0], -pos[1], 0), (0, 0, 1), (0, 0, 1))
    model = b.finalize()

    n = 400
    _, traj = _scan(model, init_state(model), n)
    x = np.asarray(traj)[:, 1, 0]  # bob x over time
    # measure the period from zero crossings of (x - mean)
    xc = x - x.mean()
    crossings = np.nonzero(np.diff(np.sign(xc)) != 0)[0]
    assert len(crossings) >= 4
    half_periods = np.diff(crossings)
    period = 2.0 * half_periods.mean() * DT

    # I about pivot = m*d^2 + I_cm (box inertia with Bullet margins)
    d = 1.0
    m = 1.0
    half = 0.05 + 2 * 0.04  # AABB half extent + double margin (model.py)
    i_cm = m / 12.0 * ((2 * half) ** 2 + (2 * half) ** 2)
    i_pivot = m * d * d + i_cm
    t_theory = 2 * np.pi * np.sqrt(i_pivot / (m * 9.8 * d))
    assert abs(period - t_theory) / t_theory < 0.05


def test_projectile_trajectory():
    """A free body with initial velocity follows the ballistic parabola."""
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    b.add_body("ball", cube, (0.1, 0.1, 0.1), 1.0, (0, 0, 0), (0, 0, 0, 1))
    model = b.finalize()
    state = init_state(model)
    v0 = jnp.array([[2.0, 5.0, 1.0]])
    state = state._replace(lin_vel=v0)
    n = 60
    state2, _ = _scan(model, state, n)
    t = n * DT
    # semi-implicit Euler: y = sum_k v0_y*dt - g*dt^2*k
    expect_y = 5.0 * t - 9.8 * DT * DT * (n * (n + 1) / 2)
    np.testing.assert_allclose(float(state2.pos[0, 0]), 2.0 * t, rtol=1e-4)
    np.testing.assert_allclose(float(state2.pos[0, 1]), expect_y, rtol=1e-3)
    np.testing.assert_allclose(float(state2.pos[0, 2]), 1.0 * t, rtol=1e-4)


@pytest.mark.slow
def test_determinism_same_seed_same_trajectory():
    """Two identical jitted runs produce bit-identical trajectories."""
    from evomotion_tpu.envs.robot import RobotWalk

    env = RobotWalk()
    key = jax.random.PRNGKey(5)
    s1, r1 = jax.jit(env.reset)(key)
    s2, r2 = jax.jit(env.reset)(key)
    np.testing.assert_array_equal(np.asarray(r1.obs), np.asarray(r2.obs))

    step = jax.jit(env.step)
    a = jnp.full((12,), 0.3)
    for _ in range(5):
        s1, r1 = step(s1, a)
        s2, r2 = step(s2, a)
    np.testing.assert_array_equal(np.asarray(s1.physics.pos), np.asarray(s2.physics.pos))
    np.testing.assert_array_equal(np.asarray(r1.obs), np.asarray(r2.obs))


def test_momentum_conservation_free_space():
    """Two bodies joined by a motorized slider conserve total momentum
    (internal forces only; gravity removed by starting both at rest in free
    fall frame: compare momenta deltas)."""
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    b1 = b.add_body("m1", cube, (0.2, 0.2, 0.2), 1.0, (0, 100, 0), (0, 0, 0, 1))
    b2 = b.add_body("m2", cube, (0.2, 0.2, 0.2), 2.0, (1.0, 100, 0), (0, 0, 0, 1))
    b.set_ignore_collision(b1, b2)
    b.add_slider(
        b1, b2, (0, 0, 0), (0, 0, 0, 1), (-1, 0, 0), (0, 0, 0, 1),
        lin_lo=-3.0, lin_hi=3.0, max_motor_force=50.0, motor_index=0,
    )
    model = b.finalize()
    state, _ = _scan(model, init_state(model), 30, targets=jnp.array([2.0]))
    # horizontal momentum: internal motor forces cancel
    px = float(1.0 * state.lin_vel[0, 0] + 2.0 * state.lin_vel[1, 0])
    assert abs(px) < 1e-3
    # the slider extended (relative motion happened)
    rel = float(state.pos[1, 0] - state.pos[0, 0])
    assert rel > 1.2


def test_strict_mode_trajectory_matches_committed_artifact():
    """Standing strict-Bullet artifact (VERDICT r3 #6): replay the committed
    256-step fixed-seed robot_walk trajectory in strict mode and compare.
    Solver changes that move the parity configuration show up as a diff
    here; regenerate deliberately with tools/gen_strict_artifact.py.

    Runs in the DEFAULT gate (ADVICE r4): a solver change that moves the
    parity configuration must not land behind a green default gate."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_strict_artifact import OUT, run_strict_trajectory

    ref = np.load(OUT)
    pos, quat, rew = run_strict_trajectory()
    # same platform (CPU) + same code => tight agreement; loosened only for
    # cross-version XLA numeric churn
    np.testing.assert_allclose(pos, ref["pos"], atol=1e-4)
    np.testing.assert_allclose(rew, ref["reward"], atol=1e-4)
