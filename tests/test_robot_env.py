"""Robot env tests: obs layout, reward/termination bank, reset behavior.

Reference behaviors under test: robot_walk.cpp:56-104 (reward = root v_z,
time-bank termination, double settle), robot_jump.cpp:67-104, and the
proprioception layout (proprioception_state.cpp) giving obs 371 / act 12 for
the spider.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evomotion_tpu.envs.robot import RobotJump, RobotWalk, RobotWalkFactory


def test_spaces(spider_walk):
    walk_env = spider_walk[0]
    assert walk_env.observation_size == 371
    assert walk_env.action_size == 12
    assert walk_env.settle_total == 60  # two settle loops of 30


def test_reset_and_obs_sane(spider_walk):
    walk_env, jit_reset, _ = spider_walk
    state, res = jit_reset(jax.random.PRNGKey(0))
    obs = np.asarray(res.obs)
    assert obs.shape == (371,)
    assert not np.isnan(obs).any()
    assert bool(res.valid) and not bool(res.done)
    # after 60 settle frames the spider sits near the floor: root height
    # feature (index 17 = root extra y) below spawn height
    assert obs[17] < 0.3
    # reward equals the root z velocity
    root_vz = float(state.physics.lin_vel[walk_env.meta.root_body, 2])
    assert abs(float(res.reward) - root_vz) < 1e-5


@pytest.mark.slow
def test_time_bank_fails_when_standing_still():
    # small bank via factory param so residual settle jitter (which can
    # occasionally push root v_z above the thresholds) cannot stall the test
    env = RobotWalkFactory({"initial_remaining_seconds": "0.2", "reset_frames": "30"}).make()
    state, res = jax.jit(env.reset)(jax.random.PRNGKey(1))

    @jax.jit
    def run(state):
        def body(s, _):
            s, r = env.step(s, jnp.zeros((12,)))
            return s, (r.done, r.valid, r.reward)

        return jax.lax.scan(body, state, None, length=120)

    state, (done, valid, reward) = run(state)
    done = np.asarray(done)
    # bank = 12 steps; a still spider (v_z < 0.1) drains it and fails
    assert done.any()
    first = int(np.nonzero(done)[0][0])
    assert first <= 100


@pytest.mark.slow
def test_jump_reward_uses_vy_plus_vz():
    env = RobotJump()
    assert env.settle_total == 10  # 1/6 s at 60 Hz, single settle loop
    state, res = jax.jit(env.reset)(jax.random.PRNGKey(2))
    v = np.asarray(state.physics.lin_vel[env.meta.root_body])
    expect = max(v[1], 0.0) + v[2]
    assert abs(float(res.reward) - expect) < 1e-5


def test_factory_params():
    f = RobotWalkFactory({"reset_frames": "5", "target_velocity": "0.7"})
    env = f.make()
    assert env.reset_frames == 5
    assert env.target_velocity == 0.7
    assert env.settle_total == 10


@pytest.mark.slow
def test_robot_walk_strict_bullet_runs_stably():
    """strict_bullet mode (uncapped limit bias, joint warm start, slip
    friction — engine.py module docstring) drives the full robot_walk env:
    round-2 verdict noted no training/bench config ever ran it, so its
    stability claims rested on two unit tests. 180 zero-action steps must
    keep the spider coherent with no NaNs on both solver backends' shared
    row formulation (xla here; the pallas kernel shares the rows)."""
    import dataclasses

    import jax

    env = RobotWalkFactory({}).make(7, mt_parity=False)
    env.model = dataclasses.replace(env.model, strict_bullet=True)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(7))

    @jax.jit
    def roll(state):
        def body(s, _):
            s, res = env.step(s, jnp.zeros((env.action_size,)))
            return s, res.reward
        return jax.lax.scan(body, state, None, length=180)

    state, rews = roll(state)
    pos = np.asarray(state.physics.pos)
    assert not np.isnan(pos).any()
    assert not np.isnan(np.asarray(rews)).any()
    root = pos[env.meta.root_body]
    members = [i for i in range(env.model.n_bodies) if i != env.meta.floor_body]
    assert -1.5 < root[1] < 1.0, root
    assert np.abs(pos[members] - root).max() < 2.0
    assert np.abs(np.asarray(state.physics.lin_vel)).max() < 20.0


def test_nan_explosion_fails_and_recovers(spider_walk):
    """Non-finite guard: if the physics state goes NaN (policy-driven
    contact explosion), the episode must FAIL with sanitized obs/reward —
    NaN compares False everywhere, so without the guard the time bank never
    drains and one poisoned env never terminates (observed in the r4 CrossQ
    run) — and the auto-reset must return the env to a clean, finite state.
    Uses the shared session env/step (compiling a second spider env cost
    this test 216 s of the default gate)."""
    env, jit_reset, step = spider_walk
    state, res = jit_reset(jax.random.PRNGKey(3))
    # poison the root body's velocity
    bad_phys = state.physics._replace(
        lin_vel=state.physics.lin_vel.at[env.meta.root_body].set(jnp.nan)
    )
    state = state._replace(physics=bad_phys)
    state, res = step(state, jnp.zeros((12,)))
    obs = np.asarray(res.obs)
    assert not np.isnan(obs).any(), "guard must sanitize the emitted obs"
    assert not np.isnan(float(res.reward))
    assert bool(res.done) and not bool(res.win), "NaN must fail, not win"
    # NaN actions must not poison the persistent motor target
    state, res = step(state, jnp.full((12,), jnp.nan))
    # run through the settle phase; the env must come back finite
    for _ in range(env.settle_total + 5):
        state, res = step(state, jnp.zeros((12,)))
    assert not np.isnan(np.asarray(res.obs)).any()
    assert not np.isnan(np.asarray(state.physics.pos)).any()
    assert bool(res.valid)
