"""CartPole env behavior tests (reference: src/env/cartpole.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.cartpole import CartPole, CartPoleFactory


def _rollout(env, state, policy_keys):
    @jax.jit
    def run(state, keys):
        def body(s, k):
            a = jax.random.uniform(k, (1,)) * 2 - 1
            s, r = env.step(s, a)
            return s, (r.reward, r.done, r.valid, r.obs)

        return jax.lax.scan(body, state, keys)

    return run(state, policy_keys)[1]


def test_reset_obs_shape_and_sanity():
    env = CartPole()
    state, res = jax.jit(env.reset)(jax.random.PRNGKey(0))
    obs = np.asarray(res.obs)
    assert obs.shape == (7,)
    assert not np.isnan(obs).any()
    # pendulum starts upright: angle/(2pi) - 1 ~ -1
    assert obs[4] < -0.9
    # reward = uprightness + centering ~ 2 at start
    assert 1.5 < float(res.reward) <= 2.0
    assert not bool(res.done)


def test_random_policy_eventually_fails_with_minus_two():
    env = CartPole()
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), 300)
    rew, done, valid, obs = _rollout(env, state, keys)
    done = np.asarray(done)
    assert done.any(), "random policy should drop the pole within 300 steps"
    first = int(np.nonzero(done)[0][0])
    assert np.asarray(rew)[first] == -2.0
    # settling: the 8 steps after a done are invalid transitions
    valid = np.asarray(valid)
    assert not valid[first + 1 : first + 8].any()


def test_factory_param_parsing():
    f = CartPoleFactory({"slider_speed": "8.5", "mas_steps": "100", "reset_frame_nb": "4"})
    env = f.make()
    assert env.params.slider_speed == 8.5
    assert env.params.max_steps == 100
    assert env.params.reset_frame_nb == 4
    # defaults survive
    assert env.params.slider_force == 64.0


def test_episode_keeps_obs_finite_across_autoreset():
    env = CartPole(CartPole().params.__class__(max_steps=50))
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    keys = jax.random.split(jax.random.PRNGKey(3), 200)
    rew, done, valid, obs = _rollout(env, state, keys)
    assert not np.isnan(np.asarray(obs)).any()
    assert not np.isnan(np.asarray(rew)).any()
