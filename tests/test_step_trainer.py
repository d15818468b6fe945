"""Batched A2C / PPO-vanilla step-buffer trainers (onpolicy_step_batched).

Reference counterparts: ActorCriticAgent (actor_critic.cpp) and
PpoVanillaAgent (ppo_vanilla.cpp) driven by the sequential train loop —
here every agent family has a batched TPU tier."""

import jax
import numpy as np
import pytest

from evomotion_tpu.envs.cartpole import CartPole, CartPoleParams
from evomotion_tpu.train.onpolicy_step_batched import (
    BatchedStepTrainer,
    StepTrainerConfig,
)


def _trainer(algo, **kw):
    env = CartPole(CartPoleParams(reset_frame_nb=2))
    defaults = dict(
        hidden_size=32, batch_size=64, steps_per_iter=16, n_envs=32,
        buffer_capacity=2048, epoch=2, train_every=1,
    )
    defaults.update(kw)
    return BatchedStepTrainer(env, algo, StepTrainerConfig(**defaults), seed=0)


@pytest.mark.parametrize("algo", ["actor_critic", "ppo_vanilla"])
def test_step_trainer_runs_and_updates(algo):
    trainer = _trainer(algo)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    p0 = jax.tree.leaves(state.carry[0])[0].copy()
    for _ in range(3):
        state, metrics = step(state)
    assert int(state.iteration) == 3
    assert int(metrics.updates_done) > 0
    assert np.isfinite(float(metrics.actor_loss))
    p1 = jax.tree.leaves(state.carry[0])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.parametrize("algo", ["actor_critic", "ppo_vanilla"])
def test_step_trainer_learns_cartpole(algo):
    trainer = _trainer(algo)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    eps = []
    for _ in range(160):
        state, metrics = step(state)
        eps.append(float(metrics.episodes_done))
    # learning evidence: the BEST 15-iteration window must show many fewer
    # terminations than the early window (the tiny config over-trains and
    # oscillates afterwards, so the final window alone is noisy)
    early = np.mean(eps[2:17])
    best = np.convolve(eps, np.ones(15) / 15, mode="valid").min()
    assert best < 0.7 * early, (early, best)


def test_a2c_entropy_schedule_decays():
    trainer = _trainer("actor_critic", entropy_steps=1000)
    import jax.numpy as jnp

    e0 = float(trainer._entropy_factor(jnp.int32(0)))
    e_mid = float(trainer._entropy_factor(jnp.int32(500)))
    e_end = float(trainer._entropy_factor(jnp.int32(2000)))
    assert e0 == pytest.approx(0.01)
    assert e0 > e_mid > e_end
    assert e_end == pytest.approx(1e-4)
