"""Agent end-to-end smoke tests.

Mirrors the reference test strategy (evo_motion_networks/tests/src/
test_agents.cpp:19-236): construct every learning agent with tiny dims, run
episodes of act() on random states/rewards + done(), and assert action shape,
bounds in [-1, 1], and no NaN — with random tensors standing in for the env.
"""

import jax
import numpy as np
import pytest

from evomotion_tpu.agents.factory import AGENT_FACTORY_CONSTRUCTORS, get_agent_factory

STATE, ACTION, HIDDEN, BATCH = 3, 2, 3, 2

COMMON = {
    "seed": "42",
    "hidden_size": str(HIDDEN),
    "neuron_number": str(HIDDEN),
    "actor_hidden_size": str(HIDDEN),
    "critic_hidden_size": str(HIDDEN),
    "batch_size": str(BATCH),
    "lr": "1e-3",
    "learning_rate": "1e-3",
    "gamma": "0.99",
    "lambda": "0.95",
    "epsilon": "0.2",
    "entropy_factor": "0.01",
    "entropy_start_factor": "0.01",
    "entropy_end_factor": "0.001",
    "entropy_steps": "1000",
    "critic_loss_factor": "0.5",
    "epoch": "2",
    "train_every": "2",
    "replay_buffer_size": "64",
    "clip_grad_norm": "0.5",
    "tau": "0.005",
    "unfolding_steps": "2",
    "action_value": "0.5",
}

ALL_AGENTS = sorted(AGENT_FACTORY_CONSTRUCTORS.keys())


@pytest.mark.parametrize("name", ALL_AGENTS)
def test_agent_acts_and_trains(name):
    factory = get_agent_factory(name, dict(COMMON))
    agent = factory.create_agent(STATE, ACTION)
    rng = np.random.default_rng(0)

    for _episode in range(3):
        for _step in range(2 * BATCH):
            state = rng.normal(size=(STATE,)).astype(np.float32)
            action = np.asarray(agent.act(state, float(rng.normal())))
            assert action.shape == (ACTION,)
            assert not np.isnan(action).any()
            assert (action >= -1.0).all() and (action <= 1.0).all()
        agent.done(rng.normal(size=(STATE,)).astype(np.float32), float(rng.normal()))

    for meter in agent.get_metrics():
        assert not np.isnan(meter.loss())
    assert agent.count_parameters() >= 0


@pytest.mark.parametrize("name", ["ppo_gae", "soft_actor_critic", "cross_q"])
def test_agent_save_load_roundtrip(name, tmp_path):
    factory = get_agent_factory(name, dict(COMMON))
    agent = factory.create_agent(STATE, ACTION)
    rng = np.random.default_rng(1)
    for _ in range(2 * BATCH):
        agent.act(rng.normal(size=(STATE,)).astype(np.float32), 0.1)
    agent.done(rng.normal(size=(STATE,)).astype(np.float32), 0.1)

    agent.save(str(tmp_path))
    agent2 = get_agent_factory(name, dict(COMMON)).create_agent(STATE, ACTION)
    agent2.load(str(tmp_path))
    # actor params identical after load
    for a, b in zip(
        jax.tree.leaves(agent.actor_params), jax.tree.leaves(agent2.actor_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_agent_param_raises():
    factory = get_agent_factory("ppo_gae", {"seed": "1"})
    with pytest.raises(ValueError):
        factory.create_agent(STATE, ACTION)


def test_unknown_agent_raises():
    with pytest.raises(ValueError):
        get_agent_factory("ppo", {})  # README typo name: not in the registry
