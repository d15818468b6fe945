"""Batched PPO trainer tests (train/ppo_batched.py) on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.cartpole import CartPole, CartPoleParams
from evomotion_tpu.train.ppo_batched import (
    BatchedPpo,
    PpoConfig,
    load_train_state,
    save_train_state,
)


def _trainer(n_envs=16, horizon=8):
    env = CartPole(CartPoleParams(reset_frame_nb=2))
    return BatchedPpo(
        env, PpoConfig(hidden_size=16, horizon=horizon, epoch=2, n_envs=n_envs), seed=0
    )


def test_train_step_runs_and_updates():
    trainer = _trainer()
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    p0 = jax.tree.leaves(state.actor_params)[0].copy()
    state, metrics = step(state)
    assert int(state.iteration) == 1
    assert not np.isnan(float(metrics.actor_loss))
    assert not np.isnan(float(metrics.critic_loss))
    # params actually moved
    p1 = jax.tree.leaves(state.actor_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_rollout_masks_settling_steps():
    trainer = _trainer(n_envs=8, horizon=32)
    rollout = jax.jit(trainer.rollout_fn())
    state = trainer.init()
    state, traj = rollout(state)
    obs, actions, log_probs, values, rewards, dones, valids, done_lens, wins = traj
    assert obs.shape == (32, 8, 7)
    dones = np.asarray(dones)
    valids = np.asarray(valids)
    # settle steps (invalid) follow each done within the horizon
    for t, n in zip(*np.nonzero(dones)):
        if t + 1 < 32:
            assert not valids[t + 1, n]


def test_checkpoint_roundtrip(tmp_path):
    trainer = _trainer()
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    state, _ = step(state)
    save_train_state(str(tmp_path), state)
    state2 = load_train_state(str(tmp_path), trainer.init())
    for a, b in zip(jax.tree.leaves(state.actor_params), jax.tree.leaves(state2.actor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state2.iteration) == 1
    # resumed state steps onward
    state3, m = step(state2)
    assert int(state3.iteration) == 2


def test_graft_entry_single():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (1024, 12)
