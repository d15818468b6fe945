"""Batched liquid (LTC) PPO trainer tests (train/ppo_liquid_batched.py).

Reference counterpart: PpoGaeLiquidAgent
(evo_motion_networks/src/agents/ppo_gae_liquid.cpp) — hidden states stored
per step, replayed in training, reset on episode end."""

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.cartpole import CartPole, CartPoleParams
from evomotion_tpu.train.ppo_liquid_batched import (
    BatchedPpoLiquid,
    PpoLiquidConfig,
)


def _trainer(n_envs=16, horizon=8, **kw):
    env = CartPole(CartPoleParams(reset_frame_nb=2))
    cfg = PpoLiquidConfig(
        neurons=16, unfolding_steps=3, horizon=horizon, epoch=2,
        n_envs=n_envs, **kw,
    )
    return BatchedPpoLiquid(env, cfg, seed=0)


def test_train_step_runs_and_updates():
    trainer = _trainer()
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    p0 = jax.tree.leaves(state.actor_params)[0].copy()
    state, metrics = step(state)
    assert int(state.iteration) == 1
    assert np.isfinite(float(metrics.actor_loss))
    assert np.isfinite(float(metrics.critic_loss))
    p1 = jax.tree.leaves(state.actor_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # the LTC cell params train too (a/tau/b/w/r)
    c0 = trainer.init().actor_params["cell"]["w"]
    assert not np.allclose(
        np.asarray(c0), np.asarray(state.actor_params["cell"]["w"])
    )


def test_hidden_state_advances_and_resets():
    trainer = _trainer(n_envs=8, horizon=48)
    rollout = jax.jit(trainer.rollout_fn())
    state = trainer.init()
    state, traj = rollout(state)
    (obs, actions, log_probs, values, rewards, dones, valids, ax, cx,
     done_lens, wins) = traj
    ax = np.asarray(ax)
    dones = np.asarray(dones)
    valids = np.asarray(valids)
    assert ax.shape == (48, 8, 16)
    # hidden state moves across valid transitions
    moved = np.abs(ax[1:] - ax[:-1]).max(axis=-1)
    for t, n in zip(*np.nonzero(valids[:-1] & ~dones[:-1])):
        assert moved[t, n] > 0.0, (t, n)
    # after a done, the stored pre-step state is the first state (zeros)
    for t, n in zip(*np.nonzero(dones)):
        if t + 1 < 48:
            np.testing.assert_array_equal(ax[t + 1, n], 0.0)
    # hidden state freezes across invalid settle frames (reference: those
    # frames never reach the agent)
    for t, n in zip(*np.nonzero(~valids[:-1] & ~dones[:-1])):
        np.testing.assert_array_equal(ax[t + 1, n], ax[t, n])


def test_learns_cartpole():
    """Reward per valid step improves over training on the batched liquid
    path (the reference's learning proof is behavioral; test_agents.cpp only
    smoke-tests — this is stronger)."""
    trainer = _trainer(n_envs=32, horizon=32, learning_rate=3e-3)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    first, last = [], []
    for i in range(40):
        state, metrics = step(state)
        (first if i < 5 else last).append(float(metrics.mean_reward))
    assert np.mean(last[-5:]) > np.mean(first), (np.mean(first), np.mean(last[-5:]))


# ---------------------------------------------------------------------------
# liquid SAC tier (train/offpolicy_batched.BatchedOffPolicyLiquid)
# Reference: soft_actor_critic_liquid.cpp + liquid_sac_memory buffers.
# ---------------------------------------------------------------------------


def _sac_trainer(n_envs=16, steps_per_iter=8, **kw):
    from evomotion_tpu.train.offpolicy_batched import (
        BatchedOffPolicyLiquid,
        OffPolicyLiquidConfig,
    )

    env = CartPole(CartPoleParams(reset_frame_nb=2))
    defaults = dict(
        neurons=16, unfolding_steps=3, batch_size=32, epoch=1,
        steps_per_iter=steps_per_iter, n_envs=n_envs, buffer_capacity=512,
        train_every=1,
    )
    defaults.update(kw)
    return BatchedOffPolicyLiquid(env, OffPolicyLiquidConfig(**defaults), seed=0)


def test_liquid_sac_step_runs_and_updates():
    trainer = _sac_trainer()
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    p0 = jax.tree.leaves(state.carry[0])[0].copy()
    for _ in range(3):  # fill the ring past batch_size, then update
        state, metrics = step(state)
    assert int(state.iteration) == 3
    assert int(metrics.updates_done) > 0
    assert np.isfinite(float(metrics.actor_loss))
    p1 = jax.tree.leaves(state.carry[0])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # ring stores hidden states for all five nets, in and out
    for n in trainer.NETS:
        assert np.asarray(state.ring.x[n]).shape == (trainer.capacity, 16)
        assert np.abs(np.asarray(state.ring.next_x[n])).max() > 0.0


def test_liquid_sac_hidden_states_consistent():
    """Stored next_x of a transition is the hidden state the NEXT stored
    transition of the same env consumed (teacher-forcing chain), except at
    episode boundaries where it resets to the first state."""
    trainer = _sac_trainer(n_envs=4, steps_per_iter=12)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    state, _ = step(state)
    cap_t = 12  # transitions per env this iteration, stored [T, N] flattened
    x = np.asarray(state.ring.x["actor"]).reshape(-1, 4, 16)[:cap_t]
    nx = np.asarray(state.ring.next_x["actor"]).reshape(-1, 4, 16)[:cap_t]
    dones = np.asarray(state.ring.done).reshape(-1, 4)[:cap_t]
    valid = np.asarray(state.ring.valid).reshape(-1, 4)[:cap_t]
    for t in range(cap_t - 1):
        for n in range(4):
            if valid[t, n] and valid[t + 1, n] and not dones[t, n]:
                np.testing.assert_allclose(
                    nx[t, n], x[t + 1, n], atol=1e-6,
                    err_msg=f"hidden chain broken at t={t} env={n}",
                )


def test_liquid_sac_learns_cartpole():
    """Episode-failure rate drops as the liquid SAC learns to balance
    (mean reward starts near-max on cartpole since the pole begins upright,
    so episodes_done per fixed window is the discriminative signal)."""
    trainer = _sac_trainer(
        n_envs=32, steps_per_iter=16, learning_rate=1e-3, batch_size=64,
        buffer_capacity=4096,
    )
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    eps = []
    for i in range(140):
        state, metrics = step(state)
        eps.append(float(metrics.episodes_done))
    early, late = np.mean(eps[5:30]), np.mean(eps[-20:])
    assert late < 0.5 * early, (early, late)
