"""Multi-device data-parallel training tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evomotion_tpu.envs.cartpole import CartPole, CartPoleParams
from evomotion_tpu.parallel.mesh import (
    make_env_mesh,
    make_sharded_train_step,
    shard_train_state,
)
from evomotion_tpu.train.ppo_batched import BatchedPpo, PpoConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_dp_train_step_over_8_devices():
    env = CartPole(CartPoleParams(reset_frame_nb=2))
    trainer = BatchedPpo(
        env, PpoConfig(hidden_size=16, horizon=4, epoch=2, n_envs=16), seed=0
    )
    mesh = make_env_mesh(jax.devices()[:8])
    with mesh:
        step, state = make_sharded_train_step(trainer, mesh)
        # env batch is sharded over the mesh axis; params replicated
        assert len(state.obs.sharding.device_set) == 8
        assert len(jax.tree.leaves(state.actor_params)[0].sharding.device_set) == 8
        state, metrics = step(state)
        jax.block_until_ready(state)
    assert not np.isnan(float(metrics.actor_loss))
    assert int(state.iteration) == 1


def test_dp_matches_single_device():
    """The sharded step computes the same update as the unsharded step."""
    env = CartPole(CartPoleParams(reset_frame_nb=2))
    trainer = BatchedPpo(
        env, PpoConfig(hidden_size=8, horizon=4, epoch=1, n_envs=16), seed=3
    )
    step = jax.jit(trainer.train_step_fn())
    ref_state, ref_metrics = step(trainer.init())

    mesh = make_env_mesh(jax.devices()[:8])
    with mesh:
        sharded = shard_train_state(trainer.init(), mesh)
        out_state, out_metrics = step(sharded)
        jax.block_until_ready(out_state)

    np.testing.assert_allclose(
        float(ref_metrics.actor_loss), float(out_metrics.actor_loss), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.actor_params), jax.tree.leaves(out_state.actor_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
