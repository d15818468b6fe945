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


def _offpolicy_trainer(algo, seed=3):
    from evomotion_tpu.train.offpolicy_batched import (
        BatchedOffPolicy,
        OffPolicyConfig,
    )

    env = CartPole(CartPoleParams(reset_frame_nb=2))
    cfg = OffPolicyConfig(
        actor_hidden_size=8, critic_hidden_size=8, batch_size=16, epoch=1,
        steps_per_iter=4, n_envs=16, buffer_capacity=64, train_every=1,
    )
    return BatchedOffPolicy(env, algo, cfg, seed=seed)


@pytest.mark.parametrize("algo", ["soft_actor_critic", "cross_q"])
def test_dp_offpolicy_train_step_over_8_devices(algo):
    """BatchedOffPolicy under a mesh: env batch sharded, params + ring
    replicated; the replicated ring receives identical writes on every
    device (the sharded rollout is all-gathered into it), so the sampled
    updates stay in lockstep (VERDICT r2 #6)."""
    from evomotion_tpu.parallel.mesh import make_env_mesh, make_sharded_train_step

    trainer = _offpolicy_trainer(algo)
    mesh = make_env_mesh(jax.devices()[:8])
    with mesh:
        step, state = make_sharded_train_step(trainer, mesh)
        assert len(state.obs.sharding.device_set) == 8
        for _ in range(3):  # ring fills, updates fire
            state, metrics = step(state)
        jax.block_until_ready(state)
    assert not np.isnan(float(metrics.actor_loss))
    assert int(state.iteration) == 3


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["soft_actor_critic", "cross_q"])
def test_dp_offpolicy_matches_single_device(algo):
    """The sharded off-policy step equals the unsharded step numerically.

    Slow-marked (~65 s for the pair): the default gate keeps the 8-device
    sharded-train-step smoke tests; this exact-equality pass runs with
    --runslow."""
    from evomotion_tpu.parallel.mesh import make_env_mesh, shard_train_state

    trainer = _offpolicy_trainer(algo)
    step = jax.jit(trainer.train_step_fn())
    ref_state = trainer.init()
    for _ in range(3):
        ref_state, ref_metrics = step(ref_state)

    mesh = make_env_mesh(jax.devices()[:8])
    with mesh:
        out_state = shard_train_state(trainer.init(), mesh)
        for _ in range(3):
            out_state, out_metrics = step(out_state)
        jax.block_until_ready(out_state)

    assert int(out_metrics.updates_done) > 0  # updates actually ran
    np.testing.assert_allclose(
        float(ref_metrics.actor_loss), float(out_metrics.actor_loss),
        rtol=1e-4, atol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.carry), jax.tree.leaves(out_state.carry)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="replicated agent carry diverged between dp and single",
        )
