"""Device-mesh sharding of the batched training step.

The reference has NO multi-device story (SURVEY §2.5: its only parallelism is
Bullet's intra-process thread pool plus optional single-GPU offload). This
module is the TPU-native scale-out the rebuild adds: data-parallel over the
env batch.

Design (scaling-book recipe): one mesh axis ``env``; environment state,
observations, and per-env rng keys are sharded along it; network params and
optimizer state are replicated. The jitted train step is annotated with
in/out shardings — XLA propagates the layout through the rollout scan and
inserts the cross-chip psum for the gradient reduction (the loss mean over
the env axis), riding ICI. No hand-written collectives required for dp; the
engine's physics step is purely elementwise over envs so it shards for free.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host process group (jax.distributed).

    Reference has no multi-process story (single process always, SURVEY §2.5);
    this is the TPU-native scale-out entry: each host contributes its local
    chips to the global mesh, env shards stay host-local, and gradient psum
    rides ICI within a slice / DCN across slices. On single-host runs this is
    a no-op (call only when spanning hosts)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_env_mesh(devices=None, axis_name: str = "env") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis_name,))


def shard_train_state(state, mesh: Mesh, axis_name: str = "env"):
    """Place a PpoTrainState: env-batch leaves sharded, params replicated."""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    n_env = state.obs.shape[0]

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n_env:
            return jax.device_put(leaf, batch_sharding)
        return jax.device_put(leaf, replicated)

    env_state = jax.tree.map(place, state.env_state)
    return state._replace(
        env_state=env_state,
        obs=jax.device_put(state.obs, batch_sharding),
        actor_params=jax.device_put(state.actor_params, replicated),
        critic_params=jax.device_put(state.critic_params, replicated),
        actor_opt_state=jax.device_put(state.actor_opt_state, replicated),
        critic_opt_state=jax.device_put(state.critic_opt_state, replicated),
        key=jax.device_put(state.key, replicated),
        iteration=jax.device_put(state.iteration, replicated),
    )


def make_sharded_train_step(trainer, mesh: Mesh, axis_name: str = "env"):
    """Jit the trainer's step with dp sharding over `axis_name`.

    Returns (jitted_step, placed_init_state)."""
    step = trainer.train_step_fn()
    jitted = jax.jit(step)

    def run(state):
        return jitted(state)

    init_state = shard_train_state(trainer.init(), mesh, axis_name)
    return run, init_state
