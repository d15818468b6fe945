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
    """Place a train state: env-batch FIELDS sharded, everything else
    replicated.

    Placement is by field name, not by a shape heuristic: every leaf of the
    fields named in ``_ENV_BATCH_FIELDS`` carries the env batch on dim 0 (they
    are produced by the vmapped env), so they shard along the mesh axis; all
    other fields (params, optimizer state, rng, counters, ring buffers) are
    replicated."""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    env_fields = set(_ENV_BATCH_FIELDS) & set(state._fields)
    placed = {}
    for name in state._fields:
        sh = batch_sharding if name in env_fields else replicated
        placed[name] = jax.tree.map(lambda l: jax.device_put(l, sh), getattr(state, name))
    return type(state)(**placed)


# train-state fields whose leaves carry the env batch on dim 0 (see
# PpoTrainState / OffPolicyTrainState)
_ENV_BATCH_FIELDS = ("env_state", "obs", "prev_valid", "ep_steps")


def make_sharded_train_step(trainer, mesh: Mesh, axis_name: str = "env"):
    """Jit the trainer's step with dp sharding over `axis_name`.

    Returns (jitted_step, placed_init_state)."""
    step = trainer.train_step_fn()
    jitted = jax.jit(step)

    def run(state):
        return jitted(state)

    init_state = shard_train_state(trainer.init(), mesh, axis_name)
    return run, init_state
