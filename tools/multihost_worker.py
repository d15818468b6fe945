"""Worker process for the multi-host (jax.distributed) smoke test.

Usage: python tools/multihost_worker.py <coordinator> <num_procs> <proc_id>

Each process brings up the jax.distributed runtime with 2 local virtual CPU
devices, builds the global env mesh, and runs one dp-sharded batched-PPO
train step on cartpole — the single-process dryrun's topology extended to a
real multi-process group (SURVEY §2.5 multi-host row). Prints PASS with the
global device count on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

from evomotion_tpu.parallel.mesh import (
    initialize_multihost,
    make_env_mesh,
    make_sharded_train_step,
)

initialize_multihost(
    coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
)

assert jax.process_count() == num_procs, jax.process_count()
n_global = len(jax.devices())
n_local = len(jax.local_devices())
assert n_global == num_procs * n_local, (n_global, n_local)

from evomotion_tpu.envs.cartpole import CartPole, CartPoleParams
from evomotion_tpu.train.ppo_batched import BatchedPpo, PpoConfig

mesh = make_env_mesh(jax.devices())
env = CartPole(CartPoleParams(reset_frame_nb=2))
trainer = BatchedPpo(
    env, PpoConfig(hidden_size=16, horizon=4, epoch=2, n_envs=2 * n_global), seed=0
)
with mesh:
    step, state = make_sharded_train_step(trainer, mesh)
    state, metrics = step(state)
    jax.block_until_ready(state)

loss = float(metrics.actor_loss)
assert loss == loss, "nan actor loss"
print(f"PASS process {proc_id}: {n_global} global devices, actor_loss {loss:.4f}")
