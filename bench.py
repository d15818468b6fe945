#!/usr/bin/env python3
"""Throughput benchmark: batched robot_walk env-steps/s on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 100,000 env-steps/s/chip on batched
robot_walk under jit.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    solver = sys.argv[3] if len(sys.argv) > 3 else "pallas"

    import dataclasses

    from evomotion_tpu.envs.robot import RobotWalk

    env = RobotWalk()
    if jax.default_backend() != "tpu":
        solver = "xla"  # the fused kernel targets real TPUs
    env.model = dataclasses.replace(env.model, solver=solver)
    reset = jax.vmap(env.reset)
    step = jax.vmap(env.step)

    @jax.jit
    def rollout(state, keys):
        def body(carry, key):
            state = carry
            action = jax.random.uniform(
                key, (n_envs, env.action_size), minval=-1.0, maxval=1.0
            )
            state, res = step(state, action)
            return state, res.reward.sum()

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    state, _ = jax.jit(reset)(keys)
    jax.block_until_ready(state)

    roll_keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
    # compile + warmup
    s2, r = rollout(state, roll_keys)
    jax.block_until_ready(s2)

    t0 = time.perf_counter()
    s3, r = rollout(s2, roll_keys)
    jax.block_until_ready(s3)
    dt = time.perf_counter() - t0

    steps_per_s = n_envs * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "robot_walk_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_s / 100_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
