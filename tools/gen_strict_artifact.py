"""Generate the standing strict-Bullet-mode trajectory artifact.

VERDICT r3 #6: strict mode (engine.py divergence list — slip-aligned
friction, joint warm start, uncapped limit bias) needs a committed artifact
so future solver changes diff against the parity configuration instead of
only unit tests. This records a 256-step single-env robot_walk trajectory
(fixed seed, deterministic action stream) on CPU into
tests/goldens/strict_walk.npz; tests/test_physics_golden.py replays it.

Regenerate (CPU for determinism):
    python tools/gen_strict_artifact.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.robot import RobotWalkFactory

STEPS = 256
SEED = 1234
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "strict_walk.npz")


def run_strict_trajectory():
    env = RobotWalkFactory({"reset_frames": "30"}).make(SEED, mt_parity=True)
    env.model = dataclasses.replace(env.model, strict_bullet=True, solver="xla")
    state, res = jax.jit(env.reset)(jax.random.PRNGKey(SEED))

    def body(carry, key):
        state = carry
        action = jax.random.uniform(
            key, (env.action_size,), minval=-1.0, maxval=1.0
        )
        state, res = env.step(state, action)
        return state, (state.physics.pos, state.physics.quat, res.reward)

    keys = jax.random.split(jax.random.PRNGKey(SEED + 1), STEPS)
    _, (pos, quat, rew) = jax.jit(
        lambda s: jax.lax.scan(body, s, keys)
    )(state)
    return np.asarray(pos), np.asarray(quat), np.asarray(rew)


if __name__ == "__main__":
    pos, quat, rew = run_strict_trajectory()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, pos=pos.astype(np.float32),
                        quat=quat.astype(np.float32),
                        reward=rew.astype(np.float32), steps=STEPS, seed=SEED)
    print(f"wrote {OUT}: pos {pos.shape}, reward mean {rew.mean():.6f}")
