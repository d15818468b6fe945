"""Debug agents: random and constant (no learning).

Reference: evo_motion_networks/src/agents/debug_agents.cpp. RandomAgent
returns uniform [-1, 1]; ConstantAgent a fixed value; both no-op on
done/save/load and report no metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Agent


class DebugAgent(Agent):
    def __init__(self, action_space: int):
        self.action_space = action_space

    def done(self, state, reward):
        pass

    def save(self, output_folder_path):
        pass

    def load(self, input_folder_path):
        pass

    def get_metrics(self):
        return []

    def set_eval(self, eval_mode):
        pass

    def count_parameters(self):
        return 0


class RandomAgent(DebugAgent):
    def __init__(self, action_space: int, seed: int = 0):
        super().__init__(action_space)
        self._key = jax.random.PRNGKey(seed)

    def act(self, state, reward):
        self._key, sub = jax.random.split(self._key)
        return 2.0 * jax.random.uniform(sub, (self.action_space,)) - 1.0


class ConstantAgent(DebugAgent):
    def __init__(self, action_space: int, action_value: float):
        super().__init__(action_space)
        self.action_value = action_value

    def act(self, state, reward):
        return jnp.ones((self.action_space,)) * self.action_value
