"""Environment layer: pure-functional batched envs.

Reference: ``Environment`` base (environment.h:35-97) with
``do_step(action) -> {state, reward, done}``, ``reset()``, factories with
string-keyed parameter maps (env_factory.cpp). TPU-native redesign:

- an env is a pure ``step(state, action) -> (state, StepResult)`` plus
  ``reset(key)``; batch = ``vmap``; everything jit/scan-compatible.
- the reference's blocking reset settle loops (e.g. 2x30 frames in
  robot_walk.cpp:76-104, 8 frames in cartpole.cpp:168-178) become a per-env
  *settling phase*: when an episode ends the env teleports (cheap, masked) and
  then spends the next N batch steps settling, emitting ``valid=False``
  transitions. Per-env physics timelines match the reference exactly; the
  batch never stalls. ``reset(key)`` (blocking, fori_loop settle) is also
  provided for the single-env parity tier.
"""

from __future__ import annotations

from typing import NamedTuple, Protocol

import jax.numpy as jnp


class StepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray  # scalar f32
    done: jnp.ndarray  # scalar bool
    valid: jnp.ndarray  # scalar bool: False while the env is settling
    # True on the done step iff the episode ended by reaching the win
    # horizon (the reference's win branch: cartpole.cpp:116, robot_walk.cpp
    # :64-69); False on fail terminations and non-terminal steps. Lets
    # trainers log win-rate / episode-length splits (train.cpp:67-78 shows
    # per-episode progress in the reference driver).
    win: jnp.ndarray


class Env(Protocol):
    """Structural env interface (see registry.make)."""

    observation_size: int
    action_size: int

    def reset(self, key): ...

    def step(self, state, action): ...


def get_value(parameters: dict[str, str], key: str, default):
    """Typed parameter lookup with defaults.

    Mirrors EnvironmentFactory::get_value (environment.h:86-96,
    env_factory.cpp:22-41): parse the string by the default's type."""
    if key not in parameters:
        return default
    raw = parameters[key]
    if isinstance(default, bool):
        if raw in ("true", "false"):
            return raw == "true"
        raise ValueError(raw)
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return raw
