"""Agent interface — reference-parity tier.

Reference: evo_motion_networks/include/evo_motion_networks/agent.h:16-36.
`act(state, reward) -> action` and `done(state, reward)` drive the same
one-step-late reward bookkeeping as the reference (the reward for action a_t
arrives with the next call and is patched into the replay buffer via
update_last). `to(device)` is kept for API parity; with jax, placement is
managed by the runtime.

This tier runs one env sequentially (what the reference does); the batched
TPU training tier lives in evomotion_tpu/train.
"""

from __future__ import annotations

import abc

import jax.numpy as jnp

from ..train.metrics import LossMeter


class Agent(abc.ABC):
    @abc.abstractmethod
    def act(self, state: jnp.ndarray, reward: float) -> jnp.ndarray: ...

    @abc.abstractmethod
    def done(self, state: jnp.ndarray, reward: float) -> None: ...

    @abc.abstractmethod
    def save(self, output_folder_path: str) -> None: ...

    @abc.abstractmethod
    def load(self, input_folder_path: str) -> None: ...

    @abc.abstractmethod
    def get_metrics(self) -> list[LossMeter]: ...

    def to(self, device) -> None:  # API parity; jax manages placement
        pass

    @abc.abstractmethod
    def set_eval(self, eval_mode: bool) -> None: ...

    @abc.abstractmethod
    def count_parameters(self) -> int: ...
