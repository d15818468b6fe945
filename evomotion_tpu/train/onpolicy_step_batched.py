"""Batched step-buffer trainers: A2C (actor_critic) and PPO-vanilla.

Reference counterparts: ActorCriticAgent (actor_critic.cpp — stores steps in
a replay buffer, trains every `train_every` steps on a shuffled batch with a
decayed entropy bonus) and PpoVanillaAgent (ppo_vanilla.cpp — single-step
buffer, 1-step advantage, `epoch` clipped-surrogate epochs per batch).

TPU-native redesign mirroring offpolicy_batched.BatchedOffPolicy: N envs in
lockstep, one jitted iteration = rollout scan + (A2C) ring write + sampled
update events / (PPO-vanilla) epochs over the rollout block. The update math
is the sequential agents' own jitted train functions — one source of truth
for the losses including the reference's A2C [B,1,1]x[B,A] broadcast quirk
and PPO-vanilla's recomputed "old" log-prob at train start
(ppo_vanilla.cpp:88-90).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..networks import distributions as D
from ..networks.modules import actor_apply
from .offpolicy_batched import Ring


@dataclasses.dataclass(frozen=True)
class StepTrainerConfig:
    hidden_size: int = 256
    batch_size: int = 256
    learning_rate: float = 1e-3
    gamma: float = 0.99
    # A2C entropy schedule (reference exponential_decrease)
    entropy_start_factor: float = 0.01
    entropy_end_factor: float = 1e-4
    entropy_steps: int = 100000
    # PPO-vanilla
    epsilon: float = 0.2
    entropy_factor: float = 0.01
    critic_loss_factor: float = 0.5
    epoch: int = 8
    train_every: int = 1
    steps_per_iter: int = 64
    n_envs: int = 1024
    buffer_capacity: int = 262144  # A2C ring only


class StepTrainState(NamedTuple):
    carry: Any  # (actor_params, a_opt, critic_params, c_opt)
    ring: Any  # Ring for A2C; None-like zeros ring unused for ppo_vanilla
    env_state: Any
    obs: jnp.ndarray
    prev_valid: jnp.ndarray
    key: jnp.ndarray
    iteration: jnp.ndarray
    global_step: jnp.ndarray  # env-time steps, drives the entropy schedule


class StepTrainMetrics(NamedTuple):
    actor_loss: jnp.ndarray
    critic_loss: jnp.ndarray
    mean_reward: jnp.ndarray
    episodes_done: jnp.ndarray
    updates_done: jnp.ndarray


class BatchedStepTrainer:
    """algo: "actor_critic" or "ppo_vanilla"."""

    def __init__(self, env, algo: str, config: StepTrainerConfig = StepTrainerConfig(),
                 seed: int = 1234):
        self.env = env
        self.algo = algo
        cfg = config
        self.config = cfg
        self.seed = seed
        block = cfg.steps_per_iter * cfg.n_envs
        if algo == "actor_critic":
            from ..agents.actor_critic import ActorCriticAgent

            cap = max(cfg.buffer_capacity, block)
            self.capacity = ((cap + block - 1) // block) * block
            self.agent = ActorCriticAgent(
                seed, env.observation_size, env.action_size, cfg.hidden_size,
                cfg.batch_size, cfg.learning_rate, cfg.gamma,
                cfg.entropy_start_factor, cfg.entropy_end_factor,
                cfg.entropy_steps, replay_buffer_size=1,
                train_every=cfg.train_every,
            )
        elif algo == "ppo_vanilla":
            from ..agents.ppo_vanilla import PpoVanillaAgent

            self.capacity = block
            self.agent = PpoVanillaAgent(
                seed, env.observation_size, env.action_size, cfg.hidden_size,
                cfg.gamma, cfg.epsilon, cfg.entropy_factor,
                cfg.critic_loss_factor, cfg.epoch, cfg.batch_size,
                cfg.learning_rate,
            )
        else:
            raise ValueError(f"unsupported step-trainer algo: {algo}")
        self._update_fn = self.agent._make_train_fn()
        self.updates_per_iter = max(1, cfg.steps_per_iter // cfg.train_every)

    def _carry(self):
        a = self.agent
        return (a.actor_params, a.actor_opt_state, a.critic_params, a.critic_opt_state)

    def init(self, key=None) -> StepTrainState:
        cfg = self.config
        key = jax.random.PRNGKey(self.seed) if key is None else key
        ke, key = jax.random.split(key)
        env_keys = jax.random.split(ke, cfg.n_envs)
        # jit the batched reset: eagerly it dispatches the settle fori_loop
        # op-by-op (minutes over a remote-TPU tunnel); one compile instead
        env_state, first = jax.jit(jax.vmap(self.env.reset))(env_keys)
        s, a = self.env.observation_size, self.env.action_size
        cap = self.capacity
        ring = Ring(
            obs=jnp.zeros((cap, s)), action=jnp.zeros((cap, a)),
            reward=jnp.zeros((cap,)), done=jnp.zeros((cap,)),
            next_obs=jnp.zeros((cap, s)), valid=jnp.zeros((cap,)),
            cursor=jnp.int32(0), filled=jnp.int32(0),
        )
        return StepTrainState(
            carry=self._carry(),
            ring=ring,
            env_state=env_state,
            obs=first.obs,
            prev_valid=first.valid
            if first.valid.shape == (cfg.n_envs,)
            else jnp.ones((cfg.n_envs,), bool),
            key=key,
            iteration=jnp.int32(0),
            global_step=jnp.int32(0),
        )

    def _entropy_factor(self, global_step):
        cfg = self.config
        # exponential_decrease(start, end, steps, t) — functions.cpp
        frac = jnp.minimum(
            global_step.astype(jnp.float32) / max(cfg.entropy_steps, 1), 1.0
        )
        return cfg.entropy_start_factor * (
            cfg.entropy_end_factor / cfg.entropy_start_factor
        ) ** frac

    def train_step_fn(self):
        cfg = self.config
        env_step = jax.vmap(self.env.step)
        cap = self.capacity
        block = cfg.steps_per_iter * cfg.n_envs
        n_events = self.updates_per_iter
        update = self._update_fn
        algo = self.algo

        def rollout(carry, env_state, obs, prev_valid, key):
            actor_params = carry[0]

            def step(c, k):
                env_state, obs, prev_valid = c
                mu, sigma = actor_apply(actor_params, obs)
                action = D.truncated_normal_sample(k, mu, sigma)
                env_state, res = env_step(env_state, action)
                trainable = prev_valid & res.valid
                out = (obs, action, res.reward, res.done, res.obs,
                       trainable.astype(jnp.float32))
                return (env_state, res.obs, res.valid), out

            keys = jax.random.split(key, cfg.steps_per_iter)
            (env_state, obs, prev_valid), traj = jax.lax.scan(
                step, (env_state, obs, prev_valid), keys
            )
            return env_state, obs, prev_valid, traj

        def train_step(state: StepTrainState):
            key, k_roll, k_upd = jax.random.split(state.key, 3)
            env_state, obs, prev_valid, traj = rollout(
                state.carry, state.env_state, state.obs, state.prev_valid, k_roll
            )
            t_obs, t_act, t_rew, t_done, t_next, t_valid = jax.tree.map(
                lambda x: x.reshape((block,) + x.shape[2:]), traj
            )

            ef = self._entropy_factor(state.global_step)

            if algo == "ppo_vanilla":
                # the rollout block IS the batch (the reference's single-step
                # buffer holds exactly batch_size steps; epochs run inside
                # the agent's train fn)
                ap, ao, cp, co = state.carry
                ap, ao, cp, co, (a_l, c_l) = update(
                    ap, ao, cp, co, t_obs, t_act, t_rew[:, None],
                    t_done[:, None], t_next,
                )
                carry = (ap, ao, cp, co)
                a_loss, c_loss = a_l.mean(), c_l.mean()
                updates_done = jnp.int32(cfg.epoch)
                ring = state.ring
            else:
                # A2C: ring write + sampled update events, SAC-tier cadence
                ring = state.ring
                cur = ring.cursor
                upd = lambda buf, val: jax.lax.dynamic_update_slice_in_dim(
                    buf, val, cur, 0
                )
                ring = Ring(
                    obs=upd(ring.obs, t_obs), action=upd(ring.action, t_act),
                    reward=upd(ring.reward, t_rew),
                    done=upd(ring.done, t_done.astype(jnp.float32)),
                    next_obs=upd(ring.next_obs, t_next),
                    valid=upd(ring.valid, t_valid),
                    cursor=(cur + block) % cap,
                    filled=jnp.minimum(ring.filled + block, cap),
                )
                last = (ring.cursor - 1) % cap
                weights = ring.valid.at[last].set(0.0)
                cdf = jnp.cumsum(weights)
                total = cdf[-1]
                has_enough = total >= cfg.batch_size

                def do_updates(carry):
                    def one(c, k):
                        ap, ao, cp, co = c
                        u = jax.random.uniform(k, (cfg.batch_size,)) * total
                        idx = jnp.searchsorted(cdf, u, side="left")
                        ap, ao, cp, co, (p_l, e_l, c_l) = update(
                            ap, ao, cp, co, ring.obs[idx], ring.action[idx],
                            ring.reward[idx][:, None], ring.done[idx][:, None],
                            ring.next_obs[idx], ef,
                        )
                        return (ap, ao, cp, co), (p_l, c_l)

                    ks = jax.random.split(k_upd, n_events)
                    return jax.lax.scan(one, carry, ks)

                def no_updates(carry):
                    z = jnp.zeros((n_events,))
                    return carry, (z, z)

                carry, (a_ls, c_ls) = jax.lax.cond(
                    has_enough, do_updates, no_updates, state.carry
                )
                a_loss, c_loss = a_ls.mean(), c_ls.mean()
                updates_done = jnp.where(has_enough, n_events, 0)

            state = StepTrainState(
                carry=carry, ring=ring, env_state=env_state, obs=obs,
                prev_valid=prev_valid, key=key,
                iteration=state.iteration + 1,
                global_step=state.global_step + cfg.steps_per_iter,
            )
            nv = jnp.maximum(t_valid.sum(), 1.0)
            metrics = StepTrainMetrics(
                actor_loss=a_loss, critic_loss=c_loss,
                mean_reward=(t_rew * t_valid).sum() / nv,
                episodes_done=t_done.sum(),
                updates_done=updates_done,
            )
            return state, metrics

        return train_step

    def save(self, folder: str, state: StepTrainState) -> None:
        a = self.agent
        (a.actor_params, a.actor_opt_state, a.critic_params,
         a.critic_opt_state) = state.carry
        a.save(folder)
