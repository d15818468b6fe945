"""Batched PPO-GAE trainer with Liquid-Time-Constant (LTC) networks.

Reference counterpart: PpoGaeLiquidAgent
(evo_motion_networks/src/agents/ppo_gae_liquid.cpp) — the same PPO-GAE
algorithm as ppo_gae.cpp but with recurrent actor/critic (LTC cells,
liquid_cell.cpp:52-63) whose hidden states x_t are stored per step in the
replay buffer (replay_buffer.h:33-56) and replayed during training.

TPU-native redesign (mirrors ppo_batched.BatchedPpo): the rollout scan
carries the per-env hidden states [N, neurons] and emits the PRE-step x_t
into the trajectory, exactly like the reference buffers store the hidden
state the forward pass consumed. The update replays every (obs_t, x_t) pair
in parallel over [T, N] — no scan needed, because replay-from-stored-states
is teacher forcing (the reference's training forward passes read the stored
x_t, not a recomputed chain). Hidden states reset to the first state
(SiLU(0) = 0) on episode end (actor_critic_liquid.cpp:132-140) and freeze
across invalid settle frames, which in the reference never reach the agent.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..networks import distributions as D
from ..networks.liquid import (
    liquid_actor_apply,
    liquid_actor_init,
    liquid_cell_first_x,
    liquid_critic_apply,
    liquid_critic_init,
)
from .ppo_batched import PpoConfig, PpoMetrics, gae_and_normalize


@dataclasses.dataclass(frozen=True)
class PpoLiquidConfig(PpoConfig):
    neurons: int = 64  # reference key: neuron_number
    unfolding_steps: int = 6


class PpoLiquidTrainState(NamedTuple):
    actor_params: Any
    critic_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    env_state: Any
    obs: jnp.ndarray  # [N, S]
    actor_x: jnp.ndarray  # [N, neurons]
    critic_x: jnp.ndarray  # [N, neurons]
    key: jnp.ndarray
    iteration: jnp.ndarray
    ep_steps: jnp.ndarray  # [N] int32: valid steps in each env's open episode


class BatchedPpoLiquid:
    def __init__(self, env, config: PpoLiquidConfig = PpoLiquidConfig(),
                 seed: int = 1234):
        self.env = env
        self.config = config
        self.seed = seed
        self.actor_opt = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm),
            optax.adam(config.learning_rate),
        )
        self.critic_opt = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm),
            optax.adam(config.learning_rate),
        )

    def init(self, key=None) -> PpoLiquidTrainState:
        cfg = self.config
        key = jax.random.PRNGKey(self.seed) if key is None else key
        ka, kc, ke, key = jax.random.split(key, 4)
        actor_params = liquid_actor_init(
            ka, self.env.observation_size, self.env.action_size, cfg.neurons,
            cfg.unfolding_steps,
        )
        critic_params = liquid_critic_init(
            kc, self.env.observation_size, cfg.neurons, cfg.unfolding_steps
        )
        env_keys = jax.random.split(ke, cfg.n_envs)
        # jit the batched reset: eagerly it dispatches the settle fori_loop
        # op-by-op (minutes over a remote-TPU tunnel); one compile instead
        env_state, first = jax.jit(jax.vmap(self.env.reset))(env_keys)
        return PpoLiquidTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt_state=self.actor_opt.init(actor_params),
            critic_opt_state=self.critic_opt.init(critic_params),
            env_state=env_state,
            obs=first.obs,
            actor_x=liquid_cell_first_x(cfg.neurons, (cfg.n_envs,)),
            critic_x=liquid_cell_first_x(cfg.neurons, (cfg.n_envs,)),
            key=key,
            iteration=jnp.int32(0),
            ep_steps=jnp.zeros((cfg.n_envs,), jnp.int32),
        )

    def rollout_fn(self):
        env_step = jax.vmap(self.env.step)
        cfg = self.config
        u = cfg.unfolding_steps

        def rollout(state: PpoLiquidTrainState):
            def step(carry, key):
                env_state, obs, ax, cx, ep_steps = carry
                mu, sigma, new_ax = liquid_actor_apply(
                    state.actor_params, ax, obs, u
                )
                action = D.truncated_normal_sample(key, mu, sigma)
                log_prob = D.truncated_normal_log_pdf(action, mu, sigma)
                value, new_cx = liquid_critic_apply(
                    state.critic_params, cx, obs, u
                )
                env_state, res = env_step(env_state, action)
                # store the PRE-step hidden states (what the forward consumed);
                # advance only across valid frames; reset at episode end
                validf = res.valid[:, None].astype(jnp.float32)
                donef = res.done[:, None].astype(jnp.float32)
                nax = (1.0 - donef) * (validf * new_ax + (1.0 - validf) * ax)
                ncx = (1.0 - donef) * (validf * new_cx + (1.0 - validf) * cx)
                grown = ep_steps + res.valid.astype(jnp.int32)
                ended = res.done & res.valid
                done_len = jnp.where(ended, grown, 0)
                ep_steps = jnp.where(ended, 0, grown)
                out = (
                    obs, action, log_prob, value, res.reward, res.done,
                    res.valid, ax, cx, done_len, res.win & ended,
                )
                return (env_state, res.obs, nax, ncx, ep_steps), out

            keys = jax.random.split(state.key, cfg.horizon + 1)
            (env_state, last_obs, ax, cx, ep_steps), traj = jax.lax.scan(
                step, (state.env_state, state.obs, state.actor_x, state.critic_x,
                       state.ep_steps),
                keys[1:],
            )
            state = state._replace(
                env_state=env_state, obs=last_obs, actor_x=ax, critic_x=cx,
                key=keys[0], ep_steps=ep_steps,
            )
            return state, traj

        return rollout

    def train_step_fn(self):
        cfg = self.config
        u = cfg.unfolding_steps
        rollout = self.rollout_fn()

        def train_step(state: PpoLiquidTrainState):
            state, traj = rollout(state)
            (obs, actions, log_probs, values, rewards, dones, valids,
             ax_traj, cx_traj, done_lens, wins) = traj

            bootstrap, _ = liquid_critic_apply(
                state.critic_params, state.critic_x, state.obs, u
            )
            advantages, returns, maskf, n = gae_and_normalize(
                cfg, values, rewards, dones, valids, bootstrap
            )
            n_act = n * actions.shape[-1]

            def epoch_step(carry, _):
                a_params, a_opt, c_params, c_opt = carry

                def actor_loss_fn(ap):
                    # replay from the stored hidden states, [T, N] in parallel
                    mu, sigma, _ = liquid_actor_apply(ap, ax_traj, obs, u)
                    lp = D.truncated_normal_log_pdf(actions, mu, sigma)
                    entropy = D.truncated_normal_entropy(mu, sigma)
                    ratios = jnp.exp(lp - log_probs)
                    s1 = ratios * advantages
                    s2 = jnp.clip(
                        ratios, 1.0 - cfg.epsilon, 1.0 + cfg.epsilon
                    ) * advantages
                    obj = jnp.minimum(s1, s2) + cfg.entropy_factor * entropy
                    return -(obj * maskf).sum() / n_act

                a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(a_params)
                au, a_opt = self.actor_opt.update(a_grads, a_opt, a_params)
                a_params = optax.apply_updates(a_params, au)

                def critic_loss_fn(cp):
                    v, _ = liquid_critic_apply(cp, cx_traj, obs, u)
                    return cfg.critic_loss_factor * (
                        ((v - returns) ** 2) * maskf
                    ).sum() / n

                c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(c_params)
                cu, c_opt = self.critic_opt.update(c_grads, c_opt, c_params)
                c_params = optax.apply_updates(c_params, cu)
                return (a_params, a_opt, c_params, c_opt), (a_loss, c_loss)

            (a_params, a_opt, c_params, c_opt), (a_losses, c_losses) = jax.lax.scan(
                epoch_step,
                (state.actor_params, state.actor_opt_state,
                 state.critic_params, state.critic_opt_state),
                None,
                length=cfg.epoch,
            )
            state = state._replace(
                actor_params=a_params,
                actor_opt_state=a_opt,
                critic_params=c_params,
                critic_opt_state=c_opt,
                iteration=state.iteration + 1,
            )
            n_done = dones.sum()
            n_ended = jnp.maximum((done_lens > 0).sum(), 1)
            metrics = PpoMetrics(
                actor_loss=a_losses.mean(),
                critic_loss=c_losses.mean(),
                mean_reward=(rewards * maskf[..., 0]).sum() / n,
                episodes_done=n_done,
                mean_episode_return=(rewards * maskf[..., 0]).sum()
                / jnp.maximum(n_done, 1.0),
                mean_ep_len=done_lens.sum() / n_ended,
                win_rate=wins.sum() / n_ended,
            )
            return state, metrics

        return train_step
