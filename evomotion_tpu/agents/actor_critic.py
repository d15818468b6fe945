"""A2C-style TD actor-critic.

Reference: evo_motion_networks/src/agents/actor_critic.cpp. Critic target =
batch-normalized reward + gamma(1-d)V(s') (critic updated first); policy loss
= log_prob * TD-advantage with a decayed entropy bonus. The reference's
advantage is unsqueezed to [B,1,1] against log_prob [B,A], which broadcasts
to an outer-product [B,B,A] weighting (actor_critic.cpp:104-107) — replicated
as-is, since the training dynamics are part of the behavioral contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..buffers.replay import EpisodeStep, ReplayBuffer
from ..networks import distributions as D
from ..networks.modules import (
    actor_apply, actor_init, count_parameters, critic_apply, critic_init,
)
from ..train.checkpoint import load_component, save_component
from ..train.metrics import LossMeter
from .base import Agent


class ActorCriticAgent(Agent):
    def __init__(
        self, seed, state_space, action_space, hidden_size, batch_size,
        learning_rate, gamma, entropy_start_factor, entropy_end_factor,
        entropy_steps, replay_buffer_size, train_every,
    ):
        key = jax.random.PRNGKey(seed)
        ka, kc, self._key = jax.random.split(key, 3)
        self.actor_params = actor_init(ka, state_space, action_space, hidden_size)
        self.critic_params = critic_init(kc, state_space, hidden_size)
        self.actor_opt = optax.adam(learning_rate)
        self.critic_opt = optax.adam(learning_rate)
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)

        self.gamma = gamma
        self.entropy_start_factor = entropy_start_factor
        self.entropy_end_factor = entropy_end_factor
        self.entropy_steps = entropy_steps
        self.batch_size, self.train_every = batch_size, train_every
        self.replay_buffer = ReplayBuffer(replay_buffer_size, seed)
        self.curr_train_step = 0
        self.curr_episode_step = 0
        self.global_curr_step = 0
        self.policy_loss_meter = LossMeter("policy", 64)
        self.entropy_meter = LossMeter("entropy", 64)
        self.critic_loss_meter = LossMeter("critic", 64)
        self.episode_steps_meter = LossMeter("steps", 64)

        @jax.jit
        def _act(actor_params, key, state):
            mu, sigma = actor_apply(actor_params, state)
            return D.truncated_normal_sample(key, mu, sigma)

        self._act_fn = _act
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma = self.gamma

        def train(
            actor_params, actor_opt_state, critic_params, critic_opt_state,
            states, actions, rewards, dones, next_states, entropy_factor,
        ):
            next_value = critic_apply(critic_params, next_states)
            value = critic_apply(critic_params, states)
            norm_reward = (rewards - rewards.mean()) / (rewards.std(ddof=1) + 1e-8)
            target = norm_reward + (1.0 - dones) * gamma * next_value

            def critic_loss_fn(cp):
                return jnp.mean((critic_apply(cp, states) - target) ** 2)

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(critic_params)
            c_updates, critic_opt_state = self.critic_opt.update(
                c_grads, critic_opt_state, critic_params
            )
            critic_params = optax.apply_updates(critic_params, c_updates)

            advantage = jax.lax.stop_gradient(target - value)[..., None]  # [B,1,1]

            def actor_loss_fn(ap):
                mu, sigma = actor_apply(ap, states)
                log_prob = D.truncated_normal_log_pdf(actions, mu, sigma)
                policy_entropy = D.truncated_normal_entropy(mu, sigma) * entropy_factor
                # reference broadcast quirk: [B,A] * [B,1,1] -> [B,B,A]
                policy_loss = log_prob * advantage
                actor_loss = -jnp.mean(jnp.sum(policy_loss + policy_entropy, -1))
                return actor_loss, (policy_loss, policy_entropy)

            (a_loss, (policy_loss, policy_entropy)), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(actor_params)
            a_updates, actor_opt_state = self.actor_opt.update(
                a_grads, actor_opt_state, actor_params
            )
            actor_params = optax.apply_updates(actor_params, a_updates)

            policy_metric = -policy_loss.sum(-1).mean()
            entropy_metric = -policy_entropy.sum(-1).mean()
            return (
                actor_params, actor_opt_state, critic_params, critic_opt_state,
                (policy_metric, entropy_metric, c_loss),
            )

        return train

    def act(self, state, reward):
        state = jnp.asarray(state)
        self._key, sub = jax.random.split(self._key)
        action = self._act_fn(self.actor_params, sub, state)
        if not self.replay_buffer.empty():
            self.replay_buffer.update_last(reward=reward, next_state=state, done=False)
        self.replay_buffer.add(EpisodeStep(state, action, 0.0, False, state))
        self._check_train()
        self.curr_episode_step += 1
        self.global_curr_step += 1
        return action

    def done(self, state, reward):
        self.replay_buffer.update_last(reward=reward, next_state=jnp.asarray(state), done=True)
        self.episode_steps_meter.add(float(self.curr_episode_step))
        self.curr_episode_step = 0

    def _check_train(self):
        if not (
            self.global_curr_step % self.train_every == self.train_every - 1
            and self.replay_buffer.has_enough(self.batch_size)
        ):
            return
        steps = self.replay_buffer.sample(self.batch_size)
        states = jnp.stack([s.state for s in steps])
        actions = jnp.stack([s.action for s in steps])
        rewards = jnp.asarray([[s.reward] for s in steps], dtype=jnp.float32)
        dones = jnp.asarray([[1.0 if s.done else 0.0] for s in steps], dtype=jnp.float32)
        next_states = jnp.stack([s.next_state for s in steps])
        ef = float(
            D.exponential_decrease(
                self.curr_train_step, self.entropy_steps,
                self.entropy_start_factor, self.entropy_end_factor,
            )
        )
        (
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state,
            (pm, em, cl),
        ) = self._train_fn(
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state,
            states, actions, rewards, dones, next_states, jnp.float32(ef),
        )
        self.policy_loss_meter.add(float(pm))
        self.entropy_meter.add(float(em))
        self.critic_loss_meter.add(float(cl))
        self.curr_train_step += 1

    def save(self, output_folder_path):
        save_component(output_folder_path, "actor", self.actor_params)
        save_component(output_folder_path, "actor_optimizer", self.actor_opt_state)
        save_component(output_folder_path, "critic", self.critic_params)
        save_component(output_folder_path, "critic_optimizer", self.critic_opt_state)

    def load(self, input_folder_path):
        self.actor_params = load_component(input_folder_path, "actor", self.actor_params)
        self.actor_opt_state = load_component(
            input_folder_path, "actor_optimizer", self.actor_opt_state
        )
        self.critic_params = load_component(input_folder_path, "critic", self.critic_params)
        self.critic_opt_state = load_component(
            input_folder_path, "critic_optimizer", self.critic_opt_state
        )

    def get_metrics(self):
        return [
            self.policy_loss_meter, self.entropy_meter,
            self.critic_loss_meter, self.episode_steps_meter,
        ]

    def set_eval(self, eval_mode):
        pass

    def count_parameters(self):
        return count_parameters(self.actor_params) + count_parameters(self.critic_params)
