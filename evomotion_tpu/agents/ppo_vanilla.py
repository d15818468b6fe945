"""Single-step-buffer PPO (no GAE, no mask).

Reference: evo_motion_networks/src/agents/ppo_vanilla.cpp. One-step advantage
r + gamma(1-d)V(s') - V(s), normalized (unbiased std); "old" log-prob
recomputed from the current actor at train start (ppo_vanilla.cpp:88-90);
train_every = batch_size; epochs of clipped surrogate + entropy, critic MSE
to target = advantages + V(s). No grad clipping.
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


class PpoVanillaAgent(Agent):
    def __init__(
        self, seed, state_space, action_space, hidden_size, gamma, epsilon,
        entropy_factor, critic_loss_factor, epoch, batch_size, learning_rate,
    ):
        key = jax.random.PRNGKey(seed)
        ka, kc, self._key = jax.random.split(key, 3)
        self.actor_params = actor_init(ka, state_space, action_space, hidden_size)
        self.critic_params = critic_init(kc, state_space, hidden_size)
        self.actor_opt = optax.adam(learning_rate)
        self.critic_opt = optax.adam(learning_rate)
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)

        self.gamma, self.epsilon = gamma, epsilon
        self.entropy_factor, self.critic_loss_factor = entropy_factor, critic_loss_factor
        self.epoch, self.batch_size = epoch, batch_size
        self.train_every = batch_size  # ppo_vanilla.cpp:27
        self.replay_buffer = ReplayBuffer(batch_size, seed)
        self.curr_train_step = 0
        self.curr_episode_step = 0
        self.global_curr_step = 0
        self.actor_loss_meter = LossMeter("actor_loss", 64)
        self.critic_loss_meter = LossMeter("critic_loss", 64)
        self.episode_steps_meter = LossMeter("steps", 64)

        @jax.jit
        def _act(actor_params, key, state):
            mu, sigma = actor_apply(actor_params, state)
            return D.truncated_normal_sample(key, mu, sigma)

        self._act_fn = _act
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma, eps = self.gamma, self.epsilon
        ef, clf = self.entropy_factor, self.critic_loss_factor

        def train(
            actor_params, actor_opt_state, critic_params, critic_opt_state,
            states, actions, rewards, dones, next_states,
        ):
            curr_values = critic_apply(critic_params, states)
            next_values = critic_apply(critic_params, next_states)
            advantages = rewards + (1.0 - dones) * gamma * next_values - curr_values
            advantages = (advantages - advantages.mean()) / (
                advantages.std(ddof=1) + 1e-8
            )
            target = advantages + curr_values

            old_mu, old_sigma = actor_apply(actor_params, states)
            old_log_prob = D.truncated_normal_log_pdf(actions, old_mu, old_sigma)

            def epoch_step(carry, _):
                a_params, a_opt, c_params, c_opt = carry

                def actor_loss_fn(ap):
                    mu, sigma = actor_apply(ap, states)
                    log_prob = D.truncated_normal_log_pdf(actions, mu, sigma)
                    entropy = D.truncated_normal_entropy(mu, sigma)
                    ratios = jnp.exp(log_prob - old_log_prob)
                    s1 = ratios * advantages
                    s2 = jnp.clip(ratios, 1.0 - eps, 1.0 + eps) * advantages
                    return -jnp.mean(jnp.sum(jnp.minimum(s1, s2) + ef * entropy, -1))

                a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(a_params)
                a_updates, a_opt = self.actor_opt.update(a_grads, a_opt, a_params)
                a_params = optax.apply_updates(a_params, a_updates)

                def critic_loss_fn(cp):
                    value = critic_apply(cp, states)
                    return clf * jnp.mean((value - target) ** 2)

                c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(c_params)
                c_updates, c_opt = self.critic_opt.update(c_grads, c_opt, c_params)
                c_params = optax.apply_updates(c_params, c_updates)
                return (a_params, a_opt, c_params, c_opt), (a_loss, c_loss)

            (actor_params, actor_opt_state, critic_params, critic_opt_state), losses = (
                jax.lax.scan(
                    epoch_step,
                    (actor_params, actor_opt_state, critic_params, critic_opt_state),
                    None,
                    length=self.epoch,
                )
            )
            return actor_params, actor_opt_state, critic_params, critic_opt_state, losses

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

    def _batch(self, steps):
        states = jnp.stack([s.state for s in steps])
        actions = jnp.stack([s.action for s in steps])
        rewards = jnp.asarray([[s.reward] for s in steps], dtype=jnp.float32)
        dones = jnp.asarray([[1.0 if s.done else 0.0] for s in steps], dtype=jnp.float32)
        next_states = jnp.stack([s.next_state for s in steps])
        return states, actions, rewards, dones, next_states

    def _check_train(self):
        if not (
            self.global_curr_step % self.train_every == self.train_every - 1
            and self.replay_buffer.has_enough(self.batch_size)
        ):
            return
        batch = self._batch(self.replay_buffer.sample(self.batch_size))
        (
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state,
            (a_losses, c_losses),
        ) = self._train_fn(
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state, *batch,
        )
        for al, cl in zip(np.asarray(a_losses), np.asarray(c_losses)):
            self.actor_loss_meter.add(float(al))
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
        return [self.actor_loss_meter, self.critic_loss_meter, self.episode_steps_meter]

    def set_eval(self, eval_mode):
        pass

    def count_parameters(self):
        return count_parameters(self.actor_params) + count_parameters(self.critic_params)
