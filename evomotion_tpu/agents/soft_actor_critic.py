"""Soft Actor-Critic with twin Q + twin target Q and learned temperature.

Reference: evo_motion_networks/src/agents/soft_actor_critic.cpp. Target nets
hard-copied at init (:41-42); target entropy = -action_dim (:31); per epoch a
fresh batch; target y = r + gamma(1-d)[min(Qbar1,Qbar2) - alpha*logpi(a')]
(:98-116); two critic MSE updates; actor loss E[alpha*logpi - min(Q1,Q2)]
through the *updated* critics (:135-149); alpha loss
-E[log_alpha * (logpi + H_target)] (:152-157); Polyak tau soft-update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..buffers.replay import EpisodeStep, ReplayBuffer
from ..networks import distributions as D
from ..networks.modules import (
    actor_apply, actor_init, count_parameters, q_net_apply, q_net_init, soft_update,
)
from ..train.checkpoint import load_component, save_component
from ..train.metrics import LossMeter
from .base import Agent


class SoftActorCriticAgent(Agent):
    def __init__(
        self, seed, state_space, action_space, actor_hidden_size, critic_hidden_size,
        batch_size, epoch, learning_rate, gamma, tau, replay_buffer_size, train_every,
        grad_norm_clip=None,
    ):
        # optional stability knob (no reference counterpart; see cross_q.py)
        key = jax.random.PRNGKey(seed)
        ka, k1, k2, self._key = jax.random.split(key, 4)
        self.actor_params = actor_init(ka, state_space, action_space, actor_hidden_size)
        self.critic_1_params = q_net_init(k1, state_space, action_space, critic_hidden_size)
        self.critic_2_params = q_net_init(k2, state_space, action_space, critic_hidden_size)
        # hard_update at init (soft_actor_critic.cpp:41-42)
        self.target_critic_1_params = jax.tree.map(lambda x: x, self.critic_1_params)
        self.target_critic_2_params = jax.tree.map(lambda x: x, self.critic_2_params)
        # EntropyParameter(1.f, 1): alpha starts at 1 -> log_alpha = 0
        self.entropy_params = {"log_alpha": jnp.zeros((1,))}

        adam = lambda: (
            optax.adam(learning_rate)
            if grad_norm_clip is None
            else optax.chain(
                optax.clip_by_global_norm(grad_norm_clip),
                optax.adam(learning_rate),
            )
        )
        self.actor_opt = adam()
        self.critic_1_opt = adam()
        self.critic_2_opt = adam()
        self.entropy_opt = adam()
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_1_opt_state = self.critic_1_opt.init(self.critic_1_params)
        self.critic_2_opt_state = self.critic_2_opt.init(self.critic_2_params)
        self.entropy_opt_state = self.entropy_opt.init(self.entropy_params)

        self.target_entropy = -float(action_space)
        self.gamma, self.tau = gamma, tau
        self.batch_size, self.epoch, self.train_every = batch_size, epoch, train_every
        self.replay_buffer = ReplayBuffer(replay_buffer_size, seed)
        self.curr_episode_step = 0
        self.curr_train_step = 0
        self.global_curr_step = 0

        self.actor_loss_meter = LossMeter("actor", 64)
        self.critic_1_loss_meter = LossMeter("critic_1", 64)
        self.critic_2_loss_meter = LossMeter("critic_2", 64)
        self.entropy_loss_meter = LossMeter("entropy", 64)
        self.episode_steps_meter = LossMeter("steps", 64)
        self.rewards_meter = LossMeter("rewards", 64)

        @jax.jit
        def _act(actor_params, key, state):
            mu, sigma = actor_apply(actor_params, state)
            return D.truncated_normal_sample(key, mu, sigma)

        self._act_fn = _act
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma, tau, h_target = self.gamma, self.tau, self.target_entropy

        def train(carry, key, states, actions, rewards, dones, next_states):
            (
                actor_params, actor_opt_state,
                c1, c1_opt, c2, c2_opt, t1, t2,
                ent_params, ent_opt_state,
            ) = carry
            k_next, k_curr = jax.random.split(key)

            # target q (no grad)
            next_mu, next_sigma = actor_apply(actor_params, next_states)
            next_action = D.truncated_normal_sample(k_next, next_mu, next_sigma)
            next_log_proba = D.truncated_normal_log_pdf(
                next_action, next_mu, next_sigma
            ).sum(-1, keepdims=True)
            ntq1 = q_net_apply(t1, next_states, next_action)
            ntq2 = q_net_apply(t2, next_states, next_action)
            alpha = jnp.exp(ent_params["log_alpha"])
            target_v = jnp.minimum(ntq1, ntq2) - alpha * next_log_proba
            target_q = jax.lax.stop_gradient(rewards + (1.0 - dones) * gamma * target_v)

            def c1_loss_fn(p):
                return jnp.mean((q_net_apply(p, states, actions) - target_q) ** 2)

            c1_loss, g = jax.value_and_grad(c1_loss_fn)(c1)
            u, c1_opt = self.critic_1_opt.update(g, c1_opt, c1)
            c1 = optax.apply_updates(c1, u)

            def c2_loss_fn(p):
                return jnp.mean((q_net_apply(p, states, actions) - target_q) ** 2)

            c2_loss, g = jax.value_and_grad(c2_loss_fn)(c2)
            u, c2_opt = self.critic_2_opt.update(g, c2_opt, c2)
            c2 = optax.apply_updates(c2, u)

            # policy (through updated critics)
            def actor_loss_fn(ap):
                mu, sigma = actor_apply(ap, states)
                action = D.truncated_normal_sample(k_curr, mu, sigma)
                log_proba = D.truncated_normal_log_pdf(action, mu, sigma).sum(-1, keepdims=True)
                q = jnp.minimum(
                    q_net_apply(c1, states, action), q_net_apply(c2, states, action)
                )
                loss = jnp.mean(jax.lax.stop_gradient(alpha) * log_proba - q)
                return loss, log_proba

            (a_loss, log_proba), g = jax.value_and_grad(actor_loss_fn, has_aux=True)(
                actor_params
            )
            u, actor_opt_state = self.actor_opt.update(g, actor_opt_state, actor_params)
            actor_params = optax.apply_updates(actor_params, u)

            # temperature
            def ent_loss_fn(ep):
                return -jnp.mean(
                    ep["log_alpha"] * (jax.lax.stop_gradient(log_proba) + h_target)
                )

            e_loss, g = jax.value_and_grad(ent_loss_fn)(ent_params)
            u, ent_opt_state = self.entropy_opt.update(g, ent_opt_state, ent_params)
            ent_params = optax.apply_updates(ent_params, u)

            # Polyak
            t1 = soft_update(t1, c1, tau)
            t2 = soft_update(t2, c2, tau)

            carry = (
                actor_params, actor_opt_state, c1, c1_opt, c2, c2_opt, t1, t2,
                ent_params, ent_opt_state,
            )
            return carry, (a_loss, c1_loss, c2_loss, e_loss)

        return train

    def _carry(self):
        return (
            self.actor_params, self.actor_opt_state,
            self.critic_1_params, self.critic_1_opt_state,
            self.critic_2_params, self.critic_2_opt_state,
            self.target_critic_1_params, self.target_critic_2_params,
            self.entropy_params, self.entropy_opt_state,
        )

    def _uncarry(self, carry):
        (
            self.actor_params, self.actor_opt_state,
            self.critic_1_params, self.critic_1_opt_state,
            self.critic_2_params, self.critic_2_opt_state,
            self.target_critic_1_params, self.target_critic_2_params,
            self.entropy_params, self.entropy_opt_state,
        ) = carry

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
        self.rewards_meter.add(reward)
        self.episode_steps_meter.add(float(self.curr_episode_step))
        self.curr_episode_step = 0

    def _check_train(self):
        if not (
            self.global_curr_step % self.train_every == self.train_every - 1
            and self.replay_buffer.has_enough(self.batch_size)
        ):
            return
        for _ in range(self.epoch):
            steps = self.replay_buffer.sample(self.batch_size)
            states = jnp.stack([s.state for s in steps])
            actions = jnp.stack([s.action for s in steps])
            rewards = jnp.asarray([[s.reward] for s in steps], dtype=jnp.float32)
            dones = jnp.asarray(
                [[1.0 if s.done else 0.0] for s in steps], dtype=jnp.float32
            )
            next_states = jnp.stack([s.next_state for s in steps])
            self._key, sub = jax.random.split(self._key)
            carry, (a, c1, c2, e) = self._train_fn(
                self._carry(), sub, states, actions, rewards, dones, next_states
            )
            self._uncarry(carry)
            self.actor_loss_meter.add(float(a))
            self.critic_1_loss_meter.add(float(c1))
            self.critic_2_loss_meter.add(float(c2))
            self.entropy_loss_meter.add(float(e))
            self.curr_train_step += 1

    def save(self, folder):
        save_component(folder, "actor", self.actor_params)
        save_component(folder, "actor_optimizer", self.actor_opt_state)
        save_component(folder, "critic_1", self.critic_1_params)
        save_component(folder, "target_critic_1", self.target_critic_1_params)
        save_component(folder, "critic_1_optimizer", self.critic_1_opt_state)
        save_component(folder, "critic_2", self.critic_2_params)
        save_component(folder, "target_critic_2", self.target_critic_2_params)
        save_component(folder, "critic_2_optimizer", self.critic_2_opt_state)
        save_component(folder, "entropy", self.entropy_params)
        save_component(folder, "entropy_optimizer", self.entropy_opt_state)

    def load(self, folder):
        self.actor_params = load_component(folder, "actor", self.actor_params)
        self.actor_opt_state = load_component(folder, "actor_optimizer", self.actor_opt_state)
        self.critic_1_params = load_component(folder, "critic_1", self.critic_1_params)
        self.target_critic_1_params = load_component(
            folder, "target_critic_1", self.target_critic_1_params
        )
        self.critic_1_opt_state = load_component(
            folder, "critic_1_optimizer", self.critic_1_opt_state
        )
        self.critic_2_params = load_component(folder, "critic_2", self.critic_2_params)
        self.target_critic_2_params = load_component(
            folder, "target_critic_2", self.target_critic_2_params
        )
        self.critic_2_opt_state = load_component(
            folder, "critic_2_optimizer", self.critic_2_opt_state
        )
        self.entropy_params = load_component(folder, "entropy", self.entropy_params)
        self.entropy_opt_state = load_component(
            folder, "entropy_optimizer", self.entropy_opt_state
        )

    def get_metrics(self):
        return [
            self.actor_loss_meter, self.critic_1_loss_meter, self.critic_2_loss_meter,
            self.entropy_loss_meter, self.episode_steps_meter, self.rewards_meter,
        ]

    def set_eval(self, eval_mode):
        pass

    def count_parameters(self):
        return (
            count_parameters(self.actor_params)
            + count_parameters(self.critic_1_params)
            + count_parameters(self.critic_2_params)
            + count_parameters(self.target_critic_1_params)
            + count_parameters(self.target_critic_2_params)
            + count_parameters(self.entropy_params)
        )
