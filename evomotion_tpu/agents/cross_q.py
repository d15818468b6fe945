"""CrossQ: SAC without target networks, BatchRenorm critics, joint-batch trick.

Reference: evo_motion_networks/src/agents/cross_q.cpp. Critics are
BatchNormQNetworkModule (BatchRenorm between all layers incl. input); the
joint-batch trick concatenates (s,a) with (s',a') into ONE training-mode
forward so the BN statistics cover both distributions, then chunks
(cross_q.cpp:52-65). The actor update runs the critics in eval mode (:93-98).
Adam beta1 = 0.5 everywhere (:19-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..buffers.replay import EpisodeStep, ReplayBuffer
from ..networks import distributions as D
from ..networks.modules import (
    actor_apply, actor_init, bn_q_net_apply, bn_q_net_init, count_parameters,
)
from ..train.checkpoint import load_component, save_component
from ..train.metrics import LossMeter
from .base import Agent


class CrossQAgent(Agent):
    def __init__(
        self, seed, state_space, action_space, actor_hidden_size, critic_hidden_size,
        batch_size, epoch, learning_rate, gamma, replay_buffer_size, train_every,
        grad_norm_clip=None,
    ):
        # grad_norm_clip: OPTIONAL training-stability knob with no reference
        # counterpart (the reference clips only its PPO agents). The r4
        # CrossQ walker run diverged at ~64M env-steps — critic loss 9.2 ->
        # NaN within 2 events (runs/walk_r4_crossq_s1234/curve.csv it
        # 3880-3920) — so long runs pass a clip here; None keeps reference
        # behavior.
        key = jax.random.PRNGKey(seed)
        ka, k1, k2, self._key = jax.random.split(key, 4)
        self.actor_params = actor_init(ka, state_space, action_space, actor_hidden_size)
        self.critic_1_params, self.critic_1_state = bn_q_net_init(
            k1, state_space, action_space, critic_hidden_size
        )
        self.critic_2_params, self.critic_2_state = bn_q_net_init(
            k2, state_space, action_space, critic_hidden_size
        )
        self.entropy_params = {"log_alpha": jnp.zeros((1,))}

        adam = lambda: (
            optax.adam(learning_rate, b1=0.5, b2=0.999)
            if grad_norm_clip is None
            else optax.chain(
                optax.clip_by_global_norm(grad_norm_clip),
                optax.adam(learning_rate, b1=0.5, b2=0.999),
            )
        )
        self.actor_opt, self.critic_1_opt = adam(), adam()
        self.critic_2_opt, self.entropy_opt = adam(), adam()
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_1_opt_state = self.critic_1_opt.init(self.critic_1_params)
        self.critic_2_opt_state = self.critic_2_opt.init(self.critic_2_params)
        self.entropy_opt_state = self.entropy_opt.init(self.entropy_params)

        self.target_entropy = -float(action_space)
        self.gamma = gamma
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
        self.reward_meter = LossMeter("rewards", 64)

        @jax.jit
        def _act(actor_params, key, state):
            mu, sigma = actor_apply(actor_params, state)
            return D.truncated_normal_sample(key, mu, sigma)

        self._act_fn = _act
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma, h_target = self.gamma, self.target_entropy

        def train(carry, key, states, actions, rewards, dones, next_states):
            (
                actor_params, actor_opt_state,
                c1, c1_state, c1_opt, c2, c2_state, c2_opt,
                ent_params, ent_opt_state,
            ) = carry
            k_next, k_curr = jax.random.split(key)

            next_mu, next_sigma = actor_apply(actor_params, next_states)
            next_action = jax.lax.stop_gradient(
                D.truncated_normal_sample(k_next, next_mu, next_sigma)
            )
            next_log_proba = D.truncated_normal_log_pdf(
                next_action, next_mu, next_sigma
            ).sum(-1, keepdims=True)

            cat_states = jnp.concatenate([states, next_states], 0)
            cat_actions = jnp.concatenate([actions, next_action], 0)
            alpha = jnp.exp(ent_params["log_alpha"])

            # critic 1 (training-mode BN over the joint batch)
            def c1_loss_fn(p, st):
                cat_q, new_st = bn_q_net_apply(p, st, cat_states, cat_actions, True)
                q, next_q = jnp.split(cat_q, 2, 0)
                return q, next_q, new_st

            # critic 2 forward shares the same structure
            q1, nq1, c1_state_new = c1_loss_fn(c1, c1_state)
            q2, nq2, c2_state_new = c1_loss_fn(c2, c2_state)
            target_v = jnp.minimum(nq1, nq2) - alpha * jax.lax.stop_gradient(next_log_proba)
            target_q = jax.lax.stop_gradient(rewards + (1.0 - dones) * gamma * target_v)

            def critic_loss(p, st):
                cat_q, new_st = bn_q_net_apply(p, st, cat_states, cat_actions, True)
                q, _ = jnp.split(cat_q, 2, 0)
                return jnp.mean((q - target_q) ** 2), new_st

            (c1_loss, c1_state), g = jax.value_and_grad(critic_loss, has_aux=True)(c1, c1_state)
            u, c1_opt = self.critic_1_opt.update(g, c1_opt, c1)
            c1 = optax.apply_updates(c1, u)

            (c2_loss, c2_state), g = jax.value_and_grad(critic_loss, has_aux=True)(c2, c2_state)
            u, c2_opt = self.critic_2_opt.update(g, c2_opt, c2)
            c2 = optax.apply_updates(c2, u)

            # actor (critics in eval mode, cross_q.cpp:93-98)
            def actor_loss_fn(ap):
                mu, sigma = actor_apply(ap, states)
                action = D.truncated_normal_sample(k_curr, mu, sigma)
                log_proba = D.truncated_normal_log_pdf(action, mu, sigma).sum(-1, keepdims=True)
                q1e, _ = bn_q_net_apply(c1, c1_state, states, action, False)
                q2e, _ = bn_q_net_apply(c2, c2_state, states, action, False)
                q = jnp.minimum(q1e, q2e)
                return jnp.mean(jax.lax.stop_gradient(alpha) * log_proba - q), log_proba

            (a_loss, log_proba), g = jax.value_and_grad(actor_loss_fn, has_aux=True)(
                actor_params
            )
            u, actor_opt_state = self.actor_opt.update(g, actor_opt_state, actor_params)
            actor_params = optax.apply_updates(actor_params, u)

            def ent_loss_fn(ep):
                return -jnp.mean(
                    ep["log_alpha"] * (jax.lax.stop_gradient(log_proba) + h_target)
                )

            e_loss, g = jax.value_and_grad(ent_loss_fn)(ent_params)
            u, ent_opt_state = self.entropy_opt.update(g, ent_opt_state, ent_params)
            ent_params = optax.apply_updates(ent_params, u)

            carry = (
                actor_params, actor_opt_state,
                c1, c1_state, c1_opt, c2, c2_state, c2_opt,
                ent_params, ent_opt_state,
            )
            return carry, (a_loss, c1_loss, c2_loss, e_loss)

        return train

    def _carry(self):
        return (
            self.actor_params, self.actor_opt_state,
            self.critic_1_params, self.critic_1_state, self.critic_1_opt_state,
            self.critic_2_params, self.critic_2_state, self.critic_2_opt_state,
            self.entropy_params, self.entropy_opt_state,
        )

    def _uncarry(self, carry):
        (
            self.actor_params, self.actor_opt_state,
            self.critic_1_params, self.critic_1_state, self.critic_1_opt_state,
            self.critic_2_params, self.critic_2_state, self.critic_2_opt_state,
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
        self.reward_meter.add(reward)
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
        save_component(folder, "critic_1_state", self.critic_1_state)
        save_component(folder, "critic_1_optimizer", self.critic_1_opt_state)
        save_component(folder, "critic_2", self.critic_2_params)
        save_component(folder, "critic_2_state", self.critic_2_state)
        save_component(folder, "critic_2_optimizer", self.critic_2_opt_state)
        save_component(folder, "entropy", self.entropy_params)
        save_component(folder, "entropy_optimizer", self.entropy_opt_state)

    def load(self, folder):
        self.actor_params = load_component(folder, "actor", self.actor_params)
        self.actor_opt_state = load_component(folder, "actor_optimizer", self.actor_opt_state)
        self.critic_1_params = load_component(folder, "critic_1", self.critic_1_params)
        self.critic_1_state = load_component(folder, "critic_1_state", self.critic_1_state)
        self.critic_1_opt_state = load_component(
            folder, "critic_1_optimizer", self.critic_1_opt_state
        )
        self.critic_2_params = load_component(folder, "critic_2", self.critic_2_params)
        self.critic_2_state = load_component(folder, "critic_2_state", self.critic_2_state)
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
            self.entropy_loss_meter, self.episode_steps_meter, self.reward_meter,
        ]

    def set_eval(self, eval_mode):
        pass  # train/eval handled explicitly inside the jitted update

    def count_parameters(self):
        return (
            count_parameters(self.actor_params)
            + count_parameters(self.critic_1_params)
            + count_parameters(self.critic_2_params)
            + count_parameters(self.entropy_params)
        )
