"""PPO with Generalized Advantage Estimation (trajectory-based).

Reference: evo_motion_networks/src/agents/ppo_gae.cpp. Semantics preserved:
- act (ppo_gae.cpp:29-45): sample truncated normal, store
  (s, a, 0, false, logpi, V, V) with the reward patched one step late;
- done (47-61): writes terminal V, triggers training at
  global_step % train_every == train_every-1 with >= batch_size complete
  trajectories, then opens a new trajectory;
- train (117-190): pad trajectories + validity mask (padding counts as done),
  GAE backward scan, advantage normalization over masked elements, `returns`
  built from the *normalized* advantages (reference quirk), `epoch` epochs of
  clipped surrogate + entropy bonus and critic MSE x critic_loss_factor, each
  with global-grad-norm clip then Adam.

The whole update (GAE + all epochs) runs as one jitted function with a scan
over epochs; trajectory padding is rounded up to a multiple of 32 to bound
recompilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..buffers.replay import PpoEpisodeStep, TrajectoryReplayBuffer
from ..networks import distributions as D
from ..networks.modules import (
    actor_apply,
    actor_init,
    count_parameters,
    critic_apply,
    critic_init,
)
from ..train.checkpoint import load_component, save_component
from ..train.metrics import LossMeter
from .base import Agent


class PpoGaeAgent(Agent):
    def __init__(
        self,
        seed: int,
        state_space: int,
        action_space: int,
        hidden_size: int,
        gamma: float,
        lam: float,
        epsilon: float,
        entropy_factor: float,
        critic_loss_factor: float,
        epoch: int,
        batch_size: int,
        train_every: int,
        replay_buffer_size: int,
        learning_rate: float,
        clip_grad_norm: float,
    ):
        key = jax.random.PRNGKey(seed)
        ka, kc, self._key = jax.random.split(key, 3)
        self.actor_params = actor_init(ka, state_space, action_space, hidden_size)
        self.critic_params = critic_init(kc, state_space, hidden_size)
        # torch: clip_grad_norm_ then Adam step (ppo_gae.cpp:171-186)
        self.actor_opt = optax.chain(
            optax.clip_by_global_norm(clip_grad_norm), optax.adam(learning_rate)
        )
        self.critic_opt = optax.chain(
            optax.clip_by_global_norm(clip_grad_norm), optax.adam(learning_rate)
        )
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)

        self.gamma, self.lam, self.epsilon = gamma, lam, epsilon
        self.entropy_factor = entropy_factor
        self.critic_loss_factor = critic_loss_factor
        self.epoch, self.batch_size, self.train_every = epoch, batch_size, train_every
        self.replay_buffer = TrajectoryReplayBuffer(replay_buffer_size, seed)
        self.curr_train_step = 0
        self.curr_episode_step = 0
        self.global_curr_step = 0

        self.actor_loss_meter = LossMeter("actor_loss", 64)
        self.critic_loss_meter = LossMeter("critic_loss", 64)
        self.episode_steps_meter = LossMeter("steps", 64)

        @jax.jit
        def _act(actor_params, critic_params, key, state):
            mu, sigma = actor_apply(actor_params, state)
            action = D.truncated_normal_sample(key, mu, sigma)
            log_prob = D.truncated_normal_log_pdf(action, mu, sigma)
            value = critic_apply(critic_params, state[None])[0]
            return action, log_prob, value

        self._act_fn = _act
        self._value_fn = jax.jit(lambda cp, s: critic_apply(cp, s[None])[0])
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma, lam, eps = self.gamma, self.lam, self.epsilon
        ef, clf = self.entropy_factor, self.critic_loss_factor

        def train(
            actor_params, actor_opt_state, critic_params, critic_opt_state,
            states, actions, rewards, dones, log_probs, curr_values, next_values,
        ):
            # mask: first step always valid; step t valid if t-1 not done
            mask = (
                jnp.concatenate(
                    [jnp.ones_like(dones[:, :1]), 1.0 - dones[:, :-1]], axis=1
                )
                == 1.0
            )  # [B, T, 1]
            deltas = rewards + (1.0 - dones) * gamma * next_values - curr_values

            def gae_step(carry, xs):
                delta_t, mask_t, done_t = xs
                g = delta_t * mask_t + gamma * lam * (1.0 - done_t) * carry
                return g, g

            # backward scan over time
            _, adv_rev = jax.lax.scan(
                gae_step,
                jnp.zeros_like(deltas[:, 0]),
                (
                    jnp.flip(deltas, 1).swapaxes(0, 1),
                    jnp.flip(mask.astype(deltas.dtype), 1).swapaxes(0, 1),
                    jnp.flip(dones, 1).swapaxes(0, 1),
                ),
            )
            advantages = jnp.flip(adv_rev.swapaxes(0, 1), 1)  # [B, T, 1]

            maskf = mask.astype(deltas.dtype)
            n = jnp.maximum(maskf.sum(), 1.0)
            mean = (advantages * maskf).sum() / n
            var = (((advantages - mean) ** 2) * maskf).sum() / jnp.maximum(n - 1.0, 1.0)
            advantages = (advantages - mean) / (jnp.sqrt(var) + 1e-8)
            returns = advantages + curr_values  # reference uses normalized adv

            maskb = maskf  # [B, T, 1]; broadcasts over the action axis
            n_act = jnp.maximum((maskb * jnp.ones_like(actions)).sum(), 1.0)

            def epoch_step(carry, _):
                a_params, a_opt, c_params, c_opt = carry

                def actor_loss_fn(ap):
                    mu, sigma = actor_apply(ap, states)
                    log_prob = D.truncated_normal_log_pdf(actions, mu, sigma)
                    entropy = D.truncated_normal_entropy(mu, sigma)
                    ratios = jnp.exp(log_prob - log_probs)
                    s1 = ratios * advantages
                    s2 = jnp.clip(ratios, 1.0 - eps, 1.0 + eps) * advantages
                    obj = jnp.minimum(s1, s2) + ef * entropy
                    return -(obj * maskb).sum() / n_act

                a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(a_params)
                a_updates, a_opt = self.actor_opt.update(a_grads, a_opt, a_params)
                a_params = optax.apply_updates(a_params, a_updates)

                def critic_loss_fn(cp):
                    value = critic_apply(cp, states)
                    se = (value - returns) ** 2
                    return clf * (se * maskf).sum() / n

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

    # --- reference API ---

    def act(self, state, reward):
        state = jnp.asarray(state)
        self._key, sub = jax.random.split(self._key)
        action, log_prob, value = self._act_fn(
            self.actor_params, self.critic_params, sub, state
        )
        if self.replay_buffer.empty():
            self.replay_buffer.new_trajectory()
        if not self.replay_buffer.trajectory_empty():
            self.replay_buffer.update_last(reward=reward, done=False, next_value=value)
        self.replay_buffer.add(
            PpoEpisodeStep(state, action, 0.0, False, log_prob, value, value)
        )
        self.curr_episode_step += 1
        return action

    def done(self, state, reward):
        value = self._value_fn(self.critic_params, jnp.asarray(state))
        self.replay_buffer.update_last(reward=reward, done=True, next_value=value)
        self._check_train()
        self.replay_buffer.new_trajectory()
        self.global_curr_step += 1
        self.episode_steps_meter.add(float(self.curr_episode_step))
        self.curr_episode_step = 0

    def _check_train(self):
        if not (
            self.global_curr_step % self.train_every == self.train_every - 1
            and self.replay_buffer.enough_trajectory(self.batch_size)
        ):
            return
        episodes = self.replay_buffer.sample(self.batch_size)
        max_steps = max(len(t) for t in episodes)
        pad_t = int(np.ceil(max_steps / 32) * 32)  # bound recompiles

        def pack(get, width):
            out = np.zeros((len(episodes), pad_t, width), dtype=np.float32)
            for i, traj in enumerate(episodes):
                for t, step in enumerate(traj):
                    out[i, t] = np.asarray(get(step), dtype=np.float32).reshape(width)
            return jnp.asarray(out)

        s_dim = int(np.asarray(episodes[0][0].state).shape[0])
        a_dim = int(np.asarray(episodes[0][0].action).shape[0])
        states = pack(lambda s: s.state, s_dim)
        actions = pack(lambda s: s.action, a_dim)
        rewards = pack(lambda s: s.reward, 1)
        log_probs = pack(lambda s: s.log_prob, a_dim)
        curr_values = pack(lambda s: s.value, 1)
        next_values = pack(lambda s: s.next_value, 1)
        dones = np.ones((len(episodes), pad_t, 1), dtype=np.float32)  # pad = done
        for i, traj in enumerate(episodes):
            for t, step in enumerate(traj):
                dones[i, t, 0] = 1.0 if step.done else 0.0
        dones = jnp.asarray(dones)

        (
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state,
            (a_losses, c_losses),
        ) = self._train_fn(
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state,
            states, actions, rewards, dones, log_probs, curr_values, next_values,
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
        pass  # no train-mode-dependent layers in actor/critic MLPs

    def count_parameters(self):
        return count_parameters(self.actor_params) + count_parameters(self.critic_params)
