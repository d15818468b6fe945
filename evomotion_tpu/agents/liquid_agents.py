"""Liquid (LTC-recurrent) agent variants: A2C, PPO-GAE, SAC.

Reference: evo_motion_networks/src/agents/{actor_critic_liquid,
ppo_gae_liquid, soft_actor_critic_liquid}.cpp. Shared recipe: every network
is an LTC cell + linear head; `act()` advances stateful hidden states and the
replay buffers additionally store the hidden states at act time; training
replays forward passes from the STORED hidden states (feedforward given
x_t — no sequence backprop); hidden states reset on episode end.

Reference quirks preserved:
- liquid A2C's critic target is NOT detached (actor_critic_liquid.cpp:86-90)
  and its log_prob is log(pdf) rather than the fused log-pdf (:95-96), and the
  [B,1,1]-vs-[B,A] broadcast produces the same outer-product weighting as the
  non-liquid A2C; actor_loss takes a plain mean without sum(-1) (:101).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..buffers.replay import (
    EpisodeStep,
    LiquidEpisodeStep,
    LiquidPpoEpisodeStep,
    PpoEpisodeStep,
    ReplayBuffer,
    TrajectoryReplayBuffer,
)
from ..networks import distributions as D
from ..networks.liquid import (
    liquid_actor_apply,
    liquid_actor_init,
    liquid_cell_first_x,
    liquid_critic_apply,
    liquid_critic_init,
    liquid_q_net_apply,
    liquid_q_net_init,
)
from ..networks.modules import count_parameters, soft_update
from ..train.checkpoint import load_component, save_component
from ..train.metrics import LossMeter
from .base import Agent


class _LiquidBase(Agent):
    def _save_components(self, folder, items):
        for name, tree in items:
            save_component(folder, name, tree)

    def _load_components(self, folder, items):
        return [load_component(folder, name, tree) for name, tree in items]

    def set_eval(self, eval_mode):
        pass


class ActorCriticLiquidAgent(_LiquidBase):
    """actor_critic_liquid.cpp."""

    def __init__(
        self, seed, state_space, action_space, neuron_number, batch_size, lr, gamma,
        entropy_start_factor, entropy_end_factor, entropy_steps, unfolding_steps,
        replay_buffer_size, train_every,
    ):
        key = jax.random.PRNGKey(seed)
        ka, kc, self._key = jax.random.split(key, 3)
        self.unfolding_steps = unfolding_steps
        self.neurons = neuron_number
        self.actor_params = liquid_actor_init(ka, state_space, action_space, neuron_number, unfolding_steps)
        self.critic_params = liquid_critic_init(kc, state_space, neuron_number, unfolding_steps)
        self.actor_opt = optax.adam(lr)
        self.critic_opt = optax.adam(lr)
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)
        self.actor_x = liquid_cell_first_x(neuron_number, (1,))
        self.critic_x = liquid_cell_first_x(neuron_number, (1,))

        self.gamma = gamma
        self.entropy_start_factor, self.entropy_end_factor = entropy_start_factor, entropy_end_factor
        self.entropy_steps = entropy_steps
        self.batch_size, self.train_every = batch_size, train_every
        self.replay_buffer = ReplayBuffer(replay_buffer_size, seed)
        self.curr_episode_step = 0
        self.curr_train_step = 0
        self.global_curr_step = 0
        self.policy_loss_meter = LossMeter("policy", 64)
        self.entropy_meter = LossMeter("entropy", 64)
        self.critic_loss_meter = LossMeter("critic", 64)
        self.episode_steps_meter = LossMeter("steps", 64)

        u = unfolding_steps

        @jax.jit
        def _act(actor_params, critic_params, key, state, ax, cx):
            mu, sigma, new_ax = liquid_actor_apply(actor_params, ax, state[None], u)
            action = D.truncated_normal_sample(key, mu[0], sigma[0])
            _, new_cx = liquid_critic_apply(critic_params, cx, state[None], u)
            return action, new_ax, new_cx

        self._act_fn = _act
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma, u = self.gamma, self.unfolding_steps

        def train(
            actor_params, actor_opt_state, critic_params, critic_opt_state,
            states, actions, rewards, dones, next_states,
            actor_x, critic_x, next_critic_x, entropy_factor,
        ):
            def critic_loss_fn(cp):
                next_value, _ = liquid_critic_apply(cp, next_critic_x, next_states, u)
                value, _ = liquid_critic_apply(cp, critic_x, states, u)
                norm_reward = (rewards - rewards.mean()) / (rewards.std(ddof=1) + 1e-8)
                target = norm_reward + (1.0 - dones) * gamma * next_value
                # reference does NOT detach the target here
                return jnp.mean((value - target) ** 2), (target, value)

            (c_loss, (target, value)), g = jax.value_and_grad(critic_loss_fn, has_aux=True)(
                critic_params
            )
            cu, critic_opt_state = self.critic_opt.update(g, critic_opt_state, critic_params)
            critic_params = optax.apply_updates(critic_params, cu)

            advantage = jax.lax.stop_gradient(target - value)[..., None]

            def actor_loss_fn(ap):
                mu, sigma, _ = liquid_actor_apply(ap, actor_x, states, u)
                log_prob = jnp.log(D.truncated_normal_pdf(actions, mu, sigma))
                policy_entropy = D.truncated_normal_entropy(mu, sigma) * entropy_factor
                policy_loss = log_prob * advantage  # [B,A]*[B,1,1] -> [B,B,A]
                return -jnp.mean(policy_loss + policy_entropy), (policy_loss, policy_entropy)

            (a_loss, (policy_loss, policy_entropy)), g = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(actor_params)
            au, actor_opt_state = self.actor_opt.update(g, actor_opt_state, actor_params)
            actor_params = optax.apply_updates(actor_params, au)

            return (
                actor_params, actor_opt_state, critic_params, critic_opt_state,
                (-policy_loss.sum(-1).mean(), -policy_entropy.sum(-1).mean(), c_loss),
            )

        return train

    def act(self, state, reward):
        state = jnp.asarray(state)
        x_t = {"actor": self.actor_x, "critic": self.critic_x}
        self._key, sub = jax.random.split(self._key)
        action, self.actor_x, self.critic_x = self._act_fn(
            self.actor_params, self.critic_params, sub, state, self.actor_x, self.critic_x
        )
        next_x_t = {"actor": self.actor_x, "critic": self.critic_x}
        if not self.replay_buffer.empty():
            self.replay_buffer.update_last(reward=reward, next_state=state, done=False)
        self.replay_buffer.add(
            LiquidEpisodeStep(
                EpisodeStep(state, action, 0.0, False, state),
                {"in": x_t, "out": next_x_t},
            )
        )
        self._check_train()
        self.curr_episode_step += 1
        self.global_curr_step += 1
        return action

    def done(self, state, reward):
        self.replay_buffer.update_last(reward=reward, next_state=jnp.asarray(state), done=True)
        self.actor_x = liquid_cell_first_x(self.neurons, (1,))
        self.critic_x = liquid_cell_first_x(self.neurons, (1,))
        self.episode_steps_meter.add(float(self.curr_episode_step))
        self.curr_episode_step = 0

    def _check_train(self):
        if not (
            self.global_curr_step % self.train_every == self.train_every - 1
            and self.replay_buffer.has_enough(self.batch_size)
        ):
            return
        items = self.replay_buffer.sample(self.batch_size)
        steps = [i.step for i in items]
        states = jnp.stack([s.state for s in steps])
        actions = jnp.stack([s.action for s in steps])
        rewards = jnp.asarray([[s.reward] for s in steps], dtype=jnp.float32)
        dones = jnp.asarray([[1.0 if s.done else 0.0] for s in steps], dtype=jnp.float32)
        next_states = jnp.stack([s.next_state for s in steps])
        actor_x = jnp.concatenate([i.x_t["in"]["actor"] for i in items])
        critic_x = jnp.concatenate([i.x_t["in"]["critic"] for i in items])
        next_critic_x = jnp.concatenate([i.x_t["out"]["critic"] for i in items])
        ef = float(
            D.exponential_decrease(
                self.curr_train_step, self.entropy_steps,
                self.entropy_start_factor, self.entropy_end_factor,
            )
        )
        (
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state, (pm, em, cl),
        ) = self._train_fn(
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state,
            states, actions, rewards, dones, next_states,
            actor_x, critic_x, next_critic_x, jnp.float32(ef),
        )
        self.policy_loss_meter.add(float(pm))
        self.entropy_meter.add(float(em))
        self.critic_loss_meter.add(float(cl))
        self.curr_train_step += 1

    def save(self, folder):
        self._save_components(
            folder,
            [
                ("actor", self.actor_params), ("actor_optimizer", self.actor_opt_state),
                ("critic", self.critic_params), ("critic_optimizer", self.critic_opt_state),
            ],
        )

    def load(self, folder):
        self.actor_params = load_component(folder, "actor", self.actor_params)
        self.actor_opt_state = load_component(folder, "actor_optimizer", self.actor_opt_state)
        self.critic_params = load_component(folder, "critic", self.critic_params)
        self.critic_opt_state = load_component(folder, "critic_optimizer", self.critic_opt_state)

    def get_metrics(self):
        return [self.policy_loss_meter, self.entropy_meter, self.critic_loss_meter, self.episode_steps_meter]

    def count_parameters(self):
        return count_parameters(self.actor_params) + count_parameters(self.critic_params)


class PpoGaeLiquidAgent(_LiquidBase):
    """ppo_gae_liquid.cpp: PPO-GAE where the per-step stored hidden states
    replace recurrence during training."""

    def __init__(
        self, seed, state_space, action_space, neuron_number, unfolding_steps, gamma,
        lam, epsilon, entropy_factor, critic_loss_factor, epoch, batch_size,
        train_every, replay_buffer_size, learning_rate, clip_grad_norm,
    ):
        key = jax.random.PRNGKey(seed)
        ka, kc, self._key = jax.random.split(key, 3)
        self.unfolding_steps, self.neurons = unfolding_steps, neuron_number
        self.actor_params = liquid_actor_init(ka, state_space, action_space, neuron_number, unfolding_steps)
        self.critic_params = liquid_critic_init(kc, state_space, neuron_number, unfolding_steps)
        self.actor_opt = optax.chain(optax.clip_by_global_norm(clip_grad_norm), optax.adam(learning_rate))
        self.critic_opt = optax.chain(optax.clip_by_global_norm(clip_grad_norm), optax.adam(learning_rate))
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)
        self.actor_x = liquid_cell_first_x(neuron_number, (1,))
        self.critic_x = liquid_cell_first_x(neuron_number, (1,))

        self.gamma, self.lam, self.epsilon = gamma, lam, epsilon
        self.entropy_factor, self.critic_loss_factor = entropy_factor, critic_loss_factor
        self.epoch, self.batch_size, self.train_every = epoch, batch_size, train_every
        self.replay_buffer = TrajectoryReplayBuffer(replay_buffer_size, seed)
        self.curr_train_step = 0
        self.curr_episode_step = 0
        self.global_curr_step = 0
        self.actor_loss_meter = LossMeter("actor_loss", 64)
        self.critic_loss_meter = LossMeter("critic_loss", 64)
        self.episode_steps_meter = LossMeter("steps", 64)

        u = unfolding_steps

        @jax.jit
        def _act(actor_params, critic_params, key, state, ax, cx):
            mu, sigma, new_ax = liquid_actor_apply(actor_params, ax, state[None], u)
            action = D.truncated_normal_sample(key, mu[0], sigma[0])
            log_prob = D.truncated_normal_log_pdf(action, mu[0], sigma[0])
            value, new_cx = liquid_critic_apply(critic_params, cx, state[None], u)
            return action, log_prob, value[0], new_ax, new_cx

        self._act_fn = _act

        @jax.jit
        def _value(critic_params, state, cx):
            value, new_cx = liquid_critic_apply(critic_params, cx, state[None], u)
            return value[0], new_cx

        self._value_fn = _value
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma, lam, eps, u = self.gamma, self.lam, self.epsilon, self.unfolding_steps
        ef, clf = self.entropy_factor, self.critic_loss_factor

        def train(
            actor_params, actor_opt_state, critic_params, critic_opt_state,
            states, actions, rewards, dones, log_probs, curr_values, next_values,
            actor_x, critic_x,
        ):
            mask = (
                jnp.concatenate([jnp.ones_like(dones[:, :1]), 1.0 - dones[:, :-1]], 1) == 1.0
            )
            deltas = rewards + (1.0 - dones) * gamma * next_values - curr_values

            def gae_step(carry, xs):
                delta_t, mask_t, done_t = xs
                g = delta_t * mask_t + gamma * lam * (1.0 - done_t) * carry
                return g, g

            _, adv_rev = jax.lax.scan(
                gae_step,
                jnp.zeros_like(deltas[:, 0]),
                (
                    jnp.flip(deltas, 1).swapaxes(0, 1),
                    jnp.flip(mask.astype(deltas.dtype), 1).swapaxes(0, 1),
                    jnp.flip(dones, 1).swapaxes(0, 1),
                ),
            )
            advantages = jnp.flip(adv_rev.swapaxes(0, 1), 1)
            maskf = mask.astype(deltas.dtype)
            n = jnp.maximum(maskf.sum(), 1.0)
            mean = (advantages * maskf).sum() / n
            var = (((advantages - mean) ** 2) * maskf).sum() / jnp.maximum(n - 1.0, 1.0)
            advantages = (advantages - mean) / (jnp.sqrt(var) + 1e-8)
            returns = advantages + curr_values
            n_act = jnp.maximum((maskf * jnp.ones_like(actions)).sum(), 1.0)

            def epoch_step(carry, _):
                a_params, a_opt, c_params, c_opt = carry

                def actor_loss_fn(ap):
                    mu, sigma, _ = liquid_actor_apply(ap, actor_x, states, u)
                    log_prob = D.truncated_normal_log_pdf(actions, mu, sigma)
                    entropy = D.truncated_normal_entropy(mu, sigma)
                    ratios = jnp.exp(log_prob - log_probs)
                    s1 = ratios * advantages
                    s2 = jnp.clip(ratios, 1.0 - eps, 1.0 + eps) * advantages
                    return -((jnp.minimum(s1, s2) + ef * entropy) * maskf).sum() / n_act

                a_loss, g = jax.value_and_grad(actor_loss_fn)(a_params)
                au, a_opt = self.actor_opt.update(g, a_opt, a_params)
                a_params = optax.apply_updates(a_params, au)

                def critic_loss_fn(cp):
                    value, _ = liquid_critic_apply(cp, critic_x, states, u)
                    return clf * (((value - returns) ** 2) * maskf).sum() / n

                c_loss, g = jax.value_and_grad(critic_loss_fn)(c_params)
                cu, c_opt = self.critic_opt.update(g, c_opt, c_params)
                c_params = optax.apply_updates(c_params, cu)
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
        x_t = {"actor": self.actor_x[0], "critic": self.critic_x[0]}
        self._key, sub = jax.random.split(self._key)
        action, log_prob, value, self.actor_x, self.critic_x = self._act_fn(
            self.actor_params, self.critic_params, sub, state, self.actor_x, self.critic_x
        )
        if self.replay_buffer.empty():
            self.replay_buffer.new_trajectory()
        if not self.replay_buffer.trajectory_empty():
            self.replay_buffer.update_last(reward=reward, done=False, next_value=value)
        self.replay_buffer.add(
            LiquidPpoEpisodeStep(
                PpoEpisodeStep(state, action, 0.0, False, log_prob, value, value), x_t
            )
        )
        self.curr_episode_step += 1
        return action

    def done(self, state, reward):
        value, self.critic_x = self._value_fn(self.critic_params, jnp.asarray(state), self.critic_x)
        self.replay_buffer.update_last(reward=reward, done=True, next_value=value)
        self._check_train()
        self.actor_x = liquid_cell_first_x(self.neurons, (1,))
        self.critic_x = liquid_cell_first_x(self.neurons, (1,))
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
        pad_t = int(np.ceil(max_steps / 32) * 32)

        def pack(get, width):
            out = np.zeros((len(episodes), pad_t, width), dtype=np.float32)
            for i, traj in enumerate(episodes):
                for t, item in enumerate(traj):
                    out[i, t] = np.asarray(get(item), dtype=np.float32).reshape(width)
            return jnp.asarray(out)

        s_dim = int(np.asarray(episodes[0][0].step.state).shape[0])
        a_dim = int(np.asarray(episodes[0][0].step.action).shape[0])
        states = pack(lambda i: i.step.state, s_dim)
        actions = pack(lambda i: i.step.action, a_dim)
        rewards = pack(lambda i: i.step.reward, 1)
        log_probs = pack(lambda i: i.step.log_prob, a_dim)
        curr_values = pack(lambda i: i.step.value, 1)
        next_values = pack(lambda i: i.step.next_value, 1)
        actor_x = pack(lambda i: i.x_t["actor"], self.neurons)
        critic_x = pack(lambda i: i.x_t["critic"], self.neurons)
        dones = np.ones((len(episodes), pad_t, 1), dtype=np.float32)
        for i, traj in enumerate(episodes):
            for t, item in enumerate(traj):
                dones[i, t, 0] = 1.0 if item.step.done else 0.0

        (
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state, (a_losses, c_losses),
        ) = self._train_fn(
            self.actor_params, self.actor_opt_state,
            self.critic_params, self.critic_opt_state,
            states, actions, rewards, jnp.asarray(dones), log_probs,
            curr_values, next_values, actor_x, critic_x,
        )
        for al, cl in zip(np.asarray(a_losses), np.asarray(c_losses)):
            self.actor_loss_meter.add(float(al))
            self.critic_loss_meter.add(float(cl))
        self.curr_train_step += 1

    def save(self, folder):
        self._save_components(
            folder,
            [
                ("actor", self.actor_params), ("actor_optimizer", self.actor_opt_state),
                ("critic", self.critic_params), ("critic_optimizer", self.critic_opt_state),
            ],
        )

    def load(self, folder):
        self.actor_params = load_component(folder, "actor", self.actor_params)
        self.actor_opt_state = load_component(folder, "actor_optimizer", self.actor_opt_state)
        self.critic_params = load_component(folder, "critic", self.critic_params)
        self.critic_opt_state = load_component(folder, "critic_optimizer", self.critic_opt_state)

    def get_metrics(self):
        return [self.actor_loss_meter, self.critic_loss_meter, self.episode_steps_meter]

    def count_parameters(self):
        return count_parameters(self.actor_params) + count_parameters(self.critic_params)


class SoftActorCriticLiquidAgent(_LiquidBase):
    """soft_actor_critic_liquid.cpp: SAC over liquid actor + liquid twin Q
    (+ liquid twin target Q); all five hidden states stored per step."""

    NETS = ("actor", "critic_1", "critic_2", "target_critic_1", "target_critic_2")

    def __init__(
        self, seed, state_space, action_space, neuron_number, batch_size, epoch,
        learning_rate, gamma, tau, unfolding_steps, replay_buffer_size, train_every,
    ):
        key = jax.random.PRNGKey(seed)
        ka, k1, k2, self._key = jax.random.split(key, 4)
        self.unfolding_steps, self.neurons = unfolding_steps, neuron_number
        self.actor_params = liquid_actor_init(ka, state_space, action_space, neuron_number, unfolding_steps)
        self.critic_1_params = liquid_q_net_init(k1, state_space, action_space, neuron_number, unfolding_steps)
        self.critic_2_params = liquid_q_net_init(k2, state_space, action_space, neuron_number, unfolding_steps)
        self.target_critic_1_params = jax.tree.map(lambda x: x, self.critic_1_params)
        self.target_critic_2_params = jax.tree.map(lambda x: x, self.critic_2_params)
        self.entropy_params = {"log_alpha": jnp.zeros((1,))}

        self.actor_opt = optax.adam(learning_rate)
        self.critic_1_opt = optax.adam(learning_rate)
        self.critic_2_opt = optax.adam(learning_rate)
        self.entropy_opt = optax.adam(learning_rate)
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_1_opt_state = self.critic_1_opt.init(self.critic_1_params)
        self.critic_2_opt_state = self.critic_2_opt.init(self.critic_2_params)
        self.entropy_opt_state = self.entropy_opt.init(self.entropy_params)

        self.x = {n: liquid_cell_first_x(neuron_number, (1,)) for n in self.NETS}

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

        u = unfolding_steps

        @jax.jit
        def _act(actor_p, c1p, c2p, t1p, t2p, key, state, xs):
            mu, sigma, new_ax = liquid_actor_apply(actor_p, xs["actor"], state[None], u)
            action = D.truncated_normal_sample(key, mu[0], sigma[0])
            a = action[None]
            _, x1 = liquid_q_net_apply(c1p, xs["critic_1"], state[None], a, u)
            _, x2 = liquid_q_net_apply(c2p, xs["critic_2"], state[None], a, u)
            _, tx1 = liquid_q_net_apply(t1p, xs["target_critic_1"], state[None], a, u)
            _, tx2 = liquid_q_net_apply(t2p, xs["target_critic_2"], state[None], a, u)
            return action, {
                "actor": new_ax, "critic_1": x1, "critic_2": x2,
                "target_critic_1": tx1, "target_critic_2": tx2,
            }

        self._act_fn = _act
        self._train_fn = jax.jit(self._make_train_fn())

    def _make_train_fn(self):
        gamma, tau, h_target, u = self.gamma, self.tau, self.target_entropy, self.unfolding_steps

        def train(carry, key, states, actions, rewards, dones, next_states, x, next_x):
            (
                actor_params, actor_opt_state, c1, c1_opt, c2, c2_opt, t1, t2,
                ent_params, ent_opt_state,
            ) = carry
            k_next, k_curr = jax.random.split(key)

            next_mu, next_sigma, _ = liquid_actor_apply(
                actor_params, next_x["actor"], next_states, u
            )
            next_action = D.truncated_normal_sample(k_next, next_mu, next_sigma)
            next_log_prob = D.truncated_normal_log_pdf(next_action, next_mu, next_sigma).sum(
                -1, keepdims=True
            )
            ntq1, _ = liquid_q_net_apply(t1, next_x["target_critic_1"], next_states, next_action, u)
            ntq2, _ = liquid_q_net_apply(t2, next_x["target_critic_2"], next_states, next_action, u)
            alpha = jnp.exp(ent_params["log_alpha"])
            target_q = jax.lax.stop_gradient(
                rewards + (1.0 - dones) * gamma * (jnp.minimum(ntq1, ntq2) - alpha * next_log_prob)
            )

            def c_loss_fn(p, xk):
                q, _ = liquid_q_net_apply(p, x[xk], states, actions, u)
                return jnp.mean((q - target_q) ** 2)

            c1_loss, g = jax.value_and_grad(lambda p: c_loss_fn(p, "critic_1"))(c1)
            uu, c1_opt = self.critic_1_opt.update(g, c1_opt, c1)
            c1 = optax.apply_updates(c1, uu)
            c2_loss, g = jax.value_and_grad(lambda p: c_loss_fn(p, "critic_2"))(c2)
            uu, c2_opt = self.critic_2_opt.update(g, c2_opt, c2)
            c2 = optax.apply_updates(c2, uu)

            def actor_loss_fn(ap):
                mu, sigma, _ = liquid_actor_apply(ap, x["actor"], states, u)
                action = D.truncated_normal_sample(k_curr, mu, sigma)
                log_prob = D.truncated_normal_log_pdf(action, mu, sigma).sum(-1, keepdims=True)
                q1, _ = liquid_q_net_apply(c1, x["critic_1"], states, action, u)
                q2, _ = liquid_q_net_apply(c2, x["critic_2"], states, action, u)
                q = jnp.minimum(q1, q2)
                return jnp.mean(jax.lax.stop_gradient(alpha) * log_prob - q), log_prob

            (a_loss, log_prob), g = jax.value_and_grad(actor_loss_fn, has_aux=True)(actor_params)
            uu, actor_opt_state = self.actor_opt.update(g, actor_opt_state, actor_params)
            actor_params = optax.apply_updates(actor_params, uu)

            def ent_loss_fn(ep):
                return -jnp.mean(ep["log_alpha"] * (jax.lax.stop_gradient(log_prob) + h_target))

            e_loss, g = jax.value_and_grad(ent_loss_fn)(ent_params)
            uu, ent_opt_state = self.entropy_opt.update(g, ent_opt_state, ent_params)
            ent_params = optax.apply_updates(ent_params, uu)

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
        x_t = {k: v for k, v in self.x.items()}
        self._key, sub = jax.random.split(self._key)
        action, self.x = self._act_fn(
            self.actor_params, self.critic_1_params, self.critic_2_params,
            self.target_critic_1_params, self.target_critic_2_params, sub, state, self.x,
        )
        next_x_t = {k: v for k, v in self.x.items()}
        if not self.replay_buffer.empty():
            self.replay_buffer.update_last(reward=reward, next_state=state, done=False)
        self.replay_buffer.add(
            LiquidEpisodeStep(
                EpisodeStep(state, action, 0.0, False, state),
                {"in": x_t, "out": next_x_t},
            )
        )
        self._check_train()
        self.curr_episode_step += 1
        self.global_curr_step += 1
        return action

    def done(self, state, reward):
        self.replay_buffer.update_last(reward=reward, next_state=jnp.asarray(state), done=True)
        self.x = {n: liquid_cell_first_x(self.neurons, (1,)) for n in self.NETS}
        self.episode_steps_meter.add(float(self.curr_episode_step))
        self.curr_episode_step = 0

    def _check_train(self):
        if not (
            self.global_curr_step % self.train_every == self.train_every - 1
            and self.replay_buffer.has_enough(self.batch_size)
        ):
            return
        for _ in range(self.epoch):
            items = self.replay_buffer.sample(self.batch_size)
            steps = [i.step for i in items]
            states = jnp.stack([s.state for s in steps])
            actions = jnp.stack([s.action for s in steps])
            rewards = jnp.asarray([[s.reward] for s in steps], dtype=jnp.float32)
            dones = jnp.asarray([[1.0 if s.done else 0.0] for s in steps], dtype=jnp.float32)
            next_states = jnp.stack([s.next_state for s in steps])
            x = {
                n: jnp.concatenate([i.x_t["in"][n] for i in items]) for n in self.NETS
            }
            next_x = {
                n: jnp.concatenate([i.x_t["out"][n] for i in items]) for n in self.NETS
            }
            self._key, sub = jax.random.split(self._key)
            carry, (a, c1, c2, e) = self._train_fn(
                self._carry(), sub, states, actions, rewards, dones, next_states, x, next_x
            )
            self._uncarry(carry)
            self.actor_loss_meter.add(float(a))
            self.critic_1_loss_meter.add(float(c1))
            self.critic_2_loss_meter.add(float(c2))
            self.entropy_loss_meter.add(float(e))
            self.curr_train_step += 1

    def save(self, folder):
        self._save_components(
            folder,
            [
                ("actor", self.actor_params), ("actor_optimizer", self.actor_opt_state),
                ("critic_1", self.critic_1_params), ("target_critic_1", self.target_critic_1_params),
                ("critic_1_optimizer", self.critic_1_opt_state),
                ("critic_2", self.critic_2_params), ("target_critic_2", self.target_critic_2_params),
                ("critic_2_optimizer", self.critic_2_opt_state),
                ("entropy", self.entropy_params), ("entropy_optimizer", self.entropy_opt_state),
            ],
        )

    def load(self, folder):
        self.actor_params = load_component(folder, "actor", self.actor_params)
        self.actor_opt_state = load_component(folder, "actor_optimizer", self.actor_opt_state)
        self.critic_1_params = load_component(folder, "critic_1", self.critic_1_params)
        self.target_critic_1_params = load_component(folder, "target_critic_1", self.target_critic_1_params)
        self.critic_1_opt_state = load_component(folder, "critic_1_optimizer", self.critic_1_opt_state)
        self.critic_2_params = load_component(folder, "critic_2", self.critic_2_params)
        self.target_critic_2_params = load_component(folder, "target_critic_2", self.target_critic_2_params)
        self.critic_2_opt_state = load_component(folder, "critic_2_optimizer", self.critic_2_opt_state)
        self.entropy_params = load_component(folder, "entropy", self.entropy_params)
        self.entropy_opt_state = load_component(folder, "entropy_optimizer", self.entropy_opt_state)

    def get_metrics(self):
        return [
            self.actor_loss_meter, self.critic_1_loss_meter, self.critic_2_loss_meter,
            self.entropy_loss_meter, self.episode_steps_meter,
        ]

    def count_parameters(self):
        return (
            count_parameters(self.actor_params)
            + count_parameters(self.critic_1_params)
            + count_parameters(self.critic_2_params)
            + count_parameters(self.target_critic_1_params)
            + count_parameters(self.target_critic_2_params)
            + count_parameters(self.entropy_params)
        )
