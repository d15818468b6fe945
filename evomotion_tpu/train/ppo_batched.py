"""Batched PPO-GAE trainer — the TPU-first training path.

Reference counterpart: the train driver loop (src/train.cpp:17-87) running ONE
env sequentially with PpoGaeAgent (SURVEY §3.1/§3.5). TPU-native redesign:
N environments advance in lockstep inside one jitted iteration —

    rollout: lax.scan over T steps of [vmapped env.step + actor sample]
    learn:   done-aware GAE over the [T, N] batch + `epoch` epochs of the
             clipped-surrogate/critic update (same losses, clamps, and
             normalization as the reference's PpoGaeAgent::train,
             ppo_gae.cpp:117-190)

Env transitions flagged invalid (settle phases, envs/base.py) are masked out
of GAE and the losses, which reproduces the reference's trajectory masking
(ppo_gae.cpp:127-132) in fixed shapes. Fixed-horizon rollouts bootstrap
truncated episodes with the critic value — the standard batched-PPO treatment
of the reference's per-episode trajectories.

Multi-chip: `make_sharded_train_step` places the env batch over a mesh axis
with params replicated; XLA inserts the gradient all-reduce (psum over the
loss mean) automatically — see evomotion_tpu/parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..networks import distributions as D
from ..networks.modules import actor_apply, actor_init, critic_apply, critic_init


@dataclasses.dataclass(frozen=True)
class PpoConfig:
    """Hyper-parameters; defaults are the reference baseline config
    (BASELINE.md / README docker command)."""

    hidden_size: int = 256
    gamma: float = 0.99
    lam: float = 0.95
    epsilon: float = 0.2
    entropy_factor: float = 0.01
    critic_loss_factor: float = 0.5
    epoch: int = 8
    learning_rate: float = 1e-3
    clip_grad_norm: float = 0.5
    horizon: int = 64  # rollout length T per train iteration
    n_envs: int = 1024
    # entropy-bonus decay: factor = entropy_factor * (entropy_end /
    # entropy_factor) ** min(it / entropy_steps, 1) — the reference's
    # exponential_decrease schedule (functions.cpp, used by its A2C agents;
    # its PPO keeps the factor fixed, which leaves sigma high and makes the
    # policy lean on sampling noise: the greedy-mu policy then fails the
    # velocity time bank). entropy_steps <= 0 disables the decay.
    entropy_end: float = 1e-4
    entropy_steps: int = 0
    # running observation normalization (Welford over masked rollout frames;
    # rollouts and updates both see (obs - mean) / sqrt(var + eps), stats
    # from the previous iteration). Off by default: the parity config.
    obs_norm: bool = False
    # sigma annealing: the policy's sampling std is scaled by
    # (sigma_scale_end) ** min(it / sigma_scale_steps, 1) during rollouts
    # AND updates (log-probs/entropy stay consistent), forcing exploration
    # amplitude down so the mean action must carry the behavior — the
    # direct cure when a policy learns to locomote on sampling dither and
    # the greedy-mu policy stands still. Off (1.0 / 0) by default.
    sigma_scale_end: float = 1.0
    sigma_scale_steps: int = 0
    # survival shaping (training-time only; metrics report the raw env
    # reward): a constant added to every valid step's reward inside GAE.
    # Because episodes stop paying it when they END, it directly values
    # staying alive — the r4 walker's failure mode was fast-but-falling
    # gaits (median ep_len 129 of 1800; VERDICT r4 weak #3), which the raw
    # v_z reward under gamma=0.99 (~100-step horizon) cannot penalize.
    survival_bonus: float = 0.0


class PpoTrainState(NamedTuple):
    actor_params: Any
    critic_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    env_state: Any  # vmapped env state [N, ...]
    obs: jnp.ndarray  # [N, S]
    key: jnp.ndarray
    iteration: jnp.ndarray
    ep_steps: jnp.ndarray  # [N] int32: valid steps in each env's open episode
    # running obs-normalization stats (identity when cfg.obs_norm is off)
    obs_mean: jnp.ndarray  # [S]
    obs_var: jnp.ndarray  # [S]
    obs_count: jnp.ndarray  # scalar


def _sigma_scale(cfg, iteration):
    if cfg.sigma_scale_steps <= 0:
        return 1.0
    frac = jnp.minimum(
        iteration.astype(jnp.float32) / cfg.sigma_scale_steps, 1.0
    )
    return cfg.sigma_scale_end**frac


def normalize_obs(state: PpoTrainState, obs: jnp.ndarray) -> jnp.ndarray:
    """(obs - mean) / sqrt(var + eps) with the state's running stats; the
    identity while no frames have been folded in (fresh state, obs_norm off)."""
    return jnp.where(
        state.obs_count > 0.5,
        (obs - state.obs_mean) * jax.lax.rsqrt(state.obs_var + 1e-8),
        obs,
    )


def _update_obs_stats(state: PpoTrainState, obs, maskf):
    """Fold masked rollout frames [T, N, S] into the running mean/var
    (parallel Welford / Chan merge)."""
    m = maskf[..., 0]  # [T, N]
    n_b = jnp.maximum(m.sum(), 1.0)
    w = m[..., None]
    mean_b = (obs * w).sum((0, 1)) / n_b
    var_b = (((obs - mean_b) ** 2) * w).sum((0, 1)) / n_b
    n_a = state.obs_count
    tot = n_a + n_b
    delta = mean_b - state.obs_mean
    mean = state.obs_mean + delta * (n_b / tot)
    var = (n_a * state.obs_var + n_b * var_b + delta**2 * (n_a * n_b / tot)) / tot
    return state._replace(obs_mean=mean, obs_var=var, obs_count=tot)


class PpoMetrics(NamedTuple):
    actor_loss: jnp.ndarray
    critic_loss: jnp.ndarray
    mean_reward: jnp.ndarray
    episodes_done: jnp.ndarray
    mean_episode_return: jnp.ndarray
    # per-episode diagnostics over the episodes that ENDED this iteration
    # (the reference's progress line shows per-episode metrics,
    # train.cpp:67-78): mean completed-episode length in valid steps, and
    # the fraction that ended by reaching the win horizon vs failing.
    mean_ep_len: jnp.ndarray
    win_rate: jnp.ndarray


def save_train_state(folder: str, state: PpoTrainState) -> None:
    """Full train-state checkpoint (params, optimizers, env batch, rng).

    The reference cannot resume training (SURVEY §5: optimizer state is saved
    but only reloaded for inference); the rebuild checkpoints everything."""
    from .checkpoint import save_component

    for name in PpoTrainState._fields:
        save_component(folder, f"train_{name}", getattr(state, name))


def load_train_state(folder: str, like: PpoTrainState) -> PpoTrainState:
    import os

    from .checkpoint import load_component

    def load_or_default(name):
        # fields added after a checkpoint was written (e.g. obs-norm stats)
        # keep their freshly initialized value
        if not os.path.exists(os.path.join(folder, f"train_{name}.npz")):
            return getattr(like, name)
        return load_component(folder, f"train_{name}", getattr(like, name))

    return PpoTrainState(
        **{name: load_or_default(name) for name in PpoTrainState._fields}
    )


def gae_and_normalize(cfg, values, rewards, dones, valids, bootstrap):
    """Done-aware masked GAE + the reference's normalized-advantage returns
    (ppo_gae.cpp:134-152). Shapes [T, N, 1]; returns (advantages, returns,
    maskf, n_valid)."""
    rewards = rewards[..., None]
    donesf = dones[..., None].astype(jnp.float32)
    maskf = valids[..., None].astype(jnp.float32)

    next_values = jnp.concatenate([values[1:], bootstrap[None]], axis=0)
    deltas = rewards + cfg.gamma * (1.0 - donesf) * next_values - values
    deltas = deltas * maskf

    def gae_step(carry, xs):
        delta_t, done_t, mask_t = xs
        g = delta_t + cfg.gamma * cfg.lam * (1.0 - done_t) * mask_t * carry
        return g, g

    _, adv_rev = jax.lax.scan(
        gae_step,
        jnp.zeros_like(deltas[0]),
        (jnp.flip(deltas, 0), jnp.flip(donesf, 0), jnp.flip(maskf, 0)),
    )
    advantages = jnp.flip(adv_rev, 0)

    n = jnp.maximum(maskf.sum(), 1.0)
    mean = (advantages * maskf).sum() / n
    var = (((advantages - mean) ** 2) * maskf).sum() / jnp.maximum(n - 1.0, 1.0)
    advantages = (advantages - mean) / (jnp.sqrt(var) + 1e-8)
    returns = advantages + values  # reference quirk: normalized adv
    return advantages, returns, maskf, n


class BatchedPpo:
    def __init__(self, env, config: PpoConfig = PpoConfig(), seed: int = 1234):
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

    def init(self, key=None) -> PpoTrainState:
        cfg = self.config
        key = jax.random.PRNGKey(self.seed) if key is None else key
        ka, kc, ke, key = jax.random.split(key, 4)
        actor_params = actor_init(
            ka, self.env.observation_size, self.env.action_size, cfg.hidden_size
        )
        critic_params = critic_init(kc, self.env.observation_size, cfg.hidden_size)
        env_keys = jax.random.split(ke, cfg.n_envs)
        # jit the batched reset: eagerly it dispatches the settle fori_loop
        # op-by-op (minutes over a remote-TPU tunnel); one compile instead
        env_state, first = jax.jit(jax.vmap(self.env.reset))(env_keys)
        s = self.env.observation_size
        return PpoTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt_state=self.actor_opt.init(actor_params),
            critic_opt_state=self.critic_opt.init(critic_params),
            env_state=env_state,
            obs=first.obs,
            key=key,
            iteration=jnp.int32(0),
            ep_steps=jnp.zeros((cfg.n_envs,), jnp.int32),
            obs_mean=jnp.zeros((s,)),
            obs_var=jnp.ones((s,)),
            obs_count=jnp.float32(0.0),
        )

    def rollout_fn(self):
        """(state) -> (state, trajectory arrays [T, N, ...]) — also used alone
        by the throughput benchmark."""
        env_step = jax.vmap(self.env.step)
        cfg = self.config

        def rollout(state: PpoTrainState):
            sig_scale = _sigma_scale(cfg, state.iteration)

            def step(carry, key):
                env_state, obs, ep_steps = carry
                obs_in = normalize_obs(state, obs) if cfg.obs_norm else obs
                mu, sigma = actor_apply(state.actor_params, obs_in)
                sigma = sigma * sig_scale
                action = D.truncated_normal_sample(key, mu, sigma)
                log_prob = D.truncated_normal_log_pdf(action, mu, sigma)
                value = critic_apply(state.critic_params, obs_in)
                env_state, res = env_step(env_state, action)
                # per-episode bookkeeping: count valid frames; emit the
                # finished length (and its win flag) on the done step
                grown = ep_steps + res.valid.astype(jnp.int32)
                ended = res.done & res.valid
                done_len = jnp.where(ended, grown, 0)
                ep_steps = jnp.where(ended, 0, grown)
                out = (obs, action, log_prob, value, res.reward, res.done,
                       res.valid, done_len, res.win & ended)
                return (env_state, res.obs, ep_steps), out

            keys = jax.random.split(state.key, cfg.horizon + 1)
            (env_state, last_obs, ep_steps), traj = jax.lax.scan(
                step, (state.env_state, state.obs, state.ep_steps), keys[1:]
            )
            state = state._replace(
                env_state=env_state, obs=last_obs, key=keys[0], ep_steps=ep_steps
            )
            return state, traj

        return rollout

    def train_step_fn(self):
        cfg = self.config
        rollout = self.rollout_fn()

        def train_step(state: PpoTrainState):
            pre_state = state  # stats the rollout's log_probs/values were
            state, traj = rollout(state)  # computed under
            (obs, actions, log_probs, values, rewards, dones, valids,
             done_lens, wins) = traj
            # shapes: [T, N, ...]; rewards/dones/valids [T, N].
            # value of an invalid (settling) next step must not leak into the
            # GAE; those boundaries are closed by done=1 at the terminal step.
            if cfg.obs_norm:
                obs = normalize_obs(pre_state, obs)
                last_obs = normalize_obs(pre_state, state.obs)
            else:
                last_obs = state.obs
            bootstrap = critic_apply(state.critic_params, last_obs)  # [N, 1]
            shaped = rewards + cfg.survival_bonus  # masked inside the GAE
            advantages, returns, maskf, n = gae_and_normalize(
                cfg, values, shaped, dones, valids, bootstrap
            )
            n_act = n * actions.shape[-1]
            if cfg.entropy_steps > 0:
                frac = jnp.minimum(
                    state.iteration.astype(jnp.float32) / cfg.entropy_steps, 1.0
                )
                ent_factor = cfg.entropy_factor * (
                    cfg.entropy_end / cfg.entropy_factor
                ) ** frac  # reference functions.cpp exponential_decrease
            else:
                ent_factor = cfg.entropy_factor

            def epoch_step(carry, _):
                a_params, a_opt, c_params, c_opt = carry

                def actor_loss_fn(ap):
                    mu, sigma = actor_apply(ap, obs)
                    sigma = sigma * _sigma_scale(cfg, pre_state.iteration)
                    lp = D.truncated_normal_log_pdf(actions, mu, sigma)
                    entropy = D.truncated_normal_entropy(mu, sigma)
                    ratios = jnp.exp(lp - log_probs)
                    s1 = ratios * advantages
                    s2 = jnp.clip(ratios, 1.0 - cfg.epsilon, 1.0 + cfg.epsilon) * advantages
                    obj = jnp.minimum(s1, s2) + ent_factor * entropy
                    return -(obj * maskf).sum() / n_act

                a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(a_params)
                au, a_opt = self.actor_opt.update(a_grads, a_opt, a_params)
                a_params = optax.apply_updates(a_params, au)

                def critic_loss_fn(cp):
                    v = critic_apply(cp, obs)
                    return cfg.critic_loss_factor * (((v - returns) ** 2) * maskf).sum() / n

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
            if cfg.obs_norm:
                # fold this rollout's frames in AFTER the update so the next
                # rollout and its stored log_probs share one normalizer
                state = _update_obs_stats(state, traj[0], maskf)
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
