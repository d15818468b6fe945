"""Batched off-policy trainers (SAC / CrossQ) — device ring buffer + jitted loop.

Reference counterpart: the sequential train loop (src/train.cpp:17-87) with
SoftActorCriticAgent (soft_actor_critic.cpp:16-251) or CrossQAgent
(cross_q.cpp:9-239), which trains `epoch` sampled batches every `train_every`
env steps. TPU-native redesign: N envs advance in lockstep, transitions land
in a PREALLOCATED DEVICE RING BUFFER (no host traffic), and one jitted
iteration = [T-step rollout scan] + [ring write] + [update scan].

The update math is the sequential agents' own jitted train functions
(SoftActorCriticAgent._make_train_fn / CrossQAgent._make_train_fn) — one
source of truth for the losses, clamps, Adam betas, and Polyak updates.

Cadence: the reference triggers one train event (epoch batches) every
`train_every` steps of its ONE env. Here the env batch is treated as one
time stream: `updates_per_iter = max(1, steps_per_iter // train_every)`
train events per iteration (not scaled by N — N envs collect N times the
data per wall-time step, but gradient-step cadence follows time, keeping the
update:data ratio tunable via `train_every` exactly like the reference).

Sampling: uniform over valid buffer entries via inverse-CDF binary search,
with the newest written element excluded (the reference's newest-excluded
quirk, replay_buffer.cpp:50-52). Settle-phase frames (envs/base.py `valid`)
never enter the sampled set: a transition is trainable iff both its input
observation and its result are valid episode frames — matching the reference,
whose buffer only ever sees real steps because reset() blocks through the
settle loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..networks import distributions as D
from ..networks.modules import actor_apply


@dataclasses.dataclass(frozen=True)
class OffPolicyConfig:
    actor_hidden_size: int = 256
    critic_hidden_size: int = 256
    batch_size: int = 256
    epoch: int = 1
    learning_rate: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005  # SAC only
    train_every: int = 1
    steps_per_iter: int = 64  # rollout length T per train iteration
    n_envs: int = 1024
    buffer_capacity: int = 262144  # rounded up to a multiple of T*N
    # optional stability knobs (no reference counterpart — the r4 CrossQ
    # walker diverged at ~64M steps; see agents/cross_q.py):
    grad_norm_clip: float | None = None
    # skip (not apply) any update whose losses come back non-finite — the
    # parameters stay at their last finite values instead of being poisoned
    nan_guard: bool = False


class Ring(NamedTuple):
    """Device ring buffer of transitions, [CAP, ...]."""

    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    next_obs: jnp.ndarray
    valid: jnp.ndarray  # f32: trainable transition
    cursor: jnp.ndarray  # int32 next write slot
    filled: jnp.ndarray  # int32 entries ever written (capped at CAP)


class OffPolicyTrainState(NamedTuple):
    carry: Any  # the agent's parameter/optimizer carry tuple
    ring: Ring
    env_state: Any
    obs: jnp.ndarray
    prev_valid: jnp.ndarray  # [N] input-obs validity for the next transition
    key: jnp.ndarray
    iteration: jnp.ndarray
    ep_steps: jnp.ndarray  # [N] int32: valid steps in each env's open episode


class OffPolicyMetrics(NamedTuple):
    actor_loss: jnp.ndarray
    critic_1_loss: jnp.ndarray
    critic_2_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    mean_reward: jnp.ndarray
    episodes_done: jnp.ndarray
    updates_done: jnp.ndarray
    # per-episode diagnostics over episodes that ENDED this iteration
    # (reference progress line, train.cpp:67-78)
    mean_ep_len: jnp.ndarray
    win_rate: jnp.ndarray


class BatchedOffPolicy:
    """algo: "soft_actor_critic" or "cross_q"."""

    def __init__(self, env, algo: str, config: OffPolicyConfig = OffPolicyConfig(),
                 seed: int = 1234):
        self.env = env
        self.algo = algo
        cfg = config
        block = cfg.steps_per_iter * cfg.n_envs
        cap = max(cfg.buffer_capacity, block)
        cap = ((cap + block - 1) // block) * block
        self.capacity = cap
        self.config = cfg
        self.seed = seed

        if algo == "soft_actor_critic":
            from ..agents.soft_actor_critic import SoftActorCriticAgent

            self.agent = SoftActorCriticAgent(
                seed, env.observation_size, env.action_size,
                cfg.actor_hidden_size, cfg.critic_hidden_size, cfg.batch_size,
                cfg.epoch, cfg.learning_rate, cfg.gamma, cfg.tau,
                replay_buffer_size=1, train_every=cfg.train_every,
                grad_norm_clip=cfg.grad_norm_clip,
            )
        elif algo == "cross_q":
            from ..agents.cross_q import CrossQAgent

            self.agent = CrossQAgent(
                seed, env.observation_size, env.action_size,
                cfg.actor_hidden_size, cfg.critic_hidden_size, cfg.batch_size,
                cfg.epoch, cfg.learning_rate, cfg.gamma,
                replay_buffer_size=1, train_every=cfg.train_every,
                grad_norm_clip=cfg.grad_norm_clip,
            )
        else:
            raise ValueError(f"unsupported off-policy algo: {algo}")
        self._update_fn = self.agent._make_train_fn()
        self.updates_per_iter = max(1, cfg.steps_per_iter // cfg.train_every)

    # -- state ------------------------------------------------------------

    def init(self, key=None) -> OffPolicyTrainState:
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
            obs=jnp.zeros((cap, s)),
            action=jnp.zeros((cap, a)),
            reward=jnp.zeros((cap,)),
            done=jnp.zeros((cap,)),
            next_obs=jnp.zeros((cap, s)),
            valid=jnp.zeros((cap,)),
            cursor=jnp.int32(0),
            filled=jnp.int32(0),
        )
        return OffPolicyTrainState(
            carry=self.agent._carry(),
            ring=ring,
            env_state=env_state,
            obs=first.obs,
            prev_valid=first.valid
            if first.valid.shape == (cfg.n_envs,)
            else jnp.ones((cfg.n_envs,), bool),
            key=key,
            iteration=jnp.int32(0),
            ep_steps=jnp.zeros((cfg.n_envs,), jnp.int32),
        )

    # -- one jitted iteration ----------------------------------------------

    def train_step_fn(self, learn: bool = True):
        """One jitted iteration. learn=False builds the ring-REFILL variant:
        envs advance and transitions land in the ring, but no gradient
        updates run — used to repopulate the buffer before resuming updates
        from a params-only checkpoint. Resuming updates onto a nearly-empty
        ring collapses the critic within ~200 iterations (observed r4:
        runs/walk_r4_crossq_s1234_old/resume_collapse.log — the first
        post-resume batches are tiny, fresh, single-policy data); the
        reference never resumes training at all (SURVEY §5)."""
        cfg = self.config
        env_step = jax.vmap(self.env.step)
        cap = self.capacity
        block = cfg.steps_per_iter * cfg.n_envs
        n_events = self.updates_per_iter
        update = self._update_fn

        def rollout(carry_params, env_state, obs, prev_valid, ep_steps, key):
            actor_params = carry_params[0]

            def step(c, k):
                env_state, obs, prev_valid, ep_steps = c
                mu, sigma = actor_apply(actor_params, obs)
                action = D.truncated_normal_sample(k, mu, sigma)
                env_state, res = env_step(env_state, action)
                trainable = prev_valid & res.valid
                grown = ep_steps + res.valid.astype(jnp.int32)
                ended = res.done & res.valid
                done_len = jnp.where(ended, grown, 0)
                ep_steps = jnp.where(ended, 0, grown)
                out = (obs, action, res.reward, res.done, res.obs,
                       trainable.astype(jnp.float32), done_len,
                       res.win & ended)
                return (env_state, res.obs, res.valid, ep_steps), out

            keys = jax.random.split(key, cfg.steps_per_iter)
            (env_state, obs, prev_valid, ep_steps), traj = jax.lax.scan(
                step, (env_state, obs, prev_valid, ep_steps), keys
            )
            return env_state, obs, prev_valid, ep_steps, traj

        def train_step(state: OffPolicyTrainState):
            key, k_roll, k_upd = jax.random.split(state.key, 3)
            env_state, obs, prev_valid, ep_steps, traj = rollout(
                state.carry, state.env_state, state.obs, state.prev_valid,
                state.ep_steps, k_roll
            )
            done_lens, wins = traj[6], traj[7]
            t_obs, t_act, t_rew, t_done, t_next, t_valid = jax.tree.map(
                lambda x: x.reshape((block,) + x.shape[2:]), traj[:6]
            )

            ring = state.ring
            cur = ring.cursor
            ring = Ring(
                obs=jax.lax.dynamic_update_slice_in_dim(ring.obs, t_obs, cur, 0),
                action=jax.lax.dynamic_update_slice_in_dim(ring.action, t_act, cur, 0),
                reward=jax.lax.dynamic_update_slice_in_dim(ring.reward, t_rew, cur, 0),
                done=jax.lax.dynamic_update_slice_in_dim(
                    ring.done, t_done.astype(jnp.float32), cur, 0
                ),
                next_obs=jax.lax.dynamic_update_slice_in_dim(ring.next_obs, t_next, cur, 0),
                valid=jax.lax.dynamic_update_slice_in_dim(ring.valid, t_valid, cur, 0),
                cursor=(cur + block) % cap,
                filled=jnp.minimum(ring.filled + block, cap),
            )

            # sampling weights: valid entries, newest written slot excluded
            # (replay_buffer.cpp:50-52 samples size-1 of size)
            last = (ring.cursor - 1) % cap
            weights = ring.valid.at[last].set(0.0)
            cdf = jnp.cumsum(weights)
            total = cdf[-1]
            has_enough = total >= cfg.batch_size

            def do_updates(carry):
                def one_update(c, k):
                    ks, kt = jax.random.split(k)
                    u = jax.random.uniform(ks, (cfg.batch_size,)) * total
                    idx = jnp.searchsorted(cdf, u, side="left")
                    batch = (
                        ring.obs[idx], ring.action[idx], ring.reward[idx][:, None],
                        ring.done[idx][:, None], ring.next_obs[idx],
                    )
                    c_new, losses = update(c, kt, *batch)
                    if cfg.nan_guard:
                        ok = jnp.isfinite(jnp.stack(list(losses))).all()
                        c_new = jax.tree.map(
                            lambda a, b: jnp.where(ok, a, b), c_new, c
                        )
                        losses = tuple(jnp.where(ok, l, 0.0) for l in losses)
                    return c_new, losses

                keys = jax.random.split(k_upd, n_events * cfg.epoch)
                return jax.lax.scan(one_update, carry, keys)

            def no_updates(carry):
                z = jnp.zeros((n_events * cfg.epoch,))
                return carry, (z, z, z, z)

            if learn:
                carry, (a_l, c1_l, c2_l, e_l) = jax.lax.cond(
                    has_enough, do_updates, no_updates, state.carry
                )
            else:
                carry, (a_l, c1_l, c2_l, e_l) = no_updates(state.carry)
                has_enough = jnp.bool_(False)

            state = OffPolicyTrainState(
                carry=carry, ring=ring, env_state=env_state, obs=obs,
                prev_valid=prev_valid, key=key, iteration=state.iteration + 1,
                ep_steps=ep_steps,
            )
            nv = jnp.maximum(t_valid.sum(), 1.0)
            n_ended = jnp.maximum((done_lens > 0).sum(), 1)
            metrics = OffPolicyMetrics(
                actor_loss=a_l.mean(),
                critic_1_loss=c1_l.mean(),
                critic_2_loss=c2_l.mean(),
                entropy_loss=e_l.mean(),
                mean_reward=(t_rew * t_valid).sum() / nv,
                episodes_done=t_done.sum(),
                updates_done=jnp.where(has_enough, n_events * cfg.epoch, 0),
                mean_ep_len=done_lens.sum() / n_ended,
                win_rate=wins.sum() / n_ended,
            )
            return state, metrics

        return train_step

    # -- checkpointing (same per-component layout as the sequential agent) --

    def save(self, folder: str, state: OffPolicyTrainState) -> None:
        self.agent._uncarry(state.carry)
        self.agent.save(folder)

    def load_carry(self, folder: str):
        self.agent.load(folder)
        return self.agent._carry()

    # -- full-state checkpointing (exact resume incl. the replay ring) -----

    def save_full(self, folder: str, state: OffPolicyTrainState) -> None:
        """Checkpoint EVERYTHING — params/optimizers (carry), the replay
        ring with its cursor, env batch, rng, iteration — so training
        resumes exactly. The ring dominates the size (GBs at the default
        capacity); use save() + a refill (train_step_fn(learn=False)) when
        only the params need to travel. Fixes the r4 resume collapse
        (VERDICT r4 next #6)."""
        from .checkpoint import save_component

        for name in OffPolicyTrainState._fields:
            save_component(folder, f"train_{name}", getattr(state, name))

    def load_full(self, folder: str, like: OffPolicyTrainState) -> OffPolicyTrainState:
        from .checkpoint import load_component

        return OffPolicyTrainState(
            **{
                name: load_component(folder, f"train_{name}", getattr(like, name))
                for name in OffPolicyTrainState._fields
            }
        )


@dataclasses.dataclass(frozen=True)
class OffPolicyLiquidConfig(OffPolicyConfig):
    neurons: int = 64  # reference key: neuron_number
    unfolding_steps: int = 6
    # hidden states are stored per transition (5 nets x 2 x neurons floats),
    # so the default ring is smaller than the MLP tier's
    buffer_capacity: int = 65536


class LiquidRing(NamedTuple):
    """Device ring of transitions + per-step LTC hidden states.

    The reference's liquid replay buffers store the hidden state each
    forward pass consumed and produced (replay_buffer.h:33-56,
    liquid_sac_memory); here that is {net: [CAP, neurons]} for the five
    SAC nets, "in" at the transition's obs and "out" at its next_obs."""

    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    next_obs: jnp.ndarray
    valid: jnp.ndarray
    x: Any  # {net: [CAP, neurons]} pre-step hidden states
    next_x: Any  # {net: [CAP, neurons]} post-step hidden states
    cursor: jnp.ndarray
    filled: jnp.ndarray


class OffPolicyLiquidTrainState(NamedTuple):
    carry: Any
    ring: LiquidRing
    env_state: Any
    obs: jnp.ndarray
    xs: Any  # {net: [N, neurons]} live per-env hidden states
    prev_valid: jnp.ndarray
    key: jnp.ndarray
    iteration: jnp.ndarray
    ep_steps: jnp.ndarray  # [N] int32


class BatchedOffPolicyLiquid:
    """Batched soft_actor_critic_liquid (soft_actor_critic_liquid.cpp):
    SAC over liquid actor + twin liquid Q (+ targets), N envs in lockstep,
    hidden states carried through the rollout scan and stored in the ring
    so updates replay from the stored x_t (teacher forcing), exactly like
    the reference's LiquidReplayBuffer training path."""

    NETS = ("actor", "critic_1", "critic_2", "target_critic_1", "target_critic_2")

    def __init__(self, env, config: OffPolicyLiquidConfig = OffPolicyLiquidConfig(),
                 seed: int = 1234):
        from ..agents.liquid_agents import SoftActorCriticLiquidAgent

        self.env = env
        cfg = config
        block = cfg.steps_per_iter * cfg.n_envs
        cap = max(cfg.buffer_capacity, block)
        cap = ((cap + block - 1) // block) * block
        self.capacity = cap
        self.config = cfg
        self.seed = seed
        self.agent = SoftActorCriticLiquidAgent(
            seed, env.observation_size, env.action_size, cfg.neurons,
            cfg.batch_size, cfg.epoch, cfg.learning_rate, cfg.gamma, cfg.tau,
            cfg.unfolding_steps, replay_buffer_size=1, train_every=cfg.train_every,
        )
        self._update_fn = self.agent._make_train_fn()
        self.updates_per_iter = max(1, cfg.steps_per_iter // cfg.train_every)

    def init(self, key=None) -> OffPolicyLiquidTrainState:
        from ..networks.liquid import liquid_cell_first_x

        cfg = self.config
        key = jax.random.PRNGKey(self.seed) if key is None else key
        ke, key = jax.random.split(key)
        env_keys = jax.random.split(ke, cfg.n_envs)
        # jit the batched reset: eagerly it dispatches the settle fori_loop
        # op-by-op (minutes over a remote-TPU tunnel); one compile instead
        env_state, first = jax.jit(jax.vmap(self.env.reset))(env_keys)
        s, a = self.env.observation_size, self.env.action_size
        cap, nn = self.capacity, cfg.neurons
        ring = LiquidRing(
            obs=jnp.zeros((cap, s)),
            action=jnp.zeros((cap, a)),
            reward=jnp.zeros((cap,)),
            done=jnp.zeros((cap,)),
            next_obs=jnp.zeros((cap, s)),
            valid=jnp.zeros((cap,)),
            x={n: jnp.zeros((cap, nn)) for n in self.NETS},
            next_x={n: jnp.zeros((cap, nn)) for n in self.NETS},
            cursor=jnp.int32(0),
            filled=jnp.int32(0),
        )
        return OffPolicyLiquidTrainState(
            carry=self.agent._carry(),
            ring=ring,
            env_state=env_state,
            obs=first.obs,
            xs={n: liquid_cell_first_x(nn, (cfg.n_envs,)) for n in self.NETS},
            prev_valid=first.valid
            if first.valid.shape == (cfg.n_envs,)
            else jnp.ones((cfg.n_envs,), bool),
            key=key,
            iteration=jnp.int32(0),
            ep_steps=jnp.zeros((cfg.n_envs,), jnp.int32),
        )

    def train_step_fn(self):
        from ..networks.liquid import (
            liquid_actor_apply,
            liquid_cell_first_x,
            liquid_q_net_apply,
        )

        cfg = self.config
        env_step = jax.vmap(self.env.step)
        cap = self.capacity
        block = cfg.steps_per_iter * cfg.n_envs
        n_events = self.updates_per_iter
        update = self._update_fn
        u = cfg.unfolding_steps
        NETS = self.NETS

        def train_step(state: OffPolicyLiquidTrainState):
            key, k_roll, k_upd = jax.random.split(state.key, 3)
            carry = state.carry
            actor_p, c1p, c2p = carry[0], carry[2], carry[4]
            t1p, t2p = carry[6], carry[7]

            def step(c, k):
                env_state, obs, xs, prev_valid, ep_steps = c
                mu, sigma, ax = liquid_actor_apply(actor_p, xs["actor"], obs, u)
                action = D.truncated_normal_sample(k, mu, sigma)
                # advance all five hidden chains with (obs, action), as the
                # sequential agent's act() does (stateful inference)
                _, x1 = liquid_q_net_apply(c1p, xs["critic_1"], obs, action, u)
                _, x2 = liquid_q_net_apply(c2p, xs["critic_2"], obs, action, u)
                _, tx1 = liquid_q_net_apply(
                    t1p, xs["target_critic_1"], obs, action, u
                )
                _, tx2 = liquid_q_net_apply(
                    t2p, xs["target_critic_2"], obs, action, u
                )
                new_xs = {
                    "actor": ax, "critic_1": x1, "critic_2": x2,
                    "target_critic_1": tx1, "target_critic_2": tx2,
                }
                env_state, res = env_step(env_state, action)
                trainable = prev_valid & res.valid
                # freeze across invalid settle frames; reset on episode end
                validf = res.valid[:, None].astype(jnp.float32)
                donef = res.done[:, None].astype(jnp.float32)
                next_xs = {
                    n: (1.0 - donef)
                    * (validf * new_xs[n] + (1.0 - validf) * xs[n])
                    for n in NETS
                }
                grown = ep_steps + res.valid.astype(jnp.int32)
                ended = res.done & res.valid
                done_len = jnp.where(ended, grown, 0)
                ep_steps = jnp.where(ended, 0, grown)
                out = (obs, action, res.reward, res.done, res.obs,
                       trainable.astype(jnp.float32), xs, new_xs,
                       done_len, res.win & ended)
                return (env_state, res.obs, next_xs, res.valid, ep_steps), out

            keys = jax.random.split(k_roll, cfg.steps_per_iter)
            (env_state, obs, xs, prev_valid, ep_steps), traj = jax.lax.scan(
                step, (state.env_state, state.obs, state.xs, state.prev_valid,
                       state.ep_steps),
                keys,
            )
            done_lens, wins = traj[8], traj[9]
            (t_obs, t_act, t_rew, t_done, t_next, t_valid, t_x, t_nx) = (
                jax.tree.map(lambda x: x.reshape((block,) + x.shape[2:]),
                             traj[:8])
            )

            ring = state.ring
            cur = ring.cursor
            upd = lambda buf, val: jax.lax.dynamic_update_slice_in_dim(
                buf, val, cur, 0
            )
            ring = LiquidRing(
                obs=upd(ring.obs, t_obs),
                action=upd(ring.action, t_act),
                reward=upd(ring.reward, t_rew),
                done=upd(ring.done, t_done.astype(jnp.float32)),
                next_obs=upd(ring.next_obs, t_next),
                valid=upd(ring.valid, t_valid),
                x=jax.tree.map(upd, ring.x, t_x),
                next_x=jax.tree.map(upd, ring.next_x, t_nx),
                cursor=(cur + block) % cap,
                filled=jnp.minimum(ring.filled + block, cap),
            )

            last = (ring.cursor - 1) % cap
            weights = ring.valid.at[last].set(0.0)
            cdf = jnp.cumsum(weights)
            total = cdf[-1]
            has_enough = total >= cfg.batch_size

            def do_updates(carry):
                def one_update(c, k):
                    ks, kt = jax.random.split(k)
                    un = jax.random.uniform(ks, (cfg.batch_size,)) * total
                    idx = jnp.searchsorted(cdf, un, side="left")
                    x = {n: ring.x[n][idx] for n in NETS}
                    nx = {n: ring.next_x[n][idx] for n in NETS}
                    c, losses = update(
                        c, kt, ring.obs[idx], ring.action[idx],
                        ring.reward[idx][:, None], ring.done[idx][:, None],
                        ring.next_obs[idx], x, nx,
                    )
                    return c, losses

                keys = jax.random.split(k_upd, n_events * cfg.epoch)
                return jax.lax.scan(one_update, carry, keys)

            def no_updates(carry):
                z = jnp.zeros((n_events * cfg.epoch,))
                return carry, (z, z, z, z)

            carry, (a_l, c1_l, c2_l, e_l) = jax.lax.cond(
                has_enough, do_updates, no_updates, state.carry
            )

            state = OffPolicyLiquidTrainState(
                carry=carry, ring=ring, env_state=env_state, obs=obs, xs=xs,
                prev_valid=prev_valid, key=key, iteration=state.iteration + 1,
                ep_steps=ep_steps,
            )
            nv = jnp.maximum(t_valid.sum(), 1.0)
            n_ended = jnp.maximum((done_lens > 0).sum(), 1)
            metrics = OffPolicyMetrics(
                actor_loss=a_l.mean(),
                critic_1_loss=c1_l.mean(),
                critic_2_loss=c2_l.mean(),
                entropy_loss=e_l.mean(),
                mean_reward=(t_rew * t_valid).sum() / nv,
                episodes_done=t_done.sum(),
                updates_done=jnp.where(has_enough, n_events * cfg.epoch, 0),
                mean_ep_len=done_lens.sum() / n_ended,
                win_rate=wins.sum() / n_ended,
            )
            return state, metrics

        return train_step

    def save(self, folder: str, state: OffPolicyLiquidTrainState) -> None:
        self.agent._uncarry(state.carry)
        self.agent.save(folder)

    def load_carry(self, folder: str):
        self.agent.load(folder)
        return self.agent._carry()
