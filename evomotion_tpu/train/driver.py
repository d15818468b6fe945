"""Training and inference drivers.

Reference: src/train.cpp:17-87 (episode loop, progress bar with windowed
meters, save_<i>/ checkpoints every `episodes`), src/infer.cpp:19-106
(checkpoint load + stepped rollout; the GL window becomes a headless
trajectory recording).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np


def _progress(prefix: str, i: int, total: int, t0: float) -> None:
    elapsed = time.time() - t0
    eta = elapsed / max(i, 1) * (total - i)
    sys.stdout.write(
        f"\r{prefix} [{i}/{total}] elapsed {elapsed:5.1f}s eta {eta:5.1f}s  "
    )
    sys.stdout.flush()


def train(env_seed, agent_factory, env_factory, episodes, nb_saves, output_path):
    """Sequential reference-parity loop (train.cpp:17-87): one env, act/done
    per step, save every `episodes` episodes into save_<i>/."""
    env = env_factory.make(env_seed)
    agent = agent_factory.create_agent(env.observation_size, env.action_size)
    os.makedirs(output_path, exist_ok=True)

    key = jax.random.PRNGKey(env_seed)
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)

    key, sub = jax.random.split(key)
    state, res = reset(sub)
    t0 = time.time()
    for s in range(nb_saves):
        for e in range(episodes):
            while True:
                action = agent.act(res.obs, float(res.reward))
                state, res = step(state, action)
                # skip settle-phase frames (the reference blocks inside
                # reset(); here they arrive as invalid transitions)
                while not bool(res.valid):
                    state, res = step(state, np.zeros((env.action_size,), np.float32))
                if bool(res.done):
                    break
            agent.done(res.obs, float(res.reward))
            # after done, the env settles; fast-forward to the next episode's
            # first valid observation (reference reset() returns it directly)
            while not bool(res.valid):
                state, res = step(state, np.zeros((env.action_size,), np.float32))
            metrics = " ".join(m.to_string() for m in agent.get_metrics())
            _progress(f"save {s} {metrics}", e + 1, episodes, t0)
        save_dir = os.path.join(output_path, f"save_{s}")
        os.makedirs(save_dir, exist_ok=True)
        agent.save(save_dir)
    print()
    return 0


def train_batched(
    env_seed, env_factory, agent_params, num_envs, episodes, nb_saves, output_path,
    agent_name="ppo_gae",
):
    """TPU-first batched trainer: N envs in lockstep, jitted rollout+update.

    `episodes` is interpreted as train iterations per save (each iteration
    covers horizon*num_envs env steps). Supported agents: ppo_gae /
    ppo_gae_liquid (on-policy GAE tier, ppo_batched.py /
    ppo_liquid_batched.py) and soft_actor_critic / cross_q (device
    ring-buffer tier, offpolicy_batched.py)."""
    if agent_name in ("soft_actor_critic", "cross_q", "soft_actor_critic_liquid"):
        return _train_batched_offpolicy(
            env_seed, env_factory, agent_params, num_envs, episodes, nb_saves,
            output_path, agent_name,
        )
    if agent_name in ("actor_critic", "ppo_vanilla"):
        return _train_batched_step(
            env_seed, env_factory, agent_params, num_envs, episodes, nb_saves,
            output_path, agent_name,
        )
    if agent_name not in ("ppo_gae", "ppo", "ppo_gae_liquid"):
        raise SystemExit(
            "batched training supports ppo_gae/ppo_gae_liquid/actor_critic/"
            "ppo_vanilla/soft_actor_critic/soft_actor_critic_liquid/cross_q, "
            f"not {agent_name}"
        )
    from ..train.checkpoint import save_component
    from ..train.ppo_batched import BatchedPpo, PpoConfig
    from ..train.ppo_liquid_batched import BatchedPpoLiquid, PpoLiquidConfig

    # mt_parity off: vmapped envs draw per-env jax.random resets (a shared
    # mt19937 table would tilt every env identically)
    env = env_factory.make(env_seed, mt_parity=False)
    g = lambda k, d: type(d)(agent_params[k]) if k in agent_params else d
    common = dict(
        gamma=g("gamma", 0.99),
        lam=g("lambda", 0.95),
        epsilon=g("epsilon", 0.2),
        entropy_factor=g("entropy_factor", 0.01),
        critic_loss_factor=g("critic_loss_factor", 0.5),
        epoch=g("epoch", 8),
        learning_rate=g("learning_rate", 1e-3),
        clip_grad_norm=g("clip_grad_norm", 0.5),
        horizon=g("horizon", 64),
        n_envs=num_envs,
    )
    if agent_name == "ppo_gae_liquid":
        cfg = PpoLiquidConfig(
            neurons=g("neuron_number", 64),
            unfolding_steps=g("unfolding_steps", 6),
            **common,
        )
        trainer = BatchedPpoLiquid(env, cfg, seed=g("seed", env_seed))
    else:
        cfg = PpoConfig(hidden_size=g("hidden_size", 256), **common)
        trainer = BatchedPpo(env, cfg, seed=g("seed", env_seed))
    train_step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    os.makedirs(output_path, exist_ok=True)

    # perf observability (SURVEY §5: the reference has none):
    # EVOMOTION_PROFILE=1 -> per-phase wall timers (train iter + a periodic
    # rollout-only measurement, so the rollout/update split is visible even
    # though the iteration is one fused jitted program);
    # EVOMOTION_TRACE_DIR=<dir> -> one jax.profiler trace around iteration 10.
    profile = bool(os.environ.get("EVOMOTION_PROFILE"))
    trace_dir = os.environ.get("EVOMOTION_TRACE_DIR")
    timer = None
    rollout_only = None
    if profile:
        from .profiling import StepTimer

        timer = StepTimer()
        rollout_only = jax.jit(lambda st: trainer.rollout_fn()(st)[1])

    t0 = time.time()
    it_global = 0
    for s in range(nb_saves):
        for e in range(episodes):
            it_global += 1
            if trace_dir and it_global == 10:
                from .profiling import trace

                with trace(trace_dir):
                    state, metrics = train_step(state)
                    jax.block_until_ready(metrics.actor_loss)
            elif timer is not None:
                with timer.phase("train_iter", block_on=state.obs):
                    state, metrics = train_step(state)
                if it_global % 100 == 1:
                    with timer.phase("rollout_only", block_on=None) as _:
                        traj = rollout_only(state)
                        jax.block_until_ready(traj)
            else:
                state, metrics = train_step(state)
            if e % 10 == 0 or e == episodes - 1:
                m = jax.tree.map(float, metrics)
                steps_done = (s * episodes + e + 1) * cfg.horizon * num_envs
                sps = steps_done / (time.time() - t0)
                _progress(
                    f"save {s} actor={m.actor_loss:.4f} critic={m.critic_loss:.4f} "
                    f"r/step={m.mean_reward:.4f} {sps:,.0f} env-steps/s",
                    e + 1, episodes, t0,
                )
        if timer is not None:
            print(f"\n[profile] {timer.summary()}  "
                  f"({timer.rate('train_iter', cfg.horizon * num_envs):,.0f} env-steps/s incl. update)")
        save_dir = os.path.join(output_path, f"save_{s}")
        os.makedirs(save_dir, exist_ok=True)
        save_component(save_dir, "actor", state.actor_params)
        save_component(save_dir, "critic", state.critic_params)
        save_component(save_dir, "actor_optimizer", state.actor_opt_state)
        save_component(save_dir, "critic_optimizer", state.critic_opt_state)
    print()
    return 0


def _train_batched_step(
    env_seed, env_factory, agent_params, num_envs, episodes, nb_saves,
    output_path, agent_name,
):
    """A2C / PPO-vanilla batched tier (onpolicy_step_batched)."""
    from ..train.onpolicy_step_batched import BatchedStepTrainer, StepTrainerConfig

    env = env_factory.make(env_seed, mt_parity=False)
    g = lambda k, d: type(d)(agent_params[k]) if k in agent_params else d
    cfg = StepTrainerConfig(
        hidden_size=g("hidden_size", 256),
        batch_size=g("batch_size", 256),
        learning_rate=g("learning_rate", 1e-3),
        gamma=g("gamma", 0.99),
        entropy_start_factor=g("entropy_start_factor", 0.01),
        entropy_end_factor=g("entropy_end_factor", 1e-4),
        entropy_steps=g("entropy_steps", 100000),
        epsilon=g("epsilon", 0.2),
        entropy_factor=g("entropy_factor", 0.01),
        critic_loss_factor=g("critic_loss_factor", 0.5),
        epoch=g("epoch", 8),
        train_every=g("train_every", 1),
        steps_per_iter=g("horizon", 64),
        n_envs=num_envs,
        buffer_capacity=g("replay_buffer_size", 262144),
    )
    trainer = BatchedStepTrainer(env, agent_name, cfg, seed=g("seed", env_seed))
    train_step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    os.makedirs(output_path, exist_ok=True)

    t0 = time.time()
    for s in range(nb_saves):
        for e in range(episodes):
            state, metrics = train_step(state)
            if e % 10 == 0 or e == episodes - 1:
                m = jax.tree.map(float, metrics)
                steps_done = (s * episodes + e + 1) * cfg.steps_per_iter * num_envs
                sps = steps_done / (time.time() - t0)
                _progress(
                    f"save {s} actor={m.actor_loss:.4f} critic={m.critic_loss:.4f} "
                    f"r/step={m.mean_reward:.4f} {sps:,.0f} env-steps/s",
                    e + 1, episodes, t0,
                )
        save_dir = os.path.join(output_path, f"save_{s}")
        os.makedirs(save_dir, exist_ok=True)
        trainer.save(save_dir, state)
    print()
    return 0


def _train_batched_offpolicy(
    env_seed, env_factory, agent_params, num_envs, episodes, nb_saves,
    output_path, agent_name,
):
    """SAC/CrossQ/liquid-SAC batched tier: device ring, jitted rollout+updates."""
    from ..train.offpolicy_batched import (
        BatchedOffPolicy,
        BatchedOffPolicyLiquid,
        OffPolicyConfig,
        OffPolicyLiquidConfig,
    )

    env = env_factory.make(env_seed, mt_parity=False)
    g = lambda k, d: type(d)(agent_params[k]) if k in agent_params else d
    common = dict(
        batch_size=g("batch_size", 256),
        epoch=g("epoch", 1),
        learning_rate=g("learning_rate", 3e-4),
        gamma=g("gamma", 0.99),
        tau=g("tau", 0.005),
        train_every=g("train_every", 1),
        steps_per_iter=g("horizon", 64),
        n_envs=num_envs,
    )
    if agent_name == "soft_actor_critic_liquid":
        cfg = OffPolicyLiquidConfig(
            neurons=g("neuron_number", 64),
            unfolding_steps=g("unfolding_steps", 6),
            buffer_capacity=g("replay_buffer_size", 65536),
            **common,
        )
        trainer = BatchedOffPolicyLiquid(env, cfg, seed=g("seed", env_seed))
    else:
        cfg = OffPolicyConfig(
            actor_hidden_size=g("hidden_size", 256),
            critic_hidden_size=g("critic_hidden_size", g("hidden_size", 256)),
            buffer_capacity=g("replay_buffer_size", 262144),
            **common,
        )
        trainer = BatchedOffPolicy(env, agent_name, cfg, seed=g("seed", env_seed))
    train_step = jax.jit(trainer.train_step_fn())
    state = trainer.init()
    os.makedirs(output_path, exist_ok=True)

    t0 = time.time()
    for s in range(nb_saves):
        for e in range(episodes):
            state, metrics = train_step(state)
            if e % 10 == 0 or e == episodes - 1:
                m = jax.tree.map(float, metrics)
                steps_done = (s * episodes + e + 1) * cfg.steps_per_iter * num_envs
                sps = steps_done / (time.time() - t0)
                _progress(
                    f"save {s} actor={m.actor_loss:.4f} critic={m.critic_1_loss:.4f} "
                    f"r/step={m.mean_reward:.4f} {sps:,.0f} env-steps/s",
                    e + 1, episodes, t0,
                )
        save_dir = os.path.join(output_path, f"save_{s}")
        os.makedirs(save_dir, exist_ok=True)
        trainer.save(save_dir, state)
    print()
    return 0


def infer(env_seed, agent_factory, env_factory, input_path, episodes=1, record_path=None):
    """Checkpoint rollout (infer.cpp) with optional trajectory recording."""
    env = env_factory.make(env_seed)
    agent = agent_factory.create_agent(env.observation_size, env.action_size)
    agent.load(input_path)
    agent.set_eval(True)

    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    recorder = None
    if record_path is not None:
        from ..viewer.recorder import TrajectoryRecorder

        recorder = TrajectoryRecorder(env)

    key = jax.random.PRNGKey(env_seed)
    for ep in range(episodes):
        key, sub = jax.random.split(key)
        state, res = reset(sub)
        total, steps = 0.0, 0
        while True:
            action = agent.act(res.obs, float(res.reward))
            state, res = step(state, action)
            while not bool(res.valid):
                state, res = step(state, np.zeros((env.action_size,), np.float32))
            if recorder is not None:
                recorder.add(state)
            total += float(res.reward)
            steps += 1
            if bool(res.done):
                break
        agent.done(res.obs, float(res.reward))
        print(f"episode {ep}: {steps} steps, return {total:.3f}")
    if recorder is not None:
        recorder.save(record_path)
        print(f"trajectory written to {record_path}")
    return 0
