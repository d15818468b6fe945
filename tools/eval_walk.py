"""Greedy evaluation + replay recording for robot_walk checkpoints.

Evaluates the deterministic-mu policy of either tier over N fresh envs for
the full 1800-step win horizon, prints win rate / episode lengths, and
records the LONGEST episode's trajectory to npz + a self-playing HTML
viewer (the evidence artifact VERDICT r3 #1 asks for).

Usage:
  python tools/eval_walk.py ppo  runs/walk_r4_ppo_s1234/save_3000 [--out x]
  python tools/eval_walk.py crossq runs/walk_r4_crossq_s1234/save_12000 [--out x]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.robot import RobotWalkFactory
from evomotion_tpu.networks.modules import actor_apply

p = argparse.ArgumentParser()
p.add_argument("tier", choices=["ppo", "crossq", "sac"])
p.add_argument("ckpt")
p.add_argument("--episodes", type=int, default=64)
p.add_argument("--seed", type=int, default=999)
p.add_argument("--out", default=None, help="record best episode: OUT.npz + OUT.html")
p.add_argument("--hidden", type=int, default=256)
p.add_argument("--row-order", default=None,
               help="solver row order override (default: checkpoint meta.json "
                    "eval_order, else the model default)")
args = p.parse_args()

WIN = 1800
env = RobotWalkFactory({}).make(args.seed, mt_parity=False)

# solve order is physics-visible for trained gaits (runs/WALK_R4.md): adopt
# the order the checkpoint was evaluated/selected under (meta.json, written
# by tools/train_walk.py) unless overridden
import dataclasses as _dc
import json as _json
import os as _os

_meta_path = _os.path.join(args.ckpt, "meta.json")
_order = args.row_order
if _order is None and _os.path.exists(_meta_path):
    with open(_meta_path) as _mf:
        _order = _json.load(_mf).get("eval_order")
if _order is not None and _order != env.model.row_order:
    print(f"row_order: {env.model.row_order} -> {_order} "
          f"({'cli override' if args.row_order else 'checkpoint meta.json'})")
    env.model = _dc.replace(env.model, row_order=_order)

if args.tier == "ppo":
    # load only the policy-relevant components (the checkpoint's env batch
    # size need not match this tool's)
    from evomotion_tpu.networks.modules import actor_init
    from evomotion_tpu.train.checkpoint import load_component

    template = actor_init(jax.random.PRNGKey(0), env.observation_size,
                          env.action_size, args.hidden)
    actor_params = load_component(args.ckpt, "train_actor_params", template)
    s = env.observation_size
    obs_mean = load_component(args.ckpt, "train_obs_mean", jnp.zeros((s,)))
    obs_var = load_component(args.ckpt, "train_obs_var", jnp.ones((s,)))
    obs_count = load_component(args.ckpt, "train_obs_count", jnp.float32(0.0))
    use_norm = float(obs_count) > 0.5

    def policy(obs):
        obs_in = (
            (obs - obs_mean) * jax.lax.rsqrt(obs_var + 1e-8) if use_norm else obs
        )
        mu, _ = actor_apply(actor_params, obs_in)
        return jnp.clip(mu, -1.0, 1.0)
else:
    if args.tier == "crossq":
        from evomotion_tpu.agents.cross_q import CrossQAgent

        agent = CrossQAgent(1, env.observation_size, env.action_size,
                            args.hidden, 1024, 8, 1, 3e-4, 0.99, 1, 2)
    else:
        from evomotion_tpu.agents.soft_actor_critic import SoftActorCriticAgent

        agent = SoftActorCriticAgent(1, env.observation_size, env.action_size,
                                     args.hidden, 1024, 8, 1, 3e-4, 0.99,
                                     0.005, 1, 2)
    agent.load(args.ckpt)
    actor_params = agent.actor_params

    def policy(obs):
        mu, _ = actor_apply(actor_params, obs)
        return jnp.clip(mu, -1.0, 1.0)

reset = jax.vmap(env.reset)
step = jax.vmap(env.step)
N = args.episodes


@jax.jit
def run_eval(key):
    est, res = reset(jax.random.split(key, N))

    def body(c, _):
        est, obs, alive, steps, ret, won = c
        est, res = step(est, policy(obs))
        valid = res.valid
        steps = steps + (alive & valid).astype(jnp.int32)
        ret = ret + jnp.where(alive & valid, res.reward, 0.0)
        won = won | (alive & valid & res.win)
        alive = alive & ~(res.done & valid)
        return (est, res.obs, alive, steps, ret, won), None

    (est, obs, alive, steps, ret, won), _ = jax.lax.scan(
        body,
        (est, res.obs, jnp.ones((N,), bool), jnp.zeros((N,), jnp.int32),
         jnp.zeros((N,)), jnp.zeros((N,), bool)),
        None, length=WIN,
    )
    return steps, ret, won


steps, ret, won = jax.tree.map(np.asarray, run_eval(jax.random.PRNGKey(args.seed)))
print(f"greedy eval over {N} envs (win horizon {WIN} steps):")
print(f"  win rate      : {won.mean():.3f} ({int(won.sum())}/{N})")
print(f"  mean ep len   : {steps.mean():.1f}  (median {np.median(steps):.0f}, "
      f"max {steps.max()})")
print(f"  mean return   : {ret.mean():.2f}")

if args.out:
    # re-run the longest episode single-env, recording poses
    from evomotion_tpu.viewer.html_viewer import write_playback_html
    from evomotion_tpu.viewer.recorder import TrajectoryRecorder

    best = int(np.argmax(steps + won * WIN))
    keys = jax.random.split(jax.random.PRNGKey(args.seed), N)
    st, res = jax.jit(env.reset)(keys[best])
    rec = TrajectoryRecorder(env)
    step1 = jax.jit(env.step)
    pol1 = jax.jit(lambda o: policy(o[None])[0])
    obs = res.obs
    n = 0
    for _ in range(WIN):
        st, res = step1(st, pol1(obs))
        obs = res.obs
        if not bool(res.valid):
            continue
        rec.add(st)
        n += 1
        if bool(res.done):
            break
    rec.save(args.out + ".npz")
    write_playback_html(args.out + ".npz", args.out + ".html", env.model,
                        env.meta.root_body)
    print(f"recorded {n} frames (done={bool(res.done)}, win={bool(res.win)}) "
          f"-> {args.out}.npz / .html")
