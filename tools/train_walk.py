"""Long-run robot_walk PPO training with learning-curve + greedy-eval logging.

The BASELINE parity config (README docker command / BASELINE.md):
seed 1234, hidden 256, gamma .99, lambda .95, epsilon .2, epoch 8,
lr 1e-3, entropy 0.01, critic 0.5, grad clip 0.5 — run on the batched tier
(n_envs lockstep, fixed-horizon rollouts).

Knobs against the greedy-eval gap (VERDICT r2 #3 / r3 #1): --entropy-steps
decays the entropy bonus exponentially to 1e-4 (reference functions.cpp
exponential_decrease) so sigma shrinks and mu must carry the gait;
--obs-norm turns on running observation normalization; --sigma-end/steps
anneal the sampling-std scale; --horizon changes the rollout length.

Every run writes OUT/config.json (full provenance) and OUT/curve.csv rows:
  iter,env_steps,wall_s,r_per_step,ep_return,ep_len,win_rate,actor_loss,
  critic_loss,greedy_len,greedy_return,greedy_win
(greedy_* from a deterministic-mu eval over the 1800-step win horizon every
--eval-every iters). Checkpoints to OUT/save_<k>/ every --save-every iters.
"""

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from evomotion_tpu.envs.robot import RobotWalkFactory
from evomotion_tpu.networks.modules import actor_apply
from evomotion_tpu.train.ppo_batched import (
    BatchedPpo,
    PpoConfig,
    load_train_state,
    normalize_obs,
    save_train_state,
)

p = argparse.ArgumentParser()
p.add_argument("out")
p.add_argument("--iters", type=int, default=3000)
p.add_argument("--n-envs", type=int, default=2048)
p.add_argument("--seed", type=int, default=1234)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--entropy", type=float, default=0.01)
p.add_argument("--entropy-steps", type=int, default=0)
p.add_argument("--obs-norm", type=int, default=0)
p.add_argument("--sigma-end", type=float, default=1.0)
p.add_argument("--sigma-steps", type=int, default=0)
p.add_argument("--horizon", type=int, default=64)
p.add_argument("--epoch", type=int, default=8)
p.add_argument("--hidden", type=int, default=256)
p.add_argument("--eval-every", type=int, default=50)
p.add_argument("--save-every", type=int, default=250)
p.add_argument("--eval-envs", type=int, default=64)
p.add_argument("--resume", default=None, help="save dir (full train state)")
args = p.parse_args()

WIN_STEPS = 1800
os.makedirs(args.out, exist_ok=True)
with open(os.path.join(args.out, "config.json"), "w") as f:
    json.dump({**vars(args), "win_steps": WIN_STEPS, "env": "robot_walk",
               "row_schedule": os.environ.get("EVOMOTION_ROW_SCHEDULE", "1"),
               "tier": "ppo_batched"}, f, indent=1)

env = RobotWalkFactory({}).make(args.seed, mt_parity=False)
cfg = PpoConfig(
    hidden_size=args.hidden, gamma=0.99, lam=0.95, epsilon=0.2,
    entropy_factor=args.entropy, critic_loss_factor=0.5, epoch=args.epoch,
    learning_rate=args.lr, clip_grad_norm=0.5, horizon=args.horizon,
    n_envs=args.n_envs, entropy_steps=args.entropy_steps,
    obs_norm=bool(args.obs_norm), sigma_scale_end=args.sigma_end,
    sigma_scale_steps=args.sigma_steps,
)
trainer = BatchedPpo(env, cfg, seed=args.seed)
train_step = jax.jit(trainer.train_step_fn())
state = trainer.init()
if args.resume:
    state = load_train_state(args.resume, state)
    print(f"resumed from {args.resume} at iteration {int(state.iteration)}",
          flush=True)

eval_reset = jax.vmap(env.reset)
eval_step = jax.vmap(env.step)


@jax.jit
def greedy_eval(train_state, key):
    ks = jax.random.split(key, args.eval_envs)
    est, res = eval_reset(ks)
    actor_params = train_state.actor_params

    def body(carry, _):
        est, obs, alive, steps, ret, won = carry
        obs_in = normalize_obs(train_state, obs) if cfg.obs_norm else obs
        mu, _ = actor_apply(actor_params, obs_in)
        est, res = eval_step(est, jnp.clip(mu, -1.0, 1.0))
        valid = res.valid
        steps = steps + (alive & valid).astype(jnp.int32)
        ret = ret + jnp.where(alive & valid, res.reward, 0.0)
        won = won | (alive & valid & res.win)
        alive = alive & ~(res.done & valid)
        return (est, res.obs, alive, steps, ret, won), None

    n = args.eval_envs
    (est, obs, alive, steps, ret, won), _ = jax.lax.scan(
        body,
        (est, res.obs, jnp.ones((n,), bool), jnp.zeros((n,), jnp.int32),
         jnp.zeros((n,)), jnp.zeros((n,), bool)),
        None, length=WIN_STEPS,
    )
    return steps.mean(), ret.mean(), won.mean()


curve_path = os.path.join(args.out, "curve.csv")
new = not os.path.exists(curve_path)
f = open(curve_path, "a", newline="")
w = csv.writer(f)
if new:
    w.writerow([
        "iter", "env_steps", "wall_s", "r_per_step", "ep_return", "ep_len",
        "win_rate", "actor_loss", "critic_loss", "greedy_len",
        "greedy_return", "greedy_win",
    ])

t0 = time.time()
ekey = jax.random.PRNGKey(args.seed + 777)
for it in range(1, args.iters + 1):
    state, m = train_step(state)
    if it % 10 == 0 or it == 1:
        mm = jax.tree.map(float, m)
        glen = gret = gwin = ""
        if it % args.eval_every == 0 or it == 1:
            ekey, sub = jax.random.split(ekey)
            gl, gr, gw = greedy_eval(state, sub)
            glen, gret, gwin = float(gl), float(gr), float(gw)
        steps_done = it * cfg.horizon * args.n_envs
        w.writerow([
            it, steps_done, round(time.time() - t0, 1),
            round(mm.mean_reward, 5), round(mm.mean_episode_return, 3),
            round(mm.mean_ep_len, 1), round(mm.win_rate, 4),
            round(mm.actor_loss, 5), round(mm.critic_loss, 5),
            glen, gret, gwin,
        ])
        f.flush()
        print(
            f"it {it} steps {steps_done:.2e} r/step {mm.mean_reward:.4f} "
            f"ep_len {mm.mean_ep_len:.0f} win {mm.win_rate:.3f} "
            f"greedy_len {glen} greedy_win {gwin}", flush=True,
        )
    if it % args.save_every == 0 or it == args.iters:
        d = os.path.join(args.out, f"save_{it}")
        os.makedirs(d, exist_ok=True)
        save_train_state(d, state)
f.close()
print("DONE")
