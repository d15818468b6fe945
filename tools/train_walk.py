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

Round-5 additions (VERDICT r4 next #1/#3):
- --survival-bonus: constant per-step shaping inside GAE only — values
  staying alive (the r4 plateau was fast-but-falling gaits);
- --gamma: horizon control (0.997 ~= 333 steps vs 0.99 ~= 100);
- --order-cycle: comma list of solver row orders (canonical / scheduled /
  shuffled:<seed>) cycled per training iteration so the gait cannot
  overfit solver micro-order (r4: 17/64 wins under one order, 0/64 under
  another). Greedy eval runs under BOTH --eval-order (the shipped default)
  and an alternative order, logged as greedy_win / greedy_win_alt;
- OUT/save_final/ tracks the best-greedy checkpoint (gitignore excepts
  save_final, so the winner is COMMITTED — VERDICT r4 missing #1) with
  solver metadata + score in save_final/meta.json.

Every run writes OUT/config.json (full provenance) and OUT/curve.csv rows:
  iter,env_steps,wall_s,r_per_step,ep_return,ep_len,win_rate,actor_loss,
  critic_loss,greedy_len,greedy_return,greedy_win,greedy_win_alt
(greedy_* from a deterministic-mu eval over the 1800-step win horizon every
--eval-every iters). Checkpoints to OUT/save_<k>/ every --save-every iters.
"""

import argparse
import copy
import csv
import dataclasses
import json
import os
import shutil
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
p.add_argument("--gamma", type=float, default=0.99)
p.add_argument("--entropy", type=float, default=0.01)
p.add_argument("--entropy-steps", type=int, default=0)
p.add_argument("--obs-norm", type=int, default=0)
p.add_argument("--sigma-end", type=float, default=1.0)
p.add_argument("--sigma-steps", type=int, default=0)
p.add_argument("--survival-bonus", type=float, default=0.0)
p.add_argument("--horizon", type=int, default=64)
p.add_argument("--epoch", type=int, default=8)
p.add_argument("--hidden", type=int, default=256)
p.add_argument("--eval-every", type=int, default=50)
p.add_argument("--save-every", type=int, default=250)
p.add_argument("--eval-envs", type=int, default=64)
p.add_argument("--order-cycle", default="",
               help="comma list of row orders cycled per iteration")
p.add_argument("--order-block", type=int, default=1,
               help="iterations per row order before cycling to the next "
                    "(block cycling: per-iteration switching makes the "
                    "physics non-stationary every update and measurably "
                    "slows early learning)")
p.add_argument("--eval-order", default="canonical",
               help="row order for the primary greedy eval")
p.add_argument("--eval-order-alt", default="scheduled",
               help="row order for the robustness greedy eval")
p.add_argument("--resume", default=None, help="save dir (full train state)")
args = p.parse_args()

def _retry(fn, *a, what="step", tries=3, wait=15.0):
    """Retry transient remote-TPU failures (the axon tunnel occasionally
    drops a compile RPC: 'response body closed before all bytes were
    read'); with the persistent compile cache a retry is cheap. Raises
    after `tries` failures."""
    for attempt in range(tries):
        try:
            return fn(*a)
        except Exception as e:  # noqa: BLE001 - transient RPC layer
            if attempt == tries - 1:
                raise
            print(f"{what} failed ({e}); retry {attempt + 1}/{tries - 1}",
                  flush=True)
            time.sleep(wait)


WIN_STEPS = 1800
os.makedirs(args.out, exist_ok=True)

base_env = RobotWalkFactory({}).make(args.seed, mt_parity=False)
orders = [o for o in args.order_cycle.split(",") if o] or [
    base_env.model.row_order
]


def env_variant(order):
    e = copy.copy(base_env)
    e.model = dataclasses.replace(base_env.model, row_order=order)
    return e


solver_meta = {
    "row_orders": orders,
    "eval_order": args.eval_order,
    "eval_order_alt": args.eval_order_alt,
    "row_dtype": base_env.model.row_dtype,
}
with open(os.path.join(args.out, "config.json"), "w") as f:
    json.dump({**vars(args), "win_steps": WIN_STEPS, "env": "robot_walk",
               **solver_meta, "tier": "ppo_batched"}, f, indent=1)

cfg = PpoConfig(
    hidden_size=args.hidden, gamma=args.gamma, lam=0.95, epsilon=0.2,
    entropy_factor=args.entropy, critic_loss_factor=0.5, epoch=args.epoch,
    learning_rate=args.lr, clip_grad_norm=0.5, horizon=args.horizon,
    n_envs=args.n_envs, entropy_steps=args.entropy_steps,
    obs_norm=bool(args.obs_norm), sigma_scale_end=args.sigma_end,
    sigma_scale_steps=args.sigma_steps, survival_bonus=args.survival_bonus,
)
trainers = [BatchedPpo(env_variant(o), cfg, seed=args.seed) for o in orders]
train_steps = [jax.jit(t.train_step_fn()) for t in trainers]
state = trainers[0].init()
if args.resume:
    state = load_train_state(args.resume, state)
    print(f"resumed from {args.resume} at iteration {int(state.iteration)}",
          flush=True)


def make_greedy_eval(order):
    env = env_variant(order)
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

    return greedy_eval


greedy_eval = make_greedy_eval(args.eval_order)
greedy_eval_alt = make_greedy_eval(args.eval_order_alt)

curve_path = os.path.join(args.out, "curve.csv")
new = not os.path.exists(curve_path)
f = open(curve_path, "a", newline="")
w = csv.writer(f)
if new:
    w.writerow([
        "iter", "env_steps", "wall_s", "r_per_step", "ep_return", "ep_len",
        "win_rate", "actor_loss", "critic_loss", "greedy_len",
        "greedy_return", "greedy_win", "greedy_win_alt",
    ])


def save_ckpt(d, score=None, it=None):
    os.makedirs(d, exist_ok=True)
    save_train_state(d, state)
    with open(os.path.join(d, "meta.json"), "w") as mf:
        json.dump({**solver_meta, "greedy_win": score, "iter": it,
                   "seed": args.seed}, mf, indent=1)


best_win = -1.0
t0 = time.time()
ekey = jax.random.PRNGKey(args.seed + 777)
for it in range(1, args.iters + 1):
    state, m = _retry(
        train_steps[((it - 1) // args.order_block) % len(train_steps)],
        state, what=f"train it {it}")
    if it % 10 == 0 or it == 1:
        mm = jax.tree.map(float, m)
        glen = gret = gwin = gwin_alt = ""
        if it % args.eval_every == 0 or it == 1:
            ekey, sub = jax.random.split(ekey)
            gl, gr, gw = _retry(greedy_eval, state, sub, what="eval")
            ekey, sub = jax.random.split(ekey)
            _, _, gw2 = _retry(greedy_eval_alt, state, sub, what="eval_alt")
            glen, gret, gwin = float(gl), float(gr), float(gw)
            gwin_alt = float(gw2)
            # rolling best-greedy checkpoint -> the COMMITTED artifact.
            # Selection is by the PRIMARY order's win rate: r5 finding
            # (runs/WALK_R5.md) is that win-rate transfer to a second solve
            # order is near zero however the cycle is weighted, so a
            # min(primary, alt) score degenerates to "first eval wins" and
            # never updates. The alt-order score is still measured and
            # recorded in meta.json for the robustness report.
            score = gwin
            if score > best_win:
                best_win = score
                save_ckpt(os.path.join(args.out, "save_final"),
                          score={"eval_order": gwin, "alt": gwin_alt},
                          it=it)
        steps_done = it * cfg.horizon * args.n_envs
        w.writerow([
            it, steps_done, round(time.time() - t0, 1),
            round(mm.mean_reward, 5), round(mm.mean_episode_return, 3),
            round(mm.mean_ep_len, 1), round(mm.win_rate, 4),
            round(mm.actor_loss, 5), round(mm.critic_loss, 5),
            glen, gret, gwin, gwin_alt,
        ])
        f.flush()
        print(
            f"it {it} steps {steps_done:.2e} r/step {mm.mean_reward:.4f} "
            f"ep_len {mm.mean_ep_len:.0f} win {mm.win_rate:.3f} "
            f"greedy_len {glen} greedy_win {gwin} alt {gwin_alt}", flush=True,
        )
    if it % args.save_every == 0 or it == args.iters:
        save_ckpt(os.path.join(args.out, f"save_{it}"), it=it)
f.close()
print("DONE")
