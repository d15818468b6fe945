"""Long-run robot_walk PPO training with learning-curve + greedy-eval logging.

The BASELINE parity config (README docker command / BASELINE.md):
seed 1234, hidden 256, gamma .99, lambda .95, epsilon .2, epoch 8,
lr 1e-3, entropy 0.01, critic 0.5, grad clip 0.5 — run on the batched tier
(n_envs lockstep, horizon-64 rollouts).

Usage:
  python tools/train_walk.py OUTDIR [iters] [n_envs] [seed] [lr] [entropy]
                             [entropy_steps] [obs_norm]

Round-3 recipe against the greedy-eval gap (VERDICT r2 #3): entropy_steps>0
decays the entropy bonus exponentially to 1e-4 (reference
functions.cpp exponential_decrease) so sigma shrinks and mu must carry the
gait; obs_norm=1 turns on running observation normalization.

Writes OUTDIR/curve.csv rows:
  iter,env_steps,wall_s,r_per_step,ep_return,ep_len,actor_loss,critic_loss,
  greedy_len,greedy_return
(greedy_* from a 1800-step deterministic-mu eval every EVAL_EVERY iters; the
win horizon is 1800 steps = 30 s.) Checkpoints to OUTDIR/save_<k>/ every
SAVE_EVERY iters.
"""

import csv
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.robot import RobotWalkFactory
from evomotion_tpu.networks.modules import actor_apply
from evomotion_tpu.train.ppo_batched import (
    BatchedPpo,
    PpoConfig,
    normalize_obs,
    save_train_state,
)

OUT = sys.argv[1]
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
N_ENVS = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
SEED = int(sys.argv[4]) if len(sys.argv) > 4 else 1234
LR = float(sys.argv[5]) if len(sys.argv) > 5 else 1e-3
ENT = float(sys.argv[6]) if len(sys.argv) > 6 else 0.01
ENT_STEPS = int(sys.argv[7]) if len(sys.argv) > 7 else 0
OBS_NORM = bool(int(sys.argv[8])) if len(sys.argv) > 8 else False
SIGMA_END = float(sys.argv[9]) if len(sys.argv) > 9 else 1.0
SIGMA_STEPS = int(sys.argv[10]) if len(sys.argv) > 10 else 0
RESUME = sys.argv[11] if len(sys.argv) > 11 else None  # save dir to resume
EVAL_EVERY = 50
SAVE_EVERY = 250
EVAL_ENVS = 64
WIN_STEPS = 1800

os.makedirs(OUT, exist_ok=True)

env = RobotWalkFactory({}).make(SEED, mt_parity=False)
cfg = PpoConfig(
    hidden_size=256, gamma=0.99, lam=0.95, epsilon=0.2, entropy_factor=ENT,
    critic_loss_factor=0.5, epoch=8, learning_rate=LR, clip_grad_norm=0.5,
    horizon=64, n_envs=N_ENVS, entropy_steps=ENT_STEPS, obs_norm=OBS_NORM,
    sigma_scale_end=SIGMA_END, sigma_scale_steps=SIGMA_STEPS,
)
trainer = BatchedPpo(env, cfg, seed=SEED)
train_step = jax.jit(trainer.train_step_fn())
state = trainer.init()
if RESUME:
    from evomotion_tpu.train.ppo_batched import load_train_state

    state = load_train_state(RESUME, state)
    print(f"resumed from {RESUME} at iteration {int(state.iteration)}", flush=True)

# greedy eval: deterministic mu policy, fixed eval envs, run the win horizon.
# reports mean steps survived and mean return per env.
eval_reset = jax.vmap(env.reset)
eval_step = jax.vmap(env.step)


@jax.jit
def greedy_eval(train_state, key):
    ks = jax.random.split(key, EVAL_ENVS)
    est, res = eval_reset(ks)
    actor_params = train_state.actor_params

    def body(carry, _):
        est, obs, alive, steps, ret = carry
        obs_in = normalize_obs(train_state, obs) if OBS_NORM else obs
        mu, _ = actor_apply(actor_params, obs_in)
        action = jnp.clip(mu, -1.0, 1.0)
        est, res = eval_step(est, action)
        valid = res.valid
        # count only valid frames; an env dies at its first done
        steps = steps + (alive & valid).astype(jnp.int32)
        ret = ret + jnp.where(alive & valid, res.reward, 0.0)
        alive = alive & ~(res.done & valid)
        return (est, res.obs, alive, steps, ret), None

    alive0 = jnp.ones((EVAL_ENVS,), bool)
    (est, obs, alive, steps, ret), _ = jax.lax.scan(
        body, (est, res.obs, alive0, jnp.zeros((EVAL_ENVS,), jnp.int32),
               jnp.zeros((EVAL_ENVS,))), None, length=WIN_STEPS,
    )
    return steps.mean(), ret.mean(), (steps >= WIN_STEPS - 1).mean()


curve_path = os.path.join(OUT, "curve.csv")
new = not os.path.exists(curve_path)
f = open(curve_path, "a", newline="")
w = csv.writer(f)
if new:
    w.writerow([
        "iter", "env_steps", "wall_s", "r_per_step", "ep_return", "ep_len",
        "actor_loss", "critic_loss", "greedy_len", "greedy_return", "greedy_win",
    ])

t0 = time.time()
ekey = jax.random.PRNGKey(SEED + 777)
for it in range(1, ITERS + 1):
    state, m = train_step(state)
    if it % 10 == 0 or it == 1:
        mm = jax.tree.map(float, m)
        glen = gret = gwin = ""
        if it % EVAL_EVERY == 0 or it == 1:
            ekey, sub = jax.random.split(ekey)
            gl, gr, gw = greedy_eval(state, sub)
            glen, gret, gwin = float(gl), float(gr), float(gw)
        steps_done = it * cfg.horizon * N_ENVS
        w.writerow([
            it, steps_done, round(time.time() - t0, 1),
            round(mm.mean_reward, 5), round(mm.mean_episode_return, 3),
            "", round(mm.actor_loss, 5), round(mm.critic_loss, 5),
            glen, gret, gwin,
        ])
        f.flush()
        print(
            f"it {it} steps {steps_done:.2e} r/step {mm.mean_reward:.4f} "
            f"greedy_len {glen} win {gwin}", flush=True,
        )
    if it % SAVE_EVERY == 0 or it == ITERS:
        d = os.path.join(OUT, f"save_{it}")
        os.makedirs(d, exist_ok=True)
        save_train_state(d, state)
f.close()
print("DONE")
