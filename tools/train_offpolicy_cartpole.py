"""Off-policy (SAC / CrossQ / liquid-SAC) cartpole learning curves on the
batched tier — the committed learning evidence for BASELINE configs 2-3
(robot_walk swaps in via --env robot_walk on a chip).

Writes OUT/curve.csv: iter,env_steps,r_per_step,episodes_done,actor_loss,
critic_1_loss. The discriminative signal on cartpole is episodes_done per
fixed window (failure rate) — reward starts near-max because the pole
begins upright after the settle phase.

Usage: python tools/train_offpolicy_cartpole.py OUT [algo] [iters]
  algo in {soft_actor_critic, cross_q, soft_actor_critic_liquid}
"""
import csv
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

from evomotion_tpu.envs.cartpole import CartPoleFactory
from evomotion_tpu.train.offpolicy_batched import (
    BatchedOffPolicy,
    BatchedOffPolicyLiquid,
    OffPolicyConfig,
    OffPolicyLiquidConfig,
)

OUT = sys.argv[1]
ALGO = sys.argv[2] if len(sys.argv) > 2 else "soft_actor_critic"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 250

os.makedirs(OUT, exist_ok=True)
env = CartPoleFactory({}).make(1234, mt_parity=False)
if ALGO == "soft_actor_critic_liquid":
    cfg = OffPolicyLiquidConfig(
        neurons=32, unfolding_steps=6, batch_size=128, epoch=1,
        steps_per_iter=16, n_envs=64, buffer_capacity=8192, train_every=1,
        learning_rate=1e-3,
    )
    trainer = BatchedOffPolicyLiquid(env, cfg, seed=1234)
else:
    cfg = OffPolicyConfig(
        actor_hidden_size=64, critic_hidden_size=64, batch_size=128, epoch=1,
        steps_per_iter=16, n_envs=64, buffer_capacity=16384, train_every=1,
        learning_rate=1e-3,
    )
    trainer = BatchedOffPolicy(env, ALGO, cfg, seed=1234)

step = jax.jit(trainer.train_step_fn())
state = trainer.init()
with open(os.path.join(OUT, "curve.csv"), "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["iter", "env_steps", "r_per_step", "episodes_done",
                "actor_loss", "critic_1_loss"])
    for it in range(1, ITERS + 1):
        state, m = step(state)
        mm = jax.tree.map(float, m)
        w.writerow([
            it, it * cfg.steps_per_iter * cfg.n_envs,
            round(mm.mean_reward, 5), int(mm.episodes_done),
            round(mm.actor_loss, 5), round(mm.critic_1_loss, 5),
        ])
        if it % 50 == 0:
            print(f"{ALGO} it {it} eps/iter {mm.episodes_done:.0f} "
                  f"r/step {mm.mean_reward:.3f}", flush=True)
save_dir = os.path.join(OUT, "save_final")
os.makedirs(save_dir, exist_ok=True)
trainer.save(save_dir, state)
print("DONE ->", OUT)
