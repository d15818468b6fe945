"""XLA op-level profile of the batched robot_walk physics step.

Captures a jax.profiler trace of the jitted step on the current device and
prints the top HLO ops by self time (via xprof's trace-conversion tooling) —
the op-level view the phase timers in prof_step.py can't give.

Usage: python tools/prof_trace.py [n_envs] [n_steps]
"""

import glob
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20

from evomotion_tpu.envs.robot import RobotWalk

env = RobotWalk()
reset = jax.jit(jax.vmap(env.reset))
state, _ = reset(jax.random.split(jax.random.PRNGKey(0), N))
jax.block_until_ready(state)

step = jax.jit(jax.vmap(env.step))
act = jnp.zeros((N, env.action_size))
s, _ = step(state, act)
jax.block_until_ready(s)

tracedir = "/tmp/evomotion_trace"
with jax.profiler.trace(tracedir):
    for _ in range(STEPS):
        s, _ = step(s, act)
    jax.block_until_ready(s)

xplanes = sorted(glob.glob(tracedir + "/**/*.xplane.pb", recursive=True))
print("xplane files:", xplanes[-1:])

from xprof.convert import raw_to_tool_data as rd

data, _ = rd.xspace_to_tool_data([xplanes[-1]], "hlo_op_stats", {})
import csv
import io

rows = list(csv.DictReader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
if not rows:
    print("no rows; keys available:", data[:500])
    sys.exit(0)
key_time = None
for cand in ("total_self_time_in_us", "self_time_us", "Total self time (us)",
             "avg_self_time_us", "occurrences"):
    if cand in rows[0]:
        key_time = cand
        break
print("columns:", list(rows[0].keys()))
tot = sum(float(r.get(key_time, 0) or 0) for r in rows)
rows.sort(key=lambda r: -float(r.get(key_time, 0) or 0))
print(f"\ntop ops by {key_time} (total {tot/1e3:.2f} ms over {STEPS} steps):")
for r in rows[:40]:
    t = float(r.get(key_time, 0) or 0)
    name = r.get("hlo_op_name") or r.get("op_name") or r.get("HLO op") or "?"
    cat = r.get("category") or r.get("hlo_category") or ""
    expr = (r.get("hlo_op_expression") or r.get("program_id") or "")[:90]
    print(f"  {t/1e3:8.3f} ms  {100*t/max(tot,1e-9):5.1f}%  {cat:<18} {name[:60]} {expr}")
