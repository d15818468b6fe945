"""Phase breakdown of the batched robot_walk step on the current device.

The maintained perf-observability tool (VERDICT r2 #9): times every phase of
the env-last physics step in isolation so perf work is never steering blind.

Usage: python tools/prof_step.py [n_envs] [--no-members]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.robot import RobotWalk
from evomotion_tpu.physics import batched as B
from evomotion_tpu.physics import engine as E
from evomotion_tpu.physics import solver_pallas as sp

N = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 2048
members = "--no-members" not in sys.argv

env = RobotWalk()
m = dataclasses.replace(env.model, solver="pallas", member_contacts=members)
env.model = m

reset = jax.jit(jax.vmap(env.reset))
state, _ = reset(jax.random.split(jax.random.PRNGKey(0), N))
jax.block_until_ready(state)
phys = state.physics


def timeit(f, *a, n=30):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


# 1. full env step
step = jax.jit(jax.vmap(env.step))
act = jnp.zeros((N, env.action_size))
t_env = timeit(lambda s, a: step(s, a)[0], state, act)
print(f"full env step:       {t_env*1e3:8.3f} ms  ({N/t_env:,.0f} steps/s)")

# 2. physics only (through the custom_vmap fast path)
mt = jnp.zeros((N, m.n_slider))
me = jnp.ones((N, m.n_slider), bool)
pstep = jax.jit(jax.vmap(lambda s, t, e: E.physics_step(m, s, t, e, 1 / 60)[0]))
t_phys = timeit(pstep, phys, mt, me)
print(f"physics step:        {t_phys*1e3:8.3f} ms  ({N/t_phys:,.0f} steps/s)")


def to_last(x):
    return jnp.moveaxis(x, 0, -1)


pos, quat = to_last(phys.pos), to_last(phys.quat)
lin, ang = to_last(phys.lin_vel), to_last(phys.ang_vel)
mtl, mel = to_last(mt), to_last(me)


def phase(name, fn, *args):
    t = timeit(jax.jit(fn), *args)
    print(f"{name:<21}{t*1e3:8.3f} ms")
    return t


def iinv_of(pos, quat):
    rot = B._q2m(quat)
    return jnp.einsum(
        "bijn,bj,bkjn->bikn", rot, jnp.asarray(m.inv_inertia_local), rot
    )


phase("  iinv_world:", lambda q: iinv_of(pos, q).sum(), quat)
phase(
    "  floor contacts:",
    lambda p, q: sum(x.sum() for x in B.detect_contacts(m, p, q)[:3]),
    pos, quat,
)
phase(
    "  joint rows:",
    lambda p, q: B.build_joint_rows(m, p, q, iinv_of(p, q), mtl, mel, 1 / 60)[0].astype(jnp.float32).sum(),
    pos, quat,
)
if members and E._n_dyn_contacts(m):
    phase(
        "  member narrowphase:",
        lambda p, q: sum(x.sum() for x in B._dyn_narrowphase(m, p, q)),
        pos, quat,
    )
    phase(
        "  member rows:",
        lambda p, q: sum(
            x.astype(jnp.float32).sum()
            for pair in B._member_contact_rows(m, p, q, lin, ang, iinv_of(p, q), 1 / 60)[:2]
            for x in pair
        ),
        pos, quat,
    )

# kernel alone (fixed random rows, env-last layout)
n_pair = E.n_manifold_pairs(m)
n_dyn = E._n_dyn_contacts(m)
k = 4
n_full = m.n_rows + n_pair * k + n_dyn + n_pair * k * 2 + n_dyn * 2
nr_pad = B._round_rows(n_full, 8)
rows = jax.random.normal(jax.random.PRNGKey(1), (nr_pad, sp.ROW_FP, N)) * 0.01
vel = jnp.zeros((m.n_bodies * 6, N))
lam = jnp.zeros((nr_pad, N))
ia, ib, parent, mu, kind, skip_b, _perm, _groups = E._solver_meta(m, "full", n_pair, n_dyn)


def kern(rows, vel, lam):
    v, l, p = sp.solver_sweep_envlast(
        rows, vel, lam, ia, ib, parent, mu, m.n_iterations, n_full,
        kind=kind, skip_b=skip_b, interpret=jax.default_backend() != "tpu",
    )
    return v.sum() + l.sum() + p.sum()


t_k = timeit(jax.jit(kern), rows, vel, lam)
print(f"  sweep kernel:      {t_k*1e3:8.3f} ms  ({n_full} rows, {m.n_iterations} iters)")
print(f"obs/env overhead:    {(t_env-t_phys)*1e3:8.3f} ms")
