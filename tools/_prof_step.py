"""Break down robot_walk step time: full step vs row-build-only vs kernel-only."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.robot import RobotWalk
from evomotion_tpu.physics import engine
from evomotion_tpu.physics.engine import (
    build_joint_rows, detect_contacts, physics_step, _pack_rows, init_state,
    _get_pallas_solver, n_manifold_pairs, _n_dyn_contacts, _member_contact_rows,
)
from evomotion_tpu.physics import maths

N = 2048

env = RobotWalk()
env.model = dataclasses.replace(env.model, solver="pallas")
m = env.model

reset = jax.jit(jax.vmap(env.reset))
keys = jax.random.split(jax.random.PRNGKey(0), N)
state, _ = reset(keys)
jax.block_until_ready(state)
phys = state.physics

def timeit(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

# 1. full env step
step = jax.jit(jax.vmap(env.step))
act = jnp.zeros((N, env.action_size))
t_env = timeit(lambda s, a: step(s, a)[0], state, act)
print(f"full env step:        {t_env*1e3:8.3f} ms  ({N/t_env:,.0f} steps/s)")

# 2. physics step only
mt = jnp.zeros((N, m.n_slider))
me = jnp.ones((N, m.n_slider), bool)
pstep = jax.jit(jax.vmap(lambda s, t, e: physics_step(m, s, t, e, 1/60)[0]))
t_phys = timeit(pstep, phys, mt, me)
print(f"physics step:         {t_phys*1e3:8.3f} ms  ({N/t_phys:,.0f} steps/s)")

# 3. row build only (joints + contacts packing, no solver) — replicate the
#    pre-solver portion of physics_step
def rows_only(s, t, e):
    dyn = (jnp.asarray(m.inv_mass) > 0).astype(jnp.float32)[:, None]
    lin_vel = s.lin_vel + dyn * engine.GRAVITY / 60
    rot = maths.quat_to_mat3(s.quat)
    iinv = jnp.einsum("bij,bj,bkj->bik", rot, jnp.asarray(m.inv_inertia_local), rot)
    c = detect_contacts(m, s)
    rows, slp = build_joint_rows(m, s.pos, s.quat, iinv, t, e, 1/60)
    jp = _pack_rows(rows.j, rows.dv_a, rows.dv_b, rows.rhs, rows.lo, rows.hi, rows.inv_eff)
    mn, mf, mp = _member_contact_rows(m, s.pos, s.quat, iinv, 1/60)
    return jp.sum() + c.gap.sum() + mn.sum() + mf.sum() + lin_vel.sum() + slp.sum()

rb = jax.jit(jax.vmap(rows_only))
t_rows = timeit(rb, phys, mt, me)
print(f"rows+contacts build:  {t_rows*1e3:8.3f} ms")

# 4. kernel only: fixed random row data through the full solver
npair = n_manifold_pairs(m)
ndyn = len(m.dyn_pair_body)
k = 4
nr_full = m.n_rows + npair*k + ndyn + npair*2*k + ndyn*2
key = jax.random.PRNGKey(1)
rowd = jax.random.normal(key, (N, nr_full, 28)) * 0.01
vel6 = jnp.zeros((N, m.n_bodies, 6))
lam0 = jnp.zeros((N, nr_full))
solve = _get_pallas_solver(m, "full", npair, ndyn)
ksolve = jax.jit(jax.vmap(solve))
t_k = timeit(lambda r, v, l: ksolve(r, v, l)[0], rowd, vel6, lam0)
print(f"full sweep kernel:    {t_k*1e3:8.3f} ms")

# 5. push kernel
nr_push = npair*k + ndyn
rowp = jax.random.normal(key, (N, nr_push, 28)) * 0.01
lam0p = jnp.zeros((N, nr_push))
solvep = _get_pallas_solver(m, "push", npair, ndyn)
kp = jax.jit(jax.vmap(solvep))
t_p = timeit(lambda r, v, l: kp(r, v, l)[0], rowp, vel6, lam0p)
print(f"push sweep kernel:    {t_p*1e3:8.3f} ms")

print(f"\nsum rows+full+push:   {(t_rows+t_k+t_p)*1e3:8.3f} ms vs physics {t_phys*1e3:.3f} ms")
print(f"obs/env overhead:     {(t_env-t_phys)*1e3:8.3f} ms")
