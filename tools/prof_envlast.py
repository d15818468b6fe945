"""Breakdown of the env-last batched step at N envs on the current device."""
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

env = RobotWalk()
m = dataclasses.replace(env.model, solver="pallas")
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
print(f"full env step:     {t_env*1e3:8.3f} ms  ({N/t_env:,.0f} steps/s)")

# 2. physics only (through the custom_vmap fast path)
mt = jnp.zeros((N, m.n_slider))
me = jnp.ones((N, m.n_slider), bool)
pstep = jax.jit(jax.vmap(lambda s, t, e: E.physics_step(m, s, t, e, 1 / 60)[0]))
t_phys = timeit(pstep, phys, mt, me)
print(f"physics step:      {t_phys*1e3:8.3f} ms  ({N/t_phys:,.0f} steps/s)")

# 3. env-last build only (everything before the kernel call)
def to_last(x):
    return jnp.moveaxis(x, 0, -1)

pos, quat = to_last(phys.pos), to_last(phys.quat)
lin, ang = to_last(phys.lin_vel), to_last(phys.ang_vel)
mtl = to_last(mt)
mel = to_last(me)


@jax.jit
def build_only(pos, quat, lin, ang, mtl, mel):
    rot = B._q2m(quat)
    iinv = jnp.einsum("bijn,bj,bkjn->bikn", rot, jnp.asarray(m.inv_inertia_local), rot)
    pt, n_, gap, act_, vid = B.detect_contacts(m, pos, quat)
    jj, ss, slp = B.build_joint_rows(m, pos, quat, iinv, mtl, mel, 1 / 60)
    mn, mf, _mx = B._member_contact_rows(m, pos, quat, lin, ang, iinv, 1 / 60)
    return (jj.astype(jnp.float32).sum() + ss.sum()
            + sum(x.astype(jnp.float32).sum() for x in mn + mf)
            + gap.sum() + slp.sum() + pt.sum() + n_.sum())


t_build = timeit(build_only, pos, quat, lin, ang, mtl, mel)
print(f"env-last build:    {t_build*1e3:8.3f} ms")

# 4. kernel alone (fixed random rows, env-last layout)
n_pair = E.n_manifold_pairs(m)
n_dyn = E._n_dyn_contacts(m)
k = 4
n_full = m.n_rows + n_pair * k + n_dyn + n_pair * k * 2 + n_dyn * 2
nr_pad = B._round_rows(n_full, 8)
rows_j = (jax.random.normal(jax.random.PRNGKey(1), (nr_pad, sp.ROW_J, N)) * 0.01)
rows_s = jax.random.normal(jax.random.PRNGKey(2), (nr_pad, sp.ROW_S, N)) * 0.01
if getattr(m, "row_dtype", "f32") == "bf16":
    rows_j = rows_j.astype(jnp.bfloat16)
vel = jnp.zeros((m.n_bodies * 6, N))
lam = jnp.zeros((nr_pad, N))
iinv9 = jnp.broadcast_to(
    jnp.eye(3).reshape(9)[None, :, None], (m.n_bodies, 9, N)
).reshape(m.n_bodies * 9, N)
ia, ib, parent, mu, kind, skip_b, _perm, _groups = E._solver_meta(m, "full", n_pair, n_dyn)


@jax.jit
def kern(rows_j, rows_s, vel, lam, iinv9):
    v, l, p = sp.solver_sweep_envlast_slim(
        rows_j, rows_s, vel, lam, iinv9, m.inv_mass, ia, ib, parent, mu,
        m.n_iterations, n_full,
        kind=kind, skip_b=skip_b, interpret=jax.default_backend() != "tpu",
    )
    return v.sum() + l.sum() + p.sum()


t_k = timeit(kern, rows_j, rows_s, vel, lam, iinv9)
print(f"fused sweep kernel:{t_k*1e3:8.3f} ms")
print(f"\nbuild+kernel:      {(t_build+t_k)*1e3:8.3f} ms vs physics {t_phys*1e3:.3f}")
print(f"obs/env overhead:  {(t_env-t_phys)*1e3:8.3f} ms")
