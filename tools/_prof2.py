"""Sub-profile: which parts of the pre/post-solver XLA work dominate."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.robot import RobotWalk
from evomotion_tpu.physics import engine, maths
from evomotion_tpu.physics.engine import (
    build_joint_rows, detect_contacts, _member_contact_rows, _pack_rows,
    _warm_start_match, n_manifold_pairs,
)

N = 2048
env = RobotWalk()
env.model = dataclasses.replace(env.model, solver="pallas")
m = env.model
reset = jax.jit(jax.vmap(env.reset))
keys = jax.random.split(jax.random.PRNGKey(0), N)
state, _ = reset(keys)
jax.block_until_ready(state)
phys = state.physics
mt = jnp.zeros((N, m.n_slider))
me = jnp.ones((N, m.n_slider), bool)


def timeit(f, *a, n=30):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def iinv_of(s):
    rot = maths.quat_to_mat3(s.quat)
    return jnp.einsum("bij,bj,bkj->bik", rot, jnp.asarray(m.inv_inertia_local), rot)


t = timeit(jax.jit(jax.vmap(lambda s: iinv_of(s).sum())), phys)
print(f"iinv:            {t*1e3:7.3f} ms")

t = timeit(jax.jit(jax.vmap(lambda s: detect_contacts(m, s).gap.sum())), phys)
print(f"detect_contacts: {t*1e3:7.3f} ms")

def jr(s, tgt, en):
    rows, slp = build_joint_rows(m, s.pos, s.quat, iinv_of(s), tgt, en, 1/60)
    return rows.j.sum() + rows.inv_eff.sum() + rows.rhs.sum()
t = timeit(jax.jit(jax.vmap(jr)), phys, mt, me)
print(f"joint rows:      {t*1e3:7.3f} ms")

def mr(s):
    a, b, c = _member_contact_rows(m, s.pos, s.quat, iinv_of(s), 1/60)
    return a.sum() + b.sum() + c.sum()
t = timeit(jax.jit(jax.vmap(mr)), phys)
print(f"member rows:     {t*1e3:7.3f} ms")

def ws(s):
    c = detect_contacts(m, s)
    return _warm_start_match(c, s).sum()
t = timeit(jax.jit(jax.vmap(ws)), phys)
print(f"contacts+warm:   {t*1e3:7.3f} ms")

# layout transform cost alone: mimic to_tiled/from_tiled of solver_sweep
npair = n_manifold_pairs(m)
ndyn = len(m.dyn_pair_body)
nr_full = m.n_rows + npair*4 + ndyn + npair*8 + ndyn*2
G = N // 1024
rowd = jnp.zeros((N, nr_full, 28))

@jax.jit
def tileit(x):
    g = N // 1024
    x = x.reshape((g, 8, 128, nr_full, 28))
    x = jnp.moveaxis(x, (1, 2), (-2, -1))
    return x + 1.0
t = timeit(tileit, rowd)
print(f"to_tiled(rows):  {t*1e3:7.3f} ms  ({rowd.nbytes/1e6:.0f} MB)")
