"""Fine-grained breakdown of the env-last row build at N envs."""
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

env = RobotWalk()
m = dataclasses.replace(env.model, solver="pallas")
env.model = m
reset = jax.jit(jax.vmap(env.reset))
state, _ = reset(jax.random.split(jax.random.PRNGKey(0), N))
jax.block_until_ready(state)
phys = state.physics


def to_last(x):
    return jnp.moveaxis(x, 0, -1)


pos, quat = to_last(phys.pos), to_last(phys.quat)
lin, ang = to_last(phys.lin_vel), to_last(phys.ang_vel)
mt = jnp.zeros((m.n_slider, N))
me = jnp.ones((m.n_slider, N), bool)


def timeit(f, *a, n=30):
    g = jax.jit(f)
    r = g(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def iinv_of(pos, quat):
    rot = B._q2m(quat)
    return jnp.einsum("bijn,bj,bkjn->bikn", rot, jnp.asarray(m.inv_inertia_local), rot)


iinv = jax.jit(iinv_of)(pos, quat)
jax.block_until_ready(iinv)

t = timeit(lambda p, q: iinv_of(p, q).sum(), pos, quat)
print(f"iinv (q2m+einsum):   {t*1e3:7.3f} ms")

t = timeit(lambda p, q: sum(x.sum() for x in B.detect_contacts(m, p, q)[:3]), pos, quat)
print(f"floor detect:        {t*1e3:7.3f} ms")

t = timeit(
    lambda p, q, ii: B.build_joint_rows(m, p, q, ii, mt, me, 1 / 60)[0].astype(jnp.float32).sum(),
    pos, quat, iinv,
)
print(f"joint rows:          {t*1e3:7.3f} ms")

t = timeit(
    lambda p, q: sum(x.sum() for x in B._dyn_narrowphase(m, p, q)), pos, quat
)
print(f"dyn narrowphase:     {t*1e3:7.3f} ms")

t = timeit(
    lambda p, q, ii: sum(
        x.astype(jnp.float32).sum() for pair in B._member_contact_rows(m, p, q, lin, ang, ii, 1 / 60)[:2] for x in pair
    ),
    pos, quat, iinv,
)
print(f"member rows total:   {t*1e3:7.3f} ms")
