"""Is the sweep kernel stream-bound? Scale n_iters and chunk size."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.physics import solver_pallas as sp

N = 2048
NB = 42
NRJ = 252
NPAIR, K, NDYN = 17, 4, 120
NR = NRJ + NPAIR * K + NDYN + NPAIR * 2 * K + NDYN * 2

rng = np.random.default_rng(0)
idx6_a = (rng.integers(0, NB, NR) * 6).astype(np.int32)
idx6_b = (rng.integers(0, NB, NR) * 6).astype(np.int32)
kind = np.concatenate([
    np.full(NRJ, sp.KIND_JOINT), np.full(NPAIR * K + NDYN, sp.KIND_NORMAL),
    np.full(NPAIR * 2 * K + NDYN * 2, sp.KIND_FRICTION),
]).astype(np.int32)
nrm_ids = NRJ + np.arange(NPAIR * K + NDYN)
parent = np.concatenate([
    np.full(NRJ + NPAIR * K + NDYN, -1),
    np.repeat(nrm_ids, 2)[: NPAIR * 2 * K + NDYN * 2],
]).astype(np.int32)
mu = np.where(kind == sp.KIND_FRICTION, 0.5, 0.0).astype(np.float32)
skip_b = np.zeros(NR, bool)

key = jax.random.PRNGKey(0)
rowd = jax.random.normal(key, (N, NR, sp.ROW_F)) * 0.01
vel6 = jnp.zeros((N, NB, 6))
lam0 = jnp.zeros((N, NR))


def timeit(f, n=30):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


for n_iters in (1, 2, 5, 10, 20):
    f = jax.jit(lambda ni=n_iters: sp.solver_sweep(
        rowd, vel6, lam0, idx6_a, idx6_b, parent, mu, ni,
        kind=kind, skip_b=skip_b, chunk=8)[0])
    t = timeit(f)
    print(f"iters={n_iters:3d}: {t*1e3:7.3f} ms")

for chunk in (4, 8, 16, 32):
    f = jax.jit(lambda c=chunk: sp.solver_sweep(
        rowd, vel6, lam0, idx6_a, idx6_b, parent, mu, 10,
        kind=kind, skip_b=skip_b, chunk=c)[0])
    t = timeit(f)
    print(f"chunk={chunk:3d}: {t*1e3:7.3f} ms")
