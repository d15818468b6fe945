"""Microbenchmark the fused sweep kernel's per-row-visit cost.

Hypotheses to test (real TPU):
- per-visit cost is ~constant (latency-bound), so solver time ~ NR * iters
- consecutive rows sharing a body create RAW stalls -> interleaved row order
  (disjoint bodies back-to-back) should be faster
- the fused split-impulse second accumulator adds per-normal-row cost
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from evomotion_tpu.physics import solver_pallas as sp

B = 2048
NB = 42
ITERS = 10


def run(nr, order, kinds, label):
    rng = np.random.default_rng(0)
    if order == "same":
        ia = np.zeros(nr, np.int32)
        ib = np.ones(nr, np.int32)
    elif order == "roundrobin":
        ia = (np.arange(nr) % (NB // 2)).astype(np.int32) * 2
        ib = ia + 1
    else:  # pairs of 6 consecutive same-body (joint-like blocks)
        ia = ((np.arange(nr) // 6) % (NB // 2)).astype(np.int32) * 2
        ib = ia + 1
    idx6_a, idx6_b = ia * 6, ib * 6
    parent = np.where(kinds == sp.KIND_FRICTION,
                      np.maximum(np.arange(nr) - 1, 0), -1).astype(np.int32)
    mu = np.where(kinds == sp.KIND_FRICTION, 0.5, 0.0).astype(np.float32)
    skip_b = np.zeros(nr, bool)

    chunk = 8
    n_buf = 4
    nr_pad = int(np.ceil(nr / (chunk * n_buf)) * chunk * n_buf)
    rows = jnp.asarray(rng.standard_normal((nr_pad, sp.ROW_FP, B)).astype(np.float32) * 0.01)
    vel = jnp.zeros((NB * 6, B))
    lam = jnp.zeros((nr_pad, B))

    @jax.jit
    def f(rows, vel, lam):
        v, l, p = sp.solver_sweep_envlast(
            rows, vel, lam, idx6_a, idx6_b, parent, mu, ITERS, nr,
            kind=kinds, skip_b=skip_b, chunk=chunk)
        return v.sum() + l.sum() + p.sum()

    r = f(rows, vel, lam); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(rows, vel, lam)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    visits = nr * ITERS * (B // sp.TILE)
    print(f"{label:34s} nr={nr:5d} time={dt*1e3:8.2f}ms per-visit={dt/visits*1e9:7.1f}ns")
    return dt


for nr in (512, 1024, 2048):
    kinds = np.full(nr, sp.KIND_JOINT, np.int32)
    run(nr, "blocks6", kinds, "joint blocks-of-6")
for nr in (1024,):
    kinds = np.full(nr, sp.KIND_JOINT, np.int32)
    run(nr, "same", kinds, "joint all-same-body")
    run(nr, "roundrobin", kinds, "joint round-robin bodies")
    # contact-like: alternate normal + friction
    kinds = np.where(np.arange(nr) % 3 == 0, sp.KIND_NORMAL, sp.KIND_FRICTION).astype(np.int32)
    run(nr, "blocks6", kinds, "normal+friction (split pass on)")
