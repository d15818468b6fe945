"""Fused sequential-impulse sweep — Pallas TPU kernel.

The XLA solver in engine.py runs ~470 colored-phase ops per physics step; at
dispatch cost ~1-3us/op that dominates step time. This kernel fuses the whole
velocity iteration (all rows x all iterations) into ONE launch:

- env batch tiled (8, 128) on (sublane, lane): every row update is a full-VPU
  [6, 8, 128] op over 1024 envs;
- rows processed strictly SEQUENTIALLY in the canonical order
  joints -> contact normals -> contact frictions, per iteration — exactly
  Bullet's btSequentialImpulseConstraintSolver ordering (better fidelity than
  the XLA path's colored phases, which relax ordering within a color);
- per-row data (j, Minv*J, rhs, bounds, inv_eff: 28 floats x envs) streams
  from HBM in double-buffered chunks; velocities, impulse accumulators and
  row metadata (SMEM) stay resident in VMEM;
- friction rows clamp to mu * lam[parent_normal_row] read live from the
  accumulator (parent precedes the friction row in the order).

The same kernel also runs the split-impulse position pass (normal rows only,
push velocities) by being invoked with a different row list.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-row streamed floats: j (12) + dv_a (6) + dv_b (6) + rhs, lo, hi, inv_eff
ROW_F = 28
_J0, _DVA, _DVB, _RHS, _LO, _HI, _IEF = 0, 12, 18, 24, 25, 26, 27

LANE = 128
SUB = 8
TILE = SUB * LANE  # envs per grid step


def _sweep_kernel(
    # scalar-prefetch metadata
    idx6_a_ref,  # [NR_pad] int32: body_a * 6
    idx6_b_ref,  # [NR_pad]
    parent_ref,  # [NR_pad] int32: parent normal row for friction rows, else -1
    mu_ref,  # [NR_pad] f32: friction coefficient (friction rows)
    # tensor inputs
    row_hbm,  # [G, NR_pad, ROW_F, SUB, LANE] in ANY/HBM (full array)
    vel_in,  # [NB6, SUB, LANE] VMEM (this tile)
    lam_in,  # [NR_pad, SUB, LANE] VMEM
    # outputs
    vel_out,  # [NB6, SUB, LANE]
    lam_out,  # [NR_pad, SUB, LANE]
    # scratch
    buf,  # [2, CHUNK, ROW_F, SUB, LANE] VMEM
    sem,  # DMA semaphores [2]
    *,
    n_rows: int,
    n_iters: int,
    chunk: int,
    n_chunks: int,
):
    tile = pl.program_id(0)

    vel_out[...] = vel_in[...]
    lam_out[...] = lam_in[...]

    def dma(slot, c):
        return pltpu.make_async_copy(
            row_hbm.at[tile, pl.ds(c * chunk, chunk)], buf.at[slot], sem.at[slot]
        )

    dma(0, 0).start()
    total_chunks = n_iters * n_chunks

    def chunk_body(gc, _):
        c = jax.lax.rem(gc, n_chunks)
        slot = jax.lax.rem(gc, 2)
        nxt_slot = jax.lax.rem(gc + 1, 2)

        @pl.when(gc + 1 < total_chunks)
        def _():
            dma(nxt_slot, jax.lax.rem(gc + 1, n_chunks)).start()

        dma(slot, c).wait()

        def row_body(r, _):
            rid = c * chunk + r

            @pl.when(rid < n_rows)
            def _():
                ia = idx6_a_ref[rid]
                ib = idx6_b_ref[rid]
                par = parent_ref[rid]

                rd = buf[slot, r]  # [ROW_F, SUB, LANE]
                va = vel_out[pl.ds(ia, 6)]  # [6, SUB, LANE]
                vb = vel_out[pl.ds(ib, 6)]

                jv = jnp.sum(rd[_J0:_J0 + 6] * va, axis=0) + jnp.sum(
                    rd[_J0 + 6:_J0 + 12] * vb, axis=0
                )  # [SUB, LANE]

                lam_r = lam_out[rid]
                delta = (rd[_RHS] - jv) * rd[_IEF]

                # bounds: friction rows clamp to +-mu * lam[parent]
                lim = mu_ref[rid] * lam_out[jnp.maximum(par, 0)]
                lo = jnp.where(par >= 0, -lim, rd[_LO])
                hi = jnp.where(par >= 0, lim, rd[_HI])

                new_l = jnp.clip(lam_r + delta, lo, hi)
                d = new_l - lam_r
                lam_out[rid] = new_l
                vel_out[pl.ds(ia, 6)] = va + rd[_DVA:_DVA + 6] * d[None]
                vb2 = vel_out[pl.ds(ib, 6)]  # re-read: 'a' write may alias
                vel_out[pl.ds(ib, 6)] = vb2 + rd[_DVB:_DVB + 6] * d[None]

        jax.lax.fori_loop(0, chunk, row_body, None, unroll=True)
        return ()

    jax.lax.fori_loop(0, total_chunks, chunk_body, ())


def solver_sweep(
    row_data: jnp.ndarray,  # [B, NR, ROW_F]
    vel6: jnp.ndarray,  # [B, NB, 6]
    lam0: jnp.ndarray,  # [B, NR]
    idx6_a: np.ndarray,  # [NR] static
    idx6_b: np.ndarray,
    parent: np.ndarray,  # [NR] static, -1 where not friction
    mu: np.ndarray,  # [NR] static
    n_iters: int,
    chunk: int = 8,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused sweep; returns (vel6', lam'). B must be a multiple of
    1024 (callers pad)."""
    b, nb, _ = vel6.shape
    nr = row_data.shape[1]
    assert b % TILE == 0, f"batch {b} must be a multiple of {TILE}"
    g = b // TILE
    nr_pad = int(np.ceil(nr / chunk) * chunk)
    n_chunks = nr_pad // chunk

    # layout: env axis last, split (SUB, LANE)
    def to_tiled(x, extra):  # [B, ...extra] -> [G, ...extra, SUB, LANE]
        x = x.reshape((g, SUB, LANE) + extra)
        return jnp.moveaxis(x, (1, 2), (-2, -1))

    rd = to_tiled(row_data, (nr, ROW_F))
    if nr_pad != nr:
        pad = jnp.zeros((g, nr_pad - nr, ROW_F, SUB, LANE), rd.dtype)
        rd = jnp.concatenate([rd, pad], axis=1)
    v = to_tiled(vel6.reshape(b, nb * 6), (nb * 6,))
    l0 = to_tiled(lam0, (nr,))
    if nr_pad != nr:
        l0 = jnp.concatenate(
            [l0, jnp.zeros((g, nr_pad - nr, SUB, LANE), l0.dtype)], axis=1
        )

    idx6_a = np.concatenate([idx6_a.astype(np.int32), np.zeros(nr_pad - nr, np.int32)])
    idx6_b = np.concatenate([idx6_b.astype(np.int32), np.zeros(nr_pad - nr, np.int32)])
    parent = np.concatenate([parent.astype(np.int32), np.full(nr_pad - nr, -1, np.int32)])
    mu = np.concatenate([mu.astype(np.float32), np.zeros(nr_pad - nr, np.float32)])

    kernel = functools.partial(
        _sweep_kernel, n_rows=nr, n_iters=n_iters, chunk=chunk, n_chunks=n_chunks
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # row data stays in HBM
            pl.BlockSpec(
                (1, nb * 6, SUB, LANE), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, nb * 6, SUB, LANE), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, ROW_F, SUB, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def wrapped(idxa, idxb, par, mu_r, row_r, vel_r, lam_r, velo_r, lamo_r, buf, sem):
        kernel(
            idxa, idxb, par, mu_r,
            row_r, vel_r.at[0], lam_r.at[0], velo_r.at[0], lamo_r.at[0],
            buf, sem,
        )

    vel_out, lam_out = pl.pallas_call(
        wrapped,
        out_shape=[
            jax.ShapeDtypeStruct((g, nb * 6, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, nr_pad, SUB, LANE), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(idx6_a), jnp.asarray(idx6_b), jnp.asarray(parent), jnp.asarray(mu),
        rd, v, l0,
    )

    def from_tiled(x, extra):  # [G, ...extra, SUB, LANE] -> [B, ...extra]
        return jnp.moveaxis(x, (-2, -1), (1, 2)).reshape((b,) + extra)

    vel6_out = from_tiled(vel_out, (nb * 6,)).reshape(b, nb, 6)
    lam_flat = from_tiled(lam_out, (nr_pad,))[:, :nr]
    return vel6_out, lam_flat
