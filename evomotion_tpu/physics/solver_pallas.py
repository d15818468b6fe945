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
- the row program is FULLY UNROLLED with static metadata: row ids, body
  velocity offsets, friction parents and bound kinds are Python constants
  baked into the Mosaic program. (The first version streamed metadata
  through SMEM and used dynamic slices per row — ~1.7us/row-visit, 100%
  scalar-unit bound. Static addressing is ~50x faster.)
- per-row data (j, Minv*J, rhs, bounds, inv_eff: 28 floats x envs) streams
  from HBM in multi-buffered chunks; velocities, impulse accumulators stay
  resident in VMEM. n_chunks is padded to a multiple of n_buf so the DMA
  slot pattern repeats identically every solver iteration (the iteration
  fori_loop body must be trace-invariant);
- friction rows clamp to +-mu * lam[parent_normal_row] read live from the
  accumulator at a static address (parent precedes the friction row);
- rows whose body B is static (floor contacts) skip the B-side load/store.

The same kernel also runs the split-impulse position pass (normal rows only,
push velocities) by being invoked with a different row list.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-row streamed floats: j (12) + dv_a (6) + dv_b (6) + rhs, lo, hi, inv_eff
ROW_F = 28
_J0, _DVA, _DVB, _RHS, _LO, _HI, _IEF = 0, 12, 18, 24, 25, 26, 27
# env-last layout adds the split-impulse rhs (contact normal rows) so the
# position pass runs fused in the same sweep instead of a second kernel
ROW_FP = 29
_RHSP = 28

# slim env-last layout: TWO arrays per row — J columns (12 floats, bf16 or
# f32 per model.row_dtype) and f32 scalars (rhs, lo, hi, rhs_push). Minv*J^T
# and 1/(J Minv J^T) are recomputed in-kernel from a VMEM-resident world
# inverse-inertia tile + static per-row inverse masses: in streaming mode the
# sweep reads the row arrays from HBM once PER SOLVER ITERATION, so their
# width is the kernel's bandwidth bill (29 f32 -> 16 f32 = -45%; bf16 J ->
# 40 B/row = another -37.5%); when the row set fits VMEM
# (resident_rows_enabled) it is loaded ONCE and iterations re-read VMEM. Row gating (contact active flags, disabled friction dirs)
# is folded into J: a zeroed J gives eff = 0 -> ie = 0 -> delta = 0,
# identical to the old ie*act convention.
ROW_J = 12
ROW_S = 4
_SRHS, _SLO, _SHI, _SRHSP = 0, 1, 2, 3  # indices into the scalar array
# back-compat: fused single-array width (callers that still build [*, 16, B])
ROW_SLIM = ROW_J + ROW_S


def row_bytes(j_dtype) -> int:
    """HBM bytes the sweep streams per row-visit (roofline accounting)."""
    return ROW_J * jnp.dtype(j_dtype).itemsize + ROW_S * 4


ROW_BYTES = row_bytes(jnp.float32)


def resident_rows_enabled(nr_pad: int, j_dtype, nb6: int) -> bool:
    """True when the slim sweep will hold the whole row set VMEM-resident
    (rows DMA'd once; solver iterations never re-stream HBM). Decision =
    EVOMOTION_RESIDENT_ROWS (auto/1/0); auto admits the configuration when
    row scratch + pipelined I/O tiles fit a 116 MB budget of the chip's
    128 MB VMEM. Shared with bench.py so the roofline accounting follows
    the DMA schedule actually compiled."""
    nb9 = nb6 // 6 * 9
    scratch = nr_pad * (ROW_J * jnp.dtype(j_dtype).itemsize + ROW_S * 4) * TILE
    io = (2 * nr_pad + 3 * nb6 + nb9) * 4 * TILE
    env = os.environ.get("EVOMOTION_RESIDENT_ROWS", "auto")
    return env == "1" or (env == "auto" and scratch + 2 * io <= 116 * 2**20)

LANE = 128
SUB = 8
TILE = SUB * LANE  # envs per grid step

# row bound kinds (static per row)
KIND_JOINT = 0  # bounds streamed per env (limit/motor rows are state-dependent)
KIND_NORMAL = 1  # [0, +inf)
KIND_FRICTION = 2  # +-mu * lam[parent]


def _sweep_kernel(
    # tensor inputs
    row_hbm,  # [G, NR_pad, ROW_F, SUB, LANE] in ANY/HBM (full array)
    vel_in,  # [NB6, SUB, LANE] VMEM (this tile)
    lam_in,  # [NR_pad, SUB, LANE] VMEM
    # outputs
    vel_out,  # [NB6, SUB, LANE]
    lam_out,  # [NR_pad, SUB, LANE]
    # scratch
    buf,  # [N_BUF, CHUNK, ROW_F, SUB, LANE] VMEM
    sem,  # DMA semaphores [N_BUF]
    *,
    meta: tuple,  # static per-row (ia6, ib6, kind, mu, parent, skip_b)
    n_iters: int,
    chunk: int,
    n_chunks: int,
    n_buf: int,
    groups=None,  # static ((start, size), ...) in visit positions — see
    # engine._schedule_rows; None = strict sequential order
):
    tile = pl.program_id(0)

    vel_out[...] = vel_in[...]
    lam_out[...] = lam_in[...]

    def dma(slot, c):
        return pltpu.make_async_copy(
            row_hbm.at[tile, pl.ds(c * chunk, chunk)], buf.at[slot], sem.at[slot]
        )

    # warm-up: chunks 0..n_buf-2 (slot == chunk % n_buf throughout, which
    # requires n_chunks % n_buf == 0 so the pattern repeats per iteration)
    for w in range(n_buf - 1):
        dma(w, w).start()

    if groups is None:
        chunk_groups = [
            [(r, 1) for r in range(chunk)] for _c in range(n_chunks)
        ]
    else:
        chunk_groups = [[] for _c in range(n_chunks)]
        for st, sz in groups:
            chunk_groups[st // chunk].append((st % chunk, sz))

    def iter_body(_, carry):
        for c in range(n_chunks):
            nxt = (c + n_buf - 1) % n_chunks
            dma(nxt % n_buf, nxt).start()
            dma(c % n_buf, c).wait()
            slot = c % n_buf
            for g_off, g_size in chunk_groups[c]:
                # load/compute phase over the group's pairwise-disjoint rows
                # (same group relaxation as the slim env-last kernel)
                entries = []
                for r in range(g_off, g_off + g_size):
                    rid = c * chunk + r
                    if rid >= len(meta):
                        continue
                    ia6, ib6, kind, mu, parent, skip_b = meta[rid]
                    rd = buf[slot, r]  # [ROW_F, SUB, LANE]
                    va = vel_out[ia6:ia6 + 6]  # [6, SUB, LANE]
                    jv = jnp.sum(rd[_J0:_J0 + 6] * va, axis=0)
                    vb = None
                    if not skip_b:
                        vb = vel_out[ib6:ib6 + 6]
                        jv = jv + jnp.sum(rd[_J0 + 6:_J0 + 12] * vb, axis=0)

                    lam_r = lam_out[rid]
                    delta = (rd[_RHS] - jv) * rd[_IEF]
                    cand = lam_r + delta
                    if kind == KIND_JOINT:
                        new_l = jnp.clip(cand, rd[_LO], rd[_HI])
                    elif kind == KIND_NORMAL:
                        new_l = jnp.maximum(cand, 0.0)
                    else:  # friction: live clamp to the parent normal impulse
                        lim = mu * lam_out[parent]
                        new_l = jnp.clip(cand, -lim, lim)
                    d = new_l - lam_r
                    entries.append((rid, ia6, ib6, skip_b, rd, va, vb, new_l, d))
                for rid, ia6, ib6, skip_b, rd, va, vb, new_l, d in entries:
                    lam_out[rid] = new_l
                    vel_out[ia6:ia6 + 6] = va + rd[_DVA:_DVA + 6] * d[None]
                    if not skip_b:
                        vel_out[ib6:ib6 + 6] = vb + rd[_DVB:_DVB + 6] * d[None]
        return carry

    jax.lax.fori_loop(0, n_iters, iter_body, 0)

    # the last iteration's tail prefetched chunks 0..n_buf-2 again: drain
    for w in range(n_buf - 1):
        dma(w, w).wait()


def solver_sweep(
    row_data: jnp.ndarray,  # [B, NR, ROW_F]
    vel6: jnp.ndarray,  # [B, NB, 6]
    lam0: jnp.ndarray,  # [B, NR]
    idx6_a: np.ndarray,  # [NR] static
    idx6_b: np.ndarray,
    parent: np.ndarray,  # [NR] static, -1 where not friction
    mu: np.ndarray,  # [NR] static
    n_iters: int,
    kind: np.ndarray | None = None,  # [NR] static KIND_*; default from parent
    skip_b: np.ndarray | None = None,  # [NR] static bool; default never skip
    chunk: int = 8,
    n_buf: int = 4,
    interpret: bool = False,
    groups=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused sweep; returns (vel6', lam'). B must be a multiple of
    1024 (callers pad)."""
    b, nb, _ = vel6.shape
    nr = row_data.shape[1]
    assert b % TILE == 0, f"batch {b} must be a multiple of {TILE}"
    g = b // TILE
    # pad the chunk count to a multiple of n_buf so the DMA slot pattern is
    # identical across solver iterations (see kernel docstring)
    n_chunks = int(np.ceil(nr / chunk))
    n_chunks = int(np.ceil(n_chunks / n_buf) * n_buf)
    nr_pad = n_chunks * chunk

    if kind is None:
        kind = np.where(parent >= 0, KIND_FRICTION, KIND_JOINT)
    if skip_b is None:
        skip_b = np.zeros(nr, dtype=bool)
    meta = tuple(
        (int(idx6_a[i]), int(idx6_b[i]), int(kind[i]), float(mu[i]),
         int(parent[i]), bool(skip_b[i]))
        for i in range(nr)
    )

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

    kernel = functools.partial(
        _sweep_kernel, meta=meta, n_iters=n_iters, chunk=chunk,
        n_chunks=n_chunks, n_buf=n_buf, groups=groups,
    )

    in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # row data stays in HBM
            pl.BlockSpec(
                (1, nb * 6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    out_specs = [
            pl.BlockSpec(
                (1, nb * 6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    def wrapped(row_r, vel_r, lam_r, velo_r, lamo_r, buf, sem):
        kernel(row_r, vel_r.at[0], lam_r.at[0], velo_r.at[0], lamo_r.at[0],
               buf, sem)

    vel_out, lam_out = pl.pallas_call(
        wrapped,
        out_shape=[
            jax.ShapeDtypeStruct((g, nb * 6, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, nr_pad, SUB, LANE), jnp.float32),
        ],
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n_buf, chunk, ROW_F, SUB, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        interpret=interpret,
    )(rd, v, l0)

    def from_tiled(x, extra):  # [G, ...extra, SUB, LANE] -> [B, ...extra]
        return jnp.moveaxis(x, (-2, -1), (1, 2)).reshape((b,) + extra)

    vel6_out = from_tiled(vel_out, (nb * 6,)).reshape(b, nb, 6)
    lam_flat = from_tiled(lam_out, (nr_pad,))[:, :nr]
    return vel6_out, lam_flat


def solver_sweep_envlast(
    row_data: jnp.ndarray,  # [NR_pad, ROW_FP, B] — env axis LAST (on lanes)
    vel6: jnp.ndarray,  # [NB*6, B]
    lam0: jnp.ndarray,  # [NR_pad, B]
    idx6_a: np.ndarray,
    idx6_b: np.ndarray,
    parent: np.ndarray,
    mu: np.ndarray,
    n_iters: int,
    n_rows: int,  # real rows (row_data is already padded to NR_pad)
    kind: np.ndarray | None = None,
    skip_b: np.ndarray | None = None,
    chunk: int = 8,
    n_buf: int = 4,
    interpret: bool = False,
    groups=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Env-last variant of :func:`solver_sweep` with the split-impulse
    position pass FUSED into the same sweep.

    With the env batch on the LAST axis, the (SUB, LANE) kernel tiling is a
    pure reshape of the caller's arrays — no transposes touch HBM. Callers
    (physics/batched.py) build row data directly in this layout. B must be a
    multiple of TILE and NR_pad a multiple of chunk*n_buf (callers pad with
    zero rows at build time, which is free inside their one concatenate).

    Contact normal rows (KIND_NORMAL) carry the position-pass rhs at float
    _RHSP; each visit updates BOTH the velocity accumulator (Bullet's
    velocity iterations) and an independent push-velocity accumulator
    (solveGroupCacheFriendlySplitImpulse). The passes share no state, so
    interleaving them is numerically identical to Bullet's
    push-then-velocity phase order while streaming the row data once.

    Returns (vel6', lam', push_vel6)."""
    nr_pad, _, b = row_data.shape
    nb6 = vel6.shape[0]
    assert row_data.shape[1] == ROW_FP, row_data.shape
    assert b % TILE == 0, f"batch {b} must be a multiple of {TILE}"
    assert nr_pad % (chunk * n_buf) == 0, (nr_pad, chunk, n_buf)
    g = b // TILE
    n_chunks = nr_pad // chunk

    nr = n_rows
    if kind is None:
        kind = np.where(parent >= 0, KIND_FRICTION, KIND_JOINT)
    if skip_b is None:
        skip_b = np.zeros(nr, dtype=bool)
    # compact push-accumulator slot per contact normal row
    push_slot = np.where(
        kind[:nr] == KIND_NORMAL, np.cumsum(kind[:nr] == KIND_NORMAL) - 1, -1
    )
    n_push = max(int((kind[:nr] == KIND_NORMAL).sum()), 1)
    meta = tuple(
        (int(idx6_a[i]), int(idx6_b[i]), int(kind[i]), float(mu[i]),
         int(parent[i]), bool(skip_b[i]), int(push_slot[i]))
        for i in range(nr)
    )

    # the big row array keeps its env-last layout (pure reshape; it lives in
    # HBM and the kernel DMAs [chunk, ROW_F, tile] slices manually). The small
    # vel/lam VMEM operands need the grid axis LEADING so Mosaic pipelines
    # per-tile blocks instead of keeping the whole array VMEM-resident
    # (observed: scoped-vmem OOM with the grid axis in the middle).
    rd = row_data.reshape(nr_pad, ROW_FP, g, SUB, LANE)
    v = jnp.transpose(vel6.reshape(nb6, g, SUB, LANE), (1, 0, 2, 3))
    l0 = jnp.transpose(lam0.reshape(nr_pad, g, SUB, LANE), (1, 0, 2, 3))

    def kernel(row_r, vel_r, lam_r, velo_r, lamo_r, pvo_r, buf, pv, plam, sem):
        _sweep_kernel_envlast(
            row_r, vel_r.at[0], lam_r.at[0], velo_r.at[0],
            lamo_r.at[0], pvo_r.at[0], buf, pv, plam, sem,
            meta=meta, n_iters=n_iters, chunk=chunk, n_chunks=n_chunks,
            n_buf=n_buf, groups=groups,
        )

    vel_out, lam_out, push_out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((g, nb6, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, nr_pad, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, nb6, SUB, LANE), jnp.float32),
        ],
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
            pl.BlockSpec(
                (1, nb6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, nb6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nb6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_buf, chunk, ROW_FP, SUB, LANE), jnp.float32),
            pltpu.VMEM((nb6, SUB, LANE), jnp.float32),  # push velocities
            pltpu.VMEM((n_push, SUB, LANE), jnp.float32),  # push impulses
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        interpret=interpret,
    )(rd, v, l0)

    return (
        jnp.transpose(vel_out, (1, 0, 2, 3)).reshape(nb6, b),
        jnp.transpose(lam_out, (1, 0, 2, 3)).reshape(nr_pad, b),
        jnp.transpose(push_out, (1, 0, 2, 3)).reshape(nb6, b),
    )


def _sweep_kernel_envlast(
    row_hbm,  # [NR_pad, ROW_FP, G, SUB, LANE] in ANY/HBM
    vel_in, lam_in, vel_out, lam_out, push_out,  # VMEM tile views [X, SUB, LANE]
    buf, pv, plam, sem,
    *, meta, n_iters, chunk, n_chunks, n_buf, groups=None,
):
    """Same sweep as :func:`_sweep_kernel`, but the HBM row array carries the
    grid dim third (env-last host layout) so the chunk DMA slices rows first,
    and contact normal rows additionally advance the independent
    split-impulse position pass (accumulators pv/plam in scratch)."""
    tile = pl.program_id(0)

    vel_out[...] = vel_in[...]
    lam_out[...] = lam_in[...]
    pv[...] = jnp.zeros_like(pv)
    plam[...] = jnp.zeros_like(plam)

    def dma(slot, c):
        return pltpu.make_async_copy(
            row_hbm.at[pl.ds(c * chunk, chunk), :, tile], buf.at[slot], sem.at[slot]
        )

    for w in range(n_buf - 1):
        dma(w, w).start()

    def iter_body(_, carry):
        for c in range(n_chunks):
            nxt = (c + n_buf - 1) % n_chunks
            dma(nxt % n_buf, nxt).start()
            dma(c % n_buf, c).wait()
            slot = c % n_buf
            for r in range(chunk):
                rid = c * chunk + r
                if rid >= len(meta):
                    continue
                ia6, ib6, kind_r, mu_r, parent_r, skip_b_r, pslot = meta[rid]
                rd = buf[slot, r]  # [ROW_FP, SUB, LANE]
                va = vel_out[ia6:ia6 + 6]
                jv = jnp.sum(rd[_J0:_J0 + 6] * va, axis=0)
                if not skip_b_r:
                    vb = vel_out[ib6:ib6 + 6]
                    jv = jv + jnp.sum(rd[_J0 + 6:_J0 + 12] * vb, axis=0)

                lam_r = lam_out[rid]
                delta = (rd[_RHS] - jv) * rd[_IEF]
                cand = lam_r + delta
                if kind_r == KIND_JOINT:
                    new_l = jnp.clip(cand, rd[_LO], rd[_HI])
                elif kind_r == KIND_NORMAL:
                    new_l = jnp.maximum(cand, 0.0)
                else:
                    lim = mu_r * lam_out[parent_r]
                    new_l = jnp.clip(cand, -lim, lim)
                d = new_l - lam_r
                lam_out[rid] = new_l
                vel_out[ia6:ia6 + 6] = va + rd[_DVA:_DVA + 6] * d[None]
                if not skip_b_r:
                    vel_out[ib6:ib6 + 6] = vb + rd[_DVB:_DVB + 6] * d[None]

                if pslot >= 0:
                    # split-impulse position pass on the same row data — an
                    # independent accumulator pair, interleaved for ILP
                    pva = pv[ia6:ia6 + 6]
                    jvp = jnp.sum(rd[_J0:_J0 + 6] * pva, axis=0)
                    if not skip_b_r:
                        pvb = pv[ib6:ib6 + 6]
                        jvp = jvp + jnp.sum(rd[_J0 + 6:_J0 + 12] * pvb, axis=0)
                    pl_r = plam[pslot]
                    new_pl = jnp.maximum(pl_r + (rd[_RHSP] - jvp) * rd[_IEF], 0.0)
                    dp = new_pl - pl_r
                    plam[pslot] = new_pl
                    pv[ia6:ia6 + 6] = pva + rd[_DVA:_DVA + 6] * dp[None]
                    if not skip_b_r:
                        pv[ib6:ib6 + 6] = pvb + rd[_DVB:_DVB + 6] * dp[None]
        return carry

    jax.lax.fori_loop(0, n_iters, iter_body, 0)

    push_out[...] = pv[...]

    for w in range(n_buf - 1):
        dma(w, w).wait()


def solver_sweep_envlast_slim(
    row_j: jnp.ndarray,  # [NR_pad, ROW_J, B] J columns (bf16 or f32), env LAST
    row_s: jnp.ndarray,  # [NR_pad, ROW_S, B] f32 scalars (rhs, lo, hi, rhs_push)
    vel6: jnp.ndarray,  # [NB*6, B]
    lam0: jnp.ndarray,  # [NR_pad, B]
    iinv9: jnp.ndarray,  # [NB*9, B] world inverse inertia, row-major 3x3
    inv_mass: np.ndarray,  # [NB] static
    idx6_a: np.ndarray,
    idx6_b: np.ndarray,
    parent: np.ndarray,
    mu: np.ndarray,
    n_iters: int,
    n_rows: int,
    kind: np.ndarray | None = None,
    skip_b: np.ndarray | None = None,
    chunk: int = 8,
    n_buf: int = 4,
    interpret: bool = False,
    groups=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slim-row variant of :func:`solver_sweep_envlast` (see ROW_J/ROW_S note).

    Numerics match the fat layout up to J quantization: dv_a/dv_b = Minv J^T
    and ie = 1/(J Minv J^T) are evaluated in-kernel with the same formula and
    guard the builder used (order of adds differs -> float error ~1e-7 rel);
    with bf16 row_j the J columns carry ~0.4% relative rounding (the
    throughput configuration — strict/parity models pass f32).
    Returns (vel6', lam', push_vel6)."""
    nr_pad, _, b = row_j.shape
    nb6 = vel6.shape[0]
    assert row_j.shape[1] == ROW_J, row_j.shape
    assert row_s.shape == (nr_pad, ROW_S, b), (row_s.shape, row_j.shape)
    assert b % TILE == 0, f"batch {b} must be a multiple of {TILE}"
    g = b // TILE
    n_chunks = nr_pad // chunk

    # VMEM-resident rows (EVOMOTION_RESIDENT_ROWS=auto/1/0): when the whole
    # per-tile row set + I/O tiles fit the chip's VMEM, give every chunk a
    # dedicated slot and load rows ONCE instead of once per solver iteration
    # — the stream is the kernel's dominant HBM traffic (n_iters x ~78 MB
    # per tile for the spider at bf16).
    nb9 = nb6 // 6 * 9
    resident = resident_rows_enabled(nr_pad, row_j.dtype, nb6)
    if resident:
        n_buf = n_chunks
    assert nr_pad % (chunk * n_buf) == 0, (nr_pad, chunk, n_buf)

    nr = n_rows
    if kind is None:
        kind = np.where(parent >= 0, KIND_FRICTION, KIND_JOINT)
    if skip_b is None:
        skip_b = np.zeros(nr, dtype=bool)
    push_slot = np.where(
        kind[:nr] == KIND_NORMAL, np.cumsum(kind[:nr] == KIND_NORMAL) - 1, -1
    )
    n_push = max(int((kind[:nr] == KIND_NORMAL).sum()), 1)
    meta = tuple(
        (int(idx6_a[i]), int(idx6_b[i]), int(kind[i]), float(mu[i]),
         int(parent[i]), bool(skip_b[i]), int(push_slot[i]),
         float(inv_mass[idx6_a[i] // 6]), float(inv_mass[idx6_b[i] // 6]))
        for i in range(nr)
    )

    j_dtype = row_j.dtype
    rj = row_j.reshape(nr_pad, ROW_J, g, SUB, LANE)
    rs = row_s.reshape(nr_pad, ROW_S, g, SUB, LANE)
    v = jnp.transpose(vel6.reshape(nb6, g, SUB, LANE), (1, 0, 2, 3))
    l0 = jnp.transpose(lam0.reshape(nr_pad, g, SUB, LANE), (1, 0, 2, 3))
    ii = jnp.transpose(iinv9.reshape(nb6 // 6 * 9, g, SUB, LANE), (1, 0, 2, 3))

    def kernel(rowj_r, rows_r, vel_r, lam_r, ii_r, velo_r, lamo_r, pvo_r,
               buf_j, buf_s, plam, sem_j, sem_s):
        _sweep_kernel_envlast_slim(
            rowj_r, rows_r, vel_r.at[0], lam_r.at[0], ii_r.at[0], velo_r.at[0],
            lamo_r.at[0], pvo_r.at[0], buf_j, buf_s, plam, sem_j, sem_s,
            meta=meta, n_iters=n_iters, chunk=chunk, n_chunks=n_chunks,
            n_buf=n_buf, groups=groups, resident=resident,
        )

    # VMEM budget at large row counts (K=4 member manifolds -> ~1.9k rows,
    # lam tile ~7.9 MB x in+out = ~24 MB scoped): the push-velocity output
    # doubles as its own accumulator (no pv scratch) and the kernel raises
    # Mosaic's per-kernel VMEM ceiling — the 16 MB default is a compiler
    # reservation, not the chip's 128 MB physical VMEM.
    vel_out, lam_out, push_out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((g, nb6, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, nr_pad, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, nb6, SUB, LANE), jnp.float32),
        ],
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # J rows stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # scalar rows stay in HBM
            pl.BlockSpec(
                (1, nb6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nb9, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, nb6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nr_pad, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nb6, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (nr_pad, ROW_J, SUB, LANE) if resident
                else (n_buf, chunk, ROW_J, SUB, LANE), j_dtype,
            ),
            pltpu.VMEM(
                (nr_pad, ROW_S, SUB, LANE) if resident
                else (n_buf, chunk, ROW_S, SUB, LANE), jnp.float32,
            ),
            pltpu.VMEM((n_push, SUB, LANE), jnp.float32),  # push impulses
            pltpu.SemaphoreType.DMA((1 if resident else n_buf,)),
            pltpu.SemaphoreType.DMA((1 if resident else n_buf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(127 if resident else 100) * 1024 * 1024
        ),
        interpret=interpret,
    )(rj, rs, v, l0, ii)

    return (
        jnp.transpose(vel_out, (1, 0, 2, 3)).reshape(nb6, b),
        jnp.transpose(lam_out, (1, 0, 2, 3)).reshape(nr_pad, b),
        jnp.transpose(push_out, (1, 0, 2, 3)).reshape(nb6, b),
    )


def _sweep_kernel_envlast_slim(
    rowj_hbm,  # [NR_pad, ROW_J, G, SUB, LANE] in ANY/HBM (bf16 or f32)
    rows_hbm,  # [NR_pad, ROW_S, G, SUB, LANE] in ANY/HBM (f32)
    vel_in, lam_in, ii_in, vel_out, lam_out, pv, # VMEM tile views
    buf_j, buf_s, plam, sem_j, sem_s,
    *, meta, n_iters, chunk, n_chunks, n_buf, groups=None, resident=False,
):
    """Slim-row sweep: streams 12 J values (bf16 or f32) + 4 f32 scalars per
    row, recomputes dv and 1/eff from the VMEM inverse-inertia tile (ii_in,
    [NB*9, SUB, LANE]) and static per-row inverse masses. Otherwise identical
    in structure to :func:`_sweep_kernel_envlast` (fused velocity +
    split-impulse passes). vel/lam inputs are aliased onto the outputs and
    the push-velocity output (pv) doubles as its own accumulator — VMEM
    budget, see the caller.

    resident=True (n_buf == n_chunks): every chunk gets a dedicated VMEM
    slot, the whole row set is DMA'd ONCE (windowed issue, ~0.1 ms for the
    spider's ~78 MB tile), and all n_iters solver iterations then read rows
    from VMEM — the per-iteration HBM re-stream (the kernel's dominant
    traffic, n_iters x rows) disappears. Streaming mode (default) is the
    fallback when the row set does not fit the VMEM budget (f32 rows /
    strict mode / very large models)."""
    tile = pl.program_id(0)

    vel_out[...] = vel_in[...]
    lam_out[...] = lam_in[...]
    pv[...] = jnp.zeros_like(pv[...])
    plam[...] = jnp.zeros_like(plam[...])

    def dma(slot, c):
        return (
            pltpu.make_async_copy(
                rowj_hbm.at[pl.ds(c * chunk, chunk), :, tile], buf_j.at[slot],
                sem_j.at[slot],
            ),
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(c * chunk, chunk), :, tile], buf_s.at[slot],
                sem_s.at[slot],
            ),
        )

    def dma_start(slot, c):
        a, b_ = dma(slot, c)
        a.start()
        b_.start()

    def dma_wait(slot, c):
        a, b_ = dma(slot, c)
        a.wait()
        b_.wait()

    def matvec(ii, jang):
        # [9, SUB, LANE] row-major 3x3 times [3, SUB, LANE]
        return jnp.stack(
            [
                ii[0] * jang[0] + ii[1] * jang[1] + ii[2] * jang[2],
                ii[3] * jang[0] + ii[4] * jang[1] + ii[5] * jang[2],
                ii[6] * jang[0] + ii[7] * jang[1] + ii[8] * jang[2],
            ],
            axis=0,
        )

    if groups is None:
        chunk_groups = [
            [(r, 1) for r in range(chunk)] for _c in range(n_chunks)
        ]
    else:
        chunk_groups = [[] for _c in range(n_chunks)]
        for st, sz in groups:
            chunk_groups[st // chunk].append((st % chunk, sz))

    def process(c, slot):
        for g_off, g_size in chunk_groups[c]:
                # --- LOAD/COMPUTE phase: rows in one group touch pairwise
                # disjoint bodies (engine._schedule_rows), so all their
                # velocity loads are independent of this group's stores —
                # giving Mosaic provably overlappable work instead of a
                # serial load-update-store chain per row ---
                entries = []
                for r in range(g_off, g_off + g_size):
                    rid = c * chunk + r
                    if rid >= len(meta):
                        continue
                    (ia6, ib6, kind_r, mu_r, parent_r, skip_b_r, pslot,
                     im_a, im_b) = meta[rid]
                    if resident:  # flat [NR_pad, ROW_*, SUB, LANE] buffers
                        rd = buf_j[rid].astype(jnp.float32)
                        rs = buf_s[rid]
                    else:
                        rd = buf_j[slot, r].astype(jnp.float32)  # [ROW_J, SUB, LANE]
                        rs = buf_s[slot, r]  # [ROW_S, SUB, LANE]
                    ia9 = ia6 // 6 * 9
                    dva = jnp.concatenate(
                        [im_a * rd[0:3], matvec(ii_in[ia9:ia9 + 9], rd[3:6])],
                        axis=0,
                    )  # [6, SUB, LANE]
                    eff = jnp.sum(rd[0:6] * dva, axis=0)
                    va = vel_out[ia6:ia6 + 6]
                    jv = jnp.sum(rd[0:6] * va, axis=0)
                    dvb = vb = None
                    if not skip_b_r:
                        ib9 = ib6 // 6 * 9
                        dvb = jnp.concatenate(
                            [im_b * rd[6:9], matvec(ii_in[ib9:ib9 + 9], rd[9:12])],
                            axis=0,
                        )
                        eff = eff + jnp.sum(rd[6:12] * dvb, axis=0)
                        vb = vel_out[ib6:ib6 + 6]
                        jv = jv + jnp.sum(rd[6:12] * vb, axis=0)
                    ie = jnp.where(eff > 1e-12, 1.0 / jnp.maximum(eff, 1e-12), 0.0)

                    lam_r = lam_out[rid]
                    cand = lam_r + (rs[_SRHS] - jv) * ie
                    if kind_r == KIND_JOINT:
                        new_l = jnp.clip(cand, rs[_SLO], rs[_SHI])
                    elif kind_r == KIND_NORMAL:
                        new_l = jnp.maximum(cand, 0.0)
                    else:
                        lim = mu_r * lam_out[parent_r]  # parent: earlier group
                        new_l = jnp.clip(cand, -lim, lim)
                    d = new_l - lam_r

                    pp = None
                    if pslot >= 0:
                        pva = pv[ia6:ia6 + 6]
                        jvp = jnp.sum(rd[0:6] * pva, axis=0)
                        pvb = None
                        if not skip_b_r:
                            pvb = pv[ib6:ib6 + 6]
                            jvp = jvp + jnp.sum(rd[6:12] * pvb, axis=0)
                        pl_r = plam[pslot]
                        new_pl = jnp.maximum(pl_r + (rs[_SRHSP] - jvp) * ie, 0.0)
                        pp = (pva, pvb, new_pl, new_pl - pl_r)
                    entries.append(
                        (rid, ia6, ib6, skip_b_r, pslot, dva, dvb, va, vb,
                         new_l, d, pp)
                    )
                # --- STORE phase ---
                for (rid, ia6, ib6, skip_b_r, pslot, dva, dvb, va, vb,
                     new_l, d, pp) in entries:
                    lam_out[rid] = new_l
                    vel_out[ia6:ia6 + 6] = va + dva * d[None]
                    if not skip_b_r:
                        vel_out[ib6:ib6 + 6] = vb + dvb * d[None]
                    if pslot >= 0:
                        pva, pvb, new_pl, dp = pp
                        plam[pslot] = new_pl
                        pv[ia6:ia6 + 6] = pva + dva * dp[None]
                        if not skip_b_r:
                            pv[ib6:ib6 + 6] = pvb + dvb * dp[None]

    if resident:
        # ONE strided DMA per row array (flat [NR_pad, ROW_*, SUB, LANE]
        # buffers, 2 semaphores total — a semaphore per chunk overflows the
        # chip's tiny sflag memory space); the solver iterations then never
        # touch HBM for rows
        cp_j = pltpu.make_async_copy(
            rowj_hbm.at[:, :, tile], buf_j, sem_j.at[0]
        )
        cp_s = pltpu.make_async_copy(
            rows_hbm.at[:, :, tile], buf_s, sem_s.at[0]
        )
        cp_j.start()
        cp_s.start()
        cp_j.wait()
        cp_s.wait()

        def iter_body(_, carry):
            for c in range(n_chunks):
                process(c, c)
            return carry

        jax.lax.fori_loop(0, n_iters, iter_body, 0)
    else:
        for w in range(n_buf - 1):
            dma_start(w, w)

        def iter_body(_, carry):
            for c in range(n_chunks):
                nxt = (c + n_buf - 1) % n_chunks
                dma_start(nxt % n_buf, nxt)
                dma_wait(c % n_buf, c)
                process(c, c % n_buf)
            return carry

        jax.lax.fori_loop(0, n_iters, iter_body, 0)

        for w in range(n_buf - 1):
            dma_wait(w, w)
