"""Env-last (batch-on-lanes) physics step — the TPU fast path.

The vmapped form of :func:`engine.physics_step` puts the env batch on the
LEADING axis, so every intermediate array has tiny trailing dims (3, 4, 28)
and XLA tiles them onto the VPU's (8 sublanes, 128 lanes) registers at a few
percent lane utilization; measured on a v5e, the row build alone cost ~4 ms
at 2048 envs. This module implements the identical step math with the env
batch on the LAST axis, so every elementwise op runs on dense [*, B] tiles
(128 envs per lane row) and the packed row matrix [NR, 28, B] is produced
directly in the solver kernel's (G, SUB, LANE) layout — the kernel call is a
pure reshape, no transposes touch HBM.

Wired in via ``jax.custom_batching.custom_vmap`` on ``engine.physics_step``
(solver="pallas"): single-env calls keep the engine's per-env path; vmapped
calls land here. Numerics mirror engine.py line for line (same formulas,
same row order, same solver kernel) — see tests/test_batched_step.py for the
vmapped-vs-per-env equivalence check.

Reference: the whole `stepSimulation` hot path of
evo_motion_model/src/environment.cpp:41-43 (Bullet Mt world), re-laid-out for
SPMD lanes instead of CPU threads.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import engine as E
from .model import MAX_CONTACTS_PER_PAIR, PhysicsModel

# ---------------------------------------------------------------------------
# env-last math: vectors are [..., 3, B], quats [..., 4, B] (components on the
# second-to-last axis, envs on lanes)
# ---------------------------------------------------------------------------


def _dot(a, b):
    return jnp.sum(a * b, axis=-2)


def _cross(a, b):
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-2
    )


def _qmul(q1, q2):
    x1, y1, z1, w1 = q1[..., 0, :], q1[..., 1, :], q1[..., 2, :], q1[..., 3, :]
    x2, y2, z2, w2 = q2[..., 0, :], q2[..., 1, :], q2[..., 2, :], q2[..., 3, :]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-2,
    )


def _qconj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0])[:, None]


def _qrot(q, v):
    """Rotate v [..., 3, B] by q [..., 4, B] (same formula as maths.quat_rotate)."""
    qv = q[..., :3, :]
    w = q[..., 3:4, :]
    t = 2.0 * _cross(qv, v)
    return v + w * t + _cross(qv, t)


def _q2m(q):
    """Rotation matrix [..., 3, 3, B] from quat [..., 4, B]."""
    x, y, z, w = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(x)
    rows = [
        [one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy)],
    ]
    return jnp.stack([jnp.stack(r, axis=-2) for r in rows], axis=-3)


def _qnormalize(q, eps=1e-12):
    n = jnp.sqrt(jnp.sum(q * q, axis=-2, keepdims=True))
    return q / jnp.maximum(n, eps)


def _qintegrate(q, omega, dt):
    """btTransformUtil::integrateTransform (mirrors maths.quat_integrate)."""
    from .maths import _ANGULAR_MOTION_THRESHOLD

    angle = jnp.sqrt(jnp.sum(omega * omega, axis=-2, keepdims=True))
    limit = _ANGULAR_MOTION_THRESHOLD / dt
    angle = jnp.minimum(angle, limit)
    half = angle * (dt * 0.5)
    small = angle * dt < 0.001
    factor = jnp.where(
        small,
        0.5 * dt - (dt * dt * dt) * (1.0 / 48.0) * angle * angle,
        jnp.sin(half) / jnp.maximum(angle, 1e-12),
    )
    axis = omega * factor
    dorn = jnp.concatenate([axis, jnp.cos(half)], axis=-2)
    return _qnormalize(_qmul(dorn, q))


def _plane_space(n):
    """btPlaneSpace1 for env-last normals [..., 3, B]."""
    nx, ny, nz = n[..., 0, :], n[..., 1, :], n[..., 2, :]
    use_z = jnp.abs(nz) > 0.70710678
    a_z = ny * ny + nz * nz
    k_z = jax.lax.rsqrt(jnp.maximum(a_z, 1e-18))
    p_z = jnp.stack([jnp.zeros_like(nx), -nz * k_z, ny * k_z], -2)
    q_z = jnp.stack([a_z * k_z, -nx * p_z[..., 2, :], nx * p_z[..., 1, :]], -2)
    a_x = nx * nx + ny * ny
    k_x = jax.lax.rsqrt(jnp.maximum(a_x, 1e-18))
    p_x = jnp.stack([-ny * k_x, nx * k_x, jnp.zeros_like(nx)], -2)
    q_x = jnp.stack([-nz * p_x[..., 1, :], nz * p_x[..., 0, :], a_x * k_x], -2)
    uz = use_z[..., None, :]
    return jnp.where(uz, p_z, p_x), jnp.where(uz, q_z, q_x)


def _friction_dirs(n, rel_vel, strict):
    """Env-last mirror of engine._friction_dirs (axis -2 components)."""
    p1, p2 = _plane_space(n)
    if not strict:
        return p1, p2, 1.0
    lat = rel_vel - n * jnp.sum(rel_vel * n, -2, keepdims=True)
    lat2 = jnp.sum(lat * lat, -2, keepdims=True)
    t1 = jnp.where(
        lat2 > 1.19209290e-07,
        lat * jax.lax.rsqrt(jnp.maximum(lat2, 1e-30)),
        p1,
    )
    return t1, p2, 0.0


def _rot_error_vec(quat_fa_w, quat_fb_w):
    q_err = _qmul(quat_fb_w, _qconj(quat_fa_w))
    sign = jnp.where(q_err[..., 3:4, :] < 0, -1.0, 1.0)
    return 2.0 * q_err[..., :3, :] * sign


# ---------------------------------------------------------------------------
# row building (env-last mirrors of engine.py's builders)
# ---------------------------------------------------------------------------


def _point_rows(pa, pb, com_a, com_b, dirs):
    """Point-coincidence rows; pivots/coms [N, 1, 3, B], dirs [N, D, 3, B].

    Returns (j [N, D, 4, 3, B], c [N, D, B]) — engine._point_rows env-last."""
    r_a = jnp.broadcast_to(pa - com_a, dirs.shape)
    r_b = jnp.broadcast_to(pb - com_b, dirs.shape)
    j = jnp.stack(
        [dirs, _cross(r_a, dirs), -dirs, -_cross(r_b, dirs)], axis=-3
    )
    c = jnp.sum((pa - pb) * dirs, -2)
    return j, c


def _ang_rows(dirs):
    zeros = jnp.zeros_like(dirs)
    return jnp.stack([zeros, dirs, zeros, -dirs], axis=-3)


def _pack(j, rhs, lo, hi, rhs_push=None, j_dtype=jnp.float32):
    """Pack one kind's rows into the slim two-stream layout: J columns
    [n, ROW_J, B] (cast to j_dtype — bf16 halves the kernel's row traffic)
    and f32 scalars [n, ROW_S, B] (rhs, lo, hi, rhs_push).

    j [n, 4, 3, B]; scalars [n, B]. Minv*J^T and 1/eff are recomputed
    in-kernel (solver_pallas); row gating is folded into J by the callers
    (zeroed J -> eff 0 -> ie 0 -> no-op row). rhs_push fills the
    split-impulse column of contact normal rows (zero elsewhere)."""
    n, _, _, b = j.shape
    if rhs_push is None:
        rhs_push = jnp.zeros_like(rhs)
    return (
        j.reshape(n, 12, b).astype(j_dtype),
        jnp.concatenate(
            [rhs[:, None], lo[:, None], hi[:, None], rhs_push[:, None]], axis=1
        ),
    )


def _finish_dv(model, idx_a, idx_b, j, iinv_world):
    """Minv*J for flat rows j [NR, 4, 3, B] (warm-start application only —
    the solver recomputes dv in-kernel from the slim layout)."""
    inv_m_a = jnp.asarray(model.inv_mass[idx_a])[:, None, None]
    inv_m_b = jnp.asarray(model.inv_mass[idx_b])[:, None, None]
    ii_a = iinv_world[idx_a]  # [NR, 3, 3, B]
    ii_b = iinv_world[idx_b]
    dva_lin = inv_m_a * j[:, 0]
    dva_ang = jnp.einsum("rijn,rjn->rin", ii_a, j[:, 1])
    dvb_lin = inv_m_b * j[:, 2]
    dvb_ang = jnp.einsum("rijn,rjn->rin", ii_b, j[:, 3])
    dv_a = jnp.stack([dva_lin, dva_ang], axis=1)
    dv_b = jnp.stack([dvb_lin, dvb_ang], axis=1)
    return dv_a, dv_b


def build_joint_rows(model: PhysicsModel, pos, quat, iinv_world, motor_target,
                     motor_enabled, dt, j_dtype=jnp.float32):
    """Env-last build of all joint rows; returns (j [NRJ, 12, B] in j_dtype,
    scalars [NRJ, 4, B] f32, slider_lin_pos).

    Same canonical order and formulas as engine.build_joint_rows."""
    b = pos.shape[-1]
    erp_dt = E.ERP / dt
    inf = jnp.inf
    parts_j, parts_rhs, parts_lo, parts_hi = [], [], [], []

    def emit(j, rhs, lo, hi):
        # [n_blocks, rows_per_block, ...] -> block-major flat rows
        nb_, rpb = rhs.shape[:2]
        parts_j.append(j.reshape(nb_ * rpb, 4, 3, b))
        parts_rhs.append(rhs.reshape(nb_ * rpb, b))
        parts_lo.append(jnp.broadcast_to(lo, rhs.shape).reshape(nb_ * rpb, b))
        parts_hi.append(jnp.broadcast_to(hi, rhs.shape).reshape(nb_ * rpb, b))

    def eye_dirs(n):
        return jnp.broadcast_to(jnp.eye(3)[None, :, :, None], (n, 3, 3, b))

    # ---- p2p ----
    if model.n_p2p:
        ia, ib = model.p2p_body[:, 0], model.p2p_body[:, 1]
        piv = jnp.asarray(model.p2p_pivot)[..., None]  # [N, 2, 3, 1]
        pa = pos[ia] + _qrot(quat[ia], piv[:, 0])
        pb = pos[ib] + _qrot(quat[ib], piv[:, 1])
        dirs = eye_dirs(model.n_p2p)
        j, c = _point_rows(pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs)
        emit(j, -erp_dt * c, -inf, inf)

    # ---- hinge ----
    if model.n_hinge:
        ia, ib = model.hinge_body[:, 0], model.hinge_body[:, 1]
        piv = jnp.asarray(model.hinge_pivot)[..., None]
        fq = jnp.asarray(model.hinge_frame_quat)[..., None]
        lim = model.hinge_limit  # static numpy
        pa = pos[ia] + _qrot(quat[ia], piv[:, 0])
        pb = pos[ib] + _qrot(quat[ib], piv[:, 1])
        qa_f = _qmul(quat[ia], jnp.broadcast_to(fq[:, 0], quat[ia].shape))
        qb_f = _qmul(quat[ib], jnp.broadcast_to(fq[:, 1], quat[ib].shape))
        ra = _q2m(qa_f)  # [N, 3, 3, B]
        rb = _q2m(qb_f)
        ax_a, p, q = ra[..., :, 2, :], ra[..., :, 0, :], ra[..., :, 1, :]
        ax_b = rb[..., :, 2, :]

        dirs = eye_dirs(model.n_hinge)
        j_lin, c_lin = _point_rows(pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs)

        u = _cross(ax_a, ax_b)
        dirs_ang = jnp.stack([p, q], axis=1)
        j_ang = _ang_rows(dirs_ang)
        rhs_ang = erp_dt * jnp.sum(u[:, None] * dirs_ang, -2)

        ref_x, ref_y = ra[..., :, 0, :], ra[..., :, 1, :]
        swing = rb[..., :, 1, :]
        angle = jnp.arctan2(_dot(swing, ref_x), _dot(swing, ref_y))
        lo_l = jnp.asarray(lim[:, 0])[:, None]
        hi_l = jnp.asarray(lim[:, 1])[:, None]
        angle = E._adjust_angle_to_limits(angle, lo_l, hi_l)
        has_limit = lo_l <= hi_l
        below = angle < lo_l
        above = angle > hi_l
        j_lim = _ang_rows(ax_a[:, None])[:, 0]
        corr = jnp.where(below, lo_l - angle, jnp.where(above, hi_l - angle, 0.0))
        rhs_lim = jnp.clip(
            E.HINGE_LIMIT_BIAS / dt * corr, -E.LIMIT_BIAS_CAP, E.LIMIT_BIAS_CAP
        )
        lo_b = jnp.where(has_limit & below, 0.0, jnp.where(has_limit & above, -inf, 0.0))
        hi_b = jnp.where(has_limit & below, inf, 0.0)

        nh = model.n_hinge
        j_all = jnp.concatenate([j_lin, j_ang, j_lim[:, None]], axis=1)
        rhs_all = jnp.concatenate([-erp_dt * c_lin, rhs_ang, rhs_lim[:, None]], axis=1)
        lo_all = jnp.concatenate(
            [jnp.full((nh, 5, b), -inf), jnp.broadcast_to(lo_b[:, None], (nh, 1, b))], axis=1
        )
        hi_all = jnp.concatenate(
            [jnp.full((nh, 5, b), inf), jnp.broadcast_to(hi_b[:, None], (nh, 1, b))], axis=1
        )
        emit(j_all, rhs_all, lo_all, hi_all)

    # ---- fixed ----
    if model.n_fixed:
        ia, ib = model.fixed_body[:, 0], model.fixed_body[:, 1]
        piv = jnp.asarray(model.fixed_pivot)[..., None]
        fq = jnp.asarray(model.fixed_frame_quat)[..., None]
        pa = pos[ia] + _qrot(quat[ia], piv[:, 0])
        pb = pos[ib] + _qrot(quat[ib], piv[:, 1])
        dirs = eye_dirs(model.n_fixed)
        j_lin, c_lin = _point_rows(pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs)
        qa_f = _qmul(quat[ia], jnp.broadcast_to(fq[:, 0], quat[ia].shape))
        qb_f = _qmul(quat[ib], jnp.broadcast_to(fq[:, 1], quat[ib].shape))
        err = _rot_error_vec(qa_f, qb_f)
        j_ang = _ang_rows(dirs)
        rhs_ang = erp_dt * jnp.sum(err[:, None] * dirs, -2)
        j_all = jnp.concatenate([j_lin, j_ang], axis=1)
        rhs_all = jnp.concatenate([-erp_dt * c_lin, rhs_ang], axis=1)
        emit(j_all, rhs_all, -inf, inf)

    # ---- slider ----
    slider_lin_pos = jnp.zeros((model.n_slider, b))
    if model.n_slider:
        ia, ib = model.slider_body[:, 0], model.slider_body[:, 1]
        piv = jnp.asarray(model.slider_pivot)[..., None]
        fq = jnp.asarray(model.slider_frame_quat)[..., None]
        lim = model.slider_lin_limit
        max_f = jnp.asarray(model.slider_max_motor_force)[:, None]

        pa = pos[ia] + _qrot(quat[ia], piv[:, 0])
        pb = pos[ib] + _qrot(quat[ib], piv[:, 1])
        qa_f = _qmul(quat[ia], jnp.broadcast_to(fq[:, 0], quat[ia].shape))
        qb_f = _qmul(quat[ib], jnp.broadcast_to(fq[:, 1], quat[ib].shape))
        ra = _q2m(qa_f)
        axis, p, q = ra[..., :, 0, :], ra[..., :, 1, :], ra[..., :, 2, :]

        delta = pb - pa
        lin_pos = _dot(delta, axis)
        slider_lin_pos = lin_pos

        dirs_perp = jnp.stack([p, q], axis=1)
        j_perp, c_perp = _point_rows(
            pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs_perp
        )

        err = _rot_error_vec(qa_f, qb_f)
        dirs3 = eye_dirs(model.n_slider)
        j_ang = _ang_rows(dirs3)
        rhs_ang = erp_dt * jnp.sum(err[:, None] * dirs3, -2)

        r_a = pa - pos[ia]
        r_b = pb - pos[ib]
        j_axial = jnp.stack(
            [-axis, -_cross(r_a, axis), axis, _cross(r_b, axis)], axis=-3
        )
        lo_l = jnp.asarray(lim[:, 0])[:, None]
        hi_l = jnp.asarray(lim[:, 1])[:, None]
        has_lim = lo_l <= hi_l
        locked = jnp.abs(hi_l - lo_l) < 1e-9
        below = lin_pos < lo_l
        above = lin_pos > hi_l
        corr = jnp.where(
            locked, lo_l - lin_pos,
            jnp.where(below, lo_l - lin_pos, jnp.where(above, hi_l - lin_pos, 0.0)),
        )
        rhs_lim = jnp.clip(erp_dt * corr, -E.LIMIT_BIAS_CAP, E.LIMIT_BIAS_CAP)
        lo_b = jnp.where(
            has_lim,
            jnp.where(locked, -inf, jnp.where(below, 0.0, jnp.where(above, -inf, 0.0))),
            0.0,
        )
        hi_b = jnp.where(
            has_lim,
            jnp.where(locked, inf, jnp.where(below, inf, jnp.where(above, 0.0, 0.0))),
            0.0,
        )
        mot_fact = E._motor_factor(lin_pos, lo_l, hi_l, motor_target, 1.0 / dt)
        rhs_mot = mot_fact * motor_target
        imp = jnp.where(motor_enabled, max_f * dt, 0.0)

        ns = model.n_slider
        j_all = jnp.concatenate(
            [j_perp, j_ang, j_axial[:, None], j_axial[:, None]], axis=1
        )
        rhs_all = jnp.concatenate(
            [-erp_dt * c_perp, rhs_ang, rhs_lim[:, None], rhs_mot[:, None]], axis=1
        )
        lo_all = jnp.concatenate(
            [jnp.full((ns, 5, b), -inf), lo_b[:, None], -imp[:, None]], axis=1
        )
        hi_all = jnp.concatenate(
            [jnp.full((ns, 5, b), inf), hi_b[:, None], imp[:, None]], axis=1
        )
        emit(j_all, rhs_all, lo_all, hi_all)

    if parts_j:
        j = jnp.concatenate(parts_j, 0)
        rhs = jnp.concatenate(parts_rhs, 0)
        lo = jnp.concatenate(parts_lo, 0)
        hi = jnp.concatenate(parts_hi, 0)
    else:
        j = jnp.zeros((0, 4, 3, b))
        rhs = lo = hi = jnp.zeros((0, b))
    jj, ss = _pack(j, rhs, lo, hi, j_dtype=j_dtype)
    return jj, ss, slider_lin_pos


# ---------------------------------------------------------------------------
# contacts
# ---------------------------------------------------------------------------


def detect_contacts(model: PhysicsModel, pos, quat):
    """Hull-vertex vs static-face contacts, deepest K per pair (env-last).

    Returns (point [NP,K,3,B], normal [NP,K,3,B], gap [NP,K,B],
    active [NP,K,B] bool, vid [NP,K,B] int32) — engine.detect_contacts."""
    planes_np, _ = E._get_static_planes(model)
    b = pos.shape[-1]
    k = MAX_CONTACTS_PER_PAIR

    pair = model.pair_body
    static_sel = model.inv_mass[pair[:, 1]] == 0.0
    pairs = pair[np.asarray(static_sel)]
    n_pair = len(pairs)
    if n_pair == 0:
        z = jnp.zeros((0, k, b))
        return (
            jnp.zeros((0, k, 3, b)), jnp.zeros((0, k, 3, b)), z, z > 0,
            jnp.zeros((0, k, b), jnp.int32),
        )

    ia, ib = pairs[:, 0], pairs[:, 1]
    hull = jnp.asarray(model.hull[ia])  # static [NP, V, 3]
    hmask = model.hull_mask[ia]  # static numpy [NP, V]
    nv = hull.shape[1]
    # world verts [NP, V, 3, B]
    world = pos[ia][:, None] + _qrot(quat[ia][:, None], hull[..., None])

    pl3 = jnp.asarray(planes_np[ib][..., :3])  # [NP, F, 3]
    off = jnp.asarray(planes_np[ib][..., 3])  # [NP, F]
    d = jnp.einsum("pvin,pfi->pvfn", world, pl3) + off[:, None, :, None]
    face = jnp.argmax(d, axis=2)  # [NP, V, B]
    dist = jnp.max(d, axis=2)
    marg = (model.margin[ia] + model.margin[ib]).astype(np.float32)  # [NP]
    gap = dist - jnp.asarray(marg)[:, None, None]
    gap = jnp.where(jnp.asarray(hmask)[:, :, None] > 0, gap, 1e9)

    # deepest-K selection along the vertex axis (iterative argmin == the
    # engine's lax.top_k(-gap) including first-index tie-breaking)
    iota_v = jnp.arange(nv)[None, :, None]
    g = gap
    sel_gap, sel_pt, sel_n, vids = [], [], [], []
    facef = face.astype(jnp.float32)
    nf = pl3.shape[1]
    iota_f = jnp.arange(nf)[None, :, None]
    for _ in range(k):
        vid = jnp.argmin(g, axis=1)  # [NP, B]
        oh = (iota_v == vid[:, None, :]).astype(jnp.float32)  # [NP, V, B]
        sel_gap.append(jnp.min(g, axis=1))
        sel_pt.append(jnp.einsum("pvn,pvin->pin", oh, world))
        f_sel = jnp.sum(oh * facef, axis=1)  # [NP, B]
        ohf = (iota_f == f_sel[:, None, :].astype(jnp.int32)).astype(jnp.float32)
        sel_n.append(jnp.einsum("pfn,pfi->pin", ohf, pl3))
        vids.append(vid.astype(jnp.int32))
        g = jnp.where(oh > 0, 1e9, g)

    gap_k = jnp.stack(sel_gap, axis=1)  # [NP, K, B]
    pt_k = jnp.stack(sel_pt, axis=1)  # [NP, K, 3, B]
    n_k = jnp.stack(sel_n, axis=1)
    vid_k = jnp.stack(vids, axis=1)
    active = gap_k < E.CONTACT_BREAKING
    return pt_k, n_k, gap_k, active, vid_k


def _dyn_narrowphase_sel(model: PhysicsModel, pos, quat):
    """Top-M broadphase-culled member narrowphase (model.member_topm > 0).

    Bullet runs narrowphase only on broadphase-overlapping pairs
    (btDbvtBroadphase feeds the dispatcher manifolds that
    `/root/reference/evo_motion_model/src/item.cpp:17-52` reads); the dense
    batched mirror paid all P pairs per env per step even though a walking
    spider has only ~a dozen pairs within reach at any instant. This path
    selects, per env, the M pairs with smallest conservative clearance
    (center distance minus bounding radii, margins included), runs the
    IDENTICAL SAT math of `_dyn_narrowphase` on the gathered subset, and
    scatters the manifolds back to canonical pair slots. Unselected pairs
    get gap=+1e9 / vid=-1 — exactly the inactive manifold the dense path
    produces for beyond-margin pairs — so trajectories are unchanged while
    the narrowphase VPU work drops by ~P/M. Equality vs the dense path is
    pinned by tests/test_batched_step.py::test_member_topm_matches_dense.
    """
    dp = model.dyn_pair_body
    kd = model.member_manifold_k
    b = pos.shape[-1]
    npair = len(dp)
    m_sel = int(model.member_topm)
    hull = model.np_hull  # static numpy [NB, V, 3]
    hmask = model.np_hull_mask
    face = model.np_face  # static numpy [NB, F, 4]
    nv = hull.shape[1]
    nf = face.shape[1]
    iota_v = jnp.arange(nv)[None, :, None]
    iota_f = jnp.arange(nf)[None, :, None]

    # ---- conservative clearance + per-env top-M pair selection ----
    brad = (np.linalg.norm(hull, axis=2) * (hmask > 0)).max(1) + np.asarray(
        model.margin
    )  # static bounding radius per body, margin included
    ca = pos[dp[:, 0]]  # [P, 3, B] (static gather)
    cb = pos[dp[:, 1]]
    clear = jnp.sqrt(jnp.sum((ca - cb) ** 2, 1)) - jnp.asarray(
        brad[dp[:, 0]] + brad[dp[:, 1]]
    )[:, None]  # [P, B]
    sel = jax.lax.top_k(-clear.T, m_sel)[1].T.astype(jnp.int32)  # [M, B]

    # All gathers/scatters below go through one-hot contractions, NOT
    # take_along_axis/put_along_axis: XLA lowers batched dynamic
    # gather/scatter on TPU to serialized slices (a first cut measured
    # 43.8 ms/step vs the dense path's 17.6), while the same data movement
    # as small einsums rides the MXU for well under a millisecond. The
    # one-hot products are exact (single nonzero term per output).
    iota_p = jnp.arange(npair)
    oh_pair = (iota_p[None, :, None] == sel[:, None, :]).astype(
        jnp.float32
    )  # [M, P, B]
    covered = oh_pair.sum(0)  # [P, B] — 1 on selected pair slots
    a_oh = np.zeros((npair, model.n_bodies), np.float32)
    a_oh[np.arange(npair), dp[:, 0]] = 1.0
    b_oh = np.zeros((npair, model.n_bodies), np.float32)
    b_oh[np.arange(npair), dp[:, 1]] = 1.0
    oh_a = jnp.einsum("mpb,pn->mnb", oh_pair, jnp.asarray(a_oh))  # [M,NB,B]
    oh_b = jnp.einsum("mpb,pn->mnb", oh_pair, jnp.asarray(b_oh))

    def _body(oh, arr):  # [NB, C, B] selected -> [M, C, B]
        return jnp.einsum("mnb,ncb->mcb", oh, arr)

    def _tab(oh, tab):  # static [NB, ...] selected -> [M, ..., B]
        t = jnp.asarray(tab, jnp.float32)
        if t.ndim == 1:
            return jnp.einsum("mnb,n->mb", oh, t)
        if t.ndim == 2:
            return jnp.einsum("mnb,nv->mvb", oh, t)
        return jnp.einsum("mnb,nvc->mvcb", oh, t)

    pos_a, pos_b = _body(oh_a, pos), _body(oh_b, pos)
    quat_a, quat_b = _body(oh_a, quat), _body(oh_b, quat)

    def _hull_xyz(oh, lim=None):
        h = hull[:, :lim] if lim else hull
        return [_tab(oh, h[:, :, j]) for j in range(3)]  # 3 x [M, V, B]

    def deepest(qw, pw, hw_xyz, hw_m, qf, pf, nl, dl):
        """K deepest verts of body W against faces of body F, W-local frame
        (gathered-operand mirror of the dense `deepest`)."""
        q_rel = _qmul(_qconj(qf), qw)  # [M, 4, B]
        t_rel = _qrot(_qconj(qf), pw - pf)  # [M, 3, B]
        nrot = _qrot(_qconj(q_rel)[:, None], nl)  # [M, F, 3, B]
        doff = jnp.sum(nl * t_rel[:, None], -2) + dl  # [M, F, B]
        hx, hy, hz = (h[:, :, None] for h in hw_xyz)  # [M, V, 1, B]
        d = (
            hx * nrot[:, None, :, 0, :]
            + hy * nrot[:, None, :, 1, :]
            + hz * nrot[:, None, :, 2, :]
            + doff[:, None]
        )  # [M, V, F, B]
        dist = jnp.max(d, axis=2)  # [M, V, B]
        fid = jnp.argmax(d, axis=2).astype(jnp.float32)
        dist = jnp.where(hw_m > 0, dist, 1e9)
        pen_face = (
            -jnp.max(jnp.min(d, 1), 1) if model.member_edge_contacts else None
        )  # [M, B]

        pts, nrms, gaps, vids = [], [], [], []
        g = dist
        for _ in range(kd):
            v_id = jnp.argmin(g, axis=1)  # [M, B]
            gaps.append(jnp.min(g, axis=1))
            vids.append(v_id.astype(jnp.float32))
            ohv = (iota_v == v_id[:, None]).astype(jnp.float32)  # [M, V, B]
            hsel = jnp.stack([jnp.sum(ohv * h, 1) for h in hw_xyz], 1)
            pts.append(pw + _qrot(qw, hsel))  # world
            f_sel = jnp.sum(ohv * fid, axis=1)  # [M, B]
            ohf = (iota_f == f_sel[:, None].astype(jnp.int32)).astype(
                jnp.float32
            )
            nl_sel = jnp.sum(ohf[:, :, None] * nl, 1)  # [M, 3, B]
            nrms.append(_qrot(qf, nl_sel))  # world
            g = jnp.where(ohv > 0, 1e9, g)
        return (
            jnp.stack(pts, 1),
            jnp.stack(nrms, 1),
            jnp.stack(gaps, 1),
            jnp.stack(vids, 1),
            pen_face,
        )

    nl_a = _tab(oh_a, face[..., :3])  # [M, F, 3, B]
    dl_a = _tab(oh_a, face[..., 3])  # [M, F, B]
    nl_b = _tab(oh_b, face[..., :3])
    dl_b = _tab(oh_b, face[..., 3])
    hx_a, hm_a = _hull_xyz(oh_a), _tab(oh_a, hmask)
    hx_b, hm_b = _hull_xyz(oh_b), _tab(oh_b, hmask)

    pt1, nrm1, gap1, vid1, pen_face1 = deepest(
        quat_b, pos_b, hx_b, hm_b, quat_a, pos_a, nl_a, dl_a
    )  # B's verts in A's faces
    pt2, nrm2, gap2, vid2, pen_face2 = deepest(
        quat_a, pos_a, hx_a, hm_a, quat_b, pos_b, nl_b, dl_b
    )  # A's verts in B's faces

    cand_pt = jnp.concatenate([pt1, pt2], 1)  # [M, 2K, 3, B]
    cand_n = jnp.concatenate([-nrm1, nrm2], 1)
    cand_gap = jnp.concatenate([gap1, gap2], 1)
    cand_vid = jnp.concatenate([vid1, nv + vid2], 1)

    iota_c = jnp.arange(2 * kd)[None, :, None]
    pts, nrms, gaps, vids = [], [], [], []
    g = cand_gap
    for _ in range(kd):
        c_id = jnp.argmin(g, axis=1)
        gaps.append(jnp.min(g, axis=1))
        ohc = (iota_c == c_id[:, None]).astype(jnp.float32)  # [M, 2K, B]
        pts.append(jnp.einsum("pcn,pcjn->pjn", ohc, cand_pt))
        nrms.append(jnp.einsum("pcn,pcjn->pjn", ohc, cand_n))
        vids.append(jnp.sum(ohc * cand_vid, 1))
        g = jnp.where(ohc > 0, 1e9, g)

    point = jnp.stack(pts, 1)  # [M, K, 3, B]
    n = jnp.stack(nrms, 1)
    raw_gap = jnp.stack(gaps, 1)
    vid = jnp.stack(vids, 1)

    from .engine import DEDUP_TOL, _get_hull_edges

    d2 = jnp.sum((point[:, :, None] - point[:, None, :]) ** 2, 3)
    later = (
        jnp.arange(kd)[None, :, None] > jnp.arange(kd)[None, None, :]
    )[..., None]
    raw_gap = jnp.where(((d2 < DEDUP_TOL**2) & later).any(2), 1e9, raw_gap)

    marg_p = np.asarray(model.margin)[dp[:, 0]] + np.asarray(model.margin)[
        dp[:, 1]
    ]  # static [P]
    marg = jnp.einsum("mpb,p->mb", oh_pair, jnp.asarray(marg_p))  # [M, B]

    def _scatter(vals):  # [M, K(, 3), B] -> [P, K(, 3), B], 0 elsewhere
        if vals.ndim == 3:
            return jnp.einsum("mpb,mkb->pkb", oh_pair, vals)
        return jnp.einsum("mpb,mkcb->pkcb", oh_pair, vals)

    def _finish(point, n, raw_gap, vid):
        gap = raw_gap - marg[:, None]
        vid = jnp.where(raw_gap > 1e8, -1.0, vid)
        un = (1.0 - covered)[:, None]  # [P, 1, B] — unselected slots
        point_f = _scatter(point)
        # unselected slots keep a unit normal so _friction_dirs stays finite
        # (their act=0 zeroes the rows regardless)
        n_f = _scatter(n).at[:, :, 2, :].add(un)
        gap_f = _scatter(gap) + un * 1e9
        vid_f = _scatter(vid) - un
        return point_f, n_f, gap_f, jnp.round(vid_f).astype(jnp.int32)

    if not model.member_edge_contacts:
        return _finish(point, n, raw_gap, vid)

    big = 1e9
    edirs, emask = _get_hull_edges(model)
    ed_a = _tab(oh_a, edirs)  # [M, E, 3, B]
    ed_b = _tab(oh_b, edirs)
    em_a = _tab(oh_a, emask)  # [M, E, B]
    em_b = _tab(oh_b, emask)
    ea = _qrot(quat_a[:, None], ed_a)  # [M, E, 3, B] world
    eb = _qrot(quat_b[:, None], ed_b)
    cr = _cross(ea[:, :, None], eb[:, None, :])  # [M, E, E, 3, B]
    cr_len = jnp.sqrt(jnp.sum(cr * cr, 3))
    cr_ok = (
        (cr_len > 1e-6)
        & (em_a[:, :, None] > 0)
        & (em_b[:, None, :] > 0)
    )
    ne = edirs.shape[1]
    e_axes = (cr / jnp.maximum(cr_len, 1e-12)[:, :, :, None]).reshape(
        m_sel, ne * ne, 3, -1
    )
    e_ok = cr_ok.reshape(m_sel, ne * ne, -1)

    nsupp = min(12, hull.shape[1])
    hs_a = _hull_xyz(oh_a, lim=nsupp)  # 3 x [M, S, B]
    hs_b = _hull_xyz(oh_b, lim=nsupp)
    ms_a = _tab(oh_a, hmask[:, :nsupp])
    ms_b = _tab(oh_b, hmask[:, :nsupp])

    def _supports(h_xyz, m_, axes_local):
        """[M,Q,3,B] local axes -> (min, max) projections [M,Q,B]."""
        hx = h_xyz[0][:, None]  # [M, 1, S, B]
        hy = h_xyz[1][:, None]
        hz = h_xyz[2][:, None]
        proj = (
            hx * axes_local[:, :, None, 0, :]
            + hy * axes_local[:, :, None, 1, :]
            + hz * axes_local[:, :, None, 2, :]
        )  # [M, Q, S, B]
        mm = m_[:, None] > 0
        return (
            jnp.min(jnp.where(mm, proj, big), 2),
            jnp.max(jnp.where(mm, proj, -big), 2),
        )

    def sat_overlap(axes_w, ok):
        amin, amax = _supports(
            hs_a, ms_a, _qrot(_qconj(quat_a)[:, None], axes_w)
        )
        bmin, bmax = _supports(
            hs_b, ms_b, _qrot(_qconj(quat_b)[:, None], axes_w)
        )
        oa = jnp.sum(axes_w * pos_a[:, None], 2)
        ob = jnp.sum(axes_w * pos_b[:, None], 2)
        overlap = jnp.minimum(oa + amax, ob + bmax) - jnp.maximum(
            oa + amin, ob + bmin
        )
        return jnp.where(ok, overlap, big)

    pen_f = jnp.minimum(pen_face1, pen_face2)  # [M, B]
    pen_edges = sat_overlap(e_axes, e_ok)
    e_best = jnp.argmin(pen_edges, 1)  # [M, B]
    iota_e = jnp.arange(ne * ne)[None, :, None]
    ohe = (iota_e == e_best[:, None]).astype(jnp.float32)
    pen_e = jnp.sum(ohe * pen_edges, 1)
    ax_e = jnp.einsum("pqn,pqjn->pjn", ohe, e_axes)  # [M, 3, B]
    sgn = jnp.sign(jnp.sum(ax_e * (pos_a - pos_b), 1))
    ax_e = ax_e * jnp.where(sgn == 0.0, 1.0, sgn)[:, None]

    la_e = _qrot(_qconj(quat_a), ax_e)
    lb_e = _qrot(_qconj(quat_b), ax_e)

    def _support_pt(h_xyz, m_, axis_local, take_max):
        proj = (
            h_xyz[0] * axis_local[:, None, 0, :]
            + h_xyz[1] * axis_local[:, None, 1, :]
            + h_xyz[2] * axis_local[:, None, 2, :]
        )  # [M, S, B]
        proj = jnp.where(m_ > 0, proj, -big if take_max else big)
        v_id = (jnp.argmax if take_max else jnp.argmin)(proj, 1)
        ohv = (
            jnp.arange(proj.shape[1])[None, :, None] == v_id[:, None]
        ).astype(jnp.float32)
        return jnp.stack([jnp.sum(ohv * h, 1) for h in h_xyz], 1)  # [M,3,B]

    sa = pos_a + _qrot(quat_a, _support_pt(hs_a, ms_a, la_e, False))
    sb = pos_b + _qrot(quat_b, _support_pt(hs_b, ms_b, lb_e, True))
    iota_ne = jnp.arange(ne)[None, :, None]
    oha = (iota_ne == (e_best // ne)[:, None]).astype(jnp.float32)
    ohb = (iota_ne == (e_best % ne)[:, None]).astype(jnp.float32)
    da = jnp.sum(oha[:, :, None] * ea, 1)  # [M, 3, B]
    db = jnp.sum(ohb[:, :, None] * eb, 1)
    r_ab = sa - sb
    b_dd = jnp.sum(da * db, 1)
    d_dr = jnp.sum(da * r_ab, 1)
    e_dr = jnp.sum(db * r_ab, 1)
    denom = 1.0 - b_dd * b_dd
    safe = jnp.abs(denom) > 1e-9
    t1 = jnp.where(safe, (b_dd * e_dr - d_dr) / jnp.where(safe, denom, 1.0), 0.0)
    t2 = jnp.where(safe, (e_dr - b_dd * d_dr) / jnp.where(safe, denom, 1.0), 0.0)
    pt_e = 0.5 * (sa + t1[:, None] * da + sb + t2[:, None] * db)

    use_edge = (pen_e < big / 2) & (pen_e > 0) & (pen_e < 0.95 * pen_f)
    ue3 = use_edge[:, None, None]
    point = jnp.where(ue3, point.at[:, 0].set(pt_e), point)
    n = jnp.where(ue3, n.at[:, 0].set(ax_e), n)
    vid = jnp.where(
        use_edge[:, None],
        vid.at[:, 0].set(jnp.float32(2 * nv) + e_best.astype(jnp.float32)),
        vid,
    )
    edge_gap = raw_gap.at[:, 0].set(-pen_e)
    if kd > 1:
        edge_gap = edge_gap.at[:, 1:].set(1e9)
    raw_gap = jnp.where(use_edge[:, None], edge_gap, raw_gap)
    return _finish(point, n, raw_gap, vid)


def _dyn_narrowphase(model: PhysicsModel, pos, quat):
    """Up-to-K SAT contacts per dyn pair (env-last engine._dyn_narrowphase).

    Works in the VERTEX body's local frame: the tested hull verts are then a
    STATIC array, so the [NDP, V, F, B] vertex-face distance tensor is a
    broadcast multiply-add of two small operands ([NDP, F, 3, B] rotated
    planes x static verts) feeding straight into the max-over-faces reduce —
    XLA fuses the chain and the 4-D tensor never touches HBM (the previous
    world-frame einsum materialized ~470 MB of it per direction at B=2048;
    VERDICT r2 #1). K-deepest selection per direction runs as iterative
    argmin + one-hot (matches lax.top_k's first-index tie-break, like
    detect_contacts); the 2K candidates are then reduced to the K deepest
    the same way, mirroring the per-env path's top_k exactly.

    Returns (point [NDP, K, 3, B], normal [NDP, K, 3, B] from B toward A,
    gap [NDP, K, B])."""
    topm = int(getattr(model, "member_topm", 0) or 0)
    if 0 < topm < len(model.dyn_pair_body):
        return _dyn_narrowphase_sel(model, pos, quat)
    dp = model.dyn_pair_body
    kd = model.member_manifold_k
    ia, ib = dp[:, 0], dp[:, 1]
    hull = model.np_hull  # static numpy [NB, V, 3]
    hmask = model.np_hull_mask  # static numpy
    face = model.np_face  # static numpy [NB, F, 4]
    nv = hull.shape[1]
    nf = face.shape[1]
    iota_v = jnp.arange(nv)[None, :, None]
    iota_f = jnp.arange(nf)[None, :, None]

    def deepest(widx, fidx):
        """K deepest verts of body W against faces of body F, W-local frame."""
        q_rel = _qmul(_qconj(quat[fidx]), quat[widx])  # [P, 4, B]
        t_rel = _qrot(_qconj(quat[fidx]), pos[widx] - pos[fidx])  # [P, 3, B]
        nl = jnp.asarray(face[fidx][..., :3])  # static [P, F, 3]
        dl = jnp.asarray(face[fidx][..., 3])  # static [P, F]
        # F's face planes expressed in W's frame: n.x_W + d with
        # n = R_rel^T n_F, d = n_F . t_rel + d_F
        nrot = _qrot(_qconj(q_rel)[:, None], nl[..., None])  # [P, F, 3, B]
        doff = jnp.sum(nl[..., None] * t_rel[:, None], -2) + dl[..., None]

        hw = hull[widx]  # static [P, V, 3]
        hx = jnp.asarray(hw[:, :, 0])[:, :, None, None]
        hy = jnp.asarray(hw[:, :, 1])[:, :, None, None]
        hz = jnp.asarray(hw[:, :, 2])[:, :, None, None]
        d = (
            hx * nrot[:, None, :, 0, :]
            + hy * nrot[:, None, :, 1, :]
            + hz * nrot[:, None, :, 2, :]
            + doff[:, None]
        )  # [P, V, F, B] — broadcast feeding the reduce; fused by XLA
        # supporting face per vertex comes out of the SAME fused reduce
        # (max + argmax over F); the per-k selection below then only gathers
        # it — no [P, F, B] face re-scan per manifold point
        dist = jnp.max(d, axis=2)  # [P, V, B]
        fid = jnp.argmax(d, axis=2).astype(jnp.float32)  # [P, V, B]
        dist = jnp.where(jnp.asarray(hmask[widx])[:, :, None] > 0, dist, 1e9)
        # face-axis MTV contribution from the SAME fused chain (engine
        # mirror): padded faces sit at -1e9 (max ignores), padded verts
        # repeat vertex 0 (min unaffected); edge-arbitration only
        pen_face = (
            -jnp.max(jnp.min(d, 1), 1) if model.member_edge_contacts else None
        )  # [P, B]

        pts, nrms, gaps, vids = [], [], [], []
        g = dist
        for _ in range(kd):
            v_id = jnp.argmin(g, axis=1)  # [P, B]
            gaps.append(jnp.min(g, axis=1))
            vids.append(v_id.astype(jnp.float32))
            ohv = (iota_v == v_id[:, None]).astype(jnp.float32)  # [P, V, B]
            hsel = jnp.einsum("pvn,pvj->pjn", ohv, jnp.asarray(hw))  # [P, 3, B]
            pts.append(pos[widx] + _qrot(quat[widx], hsel))  # world
            f_sel = jnp.sum(ohv * fid, axis=1)  # [P, B]
            ohf = (iota_f == f_sel[:, None].astype(jnp.int32)).astype(jnp.float32)
            nl_sel = jnp.einsum("pfn,pfj->pjn", ohf, nl)  # F-local face normal
            nrms.append(_qrot(quat[fidx], nl_sel))  # world
            g = jnp.where(ohv > 0, 1e9, g)
        return (
            jnp.stack(pts, 1),  # [P, K, 3, B]
            jnp.stack(nrms, 1),
            jnp.stack(gaps, 1),  # [P, K, B]
            jnp.stack(vids, 1),  # [P, K, B] float vertex ids
            pen_face,
        )

    pt1, nrm1, gap1, vid1, pen_face1 = deepest(ib, ia)  # B's verts in A's faces
    pt2, nrm2, gap2, vid2, pen_face2 = deepest(ia, ib)  # A's verts in B's faces
    nv = hull.shape[1]

    # contact normal points from B toward A (see engine._dyn_narrowphase)
    cand_pt = jnp.concatenate([pt1, pt2], 1)  # [P, 2K, 3, B]
    cand_n = jnp.concatenate([-nrm1, nrm2], 1)
    cand_gap = jnp.concatenate([gap1, gap2], 1)  # [P, 2K, B]
    cand_vid = jnp.concatenate([vid1, nv + vid2], 1)  # feature ids

    iota_c = jnp.arange(2 * kd)[None, :, None]
    pts, nrms, gaps, vids = [], [], [], []
    g = cand_gap
    for _ in range(kd):
        c_id = jnp.argmin(g, axis=1)  # [P, B]
        gaps.append(jnp.min(g, axis=1))
        ohc = (iota_c == c_id[:, None]).astype(jnp.float32)  # [P, 2K, B]
        pts.append(jnp.einsum("pcn,pcjn->pjn", ohc, cand_pt))
        nrms.append(jnp.einsum("pcn,pcjn->pjn", ohc, cand_n))
        vids.append(jnp.sum(ohc * cand_vid, 1))
        g = jnp.where(ohc > 0, 1e9, g)

    point = jnp.stack(pts, 1)  # [P, K, 3, B]
    n = jnp.stack(nrms, 1)
    raw_gap = jnp.stack(gaps, 1)  # [P, K, B] pre-margin
    vid = jnp.stack(vids, 1)  # [P, K, B]

    # near-duplicate dedup (engine.DEDUP_TOL): the merge can keep both
    # directions' representation of one physical contact; deactivate any
    # selected point within tolerance of an earlier (deeper) selection
    from .engine import DEDUP_TOL, _get_hull_edges

    d2 = jnp.sum((point[:, :, None] - point[:, None, :]) ** 2, 3)  # [P,K,K,B]
    later = (jnp.arange(kd)[None, :, None] > jnp.arange(kd)[None, None, :])[..., None]
    raw_gap = jnp.where(((d2 < DEDUP_TOL**2) & later).any(2), 1e9, raw_gap)

    # edge-edge separating axes (mirror of engine._dyn_narrowphase,
    # gated by model.member_edge_contacts): uniform support SAT over
    # cross(edge, edge) axes vs the face-axis MTV from the fused reduce.
    if not model.member_edge_contacts:
        marg = model.margin[ia] + model.margin[ib]  # static numpy
        gap = raw_gap - jnp.asarray(marg)[:, None, None]
        vid = jnp.where(raw_gap > 1e8, -1.0, vid)
        return point, n, gap, jnp.round(vid).astype(jnp.int32)
    big = 1e9
    npair = len(ia)
    edirs, emask = _get_hull_edges(model)
    ea = _qrot(quat[ia][:, None], jnp.asarray(edirs[ia])[..., None])  # [P,E,3,B]
    eb = _qrot(quat[ib][:, None], jnp.asarray(edirs[ib])[..., None])
    cr = _cross(ea[:, :, None], eb[:, None, :])  # [P,E,E,3,B]
    cr_len = jnp.sqrt(jnp.sum(cr * cr, 3))
    cr_ok = (
        (cr_len > 1e-6)
        & (jnp.asarray(emask[ia])[:, :, None, None] > 0)
        & (jnp.asarray(emask[ib])[:, None, :, None] > 0)
    )
    ne = edirs.shape[1]
    e_axes = (cr / jnp.maximum(cr_len, 1e-12)[:, :, :, None]).reshape(
        npair, ne * ne, 3, -1
    )
    e_ok = cr_ok.reshape(npair, ne * ne, -1)

    # supports use only the true hull vertices: they precede the
    # edge-subdivision test points in np_hull, so the first-12 slice is
    # support-exact at half the vertex extent (engine mirror)
    nsupp = min(12, hull.shape[1])
    ha = hull[ia][:, :nsupp]  # static [P,S,3]
    hb = hull[ib][:, :nsupp]
    ma = hmask[ia][:, :nsupp] > 0  # all slice entries are support-safe
    mb = hmask[ib][:, :nsupp] > 0

    def _supports(h, m, axes_local):
        """min/max projection of a static hull on per-env local axes
        [P,Q,3,B] -> ([P,Q,B], [P,Q,B]); broadcast-fused like the face
        tensor (static verts x rotated axes feeding the reduce)."""
        hx = jnp.asarray(h[:, :, 0])[:, None, :, None]
        hy = jnp.asarray(h[:, :, 1])[:, None, :, None]
        hz = jnp.asarray(h[:, :, 2])[:, None, :, None]
        proj = (
            hx * axes_local[:, :, None, 0]
            + hy * axes_local[:, :, None, 1]
            + hz * axes_local[:, :, None, 2]
        )  # [P, Q, V, B]
        mm = jnp.asarray(m)[:, None, :, None]
        return (
            jnp.min(jnp.where(mm, proj, big), 2),
            jnp.max(jnp.where(mm, proj, -big), 2),
        )

    def sat_overlap(axes_w, ok):
        """Interval overlap along world axes [P,Q,3,B]."""
        amin, amax = _supports(ha, ma, _qrot(_qconj(quat[ia])[:, None], axes_w))
        bmin, bmax = _supports(hb, mb, _qrot(_qconj(quat[ib])[:, None], axes_w))
        oa = jnp.sum(axes_w * pos[ia][:, None], 2)  # [P,Q,B]
        ob = jnp.sum(axes_w * pos[ib][:, None], 2)
        overlap = jnp.minimum(oa + amax, ob + bmax) - jnp.maximum(
            oa + amin, ob + bmin
        )
        return jnp.where(ok, overlap, big)

    # face-axis MTV comes from the vertex-face tensor's second reduce in
    # `deepest` (both directions) — no separate support pass needed
    pen_f = jnp.minimum(pen_face1, pen_face2)  # [P,B]
    pen_edges = sat_overlap(e_axes, e_ok)  # [P, E*E, B]
    e_best = jnp.argmin(pen_edges, 1)  # [P,B]
    iota_e = jnp.arange(ne * ne)[None, :, None]
    ohe = (iota_e == e_best[:, None]).astype(jnp.float32)  # [P,E*E,B]
    pen_e = jnp.sum(ohe * pen_edges, 1)  # [P,B]
    ax_e = jnp.einsum("pqn,pqjn->pjn", ohe, e_axes)  # [P,3,B]
    sgn = jnp.sign(jnp.sum(ax_e * (pos[ia] - pos[ib]), 1))
    ax_e = ax_e * jnp.where(sgn == 0.0, 1.0, sgn)[:, None]  # point B -> A

    # supporting edge lines: support vertex of A along -L / B along +L, each
    # on the winning edge-direction line; contact = midpoint of the closest
    # points of the two lines (a bare support vertex tie-breaks to an edge
    # endpoint far from the crossing)
    la_e = _qrot(_qconj(quat[ia]), ax_e)  # [P,3,B]
    lb_e = _qrot(_qconj(quat[ib]), ax_e)

    def _support_pt(h, m, axis_local, take_max):
        hx = jnp.asarray(h[:, :, 0])[:, :, None]
        hy = jnp.asarray(h[:, :, 1])[:, :, None]
        hz = jnp.asarray(h[:, :, 2])[:, :, None]
        proj = hx * axis_local[:, None, 0] + hy * axis_local[:, None, 1] + hz * axis_local[:, None, 2]
        proj = jnp.where(jnp.asarray(m)[:, :, None], proj, -big if take_max else big)
        v_id = (jnp.argmax if take_max else jnp.argmin)(proj, 1)  # [P,B]
        ohv = (jnp.arange(h.shape[1])[None, :, None] == v_id[:, None]).astype(jnp.float32)
        return jnp.einsum("pvn,pvj->pjn", ohv, jnp.asarray(h))  # local [P,3,B]

    sa = pos[ia] + _qrot(quat[ia], _support_pt(ha, ma, la_e, False))
    sb = pos[ib] + _qrot(quat[ib], _support_pt(hb, mb, lb_e, True))
    iota_ne = jnp.arange(ne)[None, :, None]
    oha = (iota_ne == (e_best // ne)[:, None]).astype(jnp.float32)  # [P,E,B]
    ohb = (iota_ne == (e_best % ne)[:, None]).astype(jnp.float32)
    da = jnp.einsum("pen,pejn->pjn", oha, ea)
    db = jnp.einsum("pen,pejn->pjn", ohb, eb)
    r_ab = sa - sb
    b_dd = jnp.sum(da * db, 1)
    d_dr = jnp.sum(da * r_ab, 1)
    e_dr = jnp.sum(db * r_ab, 1)
    denom = 1.0 - b_dd * b_dd
    safe = jnp.abs(denom) > 1e-9
    t1 = jnp.where(safe, (b_dd * e_dr - d_dr) / jnp.where(safe, denom, 1.0), 0.0)
    t2 = jnp.where(safe, (e_dr - b_dd * d_dr) / jnp.where(safe, denom, 1.0), 0.0)
    pt_e = 0.5 * (sa + t1[:, None] * da + sb + t2[:, None] * db)

    use_edge = (pen_e < big / 2) & (pen_e > 0) & (pen_e < 0.95 * pen_f)  # [P,B]
    ue3 = use_edge[:, None, None]
    point = jnp.where(ue3, point.at[:, 0].set(pt_e), point)
    n = jnp.where(ue3, n.at[:, 0].set(ax_e), n)
    # feature id encodes the winning edge pair (engine mirror): a change of
    # separating axis invalidates the cached impulse
    vid = jnp.where(
        use_edge[:, None],
        vid.at[:, 0].set(jnp.float32(2 * nv) + e_best.astype(jnp.float32)),
        vid,
    )
    edge_gap = raw_gap.at[:, 0].set(-pen_e)
    if kd > 1:
        edge_gap = edge_gap.at[:, 1:].set(1e9)  # single-point edge manifold
    raw_gap = jnp.where(use_edge[:, None], edge_gap, raw_gap)

    marg = model.margin[ia] + model.margin[ib]  # static numpy
    gap = raw_gap - jnp.asarray(marg)[:, None, None]
    vid = jnp.where(raw_gap > 1e8, -1.0, vid)  # deduped / suppressed slots
    return point, n, gap, jnp.round(vid).astype(jnp.int32)


def _member_contact_rows(model: PhysicsModel, pos, quat, lin_vel, ang_vel,
                         iinv_world, dt, warm_cache=None, j_dtype=jnp.float32):
    """Member-member contacts (env-last engine._member_contact_rows).

    Returns (normal (j, s), friction (j, s), extras) two-stream row parts
    with NDC = pairs x member_manifold_k manifold points flattened
    pair-major, split-impulse rhs carried in the normal rows' scalars."""
    dp = model.dyn_pair_body
    kd = model.member_manifold_k
    b = pos.shape[-1]
    ia, ib = np.repeat(dp[:, 0], kd), np.repeat(dp[:, 1], kd)
    point, n, gap, vid = _dyn_narrowphase(model, pos, quat)
    point = point.reshape(-1, 3, b)
    n = n.reshape(-1, 3, b)
    gap = gap.reshape(-1, b)
    vid = vid.reshape(-1, b)
    act = (gap < E.CONTACT_BREAKING).astype(jnp.float32)

    rel_a = point - pos[ia]
    rel_b = point - pos[ib]

    def rows_for(d):
        # gating folds into J (slim layout: zeroed J -> no-op row)
        ja_ang = _cross(rel_a, d)
        jb_ang = -_cross(rel_b, d)
        return jnp.stack([d, ja_ang, -d, jb_ang], axis=1) * act[:, None, None]

    ndc = len(dp) * kd
    jn_m = rows_for(n)
    rhs_n = jnp.where(gap > 0, -gap / dt, 0.0)
    rhs_push = jnp.where(gap < 0, -gap * E.ERP2 / dt, 0.0)
    zeros = jnp.zeros((ndc, b))
    inf_ = jnp.full((ndc, b), jnp.inf)
    normal_rows = _pack(jn_m, rhs_n, zeros, inf_, rhs_push, j_dtype=j_dtype)

    rel_vel = (
        lin_vel[ia] + _cross(ang_vel[ia], rel_a)
        - lin_vel[ib] - _cross(ang_vel[ib], rel_b)
    )
    t1, t2, t2_en = _friction_dirs(n, rel_vel, model.strict_bullet)
    fr = []
    for ti, d in enumerate((t1, t2)):
        en = 1.0 if ti == 0 else t2_en
        fr.append(_pack(rows_for(d) * en, zeros, zeros, zeros, j_dtype=j_dtype))
    friction_rows = (
        jnp.stack([f[0] for f in fr], axis=1).reshape(ndc * 2, -1, b),
        jnp.stack([f[1] for f in fr], axis=1).reshape(ndc * 2, -1, b),
    )
    extras = {"act": act, "vid": vid}
    if warm_cache is not None:
        # persistent warm start (engine._dyn_warm_match env-last): match
        # feature ids, carry impulses, add their velocity contribution
        dyn_vid, dyn_lambda = warm_cache  # [NDC, B], [NDC, 3, B]
        old_vid = dyn_vid.reshape(-1, kd, b)
        old_lam = dyn_lambda.reshape(-1, kd, 3, b)
        newv = vid.reshape(-1, kd, b)
        match = (newv[:, :, None] == old_vid[:, None, :]) & (
            old_vid[:, None, :] >= 0
        )
        lam = jnp.einsum(
            "pkon,podn->pkdn", match.astype(jnp.float32), old_lam
        ).reshape(ndc, 3, b)
        warm = jnp.where(act[:, None] > 0, lam * E.WARMSTART, 0.0)
        lam_n0 = warm[:, 0]
        lam_t0 = warm[:, 1:]
        ja_n = _cross(rel_a, n)
        jb_n = -_cross(rel_b, n)
        ja_1, jb_1 = _cross(rel_a, t1), -_cross(rel_b, t1)
        ja_2, jb_2 = _cross(rel_a, t2), -_cross(rel_b, t2)
        inv_m_a = jnp.asarray(model.inv_mass[ia])[:, None, None]
        inv_m_b = jnp.asarray(model.inv_mass[ib])[:, None, None]
        ii_a = iinv_world[ia]
        ii_b = iinv_world[ib]

        def _imp(d, ja, jb, l):
            la = l[:, None]
            return (
                jnp.concatenate(
                    [inv_m_a * d, jnp.einsum("pijn,pjn->pin", ii_a, ja)], 1
                ) * la,
                jnp.concatenate(
                    [-inv_m_b * d, jnp.einsum("pijn,pjn->pin", ii_b, jb)], 1
                ) * la,
            )

        ia6, ib6 = _imp(n, ja_n, jb_n, lam_n0)
        for d, ja, jb, l in (
            (t1, ja_1, jb_1, lam_t0[:, 0]),
            (t2 * t2_en, ja_2 * t2_en, jb_2 * t2_en, lam_t0[:, 1]),
        ):
            xa, xb = _imp(d, ja, jb, l)
            ia6 = ia6 + xa
            ib6 = ib6 + xb
        oh_a = np.zeros((ndc, model.n_bodies), np.float32)
        oh_b = np.zeros((ndc, model.n_bodies), np.float32)
        oh_a[np.arange(ndc), ia] = 1.0
        oh_b[np.arange(ndc), ib] = 1.0
        extras["imp6"] = jnp.einsum(
            "pb,pin->bin", jnp.asarray(oh_a), ia6
        ) + jnp.einsum("pb,pin->bin", jnp.asarray(oh_b), ib6)
        extras["lam_n0"] = lam_n0
        extras["lam_t0"] = lam_t0
    return normal_rows, friction_rows, extras


# ---------------------------------------------------------------------------
# the full step
# ---------------------------------------------------------------------------


def _round_rows(nr: int, chunk: int, n_buf: int = 4) -> int:
    unit = chunk * n_buf
    return int(np.ceil(max(nr, 1) / unit) * unit)


def step_envlast(model: PhysicsModel, dt: float, pos, quat, lin_vel, ang_vel,
                 contact_lambda, contact_vid, joint_lambda, dyn_lambda,
                 dyn_vid, motor_target, motor_enabled):
    """One substep for B envs, env axis last everywhere.

    pos [NB,3,B], quat [NB,4,B], vels [NB,3,B], contact_lambda [NP,K,3,B],
    contact_vid [NP,K,B], motor_target/enabled [NS,B]. B must be a multiple
    of the kernel tile. Returns the same tuple plus env-last diagnostics
    (slider_lin_pos, slider_applied_impulse, p2p_applied_impulse,
    floor_contact)."""
    from . import solver_pallas as sp

    b = pos.shape[-1]
    k = MAX_CONTACTS_PER_PAIR
    n_pair = E.n_manifold_pairs(model)
    n_dyn = E._n_dyn_contacts(model)
    chunk = int(os.environ.get("EVOMOTION_PALLAS_CHUNK", "8"))
    interpret = jax.default_backend() != "tpu"
    # J-column dtype for the streamed rows (model.row_dtype): bf16 is the
    # throughput configuration (~0.4% rel J rounding, kernel row traffic
    # 64 -> 40 B); strict parity always keeps f32
    j_dtype = (
        jnp.bfloat16
        if getattr(model, "row_dtype", "f32") == "bf16" and not model.strict_bullet
        else jnp.float32
    )

    dyn = (model.inv_mass > 0).astype(np.float32)[:, None, None]  # [NB,1,1]
    lin_vel = lin_vel + jnp.asarray(dyn * np.asarray(E.GRAVITY)[None, :, None]) * dt

    rot = _q2m(quat)  # [NB, 3, 3, B]
    iinv_world = jnp.einsum(
        "bijn,bj,bkjn->bikn", rot, jnp.asarray(model.inv_inertia_local), rot
    )

    # contacts + warm-start match
    pt_k, n_k, gap_k, active, vid_k = detect_contacts(model, pos, quat)
    if n_pair:
        match = (vid_k[:, :, None] == contact_vid[:, None, :]) & (
            contact_vid[:, None, :] >= 0
        )
        warm = jnp.einsum("pkon,podn->pkdn", match.astype(jnp.float32), contact_lambda)
        warm = jnp.where(active[:, :, None], warm * E.WARMSTART, 0.0)
    else:
        warm = jnp.zeros((0, k, 3, b))

    joint_j, joint_s, slider_lin_pos = build_joint_rows(
        model, pos, quat, iinv_world, motor_target, motor_enabled, dt,
        j_dtype=j_dtype,
    )
    nrj = model.n_rows

    vel6 = jnp.concatenate([lin_vel, ang_vel], axis=1)  # [NB, 6, B]

    # joint warm starting (strict mode; mirrors engine._physics_step_impl).
    # The slim rows no longer carry dv, so compute Minv*J^T here (strict
    # runs only; the default path skips this entirely).
    if model.strict_bullet and nrj:
        jl0 = joint_lambda * E.WARMSTART  # [NRJ, B]
        ja_np, jb_np = E._static_row_bodies(model)
        oh_ja = np.zeros((nrj, model.n_bodies), np.float32)
        oh_jb = np.zeros((nrj, model.n_bodies), np.float32)
        oh_ja[np.arange(nrj), ja_np] = 1.0
        oh_jb[np.arange(nrj), jb_np] = 1.0
        j_flat = joint_j.astype(jnp.float32).reshape(nrj, 4, 3, b)
        dv_a_j, dv_b_j = _finish_dv(model, ja_np, jb_np, j_flat, iinv_world)
        dva = dv_a_j.reshape(nrj, 6, b) * jl0[:, None]
        dvb = dv_b_j.reshape(nrj, 6, b) * jl0[:, None]
        vel6 = vel6 + (
            jnp.einsum("rb,rin->bin", jnp.asarray(oh_ja), dva)
            + jnp.einsum("rb,rin->bin", jnp.asarray(oh_jb), dvb)
        ).reshape(model.n_bodies, 6, b)
    else:
        jl0 = jnp.zeros((nrj, b))

    pair = model.pair_body
    static_sel = model.inv_mass[pair[:, 1]] == 0.0
    body_np = pair[np.asarray(static_sel)][:, 0]

    if n_pair:
        r_a = pt_k - pos[body_np][:, None]
        rel_vel = lin_vel[body_np][:, None] + _cross(
            ang_vel[body_np][:, None], r_a
        )  # body B is static
        t1, t2, t2_en = _friction_dirs(n_k, rel_vel, model.strict_bullet)
        actf = active.astype(jnp.float32)

        inv_m = jnp.asarray(model.inv_mass[body_np])[:, None, None, None]  # [NP,1,1,1]
        ii = iinv_world[body_np]  # [NP, 3, 3, B]

        def contact_rows(d):
            # J gated by the active flag (slim layout); dv is returned gated
            # too — it is only used for warm-start application, where
            # inactive contacts carry zero warm impulse anyway
            j_ang = _cross(r_a, d)
            zeros = jnp.zeros_like(d)
            gate = actf[:, :, None]
            j = jnp.stack(
                [d * gate, j_ang * gate, zeros, zeros], axis=2
            )  # [NP, K, 4, 3, B]
            dv_lin = inv_m * j[:, :, 0]
            dv_ang = jnp.einsum("pijn,pkjn->pkin", ii, j[:, :, 1])
            dv = jnp.stack([dv_lin, dv_ang], axis=2)  # [NP, K, 2, 3, B]
            return j, dv

        jn, dv_n = contact_rows(n_k)
        jt1, dv_t1 = contact_rows(t1)
        jt2, dv_t2 = contact_rows(t2)
        jt2 = jt2 * t2_en
        dv_t2 = dv_t2 * t2_en
        rhs_n = jnp.where(gap_k > 0, -gap_k / dt, 0.0)
        rhs_push = jnp.where(gap_k < 0, -gap_k * E.ERP2 / dt, 0.0)
        zeros_pk = jnp.zeros((n_pair, k, b))
        inf_pk = jnp.full((n_pair, k, b), jnp.inf)

        normal_packed = _pack(
            jn.reshape(n_pair * k, 4, 3, b), rhs_n.reshape(-1, b),
            zeros_pk.reshape(-1, b), inf_pk.reshape(-1, b),
            rhs_push.reshape(-1, b), j_dtype=j_dtype,
        )
        jt = jnp.stack([jt1, jt2], axis=2)  # [NP, K, 2, 4, 3, B]
        friction_packed = _pack(
            jt.reshape(n_pair * k * 2, 4, 3, b),
            jnp.zeros((n_pair * k * 2, b)), jnp.zeros((n_pair * k * 2, b)),
            jnp.zeros((n_pair * k * 2, b)), j_dtype=j_dtype,
        )
    else:
        normal_packed = (
            jnp.zeros((0, sp.ROW_J, b), j_dtype), jnp.zeros((0, sp.ROW_S, b))
        )
        friction_packed = (
            jnp.zeros((0, sp.ROW_J, b), j_dtype), jnp.zeros((0, sp.ROW_S, b))
        )

    if n_dyn:
        member_normal, member_friction, member_x = _member_contact_rows(
            model, pos, quat, lin_vel, ang_vel, iinv_world, dt,
            warm_cache=(dyn_vid, dyn_lambda), j_dtype=j_dtype,
        )
    else:
        member_normal = (
            jnp.zeros((0, sp.ROW_J, b), j_dtype), jnp.zeros((0, sp.ROW_S, b))
        )
        member_friction = (
            jnp.zeros((0, sp.ROW_J, b), j_dtype), jnp.zeros((0, sp.ROW_S, b))
        )
        member_x = None

    vel6_flat = vel6.reshape(model.n_bodies * 6, b)

    # ---- warm start contact impulses into velocities ----
    lam_n0 = warm[..., 0, :]  # [NP, K, B]
    lam_t0 = warm[..., 1:, :]  # [NP, K, 2, B]
    if n_pair:
        imp = (
            dv_n * lam_n0[:, :, None, None]
            + dv_t1 * lam_t0[:, :, 0][:, :, None, None]
            + dv_t2 * lam_t0[:, :, 1][:, :, None, None]
        ).sum(1)  # [NP, 2, 3, B]
        oh_c = np.zeros((len(body_np), model.n_bodies), dtype=np.float32)
        oh_c[np.arange(len(body_np)), body_np] = 1.0
        vel6 = vel6 + jnp.einsum(
            "pb,pin->bin", jnp.asarray(oh_c), imp.reshape(n_pair, 6, b)
        )
    if n_dyn:
        # member warm-start impulses must land whenever member rows seed
        # lam0 below — including models with dyn pairs but zero floor pairs
        # (previously nested under `if n_pair:`, which left the solver
        # starting from impulses never applied to the velocities)
        vel6 = vel6 + member_x["imp6"]
    if n_pair or n_dyn:
        vel6_flat = vel6.reshape(model.n_bodies * 6, b)

    # ---- velocity pass + fused split-impulse (one sweep, canonical order) ----
    n_full = nrj + n_pair * k + n_dyn + n_pair * k * 2 + n_dyn * 2
    nr_pad = _round_rows(n_full, chunk)
    parts = [
        (joint_j, joint_s), normal_packed, member_normal, friction_packed,
        member_friction,
    ]
    if nr_pad != n_full:
        parts.append((
            jnp.zeros((nr_pad - n_full, sp.ROW_J, b), j_dtype),
            jnp.zeros((nr_pad - n_full, sp.ROW_S, b)),
        ))
    all_rows_j = jnp.concatenate([p[0] for p in parts], 0)
    all_rows_s = jnp.concatenate([p[1] for p in parts], 0)
    m_lam_n0 = member_x["lam_n0"] if n_dyn else jnp.zeros((0, b))
    m_lam_t0 = (
        member_x["lam_t0"].reshape(n_dyn * 2, b)  # contact-major, dir-minor
        if n_dyn else jnp.zeros((0, b))
    )
    lam0 = jnp.concatenate(
        [
            jl0,
            lam_n0.reshape(n_pair * k, b),
            m_lam_n0,
            lam_t0.reshape(n_pair * k * 2, b),
            m_lam_t0,
            jnp.zeros((nr_pad - n_full, b)),
        ],
        0,
    )
    idx6_a, idx6_b, parent, mu, kind_arr, skip_b, perm, groups = E._solver_meta(
        model, "full", n_pair, n_dyn
    )
    if perm is not None:
        # non-canonical visit order (model.row_order): gather the row
        # streams + lam0 into visit order, scatter lambdas back through
        # the inverse so extraction below stays canonical
        full_perm = np.concatenate([perm, np.arange(n_full, nr_pad, dtype=np.int32)])
        inv_full = np.empty_like(full_perm)
        inv_full[full_perm] = np.arange(nr_pad, dtype=np.int32)
        all_rows_j = all_rows_j[full_perm]
        all_rows_s = all_rows_s[full_perm]
        lam0 = lam0[full_perm]
    iinv9 = iinv_world.reshape(model.n_bodies * 9, b)
    vel_out, lam_all, push6 = sp.solver_sweep_envlast_slim(
        all_rows_j, all_rows_s, vel6_flat, lam0, iinv9, model.inv_mass,
        idx6_a, idx6_b, parent, mu, model.n_iterations, n_full,
        kind=kind_arr, skip_b=skip_b, chunk=chunk, interpret=interpret,
        groups=groups,
    )
    if perm is not None:
        lam_all = lam_all[inv_full]

    lam = lam_all[:nrj]
    if n_pair:
        lam_n = lam_all[nrj : nrj + n_pair * k].reshape(n_pair, k, b)
        base_f = nrj + n_pair * k + n_dyn
        lam_t = lam_all[base_f : base_f + n_pair * k * 2].reshape(n_pair, k, 2, b)

    # ---- integrate + diagnostics (engine._finish_step env-last) ----
    # statics stay pinned: 0 * NaN from an exploded solve must not leak into
    # bodies no reset rewrites (see engine._finish_step)
    vel6_out = jnp.where(dyn > 0, vel_out.reshape(model.n_bodies, 6, b), 0.0)
    lin_out = vel6_out[:, :3]
    ang_out = vel6_out[:, 3:]
    push66 = jnp.where(dyn > 0, push6.reshape(model.n_bodies, 6, b), 0.0)
    new_pos = pos + (lin_out + push66[:, :3]) * dt
    new_quat = _qintegrate(quat, ang_out + push66[:, 3:] * E.TURN_ERP, dt)

    ns = model.n_slider
    np2p = model.n_p2p
    if ns:
        base_s = nrj - 7 * ns
        s_ids = base_s + 7 * np.arange(ns)
        slider_imp = lam[s_ids + 5] + lam[s_ids + 6]
    else:
        slider_imp = jnp.zeros((0, b))
    if np2p:
        p_ids = 3 * np.arange(np2p)
        p2p_imp = jnp.sqrt(lam[p_ids] ** 2 + lam[p_ids + 1] ** 2 + lam[p_ids + 2] ** 2)
    else:
        p2p_imp = jnp.zeros((0, b))

    floor_contact = jnp.zeros((model.n_bodies, b))
    if n_pair:
        oh_c2 = np.zeros((len(body_np), model.n_bodies), dtype=np.float32)
        oh_c2[np.arange(len(body_np)), body_np] = 1.0
        touching = (active & (gap_k < 0)).any(axis=1).astype(jnp.float32)
        floor_contact = jnp.clip(
            jnp.einsum("pb,pn->bn", jnp.asarray(oh_c2), touching), 0.0, 1.0
        )
        new_cl = jnp.stack([lam_n, lam_t[..., 0, :], lam_t[..., 1, :]], axis=2)
        new_vid = jnp.where(active, vid_k, -1)
    else:
        new_cl = contact_lambda
        new_vid = contact_vid

    if n_dyn:
        base_mn = nrj + n_pair * k
        m_lam_n = lam_all[base_mn : base_mn + n_dyn]  # [NDC, B]
        base_mf = nrj + n_pair * k + n_dyn + n_pair * k * 2
        m_lam_t = lam_all[base_mf : base_mf + n_dyn * 2].reshape(n_dyn, 2, b)
        dactf = member_x["act"]
        new_dl = (
            jnp.concatenate([m_lam_n[:, None], m_lam_t], 1) * dactf[:, None]
        )
        new_dv = jnp.where(dactf > 0, member_x["vid"], -1)
    else:
        new_dl = dyn_lambda
        new_dv = dyn_vid

    return (
        new_pos, new_quat, lin_out, ang_out, new_cl, new_vid, lam, new_dl,
        new_dv, (slider_lin_pos, slider_imp, p2p_imp, floor_contact),
    )


def vmapped_step(model: PhysicsModel, dt: float, axis_size: int, in_batched,
                 state, motor_target, motor_enabled):
    """custom_vmap batch rule for engine.physics_step (solver="pallas").

    Transposes leading-batch args to env-last, pads the batch to a kernel
    tile (replicating the last env so padded lanes stay numerically tame),
    runs :func:`step_envlast`, and transposes back."""
    from . import solver_pallas as sp
    from .engine import PhysicsState, StepDiagnostics

    st_b, tgt_b, en_b = in_batched

    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(
            x[None], (axis_size,) + jnp.shape(x)
        )

    state = jax.tree.map(bcast, state, st_b)
    motor_target = bcast(motor_target, tgt_b)
    motor_enabled = bcast(motor_enabled, en_b)

    b = axis_size
    pad = (-b) % sp.TILE

    def to_last(x):
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (pad,))], -1
            )
        return x

    out = step_envlast(
        model, dt,
        to_last(state.pos), to_last(state.quat),
        to_last(state.lin_vel), to_last(state.ang_vel),
        to_last(state.contact_lambda), to_last(state.contact_vid),
        to_last(state.joint_lambda), to_last(state.dyn_lambda),
        to_last(state.dyn_vid),
        to_last(motor_target), to_last(motor_enabled),
    )
    pos, quat, lin, ang, cl, vid, jlam, dl, dv, diag = out

    def to_first(x):
        return jnp.moveaxis(x[..., :b], -1, 0)

    new_state = PhysicsState(
        pos=to_first(pos), quat=to_first(quat), lin_vel=to_first(lin),
        ang_vel=to_first(ang), contact_lambda=to_first(cl),
        contact_vid=to_first(vid), joint_lambda=to_first(jlam),
        dyn_lambda=to_first(dl), dyn_vid=to_first(dv),
    )
    diag_out = StepDiagnostics(
        slider_lin_pos=to_first(diag[0]),
        slider_applied_impulse=to_first(diag[1]),
        p2p_applied_impulse=to_first(diag[2]),
        floor_contact=to_first(diag[3]),
    )
    return (new_state, diag_out), (
        jax.tree.map(lambda _: True, new_state),
        jax.tree.map(lambda _: True, diag_out),
    )
