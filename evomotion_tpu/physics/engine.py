"""Batched impulse-based rigid-body stepper (the Bullet-equivalent hot core).

Reference hot path: ``Environment::do_step`` -> ``btDiscreteDynamicsWorldMt::
stepSimulation`` -> sequential-impulse solver over constraint rows
(evo_motion_model/src/environment.cpp:33-43; SURVEY §3.4). The reference
parallelizes one world over CPU threads; here one *step function* advances any
number of worlds in lockstep — callers ``vmap`` :func:`physics_step` over an
env-batch axis and jit the result, so Bullet's thread fan-out becomes SPMD
vectorization on the TPU's VPU.

Step pipeline (matches Bullet's order within one fixed substep, dt = 1/60):
  1. integrate gravity into velocities (predictUnconstraintMotion)
  2. collision detection at current poses -> contact slots (+ warm-start match)
  3. build all constraint rows once (ODE-style J, rhs, bounds)
  4. split-impulse position pass on contacts (10 its, erp2 = 0.8)
  5. velocity Gauss-Seidel: 10 iterations x [joint phases -> contact normals
     -> friction], phases precomputed by graph coloring (model.row_phases)
  6. integrate transforms (exponential-map rotation update)

Solver math follows the published sequential-impulse formulation Bullet uses
(per-row: effective mass, accumulated-impulse clamping, Baumgarte erp bias,
motor force clamps, limit rows) — independently implemented for batched,
statically shaped execution; formula provenance is cited per row builder.

Known divergences from Bullet in the DEFAULT configuration — all three are
removed by ``model.strict_bullet = True`` (the parity configuration):
- friction uses two fixed tangent directions (btPlaneSpace1 of the contact
  normal) instead of the single slip-velocity-aligned direction of the default
  solver mode (strict mode switches to the Bullet behavior): batch-friendly
  and gives stronger static friction;
- joint rows are not warm-started (Bullet warm-starts every
  btSolverConstraint at cached_impulse x 0.85; strict mode does too via
  PhysicsState.joint_lambda);
- hull manifolds are generated vertex-vs-face for body/static pairs (deepest
  4 per pair); member-member (dyn-dyn) contacts run a SAT vertex/edge-point
  vs-hull-face narrowphase on decimated proxy hulls with up to K=4 contacts
  per pair (best 4 of the top-4-per-direction candidates), on BOTH
  backends — the reference runs Bullet GJK/EPA manifolds on the full hulls;
- limit-row correction velocity is capped at LIMIT_BIAS_CAP (Bullet leaves
  it uncapped; strict mode removes the cap): prevents chatter where limit
  sectors are over-constrained against muscle anchors (see the constant's
  comment).

Structural notes (not removed by strict mode):
- the "xla" solver backend relaxes row ordering within a color phase (any
  valid Gauss-Seidel order); the "pallas" backend visits rows in Bullet's
  strict sequential order under strict_bullet (pallas is the parity
  backend). For non-strict models the row order is the model's `row_order`
  policy (see _solver_meta / _schedule_rows): "scheduled" permutes rows
  into <=8-wide disjoint Jacobi groups, "shuffled:<seed>" is a random
  friction-after-parent order (gait-robustness training), "canonical"
  keeps the sequential build order;
- member-member manifolds are up-to-K=4 SAT contacts per pair on decimated
  proxy hulls vs Bullet's GJK/EPA manifolds (see _dyn_narrowphase). On the
  batched backend, models with member_topm > 0 narrowphase only the top-M
  smallest-clearance pairs per env (Bullet's broadphase gate, batched);
  trajectories are unchanged — see batched._dyn_narrowphase_sel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import maths
from .model import MAX_CONTACTS_PER_PAIR, PhysicsModel

GRAVITY = jnp.array([0.0, -9.8, 0.0])  # environment.cpp:30
ERP = 0.2  # btContactSolverInfo m_erp (joints)
ERP2 = 0.8  # m_erp2 (contact position correction)
TURN_ERP = 0.1  # m_splitImpulseTurnErp
HINGE_LIMIT_BIAS = 0.3  # btHingeConstraint default _biasFactor
# Cap on limit-row correction velocity (rad/s resp. m/s). Divergence from
# Bullet (which leaves limit bias uncapped): the spider's leg-yaw sectors are
# over-constrained against the muscle anchor rows, and an uncapped bias
# produces ~100 rad/s chatter spikes on the light leg bodies at the
# equilibrium violation. Capping the demanded correction speed bounds the
# injected energy without changing the constraint fixed point.
LIMIT_BIAS_CAP = 3.0
CONTACT_BREAKING = 0.02  # gContactBreakingThreshold
WARMSTART = 0.85  # m_warmstartingFactor


class PhysicsState(NamedTuple):
    """Dynamic state of one world; batch by vmapping the step function."""

    pos: jnp.ndarray  # [NB, 3]
    quat: jnp.ndarray  # [NB, 4] xyzw
    lin_vel: jnp.ndarray  # [NB, 3]
    ang_vel: jnp.ndarray  # [NB, 3]
    # persistent-manifold warm-start cache (reference: Bullet manifold points)
    contact_lambda: jnp.ndarray  # [NPAIR, K, 3] (normal, t1, t2)
    contact_vid: jnp.ndarray  # [NPAIR, K] hull-vertex id, -1 = empty
    # joint-row impulse cache: consumed for warm starting when
    # model.strict_bullet (Bullet warm-starts every solver constraint)
    joint_lambda: jnp.ndarray  # [NRJ]
    # member-member (dyn-dyn) persistent manifold cache, keyed by feature id
    # (Bullet keeps btPersistentManifold caches for convex-convex pairs too,
    # item.cpp:17-52; floor pairs already warm-start by vertex id)
    dyn_lambda: jnp.ndarray  # [NDC, 3] (normal, t1, t2); NDC = NDP * K
    dyn_vid: jnp.ndarray  # [NDC] feature id (dir*NV + vert; 2*NV = edge), -1 empty


class StepDiagnostics(NamedTuple):
    """Per-step solver outputs the observation layer needs.

    Mirrors what the reference reads back from Bullet:
    slider getLinearPos / getAppliedImpulse and p2p getAppliedImpulse
    (proprioception_state.cpp:124-129)."""

    slider_lin_pos: jnp.ndarray  # [NS]
    slider_applied_impulse: jnp.ndarray  # [NS] axial (limit + motor)
    p2p_applied_impulse: jnp.ndarray  # [NP2P] |impulse| over the 3 rows
    floor_contact: jnp.ndarray  # [NB] 1.0 if any active static contact


def default_solver() -> str:
    """Default velocity-solver backend: the fused pallas sweep on real TPUs
    (strict Bullet row order — the parity AND perf backend), the colored-phase
    xla loop elsewhere (CPU tests; interpret-mode pallas compiles too slowly
    for big models). Envs construct their models with this so training,
    inference, and the bench all run the same backend."""
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def n_manifold_pairs(model: PhysicsModel) -> int:
    """Pairs that currently generate contact manifolds (body vs static)."""
    if len(model.pair_body) == 0:
        return 0
    return int((model.inv_mass[model.pair_body[:, 1]] == 0.0).sum())


def init_state(model: PhysicsModel) -> PhysicsState:
    npair = n_manifold_pairs(model)
    k = MAX_CONTACTS_PER_PAIR
    return PhysicsState(
        pos=jnp.asarray(model.init_pos),
        quat=jnp.asarray(model.init_quat),
        lin_vel=jnp.zeros((model.n_bodies, 3)),
        ang_vel=jnp.zeros((model.n_bodies, 3)),
        contact_lambda=jnp.zeros((npair, k, 3)),
        contact_vid=jnp.full((npair, k), -1, dtype=jnp.int32),
        joint_lambda=jnp.zeros((model.n_rows,)),
        dyn_lambda=jnp.zeros((_n_dyn_contacts(model), 3)),
        dyn_vid=jnp.full((_n_dyn_contacts(model),), -1, dtype=jnp.int32),
    )


def _plane_space(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """btPlaneSpace1 for batched normals [..., 3]."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_z = jnp.abs(nz) > 0.70710678
    a_z = ny * ny + nz * nz
    k_z = jax.lax.rsqrt(jnp.maximum(a_z, 1e-18))
    p_z = jnp.stack([jnp.zeros_like(nx), -nz * k_z, ny * k_z], -1)
    q_z = jnp.stack([a_z * k_z, -nx * p_z[..., 2], nx * p_z[..., 1]], -1)
    a_x = nx * nx + ny * ny
    k_x = jax.lax.rsqrt(jnp.maximum(a_x, 1e-18))
    p_x = jnp.stack([-ny * k_x, nx * k_x, jnp.zeros_like(nx)], -1)
    q_x = jnp.stack([-nz * p_x[..., 1], nz * p_x[..., 0], a_x * k_x], -1)
    return (
        jnp.where(use_z[..., None], p_z, p_x),
        jnp.where(use_z[..., None], q_z, q_x),
    )


def _friction_dirs(n, rel_vel, strict):
    """Friction row directions at a contact point.

    Default mode: two fixed tangents (btPlaneSpace1 of the normal) — stronger
    static friction, documented divergence. Strict mode: Bullet's default
    solver behavior (setupFrictionConstraint): ONE direction aligned with the
    lateral relative velocity when non-negligible (> SIMD_EPSILON), else
    plane-space dir 1; the second tangent row is disabled via a zero
    effective-mass factor (returned third). Shapes are unchanged either way
    so solver metadata and warm-start caches stay static."""
    p1, p2 = _plane_space(n)
    if not strict:
        return p1, p2, 1.0
    lat = rel_vel - n * jnp.sum(rel_vel * n, -1, keepdims=True)
    lat2 = jnp.sum(lat * lat, -1, keepdims=True)
    t1 = jnp.where(
        lat2 > 1.19209290e-07,
        lat * jax.lax.rsqrt(jnp.maximum(lat2, 1e-30)),
        p1,
    )
    return t1, p2, 0.0


class _Rows(NamedTuple):
    """Flat ODE-style constraint rows (btSolverConstraint equivalent)."""

    idx_a: jnp.ndarray  # [NR]
    idx_b: jnp.ndarray  # [NR]
    j: jnp.ndarray  # [NR, 4, 3]: a_lin, a_ang, b_lin, b_ang
    dv_a: jnp.ndarray  # [NR, 2, 3]: Minv_a * J_a (lin, ang)
    dv_b: jnp.ndarray  # [NR, 2, 3]
    inv_eff: jnp.ndarray  # [NR] 1 / (J Minv J^T)
    rhs: jnp.ndarray  # [NR] target constraint-space velocity
    lo: jnp.ndarray  # [NR]
    hi: jnp.ndarray  # [NR]


def _finish_rows(model, idx_a, idx_b, j_list, rhs, lo, hi, iinv_world):
    """Compute Minv*J and effective masses for stacked rows."""
    j = jnp.stack(j_list, axis=-2) if isinstance(j_list, (list, tuple)) else j_list
    inv_m_a = model_arr(model.inv_mass)[idx_a]
    inv_m_b = model_arr(model.inv_mass)[idx_b]
    ii_a = iinv_world[idx_a]
    ii_b = iinv_world[idx_b]
    dva_lin = inv_m_a[..., None] * j[..., 0, :]
    dva_ang = jnp.einsum("...ij,...j->...i", ii_a, j[..., 1, :])
    dvb_lin = inv_m_b[..., None] * j[..., 2, :]
    dvb_ang = jnp.einsum("...ij,...j->...i", ii_b, j[..., 3, :])
    eff = (
        jnp.sum(j[..., 0, :] * dva_lin, -1)
        + jnp.sum(j[..., 1, :] * dva_ang, -1)
        + jnp.sum(j[..., 2, :] * dvb_lin, -1)
        + jnp.sum(j[..., 3, :] * dvb_ang, -1)
    )
    inv_eff = jnp.where(eff > 1e-12, 1.0 / jnp.maximum(eff, 1e-12), 0.0)
    return _Rows(
        idx_a=idx_a,
        idx_b=idx_b,
        j=j,
        dv_a=jnp.stack([dva_lin, dva_ang], axis=-2),
        dv_b=jnp.stack([dvb_lin, dvb_ang], axis=-2),
        inv_eff=inv_eff,
        rhs=rhs,
        lo=lo,
        hi=hi,
    )


def model_arr(x) -> jnp.ndarray:
    return jnp.asarray(x)


def _point_rows(pivot_w_a, pivot_w_b, com_a, com_b, dirs):
    """Point-coincidence rows along given world directions.

    Shapes: pivots/coms [N, 1, 3] broadcasting against dirs [N, D, 3].
    C_d = d . (pA - pB); Jdot v = d . (vel of pivot on A - vel of pivot on B)
    (btPoint2PointConstraint::getInfo2). Returns (j [N, D, 4, 3], c [N, D])."""
    r_a = jnp.broadcast_to(pivot_w_a - com_a, dirs.shape)
    r_b = jnp.broadcast_to(pivot_w_b - com_b, dirs.shape)
    j = jnp.stack(
        [
            dirs,  # a_lin
            jnp.cross(r_a, dirs),  # a_ang
            -dirs,  # b_lin
            -jnp.cross(r_b, dirs),  # b_ang
        ],
        axis=-2,
    )  # [N, D, 4, 3]
    c = jnp.sum((pivot_w_a - pivot_w_b) * dirs, -1)
    return j, c


def _ang_rows(dirs):
    """Angular rows [N, D, 4, 3]: Jdot v = d . (w_a - w_b)."""
    zeros = jnp.zeros_like(dirs)
    return jnp.stack([zeros, dirs, zeros, -dirs], axis=-2)


def _rot_error_vec(quat_fa_w, quat_fb_w):
    """Small-angle rotation of frame B relative to frame A (world), [..., 3]."""
    q_err = maths.quat_mul(quat_fb_w, maths.quat_conj(quat_fa_w))
    sign = jnp.where(q_err[..., 3:4] < 0, -1.0, 1.0)
    return 2.0 * q_err[..., :3] * sign


def build_joint_rows(
    model: PhysicsModel,
    pos: jnp.ndarray,
    quat: jnp.ndarray,
    iinv_world: jnp.ndarray,
    motor_target: jnp.ndarray,
    motor_enabled: jnp.ndarray,
    dt: float,
) -> tuple[_Rows, jnp.ndarray]:
    """Build all joint rows in the canonical flat layout.

    Returns (rows, slider_lin_pos). Layout (model._row_schedule):
    p2p: 3 rows; hinge: 3 lin + 2 ang-align + 1 limit; fixed: 3 lin + 3 ang;
    slider: 2 lin-perp + 3 ang + 1 lin-limit + 1 motor.
    """
    erp_dt = ERP / dt
    parts_ja, parts_jb, parts_j, parts_rhs, parts_lo, parts_hi = [], [], [], [], [], []
    inf = jnp.inf
    # Bullet leaves limit-correction velocity uncapped; the default mode caps
    # it (see LIMIT_BIAS_CAP) — strict mode removes the divergence
    bias_cap = jnp.inf if model.strict_bullet else LIMIT_BIAS_CAP

    def emit(idx_a, idx_b, j, rhs, lo, hi):
        """Emit one KIND's rows, [n_blocks, rows_per_block, ...]: flattening
        must produce block-major row order (all rows of block 0, then block 1,
        ...) because the solver's phase schedule (model._row_schedule) indexes
        rows as base + block * rows_per_block + r."""
        parts_ja.append(idx_a.reshape(-1))
        parts_jb.append(idx_b.reshape(-1))
        parts_j.append(j.reshape(-1, 4, 3))
        parts_rhs.append(rhs.reshape(-1))
        parts_lo.append(jnp.broadcast_to(lo, rhs.shape).reshape(-1))
        parts_hi.append(jnp.broadcast_to(hi, rhs.shape).reshape(-1))

    eye3 = jnp.eye(3)

    # ---- p2p (btPoint2PointConstraint::getInfo2) ----
    if model.n_p2p:
        ia = model.p2p_body[:, 0]  # static numpy -> constant gathers
        ib = model.p2p_body[:, 1]
        piv = model_arr(model.p2p_pivot)
        pa = pos[ia] + maths.quat_rotate(quat[ia], piv[:, 0])
        pb = pos[ib] + maths.quat_rotate(quat[ib], piv[:, 1])
        dirs = jnp.broadcast_to(eye3, (model.n_p2p, 3, 3))
        j, c = _point_rows(pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs)
        emit(
            ia[:, None].repeat(3, 1), ib[:, None].repeat(3, 1), j,
            -erp_dt * c, -inf, inf,
        )

    # ---- hinge (btHingeConstraint::getInfo2Internal) ----
    if model.n_hinge:
        ia = model.hinge_body[:, 0]
        ib = model.hinge_body[:, 1]
        piv = model_arr(model.hinge_pivot)
        fq = model_arr(model.hinge_frame_quat)
        lim = model_arr(model.hinge_limit)
        pa = pos[ia] + maths.quat_rotate(quat[ia], piv[:, 0])
        pb = pos[ib] + maths.quat_rotate(quat[ib], piv[:, 1])
        qa_f = maths.quat_mul(quat[ia], fq[:, 0])
        qb_f = maths.quat_mul(quat[ib], fq[:, 1])
        ra = maths.quat_to_mat3(qa_f)  # columns: x, y, axis
        rb = maths.quat_to_mat3(qb_f)
        ax_a, p, q = ra[..., :, 2], ra[..., :, 0], ra[..., :, 1]
        ax_b = rb[..., :, 2]

        dirs = jnp.broadcast_to(eye3, (model.n_hinge, 3, 3))
        j_lin, c_lin = _point_rows(pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs)

        # axis alignment: u = ax_a x ax_b; rhs = k * (u . p/q)
        u = jnp.cross(ax_a, ax_b)
        dirs_ang = jnp.stack([p, q], axis=1)
        j_ang = _ang_rows(dirs_ang)
        rhs_ang = erp_dt * jnp.sum(u[:, None] * dirs_ang, -1)

        # limit row about the hinge axis (btHingeConstraint::getHingeAngle /
        # testLimit): angle = atan2(swing . refX, swing . refY). Note Bullet's
        # sign convention: rotating B by +theta about the axis gives
        # angle = -theta, so d(angle)/dt = axis . (w_a - w_b).
        ref_x, ref_y = ra[..., :, 0], ra[..., :, 1]
        swing = rb[..., :, 1]
        angle = jnp.arctan2(
            jnp.sum(swing * ref_x, -1), jnp.sum(swing * ref_y, -1)
        )
        lo_l, hi_l = lim[:, 0], lim[:, 1]
        # btAdjustAngleToLimits: the atan2 angle lives in [-pi, pi] but limits
        # may be written in a shifted 2*pi window (spider leg sectors reach
        # 6.28); wrap toward whichever bound is closer
        angle = _adjust_angle_to_limits(angle, lo_l, hi_l)
        has_limit = lo_l <= hi_l
        below = angle < lo_l
        above = angle > hi_l
        j_lim = _ang_rows(ax_a[:, None])[:, 0]
        corr = jnp.where(below, lo_l - angle, jnp.where(above, hi_l - angle, 0.0))
        rhs_lim = jnp.clip(HINGE_LIMIT_BIAS / dt * corr, -bias_cap, bias_cap)
        lo_b = jnp.where(has_limit & below, 0.0, jnp.where(has_limit & above, -inf, 0.0))
        hi_b = jnp.where(has_limit & below, inf, 0.0)

        # assemble block-major: 6 rows per hinge (3 lin, 2 ang, 1 limit)
        nh = model.n_hinge
        j_all = jnp.concatenate([j_lin, j_ang, j_lim[:, None]], axis=1)
        rhs_all = jnp.concatenate(
            [-erp_dt * c_lin, rhs_ang, rhs_lim[:, None]], axis=1
        )
        lo_all = jnp.concatenate(
            [jnp.full((nh, 5), -inf), lo_b[:, None]], axis=1
        )
        hi_all = jnp.concatenate(
            [jnp.full((nh, 5), inf), hi_b[:, None]], axis=1
        )
        emit(ia[:, None].repeat(6, 1), ib[:, None].repeat(6, 1), j_all, rhs_all, lo_all, hi_all)

    # ---- fixed (btFixedConstraint: 6 locked rows) ----
    if model.n_fixed:
        ia = model.fixed_body[:, 0]
        ib = model.fixed_body[:, 1]
        piv = model_arr(model.fixed_pivot)
        fq = model_arr(model.fixed_frame_quat)
        pa = pos[ia] + maths.quat_rotate(quat[ia], piv[:, 0])
        pb = pos[ib] + maths.quat_rotate(quat[ib], piv[:, 1])
        dirs = jnp.broadcast_to(eye3, (model.n_fixed, 3, 3))
        j_lin, c_lin = _point_rows(pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs)

        qa_f = maths.quat_mul(quat[ia], fq[:, 0])
        qb_f = maths.quat_mul(quat[ib], fq[:, 1])
        err = _rot_error_vec(qa_f, qb_f)  # B relative to A
        j_ang = _ang_rows(dirs)
        # C = err (B rel A), Cdot = w_b - w_a; our rows measure w_a - w_b
        rhs_ang = erp_dt * jnp.sum(err[:, None] * dirs, -1)
        # block-major: 6 rows per fixed constraint (3 lin + 3 ang)
        j_all = jnp.concatenate([j_lin, j_ang], axis=1)
        rhs_all = jnp.concatenate([-erp_dt * c_lin, rhs_ang], axis=1)
        emit(ia[:, None].repeat(6, 1), ib[:, None].repeat(6, 1), j_all, rhs_all, -inf, inf)

    # ---- slider (btSliderConstraint::getInfo2NonVirtual) ----
    slider_lin_pos = jnp.zeros((model.n_slider,))
    if model.n_slider:
        ia = model.slider_body[:, 0]
        ib = model.slider_body[:, 1]
        piv = model_arr(model.slider_pivot)
        fq = model_arr(model.slider_frame_quat)
        lim = model_arr(model.slider_lin_limit)
        max_f = model_arr(model.slider_max_motor_force)

        pa = pos[ia] + maths.quat_rotate(quat[ia], piv[:, 0])
        pb = pos[ib] + maths.quat_rotate(quat[ib], piv[:, 1])
        qa_f = maths.quat_mul(quat[ia], fq[:, 0])
        qb_f = maths.quat_mul(quat[ib], fq[:, 1])
        ra = maths.quat_to_mat3(qa_f)
        axis, p, q = ra[..., :, 0], ra[..., :, 1], ra[..., :, 2]

        delta = pb - pa
        lin_pos = jnp.sum(delta * axis, -1)  # getLinearPos
        slider_lin_pos = lin_pos

        # 2 linear rows perpendicular to the axis
        dirs_perp = jnp.stack([p, q], axis=1)
        j_perp, c_perp = _point_rows(
            pa[:, None], pb[:, None], pos[ia][:, None], pos[ib][:, None], dirs_perp
        )

        # 3 angular lock rows (reference sliders always lock rotation)
        err = _rot_error_vec(qa_f, qb_f)
        dirs3 = jnp.broadcast_to(eye3, (model.n_slider, 3, 3))
        j_ang = _ang_rows(dirs3)
        rhs_ang = erp_dt * jnp.sum(err[:, None] * dirs3, -1)

        # linear limit row along the axis. C = lin_pos; Cdot = axis . (vB - vA):
        # reuse point rows with direction -axis so Jdot v = -d(lin_pos)/dt,
        # then flip signs via rhs/bounds. Simpler: build axial row directly.
        r_a = pa - pos[ia]
        r_b = pb - pos[ib]
        j_axial = jnp.stack(
            [-axis, -jnp.cross(r_a, axis), axis, jnp.cross(r_b, axis)], axis=-2
        )  # Jdot v = axis . (v_b + w_b x r_b) - axis . (v_a + w_a x r_a) = d lin_pos/dt
        lo_l, hi_l = lim[:, 0], lim[:, 1]
        has_lim = lo_l <= hi_l
        locked = jnp.abs(hi_l - lo_l) < 1e-9
        below = lin_pos < lo_l
        above = lin_pos > hi_l
        corr = jnp.where(
            locked, lo_l - lin_pos, jnp.where(below, lo_l - lin_pos, jnp.where(above, hi_l - lin_pos, 0.0))
        )
        rhs_lim = jnp.clip(erp_dt * corr, -bias_cap, bias_cap)
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
        # powered linear motor row (muscle.cpp:82-85 contract();
        # btTypedConstraint::getMotorFactor ramps near limits)
        mot_fact = _motor_factor(lin_pos, lo_l, hi_l, motor_target, 1.0 / dt)
        rhs_mot = mot_fact * motor_target
        imp = jnp.where(motor_enabled, max_f * dt, 0.0)

        # block-major: 7 rows per slider (2 perp, 3 ang, 1 limit, 1 motor)
        ns = model.n_slider
        j_all = jnp.concatenate(
            [j_perp, j_ang, j_axial[:, None], j_axial[:, None]], axis=1
        )
        rhs_all = jnp.concatenate(
            [-erp_dt * c_perp, rhs_ang, rhs_lim[:, None], rhs_mot[:, None]], axis=1
        )
        lo_all = jnp.concatenate(
            [jnp.full((ns, 5), -inf), lo_b[:, None], -imp[:, None]], axis=1
        )
        hi_all = jnp.concatenate(
            [jnp.full((ns, 5), inf), hi_b[:, None], imp[:, None]], axis=1
        )
        emit(ia[:, None].repeat(7, 1), ib[:, None].repeat(7, 1), j_all, rhs_all, lo_all, hi_all)

    idx_a = jnp.concatenate(parts_ja) if parts_ja else jnp.zeros((0,), jnp.int32)
    idx_b = jnp.concatenate(parts_jb) if parts_jb else jnp.zeros((0,), jnp.int32)
    j = jnp.concatenate(parts_j) if parts_j else jnp.zeros((0, 4, 3))
    rhs = jnp.concatenate(parts_rhs) if parts_rhs else jnp.zeros((0,))
    lo = jnp.concatenate(parts_lo) if parts_lo else jnp.zeros((0,))
    hi = jnp.concatenate(parts_hi) if parts_hi else jnp.zeros((0,))
    rows = _finish_rows(model, idx_a, idx_b, j, rhs, lo, hi, iinv_world)
    return rows, slider_lin_pos


def _normalize_angle(a):
    """btNormalizeAngle: wrap to [-pi, pi]."""
    a = jnp.mod(a, 2 * jnp.pi)
    return jnp.where(a < -jnp.pi, a + 2 * jnp.pi, jnp.where(a > jnp.pi, a - 2 * jnp.pi, a))


def _adjust_angle_to_limits(angle, lo, hi):
    """btAdjustAngleToLimits: shift by +/- 2*pi toward the nearer bound."""
    no_limit = lo >= hi
    below = angle < lo
    above = angle > hi
    diff_lo_b = jnp.abs(_normalize_angle(lo - angle))
    diff_hi_b = jnp.abs(_normalize_angle(hi - angle))
    adj_below = jnp.where(diff_lo_b < diff_hi_b, angle, angle + 2 * jnp.pi)
    diff_hi_a = jnp.abs(_normalize_angle(angle - hi))
    diff_lo_a = jnp.abs(_normalize_angle(angle - lo))
    adj_above = jnp.where(diff_hi_a < diff_lo_a, angle, angle - 2 * jnp.pi)
    return jnp.where(
        no_limit, angle, jnp.where(below, adj_below, jnp.where(above, adj_above, angle))
    )


def _motor_factor(pos, lo, hi, vel, fps):
    """btTypedConstraint::getMotorFactor (ramp motor near limits)."""
    free = lo > hi
    locked = jnp.abs(hi - lo) < 1e-12
    delta_max = vel / fps
    neg = delta_max < 0
    lim_neg = jnp.where(
        (pos >= lo) & (pos < lo - delta_max),
        (lo - pos) / jnp.where(neg, delta_max, 1.0),
        jnp.where(pos < lo, 0.0, 1.0),
    )
    pose = delta_max > 0
    lim_pos = jnp.where(
        (pos <= hi) & (pos > hi - delta_max),
        (hi - pos) / jnp.where(pose, delta_max, 1.0),
        jnp.where(pos > hi, 0.0, 1.0),
    )
    fact = jnp.where(neg, lim_neg, jnp.where(pose, lim_pos, 0.0))
    return jnp.where(free, 1.0, jnp.where(locked, 0.0, fact))


class _Contacts(NamedTuple):
    """Contact slots for body-vs-static pairs. [NPAIR, K, ...]"""

    body: jnp.ndarray  # [NPAIR] dynamic body index
    other: jnp.ndarray  # [NPAIR] static body index
    point: jnp.ndarray  # [NPAIR, K, 3] world contact point (on body surface)
    normal: jnp.ndarray  # [NPAIR, K, 3] pushes body out of the static hull
    gap: jnp.ndarray  # [NPAIR, K] signed distance (neg = penetrating)
    active: jnp.ndarray  # [NPAIR, K] bool
    vid: jnp.ndarray  # [NPAIR, K] hull vertex id
    friction: jnp.ndarray  # [NPAIR] combined friction coefficient


def _static_face_planes(model: PhysicsModel) -> tuple[np.ndarray, np.ndarray]:
    """Precompute world-space face planes of static bodies (they never move).

    Returns (planes [NB, F, 4] as (normal, offset) with n.x + d = dist, mask).
    Computed with scipy at trace time (runs once per model)."""
    from scipy.spatial import ConvexHull

    fmax = 1
    planes_per_body = []
    for i in range(model.n_bodies):
        if model.inv_mass[i] > 0:
            planes_per_body.append(np.zeros((0, 4)))
            continue
        pts = model.hull[i][model.hull_mask[i] > 0]
        # static bodies in the reference envs are axis-aligned at identity
        # rotation; apply the (static) world transform anyway for generality
        q = model.init_quat[i]
        from .model import _quat_to_mat3 as q2m

        world = (q2m(q) @ pts.T).T + model.init_pos[i]
        hull = ConvexHull(world, qhull_options="QJ")
        eq = hull.equations  # n.x + d <= 0 inside
        # deduplicate near-identical planes
        uniq = []
        for e in eq:
            if not any(np.allclose(e, u, atol=1e-5) for u in uniq):
                uniq.append(e)
        planes_per_body.append(np.array(uniq))
        fmax = max(fmax, len(uniq))
    planes = np.zeros((model.n_bodies, fmax, 4), dtype=np.float32)
    mask = np.zeros((model.n_bodies, fmax), dtype=np.float32)
    for i, pl in enumerate(planes_per_body):
        planes[i, : len(pl)] = pl
        # unreal planes get offset pushing everything far outside
        planes[i, len(pl):] = np.array([0, 1, 0, -1e9])
        mask[i, : len(pl)] = 1.0
    return planes, mask


def _model_cache(name: str):
    """Per-model memo keyed by the live object (weakref-validated).

    `id()` alone can alias after GC reuses an address; entries are stored as
    (weakref, value) and validated by identity, and a weakref callback purges
    dead entries so builder workflows creating many models don't leak."""
    import weakref

    store: dict[int, tuple] = {}

    def get(model, extra_key, compute):
        key = (id(model), extra_key)
        ent = store.get(key)
        if ent is not None and ent[0]() is model:
            return ent[1]
        val = compute()
        store[key] = (weakref.ref(model, lambda _, k=key: store.pop(k, None)), val)
        return val

    return get


_get_planes_cached = _model_cache("planes")
_get_solver_cached = _model_cache("solvers")


def _get_static_planes(model: PhysicsModel):
    return _get_planes_cached(model, None, lambda: _static_face_planes(model))


def detect_contacts(model: PhysicsModel, state: PhysicsState) -> _Contacts:
    """Hull-vertex vs static-hull-face contacts, deepest K per pair.

    Equivalent role to Bullet's dispatcher+manifolds for the envs' dominant
    interaction (members vs the static floor/base box). Margins: convex hulls
    are margin-expanded outward (btConvexHullShape), so the effective gap is
    face_distance(vertex) - margin_body - margin_static."""
    planes_np, mask_np = _get_static_planes(model)
    planes = jnp.asarray(planes_np)

    pair = model.pair_body
    static_mask = model.inv_mass[pair[:, 1]] == 0.0
    pairs = pair[np.asarray(static_mask)]
    if len(pairs) == 0:
        k = MAX_CONTACTS_PER_PAIR
        z = jnp.zeros((0, k))
        return _Contacts(
            body=jnp.zeros((0,), jnp.int32),
            other=jnp.zeros((0,), jnp.int32),
            point=jnp.zeros((0, k, 3)),
            normal=jnp.zeros((0, k, 3)),
            gap=z,
            active=z > 0,
            vid=jnp.zeros((0, k), jnp.int32),
            friction=jnp.zeros((0,)),
        )

    # static numpy indices: indexing with constants lowers to slices, not
    # dynamic gathers
    ia = pairs[:, 0]
    ib = pairs[:, 1]
    hull = model_arr(model.hull)[ia]  # [NP, V, 3]
    hmask = model_arr(model.hull_mask)[ia]
    world = state.pos[ia][:, None, :] + maths.quat_rotate(
        state.quat[ia][:, None, :], hull
    )  # [NP, V, 3]

    pl = planes[ib]  # [NP, F, 4]
    # distance of each vertex to each face plane; inside-hull depth = max over faces
    d = jnp.einsum("pvk,pfk->pvf", world, pl[..., :3]) + pl[:, None, :, 3]
    face = jnp.argmax(d, axis=-1)  # closest face
    dist = jnp.max(d, axis=-1)  # [NP, V] signed distance to static surface
    margin = model_arr(model.margin)
    gap = dist - margin[ia][:, None] - margin[ib][:, None]
    gap = jnp.where(hmask > 0, gap, 1e9)

    k = MAX_CONTACTS_PER_PAIR
    neg_gap, vid = jax.lax.top_k(-gap, k)  # deepest K vertices
    sel_gap = -neg_gap
    sel_pt = jnp.take_along_axis(world, vid[..., None], axis=1)
    sel_face = jnp.take_along_axis(face, vid, axis=1)
    sel_n = jnp.take_along_axis(
        pl[..., :3], sel_face[..., None], axis=1
    )  # [NP, K, 3] outward normal of static body = pushes body out
    active = sel_gap < CONTACT_BREAKING

    # combined friction = mu_a * mu_b clamped (btManifoldResult)
    fric = jnp.clip(model_arr(model.friction)[ia] * model_arr(model.friction)[ib], 0.0, 10.0)

    return _Contacts(
        body=ia,
        other=ib,
        point=sel_pt,
        normal=sel_n,
        gap=sel_gap,
        active=active,
        vid=vid,
        friction=fric,
    )


def _static_row_bodies(model: PhysicsModel) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (body_a, body_b) in the canonical flat row layout, as static
    numpy — mirrors build_joint_rows' emission order exactly."""
    idx_a, idx_b = [], []

    def emit(a, b, count):
        idx_a.extend([int(a)] * count)
        idx_b.extend([int(b)] * count)

    for a, b in model.p2p_body:
        emit(a, b, 3)
    for a, b in model.hinge_body:
        emit(a, b, 6)
    for a, b in model.fixed_body:
        emit(a, b, 6)
    for a, b in model.slider_body:
        emit(a, b, 7)
    return np.array(idx_a, np.int32), np.array(idx_b, np.int32)


def _n_dyn_contacts(model: PhysicsModel) -> int:
    """Member-member contact points (= normal rows) across all dyn pairs."""
    if not model.member_contacts:
        return 0
    return len(model.dyn_pair_body) * model.member_manifold_k


# near-duplicate manifold points: the best-K-of-2K merge can pick both
# directions' representation of the SAME physical contact (A-vertex-in-B-face
# and B-vertex-in-A-face at nearly the same point); keeping both would
# double-count that normal row and stiffen the response vs Bullet's clipped
# manifolds (ADVICE r3). Points closer than this are deduplicated.
DEDUP_TOL = 0.01

_get_edges_cached = _model_cache("hull_edges")
_EDGE_DIRS = 4  # default unique edge directions kept per proxy hull
# (model.member_edge_dirs overrides — the fidelity knob quantified in
# tools/fidelity_mtv.py / PARITY.md "known gaps")


def _get_hull_edges(model: PhysicsModel):
    """Per-body unique proxy-hull edge directions (local frame), for the
    edge-edge separating-axis test: returns ([NB, E, 3], [NB, E]) numpy.

    Directions are deduped up to sign (cos > 0.99) and ranked by total edge
    length, keeping the top E — a box contributes exactly its 3 axes. Bodies
    outside every dyn pair get empty masks."""

    def compute():
        from scipy.spatial import ConvexHull

        n_dirs = int(getattr(model, "member_edge_dirs", _EDGE_DIRS))
        nb = model.np_hull.shape[0]
        dirs = np.zeros((nb, n_dirs, 3), np.float32)
        mask = np.zeros((nb, n_dirs), np.float32)
        for i in range(nb):
            if model.np_hull_mask[i].sum() < 4:
                continue
            pts = model.np_hull[i][model.np_hull_mask[i] > 0].astype(np.float64)
            try:
                hull = ConvexHull(pts, qhull_options="QJ")
            except Exception:
                continue
            acc: list[list] = []  # [unit dir, total length]
            for s in hull.simplices:
                for a_, b_ in ((0, 1), (1, 2), (2, 0)):
                    v = pts[s[a_]] - pts[s[b_]]
                    ln = float(np.linalg.norm(v))
                    if ln < 1e-9:
                        continue
                    d = v / ln
                    for ent in acc:
                        if abs(float(np.dot(d, ent[0]))) > 0.99:
                            ent[1] += ln
                            break
                    else:
                        acc.append([d, ln])
            acc.sort(key=lambda e: -e[1])
            for j, (dv, _) in enumerate(acc[:n_dirs]):
                dirs[i, j] = dv
                mask[i, j] = 1.0
        return dirs, mask

    return _get_edges_cached(model, None, compute)


def _dyn_narrowphase(model: PhysicsModel, pos, quat):
    """Up-to-K SAT vertex-face contacts per dyn pair (proxy hulls).

    Tests each pair both ways — B's proxy verts against A's faces and A's
    against B's — takes the K deepest vertices of EACH direction (2K
    candidates) and keeps the K deepest overall, each with the supporting
    face normal at its own vertex. This plays the role of Bullet's
    up-to-4-point persistent manifolds from convex-convex narrowphase +
    incident-face clipping (item.cpp:17-52): a face-face contact patch is
    represented by its penetrating corner vertices (the clip-polygon corners
    that matter), so resting/stacking torque is constrained — a single point
    cannot do that (VERDICT r2 #5). Returns (point [NDP, K, 3],
    normal [NDP, K, 3] pointing from B toward A, gap [NDP, K]).
    See model.PhysicsModel.np_hull for the proxy-hull rationale."""
    dp = model.dyn_pair_body
    kd = model.member_manifold_k
    ia, ib = dp[:, 0], dp[:, 1]
    hull = model.np_hull  # static numpy
    hmask = model.np_hull_mask  # static numpy
    face = model.np_face  # static numpy
    marg = model_arr(model.margin)

    def deepest(widx, fidx):
        """K deepest verts of body W against faces of body F, in W's local
        frame.

        Same local-frame formulation as batched._dyn_narrowphase (which is
        the perf-critical layout; see its docstring) so the per-env and
        env-last paths agree numerically."""
        q_rel = maths.quat_mul(maths.quat_conj(quat[fidx]), quat[widx])
        t_rel = maths.quat_rotate(
            maths.quat_conj(quat[fidx]), pos[widx] - pos[fidx]
        )
        nl = jnp.asarray(face[fidx][..., :3])  # [P, F, 3]
        dl = jnp.asarray(face[fidx][..., 3])  # [P, F]
        nrot = maths.quat_rotate(
            maths.quat_conj(q_rel)[:, None], nl
        )  # [P, F, 3] — F's face normals in W's frame
        doff = jnp.sum(nl * t_rel[:, None], -1) + dl  # [P, F]

        hw = jnp.asarray(hull[widx])  # [P, V, 3]
        d = jnp.einsum("pvj,pfj->pvf", hw, nrot) + doff[:, None]
        dist = jnp.max(d, -1)  # [P, V]
        fid = jnp.argmax(d, -1)  # supporting face per vertex [P, V]
        dist = jnp.where(jnp.asarray(hmask[widx]) > 0, dist, 1e9)
        # face-axis penetration from the SAME tensor (second reduce over the
        # fused chain): depth of W's deepest vertex below each F-face plane,
        # minimized over faces = the face-axis MTV contribution. Padded faces
        # sit at -1e9 so the max ignores them; padded verts repeat vertex 0
        # so the min is unaffected. Only needed for edge-axis arbitration.
        pen_face = (
            -jnp.max(jnp.min(d, 1), -1) if model.member_edge_contacts else None
        )  # [P]
        neg, v_id = jax.lax.top_k(-dist, kd)  # K deepest vertices [P, K]
        gap = -neg
        hsel = jnp.take_along_axis(hw, v_id[..., None], 1)  # [P, K, 3]
        pt = pos[widx][:, None] + maths.quat_rotate(quat[widx][:, None], hsel)
        f_sel = jnp.take_along_axis(fid, v_id, 1)  # [P, K]
        nl_sel = jnp.take_along_axis(
            jnp.asarray(nl), f_sel[..., None], 1
        )  # [P, K, 3]
        nrm = maths.quat_rotate(quat[fidx][:, None], nl_sel)
        return pt, nrm, gap, v_id, pen_face

    pt1, nrm1, gap1, vid1, pen_face1 = deepest(ib, ia)  # B's verts in A
    pt2, nrm2, gap2, vid2, pen_face2 = deepest(ia, ib)  # A's verts in B
    nv = hull.shape[1]

    # contact normal points from B toward A: A's face normal points out of A
    # (toward B's vertex) -> negate; B's face normal points toward A -> keep
    cand_pt = jnp.concatenate([pt1, pt2], 1)  # [P, 2K, 3]
    cand_n = jnp.concatenate([-nrm1, nrm2], 1)
    cand_gap = jnp.concatenate([gap1, gap2], 1)
    cand_vid = jnp.concatenate([vid1, nv + vid2], 1)  # feature id per cand
    neg, sel = jax.lax.top_k(-cand_gap, kd)  # K deepest candidates
    point = jnp.take_along_axis(cand_pt, sel[..., None], 1)
    n = jnp.take_along_axis(cand_n, sel[..., None], 1)
    vid = jnp.take_along_axis(cand_vid, sel, 1)  # [P, K]
    raw_gap = -neg  # pre-margin

    # near-duplicate dedup (see DEDUP_TOL): deactivate any selected point
    # within tolerance of an earlier (deeper) selection
    d2 = jnp.sum((point[:, :, None] - point[:, None, :]) ** 2, -1)  # [P,K,K]
    later = jnp.arange(kd)[None, :, None] > jnp.arange(kd)[None, None, :]
    raw_gap = jnp.where(
        ((d2 < DEDUP_TOL**2) & later).any(-1), 1e9, raw_gap
    )

    # edge-edge separating axes (Bullet's EPA finds the minimal-penetration
    # direction on the full hulls, item.cpp:17-52; vertex-face SAT alone
    # pushes along a face normal even when two members are wedged edge-on-
    # edge). Uniform support-based SAT: for every candidate axis (face
    # normals of both hulls + cross(edge_a, edge_b)) project both hulls and
    # take the interval overlap; if the minimal-overlap axis is an EDGE
    # cross axis (strictly smaller than every face axis, 0.95 feature-
    # preference factor like box-box solvers use), the manifold becomes the
    # single edge contact along that axis. Gated by
    # model.member_edge_contacts (the fidelity default).
    if not model.member_edge_contacts:
        gap = raw_gap - (marg[ia] + marg[ib])[:, None]
        vid = jnp.where(raw_gap > 1e8, -1, vid)
        return point, n, gap, vid
    edirs, emask = _get_hull_edges(model)
    ea = maths.quat_rotate(quat[ia][:, None], jnp.asarray(edirs[ia]))  # [P,E,3]
    eb = maths.quat_rotate(quat[ib][:, None], jnp.asarray(edirs[ib]))
    cr = jnp.cross(ea[:, :, None, :], eb[:, None, :, :])  # [P,E,E,3]
    cr_len = jnp.linalg.norm(cr, axis=-1)
    cr_ok = (
        (cr_len > 1e-6)
        & (jnp.asarray(emask[ia])[:, :, None] > 0)
        & (jnp.asarray(emask[ib])[:, None, :] > 0)
    )
    npair = len(ia)
    e_axes = (cr / jnp.maximum(cr_len, 1e-12)[..., None]).reshape(npair, -1, 3)
    e_ok = cr_ok.reshape(npair, -1)
    # supports use only the TRUE hull vertices: the decimated hull has at
    # most NP_VERTS (12) of them and they precede the edge-subdivision test
    # points in np_hull (model.np_support_mask documents the exact set; any
    # test points inside the slice are interior and never extreme, so the
    # slice is support-exact at half the vertex extent)
    nsupp = min(12, hull.shape[1])
    ha = jnp.asarray(hull[ia][:, :nsupp])  # [P,S,3]
    hb = jnp.asarray(hull[ib][:, :nsupp])
    ma = jnp.asarray(hmask[ia][:, :nsupp]) > 0  # all slice entries are
    mb = jnp.asarray(hmask[ib][:, :nsupp]) > 0  # support-safe (see above)
    big = 1e9

    def sat_overlap(axes_w, ok):
        """Interval overlap of the two hulls along each world axis [P,Q,3]."""
        la = maths.quat_rotate_inv(quat[ia][:, None], axes_w)
        lb = maths.quat_rotate_inv(quat[ib][:, None], axes_w)
        proj_a = jnp.einsum("pvj,pqj->pqv", ha, la)  # [P,Q,V]
        proj_b = jnp.einsum("pvj,pqj->pqv", hb, lb)
        amin = jnp.min(jnp.where(ma[:, None], proj_a, big), -1)
        amax = jnp.max(jnp.where(ma[:, None], proj_a, -big), -1)
        bmin = jnp.min(jnp.where(mb[:, None], proj_b, big), -1)
        bmax = jnp.max(jnp.where(mb[:, None], proj_b, -big), -1)
        oa = jnp.sum(axes_w * pos[ia][:, None], -1)
        ob = jnp.sum(axes_w * pos[ib][:, None], -1)
        overlap = jnp.minimum(oa + amax, ob + bmax) - jnp.maximum(
            oa + amin, ob + bmin
        )
        return jnp.where(ok, overlap, big)

    # face-axis MTV comes from the vertex-face tensor's second reduce in
    # `deepest` (both directions) — no separate support pass needed
    pen_f = jnp.minimum(pen_face1, pen_face2)  # [P]
    pen_edges = sat_overlap(e_axes, e_ok)  # [P, E*E]
    e_best = jnp.argmin(pen_edges, -1)
    pen_e = jnp.take_along_axis(pen_edges, e_best[:, None], 1)[:, 0]
    ax_e = jnp.take_along_axis(e_axes, e_best[:, None, None], 1)[:, 0]
    sgn = jnp.sign(jnp.sum(ax_e * (pos[ia] - pos[ib]), -1))
    ax_e = ax_e * jnp.where(sgn == 0, 1.0, sgn)[:, None]  # point B -> A
    # support points: A's deepest vertex along -L, B's along +L; the edge
    # contact sits midway (closest-edge-point approximation on proxy hulls)
    la_e = maths.quat_rotate_inv(quat[ia], ax_e)
    lb_e = maths.quat_rotate_inv(quat[ib], ax_e)
    pa_v = jnp.where(ma, jnp.einsum("pvj,pj->pv", ha, la_e), big).argmin(-1)
    pb_v = jnp.where(mb, jnp.einsum("pvj,pj->pv", hb, lb_e), -big).argmax(-1)
    sa = pos[ia] + maths.quat_rotate(
        quat[ia], jnp.take_along_axis(ha, pa_v[:, None, None], 1)[:, 0]
    )
    sb = pos[ib] + maths.quat_rotate(
        quat[ib], jnp.take_along_axis(hb, pb_v[:, None, None], 1)[:, 0]
    )
    # the support vertices lie on the supporting EDGES (lines through them
    # along the winning pair's edge directions); the contact point is the
    # midpoint of the closest points of those two lines (the support vertex
    # alone tie-breaks to an edge endpoint, putting the contact far from the
    # actual crossing and corrupting the torque)
    ne = edirs.shape[1]
    da = jnp.take_along_axis(ea, (e_best // ne)[:, None, None], 1)[:, 0]
    db = jnp.take_along_axis(eb, (e_best % ne)[:, None, None], 1)[:, 0]
    r_ab = sa - sb
    b_dd = jnp.sum(da * db, -1)
    d_dr = jnp.sum(da * r_ab, -1)
    e_dr = jnp.sum(db * r_ab, -1)
    denom = 1.0 - b_dd * b_dd
    safe = jnp.abs(denom) > 1e-9
    t1 = jnp.where(safe, (b_dd * e_dr - d_dr) / jnp.where(safe, denom, 1.0), 0.0)
    t2 = jnp.where(safe, (e_dr - b_dd * d_dr) / jnp.where(safe, denom, 1.0), 0.0)
    pt_e = 0.5 * (sa + t1[:, None] * da + sb + t2[:, None] * db)
    use_edge = (pen_e < big / 2) & (pen_e > 0) & (pen_e < 0.95 * pen_f)
    point = jnp.where(use_edge[:, None, None], point.at[:, 0].set(pt_e), point)
    n = jnp.where(use_edge[:, None, None], n.at[:, 0].set(ax_e), n)
    # feature id encodes the WINNING edge pair (2*nv + e_best): a change of
    # separating axis must invalidate the cached impulse — one shared id for
    # all edge contacts would warm-start across different normal frames
    vid = jnp.where(use_edge[:, None], vid.at[:, 0].set(2 * nv + e_best), vid)
    edge_gap = raw_gap.at[:, 0].set(-pen_e)
    if kd > 1:
        edge_gap = edge_gap.at[:, 1:].set(1e9)  # single-point edge manifold
    raw_gap = jnp.where(use_edge[:, None], edge_gap, raw_gap)

    gap = raw_gap - (marg[ia] + marg[ib])[:, None]
    vid = jnp.where(raw_gap > 1e8, -1, vid)  # deduped / suppressed slots
    return point, n, gap, vid


def _member_contact_rows(model: PhysicsModel, pos, quat, lin_vel, ang_vel,
                         iinv_world, dt, warm_cache=None):
    """Member-member contacts -> packed solver rows (SAT narrowphase).

    Returns (normal_rows [NDC, 28], friction_rows [NDC*2, 28],
    push_rows [NDC, 28], extras) where NDC = n_pairs * member_manifold_k —
    up to K manifold points per pair, flattened pair-major; floor contacts
    keep their own 4-point full-hull manifolds. `warm_cache` =
    (state.dyn_vid, state.dyn_lambda) turns on persistent warm starting:
    extras additionally carries the warm-start impulse aggregate `imp6`
    [NB, 6] and the solver's initial lambdas (lam_n0 [NDC], lam_t0
    [NDC, 2]); extras always carries (act, vid)."""
    dp = model.dyn_pair_body
    kd = model.member_manifold_k
    ia, ib = np.repeat(dp[:, 0], kd), np.repeat(dp[:, 1], kd)
    point, n, gap, vid = _dyn_narrowphase(model, pos, quat)
    point = point.reshape(-1, 3)
    n = n.reshape(-1, 3)
    gap = gap.reshape(-1)
    vid = vid.reshape(-1)
    act = (gap < CONTACT_BREAKING).astype(jnp.float32)

    rel_a = point - pos[ia]
    rel_b = point - pos[ib]
    inv_m_a = model_arr(model.inv_mass)[ia][:, None]
    inv_m_b = model_arr(model.inv_mass)[ib][:, None]
    ii_a = iinv_world[ia]
    ii_b = iinv_world[ib]

    def rows_for(d):
        ja_ang = jnp.cross(rel_a, d)
        jb_ang = -jnp.cross(rel_b, d)
        j = jnp.stack([d, ja_ang, -d, jb_ang], axis=-2)  # [NDP, 4, 3]
        dva = jnp.stack(
            [inv_m_a * d, jnp.einsum("pij,pj->pi", ii_a, ja_ang)], axis=-2
        )
        dvb = jnp.stack(
            [-inv_m_b * d, jnp.einsum("pij,pj->pi", ii_b, jb_ang)], axis=-2
        )
        eff = (
            jnp.sum(j[:, 0] * dva[:, 0], -1) + jnp.sum(j[:, 1] * dva[:, 1], -1)
            + jnp.sum(j[:, 2] * dvb[:, 0], -1) + jnp.sum(j[:, 3] * dvb[:, 1], -1)
        )
        inv_eff = jnp.where(eff > 1e-12, 1.0 / jnp.maximum(eff, 1e-12), 0.0)
        return j, dva, dvb, inv_eff

    ndc = len(dp) * kd
    jn_m, dva_n, dvb_n, ie_n = rows_for(n)
    rhs_n = jnp.where(gap > 0, -gap / dt, 0.0)
    zeros = jnp.zeros((ndc,))
    inf_ = jnp.full((ndc,), jnp.inf)
    normal_rows = _pack_rows(jn_m, dva_n, dvb_n, rhs_n, zeros, inf_, ie_n * act)
    rhs_push = jnp.where(gap < 0, -gap * ERP2 / dt, 0.0)
    push_rows = _pack_rows(jn_m, dva_n, dvb_n, rhs_push, zeros, inf_, ie_n * act)

    rel_vel = (
        lin_vel[ia] + jnp.cross(ang_vel[ia], rel_a)
        - lin_vel[ib] - jnp.cross(ang_vel[ib], rel_b)
    )
    t1, t2, t2_en = _friction_dirs(n, rel_vel, model.strict_bullet)
    fr = []
    for ti, d in enumerate((t1, t2)):
        jt, dva_t, dvb_t, ie_t = rows_for(d)
        en = 1.0 if ti == 0 else t2_en
        fr.append(_pack_rows(jt, dva_t, dvb_t, zeros, zeros, zeros, ie_t * act * en))
    # interleave (contact point, dir): [NDC, 2, 28]
    friction_rows = jnp.stack(fr, axis=1).reshape(ndc * 2, -1)
    extras = {"act": act, "vid": vid}
    if warm_cache is not None:
        warm_dyn = _dyn_warm_match(model, vid, act, *warm_cache)
        lam_n0 = warm_dyn[:, 0] * act
        lam_t0 = warm_dyn[:, 1:] * act[:, None]
        jt1, dva_t1, dvb_t1, _ = rows_for(t1)
        jt2, dva_t2, dvb_t2, _ = rows_for(t2)
        imp_a = (
            dva_n * lam_n0[:, None, None]
            + dva_t1 * lam_t0[:, 0, None, None]
            + dva_t2 * lam_t0[:, 1, None, None]
        ).reshape(ndc, 6)
        imp_b = (
            dvb_n * lam_n0[:, None, None]
            + dvb_t1 * lam_t0[:, 0, None, None]
            + dvb_t2 * lam_t0[:, 1, None, None]
        ).reshape(ndc, 6)
        oh_a = np.zeros((ndc, model.n_bodies), np.float32)
        oh_b = np.zeros((ndc, model.n_bodies), np.float32)
        oh_a[np.arange(ndc), ia] = 1.0
        oh_b[np.arange(ndc), ib] = 1.0
        extras["imp6"] = jnp.asarray(oh_a).T @ imp_a + jnp.asarray(oh_b).T @ imp_b
        extras["lam_n0"] = lam_n0
        extras["lam_t0"] = lam_t0
    return normal_rows, friction_rows, push_rows, extras


def _dyn_warm_match(model: PhysicsModel, vid_new, act_new, dyn_vid, dyn_lambda):
    """Match this step's member-contact feature ids against the cached ones
    and carry the impulses (x WARMSTART) for persisting contacts. Shapes:
    vid_new/act_new [NDC]; returns [NDC, 3]."""
    kd = model.member_manifold_k
    old_vid = dyn_vid.reshape(-1, kd)
    old_lam = dyn_lambda.reshape(-1, kd, 3)
    newv = vid_new.reshape(-1, kd)
    match = (newv[..., :, None] == old_vid[..., None, :]) & (
        old_vid[..., None, :] >= 0
    )
    lam = jnp.einsum("pko,pod->pkd", match.astype(old_lam.dtype), old_lam)
    return jnp.where(
        act_new.reshape(-1, kd)[..., None] > 0, lam * WARMSTART, 0.0
    ).reshape(-1, 3)


def _get_pallas_solver(model: PhysicsModel, kind: str, n_pair: int, n_dyn: int = 0):
    """custom_vmap-wrapped fused sweep for this model (cached).

    kind: "full" (joints + contact normal + friction rows, Bullet order) or
    "push" (contact normal rows only — the split-impulse position pass).
    Row order for "full": joints | floor normals (pair-major, slot) | member
    normals | floor frictions (pair, slot, dir) | member frictions (pair, dir).
    The single-env call pads to one kernel tile; under vmap the batch rule
    pads the env batch to a multiple of the tile and runs one kernel."""
    return _get_solver_cached(
        model, (kind, n_pair, n_dyn),
        lambda: _build_pallas_solver(model, kind, n_pair, n_dyn),
    )


def _schedule_rows(idx6_a, idx6_b, parent, skip_b, chunk=8):
    """Static visit order + disjoint GROUPS for the fused sweep.

    The sweep is a serial Gauss-Seidel chain: Mosaic must serialize every
    row's load/update of the shared velocity buffer, so consecutive rows
    cannot overlap even when they touch different bodies (measured: the
    kernel is latency-bound per row visit). This scheduler permutes the
    rows and partitions each DMA chunk into GROUPS of rows with pairwise
    DISJOINT bodies; the kernel then performs all of a group's velocity
    loads before any of its stores, giving the compiler provably
    independent work to overlap. Rows in one group see each other's
    pre-group velocities (a <=chunk-wide Jacobi block) — the same ordering
    relaxation the xla backend's colored phases already take, far gentler
    (group width <= 8 vs whole-color phases); strict-Bullet parity mode
    bypasses the permutation and keeps the exact sequential order.

    Constraints: a friction row's parent normal must land in an EARLIER
    group (its clamp reads the parent's accumulated impulse); groups never
    span DMA chunk boundaries. Returns (perm [N] int32, groups: tuple of
    per-visit-position group sizes encoded as a tuple of (start, size))."""
    n = len(idx6_a)
    a = idx6_a // 6
    bb = np.where(skip_b, -1, idx6_b // 6)
    last_use = np.full(int(max(a.max(), bb.max()) + 2), -(10**9), np.int64)
    scheduled = np.zeros(n, bool)
    parent_ok = parent < 0  # eligible once the parent's group is CLOSED
    perm = np.empty(n, np.int64)
    groups = []
    order_bias = -np.arange(n) * 1e-9  # stable tie-break: earlier first
    t = 0
    while t < n:
        # one chunk: pack groups until `chunk` rows are placed (or rows run out)
        in_chunk = 0
        while in_chunk < chunk and t < n:
            group_start = t
            used = set()
            closed_parent_ok = parent_ok.copy()
            while in_chunk < chunk and t < n:
                score_a = t - last_use[a]
                score_b = np.where(bb >= 0, t - last_use[bb], 10**9)
                score = np.minimum(score_a, score_b).astype(np.float64) + order_bias
                score[scheduled] = -np.inf
                score[~closed_parent_ok] = -np.inf
                if used:
                    bad = np.isin(a, list(used)) | (
                        (bb >= 0) & np.isin(bb, list(used))
                    )
                    score[bad] = -np.inf
                v = int(np.argmax(score))
                if not np.isfinite(score[v]):
                    break  # nothing fits this group
                perm[t] = v
                scheduled[v] = True
                used.add(int(a[v]))
                if bb[v] >= 0:
                    used.add(int(bb[v]))
                last_use[a[v]] = t
                if bb[v] >= 0:
                    last_use[bb[v]] = t
                t += 1
                in_chunk += 1
            if t == group_start:
                # stuck: every candidate's parent sits in a just-closed
                # group's snapshot — recompute eligibility against all
                # scheduled rows and emit a single-row group
                elig = ~scheduled & (
                    (parent < 0) | scheduled[np.clip(parent, 0, n - 1)]
                )
                v = int(np.nonzero(elig)[0][0])
                perm[t] = v
                scheduled[v] = True
                last_use[a[v]] = t
                if bb[v] >= 0:
                    last_use[bb[v]] = t
                t += 1
                in_chunk += 1
                groups.append((group_start, 1))
            else:
                groups.append((group_start, t - group_start))
            # a group closes: its rows' children become eligible
            parent_ok = parent_ok | (
                (parent >= 0) & scheduled[np.clip(parent, 0, n - 1)]
            )
            if in_chunk >= chunk:
                in_chunk = 0
    return perm.astype(np.int32), tuple(groups)


def _shuffled_order(n, parent, seed: int) -> np.ndarray:
    """Seeded random row visit order with every friction row AFTER its
    parent normal (the live mu*lam[parent] clamp reads the accumulator).

    Used to train policies that are robust to solver micro-order (r4
    finding: gaits trained under one order scored 0/64 under another —
    runs/WALK_R4.md): training cycles several shuffled:<seed> variants plus
    the canonical order so no single visit order is load-bearing."""
    rng = np.random.RandomState(seed)
    keys = rng.rand(n)
    child = parent >= 0
    # children sort just after their parent (epsilon offsets keep siblings
    # distinct); any interleaving with other rows is a valid sweep order
    keys[child] = keys[np.clip(parent, 0, None)][child] + 1e-9 * (
        1.0 + np.arange(n)[child]
    )
    return np.argsort(keys, kind="stable").astype(np.int32)


def _solver_meta(model: PhysicsModel, kind: str, n_pair: int, n_dyn: int):
    """Static per-row solver metadata (body offsets, bound kinds, friction
    parents) — shared by the per-env custom_vmap wrapper below and the
    env-last batched path (batched.py).

    n_dyn counts member contact POINTS (pairs x member_manifold_k),
    flattened pair-major to match _member_contact_rows.

    For kind=="full" on non-strict models the row VISIT order follows
    model.row_order ("canonical" | "scheduled" | "shuffled:<seed>" — see
    the PhysicsModel field); a non-canonical order returns the permutation
    `perm`, and callers gather row data/lam0 by `perm` and scatter lambdas
    back through its inverse. Perf note: quiet-chip A/B measured the kernel
    itself unchanged under "scheduled" (it sits at ~78% of its DMA
    bandwidth floor, not on row-to-row latency) while the row/lam gathers
    cost ~1.8 ms/step at B=2048 — so "canonical" is the throughput
    configuration, and non-canonical orders exist for gait-robustness
    training and A/Bs. Solve order is physics-visible to trained policies
    (runs/WALK_R4.md), which is why it lives on the model and is stamped
    into run configs/checkpoints. strict_bullet always keeps the canonical
    Bullet order (perm=None).

    Returns (idx6_a, idx6_b, parent, mu, kind_arr, skip_b, perm)."""
    from . import solver_pallas as sp

    k = MAX_CONTACTS_PER_PAIR
    pair_np = model.pair_body
    static_sel = model.inv_mass[pair_np[:, 1]] == 0.0
    body_np = pair_np[static_sel][:, 0]
    if n_dyn:
        dp = model.dyn_pair_body
        kd = n_dyn // len(dp)
        assert kd * len(dp) == n_dyn, (n_dyn, len(dp))
        dyn_a = np.repeat(dp[:, 0], kd).astype(np.int32)
        dyn_b = np.repeat(dp[:, 1], kd).astype(np.int32)
    else:
        dyn_a = dyn_b = np.zeros((0,), np.int32)

    nrj = model.n_rows if kind == "full" else 0
    if kind == "full":
        ja, jb = _static_row_bodies(model)
        fric_np = np.clip(
            model.friction[body_np] * model.friction[pair_np[static_sel][:, 1]], 0, 10
        )
        fric_dyn = np.clip(model.friction[dyn_a] * model.friction[dyn_b], 0, 10)
        idx6_a = np.concatenate(
            [ja * 6, np.repeat(body_np, k) * 6, dyn_a * 6,
             np.repeat(body_np, 2 * k) * 6, np.repeat(dyn_a, 2) * 6]
        )
        idx6_b = np.concatenate(
            [jb * 6, np.zeros(n_pair * k, np.int32), dyn_b * 6,
             np.zeros(n_pair * 2 * k, np.int32), np.repeat(dyn_b, 2) * 6]
        )
        floor_normal_ids = nrj + np.arange(n_pair * k)
        member_normal_ids = nrj + n_pair * k + np.arange(n_dyn)
        parent = np.concatenate(
            [
                np.full(nrj + n_pair * k + n_dyn, -1, np.int32),
                np.repeat(floor_normal_ids, 2).astype(np.int32),
                np.repeat(member_normal_ids, 2).astype(np.int32),
            ]
        )
        mu = np.concatenate(
            [
                np.zeros(nrj + n_pair * k + n_dyn, np.float32),
                np.repeat(fric_np, 2 * k).astype(np.float32),
                np.repeat(fric_dyn, 2).astype(np.float32),
            ]
        )
        kind_arr = np.concatenate(
            [
                np.full(nrj, sp.KIND_JOINT, np.int32),
                np.full(n_pair * k + n_dyn, sp.KIND_NORMAL, np.int32),
                np.full((n_pair * 2 * k) + n_dyn * 2, sp.KIND_FRICTION, np.int32),
            ]
        )
        # floor contact rows have a static body B: skip the B-side work
        skip_b = np.concatenate(
            [
                np.zeros(nrj, bool),
                np.ones(n_pair * k, bool), np.zeros(n_dyn, bool),
                np.ones(n_pair * 2 * k, bool), np.zeros(n_dyn * 2, bool),
            ]
        )
    else:
        idx6_a = np.concatenate([np.repeat(body_np, k) * 6, dyn_a * 6])
        idx6_b = np.concatenate([np.zeros(n_pair * k, np.int32), dyn_b * 6])
        parent = np.full(n_pair * k + n_dyn, -1, np.int32)
        mu = np.zeros(n_pair * k + n_dyn, np.float32)
        kind_arr = np.full(n_pair * k + n_dyn, sp.KIND_NORMAL, np.int32)
        skip_b = np.concatenate(
            [np.ones(n_pair * k, bool), np.zeros(n_dyn, bool)]
        )
    perm = None
    groups = None
    import os

    order = getattr(model, "row_order", "scheduled")
    if (kind == "full" and not model.strict_bullet and order != "canonical"
            and len(idx6_a) > 1):
        chunk = int(os.environ.get("EVOMOTION_PALLAS_CHUNK", "8"))
        if order == "scheduled":
            perm, groups = _schedule_rows(idx6_a, idx6_b, parent, skip_b, chunk)
        elif order.startswith("shuffled:"):
            perm = _shuffled_order(len(idx6_a), parent, int(order.split(":")[1]))
            groups = None  # strictly sequential visits in shuffled order
        else:
            raise ValueError(f"unknown row_order {order!r}")
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm), dtype=np.int32)
        idx6_a = idx6_a[perm]
        idx6_b = idx6_b[perm]
        mu = mu[perm]
        kind_arr = kind_arr[perm]
        skip_b = skip_b[perm]
        old_parent = parent[perm]
        parent = np.where(old_parent >= 0, inv[np.clip(old_parent, 0, None)], -1)
    return idx6_a, idx6_b, parent, mu, kind_arr, skip_b, perm, groups


def _build_pallas_solver(model: PhysicsModel, kind: str, n_pair: int, n_dyn: int):
    from . import solver_pallas as sp

    idx6_a, idx6_b, parent, mu, kind_arr, skip_b, perm, groups = _solver_meta(
        model, kind, n_pair, n_dyn
    )
    if perm is not None:
        # keep the index arrays as NUMPY: the solver closure is cached across
        # jit traces, and a jnp constant materialized during one trace would
        # leak that trace's tracer into the next (UnexpectedTracerError)
        inv_perm = np.empty_like(perm)
        inv_perm[perm] = np.arange(len(perm), dtype=np.int32)
    n_iters = model.n_iterations
    interpret = jax.default_backend() != "tpu"
    import os

    chunk = int(os.environ.get("EVOMOTION_PALLAS_CHUNK", "8"))

    @jax.custom_batching.custom_vmap
    def solve(row_data, vel6, lam0):
        # unbatched call: pad to one kernel tile
        if perm is not None:  # latency-optimized visit order (see _solver_meta)
            row_data = row_data[perm]
            lam0 = lam0[perm]
        rd = jnp.broadcast_to(row_data, (sp.TILE,) + row_data.shape) * 0
        rd = rd.at[0].set(row_data)
        v6 = jnp.zeros((sp.TILE,) + vel6.shape).at[0].set(vel6)
        l0 = jnp.zeros((sp.TILE,) + lam0.shape).at[0].set(lam0)
        v, l = sp.solver_sweep(
            rd, v6, l0, idx6_a, idx6_b, parent, mu, n_iters,
            kind=kind_arr, skip_b=skip_b, chunk=chunk, interpret=interpret,
            groups=groups,
        )
        lam_out = l[0][inv_perm] if perm is not None else l[0]
        return v[0], lam_out

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, row_data, vel6, lam0):
        # closure-constant args (e.g. the zero velocity buffer of the push
        # pass) arrive unbatched — broadcast them to the batch
        rb, vb, lb = in_batched
        if not rb:
            row_data = jnp.broadcast_to(row_data, (axis_size,) + row_data.shape)
        if not vb:
            vel6 = jnp.broadcast_to(vel6, (axis_size,) + vel6.shape)
        if not lb:
            lam0 = jnp.broadcast_to(lam0, (axis_size,) + lam0.shape)
        b = row_data.shape[0]
        pad = (-b) % sp.TILE
        if pad:
            row_data = jnp.concatenate([row_data, jnp.zeros((pad,) + row_data.shape[1:])], 0)
            vel6 = jnp.concatenate([vel6, jnp.zeros((pad,) + vel6.shape[1:])], 0)
            lam0 = jnp.concatenate([lam0, jnp.zeros((pad,) + lam0.shape[1:])], 0)
        if perm is not None:
            row_data = row_data[:, perm]
            lam0 = lam0[:, perm]
        v, l = sp.solver_sweep(
            row_data, vel6, lam0, idx6_a, idx6_b, parent, mu, n_iters,
            kind=kind_arr, skip_b=skip_b, chunk=chunk, interpret=interpret,
            groups=groups,
        )
        if perm is not None:
            l = l[:, inv_perm]
        return (v[:b], l[:b]), (True, True)

    return solve


def _pack_rows(j, dv_a, dv_b, rhs, lo, hi, inv_eff):
    """Pack row pieces into the kernel's [NR, 28] layout (solver_pallas)."""
    return jnp.concatenate(
        [
            j.reshape(j.shape[:-2] + (12,)),
            dv_a.reshape(dv_a.shape[:-2] + (6,)),
            dv_b.reshape(dv_b.shape[:-2] + (6,)),
            rhs[..., None], lo[..., None], hi[..., None], inv_eff[..., None],
        ],
        axis=-1,
    )


def _warm_start_match(contacts: _Contacts, state: PhysicsState) -> jnp.ndarray:
    """Carry cached impulses for persisting contact points (vertex-id match)."""
    old_vid = state.contact_vid  # [NP, K]
    old_lam = state.contact_lambda  # [NP, K, 3]
    new_vid = contacts.vid
    match = (new_vid[..., :, None] == old_vid[..., None, :]) & (old_vid[..., None, :] >= 0)
    lam = jnp.einsum("pko,pod->pkd", match.astype(old_lam.dtype), old_lam)
    return jnp.where(contacts.active[..., None], lam * WARMSTART, 0.0)


def physics_step(
    model: PhysicsModel,
    state: PhysicsState,
    motor_target: jnp.ndarray,
    motor_enabled: jnp.ndarray,
    dt: float,
) -> tuple[PhysicsState, StepDiagnostics]:
    """Advance one world by one fixed substep (see module docstring).

    motor_target: [NS] target linear velocities for slider motors (already
    scaled: action * max_speed — muscle_controller.cpp:10-12, slider.cpp:11-13).
    motor_enabled: [NS] bool (cartpole disables its motor during reset settle,
    cartpole.cpp:168-178).

    On the pallas backend this function carries a custom vmap rule: vmapping
    it over an env batch routes to the env-last implementation in batched.py
    (dense lane tiling, rows built directly in the kernel layout) instead of
    batching the per-env code op by op.
    """
    if model.solver == "pallas":
        step = _get_step_cached(model, float(dt), lambda: _build_custom_step(model, float(dt)))
        return step(state, motor_target, motor_enabled)
    return _physics_step_impl(model, state, motor_target, motor_enabled, dt)


_get_step_cached = _model_cache("steps")


def _build_custom_step(model: PhysicsModel, dt: float):
    @jax.custom_batching.custom_vmap
    def step(state, motor_target, motor_enabled):
        return _physics_step_impl(model, state, motor_target, motor_enabled, dt)

    @step.def_vmap
    def _rule(axis_size, in_batched, state, motor_target, motor_enabled):
        from . import batched

        return batched.vmapped_step(
            model, dt, axis_size, in_batched, state, motor_target, motor_enabled
        )

    return step


def _physics_step_impl(
    model: PhysicsModel,
    state: PhysicsState,
    motor_target: jnp.ndarray,
    motor_enabled: jnp.ndarray,
    dt: float,
) -> tuple[PhysicsState, StepDiagnostics]:
    """Single-env step body (both solver backends; see physics_step)."""
    dyn = (model_arr(model.inv_mass) > 0).astype(jnp.float32)[:, None]

    # 1. gravity
    lin_vel = state.lin_vel + dyn * GRAVITY * dt
    ang_vel = state.ang_vel

    # world-space inverse inertia: R diag(Iinv) R^T
    rot = maths.quat_to_mat3(state.quat)
    iinv_world = jnp.einsum(
        "bij,bj,bkj->bik", rot, model_arr(model.inv_inertia_local), rot
    )

    # 2. contacts
    contacts = detect_contacts(model, state)
    warm_lam = _warm_start_match(contacts, state)

    # 3. joint rows
    rows, slider_lin_pos = build_joint_rows(
        model, state.pos, state.quat, iinv_world, motor_target, motor_enabled, dt
    )

    # contact rows (normal + 2 friction dirs)
    n_pair = contacts.gap.shape[0]
    k = MAX_CONTACTS_PER_PAIR
    vel6 = jnp.concatenate([lin_vel, ang_vel], axis=-1)  # [NB, 6]

    # joint warm starting (strict mode): Bullet seeds every solver constraint
    # from its cached impulse x m_warmstartingFactor and applies the impulse
    # to the body velocities during setup
    if model.strict_bullet and model.n_rows:
        jl0 = state.joint_lambda * WARMSTART
        ja_np, jb_np = _static_row_bodies(model)
        oh_ja = np.zeros((model.n_rows, model.n_bodies), np.float32)
        oh_jb = np.zeros((model.n_rows, model.n_bodies), np.float32)
        oh_ja[np.arange(model.n_rows), ja_np] = 1.0
        oh_jb[np.arange(model.n_rows), jb_np] = 1.0
        da6 = jnp.concatenate(
            [rows.dv_a[:, 0] * jl0[:, None], rows.dv_a[:, 1] * jl0[:, None]], -1
        )
        db6 = jnp.concatenate(
            [rows.dv_b[:, 0] * jl0[:, None], rows.dv_b[:, 1] * jl0[:, None]], -1
        )
        vel6 = vel6 + jnp.asarray(oh_ja).T @ da6 + jnp.asarray(oh_jb).T @ db6
    else:
        jl0 = jnp.zeros((model.n_rows,))

    # member-member (dyn-dyn) rows for the pallas backend: computed
    # regardless of whether any dynamic-static manifold pairs exist — a
    # model with dyn pairs but zero floor pairs must still solve member
    # contacts, and both backends must agree on that configuration
    n_dyn = _n_dyn_contacts(model) if model.solver == "pallas" else 0
    if n_dyn:
        member_normal, member_friction, member_push, member_x = (
            _member_contact_rows(
                model, state.pos, state.quat, lin_vel, ang_vel,
                iinv_world, dt,
                warm_cache=(state.dyn_vid, state.dyn_lambda),
            )
        )

    if n_pair:
        r_a = contacts.point - state.pos[contacts.body][:, None, :]
        n = contacts.normal
        rel_vel = lin_vel[contacts.body][:, None] + jnp.cross(
            ang_vel[contacts.body][:, None], r_a
        )  # body B is static
        t1, t2, t2_en = _friction_dirs(n, rel_vel, model.strict_bullet)
        act = contacts.active.astype(jnp.float32)

        def contact_j(d):
            # body is "a"; static other is "b" (zero inv mass, rows ignore it)
            zeros = jnp.zeros_like(d)
            return jnp.stack([d, jnp.cross(r_a, d), zeros, zeros], axis=-2)

        jn = contact_j(n)
        jt1 = contact_j(t1)
        jt2 = contact_j(t2)

        inv_m = model_arr(model.inv_mass)[contacts.body][:, None]
        ii = iinv_world[contacts.body][:, None]

        def eff(jrow):
            dv_lin = inv_m[..., None] * jrow[..., 0, :]
            dv_ang = jnp.einsum("pkij,pkj->pki", ii.repeat(k, 1), jrow[..., 1, :])
            e = jnp.sum(jrow[..., 0, :] * dv_lin, -1) + jnp.sum(jrow[..., 1, :] * dv_ang, -1)
            return dv_lin, dv_ang, jnp.where(e > 1e-12, 1.0 / jnp.maximum(e, 1e-12), 0.0)

        dvn_lin, dvn_ang, inv_eff_n = eff(jn)
        dvt1_lin, dvt1_ang, inv_eff_t1 = eff(jt1)
        dvt2_lin, dvt2_ang, inv_eff_t2 = eff(jt2)
        inv_eff_t2 = inv_eff_t2 * t2_en

        # velocity-pass rhs (btSequentialImpulseConstraintSolver::
        # setupContactConstraint with split impulse on): separated contacts may
        # approach at gap/dt; penetration is resolved in the position pass
        rhs_n = jnp.where(contacts.gap > 0, -contacts.gap / dt, 0.0)

        # STATIC one-hot scatter/gather matrices: contact pairs are model
        # constants, so body gathers/scatters become dense einsums (TPU
        # scatter lowers to a slow serialized path — avoid it in hot loops)
        pair_np = model.pair_body
        static_sel = model.inv_mass[pair_np[:, 1]] == 0.0
        body_np = pair_np[static_sel][:, 0]
        oh_c = np.zeros((len(body_np), model.n_bodies), dtype=np.float32)
        oh_c[np.arange(len(body_np)), body_np] = 1.0
        oh_c = jnp.asarray(oh_c)  # [NP, NB]

        def c_gather(v6):
            return oh_c @ v6  # [NP, 6]

        def c_scatter(dv_lin_k, dv_ang_k, d):
            # [NP, 3] contributions scattered back to bodies
            return oh_c.T @ jnp.concatenate(
                [dv_lin_k * d[:, None], dv_ang_k * d[:, None]], axis=-1
            )

        # 4. split-impulse position pass (solveGroupCacheFriendlySplitImpulse)
        rhs_push = jnp.where(contacts.gap < 0, -contacts.gap * ERP2 / dt, 0.0)
        dv_n = jnp.stack([dvn_lin, dvn_ang], axis=-2)  # [NP, K, 2, 3]
        inf_pk = jnp.full((n_pair, k), jnp.inf)

        if model.solver == "pallas":
            push_rows = _pack_rows(
                jn, dv_n, jnp.zeros_like(dv_n), rhs_push,
                jnp.zeros((n_pair, k)), inf_pk, inv_eff_n * act,
            ).reshape(n_pair * k, -1)
            if n_dyn:
                push_rows = jnp.concatenate([push_rows, member_push], 0)
            solve_push = _get_pallas_solver(model, "push", n_pair, n_dyn)
            push6, _ = solve_push(
                push_rows, jnp.zeros((model.n_bodies, 6)),
                jnp.zeros((n_pair * k + n_dyn,)),
            )
        else:
            push6 = jnp.zeros_like(vel6)

            def push_iter(_, carry):
                push6, lam_p = carry
                for kk in range(k):
                    v = c_gather(push6)
                    jv = jnp.sum(jn[:, kk, 0] * v[:, :3], -1) + jnp.sum(jn[:, kk, 1] * v[:, 3:], -1)
                    delta = (rhs_push[:, kk] - jv) * inv_eff_n[:, kk] * act[:, kk]
                    new_l = jnp.maximum(lam_p[:, kk] + delta, 0.0)
                    d = new_l - lam_p[:, kk]
                    lam_p = lam_p.at[:, kk].set(new_l)
                    push6 = push6 + c_scatter(dvn_lin[:, kk], dvn_ang[:, kk], d)
                return push6, lam_p

            push6, _ = jax.lax.fori_loop(
                0, model.n_iterations, push_iter, (push6, jnp.zeros_like(contacts.gap))
            )

        # warm start contact impulses
        lam_n0 = warm_lam[..., 0]
        lam_t0 = warm_lam[..., 1:]
        imp_lin = (
            dvn_lin * lam_n0[..., None]
            + dvt1_lin * lam_t0[..., 0:1]
            + dvt2_lin * lam_t0[..., 1:2]
        ).sum(1)
        imp_ang = (
            dvn_ang * lam_n0[..., None]
            + dvt1_ang * lam_t0[..., 0:1]
            + dvt2_ang * lam_t0[..., 1:2]
        ).sum(1)
        vel6 = vel6 + oh_c.T @ jnp.concatenate([imp_lin, imp_ang], axis=-1)
    else:
        if n_dyn:
            # member-only split-impulse pass (no floor pairs)
            solve_push = _get_pallas_solver(model, "push", 0, n_dyn)
            push6, _ = solve_push(
                member_push, jnp.zeros((model.n_bodies, 6)),
                jnp.zeros((n_dyn,)),
            )
        else:
            push6 = jnp.zeros_like(vel6)
        lam_n0 = jnp.zeros((0, k))
        lam_t0 = jnp.zeros((0, k, 2))

    # member-member (dyn-dyn) contacts on the XLA backend: SAT narrowphase +
    # statically colored Gauss-Seidel phases (pairs in one color touch
    # disjoint bodies, so a vectorized update is a valid GS step). The pallas
    # backend handles these rows inside the fused sweep instead.
    n_dyn_x = 0 if model.solver == "pallas" else _n_dyn_contacts(model)
    if n_dyn_x:
        dp_np = model.dyn_pair_body
        kd = model.member_manifold_k
        d_ia = np.repeat(dp_np[:, 0], kd)  # per contact point
        d_ib = np.repeat(dp_np[:, 1], kd)
        dpoint, dnorm, dgap, dvid = _dyn_narrowphase(model, state.pos, state.quat)
        dpoint = dpoint.reshape(-1, 3)
        dnorm = dnorm.reshape(-1, 3)
        dgap = dgap.reshape(-1)
        dvid = dvid.reshape(-1)
        dact = (dgap < CONTACT_BREAKING).astype(jnp.float32)
        warm_dyn = _dyn_warm_match(
            model, dvid, dact, state.dyn_vid, state.dyn_lambda
        )
        drel_a = dpoint - state.pos[d_ia]
        drel_b = dpoint - state.pos[d_ib]
        inv_m_da = model_arr(model.inv_mass)[d_ia][:, None]
        inv_m_db = model_arr(model.inv_mass)[d_ib][:, None]
        ii_da = iinv_world[d_ia]
        ii_db = iinv_world[d_ib]

        def d_rows(d):
            ja_ang = jnp.cross(drel_a, d)
            jb_ang = -jnp.cross(drel_b, d)
            dva = jnp.stack(
                [inv_m_da * d, jnp.einsum("pij,pj->pi", ii_da, ja_ang)], axis=-2
            )
            dvb = jnp.stack(
                [-inv_m_db * d, jnp.einsum("pij,pj->pi", ii_db, jb_ang)], axis=-2
            )
            eff = (
                jnp.sum(d * dva[:, 0], -1) + jnp.sum(ja_ang * dva[:, 1], -1)
                + jnp.sum(-d * dvb[:, 0], -1) + jnp.sum(jb_ang * dvb[:, 1], -1)
            )
            ie = jnp.where(eff > 1e-12, 1.0 / jnp.maximum(eff, 1e-12), 0.0)
            j = jnp.stack([d, ja_ang, -d, jb_ang], axis=-2)
            return j, dva, dvb, ie

        dn_j, dn_dva, dn_dvb, dn_ie = d_rows(dnorm)
        d_rel_vel = (
            lin_vel[d_ia] + jnp.cross(ang_vel[d_ia], drel_a)
            - lin_vel[d_ib] - jnp.cross(ang_vel[d_ib], drel_b)
        )
        dt1, dt2, d_t2_en = _friction_dirs(dnorm, d_rel_vel, model.strict_bullet)
        dt1_j, dt1_dva, dt1_dvb, dt1_ie = d_rows(dt1)
        dt2_j, dt2_dva, dt2_dvb, dt2_ie = d_rows(dt2)
        dt2_ie = dt2_ie * d_t2_en
        rhs_dn = jnp.where(dgap > 0, -dgap / dt, 0.0)
        rhs_dpush = jnp.where(dgap < 0, -dgap * ERP2 / dt, 0.0)
        fric_d = jnp.asarray(
            np.clip(model.friction[d_ia] * model.friction[d_ib], 0, 10)
        )
        # colors are over PAIRS (pairs in one color touch disjoint bodies);
        # the K manifold points of one pair share both bodies, so they run
        # as K sequential slot sub-steps within each color (same scheme as
        # the floor path's K-slot loop)
        d_colors = [np.asarray(c) for c in model.dyn_pair_color]
        oh_d = []
        for c in d_colors:
            oa = np.zeros((len(c), model.n_bodies), np.float32)
            ob = np.zeros((len(c), model.n_bodies), np.float32)
            oa[np.arange(len(c)), dp_np[c, 0]] = 1.0
            ob[np.arange(len(c)), dp_np[c, 1]] = 1.0
            oh_d.append((jnp.asarray(oa), jnp.asarray(ob)))

        def member_solve_rows(v6, lam, ci, oa, ob, j, dva, dvb, ie, rhs, lo_fn):
            """One colored GS step for flat contact rows ci (static numpy
            indices, one slot of one color); returns (v6, lam) with lam only
            updated at ci."""
            va = oa @ v6
            vb = ob @ v6
            jc, dvac, dvbc = j[ci], dva[ci], dvb[ci]
            jv = (
                jnp.sum(jc[:, 0] * va[:, :3], -1) + jnp.sum(jc[:, 1] * va[:, 3:], -1)
                + jnp.sum(jc[:, 2] * vb[:, :3], -1) + jnp.sum(jc[:, 3] * vb[:, 3:], -1)
            )
            delta = (rhs[ci] - jv) * ie[ci] * dact[ci]
            new_l = lo_fn(lam[ci] + delta, ci)
            dl = new_l - lam[ci]
            lam = lam.at[ci].set(new_l)
            v6 = v6 + oa.T @ jnp.concatenate(
                [dvac[:, 0] * dl[:, None], dvac[:, 1] * dl[:, None]], -1
            ) + ob.T @ jnp.concatenate(
                [dvbc[:, 0] * dl[:, None], dvbc[:, 1] * dl[:, None]], -1
            )
            return v6, lam

        def member_push_pass(p6, lam_dp):
            for c_idx, cp in enumerate(d_colors):
                oa, ob = oh_d[c_idx]
                for kk in range(kd):
                    p6, lam_dp = member_solve_rows(
                        p6, lam_dp, cp * kd + kk, oa, ob,
                        dn_j, dn_dva, dn_dvb, dn_ie, rhs_dpush,
                        lambda x, ci: jnp.maximum(x, 0.0),
                    )
            return p6, lam_dp

        def member_vel_pass(v6, lam_dn, lam_dt):
            for c_idx, cp in enumerate(d_colors):
                oa, ob = oh_d[c_idx]
                for kk in range(kd):
                    v6, lam_dn = member_solve_rows(
                        v6, lam_dn, cp * kd + kk, oa, ob,
                        dn_j, dn_dva, dn_dvb, dn_ie, rhs_dn,
                        lambda x, ci: jnp.maximum(x, 0.0),
                    )
            zero_rhs = jnp.zeros_like(rhs_dn)
            for ti, (j, dva, dvb, ie) in enumerate(
                ((dt1_j, dt1_dva, dt1_dvb, dt1_ie), (dt2_j, dt2_dva, dt2_dvb, dt2_ie))
            ):
                for c_idx, cp in enumerate(d_colors):
                    oa, ob = oh_d[c_idx]
                    for kk in range(kd):
                        lam_ti = lam_dt[:, ti]
                        v6, lam_ti = member_solve_rows(
                            v6, lam_ti, cp * kd + kk, oa, ob, j, dva, dvb, ie,
                            zero_rhs,
                            lambda x, ci: jnp.clip(
                                x, -fric_d[ci] * lam_dn[ci], fric_d[ci] * lam_dn[ci]
                            ),
                        )
                        lam_dt = lam_dt.at[:, ti].set(lam_ti)
            return v6, lam_dn, lam_dt

        # member split-impulse pass (after the floor pass; the two row sets
        # share bodies, so this is sequential block GS — the xla backend's
        # documented ordering relaxation)
        def d_push_iter(_, carry):
            return member_push_pass(*carry)

        push6, _ = jax.lax.fori_loop(
            0, model.n_iterations, d_push_iter, (push6, jnp.zeros((n_dyn_x,)))
        )

    # 5. velocity iterations.
    if model.solver == "pallas":
        # fused sequential sweep: joints + contact rows in exact Bullet order
        n_rows = model.n_rows
        joint_packed = _pack_rows(
            rows.j, rows.dv_a, rows.dv_b, rows.rhs, rows.lo, rows.hi, rows.inv_eff
        )  # [NRJ, 28]
        if n_pair:
            normal_packed = _pack_rows(
                jn, dv_n, jnp.zeros_like(dv_n), rhs_n,
                jnp.zeros((n_pair, k)), inf_pk, inv_eff_n * act,
            ).reshape(n_pair * k, -1)
            dv_t1 = jnp.stack([dvt1_lin, dvt1_ang], axis=-2)
            dv_t2 = jnp.stack([dvt2_lin, dvt2_ang], axis=-2)
            jt = jnp.stack([jt1, jt2], axis=2)  # [NP, K, 2dirs, 4, 3]
            dv_t = jnp.stack([dv_t1, dv_t2], axis=2)
            ie_t = jnp.stack([inv_eff_t1 * act, inv_eff_t2 * act], axis=2)
            friction_packed = _pack_rows(
                jt, dv_t, jnp.zeros_like(dv_t), jnp.zeros((n_pair, k, 2)),
                jnp.zeros((n_pair, k, 2)), jnp.zeros((n_pair, k, 2)), ie_t,
            ).reshape(n_pair * k * 2, -1)
            if n_dyn:
                # member warm-start impulses enter the velocities here, next
                # to the floor-contact warm start above; the solver starts
                # from the matched accumulated lambdas
                vel6 = vel6 + member_x["imp6"].reshape(model.n_bodies, 6)
                all_rows = jnp.concatenate(
                    [joint_packed, normal_packed, member_normal,
                     friction_packed, member_friction], 0
                )
                lam0_all = jnp.concatenate(
                    [jl0, lam_n0.reshape(-1), member_x["lam_n0"],
                     lam_t0.reshape(n_pair * k * 2),
                     member_x["lam_t0"].reshape(n_dyn * 2)]
                )
            else:
                all_rows = jnp.concatenate([joint_packed, normal_packed, friction_packed], 0)
                lam0_all = jnp.concatenate(
                    [jl0, lam_n0.reshape(-1),
                     lam_t0.reshape(n_pair * k * 2)]
                )
        elif n_dyn:
            # dyn pairs without floor pairs: member rows still solve (and
            # their warm-start impulses still enter the velocities)
            vel6 = vel6 + member_x["imp6"].reshape(model.n_bodies, 6)
            all_rows = jnp.concatenate(
                [joint_packed, member_normal, member_friction], 0
            )
            lam0_all = jnp.concatenate(
                [jl0, member_x["lam_n0"], member_x["lam_t0"].reshape(n_dyn * 2)]
            )
        else:
            all_rows = joint_packed
            lam0_all = jl0

        solve = _get_pallas_solver(model, "full", n_pair, n_dyn)
        vel_mat, lam_all = solve(all_rows, vel6.reshape(model.n_bodies, 6), lam0_all)
        vel6 = vel_mat.reshape(model.n_bodies, 6)
        lam = lam_all[:n_rows]
        base_n = n_rows
        base_f = base_n + n_pair * k + n_dyn
        if n_pair:
            lam_n = lam_all[base_n : base_n + n_pair * k].reshape(n_pair, k)
            lam_t = lam_all[base_f : base_f + n_pair * k * 2].reshape(n_pair, k, 2)
        else:
            lam_n, lam_t = lam_n0, lam_t0
        dyn_cache = None
        if n_dyn:
            m_lam_n = lam_all[base_n + n_pair * k : base_n + n_pair * k + n_dyn]
            m_lam_t = lam_all[
                base_f + n_pair * k * 2 : base_f + n_pair * k * 2 + n_dyn * 2
            ].reshape(n_dyn, 2)
            dyn_cache = (
                jnp.concatenate([m_lam_n[:, None], m_lam_t], 1)
                * member_x["act"][:, None],
                jnp.where(member_x["act"] > 0, member_x["vid"], -1),
            )
        return _finish_step(
            model, state, vel6, push6, lam, lam_n, lam_t, contacts, slider_lin_pos,
            n_pair, dt, dyn_cache=dyn_cache,
        )

    # --- XLA path: colored phases as one-hot einsums ---
    # Everything index-dependent is precomputed as STATIC one-hot matrices and
    # the row data is regrouped phase-major, so each Gauss-Seidel phase is a
    # handful of dense (MXU-friendly) einsums — no gather/scatter in the hot
    # loop, and a fori_loop over phases keeps the HLO small.
    n_rows = model.n_rows
    n_phases = int(model.phase_table.shape[0])

    if n_phases:
        r_max = int(model.phase_table.shape[1])
        # pad flat rows with one dummy zero row; regroup phase-major once
        table = model.phase_table.reshape(-1)  # static numpy indices

        def regroup(x):
            padded = jnp.concatenate([x, jnp.zeros_like(x[:1])], 0)
            return padded[table].reshape((n_phases, r_max) + x.shape[1:])

        j_p = regroup(rows.j)  # [P, R, 4, 3]
        dva_p = regroup(rows.dv_a)  # [P, R, 2, 3]
        dvb_p = regroup(rows.dv_b)
        inv_eff_p = regroup(rows.inv_eff)  # [P, R]
        rhs_p = regroup(rows.rhs)
        lo_p = regroup(rows.lo)
        hi_p = regroup(rows.hi)
        # one-hot body selectors per phase row (zero rows for padding)
        pad_ids = model.phase_table  # [P, R] with n_rows = padding
        oh_a_np = np.zeros((n_phases, r_max, model.n_bodies), dtype=np.float32)
        oh_b_np = np.zeros((n_phases, r_max, model.n_bodies), dtype=np.float32)
        idx_a_flat, idx_b_flat = _static_row_bodies(model)
        for p in range(n_phases):
            for s in range(r_max):
                rid = int(pad_ids[p, s])
                if rid < n_rows:
                    oh_a_np[p, s, idx_a_flat[rid]] = 1.0
                    oh_b_np[p, s, idx_b_flat[rid]] = 1.0
        oh_a = jnp.asarray(oh_a_np)
        oh_b = jnp.asarray(oh_b_np)

        def _solve_phase(p, carry):
            vel6, lam = carry
            jp = jax.lax.dynamic_index_in_dim(j_p, p, keepdims=False)
            da = jax.lax.dynamic_index_in_dim(dva_p, p, keepdims=False)
            db = jax.lax.dynamic_index_in_dim(dvb_p, p, keepdims=False)
            oa = jax.lax.dynamic_index_in_dim(oh_a, p, keepdims=False)  # [R, NB]
            ob = jax.lax.dynamic_index_in_dim(oh_b, p, keepdims=False)
            ie = jax.lax.dynamic_index_in_dim(inv_eff_p, p, keepdims=False)
            rh = jax.lax.dynamic_index_in_dim(rhs_p, p, keepdims=False)
            lo = jax.lax.dynamic_index_in_dim(lo_p, p, keepdims=False)
            hi = jax.lax.dynamic_index_in_dim(hi_p, p, keepdims=False)
            lam_p = jax.lax.dynamic_index_in_dim(lam, p, keepdims=False)

            va = oa @ vel6  # [R, 6]
            vb = ob @ vel6
            jv = (
                jnp.sum(jp[:, 0] * va[:, :3], -1)
                + jnp.sum(jp[:, 1] * va[:, 3:], -1)
                + jnp.sum(jp[:, 2] * vb[:, :3], -1)
                + jnp.sum(jp[:, 3] * vb[:, 3:], -1)
            )
            delta = (rh - jv) * ie
            new_l = jnp.clip(lam_p + delta, lo, hi)
            d = new_l - lam_p
            lam = jax.lax.dynamic_update_index_in_dim(lam, new_l, p, 0)
            dva6 = jnp.concatenate([da[:, 0] * d[:, None], da[:, 1] * d[:, None]], -1)
            dvb6 = jnp.concatenate([db[:, 0] * d[:, None], db[:, 1] * d[:, None]], -1)
            vel6 = vel6 + oa.T @ dva6 + ob.T @ dvb6
            return vel6, lam

    def vel_iter(_, carry):
        vel6, lam, lam_n, lam_t, lam_dn, lam_dt = carry
        if n_phases:  # static: models without joints skip the phase loop
            vel6, lam = jax.lax.fori_loop(0, n_phases, _solve_phase, (vel6, lam))

        if n_pair:
            # contact normals (slot loop: same-pair slots share the body)
            for kk in range(k):
                v = c_gather(vel6)
                jv = jnp.sum(jn[:, kk, 0] * v[:, :3], -1) + jnp.sum(jn[:, kk, 1] * v[:, 3:], -1)
                delta = (rhs_n[:, kk] - jv) * inv_eff_n[:, kk] * act[:, kk]
                new_l = jnp.maximum(lam_n[:, kk] + delta, 0.0)
                d = new_l - lam_n[:, kk]
                lam_n = lam_n.at[:, kk].set(new_l)
                vel6 = vel6 + c_scatter(dvn_lin[:, kk], dvn_ang[:, kk], d)
            # friction, clamped to mu * normal impulse
            for kk in range(k):
                lim = contacts.friction * lam_n[:, kk]
                for ti, (jt, dvl, dva, ie) in enumerate(
                    ((jt1, dvt1_lin, dvt1_ang, inv_eff_t1), (jt2, dvt2_lin, dvt2_ang, inv_eff_t2))
                ):
                    v = c_gather(vel6)
                    jv = jnp.sum(jt[:, kk, 0] * v[:, :3], -1) + jnp.sum(jt[:, kk, 1] * v[:, 3:], -1)
                    delta = (0.0 - jv) * ie[:, kk] * act[:, kk]
                    new_l = jnp.clip(lam_t[:, kk, ti] + delta, -lim, lim)
                    d = new_l - lam_t[:, kk, ti]
                    lam_t = lam_t.at[:, kk, ti].set(new_l)
                    vel6 = vel6 + c_scatter(dvl[:, kk], dva[:, kk], d)
        if n_dyn_x:
            vel6, lam_dn, lam_dt = member_vel_pass(vel6, lam_dn, lam_dt)
        return vel6, lam, lam_n, lam_t, lam_dn, lam_dt

    lam_pm0 = jnp.zeros((max(n_phases, 1), int(model.phase_table.shape[1])))
    if model.strict_bullet and n_phases:
        rps0 = model.row_phase_slot  # static numpy [n_rows, 2]
        lam_pm0 = lam_pm0.at[rps0[:, 0], rps0[:, 1]].set(jl0)
    if n_dyn_x:
        # persistent member-manifold warm start (mirrors the floor block
        # above): impulses into the velocities, lambdas seed the iterations
        lam_dn0 = warm_dyn[:, 0] * dact
        lam_dt0 = warm_dyn[:, 1:] * dact[:, None]
        d_imp_a = (
            dn_dva * lam_dn0[:, None, None]
            + dt1_dva * lam_dt0[:, 0, None, None]
            + dt2_dva * lam_dt0[:, 1, None, None]
        ).reshape(n_dyn_x, 6)
        d_imp_b = (
            dn_dvb * lam_dn0[:, None, None]
            + dt1_dvb * lam_dt0[:, 0, None, None]
            + dt2_dvb * lam_dt0[:, 1, None, None]
        ).reshape(n_dyn_x, 6)
        oh_da = np.zeros((n_dyn_x, model.n_bodies), np.float32)
        oh_db = np.zeros((n_dyn_x, model.n_bodies), np.float32)
        oh_da[np.arange(n_dyn_x), d_ia] = 1.0
        oh_db[np.arange(n_dyn_x), d_ib] = 1.0
        vel6 = vel6 + jnp.asarray(oh_da).T @ d_imp_a + jnp.asarray(oh_db).T @ d_imp_b
    else:
        lam_dn0 = jnp.zeros((n_dyn_x,))
        lam_dt0 = jnp.zeros((n_dyn_x, 2))
    vel6, lam_pm, lam_n, lam_t, lam_dn_f, lam_dt_f = jax.lax.fori_loop(
        0, model.n_iterations, vel_iter,
        (vel6, lam_pm0, lam_n0, lam_t0, lam_dn0, lam_dt0),
    )
    # flatten phase-major impulses back to row order for diagnostics
    if n_phases:
        rps = model.row_phase_slot  # static numpy [n_rows, 2]
        lam = lam_pm[rps[:, 0], rps[:, 1]]
    else:
        lam = jnp.zeros((n_rows,))

    dyn_cache = None
    if n_dyn_x:
        dyn_cache = (
            jnp.concatenate([lam_dn_f[:, None], lam_dt_f], 1) * dact[:, None],
            jnp.where(dact > 0, dvid, -1),
        )
    return _finish_step(
        model, state, vel6, push6, lam, lam_n, lam_t, contacts, slider_lin_pos,
        n_pair, dt, dyn_cache=dyn_cache,
    )


def _finish_step(
    model, state, vel6, push6, lam, lam_n, lam_t, contacts, slider_lin_pos,
    n_pair, dt, dyn_cache=None,
):
    """Shared step tail: integrate transforms, extract diagnostics, persist
    the contact warm-start cache."""
    n_rows = model.n_rows
    # static bodies never move (Bullet: zero inv mass). Their dv rows are
    # zero so impulses normally cancel, but 0 * NaN = NaN — an exploded
    # solve would otherwise leak NaN into static bodies that no reset ever
    # rewrites. Force their velocities to zero before integrating.
    dyn_m = jnp.asarray((model.inv_mass > 0).astype(np.float32))[:, None]
    lin_vel = jnp.where(dyn_m > 0, vel6[:, :3], 0.0)
    ang_vel = jnp.where(dyn_m > 0, vel6[:, 3:], 0.0)
    push6 = jnp.where(dyn_m > 0, push6, 0.0)

    # 6. integrate transforms; split-impulse push velocities move positions
    # only (writebackVelocityAndTransform, turn erp on the angular part)
    pos = state.pos + (lin_vel + push6[:, :3]) * dt
    quat = maths.quat_integrate(state.quat, ang_vel + push6[:, 3:] * TURN_ERP, dt)

    # diagnostics
    ns = model.n_slider
    np2p = model.n_p2p
    if ns:
        base_s = n_rows - 7 * ns
        s_ids = base_s + 7 * np.arange(ns)
        slider_imp = lam[s_ids + 5] + lam[s_ids + 6]  # limit + motor rows
    else:
        slider_imp = jnp.zeros((0,))
    if np2p:
        p_ids = 3 * np.arange(np2p)
        p2p_imp = jnp.sqrt(lam[p_ids] ** 2 + lam[p_ids + 1] ** 2 + lam[p_ids + 2] ** 2)
    else:
        p2p_imp = jnp.zeros((0,))

    floor_contact = jnp.zeros((model.n_bodies,))
    if n_pair:
        pair_np = model.pair_body
        static_sel = model.inv_mass[pair_np[:, 1]] == 0.0
        body_np = pair_np[static_sel][:, 0]
        oh_c2 = np.zeros((len(body_np), model.n_bodies), dtype=np.float32)
        oh_c2[np.arange(len(body_np)), body_np] = 1.0
        touching = (contacts.active & (contacts.gap < 0)).any(axis=1)
        floor_contact = jnp.clip(
            jnp.asarray(oh_c2).T @ touching.astype(jnp.float32), 0.0, 1.0
        )
        new_cl = jnp.stack([lam_n, lam_t[..., 0], lam_t[..., 1]], axis=-1)
        new_vid = jnp.where(contacts.active, contacts.vid, -1)
    else:
        new_cl = state.contact_lambda
        new_vid = state.contact_vid

    if dyn_cache is not None:
        new_dl, new_dv = dyn_cache
    else:
        new_dl, new_dv = state.dyn_lambda, state.dyn_vid
    new_state = PhysicsState(
        pos=pos,
        quat=quat,
        lin_vel=lin_vel,
        ang_vel=ang_vel,
        contact_lambda=new_cl,
        contact_vid=new_vid,
        joint_lambda=lam,
        dyn_lambda=new_dl,
        dyn_vid=new_dv,
    )
    diag = StepDiagnostics(
        slider_lin_pos=slider_lin_pos,
        slider_applied_impulse=slider_imp,
        p2p_applied_impulse=p2p_imp,
        floor_contact=floor_contact,
    )
    return new_state, diag
