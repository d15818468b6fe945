"""Robot locomotion environments: robot_walk and robot_jump.

Reference: evo_motion_model/src/env/robot_walk.{h,cpp} and robot_jump.{h,cpp}
over the spider skeleton (resources/skeleton/new_format_spider.json: 17
members, 12 hinges + 4 fixed, 12 muscles -> obs 371, act 12).

Observation layout (skeleton.cpp:140-160 get_states):
  RootMemberState(root) ++ MemberState(non-root members, JSON order)
  ++ MuscleState(muscles, JSON order)
Per-item proprioception (proprioception_state.cpp:23-58): yaw/pitch/roll / pi,
lin vel, ang vel / pi, "acceleration" = last_vel - current_vel (note the
reference's reversed sign — replicated), floor-touched flag. The touch flag is
populated once by a contactPairTest in the state constructor and never updated
(proprioception_state.cpp:17-18) — replicated as a compile-time constant
consumed by the very first observation only. Member extra: world offset from
root; root extra: [log(|p|+1), p.y, atan2(p.z, p.x)]. Muscle state
(proprioception_state.cpp:124-129): slider linear pos, slider applied impulse,
both p2p applied impulses.

robot_walk (robot_walk.cpp:56-104): reward = root v_z; a time bank of
remaining_steps decrements while v < minimal_velocity and increments while
v >= target_velocity; fail at <= 0, win at max_episode_seconds. Reset:
random yaw/roll/pitch in +-(2pi/3)/2 applied around spawn (1, 0.25, 2), then
TWO settle loops of reset_frames with the step counters reset in between
(the duplicated loop at robot_walk.cpp:98,103 is intentional behavior).

robot_jump (robot_jump.cpp:67-104): reward = max(v_y, 0) + v_z; fail at
remaining < 0 (strictly), tilt +-(pi/3)/2, ONE settle loop.

Muscle actuation: MuscleController::on_input -> contract(action[i]) sets the
slider motor target to action * max_speed (muscle_controller.cpp:10-12,
muscle.cpp:82-85). Motors are unpowered until the first contract() and keep
their last target through resets (release() is never called).
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import maths
from ..physics.engine import (
    PhysicsState,
    StepDiagnostics,
    init_state,
    physics_step,
)
from ..serialize import robot as robot_json
from ..physics.robot_compiler import RobotMeta, compile_robot
from .base import StepResult, get_value

DT = 1.0 / 60.0

DEFAULT_SKELETON = os.path.join(
    os.path.dirname(__file__), "..", "resources", "skeleton", "spider.json"
)


class RobotEnvState(NamedTuple):
    physics: PhysicsState
    key: jnp.ndarray
    reset_idx: jnp.ndarray  # int32: resets consumed (mt19937 parity cursor)
    curr_step: jnp.ndarray  # int32
    remaining_steps: jnp.ndarray  # int32
    # proprioception deltas persist across resets (states are built once in
    # the reference env ctor and reset_engine never clears them)
    last_lin_vel: jnp.ndarray  # [n_members, 3]
    last_ang_vel: jnp.ndarray  # [n_members, 3]
    touch_taken: jnp.ndarray  # bool: ctor touch flag consumed?
    motor_target: jnp.ndarray  # [M] stale muscle targets (held through settle)
    motors_on: jnp.ndarray  # bool
    settle_left: jnp.ndarray  # int32
    diag_slider_pos: jnp.ndarray  # [M]
    diag_slider_imp: jnp.ndarray  # [M]
    diag_p2p_imp: jnp.ndarray  # [2M] (a, b interleaved by muscle)


class _RobotEnvBase:
    """Shared machinery; subclasses define reward/termination/reset params."""

    def __init__(self, skeleton_json_path: str, reset_frames: int, mt_seed: int | None = None):
        from ..physics.engine import default_solver

        self.spec = robot_json.load(skeleton_json_path)
        self.model, self.meta = compile_robot(self.spec)
        self.model = dataclasses.replace(self.model, solver=default_solver())
        self.observation_size = self.meta.obs_dim
        self.action_size = self.meta.action_dim
        self.reset_frames = reset_frames
        # strict reset parity: per-env std::mt19937 draws (robot_walk.cpp:21,
        # 82-84). None -> jax.random (the batched-training tier; a shared
        # mt table would teleport every vmapped env identically).
        self._mt_table = None
        if mt_seed is not None:
            from ..utils.mt19937 import reset_draw_table

            self._mt_table = jnp.asarray(reset_draw_table(mt_seed, 3))
        self._members = jnp.asarray(np.array(self.meta.member_bodies, np.int32))
        self._non_root = jnp.asarray(np.array(self.meta.non_root_bodies, np.int32))
        self._speed = jnp.asarray(self.meta.muscle_speed)
        # skeleton bodies = everything except the floor
        self._skeleton_bodies = jnp.asarray(
            np.array([i for i in range(self.model.n_bodies) if i != self.meta.floor_body], np.int32)
        )

    # --- settle steps per reset (walk: two loops; jump: one) ---
    @property
    def settle_total(self) -> int:
        raise NotImplementedError

    def _phys_step(self, physics, targets, powered):
        return physics_step(
            self.model, physics, targets, jnp.broadcast_to(powered, (self.model.n_slider,)), DT
        )

    def _obs(self, state: RobotEnvState):
        """Build the 371-dim observation; returns (obs, new_lasts...)."""
        phys = state.physics
        mem = self._members
        pos = phys.pos[mem]
        quat = phys.quat[mem]
        lin = phys.lin_vel[mem]
        ang = phys.ang_vel[mem]

        yaw, pitch, roll = maths.quat_to_euler_zyx(quat)
        pi = jnp.pi
        lin_acc = state.last_lin_vel - lin  # reference's reversed delta
        ang_acc = (state.last_ang_vel - ang) / pi
        touch = jnp.where(
            state.touch_taken,
            jnp.zeros((len(self.meta.member_bodies),)),
            jnp.asarray(self.meta.initial_floor_touch)[mem],
        )
        base16 = jnp.concatenate(
            [
                jnp.stack([yaw / pi, pitch / pi, roll / pi], -1),
                lin,
                ang / pi,
                lin_acc,
                ang_acc,
                touch[:, None],
            ],
            axis=-1,
        )  # [n_members, 16]

        root_i = self.meta.root_body
        root_pos = phys.pos[root_i]
        # root extra: log-radial distance, height, azimuth
        root_extra = jnp.stack(
            [
                jnp.log(jnp.linalg.norm(root_pos) + 1.0),
                root_pos[1],
                jnp.arctan2(root_pos[2], root_pos[0]),
            ]
        )
        # member extra: world offset from root
        member_order = list(self.meta.member_bodies)
        root_slot = member_order.index(root_i)
        non_root_slots = jnp.asarray(
            np.array([i for i in range(len(member_order)) if i != root_slot], np.int32)
        )
        offsets = phys.pos[self._non_root] - root_pos

        root_state = jnp.concatenate([base16[root_slot], root_extra])
        member_states = jnp.concatenate([base16[non_root_slots], offsets], axis=-1)
        muscle_states = jnp.stack(
            [
                state.diag_slider_pos,
                state.diag_slider_imp,
                state.diag_p2p_imp[0::2],
                state.diag_p2p_imp[1::2],
            ],
            axis=-1,
        )  # [M, 4]

        obs = jnp.concatenate(
            [root_state, member_states.reshape(-1), muscle_states.reshape(-1)]
        )
        return obs, lin, ang

    def _root_vel(self, physics: PhysicsState):
        return physics.lin_vel[self.meta.root_body]

    # subclass hooks -----------------------------------------------------
    def _reward_velocity(self, physics) -> jnp.ndarray:
        raise NotImplementedError

    def _fail(self, remaining) -> jnp.ndarray:
        raise NotImplementedError

    @property
    def max_steps(self) -> int:
        raise NotImplementedError

    @property
    def initial_remaining(self) -> int:
        raise NotImplementedError

    @property
    def tilt_limit(self) -> float:
        raise NotImplementedError

    # --------------------------------------------------------------------

    def _compute_step(self, state: RobotEnvState):
        obs, lin, ang = self._obs(state)
        v = self._reward_velocity(state.physics)
        reward = v
        vel = self._bank_velocity(state.physics)
        remaining = state.remaining_steps
        remaining = jnp.where(
            vel < self.minimal_velocity,
            remaining - 1,
            jnp.where(vel >= self.target_velocity, remaining + 1, remaining),
        )
        # non-finite guard (no reference counterpart — Bullet would assert):
        # a policy-driven contact explosion can overflow the solver; NaN
        # compares False everywhere, so without this the time bank never
        # drains, the episode never ends, and one NaN env poisons every
        # batched consumer (observed: CrossQ run walk_r4, it ~1925). Treat
        # it as a fail termination with sanitized outputs; auto-reset
        # teleports the env back to a clean state.
        finite = jnp.isfinite(obs).all() & jnp.isfinite(reward)
        obs = jnp.where(finite, obs, jnp.zeros_like(obs))
        reward = jnp.where(finite, reward, jnp.float32(0.0))
        lin = jnp.where(finite, lin, jnp.zeros_like(lin))
        ang = jnp.where(finite, ang, jnp.zeros_like(ang))
        win = (state.curr_step >= self.max_steps) & finite
        fail = self._fail(remaining) | ~finite
        done = win | fail
        state = state._replace(
            curr_step=state.curr_step + 1,
            remaining_steps=remaining,
            last_lin_vel=lin,
            last_ang_vel=ang,
            touch_taken=jnp.bool_(True),
        )
        return state, StepResult(obs, reward, done, jnp.bool_(True), win)

    def _bank_velocity(self, physics):
        return self._reward_velocity(physics)

    def _teleported(self, physics: PhysicsState, key, reset_idx=None) -> PhysicsState:
        """Random tilt around spawn; bodies to M * first_transform with zero
        velocities (robot_walk.cpp:76-96; item.cpp RigidBodyItem::reset)."""
        limit = self.tilt_limit
        if self._mt_table is not None:
            # reference draw order: yaw, roll, pitch (robot_walk.cpp:82-84)
            u = self._mt_table[reset_idx % self._mt_table.shape[0]]
            u1, u2, u3 = u[0], u[1], u[2]
        else:
            k1, k2, k3 = jax.random.split(key, 3)
            u1 = jax.random.uniform(k1)
            u2 = jax.random.uniform(k2)
            u3 = jax.random.uniform(k3)
        yaw = u1 * limit - limit / 2.0
        rollv = u2 * limit - limit / 2.0
        pitch = u3 * limit - limit / 2.0
        # glm::eulerAngleYXZ(yaw, pitch, roll) = RY(yaw) RX(pitch) RZ(roll)
        qy = maths.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
        qx = maths.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), pitch)
        qz = maths.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), rollv)
        q = maths.quat_mul(qy, maths.quat_mul(qx, qz))
        t = jnp.array([1.0, 0.25, 2.0])

        first_pos = jnp.asarray(self.model.init_pos)
        first_quat = jnp.asarray(self.model.init_quat)
        sk = self._skeleton_bodies
        new_pos = t + maths.quat_rotate(q[None], first_pos[sk])
        new_quat = maths.quat_normalize(maths.quat_mul(q[None], first_quat[sk]))

        pos = physics.pos.at[sk].set(new_pos)
        quat = physics.quat.at[sk].set(new_quat)
        lin = physics.lin_vel.at[sk].set(0.0)
        ang = physics.ang_vel.at[sk].set(0.0)
        # the reference reset removes and re-adds bodies AND constraints
        # (robot_walk.cpp:89-97), so all warm-start caches clear
        return physics._replace(
            pos=pos, quat=quat, lin_vel=lin, ang_vel=ang,
            contact_lambda=jnp.zeros_like(physics.contact_lambda),
            contact_vid=jnp.full_like(physics.contact_vid, -1),
            joint_lambda=jnp.zeros_like(physics.joint_lambda),
            dyn_lambda=jnp.zeros_like(physics.dyn_lambda),
            dyn_vid=jnp.full_like(physics.dyn_vid, -1),
        )

    def reset(self, key) -> tuple[RobotEnvState, StepResult]:
        """Blocking reset (Environment::reset): teleport, settle, first obs."""
        key, sub = jax.random.split(key)
        physics = self._teleported(init_state(self.model), sub, jnp.int32(0))
        m = self.model.n_slider

        def settle(_, ph):
            # motors unpowered before the first contract()
            return self._phys_step(ph, jnp.zeros((m,)), jnp.bool_(False))[0]

        physics = jax.lax.fori_loop(0, self.settle_total, settle, physics)
        nm = len(self.meta.member_bodies)
        state = RobotEnvState(
            physics=physics,
            key=key,
            reset_idx=jnp.int32(1),
            curr_step=jnp.int32(0),
            remaining_steps=jnp.int32(self.initial_remaining),
            last_lin_vel=jnp.zeros((nm, 3)),
            last_ang_vel=jnp.zeros((nm, 3)),
            touch_taken=jnp.bool_(False),
            motor_target=jnp.zeros((m,)),
            motors_on=jnp.bool_(False),
            settle_left=jnp.int32(0),
            diag_slider_pos=jnp.zeros((m,)),
            diag_slider_imp=jnp.zeros((m,)),
            diag_p2p_imp=jnp.zeros((2 * m,)),
        )
        return self._compute_step(state)

    def _store_diag(self, state: RobotEnvState, diag: StepDiagnostics) -> RobotEnvState:
        ms = jnp.asarray(np.array(self.meta.muscle_sliders, np.int32))
        pa = jnp.asarray(np.array(self.meta.muscle_p2p_a, np.int32))
        pb = jnp.asarray(np.array(self.meta.muscle_p2p_b, np.int32))
        p2p = jnp.stack([diag.p2p_applied_impulse[pa], diag.p2p_applied_impulse[pb]], -1)
        return state._replace(
            diag_slider_pos=diag.slider_lin_pos[ms],
            diag_slider_imp=diag.slider_applied_impulse[ms],
            diag_p2p_imp=p2p.reshape(-1),
        )

    def step(self, state: RobotEnvState, action):
        settling = state.settle_left > 0
        # guard: a NaN action would propagate into the persistent motor
        # target (held through resets) and re-poison every future episode
        action = jnp.where(jnp.isfinite(action), action, jnp.zeros_like(action))
        target = jnp.where(settling, state.motor_target, action * self._speed)
        powered = jnp.where(settling, state.motors_on, jnp.bool_(True))
        physics, diag = self._phys_step(state.physics, target, powered)
        state = self._store_diag(
            state._replace(
                physics=physics,
                motor_target=target,
                motors_on=powered,
            ),
            diag,
        )

        settle_state = state._replace(settle_left=state.settle_left - 1)
        settle_res = StepResult(
            obs=self._obs(state)[0],
            reward=jnp.float32(0.0),
            done=jnp.bool_(False),
            valid=jnp.bool_(False),
            win=jnp.bool_(False),
        )
        finishing = settling & (state.settle_left <= 1)
        fin_state, fin_res = self._compute_step(settle_state)
        fin_res = fin_res._replace(
            done=jnp.bool_(False), valid=jnp.bool_(True), win=jnp.bool_(False)
        )

        run_state, run_res = self._compute_step(state)
        key, sub = jax.random.split(run_state.key)
        done_state = run_state._replace(
            physics=self._teleported(run_state.physics, sub, run_state.reset_idx),
            key=key,
            reset_idx=run_state.reset_idx + 1,
            curr_step=jnp.int32(0),
            remaining_steps=jnp.int32(self.initial_remaining),
            settle_left=jnp.int32(self.settle_total),
        )
        run_state = jax.tree.map(
            lambda d, r: jnp.where(run_res.done, d, r), done_state, run_state
        )

        out_state = jax.tree.map(
            lambda s, f, r: jnp.where(settling, jnp.where(finishing, f, s), r),
            settle_state, fin_state, run_state,
        )
        out_res = jax.tree.map(
            lambda s, f, r: jnp.where(settling, jnp.where(finishing, f, s), r),
            settle_res, fin_res, run_res,
        )
        return out_state, out_res


@dataclasses.dataclass(frozen=True)
class RobotWalkParams:
    """Defaults from RobotWalkFactory (env_factory.cpp:74-83)."""

    skeleton_json_path: str = DEFAULT_SKELETON
    initial_remaining_seconds: float = 1.0
    max_episode_seconds: float = 30.0
    target_velocity: float = 0.5
    minimal_velocity: float = 0.1
    reset_frames: int = 30


class RobotWalk(_RobotEnvBase):
    def __init__(self, params: RobotWalkParams = RobotWalkParams(), mt_seed: int | None = None):
        super().__init__(params.skeleton_json_path, params.reset_frames, mt_seed)
        self.params = params
        self.minimal_velocity = params.minimal_velocity
        self.target_velocity = params.target_velocity

    @property
    def settle_total(self) -> int:
        # reset_engine settles reset_frames twice (robot_walk.cpp:98,103)
        return 2 * self.reset_frames

    @property
    def max_steps(self) -> int:
        return int(self.params.max_episode_seconds / DT)

    @property
    def initial_remaining(self) -> int:
        return int(self.params.initial_remaining_seconds / DT)

    @property
    def tilt_limit(self) -> float:
        return float(jnp.pi) * 2.0 / 3.0

    def _reward_velocity(self, physics):
        return self._root_vel(physics)[2]

    def _fail(self, remaining):
        return remaining <= 0

    def _compute_step(self, state):
        state, res = super()._compute_step(state)
        # win check uses pre-increment curr_step vs max (>=), already handled
        return state, res


@dataclasses.dataclass(frozen=True)
class RobotJumpParams:
    """Defaults from RobotJumpFactory (env_factory.cpp:91-100)."""

    skeleton_json_path: str = DEFAULT_SKELETON
    minimal_velocity: float = 0.1
    target_velocity: float = 0.5
    max_seconds: float = 30.0
    initial_seconds: float = 1.0
    reset_seconds: float = 1.0 / 6.0


class RobotJump(_RobotEnvBase):
    def __init__(self, params: RobotJumpParams = RobotJumpParams(), mt_seed: int | None = None):
        super().__init__(params.skeleton_json_path, int(params.reset_seconds / DT), mt_seed)
        self.params = params
        self.minimal_velocity = params.minimal_velocity
        self.target_velocity = params.target_velocity

    @property
    def settle_total(self) -> int:
        return self.reset_frames  # single settle loop (robot_jump.cpp:101)

    @property
    def max_steps(self) -> int:
        return int(self.params.max_seconds / DT)

    @property
    def initial_remaining(self) -> int:
        return int(self.params.initial_seconds / DT)

    @property
    def tilt_limit(self) -> float:
        return float(jnp.pi) / 3.0

    def _reward_velocity(self, physics):
        v = self._root_vel(physics)
        return jnp.maximum(v[1], 0.0) + v[2]

    def _fail(self, remaining):
        return remaining < 0  # strictly (robot_jump.cpp:79)


class RobotWalkFactory:
    name = "robot_walk"

    def __init__(self, parameters: dict[str, str]):
        self.parameters = parameters

    def make(self, seed: int = 1234, mt_parity: bool = True) -> RobotWalk:
        """mt_parity: seed a std::mt19937-exact reset stream (the reference's
        per-env rng). Batched (vmapped) training passes False — a shared
        stream would tilt every env identically."""
        g = lambda k, d: get_value(self.parameters, k, d)
        return RobotWalk(
            mt_seed=seed if mt_parity else None,
            params=RobotWalkParams(
                skeleton_json_path=g("skeleton_json_path", DEFAULT_SKELETON),
                initial_remaining_seconds=g("initial_remaining_seconds", 1.0),
                max_episode_seconds=g("max_episode_seconds", 30.0),
                target_velocity=g("target_velocity", 0.5),
                minimal_velocity=g("minimal_velocity", 0.1),
                reset_frames=g("reset_frames", 30),
            )
        )


class RobotJumpFactory:
    name = "robot_jump"

    def __init__(self, parameters: dict[str, str]):
        self.parameters = parameters

    def make(self, seed: int = 1234, mt_parity: bool = True) -> RobotJump:
        g = lambda k, d: get_value(self.parameters, k, d)
        return RobotJump(
            mt_seed=seed if mt_parity else None,
            params=RobotJumpParams(
                skeleton_json_path=g("skeleton_json_path", DEFAULT_SKELETON),
                minimal_velocity=g("minimal_velocity", 0.1),
                target_velocity=g("target_velocity", 0.5),
                max_seconds=g("max_seconds", 30.0),
                initial_seconds=g("initial_seconds", 1.0),
                reset_seconds=g("reset_seconds", 1.0 / 6.0),
            )
        )
