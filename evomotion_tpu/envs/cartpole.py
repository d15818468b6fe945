"""2D CartPole environment.

Reference: evo_motion_model/src/env/cartpole.{h,cpp}. Scene: static base box
(10,2,10) at (0,-4,10); chariot (0.5,0.25,0.5) mass 1 on a powered slider
(force 64, limits +-10, x axis); pendulum (0.1,0.7,0.1) mass 1 on a free
z-axis hinge. All inter-body collisions ignored (cartpole.cpp:85-87) — the
scene is contact-free.

Observation (7, cartpole.cpp:108-111):
  [|x|/10, x/10, vx, vx - last_vx, angle/(2pi) - 1, wz, wz - last_wz]
  with angle = btQuaternion::getAngle of the pendulum (2*acos(w), always >= 0).
Reward (cartpole.cpp:116-117): uprightness + centering, overridden to -2 on
fail / +2 on win. Fail: |x| > 10 or angle outside +-limit_angle; win:
step_idx > max_steps. Reset (cartpole.cpp:127-180): teleport, zero velocities,
unpower the motor, apply a random central impulse U(-push, push) to the
chariot, settle reset_frame_nb frames, re-power.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..physics import maths
from ..physics.engine import PhysicsState, StepDiagnostics, init_state, physics_step
from ..physics.model import ModelBuilder
from ..physics.shapes import get_shape
from .base import StepResult, get_value

DT = 1.0 / 60.0  # DELTA_T_MODEL (src/constants.h.in:9)


@dataclasses.dataclass(frozen=True)
class CartPoleParams:
    """Defaults from CartPoleFactory (env_factory.cpp:49-58). The max-steps
    key is spelled ``mas_steps`` in the reference — preserved in the
    registry."""

    slider_speed: float = 16.0
    slider_force: float = 64.0
    chariot_push_force: float = 2.0
    limit_angle: float = jnp.pi * 0.5
    reset_frame_nb: int = 8
    chariot_mass: float = 1.0
    pendulum_mass: float = 1.0
    max_steps: int = 60 * 60


class CartPoleState(NamedTuple):
    physics: PhysicsState
    key: jnp.ndarray
    reset_idx: jnp.ndarray  # int32: resets consumed (mt19937 parity cursor)
    step_idx: jnp.ndarray  # int32
    last_vel: jnp.ndarray  # f32
    last_ang_vel: jnp.ndarray  # f32
    motor_target: jnp.ndarray  # [1] stale target held through settling
    settle_left: jnp.ndarray  # int32; > 0 while settling (motor off)


class CartPole:
    observation_size = 7
    action_size = 1

    def __init__(self, params: CartPoleParams = CartPoleParams(), mt_seed: int | None = None):
        self.params = params
        # strict reset parity: the reference's per-env std::mt19937 draw
        # (cartpole.cpp:15,171). None -> jax.random (batched tier).
        self._mt_table = None
        if mt_seed is not None:
            from ..utils.mt19937 import reset_draw_table

            self._mt_table = jnp.asarray(reset_draw_table(mt_seed, 1))
        base_height, base_pos = 2.0, -4.0
        pendulum_height, pendulum_width = 0.7, 0.1
        pendulum_offset = pendulum_height / 4.0
        chariot_height, chariot_width = 0.25, 0.5
        self.chariot_pos = base_pos + base_height + chariot_height
        self.pendulum_pos = (
            self.chariot_pos + chariot_height + pendulum_height - pendulum_offset
        )

        b = ModelBuilder()
        cube = get_shape("cube").hull_verts
        ident = (0.0, 0.0, 0.0, 1.0)
        self.base = b.add_body(
            "base", cube, (10, base_height, 10), 0.0, (0, base_pos, 10), ident
        )
        self.chariot = b.add_body(
            "chariot", cube, (chariot_width, chariot_height, chariot_width),
            params.chariot_mass, (0, self.chariot_pos, 10), ident,
        )
        self.pendulum = b.add_body(
            "pendulum", cube, (pendulum_width, pendulum_height, pendulum_width),
            params.pendulum_mass, (0, self.pendulum_pos, 10), ident,
        )
        # cartpole.cpp:85-87: every pair ignores collision
        b.set_ignore_collision(self.base, self.chariot)
        b.set_ignore_collision(self.chariot, self.pendulum)
        b.set_ignore_collision(self.base, self.pendulum)

        self.slider = b.add_slider(
            self.base, self.chariot,
            (0, base_height, 0), ident, (0, -chariot_height, 0), ident,
            lin_lo=-10.0, lin_hi=10.0,
            max_motor_force=params.slider_force, motor_index=0,
        )
        b.add_hinge(
            self.chariot, self.pendulum,
            (0, chariot_height, 0), (0, -pendulum_height + pendulum_offset, 0),
            (0, 0, 1), (0, 0, 1),
        )
        import dataclasses

        from ..physics.engine import default_solver

        self.model = dataclasses.replace(b.finalize(), solver=default_solver())

    # --- internals ---

    def _obs(self, physics: PhysicsState, last_vel, last_ang_vel):
        x = physics.pos[self.chariot, 0]
        base_x = physics.pos[self.base, 0]
        center_distance = jnp.abs(x - base_x)
        vel = physics.lin_vel[self.chariot, 0]
        ang = maths.quat_angle(physics.quat[self.pendulum])
        ang_vel = physics.ang_vel[self.pendulum, 2]
        obs = jnp.stack(
            [
                center_distance / 10.0,
                (x - base_x) / 10.0,
                vel,
                vel - last_vel,
                ang / (2.0 * jnp.pi) - 1.0,
                ang_vel,
                ang_vel - last_ang_vel,
            ]
        )
        return obs, center_distance, vel, ang, ang_vel

    def _phys_step(self, physics, target, powered):
        return physics_step(
            self.model, physics, target, jnp.array([powered]), DT
        )

    def _teleported(self, physics: PhysicsState, key, reset_idx=None):
        """Teleport chariot+pendulum to spawn, zero their velocities, apply
        the random chariot impulse (cartpole.cpp:133-173)."""
        pos = physics.pos
        pos = pos.at[self.chariot].set(jnp.array([0.0, self.chariot_pos, 10.0]))
        pos = pos.at[self.pendulum].set(jnp.array([0.0, self.pendulum_pos, 10.0]))
        quat = physics.quat
        ident = jnp.array([0.0, 0.0, 0.0, 1.0])
        quat = quat.at[self.chariot].set(ident)
        quat = quat.at[self.pendulum].set(ident)
        lin = physics.lin_vel.at[self.chariot].set(0.0).at[self.pendulum].set(0.0)
        ang = physics.ang_vel.at[self.chariot].set(0.0).at[self.pendulum].set(0.0)
        push = self.params.chariot_push_force
        if self._mt_table is not None:
            u = self._mt_table[reset_idx % self._mt_table.shape[0], 0]
        else:
            u = jax.random.uniform(key)
        rand_force = u * push * 2.0 - push
        # applyCentralImpulse: dv = impulse / mass
        lin = lin.at[self.chariot, 0].add(rand_force / self.params.chariot_mass)
        return physics._replace(pos=pos, quat=quat, lin_vel=lin, ang_vel=ang)

    # --- public API ---

    def reset(self, key) -> tuple[CartPoleState, StepResult]:
        """Blocking reset: teleport + settle reset_frame_nb frames (motor off),
        then compute the first observation (Environment::reset ->
        reset_engine + compute_step)."""
        key, sub = jax.random.split(key)
        physics = self._teleported(init_state(self.model), sub, jnp.int32(0))

        def settle(_, phys):
            return self._phys_step(phys, jnp.zeros((1,)), False)[0]

        physics = jax.lax.fori_loop(0, self.params.reset_frame_nb, settle, physics)
        state = CartPoleState(
            physics=physics,
            key=key,
            reset_idx=jnp.int32(1),
            step_idx=jnp.int32(0),
            last_vel=jnp.float32(0.0),
            last_ang_vel=jnp.float32(0.0),
            motor_target=jnp.zeros((1,)),
            settle_left=jnp.int32(0),
        )
        return self._compute_step(state)

    def _compute_step(self, state: CartPoleState) -> tuple[CartPoleState, StepResult]:
        """compute_step (cartpole.cpp:101-124), including its counter/flag
        update order: done checked before step_idx increments."""
        p = self.params
        obs, center_distance, vel, ang, ang_vel = self._obs(
            state.physics, state.last_vel, state.last_ang_vel
        )
        x = state.physics.pos[self.chariot, 0]
        fail = (x > 10.0) | (x < -10.0) | (ang > p.limit_angle) | (ang < -p.limit_angle)
        win = state.step_idx > p.max_steps
        done = fail | win
        reward = (p.limit_angle - jnp.abs(ang)) / p.limit_angle + (10.0 - center_distance) / 10.0
        reward = jnp.where(fail, -2.0, jnp.where(win, 2.0, reward))
        state = state._replace(
            step_idx=state.step_idx + 1, last_vel=vel, last_ang_vel=ang_vel
        )
        return state, StepResult(obs, reward, done, jnp.bool_(True), win)

    def step(self, state: CartPoleState, action) -> tuple[CartPoleState, StepResult]:
        """One env step with built-in non-blocking auto-reset (see base.py)."""
        p = self.params
        settling = state.settle_left > 0
        target = jnp.where(settling, jnp.zeros_like(action), action * p.slider_speed)
        physics, _ = self._phys_step(state.physics, target, jnp.logical_not(settling))
        state = state._replace(physics=physics)

        # settling branch: count down; invalid transition
        settle_state = state._replace(settle_left=state.settle_left - 1)
        settle_res = StepResult(
            obs=self._obs(physics, state.last_vel, state.last_ang_vel)[0],
            reward=jnp.float32(0.0),
            done=jnp.bool_(False),
            valid=jnp.bool_(False),
            win=jnp.bool_(False),
        )
        # the step after settling completes emits the episode's first obs
        finishing = settling & (state.settle_left <= 1)
        fin_state, fin_res = self._compute_step(settle_state)
        fin_res = fin_res._replace(
            done=jnp.bool_(False), valid=jnp.bool_(True), win=jnp.bool_(False)
        )

        # running branch
        run_state, run_res = self._compute_step(state)
        # on done: teleport + enter settling (the reference then blocks in
        # reset_engine; here the next reset_frame_nb batch steps settle)
        key, sub = jax.random.split(run_state.key)
        reset_phys = self._teleported(run_state.physics, sub, run_state.reset_idx)
        done_state = run_state._replace(
            physics=reset_phys,
            key=key,
            reset_idx=run_state.reset_idx + 1,
            step_idx=jnp.int32(0),
            settle_left=jnp.int32(p.reset_frame_nb),
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


class CartPoleFactory:
    """Registry factory (env_factory.cpp:49-58)."""

    name = "cartpole"

    def __init__(self, parameters: dict[str, str]):
        self.parameters = parameters

    def make(self, seed: int = 1234, mt_parity: bool = True) -> CartPole:
        g = lambda k, d: get_value(self.parameters, k, d)
        return CartPole(
            mt_seed=seed if mt_parity else None,
            params=CartPoleParams(
                slider_speed=g("slider_speed", 16.0),
                slider_force=g("slider_force", 64.0),
                chariot_push_force=g("chariot_push_force", 2.0),
                limit_angle=g("limit_angle", float(jnp.pi * 0.5)),
                reset_frame_nb=g("reset_frame_nb", 8),
                chariot_mass=g("chariot_mass", 1.0),
                pendulum_mass=g("pendulum_mass", 1.0),
                # reference key is the typo'd "mas_steps" (env_factory.cpp:56)
                max_steps=g("mas_steps", 60 * 60),
            )
        )
