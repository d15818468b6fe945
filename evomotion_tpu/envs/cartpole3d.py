"""3D CartPole environment.

Reference: evo_motion_model/src/env/cartpole3d.{h,cpp}. Scene: static base
(10,1,10) at (0,-4,10); cart_x (0.5,0.125,0.5) on an x-axis slider from the
base; cart_z (0.5,0.125,0.5) on a z-axis slider from cart_x (frames rotated
pi/2 about Y, cartpole3d.cpp:88-95); a cylinder pole attached to cart_z by a
point2point constraint only (free to swing in any direction). All collisions
ignored. Motor forces scale with carried mass (slider_force_per_kg *
downstream mass, cartpole3d.cpp:72,100).

Observation (28, cartpole3d.cpp:189-218) replicated verbatim — including the
reference's quirks, which are part of the behavioral contract:
- vertical_ang / plan_ang divide by the SUM of vector norms (not product),
- several "velocity" features are per-step deltas of derived angles,
- ang uses acos of normalized dot (correct product form).
Reward (cartpole3d.cpp:225-227): squared shaping, -2 fail / +2 win.
Reset (cartpole3d.cpp:246-323): teleport, random planar impulse (angle
U(0,2pi), magnitude U(0,push)) on cart_z, settle with motors off.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..physics import maths
from ..physics.engine import PhysicsState, init_state, physics_step
from ..physics.model import ModelBuilder
from ..physics.shapes import get_shape
from .base import StepResult, get_value

DT = 1.0 / 60.0


@dataclasses.dataclass(frozen=True)
class CartPole3dParams:
    """Defaults from CartPole3dFactory (env_factory.cpp:60-71)."""

    slider_speed: float = 16.0
    slider_force_per_kg: float = 32.0
    chariot_push_force: float = 2.0
    reset_frame_nb: int = 8
    limit_angle: float = jnp.pi / 2.0
    cart_x_mass: float = 1.0
    cart_z_mass: float = 1.0
    pole_mass: float = 1.0
    max_steps: int = 60 * 60


class CartPole3dState(NamedTuple):
    physics: PhysicsState
    key: jnp.ndarray
    reset_idx: jnp.ndarray  # int32: resets consumed (mt19937 parity cursor)
    step_idx: jnp.ndarray
    lasts: jnp.ndarray  # [10]: vel_x, vel_z, ang, ang_vel, ang_vel_vec(3),
    # vert_ang, vert_ang_vel, plan_ang  (+ plan_ang_vec stored separately)
    last_plan_ang_vec: jnp.ndarray
    settle_left: jnp.ndarray


def _quat_axis(q):
    """btQuaternion::getAxis: xyz / sqrt(1 - w^2), or (1,0,0) near identity."""
    s_sq = 1.0 - q[..., 3] * q[..., 3]
    small = s_sq < 10.0 * 1.192092896e-07
    s = jnp.sqrt(jnp.maximum(s_sq, 1e-30))
    axis = q[..., :3] / s[..., None]
    return jnp.where(small[..., None], jnp.array([1.0, 0.0, 0.0]), axis)


class CartPole3d:
    observation_size = 28
    action_size = 2

    def __init__(self, params: CartPole3dParams = CartPole3dParams(), mt_seed: int | None = None):
        self.params = params
        # strict reset parity: the reference's per-env std::mt19937 draws
        # (cartpole3d.cpp:22,308-309). None -> jax.random (batched tier).
        self._mt_table = None
        if mt_seed is not None:
            from ..utils.mt19937 import reset_draw_table

            self._mt_table = jnp.asarray(reset_draw_table(mt_seed, 2))
        base_scale = jnp.array([10.0, 1.0, 10.0])
        base_pos = jnp.array([0.0, -4.0, 10.0])
        cart_x_scale = (0.5, 0.125, 0.5)
        cart_z_scale = (0.5, 0.125, 0.5)
        pole_scale = (0.1, 0.5, 0.1)
        cart_x_pos = jnp.array([0.0, -4.0 + 1.0 + 0.125, 10.0])
        cart_z_pos = jnp.array([0.0, float(cart_x_pos[1]) + 0.125 + 0.125, 10.0])
        pole_pos = jnp.array(
            [0.0, float(cart_z_pos[1]) + 0.125 + 0.5 - 0.5 / 4.0, 10.0]
        )
        self.base_scale = base_scale
        self.cart_x_pos, self.cart_z_pos, self.pole_pos = cart_x_pos, cart_z_pos, pole_pos

        b = ModelBuilder()
        cube = get_shape("cube").hull_verts
        cyl = get_shape("cylinder").hull_verts
        ident = (0.0, 0.0, 0.0, 1.0)
        self.base = b.add_body("base", cube, tuple(base_scale.tolist()), 0.0, base_pos, ident)
        self.cart_x = b.add_body("cart_x", cube, cart_x_scale, params.cart_x_mass, cart_x_pos, ident)
        self.cart_z = b.add_body("cart_z", cube, cart_z_scale, params.cart_z_mass, cart_z_pos, ident)
        self.pole = b.add_body("pole", cyl, pole_scale, params.pole_mass, pole_pos, ident)
        for i in (self.cart_x, self.cart_z, self.pole):
            b.set_ignore_collision(self.base, i)
        b.set_ignore_collision(self.cart_x, self.cart_z)
        b.set_ignore_collision(self.cart_x, self.pole)
        b.set_ignore_collision(self.cart_z, self.pole)

        # x slider: identity frames (axis = +x)
        b.add_slider(
            self.base, self.cart_x, (0, 1.0, 0), ident, (0, -0.125, 0), ident,
            lin_lo=-100.0, lin_hi=100.0,
            max_motor_force=params.slider_force_per_kg
            * (params.cart_x_mass + params.cart_z_mass + params.pole_mass),
            motor_index=0,
        )
        # z slider: frames rotated pi/2 about Y (slide axis -> -z)
        qy = tuple(
            float(v) for v in maths.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.pi / 2)
        )
        b.add_slider(
            self.cart_x, self.cart_z, (0, 0.125, 0), qy, (0, -0.125, 0), qy,
            lin_lo=-100.0, lin_hi=100.0,
            max_motor_force=params.slider_force_per_kg
            * (params.cart_z_mass + params.pole_mass),
            motor_index=1,
        )
        b.add_p2p(self.cart_z, self.pole, (0, 0.125, 0), (0, -0.5 + 0.5 / 4.0, 0))
        import dataclasses

        from ..physics.engine import default_solver

        self.model = dataclasses.replace(b.finalize(), solver=default_solver())

    def _obs(self, physics: PhysicsState, lasts, last_plan_ang_vec):
        (
            last_vel_x, last_vel_z, last_ang, last_ang_vel,
            lav0, lav1, lav2, last_vert_ang, last_vert_ang_vel, last_plan_ang,
        ) = [lasts[i] for i in range(10)]
        last_ang_vel_vec = jnp.stack([lav0, lav1, lav2])

        pos = physics.pos[self.cart_z]
        vel_x = physics.lin_vel[self.cart_z, 0]
        vel_z = physics.lin_vel[self.cart_z, 2]
        center_distance = jnp.sqrt(
            (self.cart_z_pos[0] - pos[0]) ** 2 + (self.cart_z_pos[2] - pos[2]) ** 2
        )
        pos_x = pos[0] - self.cart_z_pos[0]
        pos_z = pos[2] - self.cart_z_pos[2]

        q = physics.quat[self.pole]
        ang_x, ang_y, ang_z = maths.quat_to_euler_zyx(q)  # (yaw, pitch, roll)

        up = jnp.array([0.0, 1.0, 0.0])
        rotated = maths.quat_rotate(q, up)
        ang = jnp.arccos(
            jnp.clip(jnp.dot(up, rotated) / (1.0 * jnp.linalg.norm(rotated)), -1.0, 1.0)
        )
        ang_vel = ang - last_ang

        ang_vel_vec = physics.ang_vel[self.pole]
        ang_acc_vec = ang_vel_vec - last_ang_vel_vec

        axis = _quat_axis(q)
        # reference divides by the SUM of norms here (cartpole3d.cpp:204-216)
        vertical_ang = jnp.arccos(
            jnp.clip(jnp.dot(axis, up) / (jnp.linalg.norm(axis) + 1.0), -1.0, 1.0)
        )
        vertical_ang_vel = vertical_ang - last_vert_ang
        axis_plan = jnp.array([axis[0], 0.0, axis[2]])
        plan_ang = jnp.arccos(
            jnp.clip(axis_plan[0] / (jnp.linalg.norm(axis_plan) + 1.0), -1.0, 1.0)
        )
        plan_ang_vel = plan_ang - last_plan_ang

        obs = jnp.stack(
            [
                center_distance / self.base_scale[0],
                pos_x / self.base_scale[0],
                vel_x,
                vel_x - last_vel_x,
                pos_z / self.base_scale[2],
                vel_z,
                vel_z - last_vel_z,
                ang_x / jnp.pi,
                ang_y / jnp.pi,
                ang_z / jnp.pi,
                ang / (2.0 * jnp.pi) - 1.0,
                ang_vel,
                ang_vel - last_ang_vel,
                ang_vel_vec[0],
                ang_vel_vec[1],
                ang_vel_vec[2],
                ang_acc_vec[0],
                ang_acc_vec[1],
                ang_acc_vec[2],
                axis[0],
                axis[1],
                axis[2],
                plan_ang / jnp.pi,
                plan_ang_vel,
                plan_ang_vel - last_plan_ang_vec,
                vertical_ang / jnp.pi,
                vertical_ang_vel,
                vertical_ang_vel - last_vert_ang_vel,
            ]
        )
        new_lasts = jnp.stack(
            [
                vel_x, vel_z, ang, ang_vel,
                ang_vel_vec[0], ang_vel_vec[1], ang_vel_vec[2],
                vertical_ang, vertical_ang_vel, plan_ang,
            ]
        )
        return obs, center_distance, ang, new_lasts, plan_ang_vel

    def _compute_step(self, state: CartPole3dState):
        p = self.params
        obs, center_distance, ang, new_lasts, plan_ang_vel = self._obs(
            state.physics, state.lasts, state.last_plan_ang_vec
        )
        fail = (center_distance > self.base_scale[0]) | (jnp.abs(ang) > p.limit_angle)
        win = state.step_idx > p.max_steps
        done = fail | win
        reward = ((p.limit_angle - jnp.abs(ang)) / p.limit_angle) ** 2 + (
            (self.base_scale[0] - center_distance) / self.base_scale[0]
        ) ** 2
        reward = jnp.where(fail, -2.0, jnp.where(win, 2.0, reward))
        state = state._replace(
            step_idx=state.step_idx + 1, lasts=new_lasts, last_plan_ang_vec=plan_ang_vel
        )
        return state, StepResult(obs, reward, done, jnp.bool_(True), win)

    def _teleported(self, physics: PhysicsState, key, reset_idx=None):
        pos = physics.pos
        for idx, p in (
            (self.cart_x, self.cart_x_pos),
            (self.cart_z, self.cart_z_pos),
            (self.pole, self.pole_pos),
        ):
            pos = pos.at[idx].set(p)
        ident = jnp.array([0.0, 0.0, 0.0, 1.0])
        quat = physics.quat
        lin = physics.lin_vel
        ang = physics.ang_vel
        for idx in (self.cart_x, self.cart_z, self.pole):
            quat = quat.at[idx].set(ident)
            lin = lin.at[idx].set(0.0)
            ang = ang.at[idx].set(0.0)
        if self._mt_table is not None:
            u = self._mt_table[reset_idx % self._mt_table.shape[0]]
            u1, u2 = u[0], u[1]
        else:
            k1, k2 = jax.random.split(key)
            u1 = jax.random.uniform(k1)
            u2 = jax.random.uniform(k2)
        angle = u1 * 2.0 * jnp.pi
        force = u2 * self.params.chariot_push_force
        imp = jnp.array([jnp.cos(angle) * force, 0.0, jnp.sin(angle) * force])
        lin = lin.at[self.cart_z].add(imp / self.params.cart_z_mass)
        return physics._replace(pos=pos, quat=quat, lin_vel=lin, ang_vel=ang)

    def _phys_step(self, physics, targets, powered):
        return physics_step(
            self.model, physics, targets, jnp.array([powered, powered]), DT
        )

    def reset(self, key):
        key, sub = jax.random.split(key)
        physics = self._teleported(init_state(self.model), sub, jnp.int32(0))
        physics = jax.lax.fori_loop(
            0,
            self.params.reset_frame_nb,
            lambda _, ph: self._phys_step(ph, jnp.zeros((2,)), False)[0],
            physics,
        )
        state = CartPole3dState(
            physics=physics,
            key=key,
            reset_idx=jnp.int32(1),
            step_idx=jnp.int32(0),
            lasts=jnp.zeros((10,)),
            last_plan_ang_vec=jnp.float32(0.0),
            settle_left=jnp.int32(0),
        )
        return self._compute_step(state)

    def step(self, state: CartPole3dState, action):
        p = self.params
        settling = state.settle_left > 0
        targets = jnp.where(settling, jnp.zeros_like(action), action * p.slider_speed)
        physics, _ = self._phys_step(state.physics, targets, jnp.logical_not(settling))
        state = state._replace(physics=physics)

        settle_state = state._replace(settle_left=state.settle_left - 1)
        settle_res = StepResult(
            obs=self._obs(physics, state.lasts, state.last_plan_ang_vec)[0],
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


class CartPole3dFactory:
    name = "cartpole3d"

    def __init__(self, parameters: dict[str, str]):
        self.parameters = parameters

    def make(self, seed: int = 1234, mt_parity: bool = True) -> CartPole3d:
        g = lambda k, d: get_value(self.parameters, k, d)
        return CartPole3d(
            mt_seed=seed if mt_parity else None,
            params=CartPole3dParams(
                slider_speed=g("slider_speed", 16.0),
                slider_force_per_kg=g("slider_force_per_kg", 32.0),
                chariot_push_force=g("chariot_push_force", 2.0),
                reset_frame_nb=g("reset_frame_nb", 8),
                limit_angle=g("limit_angle", float(jnp.pi) / 2.0),
                cart_x_mass=g("cart_x_mass", 1.0),
                cart_z_mass=g("cart_z_mass", 1.0),
                pole_mass=g("pole_mass", 1.0),
                max_steps=g("max_steps", 60 * 60),
            )
        )
