"""Pallas fused-sweep solver vs the XLA colored-phase solver.

Runs the kernel in interpreter mode on CPU (slow — tiny scene, few steps).
On real TPU hardware the same kernel compiles via Mosaic (exercised by
bench.py with solver=pallas).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evomotion_tpu.physics.engine import init_state, physics_step
from evomotion_tpu.physics.model import ModelBuilder
from evomotion_tpu.physics.shapes import get_shape

DT = 1.0 / 60.0


def _build():
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    b.add_body("floor", cube, (100, 1, 100), 0.0, (0, -1, 0), (0, 0, 0, 1))
    box = b.add_body("box", cube, (0.5, 0.5, 0.5), 1.0, (0, 1.0, 0), (0, 0, 0, 1))
    arm = b.add_body("arm", cube, (0.3, 0.1, 0.1), 0.5, (0.8, 1.0, 0), (0, 0, 0, 1))
    b.set_ignore_collision(box, arm)
    b.add_hinge(box, arm, (0.5, 0, 0), (-0.3, 0, 0), (0, 0, 1), (0, 0, 1), -0.5, 0.5)
    base = b.add_body("base", cube, (0.1, 0.1, 0.1), 0.0, (3, 0.5, 0), (0, 0, 0, 1))
    cart = b.add_body("cart", cube, (0.2, 0.2, 0.2), 1.0, (3, 0.5, 0), (0, 0, 0, 1))
    b.set_ignore_collision(base, cart)
    b.add_slider(
        base, cart, (0, 0, 0), (0, 0, 0, 1), (0, 0, 0), (0, 0, 0, 1),
        lin_lo=-2.0, lin_hi=2.0, max_motor_force=32.0, motor_index=0,
    )
    return b.finalize()


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["pallas", "xla"])
def test_member_contacts_separate_bodies(solver):
    """Member-member (dyn-dyn) SAT contacts keep overlapping boxes apart on
    BOTH backends (stacked-box case: the upper box comes to rest on the
    lower one instead of falling through)."""
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    b.add_body("floor", cube, (100, 1, 100), 0.0, (0, -1, 0), (0, 0, 0, 1))
    b.add_body("box1", cube, (0.3, 0.3, 0.3), 1.0, (0.0, 0.5, 0), (0, 0, 0, 1))
    b.add_body("box2", cube, (0.3, 0.3, 0.3), 1.0, (0.25, 1.1, 0), (0, 0, 0, 1))
    model = dataclasses.replace(b.finalize(), solver=solver)
    assert len(model.dyn_pair_body) == 1

    def run(m, n=90):
        s = init_state(m)

        def body(s, _):
            s, _d = physics_step(m, s, jnp.zeros((0,)), jnp.ones((0,), bool), DT)
            return s, None

        return jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(s)[0]

    s_on = run(model)
    s_off = run(dataclasses.replace(model, member_contacts=False))
    d_on = float(jnp.linalg.norm(s_on.pos[2] - s_on.pos[1]))
    d_off = float(jnp.linalg.norm(s_off.pos[2] - s_off.pos[1]))
    # with contacts the boxes push apart; without, they interpenetrate
    assert d_on > 0.58  # ~ box extents + margins
    assert d_off < 0.4
    assert not np.isnan(np.asarray(s_on.pos)).any()


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["pallas", "xla"])
def test_leg_cross_contacts(solver):
    """Two elongated boxes crossing like an X: the SAT narrowphase stops the
    upper one from sinking through the lower on both backends."""
    b = ModelBuilder()
    cube = get_shape("cube").hull_verts
    b.add_body("floor", cube, (100, 1, 100), 0.0, (0, -1, 0), (0, 0, 0, 1))
    # lower leg along x, upper leg along z, overlapping at the middle
    b.add_body("leg1", cube, (0.6, 0.08, 0.08), 5.0, (0.0, 0.4, 0), (0, 0, 0, 1))
    b.add_body("leg2", cube, (0.08, 0.08, 0.6), 1.0, (0.0, 0.62, 0), (0, 0, 0, 1))
    model = dataclasses.replace(b.finalize(), solver=solver)

    def run(m, n=120):
        s = init_state(m)

        def body(s, _):
            s, _d = physics_step(m, s, jnp.zeros((0,)), jnp.ones((0,), bool), DT)
            return s, None

        return jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(s)[0]

    s_on = run(model)
    s_off = run(dataclasses.replace(model, member_contacts=False))
    # with contacts leg2 rests on top of leg1 (y ~ leg1 top + its half height)
    y_on = float(s_on.pos[2, 1])
    y_off = float(s_off.pos[2, 1])
    assert y_on > float(s_on.pos[1, 1]) + 0.10, (y_on, float(s_on.pos[1, 1]))
    assert y_off < y_on - 0.08  # without contacts it sinks into leg1
    assert not np.isnan(np.asarray(s_on.pos)).any()


@pytest.mark.slow
def test_pallas_matches_xla_interpret():
    model_x = _build()
    model_p = dataclasses.replace(model_x, solver="pallas")

    def run(model, n=8):
        s = init_state(model)

        def body(s, _):
            s, d = physics_step(
                model, s, jnp.array([1.5]), jnp.ones((1,), bool), DT
            )
            return s, d

        return jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(s)

    sx, dx = run(model_x)
    sp, dp = run(model_p)
    # both solvers approach the same fixed point; exact row ordering differs
    # (pallas = strict Bullet sequential; XLA = colored phases)
    np.testing.assert_allclose(np.asarray(sx.pos), np.asarray(sp.pos), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sx.lin_vel), np.asarray(sp.lin_vel), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(dx.slider_lin_pos), np.asarray(dp.slider_lin_pos), atol=2e-3
    )
    assert not np.isnan(np.asarray(sp.pos)).any()
