"""Env-last batched step (physics/batched.py) vs the per-env path.

`vmap(physics_step)` on a pallas-solver model routes through the custom_vmap
rule into the env-last implementation; these tests pin it numerically to the
per-env path (same formulas, same kernel, different layout). Small models
keep interpret-mode compiles fast on CPU; the full spider equivalence runs
on real TPU via tools/check_batched_tpu.py and the bench.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evomotion_tpu.physics.engine import (
    PhysicsState,
    _physics_step_impl,
    init_state,
    physics_step,
)
from evomotion_tpu.physics.model import ModelBuilder

DT = 1.0 / 60.0


def _cube():
    h = 0.5
    return np.array(
        [[sx * h, sy * h, sz * h] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )


def _cartpole_like_model():
    """Slider + hinge chain, no contacts (all pairs ignored)."""
    b = ModelBuilder()
    ident = (0.0, 0.0, 0.0, 1.0)
    base = b.add_body("base", _cube(), (10, 2, 10), 0.0, (0, -4, 10), ident)
    cart = b.add_body("cart", _cube(), (0.5, 0.25, 0.5), 1.0, (0, -1.75, 10), ident)
    pole = b.add_body("pole", _cube(), (0.1, 0.7, 0.1), 1.0, (0, -0.975, 10), ident)
    b.set_ignore_collision(base, cart)
    b.set_ignore_collision(cart, pole)
    b.set_ignore_collision(base, pole)
    b.add_slider(
        base, cart, (0, 2, 0), ident, (0, -0.25, 0), ident,
        lin_lo=-10.0, lin_hi=10.0, max_motor_force=64.0, motor_index=0,
    )
    b.add_hinge(cart, pole, (0, 0.25, 0), (0, -0.525, 0), (0, 0, 1), (0, 0, 1))
    return dataclasses.replace(b.finalize(), solver="pallas")


def _contact_model():
    """Two boxes over a static floor: floor contacts + a dyn-dyn pair."""
    b = ModelBuilder()
    ident = (0.0, 0.0, 0.0, 1.0)
    b.add_body("floor", _cube(), (20, 1, 20), 0.0, (0, -1, 0), ident, friction=0.5)
    b.add_body("boxa", _cube(), (0.4, 0.2, 0.6), 1.0, (0, 0.0, 0), ident, friction=0.6)
    b.add_body(
        "boxb", _cube(), (0.5, 0.2, 0.3), 2.0, (0.2, 0.55, 0.1),
        (0.0, 0.19866933, 0.0, 0.98006658), friction=0.4,
    )
    return dataclasses.replace(b.finalize(), solver="pallas", member_contacts=True)


def _perturbed_states(model, n, scale=0.02):
    s0 = init_state(model)
    ks = jax.random.split(jax.random.PRNGKey(3), n)

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return s0._replace(
            pos=s0.pos + jax.random.normal(k1, s0.pos.shape) * scale,
            lin_vel=jax.random.normal(k2, s0.lin_vel.shape) * 0.2,
            ang_vel=jax.random.normal(k3, s0.ang_vel.shape) * 0.2,
        )

    return jax.vmap(one)(ks)


def _compare(model, n_steps=3, batch=3, atol=2e-4):
    states = _perturbed_states(model, batch)
    ns = model.n_slider
    tgt = (
        jax.random.normal(jax.random.PRNGKey(11), (batch, ns)) * 0.5
        if ns
        else jnp.zeros((batch, 0))
    )
    en = jnp.ones((batch, ns), bool)

    step_v = jax.jit(jax.vmap(lambda s, t, e: physics_step(model, s, t, e, DT)))
    step_1 = jax.jit(lambda s, t, e: _physics_step_impl(model, s, t, e, DT))

    sv = states
    s1 = [jax.tree.map(lambda x: x[i], states) for i in range(batch)]
    for _ in range(n_steps):
        sv, dv = step_v(sv, tgt, en)
        outs = [step_1(s1[i], tgt[i], en[i]) for i in range(batch)]
        s1 = [o[0] for o in outs]
        d1 = jax.tree.map(lambda *xs: jnp.stack(xs), *[o[1] for o in outs])
        ref = jax.tree.map(lambda *xs: jnp.stack(xs), *s1)
        for name in ("pos", "quat", "lin_vel", "ang_vel", "contact_lambda"):
            a = np.asarray(getattr(sv, name))
            b = np.asarray(getattr(ref, name))
            np.testing.assert_allclose(a, b, atol=atol, err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(sv.contact_vid), np.asarray(ref.contact_vid)
        )
        for name in ("slider_lin_pos", "slider_applied_impulse", "floor_contact"):
            np.testing.assert_allclose(
                np.asarray(getattr(dv, name)), np.asarray(getattr(d1, name)),
                atol=5e-3, err_msg=name,
            )


def test_joint_only_model_matches_per_env():
    _compare(_cartpole_like_model())


def test_contact_model_matches_per_env():
    _compare(_contact_model())


def test_strict_mode_matches_per_env():
    """strict_bullet (uncapped limit bias, joint warm start, slip friction)
    routes through the same env-last fast path."""
    _compare(dataclasses.replace(_contact_model(), strict_bullet=True))
    _compare(dataclasses.replace(_cartpole_like_model(), strict_bullet=True))


def test_strict_mode_joint_warm_start_carries():
    """Across steps the strict path seeds joint rows from the cached
    impulses — second-step lam0 != 0 changes the solve vs a cleared cache."""
    model = dataclasses.replace(_cartpole_like_model(), strict_bullet=True)
    s = init_state(model)
    ns = model.n_slider
    tgt = jnp.full((ns,), 0.8)
    en = jnp.ones((ns,), bool)
    step = jax.jit(lambda s: _physics_step_impl(model, s, tgt, en, DT))
    s1, _ = step(s)
    assert float(jnp.abs(s1.joint_lambda).sum()) > 0.0
    s2, _ = step(s1)
    # clearing the cache before the second step must change the result
    s2_cleared, _ = step(s1._replace(joint_lambda=jnp.zeros_like(s1.joint_lambda)))
    assert not np.allclose(np.asarray(s2.lin_vel), np.asarray(s2_cleared.lin_vel))


def test_padding_independence():
    """Batch sizes that don't divide the kernel tile pad with replicated
    lanes; results for the real envs must not depend on the pad."""
    model = _cartpole_like_model()
    states = _perturbed_states(model, 5)
    tgt = jnp.zeros((5, model.n_slider))
    en = jnp.ones((5, model.n_slider), bool)
    step_v = jax.jit(jax.vmap(lambda s, t, e: physics_step(model, s, t, e, DT)))
    out5, _ = step_v(states, tgt, en)
    sub = jax.tree.map(lambda x: x[:2], states)
    out2, _ = step_v(sub, tgt[:2], en[:2])
    np.testing.assert_allclose(
        np.asarray(out5.pos[:2]), np.asarray(out2.pos), atol=1e-6
    )
