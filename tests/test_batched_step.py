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
    return dataclasses.replace(b.finalize(), solver="pallas", row_dtype="f32")


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
    return dataclasses.replace(
        b.finalize(), solver="pallas", member_contacts=True, row_dtype="f32"
    )


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


def _dyn_only_model():
    """Two overlapping DYNAMIC boxes, no static body at all: zero floor
    manifold pairs but one dyn-dyn pair (ADVICE r4: member warm-start
    impulses must still be injected, identically on both backends)."""
    b = ModelBuilder()
    ident = (0.0, 0.0, 0.0, 1.0)
    b.add_body("boxa", _cube(), (0.4, 0.3, 0.4), 1.0, (0, 0.0, 0), ident, friction=0.6)
    b.add_body(
        "boxb", _cube(), (0.3, 0.3, 0.3), 2.0, (0.1, 0.25, 0.05),
        (0.0, 0.19866933, 0.0, 0.98006658), friction=0.4,
    )
    return dataclasses.replace(
        b.finalize(), solver="pallas", member_contacts=True, row_dtype="f32"
    )


def test_dyn_pairs_without_floor_pairs_match_and_warm_start():
    model = _dyn_only_model()
    assert len(model.dyn_pair_body) == 1
    from evomotion_tpu.physics.engine import n_manifold_pairs

    assert n_manifold_pairs(model) == 0
    _compare(model, n_steps=3, batch=3)
    # member warm start must reach the velocities: a populated dyn_lambda
    # cache changes the step vs a cleared cache (both backends). Give boxb
    # an approach velocity — in shared free fall the velocity-pass impulse
    # is legitimately zero
    s0 = init_state(model)
    s0 = s0._replace(lin_vel=s0.lin_vel.at[1, 1].set(-2.0))
    tgt = jnp.zeros((model.n_slider,))
    en = jnp.ones((model.n_slider,), bool)
    step1 = jax.jit(lambda s: _physics_step_impl(model, s, tgt, en, DT))
    s1, _ = step1(s0)
    assert float(jnp.abs(s1.dyn_lambda).sum()) > 0.0  # boxes do collide
    # seed the cache with feature ids the next step will re-detect so the
    # warm match is total and the injected impulses are macroscopic
    probe, _ = step1(s1)
    seeded = s1._replace(
        dyn_lambda=jnp.full_like(s1.dyn_lambda, 0.5), dyn_vid=probe.dyn_vid
    )
    s2, _ = step1(seeded)
    s2_cleared, _ = step1(
        seeded._replace(dyn_lambda=jnp.zeros_like(s1.dyn_lambda))
    )
    # warm-start CONSISTENCY: seeding lam0 only accelerates convergence, so
    # the converged answer must match the cold start. If the seed entered
    # lam0 but its impulse were NOT injected into the velocities (the
    # ADVICE r4 bug on this n_pair==0 configuration), the answer would be
    # off by the un-applied impulse (~dv * 0.425 here — macroscopic).
    np.testing.assert_allclose(
        np.asarray(s2.lin_vel), np.asarray(s2_cleared.lin_vel), atol=1e-4
    )
    # batched backend: same consistency, and it matches per-env
    stepv = jax.jit(jax.vmap(lambda s: physics_step(model, s, tgt, en, DT)))
    sb = jax.tree.map(lambda x: x[None], seeded)
    v2, _ = stepv(sb)
    v2c, _ = stepv(
        sb._replace(dyn_lambda=jnp.zeros_like(sb.dyn_lambda))
    )
    np.testing.assert_allclose(
        np.asarray(v2.lin_vel), np.asarray(v2c.lin_vel), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v2.lin_vel[0]), np.asarray(s2.lin_vel), atol=2e-4
    )


@pytest.mark.slow
def test_row_order_variants_agree():
    """canonical / scheduled / shuffled:<seed> all run, stay finite, and
    agree to solver-iteration tolerance (three full step compiles — slow)."""
    base = _contact_model()
    outs = {}
    for order in ("canonical", "scheduled", "shuffled:7"):
        model = dataclasses.replace(base, row_order=order)
        states = _perturbed_states(model, 2)
        tgt = jnp.zeros((2, model.n_slider))
        en = jnp.ones((2, model.n_slider), bool)
        step_v = jax.jit(jax.vmap(lambda s, t, e: physics_step(model, s, t, e, DT)))
        s = states
        for _ in range(2):
            s, _d = step_v(s, tgt, en)
        outs[order] = np.asarray(s.lin_vel)
        assert np.isfinite(outs[order]).all(), order
    # different visit orders converge to nearby (not identical) solutions
    np.testing.assert_allclose(outs["canonical"], outs["scheduled"], atol=5e-2)
    np.testing.assert_allclose(outs["canonical"], outs["shuffled:7"], atol=5e-2)


def test_shuffled_order_parent_constraint():
    """The shuffled row order always visits a friction row after its parent
    normal (the live mu*lam[parent] clamp), on the real row set."""
    from evomotion_tpu.physics.engine import (
        _n_dyn_contacts,
        _shuffled_order,
        _solver_meta,
        n_manifold_pairs,
    )

    base = _contact_model()
    m = dataclasses.replace(base, row_order="canonical")
    idx6_a, idx6_b, parent, mu, kind_arr, skip_b, perm, groups = _solver_meta(
        m, "full", n_manifold_pairs(m), _n_dyn_contacts(m)
    )
    for seed in (0, 1, 2):
        p = _shuffled_order(len(idx6_a), parent, seed)
        pos = np.empty_like(p)
        pos[p] = np.arange(len(p))
        child = parent >= 0
        assert (pos[np.nonzero(child)[0]] > pos[parent[child]]).all()
    # different seeds give different orders
    assert not np.array_equal(
        _shuffled_order(len(idx6_a), parent, 0),
        _shuffled_order(len(idx6_a), parent, 1),
    )


@pytest.mark.slow
def test_bf16_full_path_close_to_f32():
    """row_dtype="bf16" (the throughput default) quantizes only the J
    columns; the step must stay within a bounded deviation of the exact f32
    solve and produce finite state.

    Caveat measured here: on CPU the pallas kernel runs in interpret mode,
    so the f32->bf16->f32 convert pair sits adjacent inside one XLA module
    and the excess-precision simplifier elides it — the CPU path computes
    in f32 regardless. The structural check below pins that the bf16
    converts ARE emitted (on real TPU the kernel boundary is opaque, so the
    rounding engages); the TPU-side deviation bound lives in
    tools/check_batched_tpu.py and the kernel-level rounding sensitivity in
    test_solver_pallas-style direct kernel calls with materialized bf16
    arrays."""
    base = _contact_model()  # row_dtype="f32"
    m16 = dataclasses.replace(base, row_dtype="bf16")
    states = _perturbed_states(base, 2)
    tgt = jnp.zeros((2, base.n_slider))
    en = jnp.ones((2, base.n_slider), bool)
    outs = {}
    for m in (base, m16):
        step_v = jax.jit(jax.vmap(lambda s, t, e: physics_step(m, s, t, e, DT)))
        s = states
        for _ in range(3):
            s, _d = step_v(s, tgt, en)
        outs[m.row_dtype] = s
    for name in ("pos", "lin_vel", "ang_vel"):
        a = np.asarray(getattr(outs["bf16"], name))
        b = np.asarray(getattr(outs["f32"], name))
        assert np.isfinite(a).all(), name
        np.testing.assert_allclose(a, b, atol=3e-2, err_msg=name)


def test_bf16_rows_structural_and_kernel_level():
    """Default-gate half of the bf16 coverage: the bf16 row stream is
    emitted exactly when row_dtype="bf16" (trace-level, no compile), and
    materialized bf16 J rows genuinely change the kernel's solve within a
    bound (one small kernel, cheap compile)."""
    base = _contact_model()  # row_dtype="f32"
    m16 = dataclasses.replace(base, row_dtype="bf16")
    states = _perturbed_states(base, 2)
    tgt = jnp.zeros((2, base.n_slider))
    en = jnp.ones((2, base.n_slider), bool)
    jx16 = str(jax.make_jaxpr(
        jax.vmap(lambda s, t, e: physics_step(m16, s, t, e, DT))
    )(states, tgt, en))
    jx32 = str(jax.make_jaxpr(
        jax.vmap(lambda s, t, e: physics_step(base, s, t, e, DT))
    )(states, tgt, en))
    assert "bf16" in jx16 and "bf16" not in jx32

    # kernel-level: materialized bf16 J rows genuinely change the solve
    from evomotion_tpu.physics import solver_pallas as sp

    nr, nb = 32, 2
    rng = np.random.RandomState(0)
    rows_j = jnp.asarray((rng.randn(nr, sp.ROW_J, sp.TILE) * 0.3).astype(np.float32))
    rows_s = jnp.asarray(
        np.stack(
            [rng.randn(nr, sp.TILE), -np.ones((nr, sp.TILE)) * 10,
             np.ones((nr, sp.TILE)) * 10, np.zeros((nr, sp.TILE))], 1
        ).astype(np.float32)
    )
    vel = jnp.asarray(rng.randn(nb * 6, sp.TILE).astype(np.float32))
    lam = jnp.zeros((nr, sp.TILE))
    iinv9 = jnp.broadcast_to(
        jnp.eye(3).reshape(9)[None, :, None], (nb, 9, sp.TILE)
    ).reshape(nb * 9, sp.TILE).astype(jnp.float32)
    ia = np.zeros(nr, np.int32)
    ib = np.full(nr, 6, np.int32)
    parent = np.full(nr, -1, np.int32)
    mu = np.zeros(nr, np.float32)
    kw = dict(
        kind=np.zeros(nr, np.int32), skip_b=np.zeros(nr, bool), interpret=True
    )
    inv_mass = np.ones(nb)
    o32 = sp.solver_sweep_envlast_slim(
        rows_j, rows_s, vel, lam, iinv9, inv_mass, ia, ib, parent, mu, 3, nr, **kw
    )
    o16 = sp.solver_sweep_envlast_slim(
        rows_j.astype(jnp.bfloat16), rows_s, vel, lam, iinv9, inv_mass,
        ia, ib, parent, mu, 3, nr, **kw
    )
    d = float(jnp.max(jnp.abs(o32[0] - o16[0])))
    assert 0.0 < d < 0.3  # rounding engages, bounded


def _cluster_model(**over):
    """Six dynamic boxes over a floor: a tight 3-box cluster (touching) plus
    three isolated far boxes => 15 dyn pairs of which only the cluster's 3
    can ever be active. Exercises member_topm's per-env selection."""
    b = ModelBuilder()
    ident = (0.0, 0.0, 0.0, 1.0)
    b.add_body("floor", _cube(), (30, 1, 30), 0.0, (0, -1, 0), ident, friction=0.5)
    tilt = (0.0, 0.19866933, 0.0, 0.98006658)
    b.add_body("c0", _cube(), (0.4, 0.3, 0.4), 1.0, (0, 0.0, 0), ident, friction=0.6)
    b.add_body("c1", _cube(), (0.3, 0.3, 0.3), 2.0, (0.1, 0.25, 0.05), tilt, friction=0.4)
    b.add_body("c2", _cube(), (0.35, 0.2, 0.3), 1.5, (-0.15, 0.45, -0.1), ident, friction=0.5)
    b.add_body("f0", _cube(), (0.3, 0.3, 0.3), 1.0, (5, 0.0, 5), ident)
    b.add_body("f1", _cube(), (0.3, 0.3, 0.3), 1.0, (-5, 0.0, 5), tilt)
    b.add_body("f2", _cube(), (0.3, 0.3, 0.3), 1.0, (5, 0.0, -5), ident)
    return dataclasses.replace(
        b.finalize(), solver="pallas", member_contacts=True, row_dtype="f32",
        **over,
    )


def test_member_topm_matches_dense():
    """Top-M broadphase cull (model.member_topm) must not change physics:
    unselected pairs produce the same zero rows the dense path gives
    beyond-margin pairs. Trajectory-level equality, warm-start caches
    included (dyn_vid is allowed to differ on inactive slots: the dense
    path stores real feature ids for far pairs, the culled path -1; both
    carry lambda=0 there so the warm start is identical)."""
    dense = _cluster_model()
    culled = _cluster_model(member_topm=6)
    assert len(dense.dyn_pair_body) == 15

    states = _perturbed_states(dense, 3)
    tgt = jnp.zeros((3, 0))
    en = jnp.ones((3, 0), bool)
    step_d = jax.jit(jax.vmap(lambda s, t, e: physics_step(dense, s, t, e, DT)))
    step_c = jax.jit(jax.vmap(lambda s, t, e: physics_step(culled, s, t, e, DT)))

    sd = sc = states
    saw_member_contact = False
    for _ in range(5):
        sd, _ = step_d(sd, tgt, en)
        sc, _ = step_c(sc, tgt, en)
        for name in ("pos", "quat", "lin_vel", "ang_vel", "dyn_lambda"):
            np.testing.assert_allclose(
                np.asarray(getattr(sd, name)), np.asarray(getattr(sc, name)),
                atol=1e-5, err_msg=name,
            )
        saw_member_contact |= bool(np.abs(np.asarray(sd.dyn_lambda)).sum() > 0)
    assert saw_member_contact  # the cluster really collides


def test_resident_rows_bit_equal_to_streaming(monkeypatch):
    """VMEM-resident row mode (EVOMOTION_RESIDENT_ROWS=1: rows DMA'd once,
    all solver iterations read VMEM) must be BIT-identical to the streaming
    schedule — same row arithmetic in the same order, only the DMA pattern
    differs. Mirrors Bullet's solver whose constraint rows live in cache for
    all iterations (btSequentialImpulseConstraintSolver)."""
    model = _contact_model()
    states = _perturbed_states(model, 3)
    tgt = jnp.zeros((3, 0))
    en = jnp.ones((3, 0), bool)

    def run(flag):
        monkeypatch.setenv("EVOMOTION_RESIDENT_ROWS", flag)
        # fresh trace per flag: the env var is read at trace time
        step = jax.jit(jax.vmap(lambda s, t, e: physics_step(model, s, t, e, DT)))
        s = states
        for _ in range(3):
            s, _ = step(s, tgt, en)
        return s

    s_res = run("1")
    s_str = run("0")
    for name in ("pos", "quat", "lin_vel", "ang_vel", "contact_lambda"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_res, name)), np.asarray(getattr(s_str, name)),
            err_msg=name,
        )
