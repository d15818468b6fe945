"""TPU-side equivalence + throughput check for the env-last batched step.

Run on a real TPU chip (compiles are Mosaic-native there):
  python tools/check_batched_tpu.py [n_envs]

1. spider: vmapped physics_step (env-last batched path) vs per-env path on a
   handful of perturbed states — must match to float tolerance;
2. pallas-vs-xla backend trajectory agreement over a short horizon;
3. throughput of the batched env step at n_envs.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.envs.robot import RobotWalk
from evomotion_tpu.physics.engine import _physics_step_impl, init_state, physics_step

DT = 1.0 / 60.0


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    env = RobotWalk()
    # exact-equivalence section pins f32 J rows: the batched slim kernel's
    # bf16 default (model.row_dtype) quantizes its J stream while the
    # per-env fat kernel keeps f32 — its deviation is measured separately
    # in section 1b below
    m = dataclasses.replace(env.model, solver="pallas", row_dtype="f32")
    B = 4

    s0 = init_state(m)
    ks = jax.random.split(jax.random.PRNGKey(0), B)

    def perturb(k, s):
        k1, k2, k3 = jax.random.split(k, 3)
        return s._replace(
            pos=s.pos + jax.random.normal(k1, s.pos.shape) * 0.01,
            lin_vel=jax.random.normal(k2, s.lin_vel.shape) * 0.1,
            ang_vel=jax.random.normal(k3, s.ang_vel.shape) * 0.1,
        )

    states = jax.vmap(perturb, in_axes=(0, None))(ks, s0)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (B, m.n_slider)) * 0.3
    en = jnp.ones((B, m.n_slider), bool)

    step_v = jax.jit(jax.vmap(lambda s, t, e: physics_step(m, s, t, e, DT)))
    out_v, diag_v = step_v(states, tgt, en)

    step1 = jax.jit(lambda s, t, e: _physics_step_impl(m, s, t, e, DT))
    outs, diags = [], []
    for i in range(B):
        s1 = jax.tree.map(lambda x: x[i], states)
        o, d = step1(s1, tgt[i], en[i])
        outs.append(o)
        diags.append(d)
    ref = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    refd = jax.tree.map(lambda *xs: jnp.stack(xs), *diags)

    worst = 0.0
    for name in ("pos", "quat", "lin_vel", "ang_vel", "contact_lambda"):
        err = float(
            jnp.abs(getattr(out_v, name) - getattr(ref, name)).max()
        )
        worst = max(worst, err)
        print(f"  {name:16s} maxerr {err:.3e}")
        assert err < 5e-4, name
    assert bool((out_v.contact_vid == ref.contact_vid).all())
    for name in ("slider_lin_pos", "slider_applied_impulse",
                 "p2p_applied_impulse", "floor_contact"):
        err = float(jnp.abs(getattr(diag_v, name) - getattr(refd, name)).max())
        print(f"  {name:24s} maxerr {err:.3e}")
        assert err < 5e-3, name
    print(f"1) batched == per-env on spider (worst state err {worst:.2e})")

    # 1b. bf16 J rows (the shipped throughput configuration) vs exact f32:
    # quantization only engages on real TPU (opaque kernel boundary), so
    # this deviation bound is the TPU-side evidence for the bf16 default
    m_bf = dataclasses.replace(env.model, solver="pallas", row_dtype="bf16")
    step_bf = jax.jit(jax.vmap(lambda s, t, e: physics_step(m_bf, s, t, e, DT)))
    sv_bf, sv_f32 = states, states
    worst_bf = 0.0
    for _ in range(10):
        sv_bf, _ = step_bf(sv_bf, tgt, en)
        sv_f32, _ = step_v(sv_f32, tgt, en)
    for name in ("pos", "lin_vel", "ang_vel"):
        err = float(jnp.abs(getattr(sv_bf, name) - getattr(sv_f32, name)).max())
        worst_bf = max(worst_bf, err)
        print(f"  bf16 {name:16s} maxerr(10 steps) {err:.3e}")
    assert np.isfinite(worst_bf) and worst_bf < 0.2, worst_bf
    print(f"1b) bf16-vs-f32 J rows: worst 10-step deviation {worst_bf:.2e}")

    # 2. pallas vs xla backends: settle trajectory from the canonical init.
    # The two backends run different (both valid) Gauss-Seidel orderings —
    # xla solves colored phases, pallas the strict Bullet sequence — so
    # per-step solutions differ at ~1e-3 and contact-rich drops amplify it;
    # assert close agreement over a short horizon and report the curve.
    m_x = dataclasses.replace(env.model, solver="xla")

    def roll(model, s):
        def body(s, _):
            s, _ = physics_step(model, s, jnp.zeros((model.n_slider,)),
                                jnp.zeros((model.n_slider,), bool), DT)
            return s, s.pos
        return jax.lax.scan(body, s, None, length=30)[1]

    # member contacts only exist on the pallas path; compare with them off
    m_p_nc = dataclasses.replace(m, member_contacts=False)
    s_init = init_state(m)
    traj_p = jax.jit(jax.vmap(lambda s: roll(m_p_nc, s)))(
        jax.tree.map(lambda x: x[None], s_init)
    )
    traj_x = jax.jit(jax.vmap(lambda s: roll(m_x, s)))(
        jax.tree.map(lambda x: x[None], s_init)
    )
    err_t = jnp.abs(traj_p - traj_x).max(axis=(0, 2, 3))
    print("2) pallas-vs-xla settle |pos| divergence by step:")
    for t in (0, 4, 9, 19, 29):
        print(f"   step {t + 1:2d}: {float(err_t[t]):.3e}")
    # trajectories separate with the Gauss-Seidel ordering (contact-rich
    # drops amplify ~1e-2/step); the behavioral assertion is that both
    # backends settle the spider to the same resting pose
    def settle(model, s):
        def body(s, _):
            s, _ = physics_step(model, s, jnp.zeros((model.n_slider,)),
                                jnp.zeros((model.n_slider,), bool), DT)
            return s, None
        return jax.lax.scan(body, s, None, length=120)[0]

    rest_p = jax.jit(lambda s: settle(m_p_nc, s))(s_init)
    rest_x = jax.jit(lambda s: settle(m_x, s))(s_init)
    dpos = float(jnp.abs(rest_p.pos - rest_x.pos).max())
    root = env.meta.root_body
    droot = float(jnp.abs(rest_p.pos[root] - rest_x.pos[root]).max())
    vmax = max(
        float(jnp.abs(rest_p.lin_vel).max()), float(jnp.abs(rest_x.lin_vel).max())
    )
    print(f"   resting pose: |droot| {droot:.3e}, worst member |dpos| {dpos:.3e}, max |v| {vmax:.3e}")
    # GS row ordering is part of the solver's defined behavior; pallas keeps
    # Bullet's strict sequence (the parity backend), xla relaxes it within
    # color phases. Limbs may relax into different configurations — assert
    # only per-step sanity and that the body lands in the same place.
    assert droot < 0.15, "backends settle the root differently"
    assert vmax < 1.5, "spider did not settle"
    assert float(err_t[0]) < 2e-2, "single-step backend divergence too large"

    # 3. throughput (batched env step, random actions)
    env.model = m
    reset = jax.jit(jax.vmap(env.reset))
    step = jax.vmap(env.step)

    @jax.jit
    def rollout(state, keys):
        def body(state, key):
            a = jax.random.uniform(key, (n_envs, env.action_size), minval=-1, maxval=1)
            state, res = step(state, a)
            return state, res.reward.sum()
        return jax.lax.scan(body, state, keys)

    st, _ = reset(jax.random.split(jax.random.PRNGKey(0), n_envs))
    keys = jax.random.split(jax.random.PRNGKey(1), 120)
    s2, _ = rollout(st, keys)
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    s3, _ = rollout(s2, keys)
    jax.block_until_ready(s3)
    dt_w = time.perf_counter() - t0
    print(f"3) throughput: {n_envs * 120 / dt_w:,.0f} env-steps/s at {n_envs} envs")


if __name__ == "__main__":
    main()
