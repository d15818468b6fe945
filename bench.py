#!/usr/bin/env python3
"""Throughput benchmark: batched robot_walk env-steps/s on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 100,000 env-steps/s/chip on batched
robot_walk under jit.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

_HBM_GBPS = 819.0  # v5e HBM peak


def _roofline_seconds(model, n_envs: int) -> float:
    """Bandwidth floor for one batched physics step on this model.

    This workload is HBM-bandwidth-bound, not MXU-bound (no matmuls in the
    physics step). The floor is the solver's row traffic: the fused sweep
    streams the packed row array from HBM once per solver iteration
    (solver_pallas row layout; bf16 J columns + f32 scalars when split),
    plus one write when the builder materializes it, plus narrowphase/obs
    side traffic folded in as a flat 20% overhead."""
    from evomotion_tpu.physics import engine as E
    from evomotion_tpu.physics.batched import _round_rows
    from evomotion_tpu.physics import solver_pallas as sp

    n_pair = E.n_manifold_pairs(model)
    n_dyn = E._n_dyn_contacts(model)
    n_full = model.n_rows + n_pair * 4 + n_dyn + n_pair * 8 + n_dyn * 2
    nr_pad = _round_rows(n_full, 8)
    bf16 = (
        getattr(model, "row_dtype", "f32") == "bf16" and not model.strict_bullet
    )
    j_dtype = jnp.bfloat16 if bf16 else jnp.float32
    row_bytes = nr_pad * sp.row_bytes(j_dtype) * n_envs
    # VMEM-resident rows (solver_pallas.resident_rows_enabled): rows are
    # written once by the builder and read ONCE into VMEM; streaming mode
    # re-reads them every solver iteration
    n_stream = (
        2 if sp.resident_rows_enabled(nr_pad, j_dtype, model.n_bodies * 6)
        else model.n_iterations + 1
    )
    bytes_per_step = row_bytes * n_stream * 1.2  # +20% rest
    return bytes_per_step / (_HBM_GBPS * 1e9)


def main():
    args = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    n_envs = int(args[0]) if len(args) > 0 else 2048
    n_steps = int(args[1]) if len(args) > 1 else 120
    solver = args[2] if len(args) > 2 else "pallas"

    import dataclasses

    from evomotion_tpu.envs.robot import RobotWalk

    env = RobotWalk()
    if jax.default_backend() != "tpu":
        solver = "xla"  # the fused kernel targets real TPUs
    # --strict: throughput of the strict-Bullet parity configuration
    # (engine.py divergence list) — the standing perf line next to the
    # committed strict trajectory artifact (tests/goldens/strict_walk.npz)
    env.model = dataclasses.replace(env.model, solver=solver,
                                    strict_bullet=strict)
    reset = jax.vmap(env.reset)
    step = jax.vmap(env.step)

    @jax.jit
    def rollout(state, keys):
        def body(carry, key):
            state = carry
            action = jax.random.uniform(
                key, (n_envs, env.action_size), minval=-1.0, maxval=1.0
            )
            state, res = step(state, action)
            return state, res.reward.sum()

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    state, _ = jax.jit(reset)(keys)
    jax.block_until_ready(state)

    roll_keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
    # compile + warmup
    s2, r = rollout(state, roll_keys)
    jax.block_until_ready(s2)

    # physical lower bound on a step on this hardware: the solver kernel
    # must stream its row array from HBM once per iteration. A measurement
    # faster than that is garbage (observed once: 498M env-steps/s printed
    # with exit 0 while another process held the TPU — VERDICT r4 weak #6);
    # refuse to emit it instead of poisoning BENCH/PERF records.
    floor_s = 0.0
    if jax.default_backend() == "tpu":
        floor_s = _roofline_seconds(env.model, n_envs)

    dt = None
    for attempt in range(3):
        t0 = time.perf_counter()
        s3, r = rollout(s2, roll_keys)
        jax.block_until_ready(s3)
        cand = time.perf_counter() - t0
        if cand / n_steps >= floor_s:
            dt = cand
            break
        print(
            f"bench: impossible timing ({cand / n_steps * 1e3:.3f} ms/step < "
            f"roofline {floor_s * 1e3:.3f} ms) — device contention? retrying",
            file=sys.stderr,
        )
        s2 = s3
        time.sleep(2.0)
    if dt is None:
        print(
            "bench: refusing to report — three consecutive timings were below "
            "the hardware bandwidth floor (is another process on the TPU?)",
            file=sys.stderr,
        )
        sys.exit(1)

    steps_per_s = n_envs * n_steps / dt

    # --- speed-of-light accounting (VERDICT r2 #9) ---------------------
    # This workload is HBM-bandwidth-bound, not MXU-bound (no matmuls in
    # the physics step; the nets are absent from this rollout). The floor
    # on step time is the solver's row traffic: the fused sweep streams the
    # packed row array [NR_pad, 16, B] f32 from HBM once per solver
    # iteration (solver_pallas.ROW_SLIM), plus one write when the builder
    # materializes it, plus the narrowphase/obs side traffic which the
    # model folds in as a flat 20% overhead. percent_of_roofline says how
    # close the measured step is to that bandwidth floor on this chip.
    roofline = None
    if jax.default_backend() == "tpu":
        roofline_s = _roofline_seconds(env.model, n_envs)
        bytes_per_step = roofline_s * _HBM_GBPS * 1e9
        step_s = dt / n_steps
        roofline = {
            "bytes_per_step_model_mb": round(bytes_per_step / 1e6, 1),
            "roofline_ms": round(roofline_s * 1e3, 3),
            "measured_ms": round(step_s * 1e3, 3),
            "percent_of_roofline": round(100.0 * roofline_s / step_s, 1),
        }

    out = {
        "metric": "robot_walk_env_steps_per_s" + ("_strict" if strict else ""),
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(steps_per_s / 100_000.0, 3),
    }
    if roofline:
        out.update(roofline)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
