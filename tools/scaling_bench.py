"""Scaling-efficiency harness: env-steps/s of the sharded train step at
1/2/4/8 devices (BASELINE.md scaling row: >=80% efficiency at N>=2).

Weak scaling: the per-device env batch is fixed, so ideal throughput grows
linearly with device count; efficiency(N) = rate(N) / (N * rate(1)).

Without real multi-chip hardware this runs on virtual CPU devices
(xla_force_host_platform_device_count) — that validates the sharding
(params replicated, env batch split, XLA-inserted gradient psum) and gives
an upper bound on the collective/overhead cost, not ICI bandwidth. On a real
multi-chip slice run with --platform tpu to measure the real thing.

Usage:
    python tools/scaling_bench.py                 # 1/2/4/8 virtual CPU devs
    python tools/scaling_bench.py --devices 1 4   # subset
    python tools/scaling_bench.py --env robot_walk --per-dev 128
Writes SCALING.json at the repo root and prints one JSON line per N.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(args) -> None:
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    sys.path.insert(0, REPO)
    from evomotion_tpu.envs.registry import get_environment_factory
    from evomotion_tpu.parallel.mesh import make_env_mesh, make_sharded_train_step
    from evomotion_tpu.train.ppo_batched import BatchedPpo, PpoConfig

    devs = jax.devices()
    n_dev = len(devs)
    n_envs = args.per_dev * n_dev
    env = get_environment_factory(args.env, {}).make(seed=1234)
    cfg = PpoConfig(n_envs=n_envs, horizon=args.horizon)
    trainer = BatchedPpo(env, cfg, seed=1234)
    mesh = make_env_mesh(devs)
    step, state = make_sharded_train_step(trainer, mesh)

    state, _ = step(state)  # compile + warmup
    jax.block_until_ready(state.obs)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state)
    jax.block_until_ready(state.obs)
    dt = (time.perf_counter() - t0) / args.iters
    rate = n_envs * args.horizon / dt
    print(json.dumps({
        "devices": n_dev, "n_envs": n_envs, "env_steps_per_s": round(rate, 1),
        "iter_ms": round(dt * 1e3, 2),
    }))


def parent(args) -> None:
    results = []
    for n in args.devices:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        cmd = [
            sys.executable, os.path.abspath(__file__), "--child",
            "--env", args.env, "--per-dev", str(args.per_dev),
            "--horizon", str(args.horizon), "--iters", str(args.iters),
            "--platform", args.platform,
        ]
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, cwd=REPO
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"N={n} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec))

    if results:
        base = results[0]["env_steps_per_s"] / results[0]["devices"]
        for r in results:
            r["efficiency_vs_1dev"] = round(
                r["env_steps_per_s"] / (r["devices"] * base), 3
            )
        artifact = {
            "env": args.env, "per_dev_envs": args.per_dev,
            "horizon": args.horizon, "platform": args.platform,
            "weak_scaling": results,
        }
        if args.platform == "cpu":
            artifact["note"] = (
                "virtual CPU devices oversubscribing one host — validates "
                "sharding correctness only; efficiency numbers are NOT an "
                "ICI scaling measurement and are not comparable to the "
                ">=80% TPU target (BASELINE.md scaling row)"
            )
        path = os.path.join(REPO, "SCALING.json")
        with open(path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps({"artifact": path, "results": results}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--child", action="store_true")
    p.add_argument("--env", default="cartpole")
    p.add_argument("--per-dev", type=int, default=256)
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    a = p.parse_args()
    child(a) if a.child else parent(a)
