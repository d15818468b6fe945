"""Command-line interface.

Mirrors the reference CLI surface (src/main.cpp:25-152):

    evomotion_tpu cli <env> <agent> [--agent_parameters k=v ...]
        [--env_parameters k=v ...] [--env_seed N] [--env_num_threads N]
        [--cuda] train <out_dir> [-e EPISODES] [-n NB_SAVES]
    evomotion_tpu cli <env> <agent> ... run <save_dir> [-w W] [-h H]
    evomotion_tpu gui

TPU-native notes:
- --cuda / --env_num_threads are accepted for surface parity and ignored:
  device placement is jax's, and Bullet's thread pool is replaced by batching
  (pass --num_envs to train many envs in lockstep with the batched trainer).
- `run` renders headlessly by default: it records body transforms with the
  viewer recorder (--record x.npz --html x.html produces a self-playing HTML
  viewer). `run --live` serves a live 60 FPS view of the rolling policy at
  http://localhost:PORT (the evo_motion_view window + infer.cpp loop
  equivalent: one env step per rendered browser frame, auto-reset on done).
"""

from __future__ import annotations

import argparse
import sys


def _extract_kv_flags(argv: list[str]) -> tuple[dict[str, str], dict[str, str], list[str]]:
    """Pull `--agent_parameters k=v ...` / `--env_parameters k=v ...` groups
    out of argv before argparse sees it: a greedy nargs='*' would otherwise
    swallow the `train`/`run` subcommand. A group ends at the first token
    without '=' (the reference's argparse lib scans the same way)."""
    agent: dict[str, str] = {}
    env: dict[str, str] = {}
    rest: list[str] = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok in ("--agent_parameters", "--env_parameters"):
            target = agent if tok == "--agent_parameters" else env
            i += 1
            while i < len(argv) and "=" in argv[i] and not argv[i].startswith("--"):
                k, v = argv[i].split("=", 1)
                target[k] = v
                i += 1
        else:
            rest.append(tok)
            i += 1
    return agent, env, rest


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("evomotion_tpu")
    sub = parser.add_subparsers(dest="mode", required=True)

    cli = sub.add_parser("cli", help="train or run an agent")
    cli.add_argument("env_name")
    cli.add_argument("agent_name")
    cli.add_argument("--env_seed", type=int, default=1234)
    cli.add_argument("--env_num_threads", type=int, default=8)  # parity; unused
    cli.add_argument("--cuda", action="store_true")  # parity; unused
    cli.add_argument(
        "--num_envs", type=int, default=1,
        help="TPU extension: >1 trains a lockstep env batch (ppo_gae only)",
    )
    cli_sub = cli.add_subparsers(dest="action", required=True)

    train_p = cli_sub.add_parser("train")
    train_p.add_argument("output_path")
    train_p.add_argument("-e", "--episodes", type=int, default=1000)
    train_p.add_argument("-n", "--nb_saves", type=int, default=100)

    run_p = cli_sub.add_parser("run")
    run_p.add_argument("input_path")
    run_p.add_argument("-w", "--width", type=int, default=1024)
    run_p.add_argument("-h2", "--height", type=int, default=1024)
    run_p.add_argument("--episodes", type=int, default=1)
    run_p.add_argument("--record", default=None, help="record trajectory .npz")
    run_p.add_argument(
        "--html", default=None,
        help="also render the recording into a self-playing HTML viewer",
    )
    run_p.add_argument(
        "--live", action="store_true",
        help="serve a live view at --port: the browser's 60 FPS poll steps "
        "agent+env per frame (the reference's windowed infer loop)",
    )
    run_p.add_argument("--port", type=int, default=8800)

    gui_p = sub.add_parser(
        "gui", help="web robot-builder editor (reference: ImGui application)"
    )
    gui_p.add_argument("--port", type=int, default=8801)
    gui_p.add_argument("--robot", default=None, help="robot JSON to load")
    gui_p.add_argument(
        "--workspace", default=None,
        help="directory save/load paths from the page are confined to "
        "(default: current directory)",
    )
    gui_p.add_argument(
        "--max-requests", type=int, default=None,
        help="serve N requests then exit (bounded test/scripting path; "
        "default: serve forever)",
    )
    return parser


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    agent_kv, env_kv, rest = _extract_kv_flags(list(argv))
    args = build_parser().parse_args(rest)
    if args.mode == "gui":
        # reference `evo_motion gui` (src/gui.cpp): the ImGui robot builder.
        # Here: the web editor over the same builder environment.
        from .builder.builder_env import RobotBuilderEnvironment
        from .builder.web_editor import serve_editor

        builder = RobotBuilderEnvironment()
        if args.robot:
            builder.load_robot(args.robot)
        serve_editor(builder, port=args.port, max_requests=args.max_requests,
                     workspace=args.workspace)
        return 0

    from .agents.factory import get_agent_factory
    from .envs.registry import get_environment_factory

    agent_params = agent_kv
    env_params = env_kv
    agent_factory = get_agent_factory(args.agent_name, agent_params)
    env_factory = get_environment_factory(args.env_name, env_params)

    if args.action == "train":
        from .train.driver import train, train_batched

        if args.num_envs > 1:
            return train_batched(
                args.env_seed, env_factory, agent_params, args.num_envs,
                args.episodes, args.nb_saves, args.output_path,
                agent_name=args.agent_name,
            )
        return train(
            args.env_seed, agent_factory, env_factory,
            args.episodes, args.nb_saves, args.output_path,
        )
    else:
        if args.live:
            from .viewer.live import serve_live

            env = env_factory.make(args.env_seed)
            agent = agent_factory.create_agent(env.observation_size, env.action_size)
            agent.load(args.input_path)
            agent.set_eval(True)
            serve_live(env, agent, port=args.port, env_seed=args.env_seed)
            return 0

        from .train.driver import infer

        rc = infer(
            args.env_seed, agent_factory, env_factory, args.input_path,
            episodes=args.episodes, record_path=args.record,
        )
        if args.html and args.record:
            from .viewer.html_viewer import write_playback_html

            env = env_factory.make(args.env_seed)
            root = getattr(getattr(env, "meta", None), "root_body", 0)
            write_playback_html(args.record, args.html, env.model, root)
            print(f"viewer written to {args.html}")
        return rc


if __name__ == "__main__":
    sys.exit(main())
