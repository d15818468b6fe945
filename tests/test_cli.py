"""CLI end-to-end test: train -> checkpoint -> run (reference flag surface)."""

import subprocess
import sys
import os

import pytest


@pytest.mark.slow
def test_cli_train_then_run(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = str(tmp_path / "out")
    base = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from evomotion_tpu.cli import main; import sys; sys.exit(main(sys.argv[1:]))",
        "cli", "cartpole", "ppo_gae",
        "--agent_parameters", "seed=1", "hidden_size=8", "gamma=0.99", "lambda=0.95",
        "epsilon=0.2", "entropy_factor=0.01", "critic_loss_factor=0.5", "epoch=1",
        "batch_size=2", "train_every=2", "replay_buffer_size=8", "learning_rate=1e-3",
        "clip_grad_norm=0.5",
        "--env_parameters", "mas_steps=30", "reset_frame_nb=2",
    ]
    r = subprocess.run(
        base + ["train", out, "-e", "2", "-n", "1"],
        capture_output=True, text=True, timeout=420, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "save_0", "actor.npz"))

    r = subprocess.run(
        base + ["run", os.path.join(out, "save_0"), "--episodes", "1"],
        capture_output=True, text=True, timeout=420, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "episode 0" in r.stdout


def test_cli_gui_stub():
    from evomotion_tpu.cli import main

    assert main(["gui"]) == 0


def test_cli_kv_extraction():
    from evomotion_tpu.cli import _extract_kv_flags

    agent, env, rest = _extract_kv_flags(
        ["cli", "cartpole", "ppo_gae", "--agent_parameters", "a=1", "b=2",
         "--env_parameters", "c=3", "train", "/tmp/x", "-e", "4"]
    )
    assert agent == {"a": "1", "b": "2"}
    assert env == {"c": "3"}
    assert rest == ["cli", "cartpole", "ppo_gae", "train", "/tmp/x", "-e", "4"]
