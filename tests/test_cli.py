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


def test_cli_gui_bounded():
    """`gui` serves the editor; with --max-requests it exits after serving.

    Regression test for the round-3 hang: main(["gui"]) blocked forever in
    serve_editor's serve loop; the bounded path serves one page request and
    returns 0."""
    import json
    import socket
    import threading
    import urllib.request

    from evomotion_tpu.cli import main

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    got = {}

    def fetch():
        for _ in range(100):
            try:
                got["page"] = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=5
                ).read().decode()
                return
            except OSError:
                import time

                time.sleep(0.05)

    t = threading.Thread(target=fetch, daemon=True)
    t.start()
    assert main(["gui", "--port", str(port), "--max-requests", "1"]) == 0
    t.join(timeout=10)
    assert "robot builder" in got.get("page", "")


def _wait_listening(port, deadline=15.0):
    """Block until a local server accepts connections on `port`."""
    import socket
    import time

    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1).close()
            return
        except OSError:
            time.sleep(0.05)
    raise TimeoutError(f"server on port {port} never came up")


def test_editor_rejects_foreign_and_escaping_paths(tmp_path):
    """CSRF/DNS-rebinding + path-confinement hardening (ADVICE r3)."""
    import json
    import socket
    import threading
    import urllib.request

    from evomotion_tpu.builder.builder_env import RobotBuilderEnvironment
    from evomotion_tpu.builder.web_editor import serve_editor

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    b = RobotBuilderEnvironment("bot")
    b.add_member("torso", "cube", (0, 1, 0), (0, 0, 0, 1), (0.1, 0.1, 0.1),
                 1.0, 0.5)
    th = threading.Thread(
        target=serve_editor, args=(b, port, 3, str(tmp_path)), daemon=True
    )
    th.start()
    base = f"http://127.0.0.1:{port}"
    _wait_listening(port)

    def post(body, headers=None):
        req = urllib.request.Request(
            base + "/api", data=json.dumps(body).encode(), method="POST",
            headers=headers or {},
        )
        try:
            r = urllib.request.urlopen(req, timeout=10)
            return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    # foreign Origin → 403, op not executed
    code, out = post({"op": "save_robot", "args": {"path": "x.json"}},
                     {"Origin": "http://evil.example"})
    assert code == 403 and not out["ok"]
    # path escaping the workspace → refused
    code, out = post({"op": "save_robot", "args": {"path": "../escape.json"}})
    assert not out["ok"] and "workspace" in out["error"]
    assert not (tmp_path.parent / "escape.json").exists()
    # in-workspace save works
    code, out = post({"op": "save_robot", "args": {"path": "ok.json"}})
    assert out["ok"] and (tmp_path / "ok.json").exists()
    th.join(timeout=30)
    assert not th.is_alive()


def test_cli_kv_extraction():
    from evomotion_tpu.cli import _extract_kv_flags

    agent, env, rest = _extract_kv_flags(
        ["cli", "cartpole", "ppo_gae", "--agent_parameters", "a=1", "b=2",
         "--env_parameters", "c=3", "train", "/tmp/x", "-e", "4"]
    )
    assert agent == {"a": "1", "b": "2"}
    assert env == {"c": "3"}
    assert rest == ["cli", "cartpole", "ppo_gae", "train", "/tmp/x", "-e", "4"]
