"""Multi-process jax.distributed smoke test (the multi-host dp path).

Spawns 2 OS processes that form a jax.distributed group over CPU (2 virtual
devices each -> a 4-device global mesh) and run one dp-sharded batched-PPO
train step. Validates parallel/mesh.py `initialize_multihost` +
`make_sharded_train_step` across a real process boundary — the closest a
single host gets to the BASELINE multi-host scaling config.
"""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tools", "multihost_worker.py"),
             coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd=_ROOT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PASS process {i}: 4 global devices" in out, out
