"""Viewer tier: live HTTP policy view + self-contained playback HTML."""

import json
import os
import threading
import urllib.request

import jax
import numpy as np

from evomotion_tpu.agents.debug_agents import RandomAgent
from evomotion_tpu.envs.cartpole import CartPole, CartPoleParams


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_live_viewer_serves_frames():
    from evomotion_tpu.viewer.live import serve_live

    env = CartPole(CartPoleParams(reset_frame_nb=2))
    agent = RandomAgent(action_space=1, seed=0)
    port = _free_port()
    results = {}

    def client():
        import time

        page = None
        for _ in range(120):  # wait for the server to bind
            try:
                page = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=60
                ).read().decode()
                break
            except OSError:
                time.sleep(0.5)
        results["page"] = page
        frames = []
        for _ in range(3):
            s = json.loads(
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/state", timeout=60
                ).read()
            )
            frames.append(s)
        results["frames"] = frames

    t = threading.Thread(target=client, daemon=True)
    t.start()
    session = serve_live(env, agent, port=port, max_frames=3)
    t.join(timeout=60)

    page = results["page"]
    # the embedded renderer carries the reference camera + ground parity
    assert "cam.factor" in page and "2.0" in page  # FollowCamera factor
    assert "drawGround" in page  # TileGround checkerboard
    frames = results["frames"]
    assert len(frames) == 3
    # each poll advanced the env one step (InferOpenGlWindow semantics)
    assert frames[-1]["step"] == 3 or frames[-1]["episode"] >= 1
    assert np.asarray(frames[0]["pos"]).shape == (env.model.n_bodies, 3)
    assert session.step_idx >= 0


def test_playback_html_roundtrip(tmp_path):
    from evomotion_tpu.viewer.html_viewer import write_playback_html
    from evomotion_tpu.viewer.recorder import TrajectoryRecorder

    env = CartPole(CartPoleParams(reset_frame_nb=2))
    rec = TrajectoryRecorder(env)
    state, res = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(5):
        state, res = step(state, jax.numpy.zeros((1,)))
        rec.add(state)
    npz = os.path.join(tmp_path, "t.npz")
    rec.save(npz)
    out = os.path.join(tmp_path, "t.html")
    write_playback_html(npz, out, env.model, root_body=env.pendulum)
    html = open(out).read()
    assert "FRAMES_POS" in html and "requestAnimationFrame" in html
    # trajectory really embedded: 5 frames
    frames = html.split("const FRAMES_POS = ")[1].split(";\n")[0]
    assert len(json.loads(frames)) == 5
