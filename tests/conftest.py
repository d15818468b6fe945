"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding logic is validated on virtual CPU devices
(xla_force_host_platform_device_count) so the suite runs anywhere; the real
TPU chip is exercised by bench.py.

Note: the host environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
sitecustomize hook imports jax at interpreter startup, so the env var is
already baked into jax.config by the time pytest runs — override through
jax.config (the backend itself is not yet initialized at conftest time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

# persistent XLA compilation cache: the gate's wall-clock is dominated by
# interpret-mode pallas + spider-model compiles that are identical from run
# to run; caching them makes every gate after the first several times
# faster (the cache lives outside the repo and survives clones)
cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "evomotion_jax"),
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (>50 s on this box: strict-mode rollouts, "
        "determinism goldens, multi-process smoke). Skipped by default so "
        "`pytest tests` finishes in bounded time; run the full gate with "
        "`pytest tests --runslow` (nightly) or select them with `-m slow`.",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the full nightly gate)",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--runslow") or config.getoption("-m"):
        return  # explicit marker expressions manage their own selection
    skip = pytest.mark.skip(reason="slow: default gate skips; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


import pytest


@pytest.fixture(scope="session")
def spider_walk():
    """ONE compiled spider robot_walk env shared across the whole session.

    Compiling the 371-obs spider's reset/step on CPU costs minutes; before
    this fixture every test file (and several tests within a file) rebuilt
    and recompiled it, which alone blew most of the default gate's
    wall-clock budget (VERDICT r4 weak #5). Returns (env, jit_reset,
    jit_step) — tests that can live with the default factory parameters
    MUST use this instead of constructing RobotWalk()."""
    import jax

    from evomotion_tpu.envs.robot import RobotWalk

    env = RobotWalk()
    jit_reset = jax.jit(env.reset)
    jit_step = jax.jit(env.step)
    return env, jit_reset, jit_step
