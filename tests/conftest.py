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

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process distributed smoke)"
    )
