"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding logic is validated on virtual CPU devices
(xla_force_host_platform_device_count) so the suite runs anywhere; the real
TPU chip is exercised by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
