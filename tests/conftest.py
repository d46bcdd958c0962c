"""Test config: run all tests on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere: tests never touch the
real TPU (the bench does); multi-chip sharding is validated on
xla_force_host_platform_device_count=8 CPU devices.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo root importable regardless of pytest rootdir config.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
