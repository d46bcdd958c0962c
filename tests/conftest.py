"""Test config: run all tests on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere: tests never touch the
real TPU (the bench does); multi-chip sharding is validated on
xla_force_host_platform_device_count=8 CPU devices.
"""

import os
import sys

# Force CPU: the harness env sets JAX_PLATFORMS=axon (real TPU tunnel) AND its
# sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter startup, which overrides the env var — so we must override the
# config again after importing jax, before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
# keep CPU test executables out of the TPU session's persistent cache
# (cross-machine CPU AOT reloads warn about mismatched -march features)
os.environ["CANU_TPU_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Make the repo root importable regardless of pytest rootdir config.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
