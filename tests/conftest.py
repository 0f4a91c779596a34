"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

The parity suite runs on CPU in float64; multi-chip sharding tests use the
8 virtual host devices. Must run before anything imports jax.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
