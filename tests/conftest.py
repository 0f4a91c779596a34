"""Test configuration: force an 8-device virtual CPU mesh.

The parity suite runs on CPU in float64; multi-chip sharding tests use the
8 virtual host devices.  Note: the runtime environment may pre-import and
pre-configure jax for an attached TPU (sitecustomize), so the platform must
be forced via jax.config.update, not env vars alone.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Machine-local persistent XLA cache for the suite: the heavy tests are
# compile-dominated (f64 shard_map CG, custom_root AD), and the suite's
# subprocess tests (multichip gate, multihost workers) recompile programs
# the disk cache can serve.  Same-machine reuse only — the cross-machine
# CPU-feature concern that keeps the cache opt-in in config.py does not
# apply.  PYLABFEA_TPU_CACHE is inherited by every subprocess helper (the
# multihost worker strips only JAX_/XLA_/... prefixed variables).
os.environ.setdefault(
    "PYLABFEA_TPU_CACHE",
    os.path.expanduser("~/.cache/pylabfea_tpu_test_xla"))
os.environ.setdefault("PYLABFEA_TPU_CACHE_MIN_S", "4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", \
        "parity test suite must run on CPU devices"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
