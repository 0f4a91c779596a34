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


# ---------------------------------------------------------------- tiering
# Suite lanes (VERDICT r5 item 4): the full suite is compile-dominated and
# runs ~1 h on one CPU, so regressions are checked lane-wise.
#   -m fast         host-parity golden lane, < 5 min (CI default)
#   -m device       device-kernel/bridge lane (~10 min)
#   -m slowcompile  fe3d + domain decomposition + multihost + examples
# Modules not listed default to `device`.
_LANES = {
    "test_tensors": "fast", "test_legacy_api": "fast",
    "test_criteria": "fast", "test_rootfind": "fast",
    "test_utils": "fast", "test_model": "fast", "test_data": "fast",
    "test_dataio_formats": "fast", "test_gui": "fast",
    "test_material_api": "fast", "test_plotting": "fast",
    "test_ml": "fast",
    "test_device": "device", "test_bridge": "device",
    "test_stencil": "device", "test_multimat": "device",
    "test_native": "device", "test_calibrate": "device",
    "test_femu": "device", "test_jax_trainer": "device",
    "test_extended": "device",
    "test_fe3d": "slowcompile", "test_multihost": "slowcompile",
    "test_sharded_strip": "slowcompile",
    "test_sharded_slab3": "slowcompile",
    "test_examples": "slowcompile",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        lane = _LANES.get(item.module.__name__, "device")
        item.add_marker(getattr(_pytest.mark, lane))
