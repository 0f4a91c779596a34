"""Global configuration for pylabfea_tpu.

The framework has two execution profiles that share one code base:

* **parity** (CPU, float64): bit-faithful to the reference numerical contract
  (``/root/reference`` pyLabFEA v4.4.2 regression values). Used by the test
  suite, which runs on a virtual 8-device CPU mesh.
* **performance** (TPU, float32/bfloat16): all hot kernels jitted/vmapped,
  assembly and CG sharded over a ``jax.sharding.Mesh``. Used by ``bench.py``
  and production runs.

x64 is enabled globally so that CPU-side math defaults to float64; TPU code
paths construct float32 arrays explicitly, so the flag does not affect the
performance profile.
"""
import os

import jax

# Enable 64-bit mode once, at package import. Hot TPU kernels pass explicit
# float32 dtypes so this only changes the CPU/parity default.
jax.config.update("jax_enable_x64", True)

import numpy as np

#: Default dtype for the parity (CPU) profile.
DTYPE_PARITY = np.float64

#: Default dtype for the performance (TPU) profile.
DTYPE_TPU = np.float32


def default_device_kind() -> str:
    """Return 'tpu' if a TPU backend is attached, else 'cpu'."""
    try:
        return jax.devices()[0].platform
    except Exception:
        return "cpu"


def compute_dtype():
    """Pick the compute dtype appropriate for the attached backend."""
    return DTYPE_TPU if default_device_kind() != "cpu" else DTYPE_PARITY


# Persistent compilation cache: the constitutive kernels contain deep
# while_loop nests whose first TPU compile is expensive; cache across runs.
import os as _os

_cache_dir = _os.environ.get("PYLABFEA_TPU_CACHE")


def _tpu_in_env():
    """Positive TPU signal from the environment alone — importing this
    module must not initialize the backend (jax.distributed.initialize in
    multi-host programs must come first), so jax.devices() is off-limits
    here.  CPU-only machines (which typically set neither variable) stay
    opt-in: cross-machine AOT reuse of CPU executables is
    feature-sensitive."""
    plats = _os.environ.get("JAX_PLATFORMS", "").lower()
    if "cpu" in plats:
        return False
    if "tpu" in plats or "axon" in plats:
        return True
    if any(v in _os.environ for v in
           ("TPU_NAME", "TPU_WORKER_ID", "TPU_LIBRARY_PATH",
            "TPU_ACCELERATOR_TYPE", "TPU_TOPOLOGY")):
        return True
    # PJRT_DEVICE is a SELECTOR whose value may be CPU/GPU (torch_xla
    # convention) — only its value counts as a TPU signal
    return _os.environ.get("PJRT_DEVICE", "").strip().upper() == "TPU"


if _cache_dir is None and _tpu_in_env():
    # default-on for TPU processes: compiles of the deep solver programs
    # are expensive and reusable across runs
    _cache_dir = _os.path.expanduser("~/.cache/pylabfea_tpu_xla")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ.get("PYLABFEA_TPU_CACHE_MIN_S", "30.0")))
    except Exception:  # pragma: no cover - cache is best-effort
        pass
