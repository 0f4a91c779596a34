"""Multi-host (DCN) initialization helpers.

Single-host multi-chip parallelism needs nothing beyond
``parallel.mesh``/``parallel.sharded`` — XLA drives the ICI collectives.
Across hosts, JAX requires a coordinated runtime; this wraps
``jax.distributed.initialize`` and builds a global device mesh whose ICI
axis is innermost, so the halo exchange of the strip decomposition rides
ICI while only strip-boundary traffic crosses DCN.
"""
import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None):
    """Initialize the JAX distributed runtime (no-op if single process).

    All arguments default to the standard cluster environment variables
    (JAX_COORDINATOR_ADDRESS etc.); pass them explicitly for manual setups.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_strip_mesh():
    """1-D device mesh over all processes' devices, ordered so that devices
    of one host (ICI-connected) are contiguous along the strip axis —
    neighboring strips exchange halos over ICI wherever possible."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), ('x',))
