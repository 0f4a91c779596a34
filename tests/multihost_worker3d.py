"""Worker process for the 3-D multi-host (DCN) test: joins a 2-process JAX
distributed runtime on CPU (4 virtual devices per process -> 8 global),
builds an x-slab-sharded hex8 box whose slab decomposition SPANS the
process boundary (halo-plane ppermutes + two-level Schwarz cross what
would be DCN on a real pod) and runs a 2-step elastoplastic solve.
Prints the replicated glob_sig checksum the parent compares across
processes and against the single-process 8-device value.

Invoked by tests/test_multihost.py as:
    python multihost_worker3d.py <process_id> <num_processes> <port>
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=4').strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

from pylabfea_tpu.parallel import distributed as dist  # noqa: E402

assert dist.init_multihost(f'localhost:{port}', nproc, pid)
assert jax.process_count() == nproc, jax.process_count()

import jax.numpy as jnp  # noqa: E402

import pylabfea_tpu as FE  # noqa: E402
from pylabfea_tpu.ops import constitutive as con  # noqa: E402
from pylabfea_tpu.parallel import sharded3 as sh3  # noqa: E402

m3 = FE.Material()
m3.elasticity(E=200.e3, nu=0.3)
m3.plasticity(sy=150., khard=500., sdim=6)
dm3 = con.device_material_from(m3, dtype=jnp.float64)

sm = sh3.SlabMesh3(8, 4, 4, uniax='z', eps_tot=0.002, dtype=jnp.float64)
assert sm.D == 4 * nproc, sm.D
sig, epl, u, hist = sh3.solve_uniaxial3_slab(sm, dm3, m3.CV,
                                             nsteps=2, n_inner=1)
gs = np.asarray(jax.device_get(hist[-1][0]))   # replicated mean stress
print(f'CHECKSUM3D {gs[0]:.14e} {gs[1]:.14e} {gs[2]:.14e}', flush=True)
assert np.isfinite(gs).all()
