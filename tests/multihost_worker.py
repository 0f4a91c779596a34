"""Worker process for the multi-host (DCN) test: joins a 2-process JAX
distributed runtime on CPU (4 virtual devices per process -> 8 global),
builds the global strip mesh and runs one elastic strip-decomposed CG solve
spanning both processes.  Prints a replicated checksum the parent compares
across processes and against the single-process value.

Invoked by tests/test_multihost.py as:
    python multihost_worker.py <process_id> <num_processes> <port>
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
assert len(jax.devices()) == 4 * nproc, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = dist.global_strip_mesh()
assert mesh.devices.shape == (4 * nproc,)
# ICI-contiguity: each process' devices occupy a contiguous block
procs = [d.process_index for d in mesh.devices.ravel()]
assert procs == sorted(procs), procs

import jax.numpy as jnp  # noqa: E402
from pylabfea_tpu.parallel import sharded as sh  # noqa: E402

E, nu = 200.e3, 0.3
lam = E * nu / ((1. + nu) * (1. - 2. * nu))
mu = 0.5 * E / (1. + nu)
CV = np.zeros((6, 6))
CV[0:3, 0:3] = lam
CV[np.arange(3), np.arange(3)] += 2. * mu
CV[np.arange(3, 6), np.arange(3, 6)] = mu

NX, NY = 16, 8
sm = sh.StripMesh(NX, NY, LX=4., LY=1., uniax='y', eps_tot=0.002,
                  dtype=jnp.float64)
el_b = sm.shard_elements(np.broadcast_to(CV, (NX * NY, 6, 6)).copy())
bcv = tuple(v for v in sm.fixed_val)
du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(sm.fixed, bcv))
k_apply = sh.make_k_apply(sm)
zmask = tuple(jnp.zeros_like(f) for f in sm.fixed)
neg = k_apply(el_b, du_bc, zmask)
rhs = tuple(jnp.where(f, b, -q) for f, b, q in zip(sm.fixed, bcv, neg))

from functools import partial  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


@partial(shard_map, mesh=sm.mesh, in_specs=(P('x'), (P('x'), P('x'))),
         out_specs=(P('x'), P('x')))
def dcalc(el_loc, fixed_loc):
    Kp = sh.element_Ke_planes(sm, el_loc[0])
    de = tuple(Kp[i, i] for i in range(8))
    d = sh._scatter_local(de, sm.NXd, sm.NY, sm.nnY)
    d = sh._halo_accumulate(d)
    return tuple(jnp.where(f[0], 1., x)[None] for f, x in zip(fixed_loc, d))


du, res, it = sh.cg_solve_strip(sm, el_b, rhs, du_bc, dcalc(el_b, sm.fixed),
                                tol=1e-12, maxiter=5000)
gdot = sh.make_dot(sm)
checksum = float(gdot(du, du, sm.own))
print(f'CHECKSUM {checksum:.14e} res {float(res):.3e} it {int(it)}',
      flush=True)
assert float(res) < 1e-10
