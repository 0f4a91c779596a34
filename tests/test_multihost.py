"""Multi-host (DCN) path: a real 2-process ``jax.distributed`` run on CPU.

Two worker processes (4 virtual CPU devices each) join one distributed
runtime, build the global strip mesh of ``parallel.distributed`` and solve
an elastic strip-decomposed system whose domain decomposition SPANS the
process boundary — the halo exchange crosses what would be DCN on a real
pod.  The replicated checksum must agree between the processes and with the
same solve executed single-process on 8 local devices.
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylabfea_tpu.parallel import sharded as sh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 devices')

_WORKER = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')


def _single_process_checksum():
    E, nu = 200.e3, 0.3
    lam = E * nu / ((1. + nu) * (1. - 2. * nu))
    mu = 0.5 * E / (1. + nu)
    CV = np.zeros((6, 6))
    CV[0:3, 0:3] = lam
    CV[np.arange(3), np.arange(3)] += 2. * mu
    CV[np.arange(3, 6), np.arange(3, 6)] = mu
    NX, NY = 16, 8
    sm = sh.StripMesh(NX, NY, LX=4., LY=1., uniax='y', eps_tot=0.002,
                      n_devices=8, dtype=jnp.float64)
    el_b = sm.shard_elements(np.broadcast_to(CV, (NX * NY, 6, 6)).copy())
    bcv = sm.fixed_val
    du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(sm.fixed, bcv))
    k_apply = sh.make_k_apply(sm)
    zmask = tuple(jnp.zeros_like(f) for f in sm.fixed)
    neg = k_apply(el_b, du_bc, zmask)
    rhs = tuple(jnp.where(f, b, -q) for f, b, q in zip(sm.fixed, bcv, neg))
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(shard_map, mesh=sm.mesh, in_specs=(P('x'), (P('x'), P('x'))),
             out_specs=(P('x'), P('x')))
    def dcalc(el_loc, fixed_loc):
        Kp = sh.element_Ke_planes(sm, el_loc[0])
        de = tuple(Kp[i, i] for i in range(8))
        d = sh._scatter_local(de, sm.NXd, sm.NY, sm.nnY)
        d = sh._halo_accumulate(d)
        return tuple(jnp.where(f[0], 1., x)[None]
                     for f, x in zip(fixed_loc, d))

    du, res, _ = sh.cg_solve_strip(sm, el_b, rhs, du_bc,
                                   dcalc(el_b, sm.fixed), tol=1e-12,
                                   maxiter=5000)
    gdot = sh.make_dot(sm)
    assert float(res) < 1e-10
    return float(gdot(du, du, sm.own))


def test_two_process_distributed_strip():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    # strip every accelerator-runtime variable so the workers' sitecustomize
    # does not pre-register a PJRT backend (jax.distributed.initialize must
    # run before ANY backend touch)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_', 'PALLAS_', 'AXON_', 'TPU_'))}
    env['JAX_PLATFORMS'] = 'cpu'
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), '2', str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
    sums = []
    for out in outs:
        m = re.search(r'CHECKSUM (\S+) res (\S+)', out)
        assert m, out
        sums.append(float(m.group(1)))
    # both processes compute the SAME replicated global value
    assert sums[0] == sums[1]
    # and it matches the single-process 8-device solve
    ref = _single_process_checksum()
    np.testing.assert_allclose(sums[0], ref, rtol=1e-10)
