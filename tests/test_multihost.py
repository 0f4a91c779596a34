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
_WORKER3D = os.path.join(os.path.dirname(__file__), 'multihost_worker3d.py')


def _spawn_workers(worker, port):
    # strip every accelerator-runtime variable so the workers' sitecustomize
    # does not pre-register a PJRT backend (jax.distributed.initialize must
    # run before ANY backend touch)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_', 'PALLAS_', 'AXON_', 'TPU_'))}
    env['JAX_PLATFORMS'] = 'cpu'
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), '2', str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
    return outs


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
    outs = _spawn_workers(_WORKER, port)
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


def test_two_process_distributed_slab3d():
    """3-D x-slab decomposition across the process boundary: a 2-step
    elastoplastic hex8 solve whose halo-plane ppermutes and Schwarz
    coarse-grid psum cross DCN; the replicated mean-stress vector must
    agree between processes, with the single-process 8-device slab run,
    and with the unsharded fe3d reference solve."""
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    outs = _spawn_workers(_WORKER3D, port)
    sums = []
    for out in outs:
        m = re.search(r'CHECKSUM3D (\S+) (\S+) (\S+)', out)
        assert m, out
        sums.append(np.array([float(m.group(i)) for i in (1, 2, 3)]))
    np.testing.assert_array_equal(sums[0], sums[1])

    # single-process 8-device slab run of the identical problem
    from pylabfea_tpu.ops import constitutive as con, fe3d
    from pylabfea_tpu.parallel import sharded3 as sh3
    import pylabfea_tpu as FE
    m3 = FE.Material()
    m3.elasticity(E=200.e3, nu=0.3)
    m3.plasticity(sy=150., khard=500., sdim=6)
    dm3 = con.device_material_from(m3, dtype=jnp.float64)
    sm = sh3.SlabMesh3(8, 4, 4, uniax='z', eps_tot=0.002,
                       dtype=jnp.float64)
    _, _, _, hist = sh3.solve_uniaxial3_slab(sm, dm3, m3.CV, nsteps=2,
                                             n_inner=1)
    ref = np.asarray(hist[-1][0])[:3]      # workers print the normal rows
    np.testing.assert_allclose(sums[0], ref, rtol=1e-9, atol=1e-9)

    # and the unsharded single-device fe3d solve
    md3 = fe3d.box_mesh(8, 4, 4, uniax='z', eps_tot=0.002,
                        dtype=jnp.float64)
    _, hist1 = fe3d.solve_uniaxial3(md3, dm3, m3.CV, nsteps=2, n_inner=1)
    ref1 = np.asarray(hist1[-1][0])[:3]
    scale = max(1.0, float(np.abs(ref1).max()))
    assert float(np.abs(sums[0] - ref1).max()) / scale < 1e-8
