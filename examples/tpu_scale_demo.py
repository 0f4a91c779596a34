"""Scale demo: solve a large elastic-plastic Hill-ML model with the device
(TPU) solver — matrix-free CG + batched cutting-plane return map — and,
if several devices are attached, shard the element dimension over them.

    python examples/tpu_scale_demo.py [NX] [NY]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pylabfea_tpu.ops import fe_kernels as fek  # noqa: E402
from pylabfea_tpu.parallel.mesh import (make_mesh, shard_mesh_data,  # noqa: E402
                                        shard_state)
from __graft_entry__ import _flagship_material, _elastic_cv  # noqa: E402


def main(NX=512, NY=512, nsteps=10):
    dtype = jnp.float32
    mat = _flagship_material(dtype)
    CV = _elastic_cv(dtype)
    print(f'devices: {jax.devices()}')
    print(f'mesh: {NX} x {NY} = {NX * NY:,} elements, '
          f'{2 * (NX + 1) * (NY + 1):,} dofs')
    md = fek.rect_mesh(NX, NY, LX=float(NX) / NY, LY=1., uniax='y',
                       eps_tot=0.002, dtype=dtype)
    state = fek.init_state(md, CV, dtype=dtype)
    ndev = len(jax.devices())
    if ndev > 1 and (NX * NY) % ndev == 0:
        mesh = make_mesh(ndev)
        md = shard_mesh_data(md, mesh)
        state = shard_state(state, mesh)
        print(f'element dimension sharded over {ndev} devices')
    sharded = ndev > 1 and (NX * NY) % ndev == 0
    t0 = time.perf_counter()
    for i in range(nsteps):
        if sharded:
            state, diag = fek.load_step(md, state, mat, CV, 1. / nsteps,
                                        n_inner=2, cg_maxiter=500)
        else:
            # split-program mode: compiles in seconds even for deep
            # multigrid hierarchies; warm-started from the previous
            # increment, with the reference's convergence-gated
            # equilibrium loop (iterates only as long as the step needs)
            state, diag = fek.load_step_split(
                md, state, mat, CV, 1. / nsteps, n_inner=1, gate=True,
                du0=None if i == 0 else diag['du'])
        # reading the diagnostics forces completion (device queues are
        # in-order; block_until_ready alone does not await the tunnel)
        gs = np.asarray(diag['glob_sig'])
        print(f'step {i}: t={time.perf_counter() - t0:7.2f}s  '
              f'sig_yy={gs[1]:8.2f}  '
              f'peeq={np.asarray(diag["glob_epl"])[1]:.5f}')
    dt = time.perf_counter() - t0
    print(f'{nsteps} load steps in {dt:.2f}s '
          f'({NX * NY * nsteps / dt:,.0f} element-updates/s)')


if __name__ == '__main__':
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    main(nx, ny)
