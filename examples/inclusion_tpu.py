"""TPU-scale multi-material inclusion model on the device solver.

The reference's flagship FEA demo is a 2-3-material inclusion model on an
18x18 mesh (reference examples/train_hill.py:110-167, gui.py:124-169).
This example runs the same physics — an elastic-plastic matrix with a soft
elastic square inclusion, free lateral edges (force-controlled), a corner
pin against rigid-body motion, displacement-controlled tension on top — at
1024 x 1024 elements (1M elements / 2.1M DOF) directly on the attached
accelerator, using:

* ``rect_mesh(bc=..., mat_map=...)`` — general BC planes (half-corner-weight
  force edges, node pins) and per-element material groups,
* grouped batched return maps (one jitted kernel per material), and
* the multigrid-preconditioned matrix-free CG of the split-program stepper.

Run:  python examples/inclusion_tpu.py [N]       (default N=1024)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402
from pylabfea_tpu.ops import constitutive as con  # noqa: E402
from pylabfea_tpu.ops import fe_kernels as fek  # noqa: E402


def main(N=1024):
    dtype = jnp.float32 if jax.devices()[0].platform == 'tpu' \
        else jnp.float64

    # materials: Hill-anisotropic elastic-plastic matrix, J2 band, soft
    # elastic inclusion (the train_hill.py layout scaled up)
    mat_h = FE.Material(num=1)
    mat_h.elasticity(E=200.e3, nu=0.3)
    mat_h.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
    mat_j = FE.Material(num=2)
    mat_j.elasticity(E=200.e3, nu=0.3)
    mat_j.plasticity(sy=150., sdim=3)
    mat_el = FE.Material(num=3)
    mat_el.elasticity(E=1.e3, nu=0.27)
    mats = [mat_h, mat_j, mat_el]

    # geometry: left half matrix, right half J2, centered soft inclusion
    mat_map = np.zeros((N, N), dtype=int)
    mat_map[N // 2:, :] = 1
    mat_map[N // 3: 2 * N // 3, N // 3: 2 * N // 3] = 2

    LX = LY = 4.
    bc = {
        'bot': {1: ('disp', 0.)},
        'left': {},                      # free (force = 0)
        'right': {},
        'top': {1: ('disp', 0.002 * LY)},
        'nodes': ((0, 0, 0, 'disp', 0.),),   # corner pin against RBM
    }
    md = fek.rect_mesh(N, N, LX=LX, LY=LY, bc=bc, mat_map=mat_map,
                       dtype=dtype)
    dms = tuple(con.device_material_from(m, dtype=dtype) for m in mats)
    CVs = tuple(np.asarray(m.CV, dtype=float) for m in mats)

    state = fek.init_state(md, CVs, dtype=dtype)
    nsteps = 8
    t_all = 0.
    du0 = None
    for i in range(nsteps):
        t0 = time.perf_counter()
        state, diag = fek.load_step_split(md, state, dms, CVs,
                                          1. / nsteps, n_inner=2, du0=du0)
        du0 = diag['du']
        jax.block_until_ready(state.sig)
        dt = time.perf_counter() - t0
        t_all += dt
        print(f'step {i + 1}/{nsteps}: {dt:.2f}s  '
              f'cg_iters={int(diag["cg_iters"])}  '
              f'fy_max={float(diag["fy_max"]):.3e}  '
              f'sig_yy={float(diag["glob_sig"][1]):.2f}')
    peeq = np.asarray(jnp.sqrt(2. / 3.) * jnp.linalg.norm(state.epl, axis=1))
    print(f'\n{N}x{N} ({N * N:,} elements) done in {t_all:.1f}s; '
          f'plastic fraction {float((peeq > 1e-6).mean()):.2%}, '
          f'global sig = {np.round(np.asarray(diag["glob_sig"]), 2)}')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
