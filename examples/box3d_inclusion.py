"""3-D elastoplastic inclusion on the TPU device path.

A capability beyond the reference package (pyLabFEA models are 1-D/2-D
only, reference model.py:157-197): a stiff elastic cube embedded in a
J2-plastic matrix, loaded uniaxially — the 3-D analogue of the
reference's flagship 2-D inclusion workload (train_hill.py:110-167) —
solved matrix-free with the hex8 partial-assembly operator and 3-D
geometric multigrid (ops/fe3d.py).

Run: python examples/box3d_inclusion.py [N]   (default N=32 -> 32,768
elements; 128 -> 2.1M elements on a TPU).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402
from pylabfea_tpu.ops import fe3d, constitutive as con  # noqa: E402


def main(N=32, nsteps=8, plot=False, dtype=jnp.float32):
    E, nu = 200.e3, 0.3
    matrix = FE.Material('matrix')
    matrix.elasticity(E=E, nu=nu)
    matrix.plasticity(sy=150., khard=500., sdim=6)
    incl = FE.Material('inclusion', num=2)
    incl.elasticity(E=3. * E, nu=nu)
    CVi = np.zeros((6, 6))
    CVi[:3, :3] = incl.C12
    np.fill_diagonal(CVi[:3, :3], incl.C11)
    CVi[3, 3] = CVi[4, 4] = CVi[5, 5] = incl.C44

    dm_m = con.device_material_from(matrix, dtype=dtype)
    dm_i = con.device_material_from(incl, dtype=dtype)

    # centered cubic inclusion, ~1/4 the edge length
    mm = np.zeros((N, N, N), np.int32)
    lo, hi = 3 * N // 8, 5 * N // 8
    mm[lo:hi, lo:hi, lo:hi] = 1
    eps = 0.002
    md = fe3d.box_mesh(N, N, N, uniax='z', eps_tot=eps, mat_map=mm,
                       dtype=dtype)
    t0 = time.time()
    state, hist = fe3d.solve_uniaxial3(md, (dm_m, dm_i),
                                       (matrix.CV, CVi), nsteps=nsteps,
                                       n_inner=2)
    jax.block_until_ready(state.sig)
    wall = time.time() - t0
    gs = np.asarray(hist[-1][0])
    print(f'{N}^3 = {N ** 3:,} elements, {nsteps} steps: {wall:.2f} s '
          f'({jax.devices()[0].platform})')
    print(f'composite sig_zz = {gs[2]:.2f} MPa at eps_zz = {eps:.4f}')
    pure = (150. + 500. * eps) * E / (E + 500.)
    print(f'pure-matrix flow stress = {pure:.2f} MPa '
          f'(inclusion strengthening = {gs[2] - pure:+.2f})')
    assert gs[2] > pure, 'stiff inclusion must strengthen the composite'
    epl = np.asarray(state.epl)
    assert np.abs(epl[mm.reshape(-1) == 1]).max() < 1e-8, \
        'inclusion must stay elastic'
    if plot:
        import matplotlib.pyplot as plt
        seq = FE.sig_eq_j2(np.asarray(state.sig)).reshape(N, N, N)
        plt.imshow(seq[:, N // 2, :].T, origin='lower', cmap='viridis')
        plt.colorbar(label='seq (MPa)')
        plt.title(f'mid-plane equivalent stress, {N}^3 inclusion box')
        plt.xlabel('x'), plt.ylabel('z')
        plt.show()
    return state, hist


if __name__ == '__main__':
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    main(N=N, plot=False)
