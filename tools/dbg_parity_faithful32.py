"""Round-5 parity experiment: does the FAITHFUL integrator at f32 land
within 1e-3 of the converged faithful-f64 anchor (REF_SOLVE BVP)?

  anchor  faithful-f64  (the REF_SOLVE converged anchor config)
  G       faithful-f32  vs anchor   (precision alone, faithful integrator)
  A       fast-f32 nsub=16 vs anchor (the recorded 9.6e-3 bar, for context)

If G <= ~1e-4, a commit-faithful hybrid (fast inner iterations + faithful
committed response) should close VERDICT r5 item 1.

Run (CPU): python tools/dbg_parity_faithful32.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops.svc import SVCParams

    z = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'REF_SOLVE_svc.npz'))
    mat = FE.Material('ref-ML')
    mat.elasticity(CV=np.asarray(z['CV'], dtype=float))
    mat.plasticity(sy=float(z['sy']), sdim=6)
    mat._svc = SVCParams(support_vectors=np.asarray(z['support_vectors']),
                         dual_coef=np.asarray(z['dual_coef']),
                         intercept=float(z['intercept']),
                         gamma=float(z['gamma']))
    mat.ML_yf = True
    mat.dev_only = bool(z['dev_only'])
    mat.scale_seq = float(z['scale_seq'])
    mat.Ndof = 6
    CV = np.asarray(z['CV'], float)
    eps = float(z['eps'])

    def solve(dtype, fast, nsub=4):
        dm = con.device_material_from(mat, dtype=dtype)
        md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=eps,
                           dtype=dtype)
        t0 = time.perf_counter()
        st, hist = fek.solve_uniaxial(md, dm, CV, nsteps=8, n_inner=2,
                                      dtype=dtype, gate=True, fast=fast,
                                      nsub=nsub)
        out = np.asarray(hist[-1][0], float)
        log(f'  [{time.perf_counter() - t0:6.0f}s] glob_sig = '
            f'{out.round(4)}')
        return out

    def par(a, b):
        return np.abs(a - b).max() / max(1., np.abs(b).max())

    log('faithful-f64 (anchor):')
    anchor = solve(jnp.float64, fast=False)
    log('faithful-f32 (G):')
    g = solve(jnp.float32, fast=False)
    log('fast-f32 nsub=16 (A, recorded bar):')
    a = solve(jnp.float32, fast=True, nsub=16)
    log(f'G faithful-f32 vs faithful-f64 : {par(g, anchor):.2e}')
    log(f'A fast-f32/16  vs faithful-f64 : {par(a, anchor):.2e}')


if __name__ == '__main__':
    main()
