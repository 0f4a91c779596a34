"""Decompose the ref-solve fast-vs-faithful parity bar (VERDICT r4 item 7).

The r3 bench recorded ~3e-2 max-component deviation between the production
fast-f32 solve and the converged faithful-f64 anchor, attributed to the SVC
locus tolerance band.  tools/dbg_ref_parity.py showed DENSER SVCs do NOT
shrink it — so decompose the bar into its actual factors on the recorded
benchmark SVC (REF_SOLVE_svc.npz):

  A fast-f32              vs faithful-f64   (the recorded bar)
  B fast-f64              vs faithful-f64   (integrator difference alone)
  C fast-f32              vs fast-f64       (precision alone)
  D fast-f64, PROJ_TOL_SCALE=0.1, nsub=8  vs faithful-f64
                                      (tightened cutting-plane projection)
  E fast-f32, PROJ_TOL_SCALE=0.1, nsub=8  vs faithful-f64 (production fix?)

Run (CPU): python tools/dbg_parity_decompose.py [N]
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

    def solve(dtype, fast, tol_scale=1., nsub=4):
        con.PROJ_TOL_SCALE = tol_scale
        con.response_fast.clear_cache()
        con.response.clear_cache()
        dm = con.device_material_from(mat, dtype=dtype)
        md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=eps,
                           dtype=dtype)
        t0 = time.perf_counter()
        st, hist = fek.solve_uniaxial(md, dm, CV, nsteps=8, n_inner=2,
                                      dtype=dtype, gate=True, fast=fast,
                                      nsub=nsub)
        out = np.asarray(hist[-1][0], float)
        con.PROJ_TOL_SCALE = 1.
        con.response_fast.clear_cache()
        log(f'  [{time.perf_counter() - t0:6.0f}s] glob_sig[:3] = '
            f'{out[:3].round(4)}')
        return out

    def par(a, b):
        return np.abs(a - b).max() / max(1., np.abs(b).max())

    log('faithful-f64:')
    anchor = solve(jnp.float64, fast=False)
    log('fast-f32 (production):')
    a = solve(jnp.float32, fast=True)
    log('fast-f64:')
    b = solve(jnp.float64, fast=True)
    log('fast-f64 tight (tol x0.1, nsub=8):')
    d = solve(jnp.float64, fast=True, tol_scale=0.1, nsub=8)
    log('fast-f32 tight (tol x0.1, nsub=8):')
    e = solve(jnp.float32, fast=True, tol_scale=0.1, nsub=8)
    log(f'A fast-f32   vs faithful : {par(a, anchor):.2e}')
    log(f'B fast-f64   vs faithful : {par(b, anchor):.2e}')
    log(f'C fast-f32   vs fast-f64 : {par(a, b):.2e}')
    log(f'D f64 tight  vs faithful : {par(d, anchor):.2e}')
    log(f'E f32 tight  vs faithful : {par(e, anchor):.2e}')


if __name__ == '__main__':
    main()
