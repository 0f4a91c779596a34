"""Sweep (PROJ_TOL_SCALE, nsub) of the fast integrator against the
faithful-f64 anchor on the REF_SOLVE benchmark BVP — which knob closes the
band gap (VERDICT r4 item 7)?   CPU, 8^2.
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

    def solve(dtype, fast, tol_scale=1., nsub=4, maxiter=12):
        con.PROJ_TOL_SCALE = tol_scale
        con.response_fast.clear_cache()
        dm = con.device_material_from(mat, dtype=dtype)
        md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=eps,
                           dtype=dtype)

        # patch nsub/maxiter through solve_uniaxial's fast path
        st = fek.init_state(md, CV, dtype=dtype)
        du0 = kes0 = dst0 = None
        hist = []
        for _ in range(8):
            st, d = fek.load_step_split(md, st, dm, CV, 1. / 8,
                                        n_inner=2, du0=du0, gate=True,
                                        kes0=kes0, dst0=dst0, fast=fast,
                                        nsub=nsub)
            du0, kes0, dst0 = d['du'], d.get('kes'), d['dstiff']
            hist.append(d['glob_sig'])
        out = np.asarray(hist[-1], float)
        con.PROJ_TOL_SCALE = 1.
        con.response_fast.clear_cache()
        return out

    anchor = solve(jnp.float64, fast=False)
    log(f'anchor (faithful-f64): {anchor[:3].round(4)}')

    def par(a):
        return np.abs(a - anchor).max() / max(1., np.abs(anchor).max())

    for ts, ns in ((1.0, 8), (0.1, 4), (1.0, 16), (0.1, 16), (0.02, 16),
                   (0.1, 32)):
        t0 = time.perf_counter()
        a = solve(jnp.float64, fast=True, tol_scale=ts, nsub=ns)
        log(f'tol x{ts:<5} nsub={ns:<3}: parity {par(a):.2e}  '
            f'sig[:3]={a[:3].round(4)}  ({time.perf_counter() - t0:.0f}s)')


if __name__ == '__main__':
    main()
