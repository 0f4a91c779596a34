"""Debug the commit-faithful hybrid: per-step glob_sig of
  F  full-faithful f32 (fast=False)          — the good config (1e-5)
  H  fast inner + faithful commit            — broke (2.8e-1)
and the per-step difference of committed states, plus a single-step probe:
faithful vs fast response at the SAME converged du of step 1.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    N = 8
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
    dtype = jnp.float32
    dm = con.device_material_from(mat, dtype=dtype)

    def steps(fast, commit_faithful, tag):
        md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=eps,
                           dtype=dtype)
        state = fek.init_state(md, CV, dtype=dtype)
        du0 = kes0 = dst0 = None
        print(f'--- {tag} ---', flush=True)
        for k in range(8):
            state, d = fek.load_step_split(
                md, state, dm, CV, 1. / 8, n_inner=2, gate=True,
                fast=fast, nsub=4, du0=du0, kes0=kes0, dst0=dst0,
                commit_faithful=commit_faithful)
            du0, kes0, dst0 = d['du'], d.get('kes'), d['dstiff']
            gs = np.asarray(d['glob_sig'], float)
            print(f'  step {k}: fy_max {float(d["fy_max"]):+.3e}  '
                  f'glob_sig {gs[:3].round(3)}', flush=True)
        return state

    stF = steps(False, False, 'F full-faithful')
    stH = steps(True, True, 'H hybrid commit-faithful')

    # single-step probe: step 1 from the SAME entering state
    md = fek.rect_mesh(N, N, LX=2., LY=2., uniax='y', eps_tot=eps,
                       dtype=dtype)
    state = fek.init_state(md, CV, dtype=dtype)
    state, d = fek.load_step_split(md, state, dm, CV, 1. / 8, n_inner=2,
                                   gate=True, fast=True, nsub=4)
    # second step drives yield; get converged du under fast loop
    st2, d2 = fek.load_step_split(md, state, dm, CV, 1. / 8, n_inner=2,
                                  gate=True, fast=True, nsub=4,
                                  du0=d['du'], kes0=d.get('kes'),
                                  dst0=d['dstiff'])
    deps = fek.element_deps(md, d2['du'])
    fyF, sigF, deplF, _ = fek.respond_grouped(md, dm, CV, state.sig,
                                              state.epl, deps, fast=False)
    fyQ, sigQ, deplQ, _ = fek.respond_grouped(md, dm, CV, state.sig,
                                              state.epl, deps, fast=True,
                                              nsub=4)
    print('single-step probe at same du (step 2):')
    print('  |sig_faithful - sig_fast| max:',
          float(jnp.abs(sigF - sigQ).max()))
    print('  fy faithful max/min:', float(fyF.max()), float(fyF.min()))
    print('  fy fast     max/min:', float(fyQ.max()), float(fyQ.min()))
    print('  glob sig faithful:', np.asarray(jnp.mean(sigF, 0))[:3].round(3))
    print('  glob sig fast    :', np.asarray(jnp.mean(sigQ, 0))[:3].round(3))


if __name__ == '__main__':
    main()
