"""Reduced-set compression of a trained ML yield function for serving.

Workflow: train an SVC flow rule against an anisotropic Hill reference
(the train_hill.py recipe), compress it with
``Material.compress_svc`` — a reduced-set approximation (weighted
k-means seeding, RKHS-objective center refinement, exact kernel-ridge
coefficients) whose reported relative RKHS error BOUNDS the
decision-function deviation at every stress state (K(x,x)=1 for the RBF
kernel) — and verify that the yield locus and an FE solve are preserved
while every constitutive evaluation gets cheaper by the compression
ratio (SVC inference cost is linear in the center count on host, device
and in the exported UMAT).

Run:  python examples/serving_compression.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(nlc=36, nseq=25, compress_to=0.75, verb=True):
    import jax.numpy as jnp
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from scipy.optimize import fsolve

    # reference material + trained SVC flow rule
    ref = FE.Material('Hill-reference')
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=50., hill=[1.4, 1., 0.7, 1.3, 0.8, 1.], sdim=6)
    mat = FE.Material('Hill-ML')
    mat.dev_only = False
    mat.train_SVC(C=15, gamma=2.5, mat_ref=ref, Nlc=nlc, Nseq=nseq, Fe=0.3)
    nsv0 = len(mat._svc.dual_coef)

    # FE solve with the FULL center set (the serving baseline).  Keep the
    # per-step trial overshoot inside the SVC training band (~0.3*sy
    # around the locus): eps_tot 4x the yield strain over 20 steps gives
    # trial excursions of ~0.2*sy, where the ML decision surface still
    # has usable gradients.
    from pylabfea_tpu.ops import fe_kernels as fek
    eps_tot = 4. * ref.sy / ref.E
    md = fek.rect_mesh(32, 32, uniax='y', eps_tot=eps_tot, dtype=jnp.float32)

    def fe_solve(m):
        dm = con.device_material_from(m, dtype=jnp.float32)
        _, hist = fek.solve_uniaxial(md, dm, np.asarray(m.CV), nsteps=20,
                                     n_inner=3, dtype=jnp.float32, gate=True)
        return np.asarray(hist[-1][0])

    sig0 = fe_solve(mat)

    # yield stresses along a fan of load cases BEFORE compression
    cases = FE.load_cases(0, 24)
    ys0 = np.array([fsolve(mat.find_yloc, np.array([mat.sy]),
                           args=(c[None, :],), xtol=1e-4)[0]
                    for c in cases])

    # compress for serving: half the centers (or tol-driven with nsv=None)
    rel = mat.compress_svc(nsv=int(nsv0 * compress_to))
    nsv1 = len(mat._svc.dual_coef)

    ys1 = np.array([fsolve(mat.find_yloc, np.array([mat.sy]),
                           args=(c[None, :],), xtol=1e-4)[0]
                    for c in cases])
    dy = np.abs(ys1 - ys0).max() / mat.sy

    # the compressed material drops straight into the device solver
    sig = fe_solve(mat)
    dsig = np.abs(sig - sig0).max() / ref.sy

    if verb:
        print(f'SVC centers: {nsv0} -> {nsv1} '
              f'({nsv1 / nsv0:.0%} of inference cost)')
        print(f'relative RKHS error (bounds |f - f~| everywhere): {rel:.2e}')
        print(f'max yield-stress shift over 24 load cases: '
              f'{dy:.2%} of sy')
        print(f'device FE solve, full centers:       '
              f'glob sig = {np.round(sig0[:3], 3)}')
        print(f'device FE solve, compressed centers: '
              f'glob sig = {np.round(sig[:3], 3)}  '
              f'(max shift {dsig:.2%} of sy)')
    return nsv0, nsv1, rel, dy, sig0, sig


if __name__ == '__main__':
    main()
