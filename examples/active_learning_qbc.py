"""Query-by-committee active learning for ML yield functions: train a
committee of SVCs on bootstrapped data, locate the stress direction of
maximum committee disagreement (over 5 spherical angles), and add the new
yield stress to the training set — workflow of the reference
examples/Active_Learning/qbc_svc.py."""
import os
import sys

import numpy as np
from scipy.optimize import differential_evolution, fsolve

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402


def committee_variance(angles, committee):
    """Negative variance of committee yield distances for a unit stress given
    by 5 spherical angles (minimized by differential evolution)."""
    su = FE.sig_spherical_to_cartesian(angles)
    su = su / FE.sig_eq_j2(su)
    vals = []
    for mat in committee:
        x = fsolve(mat.find_yloc, np.array([mat.sy]), args=(su[None, :],),
                   xtol=1.e-4)
        vals.append(x[0])
    return -np.var(vals)


def main(n_members=5, n_queries=3, Nlc_init=40, seed=42):
    rng = np.random.default_rng(seed)
    E, nu, sy = 200.e3, 0.3, 50.
    mat_ref = FE.Material(name='Hill-reference')
    mat_ref.elasticity(E=E, nu=nu)
    mat_ref.plasticity(sy=sy, hill=[0.8, 1., 1.2, 1., 1., 1.], sdim=6)

    # initial yield-stress data
    su = FE.load_cases(int(Nlc_init / 3), Nlc_init - int(Nlc_init / 3))
    x1 = fsolve(mat_ref.find_yloc, np.ones(Nlc_init) * sy, args=(su,),
                xtol=1.e-5)
    sdata = su * x1[:, None]

    for it in range(n_queries):
        # bootstrap committee
        committee = []
        for k in range(n_members):
            idx = rng.choice(len(sdata), size=int(0.8 * len(sdata)),
                             replace=False)
            m = FE.Material(f'committee-{k}')
            m.elasticity(E=E, nu=nu)
            m.train_SVC(C=10, gamma=2., sdata=sdata[idx], Nseq=6, Fe=0.6,
                        Ce=0.95)
            committee.append(m)
        res = differential_evolution(
            committee_variance, bounds=[(0., np.pi)] * 4 + [(0., 2 * np.pi)],
            args=(committee,), maxiter=8, popsize=6, seed=seed, tol=1e-3)
        su_new = FE.sig_spherical_to_cartesian(res.x)
        su_new = su_new / FE.sig_eq_j2(su_new)
        x_new = fsolve(mat_ref.find_yloc, np.array([sy]),
                       args=(su_new[None, :],), xtol=1.e-5)
        sdata = np.vstack([sdata, su_new * x_new[0]])
        print(f'query {it}: committee variance {-res.fun:.4f}, '
              f'new yield stress seq={FE.sig_eq_j2(sdata[-1]):.2f}')

    mat_final = FE.Material('AL-final')
    mat_final.elasticity(E=E, nu=nu)
    score, _ = mat_final.train_SVC(C=10, gamma=2., sdata=sdata, Nseq=10,
                                   Fe=0.4, Ce=0.95)
    print(f'final training score with {len(sdata)} load cases: {score:.2f}%')
    return mat_final


if __name__ == '__main__':
    main()
