"""Train an ML yield function from a Barlat Yld2004-18p (Goss texture)
reference material: yield stresses from root finding on 300 unit load cases,
imported through the Data pipeline, then FEA with an elastic inclusion —
workflow of the reference examples/train_goss_barlat.py."""
import os
import sys

import numpy as np
from scipy.optimize import fsolve

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402

# Barlat Yld2004-18p parameters for a Goss-textured material
BARLAT_GOSS = [0.81766901, -0.36431565, 0.31238124, 0.84321164, -0.01812166,
               0.8320893, 0.35952332, 0.08127502, 1.29314957, 1.0956107,
               0.90916744, 0.27655112, 1.090482, 1.18282173, -0.01897814,
               0.90539357, 1.88256105, 0.8786101]


def main(plot=False):
    E, nu, sy = 200.e3, 0.3, 50.
    mat_GB = FE.Material(name='Barlat-Goss')
    mat_GB.elasticity(E=E, nu=nu)
    mat_GB.plasticity(sy=sy, barlat=BARLAT_GOSS, barlat_exp=8, sdim=6)

    # yield stresses for 300 load cases by root finding on the Barlat locus
    N = 300
    su = FE.load_cases(int(N / 3), N - int(N / 3))
    x1 = fsolve(mat_GB.find_yloc, np.ones(N) * sy, args=(su,), xtol=1.e-5)
    sig_yld = su * x1[:, None]

    # data-driven material definition + SVC training
    db = FE.Data(sig_yld, name='Goss-Barlat-yield-stresses', sdim=6)
    mat_ml = FE.Material(name='ML-Goss-Barlat')
    db.mat_data['elast_const'] = mat_GB.CV
    mat_ml.from_data(db.mat_data)
    train_sc, _ = mat_ml.train_SVC(C=15, gamma=2.5, Nseq=25, Fe=0.3, Ce=0.95)
    print(f'SVC training score: {train_sc:.2f}%')
    mat_ml.dev_only = False

    # FEA: ML material with a stiff elastic inclusion
    mat_el = FE.Material(num=2)
    mat_el.elasticity(E=3. * E, nu=nu)
    fem = FE.Model(dim=2, planestress=False)
    fem.geom([2., 1., 2.], LY=2.)
    fem.assign([mat_ml, mat_el, mat_ml])
    fem.bcleft(0.)
    fem.bcbot(0.)
    fem.bcright(0., 'force')
    fem.bctop(0.001 * fem.leny, 'disp')
    fem.mesh(NX=10, NY=4)
    fem.solve()
    fem.calc_global()
    print('global stress:', np.round(fem.glob['sig'][:3], 3))
    if plot:
        fem.plot('seq', mag=50)
    return mat_ml


if __name__ == '__main__':
    main(plot='--plot' in sys.argv)
