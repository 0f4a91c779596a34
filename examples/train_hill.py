"""Train an ML yield function from an anisotropic Hill reference material
(via rv flow ratios) and run a 3-material FE model (Hill + ML + elastic
inclusion) — workflow of the reference examples/train_hill.py."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402


def main(plot=False):
    E, nu, sy = 200.e3, 0.3, 50.
    rv = [1.2, 1., 0.8, 1., 1., 1.]
    mat_h = FE.Material(name='Hill-reference')
    mat_h.elasticity(E=E, nu=nu)
    mat_h.plasticity(sy=sy, rv=rv, sdim=6)

    mat_ml = FE.Material(name='Hill-ML')
    train_sc, _ = mat_ml.train_SVC(C=4, gamma=1.5, mat_ref=mat_h, Nlc=300,
                                   Nseq=25, Fe=0.3, Ce=0.95)
    print(f'SVC training score: {train_sc:.2f}%')
    mat_ml.dev_only = False

    mat_el = FE.Material(name='elastic inclusion')
    mat_el.elasticity(E=3. * E, nu=nu)

    fem = FE.Model(dim=2, planestress=False)
    fem.geom([2., 2., 2.], LY=2.)
    fem.assign([mat_h, mat_el, mat_ml])
    fem.bcleft(0.)
    fem.bcbot(0.)
    fem.bcright(0., 'force')
    fem.bctop(0.002 * fem.leny, 'disp')
    fem.mesh(NX=12, NY=4)
    fem.solve()
    fem.calc_global()
    print('global stress:', np.round(fem.glob['sig'][:3], 3))
    print('global plastic strain:', np.round(fem.glob['epl'][:3], 6))
    if plot:
        fem.plot('seq', mag=20)
        fem.plot('peeq', mag=20)
    return fem


if __name__ == '__main__':
    main(plot='--plot' in sys.argv)
