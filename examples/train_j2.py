"""Train an ML (SVC) yield function from an isotropic J2 reference material,
export the trained parameters in UMAT format, and characterize the ML
material with the FE solver (workflow of the reference examples/train_j2.py).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402


def main(plot=False):
    E, nu, sy = 200.e3, 0.3, 60.
    C, gamma = 15., 2.5
    mat_J2 = FE.Material(name='J2-reference')
    mat_J2.elasticity(E=E, nu=nu)
    mat_J2.plasticity(sy=sy, sdim=6)

    name = f'ML-J2_C{int(C)}_G{int(gamma * 10)}'
    mat_ml = FE.Material(name)
    mat_ml.dev_only = True  # deviatoric stress features only
    train_sc, _ = mat_ml.train_SVC(C=C, gamma=gamma, mat_ref=mat_J2,
                                   Nlc=150, Nseq=25, Fe=0.1, Ce=0.99)
    print(f'SVC training score: {train_sc:.2f}%')

    os.makedirs('models', exist_ok=True)
    mat_ml.export_MLparam(os.path.basename(__file__), file=name,
                          path='models/')
    print(f'exported models/{name}-svm.csv')

    mat_ml.calc_properties(verb=False, eps=0.01, sigeps=True)
    for sel in ('stx', 'sty', 'et2', 'ect'):
        print(f"  {sel}: ys = {mat_ml.propJ2[sel]['ys']:.2f} MPa "
              f"(J2 reference: {sy})")
    if plot:
        mat_ml.plot_stress_strain()
        mat_ml.polar_plot_yl(data=None, show=True)
    return mat_ml


if __name__ == '__main__':
    main(plot='--plot' in sys.argv)
