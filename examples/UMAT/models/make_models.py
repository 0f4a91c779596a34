"""Generate the pre-trained UMAT model zoo: SVC yield functions for the
J2, Hill, and Goss-Barlat reference materials, exported in the
Abaqus-readable CSV + JSON-metadata format consumed by the native UMAT
(``native/ml_umat.cpp``; format contract reference material.py:2185-2217
and examples/UMAT/models/ — hyperparameters C=15, gamma=2.5 as in the
reference's committed zoo).

Run from this directory::

    python make_models.py
"""
import os
import sys

import numpy as np
from scipy.optimize import fsolve

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..', '..'))
import pylabfea_tpu as FE  # noqa: E402

C, GAMMA = 15., 2.5
E, NU = 200.e3, 0.3
HERE = os.path.dirname(os.path.abspath(__file__)) + '/'

BARLAT_GOSS = [0.81766901, -0.36431565, 0.31238124, 0.84321164, -0.01812166,
               0.8320893, 0.35952332, 0.08127502, 1.29314957, 1.0956107,
               0.90916744, 0.27655112, 1.090482, 1.18282173, -0.01897814,
               0.90539357, 1.88256105, 0.8786101]


def train_and_export(name, mat_ref, Nlc=300, Nseq=25, Fe=0.3, Ce=0.95):
    mat_ml = FE.Material(name=f'{name}_C{C:.0f}_G{GAMMA * 10:.0f}')
    mat_ml.train_SVC(C=C, gamma=GAMMA, mat_ref=mat_ref, Nlc=Nlc,
                     Nseq=Nseq, Fe=Fe, Ce=Ce, gridsearch=False)
    mat_ml.export_MLparam(__file__, path=HERE)
    print(f'{name}: {len(np.asarray(mat_ml._svc.dual_coef))} support '
          f'vectors -> abq_{mat_ml.name}-svm.csv')
    return mat_ml


def main():
    mat_j2 = FE.Material(name='J2-reference')
    mat_j2.elasticity(E=E, nu=NU)
    mat_j2.plasticity(sy=60., sdim=6)
    train_and_export('ML-J2', mat_j2)

    mat_h = FE.Material(name='Hill-reference')
    mat_h.elasticity(E=E, nu=NU)
    mat_h.plasticity(sy=50., rv=[1.2, 1.0, 0.8, 1.0, 1.0, 1.0], sdim=6)
    train_and_export('ML-Hill-p1', mat_h)

    mat_gb = FE.Material(name='Barlat-Goss')
    mat_gb.elasticity(E=E, nu=NU)
    mat_gb.plasticity(sy=50., barlat=BARLAT_GOSS, barlat_exp=8, sdim=6)
    # Barlat locus has no analytic yield stresses: root-find them on 300
    # unit load cases and train through the Data pipeline
    N = 300
    su = FE.load_cases(int(N / 3), N - int(N / 3))
    x1 = fsolve(mat_gb.find_yloc, np.ones(N) * 50., args=(su,), xtol=1.e-5)
    db = FE.Data(su * x1[:, None], name='Goss-Barlat-yield-stresses',
                 sdim=6)
    db.mat_data['elast_const'] = mat_gb.CV
    mat_ml = FE.Material(name=f'ML-Goss-Barlat_C{C:.0f}_G{GAMMA * 10:.0f}')
    mat_ml.from_data(db.mat_data)
    mat_ml.train_SVC(C=C, gamma=GAMMA, Nseq=25, Fe=0.3, Ce=0.95)
    mat_ml.dev_only = False
    mat_ml.export_MLparam(__file__, path=HERE)
    print(f'ML-Goss-Barlat: {len(np.asarray(mat_ml._svc.dual_coef))} '
          f'support vectors -> abq_{mat_ml.name}-svm.csv')


if __name__ == '__main__':
    main()
