"""Texture-conditioned ML yield function: one SVC learns the yield loci of
several crystallographic textures, with the texture descriptor (GSH
coefficients) as extra feature dimensions — workflow of the reference
examples/Texture/train_texture.py.

The reference reads CPFFT databases from disk; this example synthesizes
equivalent mat_data sets (each texture = its own yield locus + GSH
descriptor) so it runs self-contained.  Replace ``make_texture_set`` with
``FE.Data(..., tx_data=True, tx_descriptor='GSH_3')`` objects to use real
micromechanical databases.
"""
import os
import sys

import numpy as np
from scipy.optimize import fsolve

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402


def make_texture_set(tex_vec, sy, hill, Nlc=60):
    """mat_data dict for one texture: yield stresses of a Hill locus plus a
    GSH-style descriptor vector."""
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=sy, hill=hill, sdim=6)
    su = FE.load_cases(int(Nlc / 3), Nlc - int(Nlc / 3))
    x1 = fsolve(ref.find_yloc, np.ones(Nlc) * sy, args=(su,), xtol=1.e-5)
    return {
        'sdim': 6, 'Nlc': Nlc, 'Ncyl': 0, 'Ntext': 1, 'wh_data': False,
        'tx_data': True, 'epc': 0.002, 'peeq_max': 0.01, 'sy_av': float(sy),
        'elast_const': ref.CV, 'sig_ideal': su * x1[:, None],
        'tx_descriptor': 'GSH_3', 'texture': np.asarray(tex_vec), 'tdim': 3,
    }


def main(gridsearch=False):
    textures = [
        ([0.25, 0.05, 0.00], 85., [1.3, 1., 0.75, 1., 1., 1.]),   # "Goss"
        ([0.05, 0.30, 0.05], 105., [0.9, 1., 1.1, 1.1, 0.9, 1.]),  # "Copper"
        ([0.00, 0.05, 0.35], 125., [1., 1., 1., 1., 1., 1.]),      # "Random"
        ([0.15, 0.15, 0.10], 95., [1.15, 1., 0.85, 1., 1., 1.]),   # mixed
        ([0.08, 0.22, 0.15], 112., [0.95, 1., 1.05, 1., 1., 1.]),  # mixed
    ]
    sets = [make_texture_set(t, sy, h) for t, sy, h in textures]
    mat = FE.Material('ML-texture')
    mat.from_data(sets)
    print(f'{mat.Nset} textures, feature dimension Ndof = {mat.Ndof}')
    train_sc, test_sc = mat.train_SVC(C=10, gamma=1., Fe=0.8, Ce=0.95,
                                      Nseq=2, gridsearch=gridsearch)
    print(f'training score: {train_sc:.2f}%')

    # query the learned locus per texture along uniaxial x
    s = np.array([[1., 0., 0., 0., 0., 0.]])
    for (tex, sy, _), label in zip(textures, ['Goss', 'Copper', 'Random',
                                              'mix-1', 'mix-2']):
        x = fsolve(lambda t: mat.find_yloc(t, s, tex=np.asarray(tex)),
                   np.array([float(sy)]), xtol=1e-4)
        print(f'{label:7s}: data sy={sy:6.1f}  ML uniax-x yield '
              f'= {x[0]:6.1f} MPa')
    return mat


if __name__ == '__main__':
    main(gridsearch='--gridsearch' in sys.argv)
