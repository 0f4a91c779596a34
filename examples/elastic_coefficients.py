"""Elastic-stiffness identification from micromechanical data — workflow of
the reference examples/Train_CPFEM/elastic_coefficients.py: read a CPFEM
test database, fit the full anisotropic stiffness tensor C from the elastic
portions of all load cases (``get_elastic_coefficients``), and compare
predicted vs. actual stresses component by component.

Uses the reference's bundled CPFEM dataset when mounted; otherwise a
synthetic elastic dataset with a known C, so the example is self-contained.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402

REF_DATA = ('/root/reference/examples/Train_CPFEM/'
            'Data_Random_Texture_Test.json')


def synthetic_pairs(n=200, seed=12345):
    """Elastic strain/stress pairs from a known cubic stiffness + noise."""
    C = np.zeros((6, 6))
    C11, C12, C44 = 170.e3, 124.e3, 75.e3
    C[:3, :3] = C12
    np.fill_diagonal(C[:3, :3], C11)
    np.fill_diagonal(C[3:, 3:], C44)
    rng = np.random.default_rng(seed)
    eps = rng.normal(scale=1.e-3, size=(n, 6))
    sig = eps @ C.T * (1. + rng.normal(scale=1.e-3, size=(n, 6)))
    return eps, sig, C


def main(plot=True):
    if os.path.exists(REF_DATA):
        db = FE.Data(REF_DATA, epl_crit=2.e-3, epl_start=1.e-3,
                     epl_max=0.03, wh_data=True)
        strain = np.asarray(db.mat_data['elstrain'])
        stress = np.asarray(db.mat_data['elstress'])
        C = np.asarray(db.mat_data['elast_const'])
        C_true = None
    else:
        print('reference dataset not mounted - using synthetic elastic data')
        strain, stress, C_true = synthetic_pairs()
        C = FE.get_elastic_coefficients(strain, stress)

    assert len(stress) == len(strain)
    print('fitted stiffness C11, C12, C44 =',
          np.round([C[0, 0], C[0, 1], C[3, 3]], 1), 'MPa')
    if C_true is not None:
        err = np.max(np.abs(C - C_true)) / np.max(np.abs(C_true))
        print(f'max relative error vs known C: {err:.2e}')

    predicted = strain @ C.T
    rms = np.sqrt(np.mean((predicted - stress) ** 2))
    print(f'stress prediction RMS residual: {rms:.3f} MPa '
          f'over {len(stress)} states')

    if plot:
        import matplotlib.pyplot as plt
        names = ['S11', 'S22', 'S33', 'S23', 'S13', 'S12']
        fig, axes = plt.subplots(2, 3, figsize=(15, 10))
        for i, ax in enumerate(axes.flatten()):
            ax.scatter(stress[:, i], predicted[:, i], alpha=0.5, s=8)
            lo, hi = stress[:, i].min(), stress[:, i].max()
            ax.plot([lo, hi], [lo, hi], 'k--')
            ax.set_xlabel(f'actual {names[i]} (MPa)')
            ax.set_ylabel(f'predicted {names[i]} (MPa)')
            ax.grid(True)
        plt.tight_layout()
        plt.show()
    return C


if __name__ == '__main__':
    main()
