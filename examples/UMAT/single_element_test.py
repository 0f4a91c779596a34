"""Single-element UMAT property test (femBlock-equivalent).

Trains an ML yield function, exports its parameters in the Abaqus-readable
CSV contract, then drives the *native C++ kernel* (``native/ml_umat.cpp``,
same props/statev layout as the Fortran UMAT) through uniaxial tension at a
sweep of in-plane load angles — the workflow the reference runs through
Abaqus (examples/UMAT/calc_properties.py), here with the standalone kernel.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import pylabfea_tpu as FE  # noqa: E402
from pylabfea_tpu.utils.native import NativeMLMaterial  # noqa: E402


def train_and_export(path):
    mat_h = FE.Material(name='Hill-p1')
    mat_h.elasticity(E=200.e3, nu=0.3)
    mat_h.plasticity(sy=150., hill=[1.2, 1., 0.8, 1., 1., 1.], sdim=6)
    mat_ml = FE.Material('ML-Hill-p1')
    mat_ml.dev_only = False
    mat_ml.train_SVC(C=15, gamma=2.5, mat_ref=mat_h, Nlc=300, Nseq=25,
                     Fe=0.3, Ce=0.95)
    mat_ml.export_MLparam(os.path.basename(__file__),
                          file='ML-Hill-p1', path=path)
    return mat_ml, os.path.join(path, 'ML-Hill-p1-svm.csv')


def drive_uniaxial(nm, angle, eps_max=0.02, nsteps=100):
    """Strain-controlled uniaxial tension rotated by ``angle`` in the
    x-y plane; returns (eps_axial, sig_axial) curves."""
    c, s = np.cos(angle), np.sin(angle)
    # axial unit strain rotated into the x-y plane (Voigt, eng. shear)
    de_ax = np.array([c * c, s * s, 0., 0., 0., 2. * s * c]) * eps_max / nsteps
    nu = 0.3
    de_lat = np.array([-nu * (c * c), -nu * (s * s), -nu, 0., 0.,
                       -2. * nu * s * c]) * eps_max / nsteps
    stress = np.zeros(6)
    statev = np.zeros(14)
    eps_hist, sig_hist = [0.], [0.]
    for k in range(nsteps):
        deps = de_ax + de_lat
        fy, stress, statev, dd = nm.step(stress, statev, deps,
                                         max_substeps=20)
        eps_hist.append((k + 1) * eps_max / nsteps)
        # axial stress = n^T sig n with n = (c, s, 0)
        sig_ax = (stress[0] * c * c + stress[1] * s * s
                  + 2. * stress[5] * s * c)
        sig_hist.append(sig_ax)
    return np.array(eps_hist), np.array(sig_hist), statev


def main():
    os.makedirs('models', exist_ok=True)
    mat_ml, csv = train_and_export('models/')
    nm = NativeMLMaterial(csv)
    print(f'native kernel loaded: {int(nm.props[0])} support vectors')
    for deg in (0., 30., 45., 60., 90.):
        ang = np.deg2rad(deg)
        eps, sig, statev = drive_uniaxial(nm, ang)
        print(f'angle {deg:5.1f} deg: axial stress @2% {sig[-1]:8.2f} MPa (strain-controlled), '
              f'PEEQ {statev[6]:.5f}')
    return nm


if __name__ == '__main__':
    main()
