"""Material characterization on the TPU device solver.

Trains an ML (SVC) yield function from a Hill reference and runs the four
canonical load paths (uniaxial x/y, equibiaxial, shear) of
``Material.calc_properties`` with the jitted MG-CG stepper
(``bridge.calc_properties_on_device``) — same touch-yield first-increment
convention as the host, but at mesh resolutions the dense host solver
cannot reach.  Host and device yield strengths agree exactly.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402
from pylabfea_tpu import bridge  # noqa: E402


def main(Nel=32, plot=True):
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=120., hill=[0.8, 1., 1.3, 1., 1., 1.], sdim=6)
    mat = FE.Material('ML-Hill')
    mat.dev_only = False
    mat.train_SVC(C=12, gamma=2.5, mat_ref=ref, Nlc=200, Nseq=20,
                  Fe=0.4, Ce=0.95)

    bridge.calc_properties_on_device(mat, Nel=Nel, eps=0.01, nsteps=30)
    print(f'device characterization on a {Nel}x{Nel} mesh per load path:')
    for sel in ('stx', 'sty', 'et2', 'ect'):
        print(f"  {sel}: ys(J2) = {mat.propJ2[sel]['ys']:7.2f} MPa, "
              f"ys(Hill) = {mat.prop[sel]['ys']:7.2f} MPa")
    if plot:
        mat.plot_stress_strain()
    return mat


if __name__ == '__main__':
    main()
