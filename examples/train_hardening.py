"""Train an ML yield function with work-hardening feature dimensions from a
synthetic dataset (flow stresses at increasing plastic strain), then
reconstruct stress-strain curves via yield-locus root finding — workflow of
the reference examples/train_hardening.py."""
import os
import sys

import numpy as np
from scipy.optimize import fsolve

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402


def create_data(mat_ref, Nlc=120, epl_max=0.02, Np=6):
    """Synthetic work-hardening dataset: flow stresses on a sequence of
    expanding yield loci with associated plastic strain tensors."""
    su = FE.load_cases(int(Nlc / 3), Nlc - int(Nlc / 3))
    sig_list, epl_list = [], []
    for peeq in np.linspace(epl_max / Np, epl_max, Np):
        sflow = mat_ref.get_sflow(peeq)
        ep_t = peeq * np.array([1., -0.5, -0.5, 0., 0., 0.])
        x1 = fsolve(mat_ref.find_yloc, np.ones(Nlc) * sflow, args=(su, ep_t),
                    xtol=1.e-5)
        sig = su * x1[:, None]
        # associated plastic strain along the J2 flow direction
        a = mat_ref.calc_fgrad(sig)
        eeq = FE.eps_eq(a)
        epl = a / np.where(eeq < 1e-12, 1., eeq)[:, None] * peeq
        sig_list.append(sig)
        epl_list.append(epl)
    return np.vstack(sig_list), np.vstack(epl_list)


def main(plot=False):
    E, nu, sy, khard = 200.e3, 0.3, 100., 500.
    mat_ref = FE.Material(name='J2-hardening-reference')
    mat_ref.elasticity(E=E, nu=nu)
    mat_ref.plasticity(sy=sy, khard=khard, sdim=6)

    sig, epl = create_data(mat_ref)
    peeq = FE.eps_eq(epl)
    print(f'dataset: {len(sig)} flow stresses, PEEQ in '
          f'[{peeq.min():.4f}, {peeq.max():.4f}]')

    # assemble a mat_data dict with work-hardening information
    mat_ml = FE.Material(name='ML-hardening')
    md = {
        'sdim': 6, 'Nlc': 120, 'Ncyl': 0, 'Ntext': 1, 'wh_data': True,
        'tx_data': False, 'epc': 0.0, 'peeq_max': float(peeq.max()),
        'sy_av': float(sy), 'elast_const': mat_ref.CV,
        'flow_stress': sig, 'plastic_strain': epl,
        'tx_descriptor': 'GSH_3', 'texture': np.zeros(1), 'tdim': 0,
    }
    mat_ml.from_data(md)
    train_sc, _ = mat_ml.train_SVC(C=10, gamma=2.5, Nseq=4, Fe=0.7, Ce=0.95)
    print(f'SVC training score: {train_sc:.2f}%')

    # reconstruct flow stresses at several hardening levels via root finding
    theta = np.linspace(-np.pi, np.pi, 12)
    snorm = FE.sig_cyl2princ(np.array([sy * np.ones(12) * np.sqrt(1.5),
                                       theta]).T)
    snorm6 = np.concatenate([snorm, np.zeros_like(snorm)], axis=1)
    for pe in (0.003, 0.01, 0.018):
        epl_t = pe * np.array([1., -0.5, -0.5, 0., 0., 0.])
        x1 = fsolve(mat_ml.find_yloc, np.ones(12), args=(snorm6, epl_t),
                    xtol=1.e-5)
        seq_ml = FE.sig_eq_j2(snorm6 * x1[:, None])
        print(f'PEEQ={pe:.3f}: ML flow stress {seq_ml.mean():8.2f} MPa, '
              f'reference {mat_ref.get_sflow(pe):8.2f} MPa')
    return mat_ml


if __name__ == '__main__':
    main(plot='--plot' in sys.argv)
