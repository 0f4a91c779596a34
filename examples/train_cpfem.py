"""CPFEM data-driven ML material: read a micromechanical JSON database,
define a material from it, train the SVC with work-hardening features, and
score it on scaled test stresses — workflow of the reference
examples/Train_CPFEM/train_cpfem.py."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import pylabfea_tpu as FE  # noqa: E402

DATA = os.environ.get(
    'CPFEM_DATA',
    '/root/reference/examples/Train_CPFEM/Data_Random_Texture_Test.json')


def main(plot=False):
    if not os.path.exists(DATA):
        print(f'dataset not found: {DATA} — set CPFEM_DATA')
        return None
    db = FE.Data(DATA, epl_crit=2.e-3, epl_start=1.e-3, epl_max=0.03,
                 depl=1.e-3, wh_data=True)
    mat_ml = FE.Material(db.mat_data['Name'], num=1)
    mat_ml.from_data(db.mat_data)
    train_sc, _ = mat_ml.train_SVC(C=4, gamma=0.5, Fe=0.7, Ce=0.9, Nseq=2,
                                   plot=False)
    print(f'SVC training score: {train_sc:.2f}%')

    # score on scaled flow stresses (elastic x0.5..0.99, plastic x1.01..1.5)
    ts_sig, epl_tot, yf_ref = FE.create_test_sig(DATA)
    yf_ml = np.array([mat_ml.calc_yf(s, epl=e)
                      for s, e in zip(ts_sig[::20], epl_tot[::20])])
    mae, precision, accuracy, recall, f1, mcc = \
        FE.training_score(yf_ref[::20], yf_ml, plot=False)
    print(f'test accuracy: {accuracy:.3f}, MCC: {mcc:.3f}')
    if plot:
        db.plot_stress_strain(epc=db.mat_data['epc'])
    return mat_ml


if __name__ == '__main__':
    main(plot='--plot' in sys.argv)
