"""Data-import pipeline regression tests.

Golden values were captured by running the reference implementation
(pyLabFEA v4.4.2) on its bundled CPFEM dataset
``examples/Train_CPFEM/Data_Random_Texture_Test.json``; tests are skipped if
that dataset is not available on this machine.
"""
import os

import numpy as np
import pytest

import pylabfea_tpu as FE

DATA = "/root/reference/examples/Train_CPFEM/Data_Random_Texture_Test.json"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference CPFEM dataset not available")


@pytest.fixture(scope="module")
def db():
    return FE.Data(DATA, epl_crit=2.e-3, epl_start=1.e-3, epl_max=0.03,
                   depl=1.e-3, wh_data=True)


def test_parse_data(db):
    assert np.isclose(db.mat_data['sy_av'], 48.62865691296021)
    assert np.isclose(db.mat_data['elast_const'][0, 0], 204210.27708517766)
    assert db.mat_data['Nlc'] == 30
    assert db.mat_data['Ncyl'] == 0
    assert db.mat_data['flow_stress'].shape == (722, 6)
    assert np.isclose(db.mat_data['peeq_max'], 0.027981198759337335)
    np.testing.assert_allclose(
        db.mat_data['flow_stress'][0],
        [-10.89336681, 23.42406082, 4.84583569, 0.88392854, 2.5527153,
         19.29893494], atol=1e-6)
    assert 'Us_A2B1C2D2E1F1_8b46e_5e411_Tx_Rnd' in db.lc_data


def test_ml_data(db):
    mat_ml = FE.Material(db.mat_data['Name'], num=1)
    mat_ml.from_data(db.mat_data)
    assert np.isclose(mat_ml.CV[0, 0], 204210.27708517766)
    train_sc, _ = mat_ml.train_SVC(C=4, gamma=0.5, Fe=0.7, Ce=0.9, Nseq=2,
                                   plot=False)
    assert np.abs(train_sc - 98.9612188365651) < 0.3
    key = 'Us_A2B1C2D2E1F1_8b46e_5e411_Tx_Rnd'
    sig = db.lc_data[key]['Stress'][100]
    epl = db.lc_data[key]['Strain_Plastic'][100]
    vyf = mat_ml.ML_full_yf(sig=sig, epl=epl)
    assert np.abs(vyf - (-3.1624570702600323)) < 1.e-3


def test_elastic_coefficients_identity():
    """Least-squares stiffness fit must recover a known matrix exactly from
    consistent data."""
    rng = np.random.default_rng(11)
    C = np.diag([200., 210., 205., 95., 97., 96.]) * 1e3
    C[0, 1] = C[1, 0] = 105.e3
    C[0, 2] = C[2, 0] = 106.e3
    C[1, 2] = C[2, 1] = 104.e3
    eps = rng.normal(0., 1e-3, (20, 6))
    sig = eps @ C.T
    Cfit = FE.get_elastic_coefficients(list(eps), list(sig))
    np.testing.assert_allclose(Cfit, C, atol=1e-6)


def test_find_transition_index():
    """Bilinear stress curve: transition detected near the knee."""
    e = np.linspace(0., 0.01, 200)
    s = np.where(e < 0.005, 200e3 * e, 1000. + 20e3 * (e - 0.005))
    idx = FE.find_transition_index(s)
    assert 40 <= idx <= 120  # reference returns 52 for this curve


def test_create_test_sig():
    ts_sig, epl_tot, yf_ref = FE.create_test_sig(DATA)
    n = len(ts_sig)
    assert len(epl_tot) == n and len(yf_ref) == n
    assert np.all(yf_ref[:n // 2] == 1) and np.all(yf_ref[n // 2:] == -1)


def test_fit_material_hill_voce_surrogate(db):
    """Data.fit_material returns a ready analytic Material: the Hill+Voce
    surrogate of the database (random texture => near-isotropic hill), on
    the ENGINEERING-convention stiffness refitted from the converted
    pre-yield samples (the stored tensor-convention elast_const is not
    valid for engineering strains)."""
    mat, info = db.fit_material(nsteps=25)
    p = info['params']
    assert 25. < p['sy'] < 60.
    np.testing.assert_allclose(p['hill'], np.ones(6), atol=0.15)
    assert mat.voce_r > 0. and mat.khard >= 0.
    # engineering-convention stiffness: C44 ~ (C11-C12)/2 for the
    # macroscopically isotropic random texture (tensor-fit doubles it)
    C = info['CV']
    ratio = C[3:, 3:].diagonal().mean() / (
        (C[:3, :3].diagonal().mean()
         - (C[:3, :3].sum() - C[:3, :3].diagonal().sum()) / 6.) / 2.)
    assert 0.8 < ratio < 1.25
    assert mat.CV[0, 0] == C[0, 0]
    # the material is usable: uniaxial yield function is negative below
    # and positive above the fitted strength
    su = np.array([1., 0., 0., 0., 0., 0.])
    assert mat.calc_yf(0.5 * p['sy'] * su) < 0. < mat.calc_yf(
        2.0 * p['sy'] * su)
