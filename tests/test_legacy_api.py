"""Legacy aliases and yield-stress-array ingestion.

The reference exports legacy names (seq_J2, sprinc, sp_cart, svoigt,
s_cyl, sdev — reference basic.py:579-604) and a Data source mode that
takes a bare array of yield-onset stresses (convert_data,
data.py:890-914).  These are the oldest user-facing surfaces; pin them.
"""
import numpy as np
import matplotlib

matplotlib.use('Agg')

import pylabfea_tpu as FE
from pylabfea_tpu.core.tensors import (seq_J2, sprinc, sp_cart, svoigt,
                                       s_cyl, sdev, sig_eq_j2, sig_princ,
                                       sig_cyl2princ, sig_cyl2voigt,
                                       sig_princ2cyl, sig_dev, Stress)


def _rand_sig(n=7, seed=3):
    return np.random.default_rng(seed).normal(0., 80., (n, 6))


def test_legacy_aliases_match_modern_functions():
    sig = _rand_sig()
    np.testing.assert_array_equal(seq_J2(sig), sig_eq_j2(sig))
    sp_a, ev_a = sprinc(sig)
    sp_m, ev_m = sig_princ(sig)
    np.testing.assert_array_equal(sp_a, sp_m)
    np.testing.assert_array_equal(ev_a, ev_m)
    np.testing.assert_array_equal(sdev(sig), sig_dev(sig))
    scyl = sig_princ2cyl(sig)
    np.testing.assert_array_equal(sp_cart(scyl), sig_cyl2princ(scyl))
    np.testing.assert_array_equal(s_cyl(sig), sig_princ2cyl(sig))
    _, evec = sig_princ(sig[0])
    np.testing.assert_array_equal(svoigt(sig_princ2cyl(sig[0]), evec),
                                  sig_cyl2voigt(sig_princ2cyl(sig[0]),
                                                evec))


def test_stress_theta_and_cyl():
    sig = _rand_sig(1)[0]
    st = Stress(sig)
    # theta is the deviatoric polar angle, consistent with the cyl triple
    assert np.isclose(st.theta(), st.cyl()[1])
    assert np.isclose(st.cyl()[0], st.seq_j2())
    assert -np.pi <= st.theta() <= np.pi


def test_data_from_yield_stress_array():
    """Legacy source mode: a bare (Nlc, 6) array of yield-onset stresses
    becomes a trainable mat_data set (convert_data semantics: sy_av =
    mean J2 stress, no elastic constants, no work hardening)."""
    mat_ref = FE.Material('hill-ref')
    mat_ref.elasticity(E=200.e3, nu=0.3)
    mat_ref.plasticity(sy=120., hill=[1.1, 0.95, 1.0, 1., 1., 1.], sdim=6)
    from pylabfea_tpu.training import load_cases
    from scipy.optimize import fsolve
    su = load_cases(number_3d=0, number_6d=40)
    x = fsolve(mat_ref.find_yloc, 120. * np.ones(len(su)), args=(su,),
               xtol=1e-6)
    sig_y = su * x[:, None]

    db = FE.Data(sig_y, mat_name='legacy-array')
    assert db.mat_data['Nlc'] == 40
    assert not db.mat_data['wh_data']
    assert db.mat_data['elast_const'] is None
    assert np.isclose(db.mat_data['sy_av'], np.mean(sig_eq_j2(sig_y)))

    # the set trains an ML yield function end to end (from_data + train)
    mat_ml = FE.Material('ML-from-array')
    mat_ml.elasticity(E=200.e3, nu=0.3)
    mat_ml.from_data(db.mat_data)
    mat_ml.train_SVC(C=6., gamma=2., Nseq=4)
    yf_in = mat_ml.calc_yf(0.5 * sig_y[:5])
    yf_out = mat_ml.calc_yf(1.8 * sig_y[:5])
    assert np.all(yf_in < 0.) and np.all(yf_out > 0.)
