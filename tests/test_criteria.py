"""Yield-criterion coverage: Tresca, Barlat, Drucker-Prager and LHS
tension/compression asymmetry, plus material serialization."""
import os

import numpy as np
from scipy.optimize import fsolve

import pylabfea_tpu as FE


def test_tresca_seq():
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., tresca=True, sdim=3)
    # uniaxial: Tresca seq = |s1 - s3| = s1
    assert abs(mat.calc_seq(np.array([100., 0., 0.])) - 100.) < 1e-12
    # pure shear in principal space: seq = s1 - s3 = 2 tau
    assert abs(mat.calc_seq(np.array([50., 0., -50.])) - 100.) < 1e-12
    # yield function
    assert abs(mat.calc_yf(np.array([80., 0., 0.])) + 20.) < 1e-12


def test_drucker_asymmetry():
    """Drucker term adds hydrostatic sensitivity: tension yields earlier
    than compression for positive drucker parameter."""
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., drucker=0.2, sdim=3)
    st = np.array([100., 0., 0.])
    seq_t = mat.calc_seq(st)
    seq_c = mat.calc_seq(-st)
    assert seq_t > seq_c
    assert abs(seq_t - (100. + 0.2 * 100. / 3.)) < 1e-10
    # gradient includes the hydrostatic contribution
    g = mat.calc_fgrad(np.array([[100., 0., 0.]]))
    assert abs(np.sum(g) - 0.2) < 1e-10  # trace of gradient = drucker


def test_lhs_asymmetry():
    """LHS (Liu-Huang-Stout) anisotropic tension/compression asymmetry.
    (The reference's calc_seq crashes on LHS arrays — `if self.lhs:` on an
    array, material.py:646 — implemented here as intended.)"""
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., hill=[0.9, 1., 1.1], lhs=[0.3, 0., 0.], sdim=3)
    sx = np.array([100., 0., 0.])
    sy_ = np.array([0., 100., 0.])
    # asymmetry acts on the x-component only
    assert mat.calc_seq(sx) - mat.calc_seq(-sx) > 5.
    assert abs(mat.calc_seq(sy_) - mat.calc_seq(-sy_)) < 1e-10


def test_barlat_goss_seq():
    """Barlat Yld2004-18p: isotropic parameter set reduces to J2-like
    behavior; anisotropic set produces direction-dependent yield."""
    iso18 = [1.] * 18
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., barlat=iso18, barlat_exp=8, sdim=6)
    s_uni = np.array([100., 0., 0., 0., 0., 0.])
    seq_uni = mat.calc_seqB(s_uni)
    # isotropic Yld2004-18p with unit coefficients: uniaxial seq == |s|
    assert abs(seq_uni - 100.) < 1.
    # batch evaluation consistent with scalar
    batch = np.stack([s_uni, 2 * s_uni])
    np.testing.assert_allclose(mat.calc_seqB(batch),
                               [seq_uni, 2 * seq_uni], rtol=1e-12)
    # calc_seq dispatches to Barlat
    assert abs(mat.calc_seq(s_uni) - seq_uni) < 1e-12


def test_barlat_yield_stresses_anisotropic():
    BAR = [0.81766901, -0.36431565, 0.31238124, 0.84321164, -0.01812166,
           0.8320893, 0.35952332, 0.08127502, 1.29314957, 1.0956107,
           0.90916744, 0.27655112, 1.090482, 1.18282173, -0.01897814,
           0.90539357, 1.88256105, 0.8786101]
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=50., barlat=BAR, barlat_exp=8, sdim=6)
    sux = np.array([[1., 0., 0., 0., 0., 0.]])
    suy = np.array([[0., 1., 0., 0., 0., 0.]])
    yx = fsolve(mat.find_yloc, np.array([50.]), args=(sux,), xtol=1e-6)[0]
    yy = fsolve(mat.find_yloc, np.array([50.]), args=(suy,), xtol=1e-6)[0]
    assert yx > 0 and yy > 0
    assert abs(yx - yy) > 0.5  # anisotropy visible


def test_pickle_roundtrip(tmp_path):
    mat = FE.Material('pkl-test')
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., hill=[0.9, 1., 1.1], khard=500., sdim=6)
    mat.pckl(name='m.pkl', path=str(tmp_path))
    back = FE.pickle2mat('m.pkl', path=str(tmp_path))
    assert back.sy == mat.sy
    np.testing.assert_array_equal(back.hill, mat.hill)
    s = np.array([80., -10., 5., 3., 0., -2.])
    assert abs(back.calc_seq(s) - mat.calc_seq(s)) < 1e-14


def test_pickled_ml_material_roundtrip(tmp_path):
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=100., sdim=6)
    mat = FE.Material('mlpkl')
    mat.dev_only = False
    mat.train_SVC(C=10, gamma=2.5, mat_ref=ref, Nlc=40, Nseq=4)
    mat.pckl(name='ml.pkl', path=str(tmp_path))
    back = FE.pickle2mat('ml.pkl', path=str(tmp_path))
    sig = FE.load_cases(0, 20) * 95.
    np.testing.assert_allclose(back.calc_yf(sig), mat.calc_yf(sig),
                               atol=1e-12)
