"""Direct unit coverage of host Material methods that the rest of the
suite only exercises indirectly (through response/train_SVC): the flow
rule, consistent tangent, scalar locus distance, SVC feature construction,
texture mixing and the dispatching trainer.  Semantics follow the
reference contracts (material.py:1009-1086, 518-574, 2301-2368,
2705-2766, 1091-1107)."""
import numpy as np
import pytest
import matplotlib

matplotlib.use('Agg')

import pylabfea_tpu as FE
from pylabfea_tpu.core.tensors import eps_eq, yf_tolerance


def _hill_mat(khard=300.):
    mat = FE.Material('hill')
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., hill=[1.2, 0.9, 1.05, 1., 1., 1.],
                   khard=khard, sdim=6)
    return mat


def test_epl_dot_matches_crisfield_closed_form():
    """epl_dot = (a'C deps / (a'Ca + khard)) a for a yielding state, and
    exactly zero below yield (reference material.py:1009-1055)."""
    mat = _hill_mat()
    Cel = mat.CV
    sig = np.zeros(6)
    sig[0] = 151.  # just at the uniaxial-x locus (seq ~ sqrt(1.05)*151)
    su = sig / np.linalg.norm(sig)
    # place the state exactly on the locus along x
    from scipy.optimize import fsolve
    x = fsolve(mat.find_yloc, np.array([150.]), args=(su[None, :],),
               xtol=1e-10)[0]
    sig = x * su
    deps = np.zeros(6)
    deps[0] = 1.e-4
    pdot = mat.epl_dot(sig, np.zeros(6), Cel, deps)
    a = mat.calc_fgrad(sig)
    ca = Cel @ a
    lam = (ca @ deps) / (a @ ca + mat.khard)
    np.testing.assert_allclose(pdot, lam * a, rtol=1e-12)
    # plastic volume preserved (associated Hill flow is deviatoric)
    assert abs(pdot[:3].sum()) < 1e-12 * np.abs(pdot).max()
    # elastic state: zero increment
    pdot0 = mat.epl_dot(0.1 * sig, np.zeros(6), Cel, deps)
    np.testing.assert_array_equal(pdot0, np.zeros(6))


def test_c_tan_consistent_tangent_properties():
    """Ct = C - (Ca x Ca)/(a'Ca + khard): symmetric, softer than C along
    the flow direction by the khard/(a'Ca + khard) factor (reference
    material.py:1057-1086)."""
    mat = _hill_mat(khard=500.)
    Cel = mat.CV
    sig = np.zeros(6)
    sig[0] = 160.
    Ct = mat.C_tan(sig, Cel)
    np.testing.assert_allclose(Ct, Ct.T, atol=1e-8)
    a = mat.calc_fgrad(sig)
    ca = Cel @ a
    expected = Cel - np.outer(ca, ca) / (a @ ca + mat.khard)
    np.testing.assert_allclose(Ct, expected, rtol=1e-12)
    # a' Ct a = khard * a'Ca / (a'Ca + khard)
    np.testing.assert_allclose(
        a @ Ct @ a, mat.khard * (a @ ca) / (a @ ca + mat.khard),
        rtol=1e-10)


def test_find_yloc_scalar_matches_vector_version():
    mat = _hill_mat()
    su = np.array([[0.7, -0.3, 0., 0.2, 0., 0.]])
    su /= np.linalg.norm(su)
    for x in (50., 150., 250.):
        np.testing.assert_allclose(
            mat.find_yloc_scalar(x, su),
            mat.find_yloc(np.array([x]), su)[0], rtol=1e-12)


def test_create_scaled_input_stress_only():
    """Stress-only SVC features are sig/scale_seq (reference
    material.py:2301-2368)."""
    ref = _hill_mat()
    mat = FE.Material('ML')
    mat.train_SVC(C=4., gamma=1.5, mat_ref=ref, Nlc=60, Nseq=4)
    sig = np.array([[30., -20., 0., 5., 0., 0.],
                    [100., 0., 0., 0., 0., 0.]])
    x = mat.create_scaled_input(sig)
    assert x.shape == (2, mat.Ndof)
    np.testing.assert_allclose(x[:, :6], sig / mat.scale_seq, rtol=1e-12)
    # and the decision function through calc_yf consumes exactly these
    np.testing.assert_allclose(
        mat.calc_yf(sig), mat.svm_yf.decision_function(x), rtol=1e-10)


def test_setup_yf_SVM_dispatch_6d():
    """The dispatcher routes sdim=6 data to the 6-D trainer and returns
    the train score; the trained SVC classifies the bands correctly."""
    ref = _hill_mat()
    mat = FE.Material('ML6')
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., sdim=6)
    # the reference contract: the caller (train_SVC) sets the feature
    # dimensionality and stress scale before the raw trainer runs
    # (reference material.py:1121 — x is documented as (N, self.Ndof))
    mat.Ndof = 6
    mat.scale_seq = 150.
    # labeled +-1 data on scaled Hill locus stresses
    from pylabfea_tpu.training import load_cases
    sunit = load_cases(number_3d=0, number_6d=80)
    from scipy.optimize import fsolve
    x1 = fsolve(ref.find_yloc, 150. * np.ones(len(sunit)),
                args=(sunit,), xtol=1e-6)
    sig_y = sunit * x1[:, None]
    xtr = np.vstack([0.6 * sig_y, 1.4 * sig_y])
    ytr = np.hstack([-np.ones(len(sig_y)), np.ones(len(sig_y))])
    score = mat.setup_yf_SVM(xtr, ytr, C=8., gamma=2.0)
    assert score[0] > 0.95
    yf_in = mat.calc_yf(0.6 * sig_y[:5])
    yf_out = mat.calc_yf(1.4 * sig_y[:5])
    assert np.all(yf_in < 0.) and np.all(yf_out > 0.)


def test_set_texture_interpolates_yield_strength():
    """set_texture re-interpolates sy from the assigned microstructure
    sets (reference material.py:2705-2766): pure set -> that set's sy_av;
    out-of-range or wrong-dimension mixtures raise."""
    import pytest
    mat = FE.Material('tex')
    mat.msparam = [{'texture': np.array([0., 0.5, 1.]), 'sy_av': 100.},
                   {'texture': np.array([0., 0.5, 1.]), 'sy_av': 200.}]
    mat.Nset = 2
    mat.set_texture([1., 0.])
    assert np.isclose(mat.sy, 100.)
    mat.set_texture([0., 1.])
    assert np.isclose(mat.sy, 200.)
    mat.set_texture([0.25, 0.25])
    assert np.isclose(mat.sy, 150.)
    with pytest.raises(ValueError):
        mat.set_texture([0.8, 0.8])   # sum > 1
    with pytest.raises(ValueError):
        mat.set_texture([1.0])        # wrong dimension


def test_plot_data_smoke():
    """plot_data draws the decision field + contour on given axes."""
    import matplotlib.pyplot as plt
    ref = _hill_mat()
    mat = FE.Material('MLp')
    mat.train_SVC(C=4., gamma=1.5, mat_ref=ref, Nlc=40, Nseq=3)
    ngrid = 12
    xx, yy = np.meshgrid(np.linspace(-1, 1, ngrid),
                         np.linspace(0, 2, ngrid))
    Z = np.sin(xx * np.pi) * (yy - 1.)
    fig, axs = plt.subplots(1, 1)
    line = mat.plot_data(Z, axs, xx, yy, field=True)
    assert line is not None
    plt.close(fig)


def test_gridsearch_texture_warns_on_ignored_x():
    """GridSearchCVTexture accepts ``x`` for reference-API compatibility
    but regenerates the training data per fold from msparam — passing a
    pre-assembled array must warn UNCONDITIONALLY (not only when verbose);
    x=None stays silent."""
    import warnings
    mat = FE.Material('tex-gs')
    calls = {}

    def stub(self=mat, **kw):
        calls.update(kw)
        return (1.0, 1.0)

    mat._train_svc_texture_gridsearch = stub
    with pytest.warns(UserWarning, match='ignored'):
        mat.GridSearchCVTexture(np.zeros((4, 3)), {'C': [2.], 'gamma': [1.]},
                                n_splits=2, verbose=False)
    assert calls['cvals'] == [2.]
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        mat.GridSearchCVTexture(None, {'C': [2.], 'gamma': [1.]},
                                n_splits=2, verbose=False)
