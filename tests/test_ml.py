"""ML yield-function regression tests.

Golden values are the reference numerical contract
(pyLabFEA v4.4.2, tests/test_ml.py).
"""
import numpy as np


import pylabfea_tpu as FE


def test_ml_plasticity():
    E, nu, sy = 200.e3, 0.3, 150.
    mat_h = FE.Material(name='anisotropic Hill')
    mat_h.elasticity(E=E, nu=nu)
    mat_h.plasticity(sy=sy, hill=[0.7, 1., 1.4], drucker=0., khard=0., sdim=3)
    mat_ml = FE.Material(name='ML flow rule')
    mat_ml.elasticity(E=E, nu=nu)
    mat_ml.plasticity(sy=sy, sdim=3)
    x_train, y_train = mat_ml.create_sig_data(36, mat_ref=mat_h, extend=True)
    mat_ml.setup_yf_SVM_3D(x_train, y_train, C=10, gamma=4., fs=0.3)
    mat_ml.calc_properties(eps=0.01, sigeps=True, min_step=12)
    assert np.abs(mat_ml.propJ2['stx']['ys'] - 149.62302821433968) < 1e-5
    assert np.abs(mat_ml.propJ2['sty']['seq'][-1] - 157.25971534002542) < 1e-5
    assert np.abs(mat_ml.propJ2['ect']['peeq'][-1] - 0.00855380746615942) < 1e-7


def test_ml_shear():
    E, nu, sy = 200.e3, 0.3, 150.
    hill = [1.4, 1., 0.7, 1.2, .8, 1.]
    mat_h = FE.Material(name='Hill-shear')
    mat_h.elasticity(E=E, nu=nu)
    mat_h.plasticity(sy=sy, hill=hill, sdim=6)
    mat_mlh = FE.Material('Hill-ML')
    mat_mlh.train_SVC(C=2, gamma=0.5, mat_ref=mat_h, Nseq=4, Nlc=300, Fe=0.7,
                      Ce=0.95)
    mat_mlh.dev_only = False

    fem = FE.Model(dim=2, planestress=True)
    fem.geom([2], LY=2.)
    fem.assign([mat_mlh])
    fem.bcbot(0., bctype='disp', bcdir='y')
    fem.bcbot(0., bctype='disp', bcdir='x')
    fem.bcleft(0., bctype='force')
    fem.bcright(0., bctype='force')
    fem.bctop(0.006 * fem.leny, bctype='disp', bcdir='x')
    fem.bctop(0., bctype='disp', bcdir='y')
    fem.mesh(NX=6, NY=3)
    fem.solve()
    fem.calc_global()
    assert np.abs(fem.glob['sig'][5] - 77.53778881971623) < 6e-4
    assert np.abs(fem.element[3].epl[5] - 0.003942707316047761) < 1e-7
    assert np.abs(fem.element[3].sig[1] - 43.9060552472426) < 5e-3


def test_ml_training():
    E, nu, sy = 200000., 0.3, 60.
    mat_J2 = FE.Material(name='J2-reference')
    mat_J2.elasticity(E=E, nu=nu)
    mat_J2.plasticity(sy=sy, sdim=6)
    C, gamma = 15., 2.5
    mat_ml2 = FE.Material('ML-J2_C15_G25')
    mat_ml2.dev_only = False
    mat_ml2.train_SVC(C=C, gamma=gamma, mat_ref=mat_J2, Nlc=150, Nseq=25,
                      Fe=0.1, Ce=0.99)
    mat_ml2.calc_properties(verb=False, eps=0.01, sigeps=True)

    rng = np.random.default_rng(42)
    X1 = rng.normal(loc=sy, scale=10, size=50)
    X2 = rng.normal(loc=sy - 5, scale=10, size=100)
    X3 = rng.normal(loc=sy + 5, scale=10, size=50)
    X = np.concatenate((X1, X2, X3))
    sunittest = FE.load_cases(number_3d=0, number_6d=len(X))
    sig_test = sunittest * X[:, None]
    yf_ml = mat_ml2.calc_yf(sig_test)
    yf_J2 = mat_J2.calc_yf(sig_test)
    mae, precision, accuracy, recall, f1, mcc = \
        FE.training_score(yf_J2, yf_ml, plot=False)
    assert mae < 7.
    assert np.abs(mat_ml2.propJ2['et2']['ys'] - 60.5) < 1.0
    assert np.abs(mat_ml2.propJ2['ect']['peeq'][-1] - 0.00898749114723422) < 2e-6


def test_ml_full_yf_distance():
    """ML yield distance: a stress scaled to 0.5/1.5 sy must produce a
    negative/positive distance of the right magnitude."""
    mat_h = FE.Material(name='J2ref')
    mat_h.elasticity(E=200.e3, nu=0.3)
    mat_h.plasticity(sy=100., sdim=6)
    mat_ml = FE.Material('mlj2')
    mat_ml.dev_only = False
    mat_ml.train_SVC(C=10, gamma=2.5, mat_ref=mat_h, Nlc=150, Nseq=10)
    s_in = np.array([50., 0., 0., 0., 0., 0.])
    s_out = np.array([150., 0., 0., 0., 0., 0.])
    yin = mat_ml.ML_full_yf(s_in)
    yout = mat_ml.ML_full_yf(s_out)
    assert -60. < yin < -40.
    assert 40. < yout < 60.


def test_export_import_MLparam(tmp_path):
    """export_MLparam -> from_MLparam roundtrip preserves the decision fct."""
    mat_h = FE.Material(name='J2ref')
    mat_h.elasticity(E=200.e3, nu=0.3)
    mat_h.plasticity(sy=100., sdim=6)
    mat_ml = FE.Material('mlj2')
    mat_ml.dev_only = False
    mat_ml.train_SVC(C=10, gamma=2.5, mat_ref=mat_h, Nlc=60, Nseq=5)
    mat_ml.export_MLparam('test', file='roundtrip', path=str(tmp_path))
    # CSV has the UMAT layout: 8 comma-separated floats per line
    txt = (tmp_path / 'roundtrip-svm.csv').read_text().strip().splitlines()
    assert all(len(line.split(',')) == 8 for line in txt)
    mat_in = FE.Material('imported')
    mat_in.from_MLparam('roundtrip', path=str(tmp_path))
    sig = FE.load_cases(0, 40) * 95.
    np.testing.assert_allclose(mat_in.calc_yf(sig), mat_ml.calc_yf(sig),
                               atol=1e-10)


def test_reduce_svc_rkhs_bound_and_compression():
    """Reduced-set SVC compression: the reported relative RKHS error must
    bound the decision-function deviation everywhere (K(x,x)=1 for RBF),
    and a trained Hill SVC must compress with the locus preserved."""
    from pylabfea_tpu.ops import svc as svc_ops
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=150., hill=[1.2, 1., 0.8, 1., 1., 1.], sdim=6)
    mat = FE.Material('ML')
    mat.dev_only = False
    mat.train_SVC(C=10, gamma=2.5, mat_ref=ref, Nlc=36, Nseq=25, Fe=0.1)
    full = mat._svc
    nsv_full = len(full.dual_coef)
    a = np.asarray(full.dual_coef)
    Kxx = svc_ops._rbf_kernel(np.asarray(full.support_vectors),
                              np.asarray(full.support_vectors),
                              float(full.gamma))
    wnorm = float(np.sqrt(a @ Kxx @ a))

    red, rel = svc_ops.reduce_svc(full, n_out=nsv_full * 3 // 4)
    assert len(red.dual_coef) == nsv_full * 3 // 4
    # the RKHS bound |f - f~| <= ||w - w~||_H holds at arbitrary states
    rng = np.random.default_rng(7)
    xs = rng.normal(0., 1.2, size=(3000, 6))
    df = np.abs(svc_ops.decision_function(full, xs)
                - svc_ops.decision_function(red, xs))
    assert df.max() <= rel * wnorm * (1. + 1e-6)

    # in-place compression preserves the yield locus: the uniaxial-x
    # yield stress moves by less than 1% of sy
    from scipy.optimize import fsolve
    su = np.array([[1., 0., 0., 0., 0., 0.]])
    x_full = fsolve(mat.find_yloc, np.array([150.]), args=(su,),
                    xtol=1e-4)[0]
    got = mat.compress_svc(nsv=nsv_full * 3 // 4)
    assert got == rel
    assert len(mat._svc.dual_coef) == nsv_full * 3 // 4
    assert mat.svm_yf is None
    x_red = fsolve(mat.find_yloc, np.array([150.]), args=(su,),
                   xtol=1e-4)[0]
    assert abs(x_red - x_full) < 0.01 * 150.

    # the compressed material drops straight into the device path: device
    # yf matches the host decision function on the reduced center set
    import jax.numpy as jnp
    from pylabfea_tpu.ops import constitutive as con
    dm = con.device_material_from(mat, dtype=jnp.float64)
    assert dm.sv.shape[0] == nsv_full * 3 // 4
    sig6 = FE.load_cases(0, 25) * 120.
    f_host = mat.calc_yf(sig6)
    f_dev = np.asarray(con.yf(dm, jnp.asarray(sig6),
                              jnp.zeros(len(sig6))))
    np.testing.assert_allclose(f_dev, f_host, atol=1e-10)
