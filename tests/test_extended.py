"""Extended coverage: 1-D models, quadratic elements, SVC Hessian, SVR
gradients (ML_grad), texture-conditioned training, and solver resume."""
import numpy as np
import pytest

import pylabfea_tpu as FE


def _two_mats():
    mat1 = FE.Material()
    mat1.elasticity(E=100.e3, nu=0.3)
    mat2 = FE.Material()
    mat2.elasticity(E=300.e3, nu=0.3)
    return mat1, mat2


def test_1d_bar_linear():
    """3-section 1-D bar: golden value captured from the reference (the 1-D
    element acts with the confined modulus C11)."""
    mat1, mat2 = _two_mats()
    fe = FE.Model(dim=1)
    fe.geom([2., 1., 2.])
    fe.assign([mat1, mat2, mat1])
    fe.bcleft(0.)
    fe.bcright(0.01 * fe.lenx, 'disp')
    fe.mesh(NX=10)
    fe.solve()
    fe.calc_global()
    assert abs(fe.glob['sig'][0] - 1553.2544378698224) < 1e-8
    assert abs(fe.glob['ebc1'] - 0.01) < 1e-12


def test_1d_bar_quadratic():
    mat1, mat2 = _two_mats()
    fe = FE.Model(dim=1)
    fe.geom([2., 1., 2.])
    fe.assign([mat1, mat2, mat1])
    fe.bcleft(0.)
    fe.bcright(0.01 * fe.lenx, 'disp')
    fe.mesh(NX=10, SF=2)
    fe.solve()
    fe.calc_global()
    assert abs(fe.glob['sig'][0] - 1553.2544378698228) < 1e-8


def test_solver_resume():
    """Successive solve() calls continue loading (BC memory)."""
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom([2.], LY=2.)
    fe.assign([mat])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(0.001 * fe.leny, 'disp')
    fe.mesh(NX=4, NY=4)
    fe.solve()
    s1 = fe.glob['sig'][1]
    fe.bctop(0.002 * fe.leny, 'disp')  # double the load, resume
    fe.solve()
    fe.calc_global()
    assert abs(fe.glob['sig'][1] - 2. * s1) < 1e-6 * abs(s1) + 1e-8


@pytest.fixture(scope="module")
def svc6(tmp_path_factory):
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=100., sdim=6)
    mat = FE.Material('mlj2')
    mat.dev_only = False
    mat.train_SVC(C=10, gamma=2.5, mat_ref=ref, Nlc=120, Nseq=10)
    return mat


def test_calc_hessian_finite_difference(svc6):
    """SVC Hessian: matches finite differences of the gradient up to the
    reference scaling convention (material.py:962 divides the feature-space
    Hessian by scale_seq once, so H_ref = scale_seq * d^2f/dsig^2)."""
    rng = np.random.default_rng(8)
    sig = rng.normal(0., 50., (4, 6))
    H = svc6.calc_hessian(sig) / svc6.scale_seq
    eps = 1e-4
    for i in range(4):
        for k in range(6):
            dp = sig[i].copy()
            dm = sig[i].copy()
            dp[k] += eps
            dm[k] -= eps
            gp = svc6.calc_fgrad(dp)
            gm = svc6.calc_fgrad(dm)
            fd = (gp - gm) / (2 * eps)
            np.testing.assert_allclose(H[i, :, k], fd, rtol=5e-3, atol=1e-9)


def test_fgrad_matches_decision_gradient(svc6):
    """calc_fgrad (ML path) == numerical gradient of calc_yf."""
    rng = np.random.default_rng(13)
    sig = rng.normal(0., 60., (3, 6))
    g = svc6.calc_fgrad(sig)
    eps = 1e-5
    for i in range(3):
        for k in range(6):
            dp = sig[i].copy()
            dm = sig[i].copy()
            dp[k] += eps
            dm[k] -= eps
            fd = (svc6.calc_yf(dp) - svc6.calc_yf(dm)) / (2 * eps)
            assert abs(g[i, k] - fd) < 1e-6


def _wh_matdata(sy=100., khard=500., Nlc=60, Np=4, epl_max=0.02):
    from scipy.optimize import fsolve
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=sy, khard=khard, sdim=6)
    su = FE.load_cases(int(Nlc / 3), Nlc - int(Nlc / 3))
    sig_list, epl_list = [], []
    for peeq in np.linspace(epl_max / Np, epl_max, Np):
        ep_t = peeq * np.array([1., -0.5, -0.5, 0., 0., 0.])
        x1 = fsolve(ref.find_yloc, np.ones(Nlc) * ref.get_sflow(peeq),
                    args=(su, ep_t), xtol=1.e-5)
        sig = su * x1[:, None]
        a = ref.calc_fgrad(sig)
        eeq = FE.eps_eq(a)
        epl = a / np.where(eeq < 1e-12, 1., eeq)[:, None] * peeq
        sig_list.append(sig)
        epl_list.append(epl)
    sig = np.vstack(sig_list)
    epl = np.vstack(epl_list)
    return ref, {
        'sdim': 6, 'Nlc': Nlc, 'Ncyl': 0, 'Ntext': 1, 'wh_data': True,
        'tx_data': False, 'epc': 0.0,
        'peeq_max': float(FE.eps_eq(epl).max()), 'sy_av': float(sy),
        'elast_const': ref.CV, 'flow_stress': sig, 'plastic_strain': epl,
        'tx_descriptor': 'GSH_3', 'texture': np.zeros(1), 'tdim': 0,
    }


def test_work_hardening_training_and_khard():
    """ML material with work-hardening dofs: flow stress grows with PEEQ and
    calc_fgrad extracts a positive hardening rate."""
    from scipy.optimize import fsolve
    ref, md = _wh_matdata(khard=2000., Nlc=120, Np=6)
    mat = FE.Material('ML-wh')
    mat.from_data(md)
    assert mat.whdat and mat.Ndof == 15
    mat.train_SVC(C=10, gamma=1., Nseq=4, Fe=0.7, Ce=0.95)
    # evaluate along load cases with FLOW-ALIGNED plastic strain tensors
    # (the training data pairs each flow stress with its own flow direction)
    su = FE.load_cases(0, 8)
    a = ref.calc_fgrad(su * 100.)
    dirs = a / FE.eps_eq(a)[:, None]
    seqs = []
    for pe in (0.002, 0.015):
        vals = []
        for i in range(len(su)):
            x = fsolve(mat.find_yloc, np.array([ref.get_sflow(pe)]),
                       args=(su[i][None, :], pe * dirs[i]), xtol=1e-5)
            vals.append(FE.sig_eq_j2(su[i] * x[0]))
        seqs.append(np.mean(vals))
    assert seqs[1] > seqs[0] + 2.  # hardening visible in the ML locus
    # khard extraction through the SVC gradient
    sig = su[:8] * 105.
    epl = 0.005 * np.tile([1., -.5, -.5, 0., 0., 0.], (8, 1))
    mat.calc_fgrad(sig, epl=epl)
    assert mat.khard >= 0.


def test_setup_fgrad_svm():
    """SVR-regressed gradients (ML_grad path) approximate flow directions."""
    ref, md = _wh_matdata()
    mat = FE.Material('ML-svr')
    mat.from_data(md)
    mat.train_SVC(C=10, gamma=2.5, Nseq=3, Fe=0.7, Ce=0.95)
    mat.setup_fgrad_SVM()
    assert mat.ML_grad
    sig = md['flow_stress'][:5]
    epl = md['plastic_strain'][:5]
    g = mat.calc_fgrad(sig, epl=epl)
    ref_dir = epl / FE.eps_eq(epl)[:, None]
    # directions roughly align with normalized plastic strains
    cos = np.sum(g * ref_dir, axis=1) / (
        np.linalg.norm(g, axis=1) * np.linalg.norm(ref_dir, axis=1))
    assert cos.min() > 0.8


def _texture_matdata(tex_vec, sy):
    from scipy.optimize import fsolve
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=sy, sdim=6)
    Nlc = 40
    su = FE.load_cases(int(Nlc / 3), Nlc - int(Nlc / 3))
    x1 = fsolve(ref.find_yloc, np.ones(Nlc) * sy, args=(su,), xtol=1.e-5)
    return {
        'sdim': 6, 'Nlc': Nlc, 'Ncyl': 0, 'Ntext': 1, 'wh_data': False,
        'tx_data': True, 'epc': 0.002, 'peeq_max': 0.01, 'sy_av': float(sy),
        'elast_const': ref.CV, 'sig_ideal': su * x1[:, None],
        'tx_descriptor': 'GSH_3', 'texture': np.asarray(tex_vec),
        'tdim': 3,
    }


def test_texture_conditioned_training():
    """Multiple textures as feature dimensions: one SVC learns several loci
    (exercises txdat, StandardScaler features, ind_tx bookkeeping)."""
    mds = [_texture_matdata([0.1, 0.0, 0.0], 80.),
           _texture_matdata([0.0, 0.2, 0.0], 100.),
           _texture_matdata([0.0, 0.0, 0.3], 120.)]
    mat = FE.Material('ML-texture')
    mat.from_data(mds)
    assert mat.txdat and mat.Nset == 3 and mat.Ndof == 9
    train_sc, _ = mat.train_SVC(C=10, gamma=1., Nseq=2, Fe=0.8, Ce=0.95)
    assert train_sc > 95.
    # yield classification must depend on the texture features
    s = np.array([[90., 0., 0., 0., 0., 0.]])
    f_soft = mat.calc_yf(s, tex=np.array([0.1, 0.0, 0.0]))
    f_hard = mat.calc_yf(s, tex=np.array([0.0, 0.0, 0.3]))
    assert f_soft > f_hard  # 90 MPa is beyond sy=80 but below sy=120


def test_test_data_generation():
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=100., sdim=6)
    mat = FE.Material('gen')
    xt, yt = mat.test_data_generation(Nlc=30, Nseq=5, mat_ref=ref)
    assert xt.shape == (30 * 10, 6)
    assert set(np.unique(yt)) == {-1., 1.}
