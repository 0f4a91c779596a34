"""Device-profile tests: jitted kernels vs host parity path, the matrix-free
CG solver vs the dense host solver, and the multi-chip sharded step on the
virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pylabfea_tpu as FE
from pylabfea_tpu.ops import constitutive as con
from pylabfea_tpu.ops import fe_kernels as fek


@pytest.fixture(scope="module")
def hill_mat():
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., hill=[0.7, 1., 1.4, 1., 1.2, 0.8], khard=100.,
                   sdim=6)
    return mat


@pytest.fixture(scope="module")
def svc_mat():
    mat_ml = FE.Material('mlj2')
    mat_ml.dev_only = False
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=100., sdim=6)
    mat_ml.train_SVC(C=10, gamma=2.5, mat_ref=ref, Nlc=60, Nseq=5)
    return mat_ml


def test_device_response_analytic(hill_mat):
    dm = con.device_material_from(hill_mat, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    CV = hill_mat.CV
    sig = rng.normal(0., 50., (64, 6))
    epl = rng.normal(0., 1e-3, (64, 6))
    deps = rng.normal(0., 2e-3, (64, 6))
    fy_h, s_h, dp_h, g_h, _ = hill_mat.response_batch(sig, epl, deps, CV)
    fy_d, s_d, dp_d, g_d = con.response(
        dm, (jnp.asarray(sig), jnp.asarray(epl)), jnp.asarray(deps),
        jnp.asarray(CV))
    np.testing.assert_allclose(np.asarray(fy_d), fy_h, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_d), s_h, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dp_d), dp_h, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_d), g_h, atol=1e-6)


def test_device_response_svc(svc_mat):
    dm = con.device_material_from(svc_mat, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    CV = svc_mat.CV
    sig = rng.normal(0., 40., (32, 6))
    epl = np.zeros((32, 6))
    deps = rng.normal(0., 1.5e-3, (32, 6))
    fy_h, s_h, dp_h, g_h, _ = svc_mat.response_batch(sig, epl, deps, CV)
    fy_d, s_d, dp_d, g_d = con.response(
        dm, (jnp.asarray(sig), jnp.asarray(epl)), jnp.asarray(deps),
        jnp.asarray(CV))
    np.testing.assert_allclose(np.asarray(fy_d), fy_h, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_d), s_h, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dp_d), dp_h, atol=1e-12)


def test_device_svc_inference_matches_host(svc_mat):
    from pylabfea_tpu.ops import svc as svc_ops
    rng = np.random.default_rng(5)
    x = rng.normal(0., 1., (50, 6))
    host = svc_ops.decision_function(svc_mat._svc, x)
    dev = np.asarray(svc_ops.decision_function_jax(svc_mat._svc, x,
                                                   dtype=jnp.float64))
    np.testing.assert_allclose(dev, host, atol=1e-10)
    gh = svc_ops.decision_gradient(svc_mat._svc, x)
    gd = np.asarray(svc_ops.decision_gradient_jax(svc_mat._svc, x,
                                                  dtype=jnp.float64))
    np.testing.assert_allclose(gd, gh, atol=1e-10)


def test_device_solver_vs_host_model():
    """Matrix-free CG device solver tracks the dense host solver on a J2
    uniaxial tension case (different load stepping -> loose tolerance)."""
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., khard=1000., sdim=6)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom([4.], LY=4.)
    fe.assign([mat])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(0.002 * fe.leny, 'disp')
    fe.mesh(NX=16, NY=16)
    fe.solve(min_step=20)

    md = fek.rect_mesh(16, 16, LX=4., LY=4., uniax='y', eps_tot=0.002,
                       dtype=jnp.float64)
    dm = con.device_material_from(mat, dtype=jnp.float64)
    state, hist = fek.solve_uniaxial(md, dm, mat.CV, nsteps=20, n_inner=4,
                                     dtype=jnp.float64)
    gs, ge, gp = hist[-1]
    assert abs(gs[1] - fe.glob['sig'][1]) / abs(fe.glob['sig'][1]) < 5e-3
    assert abs(gp[1] - fe.glob['epl'][1]) / abs(fe.glob['epl'][1]) < 2e-2
    np.testing.assert_allclose(np.asarray(ge), fe.glob['eps'], atol=1e-5)


def test_device_elastic_exactness():
    """Purely elastic case: CG solution matches the dense solve tightly."""
    mat = FE.Material()
    mat.elasticity(E=100.e3, nu=0.3)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom([2.], LY=2.)
    fe.assign([mat])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(0.001 * fe.leny, 'disp')
    fe.mesh(NX=8, NY=8)
    fe.solve()

    md = fek.rect_mesh(8, 8, LX=2., LY=2., uniax='y', eps_tot=0.001,
                       dtype=jnp.float64)
    # elastic device material: huge sy so nothing yields
    m_el = FE.Material()
    m_el.elasticity(E=100.e3, nu=0.3)
    m_el.plasticity(sy=1.e9, sdim=6)
    dm = con.device_material_from(m_el, dtype=jnp.float64)
    state, hist = fek.solve_uniaxial(md, dm, m_el.CV, nsteps=1, n_inner=1,
                                     dtype=jnp.float64, cg_tol=1e-12,
                                     cg_maxiter=5000)
    gs, ge, gp = hist[-1]
    np.testing.assert_allclose(np.asarray(gs), fe.glob['sig'],
                               rtol=1e-6, atol=1e-6)


def test_multichip_sharded_step_matches_single():
    """One sharded load step over the 8-device mesh == single-device step."""
    from pylabfea_tpu.parallel.mesh import (make_mesh, shard_mesh_data,
                                            shard_state)
    import __graft_entry__ as g
    dtype = jnp.float32
    mat = g._flagship_material(dtype)
    CV = g._elastic_cv(dtype)
    md = fek.rect_mesh(16, 4, LX=4., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    state0 = fek.init_state(md, CV, dtype=dtype)
    s1, d1 = fek.load_step(md, state0, mat, CV, jnp.asarray(0.5, dtype),
                           n_inner=2, cg_maxiter=200)
    mesh = make_mesh(8)
    md_s = shard_mesh_data(md, mesh)
    state_s = shard_state(fek.init_state(md_s, CV, dtype=dtype), mesh)
    s8, d8 = fek.load_step(md_s, state_s, mat, CV, jnp.asarray(0.5, dtype),
                           n_inner=2, cg_maxiter=200)
    np.testing.assert_allclose(np.asarray(d8['glob_sig']),
                               np.asarray(d1['glob_sig']), rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s8.u),
                               np.asarray(s1.u).reshape(-1),
                               rtol=1e-3, atol=1e-5)


def test_response_fast_physics(svc_mat):
    """Cutting-plane production kernel: plastic lanes return to the yield
    locus (|decision| <= tolerance) and plastic flow follows the gradient."""
    dm = con.device_material_from(svc_mat, dtype=jnp.float64)
    rng = np.random.default_rng(9)
    N = 96
    u = rng.normal(size=(N, 6))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sig = u * 100. * rng.uniform(0.7, 0.95, (N, 1))
    epl = np.zeros((N, 6))
    deps = rng.normal(0., 1.0e-4, (N, 6))
    CV = svc_mat.CV
    fy, s, dp, g = con.response_fast(
        dm, (jnp.asarray(sig), jnp.asarray(epl)), jnp.asarray(deps),
        jnp.asarray(CV), 30)
    s = np.asarray(s)
    dp = np.asarray(dp)
    dec = svc_mat.calc_yf(s)
    plastic = np.abs(dp).max(axis=1) > 1e-12
    assert plastic.any()
    # returned plastic states sit on the SVC locus within tolerance
    assert np.abs(dec[plastic]).max() < 2. * FE.yf_tolerance
    # plastic flow direction aligns with the yield-surface gradient
    a = svc_mat.calc_fgrad(s[plastic])
    cosang = np.sum(dp[plastic] * a, axis=1) / (
        np.linalg.norm(dp[plastic], axis=1) * np.linalg.norm(a, axis=1))
    assert cosang.min() > 0.9


def test_response_fast_analytic_matches_host(hill_mat):
    """For the analytic Hill material with small increments, the cutting
    plane endpoint agrees closely with the host substepped update."""
    dm = con.device_material_from(hill_mat, dtype=jnp.float64)
    rng = np.random.default_rng(12)
    N = 64
    u = rng.normal(size=(N, 6))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sig = u * 80. * rng.uniform(0.8, 0.99, (N, 1))
    epl = np.zeros((N, 6))
    deps = rng.normal(0., 3.0e-5, (N, 6))
    CV = hill_mat.CV
    fy_h, s_h, dp_h, g_h, _ = hill_mat.response_batch(sig, epl, deps, CV)
    fy_f, s_f, dp_f, g_f = con.response_fast(
        dm, (jnp.asarray(sig), jnp.asarray(epl)), jnp.asarray(deps),
        jnp.asarray(CV), 30)
    # one projection vs 50 substeps: small path-dependent endpoint spread
    np.testing.assert_allclose(np.asarray(s_f), s_h, atol=5.0)
    np.testing.assert_allclose(np.asarray(dp_f), dp_h, atol=1e-4)


def test_response_fast_secant_tangent(hill_mat):
    """The production return map reports the exact path secant: on plastic
    lanes with positive Sherman-Morrison margin, ``grad @ deps == dsig``
    to machine precision, the matrix is symmetric, and its spectrum never
    dips below the SPD clamp."""
    from pylabfea_tpu.ops.constitutive import _mm, _compliance
    dm = con.device_material_from(hill_mat, dtype=jnp.float64)
    rng = np.random.default_rng(21)
    N = 256
    u = rng.normal(size=(N, 6))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sig0 = jnp.asarray(u * 95. * rng.uniform(0.7, 1.0, (N, 1)))
    epl0 = jnp.zeros((N, 6))
    deps = jnp.asarray(rng.normal(0., 8e-4, (N, 6)))
    CV = jnp.asarray(hill_mat.CV)
    _, sig, depl, grad = con.response_fast(dm, (sig0, epl0), deps, CV, 12, 4)
    dsig = np.asarray(sig - sig0)
    w = np.asarray(_mm(deps, CV.T)) - dsig
    den = np.sum(w * np.asarray(deps), axis=-1)
    q = np.sum(np.asarray(_mm(jnp.asarray(w), _compliance(CV).T)) * w,
               axis=-1)
    plastic = np.abs(np.asarray(depl)).max(axis=1) > 1e-12
    exact = plastic & (den > (1. + 1e-5) * q)
    assert exact.sum() > 50
    lhs = np.einsum('nij,nj->ni', np.asarray(grad), np.asarray(deps))
    rel = (np.linalg.norm(lhs - dsig, axis=1)
           / (np.linalg.norm(dsig, axis=1) + 1e-30))
    assert rel[exact].max() < 1e-9
    g = np.asarray(grad)
    np.testing.assert_allclose(g, np.swapaxes(g, 1, 2), atol=1e-8)
    # SPD clamp: smallest eigenvalue stays nonnegative (tiny slack for
    # the f64 eigensolver on the near-singular ideal-plastic downdate)
    assert np.linalg.eigvalsh(g).min() > -1e-6 * float(CV[0, 0])

    # the Sherman-Morrison criterion must use the TRUE CV^-1: with a
    # fully-coupled 21-coefficient elastic tensor (normal-shear coupling,
    # as fitted by dataio.get_elastic_coefficients) the block-diagonal
    # pseudo-compliance underestimates q and admits indefinite downdates
    rngc = np.random.default_rng(5)
    L = rngc.normal(0., 1., (6, 6))
    CVc = jnp.asarray(L @ L.T * 2.e4 + np.eye(6) * 1.5e5)
    matc = FE.Material()
    matc.elasticity(CV=np.asarray(CVc))
    matc.plasticity(sy=100., sdim=6)
    dmc = con.device_material_from(matc, dtype=jnp.float64)
    _, sigc, deplc, gradc = con.response_fast(dmc, (sig0, epl0), deps,
                                              CVc, 12, 4)
    gc = np.asarray(gradc)
    assert np.linalg.eigvalsh(gc).min() > -1e-6 * float(CVc[0, 0])


def test_fast_path_equilibrium_free_edge():
    """Gated fast-path fixed point satisfies discrete equilibrium: on a
    free-vertical-edge uniaxial-y workload the element-mean transverse
    stress must vanish (discrete divergence theorem — the mean stress
    equals the boundary traction moment, and every x-reaction sums to
    zero).  The pre-secant blended tangent left a ~3% sigma_xx bias
    here; the path-secant tangent closes it."""
    hmat = FE.Material()
    hmat.elasticity(E=200.e3, nu=0.3)
    hmat.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
    dm = con.device_material_from(hmat, dtype=jnp.float32)
    CV = np.asarray(hmat.CV)
    md = fek.rect_mesh(16, 16, uniax='y', eps_tot=0.004, dtype=jnp.float32)
    st = fek.init_state(md, CV, dtype=jnp.float32)
    # count solve+response rounds: the f32 gate must exit on the relative
    # two-hold tangent-stall test (~3-5 rounds/step) instead of chasing
    # the absolute 1e-3 threshold that f32 tangents cannot reliably reach
    # (max_inner burn = 8 steps x 16 rounds)
    rounds = [0]
    orig = fek._respond_and_update

    def counting(*a, **k):
        rounds[0] += 1
        return orig(*a, **k)

    fek._respond_and_update = counting
    try:
        du0 = None
        for _ in range(8):
            st, d = fek.load_step_split(md, st, dm, CV, 1. / 8, n_inner=2,
                                        nsub=4, du0=du0, gate=True)
            du0 = d['du']
    finally:
        fek._respond_and_update = orig
    gs = np.asarray(d['glob_sig'])
    assert abs(gs[0]) < 5e-4 * abs(gs[1])
    assert gs[1] > 150.
    assert rounds[0] <= 48, f'gated inner rounds regressed: {rounds[0]}'


def test_gate_warns_on_nonconvergence(svc_mat):
    """Reference parity (model.py:1364): when the gated equilibrium loop
    exhausts max_inner with the yield excess still outside tolerance —
    here a single load step 20x the yield strain, whose trial states sit
    far outside the SVC training band where the decision surface is flat
    — the solver must WARN instead of returning the bad state silently."""
    dm = con.device_material_from(svc_mat, dtype=jnp.float32)
    CV = np.asarray(svc_mat.CV)
    md = fek.rect_mesh(8, 8, uniax='y', eps_tot=0.01, dtype=jnp.float32)
    st = fek.init_state(md, CV, dtype=jnp.float32)
    with pytest.warns(UserWarning, match='no convergence'):
        fek.load_step_split(md, st, dm, CV, 1., n_inner=1, nsub=4,
                            gate=True, max_inner=3)


def test_refine_du_recovers_f64_accuracy():
    """Mixed-precision iterative refinement: an f32 MG-CG solve carries a
    kappa-amplified operator-rounding error; one refinement pass (f64
    true residual vs the UNROUNDED operator + f32 correction solve) must
    land within ~10x of the f32 representation floor."""
    hmat = FE.Material()
    hmat.elasticity(E=200.e3, nu=0.3)
    CV = np.asarray(hmat.CV)
    N = 128
    md64 = fek.rect_mesh(N, N, uniax='y', eps_tot=0.004, dtype=jnp.float64)
    st64 = fek.init_state(md64, CV, dtype=jnp.float64)
    kes64 = fek._hier_kes_jit(md64, st64.elstiff)
    du64, _, _ = fek._mg_solve_jit(md64, kes64, md64.fixed_val * 0.125,
                                   md64.force * 0.125, 1e-13, 100,
                                   jnp.zeros_like(md64.fixed_val))
    ref = np.asarray(du64)

    md = fek.rect_mesh(N, N, uniax='y', eps_tot=0.004, dtype=jnp.float32)
    st = fek.init_state(md, CV, dtype=jnp.float32)
    kes = fek._hier_kes_jit(md, st.elstiff)
    du, _, _ = fek._mg_solve_jit(md, kes, md.fixed_val * 0.125,
                                 md.force * 0.125, 1e-6, 100,
                                 jnp.zeros_like(md.fixed_val))
    err = lambda d: (np.linalg.norm(np.asarray(d, np.float64) - ref)
                     / np.linalg.norm(ref))
    du_r = fek.refine_du(md, kes, st.elstiff, du, md.fixed_val * 0.125,
                         md.force * 0.125, 1e-6, 100, n=1)
    assert err(du_r) < 1e-6
    assert err(du_r) < 0.05 * err(du)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out[0])).all()
    g.dryrun_multichip(8)


def test_device_response_work_hardening():
    """Work-hardening ML material (Ndof=15: stress + plastic-strain
    features): device response must reproduce the host parity path,
    including the stateful khard batch statistics (yielding-lane mean in
    the flow rule, full-batch mean in the tangent and the locus
    marching)."""
    from tests.test_extended import _wh_matdata
    ref, md = _wh_matdata()
    mat = FE.Material('wh-ml')
    mat.from_data(md)
    mat.train_SVC(C=10., gamma=1., Fe=0.8, Ce=0.95, Nseq=2)
    assert mat.whdat and mat.Ndof == 15
    dm = con.device_material_from(mat, dtype=jnp.float64)
    rng = np.random.default_rng(13)
    N = 24
    u = rng.normal(size=(N, 6))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sig = u * 70. * rng.uniform(0.5, 0.9, (N, 1))
    epl = rng.normal(0., 2e-3, (N, 6))
    deps = rng.normal(0., 1.5e-3, (N, 6))
    CV = mat.CV
    fy_h, s_h, dp_h, g_h, _ = mat.response_batch(sig, epl, deps, CV)
    fy_d, s_d, dp_d, g_d = con.response(
        dm, (jnp.asarray(sig), jnp.asarray(epl)), jnp.asarray(deps),
        jnp.asarray(CV))
    np.testing.assert_allclose(np.asarray(fy_d), fy_h, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_d), s_h, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dp_d), dp_h, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_d), g_h, atol=1e-6)
    # production kernel runs and hardens: plastic lanes stay near the locus
    fy, s, dp, g = con.response_fast(
        dm, (jnp.asarray(sig), jnp.asarray(epl)), jnp.asarray(deps),
        jnp.asarray(CV), 12, 2)
    assert np.isfinite(np.asarray(s)).all()


def test_device_texture_features():
    """Texture-conditioned SVC (StandardScaler features): the device path
    with a fixed texture descriptor matches host calc_yf / calc_fgrad /
    ML_full_yf."""
    from scipy.optimize import fsolve

    def tex_set(tv, sy, hill):
        ref = FE.Material()
        ref.elasticity(E=200.e3, nu=0.3)
        ref.plasticity(sy=sy, hill=hill, sdim=6)
        su = FE.load_cases(12, 24)
        x1 = fsolve(ref.find_yloc, np.ones(36) * sy, args=(su,), xtol=1e-5)
        return {'sdim': 6, 'Nlc': 36, 'Ncyl': 0, 'Ntext': 1,
                'wh_data': False, 'tx_data': True, 'epc': 0.002,
                'peeq_max': 0.01, 'sy_av': float(sy),
                'elast_const': ref.CV, 'sig_ideal': su * x1[:, None],
                'tx_descriptor': 'GSH_3', 'texture': np.asarray(tv),
                'tdim': 3}

    mat = FE.Material('ML-tex')
    mat.from_data([tex_set([0.3, 0., 0.], 90., [1.2, 1., 0.8, 1., 1., 1.]),
                   tex_set([0., 0.3, 0.1], 120., [1., 1., 1., 1., 1., 1.])])
    mat.train_SVC(C=10, gamma=1., Fe=0.8, Ce=0.95, Nseq=2)
    tex = np.array([0.3, 0., 0.])
    dm = con.device_material_from(mat, dtype=jnp.float64, tex=tex)
    rng = np.random.default_rng(3)
    sig = rng.normal(0., 70., (10, 6))
    np.testing.assert_allclose(
        np.asarray(con.yf(dm, jnp.asarray(sig), jnp.zeros(10))),
        mat.calc_yf(sig, tex=tex), atol=1e-12)
    _, g_d, _ = con.yf_and_fgrad(dm, jnp.asarray(sig), jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(g_d),
                               mat.calc_fgrad(sig, tex=tex), atol=1e-12)
    d_h = np.array([mat.ML_full_yf(sig[i], tex=tex, verb=False)
                    for i in range(10)])
    np.testing.assert_allclose(
        np.asarray(con.ml_yf_dist(dm, jnp.asarray(sig), jnp.zeros(10))),
        d_h, atol=1e-8)


def test_device_texture_pca_adv():
    """PCA-whitened ADV texture descriptors on the device path: the fitted
    StandardScaler + PCA compose into one affine feature map folded into
    DeviceMaterial, so yf / fgrad / locus distance match the host
    (material.py:2301-2368 semantics)."""
    from scipy.optimize import fsolve

    rng = np.random.default_rng(7)

    def tex_set(tv, sy, hill):
        ref = FE.Material()
        ref.elasticity(E=200.e3, nu=0.3)
        ref.plasticity(sy=sy, hill=hill, sdim=6)
        su = FE.load_cases(12, 24)
        x1 = fsolve(ref.find_yloc, np.ones(36) * sy, args=(su,), xtol=1e-5)
        return {'sdim': 6, 'Nlc': 36, 'Ncyl': 0, 'Ntext': 1,
                'wh_data': False, 'tx_data': True, 'epc': 0.002,
                'peeq_max': 0.01, 'sy_av': float(sy),
                'elast_const': ref.CV, 'sig_ideal': su * x1[:, None],
                'tx_descriptor': 'ADV_12', 'texture': np.asarray(tv),
                'tdim': 12}

    adv = rng.normal(0., 1., (4, 12))
    mat = FE.Material('ML-adv')
    mat.from_data([
        tex_set(adv[0], 90., [1.2, 1., 0.8, 1., 1., 1.]),
        tex_set(adv[1], 120., [1., 1., 1., 1., 1., 1.]),
        tex_set(adv[2], 105., [0.9, 1.1, 1., 1., 1., 1.]),
        tex_set(adv[3], 112., [1.1, 0.9, 1., 1., 1., 1.])])
    mat.train_SVC(C=10, gamma=1., Fe=0.8, Ce=0.95, Nseq=2)
    assert mat.pca is not None
    tex = adv[0]
    dm = con.device_material_from(mat, dtype=jnp.float64, tex=tex)
    sig = rng.normal(0., 70., (10, 6))
    np.testing.assert_allclose(
        np.asarray(con.yf(dm, jnp.asarray(sig), jnp.zeros(10))),
        mat.calc_yf(sig, tex=tex), atol=1e-12)
    _, g_d, _ = con.yf_and_fgrad(dm, jnp.asarray(sig), jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(g_d),
                               mat.calc_fgrad(sig, tex=tex), atol=1e-12)
    d_h = np.array([mat.ML_full_yf(sig[i], tex=tex, verb=False)
                    for i in range(10)])
    np.testing.assert_allclose(
        np.asarray(con.ml_yf_dist(dm, jnp.asarray(sig), jnp.zeros(10))),
        d_h, atol=1e-8)


def test_device_cylindrical_sdim3():
    """Cylindrical (sdim=3, Ndof=2) SVC features on device: yield function,
    gradient (via the (seq, theta, p) Jacobian) and locus distance match
    the host on principal-stress inputs.  (For general 6-D stresses the
    reference's principal ordering follows LAPACK eig's raw output order,
    which eigh-based device code cannot replicate bitwise — documented in
    device_material_from.)"""
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=150., hill=[1.2, 1., 0.8], sdim=3)
    mat = FE.Material('ml3')
    mat.train_SVC(C=10, gamma=4., mat_ref=ref, Nlc=150, Nseq=4)
    assert mat.Ndof == 2
    dm = con.device_material_from(mat, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    sp = rng.normal(0., 80., (16, 3))
    np.testing.assert_allclose(
        np.asarray(con.yf(dm, jnp.asarray(sp), jnp.zeros(16))),
        mat.calc_yf(sp), atol=1e-10)
    _, g_d, _ = con.yf_and_fgrad(dm, jnp.asarray(sp), jnp.zeros(16))
    np.testing.assert_allclose(np.asarray(g_d)[:, :3],
                               mat.calc_fgrad(sp), atol=1e-10)
    d_h = np.array([mat.ML_full_yf(sp[i], verb=False) for i in range(16)])
    np.testing.assert_allclose(
        np.asarray(con.ml_yf_dist(dm, jnp.asarray(sp), jnp.zeros(16))),
        d_h, atol=1e-8)


def test_device_hessian(svc_mat):
    """RBF-kernel Hessian on device matches host calc_hessian (including
    the reference's single-/scale_seq scaling convention)."""
    dm = con.device_material_from(svc_mat, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    sig = rng.normal(0., 60., (8, 6))
    np.testing.assert_allclose(np.asarray(con.hessian(dm, jnp.asarray(sig))),
                               svc_mat.calc_hessian(sig), atol=1e-12)


def test_warm_start_recycles_plastic_krylov(hill_mat):
    """Warm-starting the equilibrium solves (within a load step and across
    steps via diag['du']) must keep the developed-plastic CG cost at the
    elastic level — the recycled-Krylov remedy for the plastic-regime
    iteration growth (cold solves grew ~8x and hit the iteration cap)."""
    dm = con.device_material_from(hill_mat, dtype=jnp.float64)
    CV = np.asarray(hill_mat.CV)
    md = fek.rect_mesh(64, 64, uniax='y', eps_tot=0.004, dtype=jnp.float64)
    st = fek.init_state(md, CV, dtype=jnp.float64)
    du0 = None
    iters = []
    for _ in range(8):
        st, d = fek.load_step_split(md, st, dm, CV, 1. / 8., n_inner=2,
                                    du0=du0)
        du0 = d['du']
        iters.append(int(d['cg_iters']))
        assert float(d['cg_res']) < 1e-7
    # developed-plastic steps must not cost more than ~3x the elastic ones
    elastic = max(iters[0], 1)
    assert max(iters[-3:]) <= 3 * elastic + 6, iters
    # plasticity actually developed
    peeq = np.asarray(jnp.linalg.norm(st.epl, axis=1))
    assert (peeq > 1e-6).mean() > 0.5


def test_load_step_split_gate_matches_fully_iterated(hill_mat):
    """The convergence-gated inner loop (reference model.py:1305 exit
    test: yield excess inside tolerance AND no tangent update) must
    reproduce a fully-iterated fixed-count stepper — it stops exactly
    when further rounds are no-ops, so the states agree to round-off —
    while spending only as many rounds as the step needs."""
    dm = con.device_material_from(hill_mat, dtype=jnp.float64)
    CV = jnp.asarray(hill_mat.CV)
    md = fek.rect_mesh(16, 16, LX=1., LY=1., uniax='y', eps_tot=0.004,
                       dtype=jnp.float64)
    st_f = fek.init_state(md, CV, dtype=jnp.float64)
    st_g = fek.init_state(md, CV, dtype=jnp.float64)
    for _ in range(4):
        # n_inner=15 = the gate's max_inner: the first (yield-transition)
        # step needs ~14 rounds for the exact-secant tangent field to
        # freeze (every per-element change below the reference's 1e-3
        # update threshold); both arms then sit at the same fixed point
        st_f, d_f = fek.load_step_split(md, st_f, dm, CV, 0.25, n_inner=15)
        st_g, d_g = fek.load_step_split(md, st_g, dm, CV, 0.25, n_inner=0,
                                        gate=True)
    np.testing.assert_allclose(np.asarray(st_g.sig), np.asarray(st_f.sig),
                               atol=1e-8 * float(hill_mat.sy))
    from pylabfea_tpu.core.tensors import yf_tolerance
    assert float(d_g['fy_max']) <= yf_tolerance * 1.0001 * hill_mat.sy
    assert float(d_g['dstiff']) <= 1.e-3


def test_multimat_planestress_laminate_device_vs_host():
    """The reference's flagship plane-stress LAMINATE (5 sections, Voigt
    golden — reference tests/test_basic.py:84-103) on the DEVICE path:
    the per-material eps_33 condensation rows live in the mesh's ps_b2
    planes (fe_kernels.rect_mesh; the stiffness itself is
    condensation-independent because the reduced CV has an empty row/col
    2, model.py:498-501).  Device solution must match the host solver's
    global stress/strain AND the per-element thickness strains."""
    from pylabfea_tpu import bridge

    fem_v = FE.Model(dim=2, planestress=True)
    fem_v.geom([2, 1, 2, 1, 2], LY=4.)
    mat1 = FE.Material()
    mat1.elasticity(E=100.e3, nu=0.35)
    mat2 = FE.Material()
    mat2.elasticity(E=300.e3, nu=0.3)
    fem_v.assign([mat1, mat2, mat1, mat2, mat1])
    fem_v.bcleft(0.)
    fem_v.bcbot(0.)
    fem_v.bcright(0., 'force')
    fem_v.bctop(0.1 * fem_v.leny, 'disp')
    fem_v.mesh(NX=16, NY=4)
    fem_v.solve()
    fem_v.calc_global()

    fe_d = FE.Model(dim=2, planestress=True)
    fe_d.geom([2, 1, 2, 1, 2], LY=4.)
    fe_d.assign([mat1, mat2, mat1, mat2, mat1])
    fe_d.bcleft(0.)
    fe_d.bcbot(0.)
    fe_d.bcright(0., 'force')
    fe_d.bctop(0.1 * fe_d.leny, 'disp')
    fe_d.mesh(NX=16, NY=4)
    bridge.solve_on_device(fe_d, nsteps=1, n_inner=1, dtype=jnp.float64,
                           cg_tol=1e-13)

    # Voigt-average stiffness golden (the reference asserts the same)
    E_voigt = (100.e3 * 6. + 300.e3 * 2.) / 8.
    assert abs(fe_d.glob['sig'][1] / fe_d.glob['eps'][1] - E_voigt) \
        / E_voigt < 1e-3
    np.testing.assert_allclose(fe_d.glob['sig'], fem_v.glob['sig'],
                               rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(fe_d.glob['eps'], fem_v.glob['eps'],
                               rtol=1e-8, atol=1e-10)
    # per-element thickness strains (the condensation row itself)
    e33_h = np.array([el.eps[2] for el in fem_v.element])
    e33_d = np.array([el.eps[2] for el in fe_d.element])
    assert np.abs(e33_h).max() > 1e-3  # non-trivial field
    np.testing.assert_allclose(e33_d, e33_h, rtol=1e-8, atol=1e-12)
