"""Gradient-based plastic-parameter identification (ops.calibrate).

The reference package fits only the ELASTIC constants from data
(reference data.py:84-348); plastic anisotropy is captured indirectly via
SVC training on computed yield stresses.  ops.calibrate recovers the
plastic parameters DIRECTLY by differentiating through the device return
map, so the contract here is a round trip: simulate stress paths with a
known Hill material, fit from the paths alone, and require the parameters
back (up to the exact Hill gauge ray (hill*c, sy*sqrt(c), khard*sqrt(c)),
pinned by the uniax_x convention).
"""
import numpy as np
import jax
import jax.numpy as jnp

from pylabfea_tpu.ops import calibrate, constitutive as con
from pylabfea_tpu.ops import jtensors as jt

HILL_TRUE = np.array([1.2, 0.9, 1.05, 1.0, 1.0, 1.0])
SY_TRUE, KHARD_TRUE = 150., 500.


def _cv_iso(E=200000., nu=0.3):
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    CV = np.zeros((6, 6))
    CV[:3, :3] = lam
    CV[np.arange(3), np.arange(3)] += 2 * mu
    CV[np.arange(3, 6), np.arange(3, 6)] = mu
    return jnp.asarray(CV)


def _mat(hill, sy, khard):
    return con.DeviceMaterial(
        hill=jnp.asarray(hill), sy=jnp.asarray(sy), khard=jnp.asarray(khard),
        drucker=jnp.asarray(0.), sv=jnp.zeros((1, 6)), dc=jnp.zeros(1),
        rho=jnp.asarray(0.), gamma=jnp.asarray(1.),
        scale_seq=jnp.asarray(sy), scale_wh=jnp.asarray(1.),
        feat_mean=jnp.zeros(0), feat_scale=jnp.zeros(0), tex=jnp.zeros(0),
        is_svc=False, dev_only=False, sdim3=False)


def _paths(npaths=12, nsteps=25, step=0.0016, seed=0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(npaths, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return jnp.asarray(np.repeat(dirs[:, None, :], nsteps, 1) * step)


def _simulate(m, deps, CV, maxiter=40):
    npaths = deps.shape[0]
    z = jnp.zeros((npaths, 6), deps.dtype)

    def stp(carry, d):
        s, e = carry
        _, sn, dp, _ = con.response_fast(m, (s, e), d, CV, maxiter, 1,
                                         fixed_trip=True)
        return (sn, e + dp), sn

    _, hist = jax.lax.scan(stp, (z, z), jnp.swapaxes(deps, 0, 1))
    return jnp.swapaxes(hist, 0, 1)


def test_fixed_trip_matches_while_loop():
    """fixed_trip=True agrees with the production map within the
    projection tolerance (it polishes to machine zero where the
    production loop may freeze anywhere inside the +-toler band), and its
    own yield residual is at machine zero."""
    from pylabfea_tpu.core.tensors import yf_tolerance
    CV = _cv_iso()
    m = _mat(HILL_TRUE, SY_TRUE, KHARD_TRUE)
    deps = _paths(6, 1, step=0.002)[:, 0]
    state = (jnp.zeros((6, 6)), jnp.zeros((6, 6)))
    out_w = con.response_fast(m, state, deps, CV, 40, 1)
    out_f = con.response_fast(m, state, deps, CV, 40, 1, fixed_trip=True)
    toler = yf_tolerance * SY_TRUE
    assert float(jnp.max(jnp.abs(out_f[0]))) < 1e-8      # f at machine zero
    assert float(jnp.max(jnp.abs(out_w[0]))) <= toler    # f within band
    np.testing.assert_allclose(np.asarray(out_w[1]), np.asarray(out_f[1]),
                               rtol=0, atol=2. * toler)  # sig
    np.testing.assert_allclose(np.asarray(out_w[2]), np.asarray(out_f[2]),
                               rtol=0, atol=1e-4)        # depl


def test_gradients_finite_at_virgin_state():
    """Virgin lanes (zero stress) sit on the sqrt kink of every equivalent
    measure; safe_sqrt must keep reverse-mode parameter gradients finite."""
    CV = _cv_iso()
    deps = _paths(4, 3)
    sig = _simulate(_mat(HILL_TRUE, SY_TRUE, KHARD_TRUE), deps, CV)
    theta = {'log_sy': jnp.log(jnp.asarray(SY_TRUE)),
             'log_hill': jnp.log(jnp.asarray(HILL_TRUE)),
             'raw_dsy': jnp.asarray(2.0)}

    def loss(th):
        sim = calibrate.simulate_paths(th, CV, deps, 40, 1, 0.01)
        return jnp.mean((sim - sig) ** 2)

    g = jax.grad(loss)(theta)
    for k, v in g.items():
        assert np.all(np.isfinite(np.asarray(v))), f'non-finite grad in {k}'


def test_round_trip_recovers_hill_material():
    CV = _cv_iso()
    deps = _paths()
    sig = _simulate(_mat(HILL_TRUE, SY_TRUE, KHARD_TRUE), deps, CV)

    params, info = calibrate.fit_plasticity(deps, sig, CV)

    assert info['loss'][-1] < 1e-6, 'LM did not reach the data floor'
    # gauge-fix the truth to the same uniax_x convention
    ct = 0.5 * (HILL_TRUE[0] + HILL_TRUE[2])
    rct = np.sqrt(ct)
    assert abs(params['sy'] - SY_TRUE / rct) / (SY_TRUE / rct) < 5e-3
    assert abs(params['khard'] - KHARD_TRUE / rct) / (KHARD_TRUE / rct) < 2e-2
    np.testing.assert_allclose(params['hill'], HILL_TRUE / ct, rtol=1e-2)
    # the simulated paths of the fit must overlay the data
    rms = float(jnp.sqrt(jnp.mean((info['sim'] - sig) ** 2)))
    assert rms < 1e-2 * float(jnp.sqrt(jnp.mean(sig ** 2)))


def test_estimate_init_lands_in_basin():
    """The slope seed must put khard within ~an order of magnitude and sy
    above the elastic floor — the basin requirement for the LM descent."""
    CV = _cv_iso()
    deps = _paths()
    sig = _simulate(_mat(HILL_TRUE, SY_TRUE, KHARD_TRUE), deps, CV)
    init = calibrate.estimate_init(deps, sig)
    assert 50. < init['khard'] < 5000.
    assert init['sy'] > 100.


def test_safe_sqrt_value_and_grad():
    x = jnp.asarray([0., 1e-30, 4.0])
    np.testing.assert_allclose(np.asarray(jt.safe_sqrt(x)),
                               np.sqrt(np.asarray(x)))
    g = jax.grad(lambda v: jt.safe_sqrt(v))(0.)
    assert float(g) == 0.
    g1 = jax.grad(lambda v: jt.safe_sqrt(v))(4.)
    assert abs(float(g1) - 0.25) < 1e-12


# ----------------------------------------------------------------------
# Voce saturation hardening (capability beyond the reference's linear law)
# ----------------------------------------------------------------------
def _mat_voce(hill, sy, khard, vr, vb):
    return con.DeviceMaterial(
        hill=jnp.asarray(hill), sy=jnp.asarray(sy), khard=jnp.asarray(khard),
        drucker=jnp.asarray(0.), sv=jnp.zeros((1, 6)), dc=jnp.zeros(1),
        rho=jnp.asarray(0.), gamma=jnp.asarray(1.),
        scale_seq=jnp.asarray(sy), scale_wh=jnp.asarray(1.),
        feat_mean=jnp.zeros(0), feat_scale=jnp.zeros(0), tex=jnp.zeros(0),
        voce_r=jnp.asarray(vr), voce_b=jnp.asarray(vb),
        is_svc=False, dev_only=False, sdim3=False)


def test_voce_flow_stress_host_device_agree():
    import pylabfea_tpu as FE
    host = FE.Material('voce')
    host.elasticity(E=200.e3, nu=0.3)
    host.plasticity(sy=140., khard=200., voce_r=60., voce_b=150., sdim=6)
    dm = con.device_material_from(host, dtype=jnp.float64)
    for peeq in (0., 1e-4, 5e-3, 0.02, 0.2):
        np.testing.assert_allclose(
            float(con.flow_stress(dm, jnp.asarray(peeq))),
            host.get_sflow(peeq), rtol=1e-12)
        np.testing.assert_allclose(
            float(con.hard_modulus(dm, jnp.asarray(peeq))),
            host.get_khard(peeq), rtol=1e-12)
    # voce_r=0 defaults reduce exactly to the linear law
    lin = FE.Material('lin')
    lin.elasticity(E=200.e3, nu=0.3)
    lin.plasticity(sy=140., khard=200., sdim=6)
    dl = con.device_material_from(lin, dtype=jnp.float64)
    assert float(con.flow_stress(dl, jnp.asarray(0.01))) == 140. + 2.
    assert float(con.hard_modulus(dl, jnp.asarray(0.01))) == 200.


def test_voce_return_map_consistency():
    """In sustained plastic flow the stress must track the Voce flow
    stress: seq_hill(sig) == sflow(peeq) within the projection tolerance."""
    CV = _cv_iso()
    m = _mat_voce(np.ones(6), 140., 200., 60., 150.)
    deps = jnp.zeros((1, 6)).at[0, 0].set(1.5e-3).at[0, 1].set(-0.75e-3) \
        .at[0, 2].set(-0.75e-3)
    sig = jnp.zeros((1, 6))
    epl = jnp.zeros((1, 6))
    for _ in range(20):
        _, sig, dp, _ = con.response_fast(m, (sig, epl), deps, CV, 40, 1)
        epl = epl + dp
    peeq = float(jt.eps_eq(epl)[0])
    assert peeq > 0.01, 'path did not develop plastic flow'
    seq = float(con.seq_hill(m, sig)[0])
    sflow = float(con.flow_stress(m, jnp.asarray(peeq)))
    # saturation is active (well below the linear extrapolation)
    lin = 140. + 200. * peeq + 60. * 150. * peeq
    assert sflow < 0.9 * lin
    np.testing.assert_allclose(seq, sflow, rtol=2e-3)


def test_voce_round_trip():
    """fit_plasticity(hardening='voce') recovers all 10 parameters from
    stress paths of a saturating material (machine precision with the
    scalar pre-fit seed; the cold log(vb) start collapses into the vb=0
    boundary where Voce degenerates into the linear term)."""
    rng = np.random.default_rng(3)
    CV = _cv_iso()
    hill_t = np.array([1.1, 0.95, 1.0, 1.0, 1.0, 1.0])
    sy_t, kh_t, vr_t, vb_t = 140., 200., 60., 150.
    m = _mat_voce(hill_t, sy_t, kh_t, vr_t, vb_t)
    npaths, nsteps = 14, 30
    dirs = rng.normal(size=(npaths, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(nsteps, 1.6e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    sig = _simulate(m, deps, CV)

    params, info = calibrate.fit_plasticity(deps, sig, CV,
                                            hardening='voce', steps=120)
    assert info['loss'][-1] < 1e-10
    ct = 0.5 * (hill_t[0] + hill_t[2])
    rct = np.sqrt(ct)
    np.testing.assert_allclose(params['sy'], sy_t / rct, rtol=1e-4)
    np.testing.assert_allclose(params['khard'], kh_t / rct, rtol=1e-3)
    np.testing.assert_allclose(params['voce_r'], vr_t / rct, rtol=1e-3)
    np.testing.assert_allclose(params['voce_b'], vb_t, rtol=1e-3)
    np.testing.assert_allclose(params['hill'], hill_t / ct, rtol=1e-4)


def test_fit_from_data_records_tensor_convention():
    """fit_from_data on a records dict whose strains use TENSOR shear
    components (the CPFEM database convention): the conversion must
    recover the material; without it the shear coefficients poison."""
    rng = np.random.default_rng(5)
    CV = _cv_iso()
    m = _mat_voce(HILL_TRUE, SY_TRUE, KHARD_TRUE, 0., 1.)
    npaths, nsteps = 10, 40
    dirs = rng.normal(size=(npaths, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(nsteps, 1.2e-3)
    steps[:6] = 2.0e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    sig = _simulate(m, deps, CV)
    eps = np.cumsum(np.asarray(deps), axis=1)
    eps_tensor = eps.copy()
    eps_tensor[..., 3:] *= 0.5  # store as tensor components
    records = {f'case{p}': {'Stress': np.asarray(sig)[p],
                            'Strain_Total': eps_tensor[p]}
               for p in range(npaths)}

    params, info = calibrate.fit_from_data(records, CV=CV, nsteps=20,
                                           shear_convention='tensor')
    ct = 0.5 * (HILL_TRUE[0] + HILL_TRUE[2])
    rct = np.sqrt(ct)
    np.testing.assert_allclose(params['sy'], SY_TRUE / rct, rtol=2e-2)
    np.testing.assert_allclose(params['hill'], HILL_TRUE / ct, rtol=5e-2)


def test_drucker_round_trip():
    """fit_drucker recovers the pressure-sensitivity coefficient along
    with everything else, provided the paths' hydrostatic drift stays
    bounded (runaway I1 approaches the Drucker cone apex, where the
    unrolled return-map derivative is expanding — see fit_plasticity)."""
    rng = np.random.default_rng(11)
    CV = _cv_iso()
    hill_t = np.array([1.15, 0.9, 1.0, 1.0, 1.0, 1.0])
    sy_t, kh_t, dr_t = 150., 300., 0.15
    m = con.DeviceMaterial(
        hill=jnp.asarray(hill_t), sy=jnp.asarray(sy_t),
        khard=jnp.asarray(kh_t), drucker=jnp.asarray(dr_t),
        sv=jnp.zeros((1, 6)), dc=jnp.zeros(1), rho=jnp.asarray(0.),
        gamma=jnp.asarray(1.), scale_seq=jnp.asarray(sy_t),
        scale_wh=jnp.asarray(1.), feat_mean=jnp.zeros(0),
        feat_scale=jnp.zeros(0), tex=jnp.zeros(0),
        is_svc=False, dev_only=False, sdim3=False)
    half = rng.normal(size=(8, 6))
    half /= np.linalg.norm(half, axis=1, keepdims=True)
    dirs = np.concatenate([half, -half], 0)  # tension/compression pairs
    # bound the hydrostatic drift (see fit_plasticity docstring)
    E, nu, nsteps, step = 200000., 0.3, 28, 1.6e-3
    tr_cap = 2.5 * sy_t / (E / (1. - 2. * nu)) / (nsteps * step)
    tr = dirs[:, :3].sum(1, keepdims=True)
    dirs[:, :3] -= (tr - np.clip(tr, -tr_cap, tr_cap)) / 3.
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(nsteps, step)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    sig = _simulate(m, deps, CV)

    params, info = calibrate.fit_plasticity(deps, sig, CV,
                                            fit_drucker=True, steps=120)
    assert info['loss'][-1] < 1e-12
    ct = 0.5 * (hill_t[0] + hill_t[2])
    rct = np.sqrt(ct)
    np.testing.assert_allclose(params['sy'], sy_t / rct, rtol=1e-6)
    np.testing.assert_allclose(params['khard'], kh_t / rct, rtol=1e-5)
    np.testing.assert_allclose(params['drucker'], dr_t / rct, rtol=1e-5)
    np.testing.assert_allclose(params['hill'], hill_t / ct, rtol=1e-6)


def test_identified_material_reproduces_fe_solution():
    """Full loop: identify a Hill+Voce material from stress paths, drop it
    into the FE solver, and match the truth material's FE solution.  Also
    validates the gauge fix implicitly — the identified parameters sit on
    a different gauge ray, but the physics must be identical."""
    import pylabfea_tpu as FE
    from pylabfea_tpu import bridge

    truth = FE.Material('truth')
    truth.elasticity(E=200.e3, nu=0.3)
    truth.plasticity(sy=160., hill=[1.2, 0.9, 1.0, 1., 1., 1.],
                     khard=250., voce_r=70., voce_b=180., sdim=6)
    dm = con.device_material_from(truth)
    CV = jnp.asarray(truth.CV)
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(14, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(30, 1.6e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    sig = _simulate(dm, deps, CV)

    params, _ = calibrate.fit_plasticity(deps, sig, CV, hardening='voce')
    ident = FE.Material('identified')
    ident.elasticity(CV=np.asarray(truth.CV))
    ident.plasticity(sy=params['sy'], hill=list(params['hill']),
                     khard=params['khard'], voce_r=params['voce_r'],
                     voce_b=params['voce_b'], sdim=6)

    def fe_solve(mat):
        fe = FE.Model(dim=2, planestress=False)
        fe.geom([4.], LY=4.)
        fe.assign([mat])
        fe.bcleft(0.)
        fe.bcbot(0.)
        fe.bcright(0., 'force')
        fe.bctop(0.006 * fe.leny, 'disp')
        fe.mesh(NX=8, NY=8)
        bridge.solve_on_device(fe, nsteps=20, n_inner=4,
                               dtype=jnp.float64)
        return fe.glob['sig']

    g_truth = fe_solve(truth)
    g_ident = fe_solve(ident)
    rel = abs(g_ident[1] - g_truth[1]) / abs(g_truth[1])
    assert rel < 1e-3, f'identified material FE mismatch {rel:.2e}'


def test_joint_elastic_plastic_round_trip():
    """fit_CV=True recovers all 30 parameters — the 21 Cholesky-
    parameterized stiffness coefficients jointly with the plastic set —
    from an isotropic ~10%-off stiffness guess (for data without clean
    pre-yield segments, where a separately fitted C is biased)."""
    C = np.zeros((6, 6))
    C11, C12, C44 = 170.e3, 124.e3, 75.e3
    C[:3, :3] = C12
    np.fill_diagonal(C[:3, :3], C11)
    np.fill_diagonal(C[3:, 3:], C44)
    CV_true = jnp.asarray(C)
    hill_t = np.array([1.15, 0.9, 1.0, 1.0, 1.0, 1.0])
    sy_t, kh_t = 150., 400.
    m = _mat(hill_t, sy_t, kh_t)
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(16, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(30, 1.5e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    sig = _simulate(m, deps, CV_true)

    E0, nu0 = 180.e3, 0.28  # isotropic guess, ~10% off
    l0 = E0 * nu0 / ((1 + nu0) * (1 - 2 * nu0))
    mu0 = E0 / (2 * (1 + nu0))
    C0 = np.zeros((6, 6))
    C0[:3, :3] = l0
    C0[np.arange(3), np.arange(3)] += 2 * mu0
    C0[np.arange(3, 6), np.arange(3, 6)] = mu0

    params, info = calibrate.fit_plasticity(deps, sig, jnp.asarray(C0),
                                            fit_CV=True, steps=150)
    assert info['loss'][-1] < 1e-20
    np.testing.assert_allclose(params['CV'], C, rtol=1e-8, atol=1e-3)
    ct = 0.5 * (hill_t[0] + hill_t[2])
    rct = np.sqrt(ct)
    np.testing.assert_allclose(params['sy'], sy_t / rct, rtol=1e-8)
    np.testing.assert_allclose(params['khard'], kh_t / rct, rtol=1e-6)
    np.testing.assert_allclose(params['hill'], hill_t / ct, rtol=1e-8)


def test_param_std_noisy_fit():
    """Gauss-Newton standard errors: on noisy data the fit reports
    finite, positive parameter stds on the identifiable subspace (the
    exact gauge ray is a null mode of J'J and must not blow them up),
    and the actual errors are consistent with them (|z| < 4)."""
    rng = np.random.default_rng(0)
    CV = _cv_iso()
    m = _mat(HILL_TRUE, SY_TRUE, KHARD_TRUE)
    dirs = rng.normal(size=(12, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(25, 1.6e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    sig = _simulate(m, deps, CV)
    sig = sig + 0.5 * rng.normal(size=sig.shape)  # 0.5 MPa noise

    params, info = calibrate.fit_plasticity(deps, sig, CV)
    std = info['param_std']
    assert std is not None
    for k in ('sy', 'khard', 'hill'):
        v = np.atleast_1d(std[k])
        assert np.all(np.isfinite(v)) and np.all(v > 0)
    ct = 0.5 * (HILL_TRUE[0] + HILL_TRUE[2])
    rct = np.sqrt(ct)
    assert abs(params['sy'] - SY_TRUE / rct) / std['sy'] < 4.
    assert abs(params['khard'] - KHARD_TRUE / rct) / std['khard'] < 4.
    assert np.all(np.abs(params['hill'] - HILL_TRUE / ct) / std['hill'] < 4.)
    # noiseless fits report None (exact-interpolation floor)
    sig0 = _simulate(m, deps, CV)
    _, info0 = calibrate.fit_plasticity(deps, sig0, CV)
    assert info0['param_std'] is None


def test_fit_parallelizes_over_sharded_paths():
    """The fit is SPMD over paths: sharding deps/sig over a device mesh
    (here the 8-device virtual CPU mesh) partitions the return-map scan
    and the jacfwd columns with NO code changes, and the result matches
    the unsharded fit bitwise-near — the TPU scaling mode for large
    experimental campaigns."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    CV = _cv_iso()
    m = _mat(HILL_TRUE, SY_TRUE, KHARD_TRUE)
    dirs = rng.normal(size=(16, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(25, 1.6e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    sig = _simulate(m, deps, CV)

    p1, _ = calibrate.fit_plasticity(deps, sig, CV, steps=40)
    mesh = Mesh(np.array(jax.devices()), ('paths',))
    sh = NamedSharding(mesh, P('paths',))
    p8, _ = calibrate.fit_plasticity(jax.device_put(deps, sh),
                                     jax.device_put(sig, sh), CV, steps=40)
    np.testing.assert_allclose(p8['sy'], p1['sy'], rtol=1e-10)
    np.testing.assert_allclose(p8['khard'], p1['khard'], rtol=1e-8)
    np.testing.assert_allclose(p8['hill'], p1['hill'], rtol=1e-10)


def test_round_trip_float32():
    """The fit works at TPU production dtype: explicit f32 inputs keep the
    whole pipeline (return-map scan, jacfwd, LM linear algebra) in f32
    and still recover the parameters to ~1e-5."""
    CV = jnp.asarray(np.asarray(_cv_iso()), jnp.float32)
    f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    m = _mat(HILL_TRUE, SY_TRUE, KHARD_TRUE)
    m = jax.tree_util.tree_map(f32, m)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(12, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = np.full(25, 1.6e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None],
                       jnp.float32)
    sig = _simulate(m, deps, CV)
    assert sig.dtype == jnp.float32

    params, info = calibrate.fit_plasticity(deps, sig, CV)
    ct = 0.5 * (HILL_TRUE[0] + HILL_TRUE[2])
    rct = np.sqrt(ct)
    np.testing.assert_allclose(params['sy'], SY_TRUE / rct, rtol=1e-4)
    np.testing.assert_allclose(params['khard'], KHARD_TRUE / rct,
                               rtol=1e-3)
    np.testing.assert_allclose(params['hill'], HILL_TRUE / ct, rtol=1e-4)


def test_implicit_integrator_survives_apex():
    """integrator='implicit' (backward-Euler projection under
    lax.custom_root): IFT derivatives are ONE linear solve at the
    converged point, bounded even near the Drucker cone apex where the
    unrolled tangent chain is expanding (~2.6x per Newton trip, measured
    1e227 gradients) — the same unbounded-hydrostatic-drift paths that
    overflow the unrolled fit recover all parameters here."""
    rng = np.random.default_rng(11)
    CV = _cv_iso()
    hill_t = np.array([1.15, 0.9, 1.0, 1.0, 1.0, 1.0])
    sy_t, kh_t, dr_t = 150., 300., 0.15
    half = rng.normal(size=(8, 6))
    half /= np.linalg.norm(half, axis=1, keepdims=True)
    dirs = np.concatenate([half, -half], 0)  # UNBOUNDED drift: apex paths
    steps = np.full(28, 1.6e-3)
    steps[:5] = 2.5e-4
    deps = jnp.asarray(dirs[:, None, :] * steps[None, :, None])
    eps_tot = jnp.cumsum(deps, axis=1)
    peeq_ref = float(jnp.max(jt.eps_eq(eps_tot.reshape(-1, 6))))
    th_true = {'log_sy': jnp.log(jnp.asarray(sy_t)),
               'log_hill': jnp.log(jnp.asarray(hill_t)),
               'raw_dsy': jnp.asarray(float(np.log(np.expm1(
                   kh_t * peeq_ref)))),
               'drucker': jnp.asarray(dr_t)}
    sig = calibrate.simulate_paths(th_true, CV, deps, 15, 1, peeq_ref,
                                   'implicit')

    # the unrolled gradient overflows on these paths
    def loss_unrolled(th):
        sim = calibrate.simulate_paths(th, CV, deps, 40, 1, peeq_ref)
        return jnp.mean((sim / sy_t) ** 2)

    g = jax.grad(loss_unrolled)(th_true)
    mx = max(float(jnp.max(jnp.abs(v)))
             for v in jax.tree_util.tree_leaves(g))
    assert mx > 1e15, 'expected the unrolled apex gradient to blow up'

    params, info = calibrate.fit_plasticity(deps, sig, CV,
                                            fit_drucker=True, steps=60,
                                            maxiter=15,
                                            integrator='implicit')
    assert info['loss'][-1] < 1e-12
    ct = 0.5 * (hill_t[0] + hill_t[2])
    rct = np.sqrt(ct)
    np.testing.assert_allclose(params['sy'], sy_t / rct, rtol=1e-8)
    np.testing.assert_allclose(params['drucker'], dr_t / rct, rtol=1e-6)
    np.testing.assert_allclose(params['hill'], hill_t / ct, rtol=1e-8)
