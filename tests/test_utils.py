"""Checkpoint/resume, profiling, and multigrid unit tests."""
import numpy as np
import jax.numpy as jnp


import pylabfea_tpu as FE
from pylabfea_tpu.ops import fe_kernels as fek, multigrid as mg, \
    constitutive as con
from pylabfea_tpu.utils import checkpoint as ckpt
from pylabfea_tpu.utils.profiling import StepTimer


def _elastic_cv(E=200.e3, nu=0.3):
    hh = E / ((1. + nu) * (1. - 2. * nu))
    CV = np.zeros((6, 6))
    CV[:3, :3] = nu * hh
    np.fill_diagonal(CV[:3, :3], (1. - nu) * hh)
    CV[3, 3] = CV[4, 4] = CV[5, 5] = (0.5 - nu) * hh
    return CV


def test_solver_state_checkpoint(tmp_path):
    md = fek.rect_mesh(8, 8, dtype=jnp.float64)
    state = fek.init_state(md, _elastic_cv(), dtype=jnp.float64)
    state = state._replace(u=state.u + 1.5)
    p = tmp_path / 'state.npz'
    ckpt.save_state(p, state, meta={'step': 3})
    loaded, meta = ckpt.load_state(p)
    assert meta['step'] == 3
    np.testing.assert_array_equal(np.asarray(loaded.u), np.asarray(state.u))
    np.testing.assert_array_equal(np.asarray(loaded.elstiff),
                                  np.asarray(state.elstiff))


def test_model_checkpoint_resume(tmp_path):
    """Checkpoint mid-loading, restore into a fresh model, final states match
    an uninterrupted run."""
    def build():
        mat = FE.Material()
        mat.elasticity(E=200.e3, nu=0.3)
        mat.plasticity(sy=150., khard=500., sdim=6)
        fe = FE.Model(dim=2, planestress=False)
        fe.geom([2.], LY=2.)
        fe.assign([mat])
        fe.bcleft(0.)
        fe.bcbot(0.)
        fe.bcright(0., 'force')
        fe.bctop(0.002 * fe.leny, 'disp')
        fe.mesh(NX=4, NY=4)
        return fe

    # uninterrupted: 0.002 then 0.004
    fe_a = build()
    fe_a.solve()
    fe_a.bctop(0.004 * fe_a.leny, 'disp')
    fe_a.solve()

    # interrupted: checkpoint after first stage, restore into fresh model
    fe_b = build()
    fe_b.solve()
    p = tmp_path / 'model.npz'
    ckpt.save_model(p, fe_b, meta={'loaded_to': 0.002})
    fe_c = build()
    fe_c.solve()  # populate attributes; state will be overwritten
    meta = ckpt.load_model(p, fe_c)
    assert meta['loaded_to'] == 0.002
    fe_c.bctop(0.004 * fe_c.leny, 'disp')
    fe_c.solve()
    np.testing.assert_allclose(fe_c.u, fe_a.u, atol=1e-10)
    np.testing.assert_allclose(fe_c.element[3].sig, fe_a.element[3].sig,
                               atol=1e-9)


def test_step_timer():
    t = StepTimer()
    for k in range(3):
        with t.step():
            pass
        t.note(iters=k + 1)
    s = t.summary()
    assert s['steps'] == 3
    assert s['iters_max'] == 3


def test_multigrid_mesh_independent_iterations():
    """MG-CG iteration count must not grow with mesh refinement."""
    CV = _elastic_cv()
    iters = []
    for N in (16, 32, 64):
        md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.001,
                           dtype=jnp.float64)
        elstiff = jnp.broadcast_to(jnp.asarray(CV), (md.nel, 6, 6))
        Ke = fek.element_stiffness(md, elstiff)
        bc = md.fixed_val
        vm = fek.gather_element(md, jnp.where(md.fixed, bc, 0.))
        rhs = jnp.where(md.fixed, bc, -fek.scatter_element(
            md, jnp.einsum('eij,ej->ei', Ke, vm)))
        x0 = jnp.where(md.fixed, bc, 0.)
        levels = mg.build_hierarchy(md, elstiff)
        # mg solver operates on per-component plane tuples
        xT, res, it = mg.mg_cg_solve(levels, (rhs[0], rhs[1]),
                                     (x0[0], x0[1]), tol=1e-10, maxiter=200)
        x = jnp.stack(xT, 0)
        assert float(res) < 1e-9
        iters.append(int(it))
        # solution must match plain Jacobi-CG
        xj, resj, itj = fek.cg_solve(lambda v: fek.k_apply(md, Ke, v), rhs,
                                     x0, fek.k_diag(md, Ke), tol=1e-12,
                                     maxiter=20000)
        np.testing.assert_allclose(np.asarray(x), np.asarray(xj), atol=1e-8)
    assert max(iters) <= iters[0] + 5  # no growth with refinement


def test_coarse_bottom_pseudo_inverse_robust():
    """Displacement pins that sit only at ODD grid indices must survive
    coarsening (pin-preserving mask), the bottom pseudo-inverse must stay
    finite even for a deliberately unconstrained operator, and MG-CG must
    converge on the odd-pin problem."""
    CV = _elastic_cv()
    md = fek.rect_mesh(16, 16, LX=1., LY=1., uniax='y', eps_tot=0.001,
                       dtype=jnp.float64)
    fixed = np.zeros(np.asarray(md.fixed).shape, dtype=bool)
    fixed[0, 1, 1] = fixed[1, 1, 1] = True
    fixed[0, 15, 3] = True
    fixed[1, 3, 15] = True
    md = md._replace(fixed=jnp.asarray(fixed),
                     fixed_val=jnp.zeros_like(md.fixed_val))
    elstiff = jnp.broadcast_to(jnp.asarray(CV), (md.nel, 6, 6))
    levels = mg.build_hierarchy(md, elstiff)
    bot = levels[-1]
    assert bot.kc_inv is not None
    # the odd-index pins map to their neighbouring coarse nodes
    assert np.asarray(jnp.any(bot.fixed[0])) \
        and np.asarray(jnp.any(bot.fixed[1]))
    assert np.isfinite(np.asarray(bot.kc_inv)).all()
    rng = np.random.default_rng(0)
    b = rng.normal(0., 1., (2, 17, 17))
    b[fixed] = 0.
    bT = (jnp.asarray(b[0]), jnp.asarray(b[1]))
    x0 = tuple(jnp.zeros((17, 17), jnp.float64) for _ in range(2))
    xT, res, it = mg.mg_cg_solve(levels, bT, x0, tol=1e-8, maxiter=400)
    assert np.isfinite(np.asarray(xT[0])).all()
    assert float(res) < 1e-8
    # secondary guard: a bottom operator with NO pins at all (rigid-body
    # nullspace) must still produce a finite pseudo-inverse
    md0 = fek.rect_mesh(8, 8, LX=1., LY=1., uniax='none', eps_tot=0.,
                        dtype=jnp.float64)
    lv0 = mg.build_hierarchy(md0, jnp.broadcast_to(jnp.asarray(CV),
                                                   (md0.nel, 6, 6)),
                             min_size=4)
    assert np.isfinite(np.asarray(lv0[-1].kc_inv)).all()


def test_coarse_bottom_identity_rows_not_clipped_f32():
    """float32 regression (round-3): the bottom operator mixes identity
    rows (eigenvalue 1) with stiffness-scale rows (~1e5); an un-equilibrated
    relative clip cut the BC passthrough and soft bending modes, breaking
    the single-level dense bottom solve on slender f32 meshes (16x4 strip
    deviated 2.7e-2 from the reference path).  The equilibrated
    pseudo-inverse must act as the true inverse: K @ (Kinv @ b) == b."""
    CV = _elastic_cv()
    md = fek.rect_mesh(16, 4, LX=4., LY=1., uniax='y', eps_tot=0.002,
                       dtype=jnp.float32)
    elstiff = jnp.broadcast_to(jnp.asarray(CV, jnp.float32),
                               (md.nel, 6, 6))
    levels = mg.build_hierarchy(md, elstiff, min_size=8)
    assert len(levels) == 1 and levels[0].kc_inv is not None
    lv = levels[0]
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(0., 1., (2, 17, 5)), jnp.float32)
    x = lv.kc_inv @ jnp.concatenate([b[0].ravel(), b[1].ravel()])
    xT = (x[:17 * 5].reshape(17, 5), x[17 * 5:].reshape(17, 5))
    back = fek.k_apply_t(md, lv.Ke, xT, lv.fixed)
    resid = np.abs(np.asarray(back[0]) - np.asarray(b[0])).max()
    assert resid < 1e-2 * float(np.abs(np.asarray(b)).max())


def test_hierarchy_reuse_across_steps_bitwise():
    """Threading the multigrid hierarchy across load steps (kes0) must be
    bitwise-invisible: it is only passed when the previous step's final
    response replaced no element stiffness, so the reused Galerkin planes
    equal what the next step would rebuild."""
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
    dm = con.device_material_from(mat, dtype=jnp.float64)
    CV = np.asarray(mat.CV)
    md = fek.rect_mesh(16, 16, uniax='y', eps_tot=0.004, dtype=jnp.float64)
    # threaded path (solve_uniaxial passes kes0 when dstiff <= 1e-3)
    st_t, hist_t = fek.solve_uniaxial(md, dm, CV, nsteps=6, n_inner=2,
                                      dtype=jnp.float64)
    # manual loop without threading
    st_m = fek.init_state(md, CV, dtype=jnp.float64)
    du0 = None
    for _ in range(6):
        st_m, d = fek.load_step_split(md, st_m, dm, CV, 1. / 6,
                                      n_inner=2, du0=du0)
        du0 = d['du']
    assert np.array_equal(np.asarray(st_t.sig), np.asarray(st_m.sig))
    assert np.array_equal(np.asarray(st_t.u), np.asarray(st_m.u))


def test_pallas_interpret_decision():
    from pylabfea_tpu.ops.pallas_kernels import svc_decision_pallas
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (100, 6)).astype(np.float32)
    sv = rng.normal(0, 1, (64, 6)).astype(np.float32)
    dc = rng.normal(0, 1, 64).astype(np.float32)
    out = np.asarray(svc_decision_pallas(jnp.asarray(x), jnp.asarray(sv),
                                         jnp.asarray(dc), 2.5, 0.3,
                                         interpret=True))
    d2 = ((x[:, None, :] - sv[None, :, :]) ** 2).sum(-1)
    ref = np.exp(-2.5 * d2) @ dc + 0.3
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_chebyshev_smoother_option():
    """The Chebyshev smoother option converges like (or better than) damped
    Jacobi on the elastic operator."""
    CV = _elastic_cv()
    md = fek.rect_mesh(32, 32, LX=1., LY=1., uniax='y', eps_tot=0.001,
                       dtype=jnp.float64)
    el = jnp.broadcast_to(jnp.asarray(CV).reshape(36, 1, 1), (36, 32, 32))
    bc = md.fixed_val
    iters = {}
    for sm in ('jacobi', 'chebyshev'):
        mg.SMOOTHER = sm
        fek.solve_linear.clear_cache()
        du, res, it = fek.solve_linear(md, el, bc, cg_tol=1e-10,
                                       cg_maxiter=100)
        assert float(res) < 1e-10
        iters[sm] = int(it)
    mg.SMOOTHER = 'jacobi'
    fek.solve_linear.clear_cache()
    assert iters['chebyshev'] <= iters['jacobi'] + 2


def test_galerkin_coarsening_exact():
    """galerkin_coarsen_Ke must satisfy <Kc v, w> == <K P v, P w> (exact
    RAP of the V-cycle's bilinear prolongation) on a rough tangent field."""
    rng = np.random.default_rng(0)
    md = fek.rect_mesh(16, 16, dtype=jnp.float64)
    E = jnp.asarray(rng.uniform(0.5, 2.0, (6, 6, 16, 16)) * 1e5)
    E = 0.5 * (E + jnp.transpose(E, (1, 0, 2, 3)))
    els = (E + 3e5 * jnp.eye(6)[:, :, None, None]).reshape(36, 16, 16)
    Kf = fek.element_stiffness_planes(md, els)
    Kc = mg.galerkin_coarsen_Ke(Kf)
    mdc = mg.coarsen_mesh(md)
    v = tuple(jnp.asarray(rng.normal(size=(9, 9))) for _ in range(2))
    w = tuple(jnp.asarray(rng.normal(size=(9, 9))) for _ in range(2))
    nofix_c = tuple(jnp.zeros((9, 9), bool) for _ in range(2))
    nofix_f = tuple(jnp.zeros((17, 17), bool) for _ in range(2))
    lhs = fek._dot(fek.k_apply_t(mdc, Kc, v, nofix_c), w)
    rhs = fek._dot(fek.k_apply_t(md, Kf, mg.prolong(v, 17, 17), nofix_f),
                   mg.prolong(w, 17, 17))
    assert abs(float(lhs - rhs)) < 1e-10 * abs(float(rhs))
