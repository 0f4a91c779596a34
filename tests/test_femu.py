"""Differentiable FE (ops.femu): implicit-function-theorem derivatives
through the equilibrium solve, and full-field model updating (FEMU).

The reference package has no sensitivity/adjoint capability of any kind;
these tests pin the two contracts that make the feature real: (1) the
implicit Jacobian of the converged displacement field matches finite
differences through the complete elastoplastic solve, and (2) material
parameters are recoverable from a measured displacement field alone on an
inhomogeneous (two-material inclusion) specimen.
"""
import numpy as np
import jax
import jax.numpy as jnp

import pylabfea_tpu as FE
from pylabfea_tpu import bridge
from pylabfea_tpu.ops import femu, fe_kernels as fek, constitutive as con


def _cv_iso(E=200.e3, nu=0.3):
    hh = E / ((1 + nu) * (1 - 2 * nu))
    CV = np.zeros((6, 6))
    CV[:3, :3] = nu * hh
    np.fill_diagonal(CV[:3, :3], (1 - nu) * hh)
    CV[3, 3] = CV[4, 4] = CV[5, 5] = (0.5 - nu) * hh
    return jnp.asarray(CV)


def _mat_of(log_sy, h0=1.2):
    sy = jnp.exp(log_sy)
    return con.DeviceMaterial(
        hill=jnp.ones(6).at[0].set(h0), sy=sy, khard=jnp.asarray(300.),
        drucker=jnp.asarray(0.), sv=jnp.zeros((1, 6)), dc=jnp.zeros(1),
        rho=jnp.asarray(0.), gamma=jnp.asarray(1.), scale_seq=sy,
        scale_wh=jnp.asarray(1.), feat_mean=jnp.zeros(0),
        feat_scale=jnp.zeros(0), tex=jnp.zeros(0),
        is_svc=False, dev_only=False, sdim3=False)


def test_step_matches_production_solver():
    """The implicit step's fixed point is the production load_step's."""
    CV = _cv_iso()
    md = fek.rect_mesh(8, 8, LX=1., LY=1., uniax='y', eps_tot=0.004,
                       dtype=jnp.float64)
    mat = _mat_of(jnp.log(150.))
    st = fek.init_state(md, CV, dtype=jnp.float64)
    s = st
    for f in (0.5, 0.5):
        s, _ = fek.load_step(md, s, mat, CV, jnp.asarray(f, jnp.float64),
                             n_inner=12, cg_maxiter=600)
    u, sig, epl, _ = femu.simulate(md, mat, CV, [0.5, 0.5])
    # the bound is the production loop's own fixed-inner-count residual
    # (femu's Picard converges deeper than load_step's n_inner=12)
    assert float(jnp.max(jnp.abs(u - s.u))) < 1e-5
    assert float(jnp.max(jnp.abs(sig - s.sig))) < 2e-1


def test_implicit_jacobian_matches_finite_differences():
    """d(u field)/d(log sy) through a full elastoplastic step via
    custom_root equals central finite differences to ~1e-6."""
    CV = _cv_iso()
    md = fek.rect_mesh(6, 6, LX=1., LY=1., uniax='y', eps_tot=0.004,
                       dtype=jnp.float64)

    def field(log_sy):
        u, _, _, _ = femu.simulate(md, _mat_of(log_sy), CV, [0.5, 0.5])
        return u.ravel()

    x0 = jnp.log(150.)
    col = jax.jacfwd(field)(x0)
    eps = 1e-5
    fd = (field(x0 + eps) - field(x0 - eps)) / (2 * eps)
    denom = float(jnp.max(jnp.abs(fd)))
    assert denom > 0.
    rel = float(jnp.max(jnp.abs(col - fd))) / denom
    assert rel < 1e-5, f'implicit vs FD mismatch {rel:.2e}'


def test_femu_identifies_matrix_from_field():
    """Full-field model updating: recover the matrix yield strength and
    Hill coefficient from the displacement field of a two-material
    inclusion specimen under uniaxial tension (virtual DIC)."""
    SY_T, H0_T = 150., 1.25
    mat_m = FE.Material(num=1)
    mat_m.elasticity(E=200.e3, nu=0.3)
    mat_m.plasticity(sy=SY_T, hill=[H0_T, 0.9, 1., 1., 1., 1.],
                     khard=300., sdim=6)
    mat_i = FE.Material(num=2)
    mat_i.elasticity(E=60.e3, nu=0.3)
    N = 6
    el = np.ones((N, N))
    el[2:4, 2:4] = 2
    fe = FE.Model(dim=2, planestress=False)
    fe.geom(sect=2, LX=1., LY=1.)
    fe.assign([mat_m, mat_i])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(0.004, 'disp')
    fe.mesh(elmts=el, NX=N, NY=N)
    md, mats_true, CVs = bridge.to_device(fe, dtype=jnp.float64)
    u_meas, _, _, _ = femu.simulate(md, mats_true, CVs, [0.5, 0.5])

    incl = mats_true[1]

    def build(theta):
        sy = jnp.exp(theta['log_sy'])
        hill = jnp.asarray([0., 0.9, 1., 1., 1., 1.]).at[0].set(
            jnp.exp(theta['log_h0']))
        m = mats_true[0]._replace(hill=hill, sy=sy, scale_seq=sy)
        return (m, incl)

    theta0 = {'log_sy': jnp.log(jnp.asarray(130.)),
              'log_h0': jnp.log(jnp.asarray(1.0))}
    theta, info = femu.fit_field(md, build, theta0, CVs, [0.5, 0.5],
                                 u_meas, steps=6)
    assert info['loss'][-1] < 1e-16
    np.testing.assert_allclose(float(jnp.exp(theta['log_sy'])), SY_T,
                               rtol=1e-6)
    np.testing.assert_allclose(float(jnp.exp(theta['log_h0'])), H0_T,
                               rtol=1e-6)
