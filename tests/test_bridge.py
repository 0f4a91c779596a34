"""Host-model -> device-solver bridge tests."""
import numpy as np
import jax.numpy as jnp
import pytest

import pylabfea_tpu as FE
from pylabfea_tpu import bridge


def _model(plastic=True):
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    if plastic:
        mat.plasticity(sy=150., khard=1000., sdim=6)
    else:
        mat.plasticity(sy=1.e9, sdim=6)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom([4.], LY=4.)
    fe.assign([mat])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(0.002 * fe.leny, 'disp')
    fe.mesh(NX=16, NY=16)
    return fe


def test_bridge_matches_host_solver():
    fe_host = _model()
    fe_host.solve(min_step=20)
    fe_dev = _model()
    bridge.solve_on_device(fe_dev, nsteps=20, n_inner=4, dtype=jnp.float64)
    rel = abs(fe_dev.glob['sig'][1] - fe_host.glob['sig'][1]) / \
        abs(fe_host.glob['sig'][1])
    assert rel < 5e-3
    # element state written back; post-processing works
    assert np.isfinite([el.sig for el in fe_dev.element]).all()
    assert fe_dev.sgl.shape[0] == 21
    # reaction forces consistent: top-edge y-forces balance the stress
    uxt, uyt, fxt, fyt = fe_dev.bcval(fe_dev.notop)
    sig_from_f = fyt / (fe_dev.lenx * fe_dev.thick)
    assert abs(sig_from_f - fe_dev.glob['sig'][1]) / \
        abs(fe_dev.glob['sig'][1]) < 2e-2


def test_bridge_multimaterial_and_rejections():
    mat1 = FE.Material()
    mat1.elasticity(E=100.e3, nu=0.3)
    mat2 = FE.Material()
    mat2.elasticity(E=300.e3, nu=0.3)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom([2., 2.], LY=2.)
    fe.assign([mat1, mat2])
    fe.bcleft(0.)
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bctop(0.01 * fe.leny, 'disp')
    fe.mesh(NX=4, NY=4)
    # multi-material section models convert to grouped device meshes
    md, dms, CVs = bridge.to_device(fe)
    assert len(md.groups) == 2 and len(dms) == 2
    assert sum(s for _, s in md.groups) == fe.Nel
    # unmeshed models are rejected
    fe2 = FE.Model(dim=2, planestress=False)
    fe2.geom([2.], LY=2.)
    fe2.assign([mat1])
    with pytest.raises(ValueError, match='mesh'):
        bridge.to_device(fe2)
    # multi-material plane stress is SUPPORTED since round 4: the
    # per-material eps_33 condensation rows land in the mesh's ps_b2 planes
    fe3 = FE.Model(dim=2, planestress=True)
    fe3.geom([2., 2.], LY=2.)
    fe3.assign([mat1, mat2])
    fe3.bcleft(0.)
    fe3.bcbot(0.)
    fe3.bcright(0., 'force')
    fe3.bctop(0.01 * fe3.leny, 'disp')
    fe3.mesh(NX=4, NY=4)
    md3, dms3, CVs3 = bridge.to_device(fe3)
    assert md3.ps_b2.ndim == 3 and md3.ps_b2.shape == (8, 4, 4)
    assert len(md3.groups) == 2


def test_bridge_plane_stress():
    """Plane-stress models run on the device solver: the eps_33 row of the
    host Element's B matrix is folded into the device mesh."""
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., khard=500., sdim=6)
    def build():
        fe = FE.Model(dim=2, planestress=True)
        fe.geom([2.], LY=2.)
        fe.assign([mat])
        fe.bcleft(0.)
        fe.bcbot(0.)
        fe.bcright(0., 'force')
        fe.bctop(0.002 * fe.leny, 'disp')
        fe.mesh(NX=8, NY=8)
        return fe
    fe_h = build()
    fe_h.solve(min_step=10)
    fe_d = build()
    bridge.solve_on_device(fe_d, nsteps=40, n_inner=3, dtype=jnp.float64)
    # plane stress: sig_33 must vanish
    assert abs(fe_d.glob['sig'][2]) < 1e-6 * abs(fe_d.glob['sig'][1])
    # different load stepping near yield onset -> ~1% agreement
    assert abs(fe_d.glob['sig'][1] - fe_h.glob['sig'][1]) \
        < 1e-2 * abs(fe_h.glob['sig'][1])
    np.testing.assert_allclose(fe_d.glob['eps'], fe_h.glob['eps'], atol=1e-5)


def test_calc_properties_on_device():
    """Device-side material characterization reproduces the host
    Material.calc_properties yield strengths on all four load paths
    (the first increment is scaled to touch the yield surface, host
    calc_scf convention)."""
    def make():
        m = FE.Material()
        m.elasticity(E=200.e3, nu=0.3)
        m.plasticity(sy=150., khard=1000., sdim=6)
        return m
    mh = make()
    mh.calc_properties(eps=0.01)
    md_ = make()
    bridge.calc_properties_on_device(md_, Nel=8, eps=0.01, nsteps=40,
                                     dtype=jnp.float64)
    for sel in ('stx', 'sty', 'et2', 'ect'):
        assert abs(md_.propJ2[sel]['ys'] - mh.propJ2[sel]['ys']) \
            < 1e-6 * mh.propJ2[sel]['ys']
        assert abs(md_.prop[sel]['ys'] - mh.prop[sel]['ys']) \
            < 2e-2 * mh.prop[sel]['ys']


def test_bridge_voce_hardening_matches_host():
    """Voce saturation hardening flows through the full FE pipeline: the
    host solver (response_batch via get_sflow/get_khard) and the device
    solver (flow_stress/hard_modulus in the return map) must agree, and
    saturation must be ACTIVE (global stress well below the linear-law
    solution at the same strain)."""
    def _mk(voce):
        mat = FE.Material()
        mat.elasticity(E=200.e3, nu=0.3)
        if voce:
            mat.plasticity(sy=150., khard=200., voce_r=80., voce_b=300.,
                           sdim=6)
        else:
            mat.plasticity(sy=150., khard=200., sdim=6)
        fe = FE.Model(dim=2, planestress=False)
        fe.geom([4.], LY=4.)
        fe.assign([mat])
        fe.bcleft(0.)
        fe.bcbot(0.)
        fe.bcright(0., 'force')
        fe.bctop(0.006 * fe.leny, 'disp')
        fe.mesh(NX=8, NY=8)
        return fe

    fe_host = _mk(True)
    fe_host.solve(min_step=20)
    fe_dev = _mk(True)
    bridge.solve_on_device(fe_dev, nsteps=20, n_inner=4, dtype=jnp.float64)
    rel = abs(fe_dev.glob['sig'][1] - fe_host.glob['sig'][1]) / \
        abs(fe_host.glob['sig'][1])
    assert rel < 5e-3, f'host/device voce mismatch {rel:.2e}'
    # saturation active: well below the solution of the linear law with
    # the same INITIAL hardening slope khard + voce_r*voce_b
    mat_lin = FE.Material()
    mat_lin.elasticity(E=200.e3, nu=0.3)
    mat_lin.plasticity(sy=150., khard=200. + 80. * 300., sdim=6)
    fe2 = FE.Model(dim=2, planestress=False)
    fe2.geom([4.], LY=4.)
    fe2.assign([mat_lin])
    fe2.bcleft(0.)
    fe2.bcbot(0.)
    fe2.bcright(0., 'force')
    fe2.bctop(0.006 * fe2.leny, 'disp')
    fe2.mesh(NX=8, NY=8)
    bridge.solve_on_device(fe2, nsteps=20, n_inner=4, dtype=jnp.float64)
    assert fe_dev.glob['sig'][1] < 0.9 * fe2.glob['sig'][1]


def test_1d_bar_device_vs_host():
    """The reference's 1-D composite bar introduction (three sections,
    linear AND quadratic elements — reference model.py:262-363) on the
    DEVICE path: per-element B tables / Jacobians in the flat-layout
    kernels (section lengths differ).  Device displacements, forces and
    element states must match the host solver."""
    import jax.numpy as jnp
    from pylabfea_tpu import bridge

    mat1 = FE.Material(num=1)
    mat1.elasticity(E=100.e3, nu=0.35)
    mat2 = FE.Material(num=2)
    mat2.elasticity(E=300.e3, nu=0.3)

    for SF in (1, 2):
        def build():
            fe = FE.Model(dim=1)
            fe.geom([2., 1., 2.])
            fe.assign([mat1, mat2, mat1])
            fe.bcleft(0.)
            fe.bcright(0.01 * fe.lenx, 'disp')
            fe.mesh(NX=10, SF=SF)
            return fe

        fe_h = build()
        fe_h.solve()
        fe_h.calc_global()
        fe_d = build()
        bridge.solve_on_device(fe_d, nsteps=1, n_inner=1,
                               dtype=jnp.float64, cg_tol=1e-13)
        np.testing.assert_allclose(fe_d.u, fe_h.u, rtol=1e-9, atol=1e-12,
                                   err_msg=f'SF={SF}')
        np.testing.assert_allclose(fe_d.glob['sig'], fe_h.glob['sig'],
                                   rtol=1e-9, atol=1e-8)
        sig_h = np.array([el.sig[0] for el in fe_h.element])
        sig_d = np.array([el.sig[0] for el in fe_d.element])
        np.testing.assert_allclose(sig_d, sig_h, rtol=1e-9)

    # elastic-plastic bar: J2 section between elastic sections
    mp = FE.Material(num=3)
    mp.elasticity(E=200.e3, nu=0.3)
    mp.plasticity(sy=150., khard=500., sdim=6)

    def build_pl():
        fe = FE.Model(dim=1)
        fe.geom([2., 2.])
        fe.assign([mat1, mp])
        fe.bcleft(0.)
        fe.bcright(0.01 * fe.lenx, 'disp')
        fe.mesh(NX=8)
        return fe

    fe_h = build_pl()
    fe_h.solve()
    fe_h.calc_global()
    fe_d = build_pl()
    bridge.solve_on_device(fe_d, nsteps=20, n_inner=4, dtype=jnp.float64,
                           cg_tol=1e-13)
    assert fe_h.glob['epl'][0] > 1e-4      # plastic flow actually happened
    rel = abs(fe_d.glob['sig'][0] - fe_h.glob['sig'][0]) \
        / abs(fe_h.glob['sig'][0])
    assert rel < 5e-3, f'1-D plastic bar device/host mismatch {rel:.2e}'


def test_adaptive_resume_matches_host():
    """Continued loading (reference model.py:1214-1239, 1446-1447): solve,
    raise the BCs, solve again — the device adaptive driver must resume
    from the stored state with the host's BC-memory semantics instead of
    restarting, and append to the global history."""
    def build():
        mat = FE.Material()
        mat.elasticity(E=200.e3, nu=0.3)
        mat.plasticity(sy=150., khard=1000., sdim=6)
        fe = FE.Model(dim=2, planestress=False)
        fe.geom([4.], LY=4.)
        fe.assign([mat])
        fe.bcleft(0.)
        fe.bcbot(0.)
        fe.bcright(0., 'force')
        fe.bctop(0.0012 * fe.leny, 'disp')
        fe.mesh(NX=8, NY=8)
        return fe

    host = build()
    host.solve()
    host.bctop(0.002 * host.leny, 'disp')
    host.solve()

    dev = build()
    bridge.solve_on_device_adaptive(dev, dtype=jnp.float64, fast=False)
    n_hist1 = len(dev.sgl)
    dev.bctop(0.002 * dev.leny, 'disp')
    bridge.solve_on_device_adaptive(dev, dtype=jnp.float64, fast=False)
    assert len(dev.sgl) > n_hist1          # history appended, not replaced
    assert len(dev.sgl) == len(host.sgl)
    np.testing.assert_allclose(dev.bct_mem, host.bct_mem, atol=1e-12)

    sig_h = np.array([e.sig for e in host.element])
    sig_d = np.array([e.sig for e in dev.element])
    epl_h = np.array([e.epl for e in host.element])
    epl_d = np.array([e.epl for e in dev.element])
    assert np.abs(sig_d - sig_h).max() < 1e-3
    assert np.abs(epl_d - epl_h).max() < 1e-7
    np.testing.assert_allclose(dev.u, host.u, atol=1e-7)
    np.testing.assert_allclose(dev.glob['sig'], host.glob['sig'],
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(dev.sgl, host.sgl, rtol=1e-5, atol=1e-3)
