"""FE model + analytic-plasticity regression tests.

Golden values are the reference numerical contract
(pyLabFEA v4.4.2, tests/test_basic.py).
"""
import numpy as np
import pytest

import pylabfea_tpu as FE


@pytest.fixture(scope="module")
def elastic_laminate():
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
    return fem_v, mat1, mat2


@pytest.fixture(scope="module")
def plastic_model(elastic_laminate):
    _, mat1, mat2 = elastic_laminate
    fem2 = FE.Model(dim=2, planestress=False)
    fem2.geom([2, 2], LY=4.)
    mat2.plasticity(sy=150., khard=500., sdim=3)
    fem2.assign([mat1, mat2])
    fem2.bcleft(0.)
    fem2.bcbot(0.)
    fem2.bcright(0., 'force')
    fem2.bctop(0.1 * fem2.leny, 'disp')
    fem2.mesh(NX=4, NY=4)
    fem2.solve()
    fem2.calc_global()
    return fem2, mat2


def test_material(elastic_laminate):
    _, mat1, _ = elastic_laminate
    assert np.abs(mat1.C11 - 160493.8271604938) < 1e-5
    assert np.abs(mat1.C12 - 86419.75308641973) < 1e-5
    assert np.abs(mat1.C44 - 37037.03703703704) < 1e-5


def test_model(elastic_laminate, plastic_model):
    fem_v, mat1, mat2 = elastic_laminate
    fem2, _ = plastic_model
    mod_stiff = fem_v.glob['sig'][1] / fem_v.glob['eps'][1]
    voigt_stiff = 6. / 8. * mat1.E + 2. / 8. * 300.e3
    assert np.abs(voigt_stiff - mod_stiff) < 1e-5
    assert np.abs(fem2.glob['sig'][1] - fem2.glob['sbc2']) < 1e-5
    assert np.abs(fem2.glob['eps'][1] - fem2.glob['ebc2']) < 1e-5
    assert np.abs(fem2.glob['epl'][1] - 0.04966042764325635) < 1e-5


def test_plasticity(plastic_model):
    _, mat2 = plastic_model
    mat2.plasticity(sy=150., hill=[0.7, 1., 1.4], khard=100., sdim=3)
    mat2.calc_properties(eps=0.05)
    assert np.abs(mat2.propJ2['stx']['ys'] - 146.38501094227996) < 1e-5
    assert np.abs(mat2.propJ2['sty']['seq'][-1] - 168.5141123395444) < 1e-5
    assert np.abs(mat2.propJ2['sty']['peeq'][-1] - 0.04969421741530513) < 1e-5
    assert np.abs(mat2.propJ2['et2']['ys'] - 136.93063937629154) < 1e-5
    assert np.abs(mat2.propJ2['ect']['peeq'][-1] - 0.04570405456408677) < 1e-5
    assert np.abs(mat2.propJ2['ect']['seq'][-1] - 168.3199594723871) < 1e-5


def test_workhard():
    mat3 = FE.Material()
    mat3.elasticity(E=300.e3, nu=0.3)
    mat3.plasticity(sy=150., khard=2000.)
    mat3.calc_properties(eps=0.1, sigeps=True)
    assert np.abs(mat3.propJ2['stx']['seq'][-1] - 347.68211920529546) < 1e-5
    assert np.abs(mat3.propJ2['sty']['peeq'][-1] - 0.09883666666666659) < 1e-5
    assert np.abs(mat3.sigeps['et2']['sig'][-1][0] - 307.1334214002634) < 1e-5
    assert np.abs(mat3.sigeps['ect']['sig'][-1][0] + 192.15895530336059) < 1e-5


def test_hill_6p():
    mat4 = FE.Material()
    mat4.elasticity(E=200.e3, nu=0.3)
    mat4.plasticity(sy=100., hill=[0.7, 1., 1.4, 1., 1.2, 0.8], khard=100.,
                    sdim=6)
    mat4.calc_properties(eps=0.05, sigeps=True)
    assert np.abs(mat4.propJ2['stx']['peeq'][-1] - 0.05039661) < 1e-5
    assert np.abs(mat4.propJ2['sty']['seq'][-1] - 114.28035811) < 1e-5
    assert np.abs(mat4.sigeps['et2']['sig'][-1][1] - 102.534840) < 1e-5
    assert np.abs(mat4.sigeps['ect']['sig'][-1][0] + 54.6031702) < 1e-5


def test_bcnode():
    NX = NY = 18
    el = np.ones((NX, NY))
    el[6:12, 6:12] = 2
    mat1 = FE.Material(num=1)
    mat1.elasticity(E=100.e3, nu=0.27)
    mat2 = FE.Material(num=2)
    mat2.elasticity(E=3.e3, nu=0.3)
    fe = FE.Model(dim=2, planestress=False)
    fe.geom(sect=2, LX=4., LY=4.)
    fe.assign([mat1, mat2])
    fe.bcbot(0.)
    fe.bcright(0., 'force')
    fe.bcleft(0., 'force')
    fe.bctop(0.01 * fe.leny, 'disp')
    fe.mesh(elmts=el, NX=NX, NY=NY)
    hh = [no in fe.nobot for no in fe.noleft]
    noc = np.nonzero(hh)[0]
    fe.bcnode(noc, 0., 'disp', 'x')
    fe.solve()
    assert np.abs(fe.u[684] + 9.730777232237817e-3) < 1e-5
    assert np.abs(fe.element[0].sig[5] - 2.2990816342732256) < 1e-5
    assert np.abs(fe.element[5 * NY + 7].sig[0] - 45.68020736256676) < 1e-5
    assert np.abs(fe.element[6 * NY + 7].sig[1] - 69.16252458086865) < 1e-5
    assert noc == [0]


def test_scalar_response_equals_batch():
    """Scalar Material.response must agree with response_batch lanes."""
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=100., hill=[0.7, 1., 1.4, 1., 1.2, 0.8], khard=100.,
                   sdim=6)
    rng = np.random.default_rng(7)
    CV = mat.CV
    sig = rng.normal(0., 50., (12, 6))
    epl = rng.normal(0., 1e-3, (12, 6))
    deps = rng.normal(0., 2e-3, (12, 6))
    fy_b, s_b, dp_b, g_b, _ = mat.response_batch(sig, epl, deps, CV)
    for i in range(12):
        fy, s, dp, g = mat.response(sig[i], epl[i], deps[i], CV)
        assert np.abs(fy - fy_b[i]) < 1e-12
        np.testing.assert_allclose(s, s_b[i], atol=1e-10)
        np.testing.assert_allclose(dp, dp_b[i], atol=1e-12)
        np.testing.assert_allclose(g, g_b[i], atol=1e-8)


def test_user_mesh_elmts_nodes():
    """User-supplied meshes: ``elmts`` assigns section numbers per element
    (reference model.py:772 'elmts : (NX, NY) array'); result must match the
    laminate generated from ``geom`` sections.  ``nodes`` supplies explicit
    positions for the regular grid."""
    import pylabfea_tpu as FE

    mat1 = FE.Material(num=1)
    mat1.elasticity(E=300.e3, nu=0.3)
    mat2 = FE.Material(num=2)
    mat2.elasticity(E=100.e3, nu=0.3)

    def make(elmts=None, nodes=None):
        fe = FE.Model(dim=2, planestress=True)
        fe.geom([2, 2], LY=2.)
        fe.assign([mat1, mat2])
        fe.bcbot(0.)
        fe.bcleft(0.)
        fe.bcright(0., 'force')
        fe.bctop(0.004 * fe.leny, 'disp')
        if elmts is None:
            fe.mesh(NX=4, NY=2)
        else:
            fe.mesh(elmts=elmts, nodes=nodes)
        fe.solve()
        return fe

    fe_ref = make()
    # same laminate expressed as an explicit element->section map
    elmts = np.array([[1, 1], [1, 1], [2, 2], [2, 2]])
    fe_usr = make(elmts=elmts)
    np.testing.assert_allclose(fe_usr.u, fe_ref.u, atol=1e-10)
    for ea, eb in zip(fe_usr.element, fe_ref.element):
        np.testing.assert_allclose(ea.sig, eb.sig, atol=1e-8)

    # nodes path: the reference demands len(ravel(nodes)) == Nnode
    # (model.py:812), which rejects (Nnode, 2) coordinate arrays in 2-D —
    # replicated faithfully
    fe_n = FE.Model(dim=2, planestress=True)
    fe_n.geom([2, 2], LY=2.)
    fe_n.assign([mat1, mat2])
    npos = np.array(fe_ref.npos).reshape(-1, 2)
    with pytest.raises(ValueError):
        fe_n.mesh(elmts=elmts, nodes=npos)

    # mismatched elmts dimensionality must be rejected
    fe_d = FE.Model(dim=2, planestress=True)
    fe_d.geom([2, 2], LY=2.)
    fe_d.assign([mat1, mat2])
    with pytest.raises(ValueError):
        fe_d.mesh(elmts=np.array([1, 1, 2, 2]))
