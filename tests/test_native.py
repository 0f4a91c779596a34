"""Native (C++) SVC constitutive kernel: consistency against the Python
host material through the exported UMAT parameter contract."""
import numpy as np
import pytest

import pylabfea_tpu as FE
from pylabfea_tpu.utils import native


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    path = tmp_path_factory.mktemp("umat")
    ref = FE.Material()
    ref.elasticity(E=200.e3, nu=0.3)
    ref.plasticity(sy=100., sdim=6)
    mat = FE.Material('mlj2')
    mat.dev_only = False
    mat.train_SVC(C=10, gamma=2.5, mat_ref=ref, Nlc=60, Nseq=5)
    mat.export_MLparam('test', file='native', path=str(path))
    return mat, str(path / 'native-svm.csv')


def test_native_builds(exported):
    _, csv = exported
    nm = native.NativeMLMaterial(csv)
    assert nm.props[0] > 0


def test_fsvc_matches_python(exported):
    mat, csv = exported
    nm = native.NativeMLMaterial(csv)
    rng = np.random.default_rng(2)
    for _ in range(20):
        sig = rng.normal(0., 60., 6)
        f_py = mat.calc_yf(sig)
        f_cc = nm.fsvc(sig)
        assert abs(f_py - f_cc) < 1e-10, (f_py, f_cc)


def test_grad_matches_python(exported):
    mat, csv = exported
    nm = native.NativeMLMaterial(csv)
    rng = np.random.default_rng(4)
    sig = rng.normal(0., 60., (10, 6))
    g_py = mat.calc_fgrad(sig)
    for i in range(10):
        g_cc = nm.grad_fsvc(sig[i])
        np.testing.assert_allclose(g_cc, g_py[i], atol=1e-12)


def test_step_elastic(exported):
    mat, csv = exported
    nm = native.NativeMLMaterial(csv)
    stress = np.zeros(6)
    statev = np.zeros(14)
    dstran = np.array([1e-4, -0.3e-4, -0.3e-4, 0., 0., 0.])
    fy, s, sv, dd = nm.step(stress, statev, dstran)
    assert fy < 0.
    np.testing.assert_allclose(s, mat.CV @ dstran, rtol=1e-12)
    np.testing.assert_allclose(dd, mat.CV, rtol=1e-12)


def test_step_plastic(exported):
    """Drive well into the plastic regime: stress stays near the yield locus
    and plastic strain accumulates along the flow direction."""
    mat, csv = exported
    nm = native.NativeMLMaterial(csv)
    stress = np.zeros(6)
    statev = np.zeros(14)
    deps = np.array([1e-4, -0.3e-4, -0.3e-4, 0., 0., 0.])
    for _ in range(20):
        fy, stress, statev, dd = nm.step(stress, statev, deps)
    seq = FE.sig_eq_j2(stress)
    assert 80. < seq < 120.          # pinned near sy = 100
    assert statev[6] > 1e-4          # PEEQ accumulated
    assert statev[0] > 0.            # tensile plastic strain in x


def test_step_abaqus_convention(exported):
    """Abaqus component order must give the component-swapped result."""
    mat, csv = exported
    nm = native.NativeMLMaterial(csv)
    deps_std = np.array([1e-4, -0.3e-4, -0.3e-4, 2e-5, 1e-5, 3e-5])
    deps_abq = deps_std[[0, 1, 2, 5, 4, 3]]
    f1, s1, v1, d1 = nm.step(np.zeros(6), np.zeros(14), deps_std)
    f2, s2, v2, d2 = nm.step(np.zeros(6), np.zeros(14), deps_abq, abaqus=True)
    np.testing.assert_allclose(s2[[0, 1, 2, 5, 4, 3]], s1, atol=1e-12)
    assert abs(f1 - f2) < 1e-12


def test_native_work_hardening_features(tmp_path):
    """Work-hardening parameter sets (Ndof=15): the native kernel builds the
    plastic-strain feature block like the reference UMAT (calcFSVC
    hs(7:12) = eplas/scale_wh) and extracts the hardening modulus from the
    gradient (calcGradFSVC)."""
    from tests.test_extended import _wh_matdata
    ref, md = _wh_matdata()
    mat = FE.Material('wh-native')
    mat.from_data(md)
    mat.train_SVC(C=10., gamma=1., Fe=0.8, Ce=0.95, Nseq=2)
    assert mat.Ndof == 15
    mat.export_MLparam('test', file='whn', path=str(tmp_path))
    nm = native.NativeMLMaterial(str(tmp_path / 'whn-svm.csv'))
    rng = np.random.default_rng(21)
    for _ in range(6):
        sig = rng.normal(0., 50., 6)
        epl = rng.normal(0., 3e-3, 6)
        f_py = float(mat.calc_yf(sig, epl=epl))
        f_cc = nm.fsvc_wh(sig, epl)
        assert abs(f_cc - f_py) < 1e-8
        g_py = mat.calc_fgrad(sig[None, :], epl=epl[None, :])[0]
        kh_py = mat.khard
        g_cc, kh_cc = nm.grad_fsvc_wh(sig, epl)
        np.testing.assert_allclose(g_cc, g_py, atol=1e-10)
        assert abs(kh_cc - kh_py) < 1e-8


def test_native_large_ndof_texture_props():
    """Texture-conditioned parameter sets can have Ndof > 32 (e.g. GSH_37
    gives Ndof = 52); the kernel must size its feature buffers from ndof
    instead of overrunning a fixed stack array.  Checked against a NumPy
    evaluation of the same decision function."""
    rng = np.random.default_rng(7)
    nsv, ndof = 16, 52
    gamma, rho, scale_seq = 1.3, 0.05, 50.0
    sv = rng.normal(0., 1., (nsv, ndof))
    dc = rng.normal(0., 1., nsv)
    props = np.zeros(29 + nsv + nsv * ndof)
    props[0], props[1] = nsv, ndof
    props[2], props[3], props[4] = 200e3, 80e3, 60e3   # C11, C12, C44
    props[5], props[6] = rho, gamma
    props[8], props[9] = scale_seq, 1.0
    props[29:29 + nsv] = dc
    props[29 + nsv:] = sv.ravel()
    nm = native.NativeMLMaterial(props)
    for _ in range(4):
        sig = rng.normal(0., 60., 6)
        feat = np.zeros(ndof)
        feat[:6] = sig / scale_seq
        d2 = ((feat[None, :] - sv) ** 2).sum(axis=1)
        f_np = rho + (dc * np.exp(-gamma * d2)).sum()
        assert abs(nm.fsvc(sig) - f_np) < 1e-12
        g_np = (dc[:, None] * np.exp(-gamma * d2)[:, None]
                * (-2. * gamma) * (feat[None, :] - sv)).sum(axis=0)
        np.testing.assert_allclose(nm.grad_fsvc(sig), g_np[:6] / scale_seq,
                                   atol=1e-14)


def test_umat_fortran_abi(exported):
    """The Fortran-ABI ``umat_`` symbol (full Abaqus argument list,
    CHARACTER*80 hidden length) must reproduce ``mlumat_step_abaqus`` and
    maintain the Abaqus state/energy contract: statev(1:6) plastic strain,
    statev(7) PEEQ, SSE/SPD trapezoidal work increments."""
    _, csv = exported
    nm = native.NativeMLMaterial(csv)
    rng = np.random.default_rng(3)
    stress = np.array([60., -20., 10., 5., -3., 8.])
    statev = np.zeros(14)
    dstran = rng.normal(0., 4e-4, 6) + np.array([8e-4, 0, 0, 0, 0, 0])
    sse = spd = 0.
    for _ in range(6):
        fy_ref, s_ref, sv_ref, dd_ref = nm.step(stress, statev, dstran,
                                                abaqus=True)
        s_new, sv_new, dd, sse, spd = nm.umat(stress, statev, dstran,
                                              sse=sse, spd=spd)
        np.testing.assert_allclose(s_new, s_ref, atol=1e-12)
        np.testing.assert_allclose(sv_new, sv_ref, atol=1e-12)
        np.testing.assert_allclose(dd, dd_ref, atol=1e-12)
        stress, statev = s_new, sv_new
    # plastic flow happened and was booked as dissipation
    assert statev[6] > 1e-5          # PEEQ
    assert spd > 0.
    assert sse + spd > 0.
    # energy consistency: total work equals sse + spd


def test_umat_properties_driver(exported, tmp_path):
    """The swept-angle properties driver (examples/UMAT/) replays the
    reference's Abaqus calc_properties workflow through the ``umat_``
    symbol: for a J2-trained SVC the extracted yield stresses must match
    the material's yield locus within the training tolerance."""
    import importlib.util
    import os
    mat, csv = exported
    here = os.path.join(os.path.dirname(__file__), '..', 'examples', 'UMAT')
    spec = importlib.util.spec_from_file_location(
        'calc_properties_driver',
        os.path.join(here, 'calc_properties_driver.py'))
    drv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drv)
    nm = native.NativeMLMaterial(csv)
    for ang in (0., np.pi / 3., np.pi / 2., np.pi):
        _, sig_y = drv.drive_angle(nm, ang, epc=2e-3, seq_max=250.,
                                   nsteps=150)
        assert sig_y is not None
        d01, d12, d20 = (sig_y[0] - sig_y[1], sig_y[1] - sig_y[2],
                         sig_y[2] - sig_y[0])
        seq = np.sqrt(0.5 * (d01 ** 2 + d12 ** 2 + d20 ** 2)
                      + 3. * np.sum(sig_y[3:] ** 2))
        # the extracted stress sits ON the trained yield locus (after
        # onset the non-hardening flow keeps the state on the surface,
        # drifting along it — same behavior as the Abaqus/ODB workflow);
        # locus radius within the SVC training tolerance of the J2
        # reference sy = 100
        sig_std = sig_y.copy()
        sig_std[3], sig_std[5] = sig_y[5], sig_y[3]
        assert abs(nm.fsvc(sig_std)) < 0.05
        assert abs(seq - 100.) < 25.

    spec2 = importlib.util.spec_from_file_location(
        'make_inp', os.path.join(here, 'make_inp.py'))
    mi = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(mi)
    p1, p2 = mi.write_decks(csv, str(tmp_path))
    txt = open(p1).read()
    assert f'constants={len(nm.props)}' in txt
    assert '*User Material' in txt and '*Depvar' in txt
    assert os.path.exists(p2)
