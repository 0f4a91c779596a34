"""3-D slab-decomposed (halo-plane) solver tests on the 8-device CPU mesh
(parallel/sharded3.py — the z-axis-loaded x-slab lift of the 2-D strip
decomposition, VERDICT r5 item 3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pylabfea_tpu as FE
from pylabfea_tpu.ops import constitutive as con
from pylabfea_tpu.ops import fe3d
from pylabfea_tpu.parallel import sharded3 as sh3

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 devices')


def _mat(sy=150.):
    m = FE.Material()
    m.elasticity(E=200.e3, nu=0.3)
    m.plasticity(sy=sy, khard=500., sdim=6)
    return m


def test_slab_elastic_matches_single():
    """Halo-plane Schwarz CG == single-device MG-CG on the same elastic
    3-D problem (f64, tight tolerance)."""
    dtype = jnp.float64
    mat = _mat(sy=1.e9)   # effectively elastic
    dm = con.device_material_from(mat, dtype=dtype)
    NX = NY = NZ = 8
    eps = 0.001

    md = fe3d.box_mesh(NX, NY, NZ, uniax='z', eps_tot=eps, dtype=dtype)
    st1, _ = fe3d.solve_uniaxial3(md, dm, mat.CV, nsteps=1, n_inner=1)

    sm = sh3.SlabMesh3(NX, NY, NZ, uniax='z', eps_tot=eps, n_devices=8,
                       dtype=dtype)
    sig, epl, u, hist = sh3.solve_uniaxial3_slab(sm, dm, mat.CV,
                                                 nsteps=1, n_inner=1)
    u_g = sm.gather_u(u)
    np.testing.assert_allclose(u_g, np.asarray(st1.u), atol=1e-9)
    sig_g = np.asarray(sig).reshape(-1, 6)
    np.testing.assert_allclose(sig_g, np.asarray(st1.sig), atol=1e-6)


def test_slab_plastic_matches_single_f32():
    """Elastoplastic slab solve matches the single-device fe3d solver to
    f32 tolerance (the VERDICT acceptance criterion)."""
    dtype = jnp.float32
    mat = _mat()
    dm = con.device_material_from(mat, dtype=dtype)
    NX = NY = NZ = 8
    eps = 0.002

    md = fe3d.box_mesh(NX, NY, NZ, uniax='z', eps_tot=eps, dtype=dtype)
    st1, hist1 = fe3d.solve_uniaxial3(md, dm, mat.CV, nsteps=4, n_inner=2)

    sm = sh3.SlabMesh3(NX, NY, NZ, uniax='z', eps_tot=eps, n_devices=8,
                       dtype=dtype)
    sig, epl, u, hist = sh3.solve_uniaxial3_slab(sm, dm, mat.CV,
                                                 nsteps=4, n_inner=2)
    gs = np.asarray(hist[-1][0])
    gs1 = np.asarray(hist1[-1][0])
    scale = np.abs(gs1).max()
    assert np.abs(gs - gs1).max() < 1e-4 * scale
    # plastic flow happened and matches
    epl_g = np.asarray(epl).reshape(-1, 6)
    epl_1 = np.asarray(st1.epl)
    assert np.abs(epl_1).max() > 1e-4
    assert np.abs(epl_g - epl_1).max() < 1e-6
    sig_g = np.asarray(sig).reshape(-1, 6)
    assert np.abs(sig_g - np.asarray(st1.sig)).max() < 1e-3 * scale
    u_g = sm.gather_u(u)
    assert np.abs(u_g - np.asarray(st1.u)).max() < 1e-6


def test_slab_multimaterial_inclusion():
    """Grouped 3-D inclusion on slabs: stiff elastic inclusion inside a
    J2 matrix matches the single-device grouped solver."""
    dtype = jnp.float64
    matrix = _mat()
    incl = FE.Material(num=2)
    incl.elasticity(E=600.e3, nu=0.3)
    dm_m = con.device_material_from(matrix, dtype=dtype)
    dm_i = con.device_material_from(incl, dtype=dtype)
    CV_i = np.zeros((6, 6))
    CV_i[:3, :3] = incl.C12
    np.fill_diagonal(CV_i[:3, :3], incl.C11)
    CV_i[3, 3] = CV_i[4, 4] = CV_i[5, 5] = incl.C44

    N = 8
    mm = np.zeros((N, N, N), np.int32)
    mm[3:5, 3:5, 3:5] = 1
    eps = 0.002
    md = fe3d.box_mesh(N, N, N, uniax='z', eps_tot=eps, mat_map=mm,
                       dtype=dtype)
    st1, hist1 = fe3d.solve_uniaxial3(md, (dm_m, dm_i),
                                      (matrix.CV, CV_i), nsteps=4,
                                      n_inner=2)
    sm = sh3.SlabMesh3(N, N, N, uniax='z', eps_tot=eps, n_devices=8,
                       dtype=dtype, mat_map=mm)
    sig, epl, u, hist = sh3.solve_uniaxial3_slab(
        sm, (dm_m, dm_i), (matrix.CV, CV_i), nsteps=4, n_inner=2)
    gs = np.asarray(hist[-1][0])
    gs1 = np.asarray(hist1[-1][0])
    np.testing.assert_allclose(gs, gs1, rtol=1e-6, atol=1e-6)
    epl_g = np.asarray(epl).reshape(-1, 6)
    assert np.abs(epl_g[mm.reshape(-1) == 1]).max() < 1e-12
    assert np.abs(epl_g[mm.reshape(-1) == 0]).max() > 1e-5
