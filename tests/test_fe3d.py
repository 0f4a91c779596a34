"""3-D hex8 device solver (ops/fe3d.py) — a capability beyond the
reference package (its Model supports dim 1/2 only, reference
model.py:157-197).  Validation anchors: exact linear-field reproduction
of the hex8 B operator, analytic uniaxial elasticity/plasticity,
plane-strain cross-parity against the validated 2-D device path, and the
grouped multi-material return map on an embedded-inclusion box."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pylabfea_tpu as FE
from pylabfea_tpu.ops import fe3d, fe_kernels as fek, constitutive as con


E, NU, SY, KH = 200.e3, 0.3, 150., 500.


def _j2_mat():
    m = FE.Material()
    m.elasticity(E=E, nu=NU)
    m.plasticity(sy=SY, khard=KH, sdim=6)
    return m


def _elastic_CV():
    m = FE.Material()
    m.elasticity(E=E, nu=NU)
    CV = np.zeros((6, 6))
    CV[:3, :3] = m.C12
    np.fill_diagonal(CV[:3, :3], m.C11)
    CV[3, 3] = CV[4, 4] = CV[5, 5] = m.C44
    return m, CV


def test_hex_B_exact_on_linear_fields():
    """The hex8 B operator reproduces any linear displacement field's
    constant (engineering) strain exactly at every Gauss point."""
    lx, ly, lz = 0.7, 1.3, 2.1
    B = fe3d._hex_B(lx, ly, lz)
    A = np.array([[0.1, 0.2, 0.3], [0.05, -0.1, 0.15], [-0.2, 0.08, 0.12]])
    u = np.zeros(24)
    for a, (dx, dy, dz) in enumerate(fe3d._CORNERS3):
        u[3 * a:3 * a + 3] = A @ np.array([dx * lx, dy * ly, dz * lz])
    eps = B @ u
    expect = np.array([A[0, 0], A[1, 1], A[2, 2],
                       A[1, 2] + A[2, 1], A[0, 2] + A[2, 0],
                       A[0, 1] + A[1, 0]])
    np.testing.assert_allclose(eps, np.tile(expect, (8, 1)), atol=1e-14)


def test_hex_B_modes_exact_gauss_sum():
    """The 7-mode parity factorization (fe3d._hex_B_modes) reproduces the
    8-point Gauss sum of B^T C B exactly — the identity the fused Pallas
    volume kernel relies on (sign-symmetric points kill cross moments of
    the parity monomials)."""
    rng = np.random.default_rng(3)
    lx, ly, lz = 0.7, 1.3, 2.1
    A = rng.normal(size=(6, 6))
    C = A @ A.T + 6. * np.eye(6)          # SPD like a tangent
    B = np.asarray(fe3d._hex_B(lx, ly, lz))          # (8, 6, 24)
    ref = sum(B[g].T @ C @ B[g] for g in range(8))
    modes = fe3d._hex_B_modes(lx, ly, lz)
    assert len(modes) == 7
    got = np.zeros((24, 24))
    nnz = 0
    for Bm, w, rows in modes:
        M = np.asarray(Bm)
        got += w * (M.T @ C @ M)
        nnz += np.count_nonzero(M)
        # the advertised active strain rows are exact, not thresholded
        assert set(rows) == {a for a in range(6) if np.any(M[a])}
    assert nnz == 288                       # vs 576 across the 8 GP set
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13)


def test_elastic_uniaxial_analytic():
    """Roller-supported box pulled in z: exact uniaxial stress state —
    sig_zz = E * eps, lateral strains -nu * eps, homogeneous field."""
    mat, CV = _elastic_CV()
    dm = con.device_material_from(mat, dtype=jnp.float64)
    md = fe3d.box_mesh(4, 4, 4, uniax='z', eps_tot=0.001,
                       dtype=jnp.float64)
    state, hist = fe3d.solve_uniaxial3(md, dm, CV, nsteps=1, n_inner=1)
    gs, ge, _ = hist[-1]
    np.testing.assert_allclose(np.asarray(gs)[2], E * 0.001, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gs)[[0, 1, 3, 4, 5]], 0.,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ge)[:2], -NU * 0.001, rtol=1e-9)
    sig = np.asarray(state.sig)
    assert np.abs(sig - sig.mean(0)).max() < 1e-8


def test_elastic_face_force():
    """Force-controlled top face: total force F on area A gives
    sig_zz = F / A (trapezoid node distribution of make_face_bcs)."""
    mat, CV = _elastic_CV()
    dm = con.device_material_from(mat, dtype=jnp.float64)
    F = 120.
    bc = dict(xlo={0: ('disp', 0.)}, ylo={1: ('disp', 0.)},
              zlo={2: ('disp', 0.)}, zhi={2: ('force', F)})
    md = fe3d.box_mesh(3, 3, 3, LX=2., LY=1.5, LZ=1., uniax='none', bc=bc,
                       dtype=jnp.float64)
    state, hist = fe3d.solve_uniaxial3(md, dm, CV, nsteps=1, n_inner=1)
    gs = np.asarray(hist[-1][0])
    np.testing.assert_allclose(gs[2], F / (2. * 1.5), rtol=1e-8)
    np.testing.assert_allclose(gs[[0, 1, 3, 4, 5]], 0., atol=1e-8)


def test_plastic_uniaxial_closed_form():
    """J2 + linear hardening uniaxial flow stress: the homogeneous state
    satisfies sig = (sy + khard * eps) * E / (E + khard) exactly
    (elastic-plastic strain split; Crisfield Ch. 6 closed form, the
    anchor the host-path tests use)."""
    mat = _j2_mat()
    dm = con.device_material_from(mat, dtype=jnp.float64)
    eps = 0.002
    md = fe3d.box_mesh(2, 2, 2, uniax='z', eps_tot=eps, dtype=jnp.float64)
    state, hist = fe3d.solve_uniaxial3(md, dm, mat.CV, nsteps=8, n_inner=2)
    expect = (SY + KH * eps) * E / (E + KH)
    gs = np.asarray(hist[-1][0])
    np.testing.assert_allclose(gs[2], expect, rtol=1e-6)
    sig = np.asarray(state.sig)
    assert np.abs(sig - sig.mean(0)).max() < 1e-8
    peeq = np.asarray(state.epl)[:, :3]
    np.testing.assert_allclose(peeq.sum(1), 0., atol=1e-12)  # incompressible


def test_plane_strain_parity_with_2d_device_path():
    """An 8 x 8 x 1 box with u_z pinned on both z faces IS the 2-D
    plane-strain problem: global stresses must match the validated 2-D
    device solver to solver tolerance through the elastoplastic range."""
    mat = _j2_mat()
    dm = con.device_material_from(mat, dtype=jnp.float64)
    eps = 0.002
    md2 = fek.rect_mesh(8, 8, uniax='y', eps_tot=eps, dtype=jnp.float64)
    _, h2 = fek.solve_uniaxial(md2, dm, mat.CV, nsteps=8, n_inner=2,
                               dtype=jnp.float64)
    bc = dict(xlo={0: ('disp', 0.)}, ylo={1: ('disp', 0.)},
              zlo={2: ('disp', 0.)}, zhi={2: ('disp', 0.)},
              yhi={1: ('disp', eps)})
    md3 = fe3d.box_mesh(8, 8, 1, uniax='none', bc=bc, dtype=jnp.float64)
    _, h3 = fe3d.solve_uniaxial3(md3, dm, mat.CV, nsteps=8, n_inner=2)
    for (g2, e2, _), (g3, e3, _) in zip(h2, h3):
        np.testing.assert_allclose(np.asarray(g3), np.asarray(g2),
                                   atol=1e-8)


def test_multimaterial_inclusion():
    """Embedded stiff elastic cube in a plastic matrix (the 3-D analogue
    of the reference's flagship inclusion workload,
    train_hill.py:110-167): grouped return maps, symmetric response, and
    the composite flow stress sits between the matrix's and the elastic
    slope."""
    matrix = _j2_mat()
    incl = FE.Material(num=2)
    incl.elasticity(E=3. * E, nu=NU)
    dm_m = con.device_material_from(matrix, dtype=jnp.float64)
    dm_i = con.device_material_from(incl, dtype=jnp.float64)
    _, CVi = _elastic_CV()
    CVi = None
    CV_i = np.zeros((6, 6))
    CV_i[:3, :3] = incl.C12
    np.fill_diagonal(CV_i[:3, :3], incl.C11)
    CV_i[3, 3] = CV_i[4, 4] = CV_i[5, 5] = incl.C44

    N = 6
    mm = np.zeros((N, N, N), np.int32)
    mm[2:4, 2:4, 2:4] = 1           # centered 2x2x2 inclusion
    eps = 0.002
    md = fe3d.box_mesh(N, N, N, uniax='z', eps_tot=eps, mat_map=mm,
                       dtype=jnp.float64)
    assert md.groups is not None and len(md.groups) == 2
    state, hist = fe3d.solve_uniaxial3(md, (dm_m, dm_i),
                                       (matrix.CV, CV_i), nsteps=8,
                                       n_inner=2)
    gs = np.asarray(hist[-1][0])
    pure = (SY + KH * eps) * E / (E + KH)
    assert gs[2] > pure                # stiff inclusion raises the composite
    assert gs[2] < E * eps             # but it still yields
    # symmetry of the centered inclusion: sig_xx == sig_yy globally
    np.testing.assert_allclose(gs[0], gs[1], atol=1e-6)
    # the inclusion stays elastic
    epl = np.asarray(state.epl)
    mm_flat = mm.reshape(-1)
    assert np.abs(epl[mm_flat == 1]).max() < 1e-12
    assert np.abs(epl[mm_flat == 0]).max() > 1e-5


def test_mg_iterations_mesh_independent():
    """The V-cycle-preconditioned CG converges in a mesh-size-independent
    iteration count (the property that makes 3-D scale; plain Jacobi-CG
    grows ~linearly in N).  Tested on the bare MG-CG program — the full
    step program's compile cost is paid elsewhere in this file."""
    mat, CV = _elastic_CV()
    iters = []
    for N in (8, 16):
        md = fe3d.box_mesh(N, N, N, uniax='z', eps_tot=0.001,
                           dtype=jnp.float64)
        Cp = jnp.broadcast_to(
            jnp.asarray(CV, jnp.float64).reshape(36, 1, 1, 1),
            (36, N, N, N))

        @jax.jit
        def solve(Cp):
            fixT = fe3d._split3(md.fixed)
            bcT = fe3d._split3(md.fixed_val)
            du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(fixT, bcT))
            neg = fe3d._k_apply3_raw(md, Cp, du_bc)
            rhs = tuple(jnp.where(f, b, -q)
                        for f, b, q in zip(fixT, bcT, neg))
            levels = fe3d.build_hierarchy3(md, Cp)
            _, res, it = fe3d.mg_cg_solve3(levels, rhs, du_bc, tol=1e-10)
            return res, it

        res, it = solve(Cp)
        assert float(res) <= 1e-10
        iters.append(int(it))
    assert iters[1] <= iters[0] + 3


def test_f32_matches_f64():
    """The production dtype reproduces the f64 elastoplastic solution to
    f32-arithmetic tolerance."""
    mat = _j2_mat()
    eps = 0.002
    out = {}
    for dt in (jnp.float64, jnp.float32):
        dm = con.device_material_from(mat, dtype=dt)
        md = fe3d.box_mesh(4, 4, 4, uniax='z', eps_tot=eps, dtype=dt)
        _, hist = fe3d.solve_uniaxial3(md, dm, mat.CV, nsteps=8, n_inner=2)
        out[dt] = np.asarray(hist[-1][0])
    np.testing.assert_allclose(out[jnp.float32], out[jnp.float64],
                               rtol=2e-3, atol=0.5)


def test_ml_svc_material_3d():
    """A trained SVC (ML) yield function serves the 3-D path unchanged
    (the constitutive layer is dimension-agnostic): uniaxial flow stress
    lands within the SVC locus tolerance band of the analytic anchor."""
    ref = FE.Material('J2-ref')
    ref.elasticity(E=E, nu=NU)
    ref.plasticity(sy=SY, sdim=6)
    ml = FE.Material('J2-ML')
    ml.train_SVC(C=10, gamma=2.5, mat_ref=ref, Nlc=150, Nseq=4, Fe=0.7,
                 Ce=0.95)
    dm = con.device_material_from(ml, dtype=jnp.float64)
    md = fe3d.box_mesh(3, 3, 3, uniax='z', eps_tot=0.0015,
                       dtype=jnp.float64)
    state, hist = fe3d.solve_uniaxial3(md, dm, ml.CV, nsteps=6, n_inner=2)
    gs = np.asarray(hist[-1][0])
    # ideal plasticity: flow stress ~ sy within the SVC band (~5%)
    assert abs(gs[2] - SY) / SY < 0.06
    # the SVC locus carries slight training anisotropy, so the free-face
    # solution is only near-homogeneous (unlike the exact-J2 cases)
    sig = np.asarray(state.sig)
    assert np.abs(sig - sig.mean(0)).max() < 0.05 * SY


def test_multichip_sharded_3d_matches_single():
    """One sharded 3-D load step over the 8-device virtual mesh == the
    single-device step (element arrays P('x'), nodal volumes replicated;
    XLA SPMD inserts the scatter-add AllReduce)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip('needs the multi-device virtual mesh')
    from pylabfea_tpu.parallel.mesh3d import (make_mesh3, shard_mesh_data3,
                                              shard_state3)
    mat = _j2_mat()
    dm = con.device_material_from(mat, dtype=jnp.float64)
    md = fe3d.box_mesh(8, 8, 8, uniax='z', eps_tot=0.002,
                       dtype=jnp.float64)
    st = fe3d.init_state3(md, mat.CV, dtype=jnp.float64)
    du0 = jnp.zeros_like(st.u)
    s1, d1 = fe3d.load_step3(md, st, dm, mat.CV, 0.7, n_inner=2, du0=du0)
    mesh = make_mesh3(8)
    md_s = shard_mesh_data3(md, mesh)
    st_s = shard_state3(fe3d.init_state3(md_s, mat.CV, dtype=jnp.float64),
                        mesh)
    s8, d8 = fe3d.load_step3(md_s, st_s, dm, mat.CV, 0.7, n_inner=2,
                             du0=jax.device_put(du0, jax.sharding.NamedSharding(
                                 mesh, jax.sharding.PartitionSpec())))
    np.testing.assert_allclose(np.asarray(d8['glob_sig']),
                               np.asarray(d1['glob_sig']), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s8.u), np.asarray(s1.u),
                               atol=1e-12)


def test_pallas_volume_kernel_parity():
    """The fused Pallas 3-D apply (interpret mode) matches the XLA
    partial-assembly form on random symmetric tangent volumes to f32
    summation-order tolerance."""
    from pylabfea_tpu.ops import volume_pallas as vp
    rng = np.random.default_rng(3)
    N = 8
    md = fe3d.box_mesh(N, N, N, LX=1., LY=1.3, LZ=0.7, uniax='z',
                       eps_tot=0.001, dtype=jnp.float32)
    C6 = rng.normal(size=(6, 6, N, N, N)).astype(np.float32)
    C6 = 0.5 * (C6 + C6.transpose(1, 0, 2, 3, 4)) \
        + 6. * np.eye(6, dtype=np.float32)[:, :, None, None, None]
    Cp = jnp.asarray(C6.reshape(36, N, N, N))
    v = tuple(jnp.asarray(rng.normal(size=(N + 1,) * 3), jnp.float32)
              for _ in range(3))
    ref = fe3d._k_apply3_fori(md, Cp, v)
    NX, NY, NZ, lx, ly, lz = md.grid[:6]
    out = vp.k_apply3_stencil(Cp, v[0], v[1], v[2], lx, ly, lz,
                              interpret=True)
    for c in range(3):
        scale = np.abs(np.asarray(ref[c])).max()
        np.testing.assert_allclose(np.asarray(out[c]), np.asarray(ref[c]),
                                   atol=3e-6 * scale)


def test_field_volumes_and_midplane_plot():
    """Post-processing utilities: field volumes have the mesh shape and
    reproduce the analytic uniaxial values; the mid-plane plot renders."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    mat = _j2_mat()
    dm = con.device_material_from(mat, dtype=jnp.float64)
    md = fe3d.box_mesh(2, 2, 2, uniax='z', eps_tot=0.002,
                       dtype=jnp.float64)
    state, _ = fe3d.solve_uniaxial3(md, dm, mat.CV, nsteps=4, n_inner=2)
    vols = fe3d.field_volumes(md, state)
    assert vols['seq'].shape == (2, 2, 2)
    # 4 load steps: the cutting-plane integration error is O(deps^2),
    # ~5e-4 relative here (the nsteps=8 closed-form test pins 1e-6)
    expect = (SY + KH * 0.002) * E / (E + KH)
    np.testing.assert_allclose(vols['seq'], expect, rtol=2e-3)
    np.testing.assert_allclose(vols['sig_2'], expect, rtol=2e-3)
    ax = fe3d.plot_midplane(md, state, 'peeq', axis='z', show=False)
    assert ax is not None
    plt.close('all')
