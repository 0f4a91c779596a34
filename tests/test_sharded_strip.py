"""Domain-decomposed (halo-exchange) solver tests on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.parallel import sharded as sh
import __graft_entry__ as g

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 devices')


def test_strip_elastic_matches_single():
    """Halo-exchange CG == single-device CG on the same elastic problem."""
    dtype = jnp.float64
    CV = np.asarray(g._elastic_cv(dtype))
    NX, NY = 32, 8
    md = fek.rect_mesh(NX, NY, LX=4., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    el = jnp.broadcast_to(jnp.asarray(CV), (md.nel, 6, 6))
    Ke = fek.element_stiffness(md, el)
    bc = md.fixed_val * 0.5
    vm = fek.gather_element(md, jnp.where(md.fixed, bc, 0.))
    rhs = jnp.where(md.fixed, bc, -fek.scatter_element(
        md, jnp.einsum('eij,ej->ei', Ke, vm)))
    x0 = jnp.where(md.fixed, bc, 0.)
    du1, res1, _ = fek.cg_solve(lambda v: fek.k_apply(md, Ke, v), rhs, x0,
                                fek.k_diag(md, Ke), tol=1e-12, maxiter=20000)
    u1 = np.asarray(du1)   # (2, nnX, nnY) component planes

    sm = sh.StripMesh(NX, NY, LX=4., LY=1., uniax='y', eps_tot=0.002,
                      n_devices=8, dtype=dtype)
    el_b = sm.shard_elements(np.broadcast_to(CV, (NX * NY, 6, 6)).copy())
    bcv = tuple(v * 0.5 for v in sm.fixed_val)
    du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(sm.fixed, bcv))
    k_apply = sh.make_k_apply(sm)
    zmask = tuple(jnp.zeros_like(f) for f in sm.fixed)
    neg = k_apply(el_b, du_bc, zmask)
    rhs_s = tuple(jnp.where(f, b, -q)
                  for f, b, q in zip(sm.fixed, bcv, neg))
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(shard_map, mesh=sm.mesh,
             in_specs=(P('x'), (P('x'), P('x'))),
             out_specs=(P('x'), P('x')))
    def dcalc(el_loc, fixed_loc):
        Kp = sh.element_Ke_planes(sm, el_loc[0])
        de = tuple(Kp[i, i] for i in range(8))
        d = sh._scatter_local(de, sm.NXd, sm.NY, sm.nnY)
        d = sh._halo_accumulate(d)
        return tuple(jnp.where(f[0], 1., x)[None]
                     for f, x in zip(fixed_loc, d))

    du2, res2, _ = sh.cg_solve_strip(sm, el_b, rhs_s, du_bc,
                                     dcalc(el_b, sm.fixed), tol=1e-12,
                                     maxiter=20000)
    for c in range(2):
        dc = np.asarray(du2[c])            # (D, NXd+1, nnY)
        u2 = np.concatenate([dc[d, :-1] for d in range(8)] + [dc[7, -1:]],
                            axis=0)
        np.testing.assert_allclose(u2, u1[c], atol=1e-12)
        # duplicated boundary columns stay bitwise consistent
        for d in range(7):
            np.testing.assert_array_equal(dc[d, -1], dc[d + 1, 0])


def test_strip_plastic_step_matches_single():
    dtype = jnp.float32
    mat = g._flagship_material(dtype)
    CV = g._elastic_cv(dtype)
    md = fek.rect_mesh(32, 8, LX=4., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    st0 = fek.init_state(md, CV, dtype=dtype)
    st1, d1 = fek.load_step(md, st0, mat, CV, jnp.asarray(0.5, dtype),
                            n_inner=2, cg_maxiter=400)
    sm = sh.StripMesh(32, 8, LX=4., LY=1., uniax='y', eps_tot=0.002,
                      n_devices=8, dtype=dtype)
    el0 = sm.shard_elements(
        np.broadcast_to(np.asarray(CV), (32 * 8, 6, 6)).copy())
    sig0 = sm.shard_elements(np.zeros((32 * 8, 6)))
    epl0 = sm.shard_elements(np.zeros((32 * 8, 6)))
    sig1, epl1, du, dd = sh.strip_load_step(sm, el0, sig0, epl0, mat, 0.5, 2)
    assert abs(float(dd['glob_sig'][1]) - float(d1['glob_sig'][1])) < 5e-3 * \
        abs(float(d1['glob_sig'][1]))


def test_two_level_schwarz_iteration_counts():
    """The strip-spanning coarse grid must cut CG iterations to a small,
    size-independent count (two-level additive Schwarz property)."""
    dtype = jnp.float32
    mat = g._flagship_material(dtype)
    CV = g._elastic_cv(dtype)
    sm = sh.StripMesh(64, 16, LX=4., LY=1., uniax='y', eps_tot=0.002,
                      n_devices=8, dtype=dtype)
    el0 = sm.shard_elements(
        np.broadcast_to(np.asarray(CV), (64 * 16, 6, 6)).copy())
    sig0 = sm.shard_elements(np.zeros((64 * 16, 6)))
    epl0 = sm.shard_elements(np.zeros((64 * 16, 6)))
    _, _, _, d_no = sh.strip_load_step(sm, el0, sig0, epl0, mat, 0.5, 2,
                                       1e-8, 4, False)
    _, _, _, d_2l = sh.strip_load_step(sm, el0, sig0, epl0, mat, 0.5, 2,
                                       1e-8, 4, 2)
    assert int(d_2l['cg_iters']) < 40 < int(d_no['cg_iters'])
    assert abs(float(d_2l['glob_sig'][1]) - float(d_no['glob_sig'][1])) \
        < 1e-3 * abs(float(d_no['glob_sig'][1]))


def test_strip_multimaterial_inclusion_matches_single():
    """3-material inclusion (plastic matrix, J2 band, soft elastic core)
    with free lateral edges and a corner pin: the strip-sharded solver
    (general BC planes + masked multi-pass return map) must reproduce the
    single-chip grouped device solver."""
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    dtype = jnp.float64
    NX, NY = 32, 16
    mat_h = FE.Material(num=1)
    mat_h.elasticity(E=200.e3, nu=0.3)
    mat_h.plasticity(sy=150., hill=[0.7, 1., 1.4, 1., 1., 1.], sdim=6)
    mat_j = FE.Material(num=2)
    mat_j.elasticity(E=200.e3, nu=0.3)
    mat_j.plasticity(sy=150., sdim=6)
    mat_el = FE.Material(num=3)
    mat_el.elasticity(E=1.e3, nu=0.27)
    dms = tuple(con.device_material_from(m, dtype=dtype)
                for m in (mat_h, mat_j, mat_el))
    CVs = tuple(np.asarray(m.CV, dtype=float)
                for m in (mat_h, mat_j, mat_el))
    mat_map = np.zeros((NX, NY), dtype=int)
    mat_map[NX // 2:, :] = 1
    mat_map[NX // 3: 2 * NX // 3, NY // 3: 2 * NY // 3] = 2
    LX, LY = 4., 2.
    bc = {'bot': {1: ('disp', 0.)},
          'top': {1: ('disp', 0.0025 * LY)},
          'nodes': ((0, 0, 0, 'disp', 0.),)}

    md = fek.rect_mesh(NX, NY, LX=LX, LY=LY, bc=bc, mat_map=mat_map,
                       dtype=dtype)
    st = fek.init_state(md, CVs, dtype=dtype)
    st, d1 = fek.load_step_split(md, st, dms, CVs, 0.8, n_inner=3)

    sm = sh.StripMesh(NX, NY, LX=LX, LY=LY, n_devices=8, dtype=dtype,
                      bc=bc, mat_map=mat_map)
    rows = np.zeros((NX * NY, 6, 6))
    for k in range(3):
        rows[mat_map.reshape(-1) == k] = CVs[k]
    el0 = sm.shard_elements(rows)
    sig0 = sm.shard_elements(np.zeros((NX * NY, 6)))
    epl0 = sm.shard_elements(np.zeros((NX * NY, 6)))
    sig1, epl1, du, d2 = sh.strip_load_step(sm, el0, sig0, epl0, dms, 0.8,
                                            3, 1e-10, 4, 2, CVs=CVs)
    sig_strip = np.asarray(sig1).reshape(-1, 6)
    sig_single = np.asarray(st.sig)
    scale = np.abs(sig_single).max()
    assert np.abs(sig_strip - sig_single).max() < 1e-5 * scale
    np.testing.assert_allclose(np.asarray(d2['glob_sig']),
                               np.asarray(d1['glob_sig']),
                               rtol=1e-6, atol=1e-6)
    epl_strip = np.asarray(epl1).reshape(-1, 6)
    epl_single = np.asarray(st.epl)
    assert np.abs(epl_strip - epl_single).max() < 1e-8

    # the O(sum_k cap_k) grouped-gather pass (default) and the
    # O(nmat * Nel) masked multi-pass integrate identical per-element
    # constitutive updates — converged while_loop lanes are frozen
    # exactly, so the two batchings must agree to rounding
    sig_m, epl_m, _, d_m = sh.strip_load_step(sm, el0, sig0, epl0, dms,
                                              0.8, 3, 1e-10, 4, 2,
                                              CVs=CVs, grouped=False)
    np.testing.assert_allclose(np.asarray(sig_m), np.asarray(sig1),
                               rtol=0., atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(epl_m), np.asarray(epl1),
                               rtol=0., atol=1e-12)


def test_strip_group_tables():
    """Capacity-padded gather tables: every element appears exactly once
    as a valid lane, the inverse map round-trips, and capacities are the
    per-strip maxima rounded to sublane multiples."""
    NX, NY = 16, 4
    mat_map = np.zeros((NX, NY), dtype=int)
    mat_map[NX // 2:, :] = 1
    mat_map[3:5, 1:3] = 2
    sm = sh.StripMesh(NX, NY, n_devices=8, mat_map=mat_map)
    blocks = np.asarray(mat_map.reshape(NX * NY)).reshape(
        8, sm.NXd * sm.NY)
    assert len(sm.group_idx) == 3
    off = 0
    covered = np.zeros((8, sm.NXd * sm.NY), dtype=bool)
    inv = np.asarray(sm.group_inv)
    for k in range(3):
        cap = sm.group_caps[k]
        top = max((blocks[d] == k).sum() for d in range(8))
        assert cap == -(-top // 8) * 8
        idx = np.asarray(sm.group_idx[k])
        for d in range(8):
            w = np.nonzero(blocks[d] == k)[0]
            np.testing.assert_array_equal(idx[d, :len(w)], w)
            np.testing.assert_array_equal(
                inv[d, w], off + np.arange(len(w)))
            assert not covered[d, w].any()
            covered[d, w] = True
        off += cap
    assert covered.all()
