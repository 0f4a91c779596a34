"""Round-5: phase profile of the 128^3 hex8 step on TPU.

Times, each in its own jitted program (warm):
  - hierarchy build (build_hierarchy3)
  - one V-cycle / one fine K-apply / one MG-CG solve
  - one grouped response (2.1M-point J2+khard return map, nsub=4)
  - elstiff_vols conversion, restrict3/prolong3 transfer micro
  - the full load_step3 (reference point: r4 recorded 0.967 s)

Run: python tools/dbg_3d_profile.py [N=128]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def sync(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, 'ndim')][0]
    float(jnp.asarray(leaf).ravel()[0])


def timed(fn, reps=3):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import pylabfea_tpu as FE
    from pylabfea_tpu.ops import constitutive as con
    from pylabfea_tpu.ops import fe3d

    dtype = jnp.float32
    mat = FE.Material()
    mat.elasticity(E=200.e3, nu=0.3)
    mat.plasticity(sy=150., khard=500., sdim=6)
    dm = con.device_material_from(mat, dtype=dtype)
    md = fe3d.box_mesh(N, N, N, uniax='z', eps_tot=0.002, dtype=dtype)
    st = fe3d.init_state3(md, mat.CV, dtype=dtype)
    log(f'platform {jax.devices()}, N={N}^3 = {N**3:,} elements')

    # drive into the transition like the bench: 0.4 then 0.3 of the load
    t0 = time.perf_counter()
    st, d = fe3d.load_step3(md, st, dm, mat.CV, 0.4, n_inner=2,
                            du0=jnp.zeros_like(st.u))
    sync(st.sig)
    log(f'step 1 (compile+run): {time.perf_counter() - t0:.1f} s')
    t0 = time.perf_counter()
    st2, d2 = fe3d.load_step3(md, st, dm, mat.CV, 0.3, n_inner=2,
                              du0=d['du'])
    sync(st2.sig)
    t_step = time.perf_counter() - t0
    log(f'step 2 (warm, the bench row): {t_step:.3f} s, iters/inner '
        f'{[int(x) for x in d2["cg_iters_hist"]]}')

    # ---- level pytree pack/unpack so jits take them as ARGUMENTS ----
    def pack(lv):
        return [(l.md, l.Cp, l.diag, l.fixed, l.lmax, l.kc_inv) for l in lv]

    def unpack(packed):
        out = []
        for mdk, Cp, diag, fx, lmax, kinv in packed:
            L = fe3d.MGLevel3(mdk, Cp, diag, fx, lmax)
            L.kc_inv = kinv
            out.append(L)
        return out

    build_j = jax.jit(lambda e: pack(fe3d.build_hierarchy3(
        md, fe3d.elstiff_vols(md, e))))
    t_h = timed(lambda: build_j(st2.elstiff))
    log(f'hierarchy build (jitted): {t_h*1e3:.1f} ms')
    packed = build_j(st2.elstiff)

    fixT = fe3d._split3(md.fixed)
    bc = fe3d._split3(md.fixed_val * 0.3)
    vT = fe3d._split3(d2['du'])

    vcyc = jax.jit(lambda p, b: fe3d.v_cycle3(unpack(p), b))
    t_v = timed(lambda: vcyc(packed, vT), reps=5)
    log(f'one V-cycle: {t_v*1e3:.2f} ms')

    apply_j = jax.jit(lambda Cp, v: fe3d.k_apply3_t(md, Cp, v, fixT))
    t_a = timed(lambda: apply_j(packed[0][1], vT), reps=10)
    log(f'one fine K-apply: {t_a*1e3:.2f} ms')

    solve = jax.jit(lambda p, b, x0: fe3d.mg_cg_solve3(
        unpack(p), b, x0, tol=1e-6, maxiter=100))
    t_s = timed(lambda: solve(packed, bc, vT), reps=3)
    _, res, its = solve(packed, bc, vT)
    log(f'one MG-CG solve: {t_s*1e3:.1f} ms, iters {int(its)}, '
        f'res {float(res):.2e}')

    CVd = jnp.asarray(mat.CV, dtype)
    resp = jax.jit(lambda s, e, dp: fe3d.respond_grouped3(
        md, dm, CVd, s, e, dp, fast=True, maxiter=12, nsub=4))
    deps_j = jax.jit(lambda du: fe3d.element_deps3(md, du))
    deps = deps_j(st2.u)
    t_r = timed(lambda: resp(st2.sig, st2.epl, deps), reps=3)
    log(f'one grouped response (nsub=4): {t_r*1e3:.1f} ms')

    ev = jax.jit(lambda g: fe3d.elstiff_vols(md, g))
    grad = resp(st2.sig, st2.epl, deps)[3]
    t_e = timed(lambda: ev(grad), reps=5)
    log(f'elstiff_vols (grad -> volumes): {t_e*1e3:.1f} ms')

    rst = jax.jit(fe3d.restrict3)
    t_rt = timed(lambda: rst(vT), reps=10)
    pro = jax.jit(lambda v: fe3d.prolong3(v, N + 1, N + 1, N + 1))
    cT = rst(vT)
    t_p = timed(lambda: pro(cT), reps=10)
    log(f'restrict3 {t_rt*1e3:.2f} ms, prolong3 {t_p*1e3:.2f} ms')

    t_d = timed(lambda: deps_j(st2.u), reps=5)
    log(f'element_deps3: {t_d*1e3:.1f} ms')

    log(f'SUMMARY step={t_step:.3f}s  hier={t_h*1e3:.0f}ms '
        f'vcyc={t_v*1e3:.1f}ms apply={t_a*1e3:.2f}ms solve={t_s*1e3:.0f}ms '
        f'resp={t_r*1e3:.0f}ms elvols={t_e*1e3:.0f}ms '
        f'restrict={t_rt*1e3:.1f}ms prolong={t_p*1e3:.1f}ms '
        f'deps={t_d*1e3:.0f}ms')


if __name__ == '__main__':
    main()
