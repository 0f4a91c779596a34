"""Isolate the 2048^2 MG-CG degradation (VERDICT r4 item 3).

Solves the developed-plastic tangent system cold at NxN with:
  (a) jacobi smoother, nu = 1..4
  (b) chebyshev smoother, nu = 2, 4
  (c) jacobi nu=2 with the Galerkin coarsening chain evaluated in FLOAT64
      (cast back to f32 per level) — tests the hypothesis that f32
      round-off in the repeated RAP contractions degrades the coarse
      operators at depth

python tools/dbg_mg2048.py [N]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops import multigrid as mg
    from bench import flagship, sync
    from __graft_entry__ import _elastic_cv

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.float32
    dm, _ = flagship(dtype)
    CV = _elastic_cv(dtype)
    md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2,
                                du0=d['du'], kes0=d.get('kes'),
                                dst0=d['dstiff'])
    sync(st.sig)
    log(f'state prepared ({N}x{N}, two load steps)')
    bc_val = md.fixed_val * 0.25

    def rhs_of(Kp):
        fixT = fek._split(md.fixed)
        bcT = fek._split(bc_val)
        du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(fixT, bcT))
        fp = fek._contract_planes(Kp, fek._gather_planes(md, du_bc))
        neg = fek._scatter_planes(md, fp)
        rhs = tuple(jnp.where(f, b, -q) for f, b, q in zip(fixT, bcT, neg))
        return rhs, du_bc

    @partial(jax.jit, static_argnums=(1,))
    def solve(kes, nu):
        levels = mg.levels_from_kes(md, kes)
        rhs, x0 = rhs_of(kes[0])
        return mg.mg_cg_solve(levels, rhs, x0, tol=1e-6, maxiter=150, nu=nu)

    kes = fek._hier_kes_jit(md, st.elstiff)
    log(f'hierarchy: {len(kes)} levels, shapes '
        f'{[tuple(k.shape[2:]) for k in kes]}')

    for nu in (1, 2, 3, 4):
        du, res, it = solve(kes, nu)
        sync(du)
        t0 = time.perf_counter()
        du, res, it = solve(kes, nu)
        sync(du)
        dt = time.perf_counter() - t0
        log(f'jacobi nu={nu}: {int(it):3d} iters {dt * 1e3:7.0f} ms '
            f'res {float(res):.1e}')

    # (c) float64 Galerkin chain
    try:
        jax.config.update('jax_enable_x64', True)
        md64 = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.002,
                             dtype=jnp.float64)

        @jax.jit
        def chain64(elstiff):
            Kf = fek.element_stiffness_planes(md64,
                                              elstiff.astype(jnp.float64))
            out = [Kf]
            n = Kf.shape[2]
            while n % 2 == 0 and n // 2 >= 8:
                out.append(mg.galerkin_coarsen_Ke(out[-1]))
                n //= 2
            return tuple(k.astype(jnp.float32) for k in out)

        kes64 = chain64(st.elstiff)
        sync(kes64[-1])
        assert len(kes64) == len(kes)
        du, res, it = solve(kes64, 2)
        sync(du)
        log(f'jacobi nu=2 + f64 Galerkin chain: {int(it):3d} iters '
            f'res {float(res):.1e}')
    except Exception as e:
        log(f'f64 chain test failed: {type(e).__name__}: {e}')

    mg.SMOOTHER = 'chebyshev'
    fek.solve_linear.clear_cache()
    solve.clear_cache()
    for nu in (2, 4):
        du, res, it = solve(kes, nu)
        sync(du)
        t0 = time.perf_counter()
        du, res, it = solve(kes, nu)
        sync(du)
        dt = time.perf_counter() - t0
        log(f'chebyshev nu={nu}: {int(it):3d} iters {dt * 1e3:7.0f} ms '
            f'res {float(res):.1e}')


if __name__ == '__main__':
    main()
