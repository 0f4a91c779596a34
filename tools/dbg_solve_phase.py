"""Decompose the 1024^2 MG-CG solve phase on the real TPU.

BENCH_r04: phase_solve = 167 ms over ~19 CG iterations across two inner
rounds (~8.8 ms/iter), while the fused Pallas fine-level K-apply alone
streams at ~0.36 ms.  A preconditioned iteration is ~6 fine applies plus
coarse levels, transfers and dots — nominally ~3 ms — so ~2/3 of the
phase is unaccounted.  This probe times each constituent in isolation on
the production tangent field (one gated load step into plasticity first,
so the stiffness planes are the realistic mixed elastic/secant field):

  * pallas fine K-apply      (k_apply_stencil, stream bound)
  * masked K-apply           (k_apply_t incl. the fixed-dof jnp.where)
  * one V-cycle              (jitted alone)
  * mg_cg_solve, fixed 10 it (tol=0 -> exactly 10 preconditioned iters)
  * hierarchy build          (Galerkin coarsening)

Run on the TPU session:  python tools/dbg_solve_phase.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pylabfea_tpu.ops import fe_kernels as fek
from pylabfea_tpu.ops import multigrid as mg
from bench import trained_flagship


def timeit(fn, *args, n=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.float32
    dm, CV, eps_tot, nsv, _ = trained_flagship(dtype)
    md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=eps_tot,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    # one gated step to 50% load: realistic mixed tangent field
    st, d = fek.load_step_split(md, st, dm, CV, 0.5, n_inner=2)
    jax.block_until_ready(st.sig)
    elstiff = st.elstiff
    kes = d.get('kes')
    if kes is None:
        kes = fek._hier_kes_jit(md, elstiff)
    bc_val = md.fixed_val * 0.75
    force = md.force * 0.75

    fixT = fek._split(md.fixed)
    v = fek._split(jnp.where(md.fixed, bc_val, 0.) + 0.)
    Kp = kes[0]

    from pylabfea_tpu.ops import stencil_pallas as sp
    TX = sp.auto_tile(N, N)
    t_pal, _ = timeit(jax.jit(lambda K, a, b: sp.k_apply_stencil(
        K, a, b, TX=TX)), Kp, v[0], v[1])
    print(f'pallas fine apply      : {t_pal:8.3f} ms')

    t_kat, _ = timeit(jax.jit(
        lambda K, vv: fek.k_apply_t(md, K, vv, fixT)), Kp, v)
    print(f'masked k_apply_t       : {t_kat:8.3f} ms')

    @jax.jit
    def one_vcycle(k, b):
        levels = mg.levels_from_kes(md, k)
        return mg.v_cycle(levels, b)

    t_vc, _ = timeit(one_vcycle, kes, v)
    print(f'one V-cycle            : {t_vc:8.3f} ms')

    @jax.jit
    def dots(a, b):
        return fek._norm(a), fek._norm(b)

    t_dot, _ = timeit(dots, v, v)
    print(f'two plane norms        : {t_dot:8.3f} ms')

    x0 = jnp.zeros_like(bc_val)
    tcg = {}
    for it_cap in (1, 10):
        t_cg, out = timeit(
            lambda x, c=it_cap: fek._mg_solve_jit(md, kes, bc_val, force,
                                                  0., c, x), x0, n=10)
        tcg[it_cap] = t_cg
        print(f'mg_cg_solve {it_cap:3d} iters  : {t_cg:8.3f} ms '
              f'(res {float(out[1]):.2e}, it {int(out[2])})')
    print(f'-> marginal per-iter   : {(tcg[10] - tcg[1]) / 9.:8.3f} ms')

    t_h, _ = timeit(fek._hier_kes_jit, md, elstiff, n=10)
    print(f'hierarchy build        : {t_h:8.3f} ms')


if __name__ == '__main__':
    main()
