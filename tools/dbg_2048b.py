"""Isolate the slow third inner solve at 2048^2: reproduce the exact
mid-step system (step 2, inner 3 — right after a large tangent update) and
solve it with (a) the production warm start, (b) zero start, (c) warm
start + tightened/loosened tolerance, reporting iterations and TRUE
residuals.  Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import flagship, sync
    from __graft_entry__ import _elastic_cv
    from pylabfea_tpu.ops import fe_kernels as fek

    dtype = jnp.float32
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dm, _ = flagship(dtype)
    CV = _elastic_cv(dtype)
    md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
    sync(st.sig)
    log('step 1 done')

    # manual step 2 up to the third inner solve
    bc_val = md.fixed_val * 0.25
    force = md.force * 0.25
    elstiff = st.elstiff
    du = d['du']
    kes = d['kes']
    dst = d['dstiff']
    state = st
    for i in range(2):
        kes = fek._hier_kes_cond_jit(md, elstiff, kes, dst)
        du, cg_res, cg_it = fek._mg_solve_jit(md, kes, bc_val, force,
                                              1e-6, 100, du)
        stt = state._replace(elstiff=elstiff)
        fy, sig_n, depl_n, elstiff, deps, dst = fek._respond_and_update(
            md, stt, dm, CV, du, True, 4)
        log(f'inner {i + 1}: cg_it {int(cg_it)}, res {float(cg_res):.2e}, '
            f'dstiff {float(dst):.3e}')
    kes = fek._hier_kes_cond_jit(md, elstiff, kes, dst)

    for tag, x0, tol in (('warm 1e-6', du, 1e-6),
                         ('zero 1e-6', jnp.zeros_like(bc_val), 1e-6),
                         ('warm 1e-5', du, 1e-5),
                         ('warm 3e-6', du, 3e-6)):
        t0 = time.perf_counter()
        du3, res, it = fek._mg_solve_jit(md, kes, bc_val, force, tol, 100,
                                         x0)
        sync(du3)
        log(f'inner-3 [{tag}]: {int(it):3d} iters, res {float(res):.2e} '
            f'({(time.perf_counter() - t0) * 1e3:.0f} ms)')


if __name__ == '__main__':
    main()
