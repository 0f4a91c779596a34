"""Measure MG-CG smoothing-sweep tradeoff on the production tangent field.

python tools/tune_mg.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial


def main():
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops import multigrid as mg
    from bench import flagship
    from __graft_entry__ import _elastic_cv

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.float32
    dm, _ = flagship(dtype)
    CV = _elastic_cv(dtype)
    md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
    jax.block_until_ready(st.sig)
    bc_val = md.fixed_val * 0.25

    @partial(jax.jit, static_argnums=(1,))
    def solve(elstiff, nu):
        fixT = fek._split(md.fixed)
        bcT = fek._split(bc_val)
        du_bc = tuple(jnp.where(f, b, 0.) for f, b in zip(fixT, bcT))
        Kp = fek.element_stiffness_planes(md, elstiff)
        fp = fek._contract_planes(Kp, fek._gather_planes(md, du_bc))
        neg = fek._scatter_planes(md, fp)
        rhs = tuple(jnp.where(f, b, -q)
                    for f, b, q in zip(fixT, bcT, neg))
        levels = mg.build_hierarchy(md, elstiff)
        return mg.mg_cg_solve(levels, rhs, du_bc, tol=1e-6, maxiter=100,
                              nu=nu)

    for nu in (1, 2, 3):
        du, res, it = solve(st.elstiff, nu)
        jax.block_until_ready(du)
        t0 = time.perf_counter()
        for _ in range(3):
            du, res, it = solve(st.elstiff, nu)
        jax.block_until_ready(du)
        dt = (time.perf_counter() - t0) / 3
        print(f'nu={nu}: {int(it):3d} iters  {dt * 1e3:7.1f} ms '
              f'res {float(res):.1e}')


if __name__ == '__main__':
    main()
