"""Per-phase wall-clock breakdown of the production 1024^2 FE load step.

Times the three jitted pieces of ``load_step_split`` separately on the
attached device — multigrid hierarchy build (Galerkin coarsening), the
MG-preconditioned CG solve, and the grouped return-map/tangent update —
so perf work targets the dominant phase.  Usage:

    python tools/profile_step.py [N]          # default 1024
    python tools/profile_step.py 1024 --trace # also dump a jax.profiler trace
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    """Force completion: on the tunnel-attached axon platform
    ``block_until_ready`` does not reliably await remote execution, so
    read one scalar back to the host."""
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, 'ndim')][0]
    float(jnp.asarray(leaf).ravel()[0])


def timed(label, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f'{label:42s} {dt * 1e3:9.1f} ms')
    return out, dt


def main():
    from pylabfea_tpu.ops import fe_kernels as fek
    from pylabfea_tpu.ops import multigrid as mg
    from bench import flagship
    from __graft_entry__ import _elastic_cv

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    trace = '--trace' in sys.argv
    dtype = jnp.float32
    dm, _ = flagship(dtype)
    CV = _elastic_cv(dtype)
    print(f'platform={jax.devices()[0].platform}  mesh {N}x{N}')

    md = fek.rect_mesh(N, N, LX=1., LY=1., uniax='y', eps_tot=0.002,
                       dtype=dtype)
    st = fek.init_state(md, CV, dtype=dtype)
    # drive into the plastic regime (warm-up compiles everything)
    st, d = fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2)
    jax.block_until_ready(st.sig)

    bc_val = md.fixed_val * 0.25
    force = md.force * 0.25

    build = jax.jit(lambda e: tuple(
        (l.Ke, l.diag) for l in mg.build_hierarchy(md, e)))
    _, t_build = timed('hierarchy build (Galerkin coarsen+diag)', build,
                       st.elstiff)

    solve = lambda e, x0: fek.solve_linear(md, e, bc_val, force, None,
                                           100, x0=x0)
    (du, res, it), t_solve = timed(
        'MG-CG linear solve (warm-started)', solve, st.elstiff, d['du'])
    print(f'{"":42s}   ({int(it)} iters, res {float(res):.1e})')
    (du_c, res_c, it_c), t_cold = timed(
        'MG-CG linear solve (cold)', solve, st.elstiff, None)
    print(f'{"":42s}   ({int(it_c)} iters, res {float(res_c):.1e})')

    resp = lambda: fek._respond_and_update(md, st, dm, CV, du, True, 4)
    _, t_resp = timed('response + tangent update (nsub=4)', resp)

    step = lambda: fek.load_step_split(md, st, dm, CV, 0.25, n_inner=2,
                                       du0=d['du'])
    (st2, d2), t_step = timed('full load_step_split (n_inner=2)', step)
    acc = 3 * (t_solve + t_resp)
    print(f'{"3x(solve+resp) accounted":42s} {acc * 1e3:9.1f} ms '
          f'({acc / t_step * 100:.0f}% of step)')

    if trace:
        with jax.profiler.trace('/tmp/fe_trace'):
            st2, d2 = step()
            jax.block_until_ready(st2.sig)
        print('trace written to /tmp/fe_trace')


if __name__ == '__main__':
    main()
